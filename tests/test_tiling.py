"""Tiled full-resolution eval tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from textmae_tpu.eval.tiling import inference_tiled, tile_image, untile_image
from textmae_tpu.eval import MCMCodec
from textmae_tpu.models.mcm import MCM, MCMConfig

TINY = MCMConfig(
    img_size=96,
    encoder_embed_dim=32,
    encoder_depth=2,
    encoder_num_heads=2,
    decoder_embed_dim=16,
    decoder_depth=1,
    decoder_num_heads=2,
    latent_depth=24,
    hyperprior_depth=16,
    num_slices=4,
    num_keep_patches=16,
    use_pallas=False,
)


def test_tile_untile_roundtrip(rng):
    for h, w in [(224, 224), (300, 500), (96, 96), (100, 97)]:
        img = rng.random((h, w, 3)).astype(np.float32)
        tiles, meta = tile_image(img, 96)
        assert tiles.shape[1:] == (96, 96, 3)
        np.testing.assert_array_equal(untile_image(tiles, meta), img)


def test_inference_tiled(rng):
    model = MCM(TINY)
    key = jax.random.PRNGKey(0)
    imgs = jnp.asarray(rng.random((1, 3, 96, 96), np.float32))
    scores = jnp.asarray(rng.random((1, TINY.num_patches), np.float32))
    variables = jax.jit(lambda r, x, s: model.init(
        {"params": r, "noise": r}, x, s, training=False, compute_loss=False
    ))(key, imgs, scores)
    codec = MCMCodec(model, variables)
    codec.update()
    img = rng.random((150, 200, 3)).astype(np.float32)
    res = inference_tiled(codec, img, tile=96)
    assert res["num_tiles"] == 2 * 3
    assert res["x_hat"].shape == (150, 200, 3)
    assert res["bpp"] > 0
    assert np.isfinite(res["psnr"])


@pytest.mark.slow  # normalize plumbing also covered by the adaptive test + serve normalize mode
def test_inference_tiled_normalize_consistency(rng):
    """normalize=True must round-trip through the SAME distribution the
    model saw: the de-normalized reconstruction of a normalized input equals
    the raw-mode reconstruction only for a model that is distribution-blind,
    so instead pin the contract directly — the normalized path's metrics are
    computed in raw pixel space and the wire format is unchanged."""
    model = MCM(TINY)
    key = jax.random.PRNGKey(0)
    imgs = jnp.asarray(rng.random((1, 3, 96, 96), np.float32))
    scores = jnp.asarray(rng.random((1, TINY.num_patches), np.float32))
    variables = jax.jit(lambda r, x, s: model.init(
        {"params": r, "noise": r}, x, s, training=False, compute_loss=False
    ))(key, imgs, scores)
    codec = MCMCodec(model, variables)
    codec.update()
    img = rng.random((96, 192, 3)).astype(np.float32)
    res = inference_tiled(codec, img, tile=96, normalize=True)
    assert res["x_hat"].shape == (96, 192, 3)
    # raw pixel space: a [0,1] image's recon stays clipped to [0,1]
    assert res["x_hat"].min() >= 0.0 and res["x_hat"].max() <= 1.0
    assert np.isfinite(res["psnr"]) and res["bpp"] > 0
    # the normalized input really reached the model: the streams differ
    # from the raw-mode ones for the same image
    raw = inference_tiled(codec, img, tile=96, normalize=False)
    assert res["bpp"] != raw["bpp"] or res["psnr"] != raw["psnr"]


# ---------------------------------------------------------------------------
# adaptive tiling (VERDICT r4 Next #4): overlap/blend + per-tile keep
# ---------------------------------------------------------------------------
def test_overlap_tile_stitch_identity(rng):
    """Feathered stitching of CONSISTENT tiles (crops of one image) must
    reproduce the image exactly: ramp weights sum to 1 everywhere."""
    from textmae_tpu.eval.tiling import stitch_blend, tile_image_overlap

    for h, w, ov in [(150, 200, 16), (96, 96, 0), (200, 130, 32), (50, 260, 8)]:
        img = rng.random((h, w, 3)).astype(np.float32)
        tiles, meta = tile_image_overlap(img, 96, ov)
        out = stitch_blend(tiles, meta)
        assert out.shape == img.shape
        np.testing.assert_allclose(out, img, atol=1e-5)


def test_tile_positions_cover_and_overlap():
    from textmae_tpu.eval.tiling import tile_positions

    for size, tile, ov in [(300, 96, 16), (96, 96, 16), (97, 96, 0), (500, 224, 32)]:
        starts = tile_positions(size, tile, ov)
        assert starts[0] == 0
        assert starts[-1] + tile >= size  # full coverage
        for a, b in zip(starts, starts[1:]):
            assert b - a <= tile - ov  # at least the requested overlap


def test_choose_tile_keeps_orders_by_detail():
    from textmae_tpu.eval.tiling import choose_tile_keeps

    rng = np.random.default_rng(0)
    flat = np.zeros(36, np.float32)              # no salient patches
    busy = rng.random(36).astype(np.float32) + 1  # all clear the mean
    mixed = np.concatenate([np.zeros(18), np.ones(18) * 2]).astype(np.float32)
    keeps = choose_tile_keeps(
        np.stack([flat, busy, mixed]), (16, 25, 36), 36
    )
    assert keeps[0] == 16 and keeps[1] == 36 and keeps[2] == 25


def test_inference_tiled_adaptive(rng):
    """Per-tile keep + overlap blending end to end on the tiny model: keeps
    differ across tiles of a detail-varying image, rate accounting includes
    the choice bits, and quality is finite/sane."""
    from textmae_tpu.eval.tiling import inference_tiled_adaptive, make_keep_codecs

    model = MCM(TINY)
    key = jax.random.PRNGKey(0)
    imgs = jnp.asarray(rng.random((1, 3, 96, 96), np.float32))
    scores = jnp.asarray(rng.random((1, TINY.num_patches), np.float32))
    variables = jax.jit(lambda r, x, s: model.init(
        {"params": r, "noise": r}, x, s, training=False, compute_loss=False
    ))(key, imgs, scores)
    codecs = make_keep_codecs(model, variables, (16, 36))
    assert set(codecs) == {16, 36}
    # half flat / half noisy image: the flat tiles must pick a smaller keep
    # (96x160 -> 2 overlapping tiles: smallest shape that exercises both
    # the allocator and the feathered stitch — suite wall-time cap)
    img = np.zeros((96, 160, 3), np.float32)
    img[:, 80:] = rng.random((96, 80, 3)).astype(np.float32)
    res = inference_tiled_adaptive(codecs, img, tile=96, overlap=16)
    assert res["x_hat"].shape == img.shape
    assert np.isfinite(res["psnr"]) and res["bpp"] > 0
    assert len(res["tile_keeps"]) >= 2  # at least two rates actually used
    assert sum(res["tile_keeps"].values()) == res["num_tiles"]
