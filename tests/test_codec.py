"""Real-bitstream codec tests: compress->decompress fidelity vs the forward pass."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from textmae_tpu.eval import MCMCodec, compute_metrics, inference, inference_entropy_estimation
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


@pytest.fixture(scope="module")
def setup():
    model = MCM(TINY)
    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)
    imgs = jnp.asarray(r.random((2, 3, 96, 96), np.float32))
    scores = jnp.asarray(r.random((2, TINY.num_patches), np.float32))
    variables = jax.jit(lambda r, x, s: model.init(
        {"params": r, "noise": r}, x, s, training=False, compute_loss=False
    ))(rng, imgs, scores)
    return model, variables, imgs, scores


@pytest.fixture(scope="module")
def host_codec(setup):
    # shared updated host-path codec: the per-instance jit wrappers re-trace
    # per instance, so read-only tests share ONE instance (wall-time cap)
    model, variables, _, _ = setup
    codec = MCMCodec(model, variables)
    codec.update(force=True)
    return codec


def test_codec_roundtrip_matches_forward(setup, host_codec):
    """decompress(compress(x)) must equal the eval-mode forward x_hat: the
    forward pass quantizes exactly as the codec does (round around mu /
    medians), so any mismatch indicates stream desync or math divergence."""
    model, variables, imgs, scores = setup
    codec = host_codec
    streams, ids_restore = codec.compress(imgs, scores)
    assert len(streams) == 2
    assert all(len(s.y_string) > 0 and len(s.z_string) > 0 for s in streams)
    x_hat = codec.decompress(streams, ids_restore)

    out = model.apply(variables, imgs, scores, training=False, compute_loss=False)
    np.testing.assert_allclose(
        np.asarray(x_hat), np.asarray(out["x_hat"]), rtol=1e-4, atol=1e-4
    )


def test_device_chain_decompress_bit_identical(setup, host_codec):
    """decompress(device_chain=True) — the in-jit rANS slice chain with zero
    host alternations (VERDICT r2 Next #6) — must produce the SAME image
    bits as the host-alternating path: identical per-slice programs fed
    bit-equal decoded symbols."""
    model, variables, imgs, scores = setup
    codec = host_codec
    streams, ids_restore = codec.compress(imgs, scores)
    x_host = np.asarray(codec.decompress(streams, ids_restore, device_chain=False))
    x_dev = np.asarray(codec.decompress(streams, ids_restore, device_chain=True))
    np.testing.assert_array_equal(x_dev, x_host)
    # the constructor/env default also routes there
    codec2 = MCMCodec(model, variables, device_chain=True)
    codec2.update(force=True)
    np.testing.assert_array_equal(
        np.asarray(codec2.decompress(streams, ids_restore)), x_host
    )


def test_device_encode_compress_bit_identical(setup, host_codec):
    """compress(device_encode=True) — the in-jit rANS encoder, no symbol wire
    — must emit byte-identical y/z streams and the same ids_restore as the
    host C++ path, and its output must decode on BOTH decoders."""
    model, variables, imgs, scores = setup
    codec = host_codec
    streams_h, ids_h = codec.compress(imgs, scores)
    streams_d, ids_d = codec.compress(imgs, scores, device_encode=True)
    np.testing.assert_array_equal(ids_d, ids_h)
    for sh, sd in zip(streams_h, streams_d):
        assert sd.y_string == sh.y_string
        assert sd.z_string == sh.z_string
        assert sd.z_shape == sh.z_shape
    x_host = np.asarray(codec.decompress(streams_d, ids_d, device_chain=False))
    x_dev = np.asarray(codec.decompress(streams_d, ids_d, device_chain=True))
    np.testing.assert_array_equal(x_dev, x_host)
    # constructor/env default routes compress there too
    codec2 = MCMCodec(model, variables, device_encode=True)
    codec2.update(force=True)
    streams2, ids2 = codec2.compress(imgs, scores)
    np.testing.assert_array_equal(ids2, ids_h)
    assert all(
        a.y_string == b.y_string and a.z_string == b.z_string
        for a, b in zip(streams2, streams_h)
    )


def test_codec_requires_update(setup):
    model, variables, imgs, scores = setup
    codec = MCMCodec(model, variables)
    with pytest.raises(RuntimeError):
        codec.compress(imgs, scores)


def test_inference_metrics(setup, host_codec):
    model, variables, imgs, scores = setup
    codec = host_codec
    res = inference(codec, imgs, scores)
    for key in ("psnr", "ms-ssim", "bpp", "encoding_time", "decoding_time"):
        assert key in res, key
    assert res["bpp"] > 0
    assert np.isfinite(res["psnr"])


def test_entropy_estimation_close_to_real_bpp(setup, host_codec):
    """Estimated bits (likelihoods) vs real coded stream bits (excluding the
    Huffman ids_restore side info, which the estimate doesn't model). rANS
    carries a fixed ~2x64-bit flush overhead per stream; allow it."""
    model, variables, imgs, scores = setup
    codec = host_codec
    real = inference(codec, imgs, scores)
    est = inference_entropy_estimation(model, variables, imgs, scores)
    num_pixels = 96 * 96
    real_bits = real["bpp_streams"] * num_pixels
    est_bits = est["bpp"] * num_pixels
    overhead_bits = 2 * 64  # two streams x 64-bit final state
    assert real_bits <= est_bits * 1.5 + overhead_bits + 16
    assert real_bits >= est_bits * 0.5 - 16
    # total bpp decomposes exactly
    assert real["bpp"] == pytest.approx(real["bpp_streams"] + real["bpp_side_info"])


def test_compress_deterministic(setup, host_codec):
    """Same inputs -> byte-identical streams (reproducible archives)."""
    model, variables, imgs, scores = setup
    codec = host_codec
    s1, ids1 = codec.compress(imgs, scores)
    s2, ids2 = codec.compress(imgs, scores)
    np.testing.assert_array_equal(ids1, ids2)
    for a, b in zip(s1, s2):
        assert a.y_string == b.y_string and a.z_string == b.z_string


def _keep_grid_roundtrip(img_size: int, num_keep: int):
    """Property check for one keep grid: forward/h_s shapes consistent, the
    codec round trip reproduces the forward x_hat, and re-encoding is
    bit-exact (encoder/decoder stream agreement — VERDICT r4 Weak #6: the
    stride-2 h_a path must compose with grids not divisible by 4)."""
    cfg = MCMConfig(
        img_size=img_size, encoder_embed_dim=32, encoder_depth=1,
        encoder_num_heads=2, decoder_embed_dim=16, decoder_depth=1,
        decoder_num_heads=2, latent_depth=24, hyperprior_depth=16,
        num_slices=4, num_keep_patches=num_keep, use_pallas=False,
    )
    model = MCM(cfg)
    key = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)
    imgs = jnp.asarray(r.random((1, 3, img_size, img_size), np.float32))
    scores = jnp.asarray(r.random((1, cfg.num_patches), np.float32))
    variables = jax.jit(lambda r, x, s: model.init(
        {"params": r, "noise": r}, x, s, training=False, compute_loss=False
    ))(key, imgs, scores)
    codec = MCMCodec(model, variables)
    codec.update()
    streams, ids = codec.compress(imgs, scores)
    x_hat = codec.decompress(streams, ids)
    assert x_hat.shape == imgs.shape
    out = model.apply(variables, imgs, scores, training=False, compute_loss=False)
    np.testing.assert_allclose(
        np.asarray(x_hat), np.asarray(out["x_hat"]), rtol=1e-4, atol=1e-4
    )
    # encoder determinism/bit-exactness: a second encode of the same input
    # must produce byte-identical streams (any drift = desync hazard)
    streams2, _ = codec.compress(imgs, scores)
    for a, b in zip(streams, streams2):
        assert a.y_string == b.y_string and a.z_string == b.z_string


@pytest.mark.parametrize("num_keep", [25, 36])
def test_keep_grid_property_small(num_keep):
    """keep grids 5/6 (odd, even-not-div-4) through the stride-2 h_a/h_s
    path: hyper_grid = ceil(g/4); the subpel x2 stages overshoot for grids
    not divisible by 4 and h_s crops back (mcm.py run_h_s). Grid 4 (div-4)
    is the TINY config every other codec test runs; grids 7/12 are in the
    slow tier."""
    _keep_grid_roundtrip(96, num_keep)


@pytest.mark.slow  # larger image: grids 7 and 12 at real masking ratios
@pytest.mark.parametrize("img_size,num_keep", [(128, 49), (208, 144)])
def test_keep_grid_property_large(img_size, num_keep):
    _keep_grid_roundtrip(img_size, num_keep)


def test_int8_wire_escape_path(setup):
    """Symbols outside [-127, 127] ride the escape sidecar of the int8 wire
    (both directions) without corrupting the stream: shift every quantized
    symbol by +200 and require decompress(compress(x)) to reproduce the same
    symbols bit-exactly (the shifted chain is shared by both directions, so
    the roundtrip is still deterministic even though x_hat is nonsense)."""
    model, variables, imgs, scores = setup
    codec = MCMCodec(model, variables)
    codec.update()

    orig_qs, orig_qt = codec._quantize_slice, codec._quantize_tail
    codec._quantize_slice = lambda v, y, mu, i: (
        lambda s, o: (s + jnp.int16(200), o)
    )(*orig_qs(v, y, mu, i))
    codec._quantize_tail = lambda v, y, mu: (
        lambda s, o: (s + jnp.int16(200), o)
    )(*orig_qt(v, y, mu))

    s1, ids1 = codec.compress(imgs, scores)
    s2, ids2 = codec.compress(imgs, scores)
    for a, b in zip(s1, s2):
        assert a.y_string == b.y_string and a.z_string == b.z_string
    x1 = codec.decompress(s1, ids1)
    x2 = codec.decompress(s2, ids2)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    # streams must actually be longer than the unshifted ones (bypass coding)
    codec2 = MCMCodec(model, variables)
    codec2.update()
    s0, _ = codec2.compress(imgs, scores)
    assert sum(len(s.y_string) for s in s1) > sum(len(s.y_string) for s in s0)


def test_pack6_roundtrip():
    """6-bit index wire: device pack -> host unpack is the identity for
    values < 64, at every length mod 4."""
    from textmae_tpu.eval.codec import _pack6_device, _packed6_len, _unpack6_host

    r = np.random.default_rng(3)
    for n in (1, 2, 3, 4, 5, 7, 64, 1023):
        idx = r.integers(0, 64, n).astype(np.uint8)
        wire = np.asarray(_pack6_device(jnp.asarray(idx)))
        assert wire.size == _packed6_len(n) == 3 * ((n + 3) // 4)
        np.testing.assert_array_equal(_unpack6_host(wire, n), idx)


def test_wide_pack_flags_z_overflow(setup):
    """The wide-path divergence flag must cover z hyper-symbols too: an
    out-of-int16 z value must raise, not wrap into a corrupt stream."""
    model, variables, imgs, scores = setup
    codec = MCMCodec(model, variables)
    codec.update()
    cfg = model.config
    grid, g = cfg.keep_grid, cfg.group_ch
    hz, wz = codec._z_shape()
    syms = jnp.zeros((cfg.num_slices, 2, grid, grid, g), jnp.int16)
    idxs = jnp.zeros(syms.shape, jnp.uint8)
    ids = jnp.zeros((2, cfg.num_patches), jnp.int32)
    z_bad = jnp.zeros((2, hz, wz, cfg.hyperprior_depth), jnp.int32).at[0, 0, 0, 0].set(40000)
    packed = np.asarray(codec._pack_wide(syms, idxs, z_bad, ids, jnp.int32(0)))
    assert packed[:2].view(np.int16)[0] == 1  # flagged, not silent


def test_update_invalidates_packed_pallas_tables(setup):
    """update(force=True) must drop the Pallas-packed Gaussian tables along
    with the device-resident scan tables: a stale packed table would make the
    Pallas paths encode/decode with old CDFs after a table rebuild (silently
    corrupt streams)."""
    model, variables, imgs, scores = setup
    codec = MCMCodec(model, variables)
    codec.update(force=True)
    tab0, l0 = codec._packed_gauss_tables()
    assert codec._gauss_packed is not None
    codec.update(force=True)
    assert codec._gauss_packed is None  # invalidated with _dev_gauss/_dev_eb
    tab1, l1 = codec._packed_gauss_tables()
    assert l1 == l0
    np.testing.assert_array_equal(np.asarray(tab1), np.asarray(tab0))


def test_slice_tail_parallel_matches_sequential(setup):
    """The vmapped tail (slices >= max_support, mcm.py _slice_scan) must
    reproduce the fully sequential chain: same expression trees, same bits in
    expectation — pinned here at eval AND noise-training forwards."""
    import dataclasses

    model, variables, imgs, scores = setup
    seq_model = MCM(dataclasses.replace(TINY, slice_tail_parallel=False))
    assert model.config.slice_tail_parallel  # default is the parallel form
    for kwargs in (
        dict(training=False, compute_loss=False),
        dict(training=True, compute_loss=True),
    ):
        rngs = {"noise": jax.random.PRNGKey(5)}
        a = model.apply(variables, imgs, scores, rngs=rngs, **kwargs)
        b = seq_model.apply(variables, imgs, scores, rngs=rngs, **kwargs)
        np.testing.assert_allclose(
            np.asarray(a["x_hat"]), np.asarray(b["x_hat"]), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(a["likelihoods"]["y"]), np.asarray(b["likelihoods"]["y"]),
            rtol=2e-5, atol=2e-5,
        )
