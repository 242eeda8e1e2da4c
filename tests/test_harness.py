"""End-to-end eval harness tests: dataset loop, report schema, reconstruction."""
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from textmae_tpu.data import ImageScoreDataset
from textmae_tpu.eval import MCMCodec, eval_model
from textmae_tpu.eval.harness import write_report
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
def test_dataset(tmp_path_factory):
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("ds") / "testset"
    root.mkdir()
    n = 3
    for i in range(n):
        arr = rng.integers(0, 256, (50, 60, 3)).astype(np.uint8)
        Image.fromarray(arr).save(root / f"im{i}.png")
    scores_dir = root.parent / f"{root.name}_scores"
    scores_dir.mkdir()
    np.save(scores_dir / "test.npy",
            rng.random((n, TINY.num_patches)).astype(np.float32))
    return root


@pytest.fixture(scope="module")
def codec():
    model = MCM(TINY)
    key = jax.random.PRNGKey(0)
    imgs = jnp.zeros((1, 3, 96, 96), jnp.float32)
    scores = jnp.zeros((1, TINY.num_patches), jnp.float32)
    variables = jax.jit(lambda r, x, s: model.init(
        {"params": r, "noise": r}, x, s, training=False, compute_loss=False
    ))(key, imgs, scores)
    c = MCMCodec(model, variables)
    c.update()
    return c


def test_eval_model_real_codec(test_dataset, codec, tmp_path):
    ds = ImageScoreDataset(test_dataset, "test", img_size=96)
    out_dir = tmp_path / "recon"
    results = eval_model(codec, ds, batch_size=2, output_dir=out_dir)
    for key in ("psnr", "ms-ssim", "bpp", "bpp_streams", "bpp_side_info",
                "encoding_time", "decoding_time"):
        assert key in results
    # reconstructions written at original sizes
    recs = sorted(out_dir.glob("*_rec.png"))
    assert len(recs) == 3
    with Image.open(recs[0]) as im:
        assert im.size == (60, 50)


def test_report_schema(tmp_path):
    results = {"ckpt": {"psnr": 30.0, "bpp": 0.1}}
    path = tmp_path / "report.txt"
    report = write_report(results, path)
    loaded = json.loads(path.read_text())
    assert loaded["name"] == "textmae_tpu-mcm"
    assert loaded["results"]["ckpt"]["psnr"] == 30.0
    assert report == loaded


def test_eval_model_pipelined_matches_serial(test_dataset, codec):
    from textmae_tpu.data import ImageScoreDataset

    ds = ImageScoreDataset(test_dataset, "test", img_size=96)
    serial = eval_model(codec, ds, batch_size=2)
    piped = eval_model(codec, ds, batch_size=2, pipeline=2)
    for k in ("psnr", "bpp"):
        assert serial[k] == pytest.approx(piped[k], rel=1e-5)


def test_inference_denormalize_mode(codec):
    """denormalize=True: identical bitstream, metrics in raw pixel space,
    x_hat returned de-normalized."""
    from textmae_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD
    from textmae_tpu.eval.harness import _denormalize, inference

    r = np.random.default_rng(5)
    imgs = r.random((2, 3, 96, 96)).astype(np.float32)
    scores = jnp.asarray(r.random((2, TINY.num_patches)).astype(np.float32))
    mean = IMAGENET_MEAN.reshape(1, 3, 1, 1)
    std = IMAGENET_STD.reshape(1, 3, 1, 1)
    norm = (imgs - mean) / std
    r1 = inference(codec, jnp.asarray(norm), scores)
    r2 = inference(codec, jnp.asarray(norm), scores, denormalize=True)
    assert r2["bpp"] == pytest.approx(r1["bpp"])  # same streams either way
    np.testing.assert_allclose(
        np.asarray(r2["x_hat"]), np.asarray(_denormalize(r1["x_hat"])), atol=1e-6
    )
    assert np.isfinite(r2["psnr"]) and 0 <= r2["ms-ssim"] <= 1
