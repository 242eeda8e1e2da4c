"""CLI surface tests: parsers, score-file generation, dataset reorganizer."""
import numpy as np
import pytest
from PIL import Image

from textmae_tpu.cli.generate_scores import process_dataset
from textmae_tpu.cli.train import build_parser as train_parser
from textmae_tpu.cli.test_model import build_parser as eval_cli_parser
from textmae_tpu.cli.mae_pretrain import build_parser as pretrain_parser
from textmae_tpu.cli.mae_finetune import build_parser as finetune_parser
from textmae_tpu.cli.mae_linprobe import build_parser as linprobe_parser
from textmae_tpu.data.reorganize import flatten_dataset


def test_train_parser_defaults():
    args = train_parser().parse_args(["-d", "x"])
    # canonical config parity (train.sh:1-11 / training.py:40-49)
    assert args.epochs == 1000
    assert args.batch_size == 32
    assert args.learning_rate == 1e-4
    assert args.lmbda == 1e-4
    assert args.num_keep_patches == 144
    assert args.input_size == 224
    assert args.clip_grad == 1.0


def test_test_parser_defaults():
    args = eval_cli_parser().parse_args(["-d", "x"])
    assert args.batch_size == 1  # testing.py:143
    assert not args.entropy_estimation


def test_mae_pretrain_fsdp_min_size_flag():
    """--fsdp_min_size plumbs the ZeRO-3 threshold through the MAE pretrain
    CLI too (ADVICE r3 applied at both FSDP entry points, not just train)."""
    from textmae_tpu.cli.mae_pretrain import build_parser

    args = build_parser().parse_args(
        ["--data_path", "/tmp", "--fsdp", "--fsdp_min_size", "256"]
    )
    assert args.fsdp and args.fsdp_min_size == 256
    assert build_parser().parse_args(["--data_path", "/tmp"]).fsdp_min_size == 2**13


def test_mae_parsers():
    a = pretrain_parser().parse_args(["--data_path", "x"])
    assert a.mask_ratio == 0.75 and a.blr == 1e-3 and a.epochs == 800
    b = finetune_parser().parse_args(["--data_path", "x"])
    assert b.layer_decay == 0.75 and b.smoothing == 0.1
    c = linprobe_parser().parse_args(["--data_path", "x"])
    assert c.blr == 0.1 and c.epochs == 90


def test_generate_scores_cli(tmp_path, rng):
    root = tmp_path / "ds"
    (root / "train").mkdir(parents=True)
    (root / "val").mkdir()
    for split, n in (("train", 3), ("val", 2)):
        for i in range(n):
            arr = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
            Image.fromarray(arr).save(root / split / f"i{i}.png")
    out = process_dataset("train", root, workers=1)
    assert out.exists()
    scores = np.load(out)
    assert scores.shape == (3, 196)
    out_val = process_dataset("val", root, workers=2)
    assert np.load(out_val).shape == (2, 196)


def test_flatten_dataset(tmp_path, rng):
    src = tmp_path / "src"
    for split_dir, cls in (("train.X1", "dog"), ("train.X2", "cat"), ("val.X", "dog")):
        d = src / split_dir / cls
        d.mkdir(parents=True)
        arr = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
        Image.fromarray(arr).save(d / "a.png")
    counts = flatten_dataset(src, tmp_path / "dst")
    assert counts == {"train": 2, "val": 1}
    assert (tmp_path / "dst" / "train" / "dog_a.png").exists()


def test_stage_wrappers_surface():
    """Blip2/Diffuser expose the reference 3-method surface and fail cleanly
    before prepare_model()."""
    from textmae_tpu.models import Blip2, Diffuser

    b = Blip2()
    with pytest.raises(RuntimeError):
        b.generate_caption(None)
    d = Diffuser()
    with pytest.raises(RuntimeError):
        d.refine_image("x", None)
    assert hasattr(Blip2, "prepare_model") and hasattr(Diffuser, "prepare_model")


def test_apply_npz_meta(tmp_path):
    """A single-npz eval self-configures keep/order/normalize from __meta__
    (the rd_sweep / distribution-checkpoint contract); explicit flags win."""
    from textmae_tpu.cli.test_model import _apply_npz_meta
    from textmae_tpu.train.checkpoint import save_params_npz

    path = tmp_path / "ck.npz"
    save_params_npz(
        path, {"w": np.zeros((2,), np.float32)},
        meta={"normalize": True, "num_keep_patches": 49,
              "canonical_keep_order": False},
    )
    args = eval_cli_parser().parse_args(["-d", "x", "-p", str(path)])
    _apply_npz_meta(args)
    assert args.num_keep_patches == 49
    assert args.reference_order is True
    assert args.normalize is True

    # explicit non-default flag wins over meta (and warns on contradiction)
    args = eval_cli_parser().parse_args(
        ["-d", "x", "-p", str(path), "--num-keep-patches", "100"])
    _apply_npz_meta(args)
    assert args.num_keep_patches == 100

    # an explicit 144 is NOT the 'unset' sentinel: meta keep=49 must not
    # silently replace it (pre-fix it did, because 144 was the parser default)
    args = eval_cli_parser().parse_args(
        ["-d", "x", "-p", str(path), "--num-keep-patches", "144"])
    _apply_npz_meta(args)
    assert args.num_keep_patches == 144

    # multi-checkpoint / non-npz runs are untouched
    args = eval_cli_parser().parse_args(["-d", "x", "-p", str(path), "other.npz"])
    _apply_npz_meta(args)
    assert args.num_keep_patches == 144 and not args.reference_order


def test_apply_npz_meta_shared_across_clis(tmp_path):
    """serve and pipeline self-configure keep/order/normalize from the same
    __meta__ provenance helper as test_model — a served rd_sweep checkpoint
    must not silently decode garbage (the ADVICE-r2 class, on the serving
    surface)."""
    from textmae_tpu.cli.pipeline import build_parser as pipeline_parser
    from textmae_tpu.cli.serve import build_parser as serve_parser
    from textmae_tpu.train.checkpoint import (
        apply_npz_meta_to_args,
        save_params_npz,
    )

    path = tmp_path / "ck.npz"
    save_params_npz(
        path, {"w": np.zeros((2,), np.float32)},
        meta={"normalize": True, "num_keep_patches": 49,
              "canonical_keep_order": False},
    )

    args = serve_parser().parse_args(["-p", str(path)])
    apply_npz_meta_to_args(args, args.path)
    assert args.num_keep_patches == 49
    assert args.reference_order is True
    assert args.normalize is True

    # explicit flags win over meta
    args = serve_parser().parse_args(
        ["-p", str(path), "--num-keep-patches", "144"])
    apply_npz_meta_to_args(args, args.path)
    assert args.num_keep_patches == 144

    # pipeline's tri-state normalize: None resolves from meta
    args = pipeline_parser().parse_args(["-i", "x.png", "-p", str(path)])
    assert args.normalize is None
    apply_npz_meta_to_args(args, args.checkpoint)
    assert args.normalize is True and args.num_keep_patches == 49
    assert args.reference_order is True

    # no meta / no file: untouched
    args = serve_parser().parse_args([])
    apply_npz_meta_to_args(args, None)
    assert args.num_keep_patches is None and not args.reference_order


def test_apply_npz_meta_moe(tmp_path):
    """MoE topology self-configures on the eval/serve surfaces: exact values
    from __meta__ when present, structural inference from the param tree
    (stacked moe/wi leaves) when not; dense checkpoints stay dense."""
    from textmae_tpu.train.checkpoint import (
        apply_npz_meta_to_args,
        infer_moe_from_npz,
        save_params_npz,
    )

    moe_tree = {
        "encoder_blocks_0": {"mlp": {"fc1": {"kernel": np.zeros((4, 8), np.float32)}}},
        "encoder_blocks_2": {"moe": {"wi": np.zeros((8, 4, 16), np.float32)}},
    }

    # meta wins and carries top_k (not recoverable from weights)
    with_meta = tmp_path / "moe_meta.npz"
    save_params_npz(with_meta, moe_tree,
                    meta={"moe_experts": 8, "moe_top_k": 2, "moe_every": 3})
    args = eval_cli_parser().parse_args(["-d", "x", "-p", str(with_meta)])
    apply_npz_meta_to_args(args, with_meta)
    assert (args.moe_experts, args.moe_top_k, args.moe_every) == (8, 2, 3)

    # no meta: experts + cadence inferred from the tree, top_k stays None
    # (resolves to 1 downstream, with a warning)
    bare = tmp_path / "moe_bare.npz"
    save_params_npz(bare, moe_tree)
    assert infer_moe_from_npz(bare) == {"moe_experts": 8, "moe_every": 3}
    args = eval_cli_parser().parse_args(["-d", "x", "-p", str(bare)])
    apply_npz_meta_to_args(args, bare)
    assert (args.moe_experts, args.moe_every) == (8, 3)
    assert args.moe_top_k is None

    # explicit flag wins over inference
    args = eval_cli_parser().parse_args(
        ["-d", "x", "-p", str(bare), "--moe-experts", "4"])
    apply_npz_meta_to_args(args, bare)
    assert args.moe_experts == 4

    # dense tree: no MoE update
    dense = tmp_path / "dense.npz"
    save_params_npz(dense, {"encoder_blocks_0": {"mlp": {"fc1": {
        "kernel": np.zeros((4, 8), np.float32)}}}})
    assert infer_moe_from_npz(dense) is None
    args = eval_cli_parser().parse_args(["-d", "x", "-p", str(dense)])
    apply_npz_meta_to_args(args, dense)
    assert args.moe_experts is None


def test_generate_scores_grid_follows_input_size(tmp_path, rng):
    """process_dataset(img_size=96) emits (96/16)^2 = 36-entry score rows so
    non-224 training/eval is first-class (apply_masking rejects mismatched
    grids)."""
    from PIL import Image

    from textmae_tpu.cli.generate_scores import process_dataset

    d = tmp_path / "flat"
    d.mkdir()
    for i in range(2):
        arr = (rng.random((128, 128, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"im{i}.png")
    out = process_dataset("test", d, workers=1, img_size=96)
    assert np.load(out).shape == (2, 36)
    out224 = process_dataset("test", d, workers=1)
    assert np.load(out224).shape == (2, 196)
