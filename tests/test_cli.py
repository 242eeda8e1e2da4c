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
