"""Offline score-map generation CLI.

Capability parity with /root/reference/generate_scores_file.py:39-69: for the
train/val splits of `--training_path` and the flat `--testing_path`, compute
per-image 196-dim patch-importance scores and save them stacked to
`{parent}/{name}_scores/{mode}.npy` (readable alongside the reference's .pt
by textmae_tpu.data.load_scores_file).

Unlike the reference's serial loop, images fan out over a process pool.
"""
from __future__ import annotations

import argparse
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np

from textmae_tpu.data.dataset import list_images
from textmae_tpu.data.score_maps import total_score_for_image


def _score_one(path: str, img_size: int = 224) -> np.ndarray:
    from textmae_tpu.data.score_maps import load_gray

    # canonical loader — see load_gray's docstring for why this must match
    # every other score producer bit-for-bit
    return total_score_for_image(load_gray(path), (img_size, img_size))


def process_dataset(
    mode: str, dataset_path: Path, workers: int = 8, img_size: int = 224
) -> Path:
    """img_size: resolution the model will train/eval at — the score grid is
    (img_size/16)², and apply_masking rejects a grid that does not match the
    model's patch count (a 196-entry default map fed to a 96px model would
    otherwise gather out-of-range tokens)."""
    from functools import partial

    dataset_path = Path(dataset_path)
    root = dataset_path if mode == "test" else dataset_path / mode
    files = [str(p) for p in list_images(root)]
    if not files:
        raise FileNotFoundError(f"no images under {root}")
    score_fn = partial(_score_one, img_size=img_size)
    if workers > 1:
        with ProcessPoolExecutor(workers) as pool:
            scores = list(pool.map(score_fn, files, chunksize=4))
    else:
        scores = [score_fn(f) for f in files]
    out_dir = dataset_path.parent / f"{dataset_path.name}_scores"
    out_dir.mkdir(parents=True, exist_ok=True)
    out_file = out_dir / f"{mode}.npy"
    stacked = np.stack(scores)
    np.save(out_file, stacked)
    print(f"[{mode}] {stacked.shape} -> {out_file}")
    return out_file


def main(argv=None):
    p = argparse.ArgumentParser(description="Generate patch-importance score files.")
    p.add_argument("--training_path", help="dataset root containing train/ and val/")
    p.add_argument("--testing_path", help="flat test image directory")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--input-size", type=int, default=224,
                   help="model input resolution the scores are for; the "
                        "score grid is (input-size/16)^2 per image "
                        "(default 224 -> 196, reference parity)")
    args = p.parse_args(argv)
    if not args.training_path and not args.testing_path:
        p.error("provide --training_path and/or --testing_path")
    if args.training_path:
        process_dataset("train", Path(args.training_path), args.workers, args.input_size)
        process_dataset("val", Path(args.training_path), args.workers, args.input_size)
    if args.testing_path:
        process_dataset("test", Path(args.testing_path), args.workers, args.input_size)


if __name__ == "__main__":
    main()
