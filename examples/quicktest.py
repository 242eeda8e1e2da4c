"""Quicktest: self-contained smoke run (the reference Quicktest.ipynb analog).

Builds a tiny throwaway dataset from bundled/available Kodak images (or
synthetic noise), generates score files, trains MCM for a few steps, then
evaluates with the real bitstream codec. Runs on CPU or TPU.

    python examples/quicktest.py [--steps 10] [--kodak /path/to/kodak]
"""
from __future__ import annotations

import argparse
import shutil
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


def build_dataset(root: Path, kodak: Path | None, n_train=8, n_val=2, size=224):
    from PIL import Image

    (root / "train").mkdir(parents=True)
    (root / "val").mkdir(parents=True)
    files = sorted(kodak.glob("*.png")) if kodak and kodak.is_dir() else []
    rng = np.random.default_rng(0)
    for i in range(n_train + n_val):
        split = "train" if i < n_train else "val"
        dst = root / split / f"img{i:02d}.png"
        if files:
            shutil.copy2(files[i % len(files)], dst)
        else:
            arr = (rng.random((size, size, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(dst)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=5)
    from textmae_tpu.data.paths import find_kodak

    p.add_argument("--kodak", type=str, default=find_kodak())
    p.add_argument("--keep", type=int, default=144)
    args = p.parse_args()

    from textmae_tpu.cli.generate_scores import process_dataset
    from textmae_tpu.cli.train import main as train_main
    from textmae_tpu.cli.test_model import main as test_main

    with tempfile.TemporaryDirectory() as td:
        root = Path(td) / "mini"
        build_dataset(root, Path(args.kodak) if args.kodak else None)
        process_dataset("train", root, workers=2)
        process_dataset("val", root, workers=2)
        process_dataset("test", root / "val", workers=2)

        out = Path(td) / "out"
        train_main([
            "-d", str(root), "--epochs", "1", "--batch-size", "4",
            "--val-batch-size", "4", "--num-keep-patches", str(args.keep),
            "--output-dir", str(out), "--no-vgg", "--print-freq", "1",
        ])
        test_main([
            "-d", str(root / "val"), "-p", str(out / "checkpoint_best"),
            "--num-keep-patches", str(args.keep),
            "-o", str(Path(td) / "recon"), "-v",
        ])
    print("quicktest OK")


if __name__ == "__main__":
    main()
