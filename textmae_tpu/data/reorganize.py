"""Flatten a class-foldered dataset (ImageNet100 style) into flat train/ + val/.

Capability parity with /root/reference/datasets/reconstruct_dataset.py:6-50:
moves every image out of per-class subfolders of each `train.X*`/`val.X*` split
directory into flat `train/` and `val/` directories under the output root.
"""
from __future__ import annotations

import shutil
from pathlib import Path


def flatten_dataset(src_root: Path, dst_root: Path, move: bool = False) -> dict:
    src_root, dst_root = Path(src_root), Path(dst_root)
    counts = {"train": 0, "val": 0}
    for split in ("train", "val"):
        out = dst_root / split
        out.mkdir(parents=True, exist_ok=True)
        for split_dir in sorted(src_root.glob(f"{split}*")):
            if not split_dir.is_dir():
                continue
            for img in sorted(split_dir.rglob("*.*")):
                if not img.is_file():
                    continue
                dst = out / f"{img.parent.name}_{img.name}"
                if move:
                    shutil.move(str(img), dst)
                else:
                    shutil.copy2(img, dst)
                counts[split] += 1
    return counts


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--move", action="store_true")
    args = p.parse_args(argv)
    counts = flatten_dataset(args.src, args.dst, args.move)
    print(counts)


if __name__ == "__main__":
    main()
