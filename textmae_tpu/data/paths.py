"""Named dataset -> filesystem path registry.

Same role as the reference registry (/root/reference/utils/dataset_paths.py:5-37),
with env-var override so deployments don't edit source: set
`TEXTMAE_DATA_ROOT` (default `./datasets`) or `TEXTMAE_DATASET_<NAME>`.
"""
from __future__ import annotations

import os
from pathlib import Path

DATASET_PATHS = {
    "kodak": "kodak",
    "clic2022-test": "clic2022-test",
    "tecnick": "tecnick",
    "coco": "coco",
    "imagenet": "imagenet",
    "imagenet100": "imagenet100",
    "vimeo-90k": "vimeo-90k",
    "uvg-1080p": "uvg-1080p",
}


def find_kodak() -> Path | None:
    """First available Kodak image directory, by preference:

    $TEXTMAE_KODAK -> the registry path -> the reference mount (full-res
    originals) -> the vendored half-resolution copies under tests/fixtures
    (self-contained: the suite and bench run with no reference mount; the
    24 Kodak images are released by Kodak for unrestricted use).
    """
    repo = Path(__file__).resolve().parents[2]
    env = os.environ.get("TEXTMAE_KODAK")
    for d in (
        # Path("") resolves to cwd — an unset/empty env var must NOT turn
        # stray PNGs in the working directory into "the Kodak dataset"
        Path(env) if env else None,
        resolve_dataset("kodak"),
        Path("/root/reference/datasets/kodak"),
        repo / "tests" / "fixtures" / "kodak_half",
    ):
        if d and d.is_dir() and any(d.glob("*.png")):
            return d
    return None


def resolve_dataset(name_or_path: str) -> Path:
    """A registered name resolves under TEXTMAE_DATA_ROOT; anything else is a path."""
    env = os.environ.get(f"TEXTMAE_DATASET_{name_or_path.upper().replace('-', '_')}")
    if env:
        return Path(env)
    if name_or_path in DATASET_PATHS:
        root = Path(os.environ.get("TEXTMAE_DATA_ROOT", "datasets"))
        return root / DATASET_PATHS[name_or_path]
    return Path(name_or_path)
