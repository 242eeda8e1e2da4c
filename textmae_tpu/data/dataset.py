"""Image + score dataset and a threaded host loader.

Mirrors the behavioral surface of the reference loader
(/root/reference/utils/dataloader.py:12-78): each sample is
(image, original (W, H), total_score); images are bicubic-resized to the model
resolution; train/val are ImageNet-normalized, test is not; scores come from a
sibling `{dataset}_scores/{mode}` file and are a hard error if missing.

TPU-first differences from the reference:
  * channels-last float32 numpy batches (NHWC feeds XLA conv layouts directly),
  * a thread-pool prefetching iterator instead of torch DataLoader workers,
  * per-host sharding hooks (`shard_index` / `shard_count`) replace
    torch.distributed.DistributedSampler (training.py:124-129),
  * scores load from .npy (native) or .pt (torch interop).
"""
from __future__ import annotations

import os
import queue
import threading
from pathlib import Path
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_IMG_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".webp", ".ppm", ".tif", ".tiff"}


def load_scores_file(path: os.PathLike) -> np.ndarray:
    """Load a stacked (N, L) score array from .npy or torch .pt."""
    path = Path(path)
    if path.suffix == ".npy":
        return np.load(path).astype(np.float32)
    import torch  # torch is CPU-only in this image; used for .pt interop

    t = torch.load(path, map_location="cpu", weights_only=True)
    return np.asarray(t, dtype=np.float32)


def find_scores_file(dataset_path: Path, mode: str) -> Path:
    """`{parent}/{name}_scores/{mode}.{npy,pt}` (utils/dataloader.py:29-33)."""
    scores_dir = dataset_path.parent / f"{dataset_path.name}_scores"
    for ext in (".npy", ".pt"):
        p = scores_dir / f"{mode}{ext}"
        if p.exists():
            return p
    raise FileNotFoundError(
        f"Scores file not found under {scores_dir} for mode={mode!r}. "
        "Run `python -m textmae_tpu.cli.generate_scores` first "
        "(reference: generate_scores_file.py)."
    )


def list_images(root: Path) -> Sequence[Path]:
    return sorted(p for p in root.rglob("*.*") if p.suffix.lower() in _IMG_EXTS)


class ImageScoreDataset:
    """Index-addressable (image, orig_size, score) triples.

    mode: "train" / "val" read `{root}/{mode}`, "test" reads root itself
    (utils/dataloader.py:24).
    """

    def __init__(
        self,
        dataset_path: os.PathLike,
        mode: str = "train",
        img_size: int = 224,
        normalize: Optional[bool] = None,
        scores: Optional[np.ndarray] = None,
    ):
        self.dataset_path = Path(dataset_path)
        self.mode = mode
        self.img_size = img_size
        self.normalize = (mode != "test") if normalize is None else normalize
        root = self.dataset_path if mode == "test" else self.dataset_path / mode
        self.files = list_images(root)
        if not self.files:
            raise FileNotFoundError(f"No images under {root}")
        if scores is None:
            scores = load_scores_file(find_scores_file(self.dataset_path, mode))
        self.scores = np.asarray(scores, np.float32)
        if len(self.scores) != len(self.files):
            raise ValueError(
                f"scores rows ({len(self.scores)}) != images ({len(self.files)}); "
                "regenerate the scores file"
            )

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, Tuple[int, int], np.ndarray]:
        with Image.open(self.files[idx]) as im:
            im = im.convert("RGB")
            orig_size = im.size  # (W, H), as PIL .size (utils/dataloader.py:40)
            im = im.resize((self.img_size, self.img_size), Image.BICUBIC)
            arr = np.asarray(im, np.float32) / 255.0  # HWC
        if self.normalize:
            arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
        return arr, orig_size, self.scores[idx]


def shard_order(order: np.ndarray, shard_index: int, shard_count: int) -> np.ndarray:
    """Equal-length per-host shards of a sample order.

    torch DistributedSampler semantics (main_pretrain.py:134-136): pad the
    permutation cyclically to a multiple of shard_count before striding, so
    every host sees the SAME number of samples — and therefore the same
    number of batches. Unequal per-host batch counts deadlock multi-process
    training: the short host leaves the epoch loop while the rest wait at
    the next collective.
    """
    if shard_count <= 1 or len(order) == 0:
        return order
    total = -(-len(order) // shard_count) * shard_count
    return np.resize(order, total)[shard_index::shard_count]


def batch_iterator(
    dataset: ImageScoreDataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    epoch: int = 0,
    drop_last: bool = False,
    num_threads: int = 8,
    prefetch: int = 4,
    shard_index: int = 0,
    shard_count: int = 1,
    channels_first: bool = False,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield (images (B,H,W,C) float32, scores (B,L) float32) batches.

    Deterministic per-(seed, epoch) shuffle; each host takes a strided shard of
    the permutation (the TPU-native analog of DistributedSampler's
    rank/world_size split, main_pretrain.py:134-136).
    """
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        order = np.random.default_rng((seed, epoch)).permutation(n)
    order = shard_order(order, shard_index, shard_count)
    if drop_last:
        order = order[: (len(order) // batch_size) * batch_size]

    batches = [order[i : i + batch_size] for i in range(0, len(order), batch_size)]
    if not batches:
        return

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def put_or_stop(item) -> bool:
        # a plain q.put() can block forever on a full queue after the
        # consumer abandons the generator; re-check `stop` while waiting
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def produce():
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(num_threads) as pool:
            for idxs in batches:
                if stop.is_set():
                    break
                samples = list(pool.map(dataset.__getitem__, idxs))
                imgs = np.stack([s[0] for s in samples])
                scores = np.stack([s[2] for s in samples])
                if channels_first:
                    imgs = imgs.transpose(0, 3, 1, 2)
                if not put_or_stop((imgs, scores)):
                    break
        put_or_stop(None)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            yield item
    finally:
        stop.set()
