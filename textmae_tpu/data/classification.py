"""ImageFolder-style classification dataset for MAE pretrain/finetune/linprobe.

Parity with the reference's torchvision ImageFolder + transforms
(/root/reference/models/MAE/main_pretrain.py:121-128, util/datasets.py:20-65,
util/crop.py:15-41):
  * class-per-subdirectory labeling,
  * train: RandomResizedCrop(scale=(0.2, 1.0), bicubic) + random h-flip +
    ImageNet normalize — the reference's pretrain transform,
  * eval: resize short side to 256/224-crop (center), the standard eval chain.

All host-side (PIL + numpy); batches feed jitted steps directly.
"""
from __future__ import annotations

import os
import threading
from pathlib import Path
from typing import List, Tuple

import numpy as np
from PIL import Image

from textmae_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD, _IMG_EXTS


def random_resized_crop(
    im: Image.Image,
    size: int,
    rng: np.random.Generator,
    scale: Tuple[float, float] = (0.2, 1.0),
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
) -> Image.Image:
    """TF/TPU-style RandomResizedCrop (util/crop.py:15-41 semantics)."""
    w, h = im.size
    area = h * w
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        log_ratio = np.log(ratio)
        aspect = np.exp(rng.uniform(*log_ratio))
        cw = int(round(np.sqrt(target_area * aspect)))
        ch = int(round(np.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            x0 = int(rng.integers(0, w - cw + 1))
            y0 = int(rng.integers(0, h - ch + 1))
            return im.resize((size, size), Image.BICUBIC, box=(x0, y0, x0 + cw, y0 + ch))
    # fallback: center crop
    s = min(h, w)
    x0, y0 = (w - s) // 2, (h - s) // 2
    return im.resize((size, size), Image.BICUBIC, box=(x0, y0, x0 + s, y0 + s))


def center_crop_resize(im: Image.Image, size: int, resize_short: int = 256) -> Image.Image:
    w, h = im.size
    short = min(w, h)
    scale = resize_short / short
    im = im.resize((round(w * scale), round(h * scale)), Image.BICUBIC)
    w, h = im.size
    x0, y0 = (w - size) // 2, (h - size) // 2
    return im.crop((x0, y0, x0 + size, y0 + size))


class ImageFolderDataset:
    """(image, label) samples from class subdirectories."""

    def __init__(
        self,
        root: os.PathLike,
        img_size: int = 224,
        train: bool = True,
        seed: int = 0,
        normalize: bool = True,
    ):
        self.root = Path(root)
        self.img_size = img_size
        self.train = train
        self.normalize = normalize
        self.classes = sorted(
            d.name for d in self.root.iterdir() if d.is_dir()
        )
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.samples: List[Tuple[Path, int]] = []
        for c in self.classes:
            for f in sorted((self.root / c).rglob("*.*")):
                if f.suffix.lower() in _IMG_EXTS:
                    self.samples.append((f, self.class_to_idx[c]))
        if not self.samples:
            raise FileNotFoundError(f"no class images under {self.root}")
        self._rng = np.random.default_rng(seed)
        self._rng_lock = threading.Lock()

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, int]:
        path, label = self.samples[idx]
        with Image.open(path) as im:
            im = im.convert("RGB")
            if self.train:
                # __getitem__ runs on a thread pool; numpy Generators are not
                # thread-safe, so draw a child seed under a lock and do the
                # augmentation draws on a private generator
                with self._rng_lock:
                    child = np.random.default_rng(self._rng.integers(2**63))
                im = random_resized_crop(im, self.img_size, child)
                if child.random() < 0.5:
                    im = im.transpose(Image.FLIP_LEFT_RIGHT)
            else:
                im = center_crop_resize(im, self.img_size)
            arr = np.asarray(im, np.float32) / 255.0
        if self.normalize:
            arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
        return arr, label


def class_batch_iterator(
    dataset: ImageFolderDataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    epoch: int = 0,
    drop_last: bool = True,
    num_threads: int = 8,
    shard_index: int = 0,
    shard_count: int = 1,
    channels_first: bool = True,
):
    """Yield (images, labels) numpy batches with per-host sharding."""
    from concurrent.futures import ThreadPoolExecutor

    from textmae_tpu.data.dataset import shard_order

    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        order = np.random.default_rng((seed, epoch)).permutation(n)
    order = shard_order(order, shard_index, shard_count)
    if drop_last:
        order = order[: (len(order) // batch_size) * batch_size]
    with ThreadPoolExecutor(num_threads) as pool:
        for i in range(0, len(order), batch_size):
            idxs = order[i : i + batch_size]
            samples = list(pool.map(dataset.__getitem__, idxs))
            imgs = np.stack([s[0] for s in samples])
            labels = np.array([s[1] for s in samples], np.int32)
            if channels_first:
                imgs = imgs.transpose(0, 3, 1, 2)
            yield imgs, labels
