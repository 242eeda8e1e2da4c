"""Random-crop training pools with canonical patch scores.

The reference trains MCM on pre-sized images with PRECOMPUTED score files
(utils/dataloader.py + generate_scores_file.py); crops would invalidate the
stored scores, so it never crops. Here the quadtree scorer is cheap enough
to run per crop on the host, which unlocks crop augmentation: a `CropPool`
precomputes N random crops (uint8) and their 196-dim scores from full-res
sources, then serves normalized batches. Used by examples/rd_sweep.py to
train generalizing models from the 24 Kodak images in the zero-egress
environment; the same class scales to any image folder.

Scores use the canonical PIL-gray path (see data/score_maps.load_gray
rationale: cv2-vs-PIL gray rounding flips quadtree keep-sets).
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

from textmae_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD
from textmae_tpu.data.score_maps import total_score_for_image


def _load_rgb_gray(path: os.PathLike) -> Tuple[np.ndarray, np.ndarray]:
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        return np.asarray(im, np.uint8), np.asarray(im.convert("L"), np.uint8)


class CropPool:
    """Precomputed (crop, score) pool from full-resolution images.

    Crops are stored uint8 (pool_size x S x S x 3); batches normalize on
    assembly. Deterministic given (files order, seed).
    """

    def __init__(
        self,
        files: Sequence[os.PathLike],
        pool_size: int,
        img_size: int = 224,
        seed: int = 0,
        verbose: bool = False,
        scale_range: Optional[Tuple[float, float]] = None,
    ):
        """scale_range: MAE-style RandomResizedCrop — each pool entry crops a
        square whose AREA is a uniform fraction of this range of the source
        area (clamped to fit), then bicubic-resizes to img_size. Scores are
        computed on the RESIZED crop (what the model sees), via the canonical
        PIL-gray path. None = fixed-size crops (original behavior)."""
        if not files:
            raise ValueError("CropPool needs at least one source image")
        rng = np.random.default_rng(seed)
        arrs, grays = zip(*(_load_rgb_gray(f) for f in files))
        for f, a in zip(files, arrs):
            if a.shape[0] < img_size or a.shape[1] < img_size:
                raise ValueError(
                    f"{Path(f).name} is {a.shape[1]}x{a.shape[0]}, smaller "
                    f"than the {img_size} crop size"
                )
        self.img_size = img_size
        self.crops = np.empty((pool_size, img_size, img_size, 3), np.uint8)
        self.scores = np.empty((pool_size, 196), np.float32)
        for i in range(pool_size):
            j = rng.integers(0, len(arrs))
            a, g = arrs[j], grays[j]
            if scale_range is not None:
                from PIL import Image

                lo, hi = scale_range
                area = a.shape[0] * a.shape[1] * rng.uniform(lo, hi)
                side = int(round(np.sqrt(area)))
                side = max(min(side, a.shape[0], a.shape[1]), 32)
                y = rng.integers(0, a.shape[0] - side + 1)
                x = rng.integers(0, a.shape[1] - side + 1)
                crop = Image.fromarray(a[y : y + side, x : x + side]).resize(
                    (img_size, img_size), Image.BICUBIC
                )
                self.crops[i] = np.asarray(crop, np.uint8)
                # score the resized crop via the canonical PIL-gray path
                # (load_gray rationale: gray MUST come from what is trained on)
                self.scores[i] = total_score_for_image(
                    np.asarray(crop.convert("L"), np.uint8)
                )
            else:
                y = rng.integers(0, a.shape[0] - img_size + 1)
                x = rng.integers(0, a.shape[1] - img_size + 1)
                self.crops[i] = a[y : y + img_size, x : x + img_size]
                self.scores[i] = total_score_for_image(
                    g[y : y + img_size, x : x + img_size]
                )
            if verbose and i % 512 == 0:
                print(f"pool {i}/{pool_size}", flush=True)

    def __len__(self) -> int:
        return len(self.crops)

    def batch(
        self, idx: np.ndarray, normalize: bool = True
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(imgs CHW float32, scores) for the given pool indices."""
        b = self.crops[idx].astype(np.float32) / 255.0
        if normalize:
            b = (b - IMAGENET_MEAN.reshape(1, 1, 1, 3)) / IMAGENET_STD.reshape(
                1, 1, 1, 3
            )
        return b.transpose(0, 3, 1, 2), self.scores[idx]

    def to_device(self, normalize: bool = True):
        """Upload the uint8 pool to the accelerator ONCE and return a jitted
        gather: indices -> (imgs (B,C,H,W) f32, scores (B,196)) assembled
        entirely on device.

        Per-step host->device traffic drops from the full float batch (~4.8 MB
        at batch 8, ~240 ms over a 20 MB/s remote-attach tunnel — measured to
        dominate the ~50 ms train step) to the index vector. Matches `batch()`
        to float rounding (XLA folds the /255 and /std into reciprocal
        multiplies, so the last ulp can differ from numpy).
        """
        import jax
        import jax.numpy as jnp

        # The pool MUST be a jit *argument*, not a closure capture: a captured
        # device array becomes a compile-time constant embedded in the HLO, and
        # at pool scale (3072 crops = 462 MB) that blows the remote-compile
        # request past the tunnel's body limit (observed: HTTP 413 on every
        # resume attempt of the round-3 keep-49 sweep). As an argument it is
        # uploaded once by device_put and passed by reference per call.
        crops = jax.device_put(self.crops)
        scores = jax.device_put(self.scores)
        mean = np.float32(IMAGENET_MEAN.reshape(1, 1, 1, 3))
        std = np.float32(IMAGENET_STD.reshape(1, 1, 1, 3))

        @jax.jit
        def gather(crops, scores, idx, flip):
            b = crops[idx].astype(jnp.float32) / 255.0
            if normalize:
                b = (b - mean) / std
            s = scores[idx]
            # horizontal flip augmentation: the quadtree splits, Laplacian
            # magnitude, merge thresholds and 16x16 patch pooling are all
            # mirror-equivariant, so the flipped crop's score map is the
            # mirrored 14x14 score grid (up to float-summation-order ulps) —
            # no host re-scoring needed
            g = int(np.sqrt(s.shape[-1]).round())
            s_f = jnp.flip(s.reshape(-1, g, g), axis=2).reshape(s.shape)
            fl = flip[:, None, None, None]
            b = jnp.where(fl, jnp.flip(b, axis=2), b)
            s = jnp.where(flip[:, None], s_f, s)
            return jnp.transpose(b, (0, 3, 1, 2)), s

        def call(idx, flip=None):
            if flip is None:
                flip = jnp.zeros(idx.shape, bool)
            return gather(crops, scores, idx, flip)

        return call
