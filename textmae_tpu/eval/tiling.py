"""Tiled full-resolution evaluation.

The reference handles arbitrary-resolution images by bicubic-downscaling to
224 (utils/dataloader.py:59-73) — full-res content is simply lost. The
TPU-native alternative (SURVEY.md §5): split the image into independent
224x224 tiles, compute per-tile score maps, and push ALL tiles through the
codec as one batch — pure data parallelism over the tile axis, no sequence
scaling needed (the model's 196-token geometry is untouched).

Edge tiles are reflection-padded to the full tile size and cropped back after
reconstruction; bpp is accounted over the true (unpadded) pixel count.
"""
from __future__ import annotations

import time
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from textmae_tpu.eval.harness import code_side_info
from textmae_tpu.data.score_maps import total_score_for_image
from textmae_tpu.eval.codec import MCMCodec
from textmae_tpu.eval.metrics import compute_metrics


def tile_image(img: np.ndarray, tile: int = 224) -> Tuple[np.ndarray, Dict]:
    """(H, W, 3) float32 [0,1] -> (T, tile, tile, 3) + stitch metadata."""
    h, w, c = img.shape
    ny, nx = -(-h // tile), -(-w // tile)
    pad_y, pad_x = ny * tile - h, nx * tile - w
    padded = np.pad(img, ((0, pad_y), (0, pad_x), (0, 0)), mode="reflect")
    tiles = (
        padded.reshape(ny, tile, nx, tile, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(ny * nx, tile, tile, c)
    )
    return tiles, {"h": h, "w": w, "ny": ny, "nx": nx, "tile": tile}


def untile_image(tiles: np.ndarray, meta: Dict) -> np.ndarray:
    ny, nx, t = meta["ny"], meta["nx"], meta["tile"]
    c = tiles.shape[-1]
    full = (
        tiles.reshape(ny, nx, t, t, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(ny * t, nx * t, c)
    )
    return full[: meta["h"], : meta["w"]]


def inference_tiled(
    codec: MCMCodec, img: np.ndarray, tile: int = 224, normalize: bool = False
) -> Dict[str, float]:
    """Full-resolution round trip: tile -> batch codec -> stitch.

    img: (H, W, 3) float32 in [0, 1]. Returns metrics at FULL resolution plus
    the reconstruction under "x_hat".

    normalize: feed ImageNet-normalized tiles to the model and de-normalize
    the reconstruction — REQUIRED for checkpoints trained with --normalize
    (e.g. the committed distribution checkpoints); raw [0,1] tiles through a
    normalized-trained model decode garbage (the ADVICE-r2 misconfiguration
    class, on the tiled surface). Metrics are always in raw pixel space.
    """
    tiles, meta = tile_image(img, tile)
    # BT.601 luma, matching cv2 IMREAD_GRAYSCALE / PIL convert("L") used by
    # every other score-map path — an unweighted mean shifts chromatic
    # regions across the structure map's fixed binarization thresholds
    luma = np.array([0.299, 0.587, 0.114], np.float32)
    grays = ((tiles @ luma) * 255).astype(np.uint8)
    # score-map resolution follows the tile size so the patch grid matches
    scores = np.stack([total_score_for_image(g, (tile, tile)) for g in grays])

    imgs_j = jnp.asarray(tiles.transpose(0, 3, 1, 2))
    if normalize:
        from textmae_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD

        mean = jnp.asarray(IMAGENET_MEAN).reshape(1, 3, 1, 1)
        std = jnp.asarray(IMAGENET_STD).reshape(1, 3, 1, 1)
        imgs_j = (imgs_j - mean) / std
    scores_j = jnp.asarray(scores)

    start = time.time()
    streams, ids_restore = codec.compress(imgs_j, scores_j)
    payloads, ids = code_side_info(
        ids_restore, codec.cfg.num_keep_patches, codec.cfg.canonical_keep_order
    )
    enc_time = time.time() - start

    start = time.time()
    x_hat = codec.decompress(streams, ids)
    x_hat = np.asarray(jax.block_until_ready(x_hat))
    dec_time = time.time() - start

    if normalize:
        x_hat = x_hat * np.asarray(std) + np.asarray(mean)
    recon = untile_image(
        np.clip(x_hat.transpose(0, 2, 3, 1), 0.0, 1.0), meta
    )
    num_pixels = meta["h"] * meta["w"]
    total_bits = sum(s.num_bits() for s in streams) + sum(len(p) * 8 for p in payloads)
    metrics = compute_metrics(
        jnp.asarray(img.transpose(2, 0, 1))[None],
        jnp.asarray(recon.transpose(2, 0, 1))[None],
    )
    return {
        **metrics,
        "bpp": total_bits / num_pixels,
        "num_tiles": len(streams),
        "encoding_time": enc_time,
        "decoding_time": dec_time,
        "x_hat": recon,
    }
