"""Tiled full-resolution evaluation.

The reference handles arbitrary-resolution images by bicubic-downscaling to
224 (utils/dataloader.py:59-73) — full-res content is simply lost. The
TPU-native alternative (SURVEY.md §5): split the image into independent
224x224 tiles, compute per-tile score maps, and push ALL tiles through the
codec as one batch — pure data parallelism over the tile axis, no sequence
scaling needed (the model's 196-token geometry is untouched).

Edge tiles are reflection-padded to the full tile size and cropped back after
reconstruction; bpp is accounted over the true (unpadded) pixel count.

Adaptive mode (VERDICT r4 Next #4) adds two codec-layer levers on top:
  * per-tile rate allocation — each tile picks its keep count (e.g. 49/100/
    144) from its own score-map mass, flat tiles spending fewer tokens; the
    2-bit choice rides in the stream accounting. One set of weights serves
    every rate: the towers are shape-generic (the MAE encoder/decoder were
    pretrained under random masking ratios, and the hyper/slice conv stacks
    run on any grid), so the per-keep codecs share params.
  * overlapped tiles with blended stitching — tiles overlap by a margin and
    the reconstructions are feathered together with linear ramps, removing
    the block-boundary seams of naive abutting tiles at a small, explicit
    rate cost ((t/(t-ov))^2 per axis).
"""
from __future__ import annotations

import time
from typing import Dict, List, Sequence, Tuple

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


def tile_positions(size: int, tile: int, overlap: int) -> List[int]:
    """Start offsets covering [0, size) with `tile`-long windows overlapping
    by >= `overlap` (the final window is right-aligned)."""
    if size <= tile:
        return [0]
    stride = tile - overlap
    starts = list(range(0, size - tile, stride))
    starts.append(size - tile)
    return starts


def tile_image_overlap(
    img: np.ndarray, tile: int, overlap: int
) -> Tuple[np.ndarray, Dict]:
    """(H, W, 3) -> (T, tile, tile, 3) overlapping windows + stitch meta.
    Images smaller than the tile are reflection-padded (as tile_image)."""
    h, w, c = img.shape
    pad_y, pad_x = max(tile - h, 0), max(tile - w, 0)
    if pad_y or pad_x:
        img = np.pad(img, ((0, pad_y), (0, pad_x), (0, 0)), mode="reflect")
    ys = tile_positions(img.shape[0], tile, overlap)
    xs = tile_positions(img.shape[1], tile, overlap)
    tiles = np.stack(
        [img[y : y + tile, x : x + tile] for y in ys for x in xs]
    )
    return tiles, {"h": h, "w": w, "ys": ys, "xs": xs, "tile": tile}


def _ramp_weights(starts: Sequence[int], tile: int, size: int) -> np.ndarray:
    """(T, tile) feather weights along one axis: linear ramps over the
    overlap between consecutive windows, constant 1 elsewhere. Weights of
    overlapping windows sum to 1 at every pixel."""
    w = np.ones((len(starts), tile), np.float32)
    for i in range(1, len(starts)):
        ov = starts[i - 1] + tile - starts[i]
        if ov > 0:
            ramp = (np.arange(ov, dtype=np.float32) + 1.0) / (ov + 1.0)
            w[i, :ov] = ramp  # fade this window in...
            w[i - 1, tile - ov :] = 1.0 - ramp  # ...as the previous fades out
    return w


def stitch_blend(tiles: np.ndarray, meta: Dict) -> np.ndarray:
    """Inverse of tile_image_overlap with feathered (ramp-blended) seams."""
    ys, xs, t = meta["ys"], meta["xs"], meta["tile"]
    hh = ys[-1] + t
    ww = xs[-1] + t
    c = tiles.shape[-1]
    out = np.zeros((hh, ww, c), np.float32)
    wy = _ramp_weights(ys, t, hh)
    wx = _ramp_weights(xs, t, ww)
    k = 0
    for i, y in enumerate(ys):
        for j, x in enumerate(xs):
            wmap = wy[i][:, None] * wx[j][None, :]
            out[y : y + t, x : x + t] += tiles[k] * wmap[..., None]
            k += 1
    return out[: meta["h"], : meta["w"]]


def choose_tile_keeps(
    scores: np.ndarray, keep_options: Sequence[int], num_patches: int
) -> np.ndarray:
    """Per-tile keep counts from score-map mass.

    scores: (T, num_patches) per-tile score maps. A tile's detail mass is the
    fraction of patches whose score clears the mean patch score of the whole
    image — flat tiles (sky, walls) have few salient patches and get the
    smallest keep; busy tiles get the largest. Thresholds split the keep
    ladder evenly over the [0, 1] salient-fraction range.
    """
    opts = sorted(keep_options)
    salient = (scores > scores.mean()).mean(axis=1)  # (T,) in [0, 1]
    edges = np.linspace(0.0, 1.0, len(opts) + 1)[1:-1]
    idx = np.searchsorted(edges, salient, side="right")
    return np.asarray([opts[i] for i in idx], np.int32)


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


def make_keep_codecs(
    model, variables, keep_options: Sequence[int], **codec_kw
) -> Dict[int, MCMCodec]:
    """One updated MCMCodec per keep count, ALL SHARING `variables`.

    Valid because every tower is shape-generic in the keep grid: the MAE
    encoder/decoder were pretrained under random masking, the h_a/h_s and
    slice conv stacks run on any grid >= 4 (mcm.py run_h_s crop). Each codec
    still builds its own entropy tables (the gaussian scale table is config-
    independent, the factorized prior is shared weights).
    """
    import dataclasses

    codecs = {}
    for k in sorted(keep_options):
        cfg_k = dataclasses.replace(model.config, num_keep_patches=int(k))
        codec = MCMCodec(type(model)(cfg_k), variables, **codec_kw)
        codec.update(force=True)
        codecs[int(k)] = codec
    return codecs


def inference_tiled_adaptive(
    codecs: Dict[int, MCMCodec],
    img: np.ndarray,
    tile: int = 224,
    overlap: int = 16,
    normalize: bool = False,
    pad_buckets: Sequence[int] = (),
) -> Dict[str, float]:
    """Full-resolution round trip with per-tile rate allocation + feathered
    overlap stitching (VERDICT r4 Next #4).

    codecs: {keep: codec} from make_keep_codecs (shared weights). Each tile
    picks its keep from its score-map mass (choose_tile_keeps); tiles sharing
    a keep batch through that codec together. Rate accounting adds
    ceil(log2(len(codecs))) bits per tile for the keep choice.

    pad_buckets: optional ascending batch sizes; each keep group is padded
    (tile repetition) up to the smallest bucket >= its size so the device
    programs compile for a handful of shapes instead of one per (keep,
    group-size) pair — content-dependent group sizes otherwise force a fresh
    XLA compile per image. Padding is dropped before stitching and excluded
    from the rate.
    """
    keeps_avail = sorted(codecs)
    any_codec = codecs[keeps_avail[0]]
    tiles, meta = tile_image_overlap(img, tile, overlap)
    luma = np.array([0.299, 0.587, 0.114], np.float32)
    grays = ((tiles @ luma) * 255).astype(np.uint8)
    scores = np.stack([total_score_for_image(g, (tile, tile)) for g in grays])
    num_patches = scores.shape[1]
    tile_keeps = choose_tile_keeps(scores, keeps_avail, num_patches)

    imgs_j = jnp.asarray(tiles.transpose(0, 3, 1, 2))
    if normalize:
        from textmae_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD

        mean = jnp.asarray(IMAGENET_MEAN).reshape(1, 3, 1, 1)
        std = jnp.asarray(IMAGENET_STD).reshape(1, 3, 1, 1)
        imgs_j = (imgs_j - mean) / std
    scores_j = jnp.asarray(scores)

    x_hat = np.zeros(tiles.shape, np.float32)  # NHWC
    total_bits = 0
    enc_time = dec_time = 0.0
    used = {}
    for k in keeps_avail:
        sel = np.nonzero(tile_keeps == k)[0]
        if sel.size == 0:
            continue
        used[k] = int(sel.size)
        codec = codecs[k]
        run = sel
        for b in sorted(pad_buckets):
            if b >= sel.size:
                run = np.concatenate([sel, np.full(b - sel.size, sel[-1])])
                break
        t0 = time.time()
        streams, ids_restore = codec.compress(imgs_j[run], scores_j[run])
        payloads, ids = code_side_info(
            ids_restore, codec.cfg.num_keep_patches, codec.cfg.canonical_keep_order
        )
        enc_time += time.time() - t0
        t0 = time.time()
        xh = np.asarray(jax.block_until_ready(codec.decompress(streams, ids)))
        dec_time += time.time() - t0
        xh = xh[: sel.size]
        if normalize:
            xh = xh * np.asarray(std) + np.asarray(mean)
        x_hat[sel] = np.clip(xh.transpose(0, 2, 3, 1), 0.0, 1.0)
        total_bits += sum(s.num_bits() for s in streams[: sel.size])
        total_bits += sum(len(p) * 8 for p in payloads[: sel.size])
    total_bits += len(tiles) * max((len(keeps_avail) - 1).bit_length(), 1)

    recon = stitch_blend(x_hat, meta)
    num_pixels = meta["h"] * meta["w"]
    metrics = compute_metrics(
        jnp.asarray(img.transpose(2, 0, 1))[None],
        jnp.asarray(np.ascontiguousarray(recon.transpose(2, 0, 1)))[None],
    )
    return {
        **metrics,
        "bpp": total_bits / num_pixels,
        "num_tiles": len(tiles),
        "tile_keeps": {str(k): v for k, v in used.items()},
        "encoding_time": enc_time,
        "decoding_time": dec_time,
        "x_hat": recon,
    }
