"""Batch evaluation harness: real-codec and entropy-estimation inference.

Behavior parity with /root/reference/testing.py:60-165 — per-image metrics
(PSNR, MS-SSIM, bpp, enc/dec wall time), bpp accounted as bitstream bytes x 8
plus the entropy-coded ids_restore side info over the input pixel count
(testing.py:88-89), averaged over the dataset, JSON report.

Fixes applied (documented divergences, SURVEY.md §7):
  * entropy-estimation mode passes total_scores (the reference's call at
    testing.py:107 omits them and crashes),
  * reconstructions are optionally saved resized to the original image size
    (testing.py:52-57) via PIL on the host.
"""
from __future__ import annotations

import json
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from functools import lru_cache

from textmae_tpu.coding.permutation import PermutationCoder
from textmae_tpu.coding.subset import SubsetCoder, ids_restore_from_kept
from textmae_tpu.eval.codec import MCMCodec
from textmae_tpu.eval.metrics import compute_metrics


# coder construction precomputes the per-state CDF table (~K*L rows) in
# Python; memoize it — the coders themselves are stateless per compress/
# decompress call, so sharing across calls and threads is safe
@lru_cache(maxsize=8)
def _subset_coder(length: int, k: int) -> SubsetCoder:
    return SubsetCoder(length, k)


@lru_cache(maxsize=8)
def _perm_coder(length: int) -> PermutationCoder:
    return PermutationCoder(length)


def encode_side_info(
    ids_restore: np.ndarray, num_keep: int, canonical: bool
) -> list:
    """Entropy-code ids_restore per image -> payload bytes (encode only).

    canonical keep order -> the kept SET suffices (~log2 C(L,K) bits,
    SubsetCoder); reference order -> the full permutation (~log2 L!,
    PermutationCoder). Both beat the reference's Huffman (testing.py:73-76).
    """
    n, length = ids_restore.shape
    if canonical:
        coder = _subset_coder(length, num_keep)
        return [
            coder.compress(np.sort(np.argsort(ids_restore[i])[:num_keep]))
            for i in range(n)
        ]
    coder = _perm_coder(length)
    return [coder.compress(ids_restore[i]) for i in range(n)]


def code_side_info(ids_restore: np.ndarray, num_keep: int, canonical: bool):
    """encode_side_info + decode back: (payloads, decoded ids). The eval
    harness feeds the DECODED ids to decompress, proving the side-info
    round trip on every measured image (testing.py:74-76's pattern)."""
    n, length = ids_restore.shape
    payloads = encode_side_info(ids_restore, num_keep, canonical)
    ids = np.stack(
        [decode_side_info(p, length, num_keep, canonical) for p in payloads]
    )
    return payloads, ids


def decode_side_info(
    payload: bytes, num_patches: int, num_keep: int, canonical: bool
) -> np.ndarray:
    """Inverse of one image's code_side_info payload -> ids_restore (L,)."""
    if canonical:
        kept = _subset_coder(num_patches, num_keep).decompress(payload)
        return ids_restore_from_kept(kept, num_patches)
    return _perm_coder(num_patches).decompress(payload)


def _denormalize(x: jnp.ndarray) -> jnp.ndarray:
    """ImageNet de-normalization (CHW batch) back to [0,1] pixel space."""
    from textmae_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD

    return x * IMAGENET_STD.reshape(1, 3, 1, 1) + IMAGENET_MEAN.reshape(1, 3, 1, 1)


def inference(
    codec: MCMCodec, imgs: jnp.ndarray, scores: jnp.ndarray,
    denormalize: bool = False,
) -> Dict[str, float]:
    """Real-bitstream round trip for a batch; returns averaged metrics.

    denormalize=True: inputs are ImageNet-normalized (the model's training
    distribution); metrics are computed in raw pixel space by de-normalizing
    both sides. The reference's test path instead feeds raw pixels to a
    model trained on normalized ones (dataloader.py:57-73) — a documented
    train/test mismatch that caps measurable quality.
    """
    n, _, h, w = imgs.shape
    num_pixels = h * w

    start = time.time()
    streams, ids_restore = codec.compress(imgs, scores)
    enc_time = time.time() - start

    payloads, ids_decoded = code_side_info(
        ids_restore, codec.cfg.num_keep_patches, codec.cfg.canonical_keep_order
    )

    start = time.time()
    x_hat = codec.decompress(streams, ids_decoded)
    x_hat = jax.block_until_ready(x_hat)
    dec_time = time.time() - start

    if denormalize:
        x_hat = _denormalize(x_hat)
        metrics = compute_metrics(_denormalize(imgs), x_hat)
    else:
        metrics = compute_metrics(imgs, x_hat)
    stream_bpp = float(np.mean([s.num_bits() / num_pixels for s in streams]))
    side_bpp = float(np.mean([len(p) * 8 / num_pixels for p in payloads]))
    return {
        **metrics,
        # total bpp = bitstreams + Huffman'd ids_restore side info
        # (testing.py:88-89 accounting)
        "bpp": stream_bpp + side_bpp,
        "bpp_streams": stream_bpp,
        "bpp_side_info": side_bpp,
        "encoding_time": enc_time / n,
        "decoding_time": dec_time / n,
        "x_hat": x_hat,
    }


@lru_cache(maxsize=4)
def _entropy_estimation_fn(model):
    """Jitted forward+bits for `model`, cached so repeated eval batches reuse
    one compiled program (a per-call @jax.jit closure would retrace and
    recompile the full MCM forward for every batch)."""

    @jax.jit
    def run(v, x, s):
        out = model.apply(v, x, s, training=False, compute_loss=False)
        nbits = sum(
            jnp.log(lik).sum() for lik in out["likelihoods"].values()
        ) / (-np.log(2))
        return out["x_hat"], nbits

    return run


def inference_entropy_estimation(
    model, variables, imgs: jnp.ndarray, scores: jnp.ndarray,
    denormalize: bool = False,
) -> Dict[str, float]:
    """Forward-pass bpp from likelihoods (testing.py:103-120, signature fixed)."""
    n, _, h, w = imgs.shape
    num_pixels = n * h * w

    run = _entropy_estimation_fn(model)
    start = time.time()
    x_hat, nbits = run(variables, imgs, scores)
    bpp = nbits / num_pixels
    x_hat = jax.block_until_ready(x_hat)
    elapsed = time.time() - start
    if denormalize:
        x_hat = _denormalize(x_hat)
        metrics = compute_metrics(_denormalize(imgs), x_hat)
    else:
        metrics = compute_metrics(imgs, x_hat)
    return {
        **metrics,
        "bpp": float(bpp),
        "encoding_time": elapsed / 2,
        "decoding_time": elapsed / 2,
        "x_hat": x_hat,
    }


def _save_recon(x_hat: np.ndarray, orig_size, path: Path):
    from PIL import Image

    arr = np.clip(np.asarray(x_hat), 0, 1)
    arr = (arr.transpose(1, 2, 0) * 255).round().astype(np.uint8)
    Image.fromarray(arr).resize(tuple(orig_size), Image.BICUBIC).save(path)


def eval_model(
    codec_or_model,
    dataset,
    entropy_estimation: bool = False,
    variables=None,
    batch_size: int = 1,
    output_dir: Optional[Path] = None,
    verbose: bool = False,
    pipeline: int = 1,
    denormalize: bool = False,
) -> Dict[str, float]:
    """Loop a dataset through inference, average metrics (testing.py:128-165).

    denormalize=True pairs with a dataset that ImageNet-normalizes its
    images: metrics and saved reconstructions come out in raw pixel space.

    pipeline > 1 runs that many batches' round trips on worker threads so one
    batch's host-bound decode alternation overlaps another's device-bound
    compress (the same trick that takes bench.py past the throughput target).
    Timing metrics then reflect wall-clock per overlapped batch.
    """
    agg = defaultdict(float)
    count = 0
    out_dir = Path(output_dir) if output_dir else None
    if out_dir:
        out_dir.mkdir(parents=True, exist_ok=True)

    def run_batch(start: int):
        idxs = range(start, min(start + batch_size, len(dataset)))
        samples = [dataset[i] for i in idxs]
        imgs = jnp.asarray(
            np.stack([s[0] for s in samples]).transpose(0, 3, 1, 2)
        )
        scores = jnp.asarray(np.stack([s[2] for s in samples]))
        if entropy_estimation:
            res = inference_entropy_estimation(
                codec_or_model, variables, imgs, scores, denormalize=denormalize
            )
        else:
            res = inference(codec_or_model, imgs, scores, denormalize=denormalize)
        return idxs, samples, res

    starts = list(range(0, len(dataset), batch_size))
    pool = None
    try:
        if pipeline > 1:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(pipeline)
            results = pool.map(run_batch, starts)
        else:
            results = map(run_batch, starts)

        for idxs, samples, res in results:
            x_hat = res.pop("x_hat")
            if out_dir is not None:
                for j, i in enumerate(idxs):
                    name = Path(dataset.files[i]).stem
                    _save_recon(np.asarray(x_hat[j]), samples[j][1], out_dir / f"{name}_rec.png")
            for k, v in res.items():
                agg[k] += float(v) * len(samples)
            count += len(samples)
            if verbose:
                print(f"[{count}/{len(dataset)}] " + json.dumps(res), flush=True)
    finally:
        if pool is not None:
            # on an exception mid-iteration, stop queued batches instead of
            # letting them keep driving the device behind the caller's back
            pool.shutdown(wait=False, cancel_futures=True)

    return {k: v / count for k, v in agg.items()}


def write_report(results: Dict, path: Path, description: str = "Inference (ans)"):
    """JSON report (testing.py:242-250 schema)."""
    report = {
        "name": "textmae_tpu-mcm",
        "description": description,
        "results": results,
    }
    Path(path).write_text(json.dumps(report, indent=2))
    return report
