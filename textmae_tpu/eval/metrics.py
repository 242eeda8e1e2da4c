"""Image quality metrics with the reference's exact evaluation conventions.

compute_metrics (/root/reference/testing.py:33-49): inputs clamped to [0,1],
scaled x255 and rounded before PSNR and MS-SSIM.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from textmae_tpu.ops.ssim import ms_ssim


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 255.0) -> jnp.ndarray:
    """PSNR; for batched 4-D (N, C, H, W) input, the mean of per-image PSNRs
    (the reference's per-image accounting, testing.py:44-49 + :159-164 —
    pooling MSE across the batch before the log would let one hard image
    dominate and make the average depend on batch size). Unbatched (C, H, W)
    or (H, W) input gets whole-image PSNR."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    axes = tuple(range(1, a.ndim)) if a.ndim == 4 else ()
    mse = jnp.mean((a - b) ** 2, axis=axes) if axes else jnp.mean((a - b) ** 2)
    return jnp.mean(20 * jnp.log10(max_val) - 10 * jnp.log10(mse))


def compute_metrics(org: jnp.ndarray, rec: jnp.ndarray, max_val: float = 255.0) -> Dict[str, float]:
    """org/rec: (N, C, H, W) in [0, 1]. Returns {psnr, ms-ssim} floats.

    MS-SSIM's 5 dyadic scales need min(H, W) > 160 (as pytorch_msssim asserts);
    smaller inputs fall back to single-scale SSIM under the same key.
    """
    from textmae_tpu.ops.ssim import ssim

    org = jnp.round(jnp.clip(org, 0, 1) * max_val)
    rec = jnp.round(jnp.clip(rec, 0, 1) * max_val)
    small = min(org.shape[-2], org.shape[-1]) <= 160
    quality = ssim if small else ms_ssim
    return {
        "psnr": float(psnr(org, rec, max_val)),
        "ms-ssim": float(quality(rec, org, data_range=max_val)),
    }
