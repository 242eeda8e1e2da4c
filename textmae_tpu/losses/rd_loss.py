"""Rate-distortion objective.

Exact weights of the reference RateDistortionLoss
(/root/reference/models/Compression/loss/rd_loss.py:14-28):

    bpp  = sum over likelihood tensors of sum(log L) / (-ln2 * N * H * W)
    loss = lmbda * (0.25 * ssim + 10 * L1 + 0.1 * vgg) + bpp

lmbda multiplies *distortion*, not rate (reference quirk, kept).
"""
from __future__ import annotations

import math
from typing import Dict

import jax.numpy as jnp


def rate_distortion_loss(
    output: Dict, target: jnp.ndarray, lmbda: float = 1e-4
) -> Dict[str, jnp.ndarray]:
    n, _, h, w = target.shape
    num_pixels = n * h * w
    bpp = sum(
        jnp.log(lik.astype(jnp.float32)).sum() / (-math.log(2) * num_pixels)
        for lik in output["likelihoods"].values()
    )
    ssim_loss, l1_loss, vgg_loss = output["loss"]
    total = lmbda * (0.25 * ssim_loss + 10.0 * l1_loss + 0.1 * vgg_loss) + bpp
    return {
        "loss": total,
        "bpp_loss": bpp,
        "ssim_loss": ssim_loss,
        "L1_loss": l1_loss,
        "vgg_loss": vgg_loss,
    }


class RateDistortionLoss:
    """Callable wrapper mirroring the reference class API (rd_loss.py:7)."""

    def __init__(self, lmbda: float = 1e-2):
        self.lmbda = lmbda

    def __call__(self, output: Dict, target: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return rate_distortion_loss(output, target, self.lmbda)
