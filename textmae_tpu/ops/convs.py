"""Small conv building blocks used by the hyperprior transforms.

Replacements for compressai.layers conv3x3 / subpel_conv3x3
(/root/reference/models/Compression/MCM.py:10,115-162). NHWC layout throughout
(TPU-preferred); channel conventions match torch so that pixel-shuffle output
is bit-compatible with the reference given imported weights.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class Conv3x3(nn.Module):
    out_ch: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # x: (N, H, W, C)
        return nn.Conv(
            self.out_ch,
            kernel_size=(3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            name="conv",
        )(x)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(N, H, W, C*r^2) -> (N, H*r, W*r, C) with torch channel ordering
    (out channel c reads input channel c*r*r + i*r + j)."""
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, i, w, j, c
    return x.reshape(n, h * r, w * r, c)


class SubpelConv3x3(nn.Module):
    """3x3 conv to out_ch * r^2 followed by pixel shuffle (compressai subpel_conv3x3)."""

    out_ch: int
    r: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.out_ch * self.r * self.r,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            name="conv",
        )(x)
        return pixel_shuffle(x, self.r)


class ConvStack1x1(nn.Module):
    """Per-token MLP expressed as 1x1 convs with GELU between (g_a / g_s shape,
    MCM.py:77-112). Last layer has no activation."""

    channels: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, ch in enumerate(self.channels):
            x = nn.Conv(ch, kernel_size=(1, 1), dtype=self.dtype, name=f"conv_{i}")(x)
            if i < len(self.channels) - 1:
                x = nn.gelu(x, approximate=False)
        return x
