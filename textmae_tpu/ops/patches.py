"""Image <-> patch-sequence reshapes.

Behavioral parity with the reference patchify/unpatchify
(/root/reference/models/Compression/MCM.py:497-546): NCHW images are split into
non-overlapping p x p patches, flattened row-major as (p, p, c) per patch.

Pure reshape/transpose — XLA compiles these to layout changes, no compute.
"""
from __future__ import annotations

import jax.numpy as jnp


def patchify(imgs: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(N, C, H, W) -> (N, L, patch_size**2 * C), L = (H/p)*(W/p).

    Requires square images with H == W divisible by `patch_size`
    (same contract as MCM.py:511).
    """
    n, c, hh, ww = imgs.shape
    if hh != ww or hh % patch_size:
        raise ValueError(f"images must be square and divisible by {patch_size}, got {imgs.shape}")
    h = w = hh // patch_size
    x = imgs.reshape(n, c, h, patch_size, w, patch_size)
    # nchpwq -> nhwpqc (MCM.py:518)
    x = x.transpose(0, 2, 4, 3, 5, 1)
    return x.reshape(n, h * w, patch_size * patch_size * c)


def unpatchify(patches: jnp.ndarray, patch_size: int, channels: int = 3) -> jnp.ndarray:
    """(N, L, p**2 * C) -> (N, C, H, W). Inverse of :func:`patchify` (MCM.py:524-546)."""
    n, l, d = patches.shape
    h = w = int(round(l ** 0.5))
    if h * w != l:
        raise ValueError(f"token count {l} is not a perfect square")
    if d != patch_size * patch_size * channels:
        raise ValueError(f"token dim {d} != {patch_size}^2 * {channels}")
    x = patches.reshape(n, h, w, patch_size, patch_size, channels)
    # nhwpqc -> nchpwq (MCM.py:544)
    x = x.transpose(0, 5, 1, 3, 2, 4)
    return x.reshape(n, channels, h * patch_size, w * patch_size)
