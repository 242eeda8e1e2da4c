"""SSIM / MS-SSIM in pure JAX.

Replaces pytorch_msssim, which the reference uses both as a training loss
(/root/reference/models/Compression/MCM.py:705-708, win=11 sigma=1.5,
data_range=1) and as an eval metric (/root/reference/testing.py:44-49,
data_range=255). Semantics follow pytorch_msssim: separable gaussian window,
VALID (unpadded) filtering, K=(0.01, 0.03); MS-SSIM uses the standard 5-scale
weights with relu'd contrast terms and odd-size-aware avg-pool downsampling.

Filtering is depthwise separable 1-D convs — XLA maps these onto the VPU and
fuses the elementwise SSIM algebra around them.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_kernel(win_size: int, sigma: float) -> np.ndarray:
    coords = np.arange(win_size, dtype=np.float64) - win_size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _filter2d_separable(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Depthwise valid-mode separable blur. x: (N, C, H, W), win: (K,)."""
    n, c, h, w = x.shape
    k = win.shape[0]
    kern_h = win.reshape(1, 1, k, 1)
    kern_w = win.reshape(1, 1, 1, k)
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, k, 1), ("NCHW", "OIHW", "NCHW"))
    x = x.reshape(n * c, 1, h, w)
    x = jax.lax.conv_general_dilated(x, kern_h.astype(x.dtype), (1, 1), "VALID", dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kern_w.astype(x.dtype), (1, 1), "VALID", dimension_numbers=dn)
    return x.reshape(n, c, x.shape[-2], x.shape[-1])


def _ssim_per_channel(x, y, win, data_range, k1=0.01, k2=0.03):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _filter2d_separable(x, win)
    mu_y = _filter2d_separable(y, win)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = _filter2d_separable(x * x, win) - mu_xx
    sigma_yy = _filter2d_separable(y * y, win) - mu_yy
    sigma_xy = _filter2d_separable(x * y, win) - mu_xy
    cs_map = (2 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim_map = ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs_map
    # mean over spatial dims -> (N, C)
    return ssim_map.mean(axis=(2, 3)), cs_map.mean(axis=(2, 3))


def ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    size_average: bool = True,
) -> jnp.ndarray:
    """Structural similarity of (N, C, H, W) batches."""
    win = jnp.asarray(_gaussian_kernel(win_size, win_sigma))
    ssim_pc, _ = _ssim_per_channel(x.astype(jnp.float32), y.astype(jnp.float32), win, data_range)
    return ssim_pc.mean() if size_average else ssim_pc.mean(axis=1)


def _avg_pool2_padded(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 avg-pool with pytorch_msssim's odd-dimension edge padding."""
    pad_h = x.shape[2] % 2
    pad_w = x.shape[3] % 2
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_h), (0, pad_w)))
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    ) / 4.0


def ms_ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    weights=_MSSSIM_WEIGHTS,
    size_average: bool = True,
) -> jnp.ndarray:
    """Multi-scale SSIM of (N, C, H, W) batches (smallest side must be > (win-1)*2**4)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    win = jnp.asarray(_gaussian_kernel(win_size, win_sigma))
    weights_arr = jnp.asarray(weights, dtype=jnp.float32)
    levels = len(weights)
    mcs = []
    ssim_pc = None
    for i in range(levels):
        ssim_pc, cs = _ssim_per_channel(x, y, win, data_range)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs))
            x = _avg_pool2_padded(x)
            y = _avg_pool2_padded(y)
    ssim_pc = jax.nn.relu(ssim_pc)
    stack = jnp.stack(mcs + [ssim_pc], axis=0)  # (levels, N, C)
    out = jnp.prod(stack ** weights_arr[:, None, None], axis=0)
    return out.mean() if size_average else out.mean(axis=1)
