"""Conditional Gaussian entropy model, pure functions.

Replaces compressai's GaussianConditional
(/root/reference/models/Compression/MCM.py:10,72,771-776,867-869): zero-mean
Gaussian over (y - mu) with a lower-bounded scale, a 64-entry log-spaced scale
table for indexed range coding, and noise/round quantization modes.

No learnable parameters -> plain jnp functions that fuse into the surrounding
slice computation under jit.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.special
import scipy.stats

from textmae_tpu.entropy.tables import CdfTable, pmfs_to_cdf_table
from textmae_tpu.ops.ste import lower_bound

SCALE_MIN = 0.11
SCALE_MAX = 256.0
SCALE_LEVELS = 64
LIKELIHOOD_BOUND = 1e-9
TAIL_MASS = 1e-9


def get_scale_table(
    scale_min: float = SCALE_MIN, scale_max: float = SCALE_MAX, levels: int = SCALE_LEVELS
) -> np.ndarray:
    """exp-linspace scale table (compressai get_scale_table default)."""
    return np.exp(np.linspace(np.log(scale_min), np.log(scale_max), levels)).astype(np.float32)


def _std_cumulative(x: jnp.ndarray) -> jnp.ndarray:
    """Standard normal CDF via erfc: 0.5 * erfc(-x / sqrt(2))."""
    return 0.5 * jax.lax.erfc(-x * (2 ** -0.5))


def gaussian_likelihood(
    y: jnp.ndarray,
    scales: jnp.ndarray,
    means: Optional[jnp.ndarray] = None,
    scale_bound: float = SCALE_MIN,
    likelihood_bound: float = LIKELIHOOD_BOUND,
) -> jnp.ndarray:
    """P(round(y) | mu, sigma) of already-quantized/noised y."""
    values = y - means if means is not None else y
    scales = lower_bound(scales.astype(jnp.float32), jnp.float32(scale_bound))
    values = jnp.abs(values.astype(jnp.float32))
    upper = _std_cumulative((0.5 - values) / scales)
    lower = _std_cumulative((-0.5 - values) / scales)
    return lower_bound(upper - lower, jnp.float32(likelihood_bound))


def gaussian_noise_quantize(
    y: jnp.ndarray, rng: jax.Array
) -> jnp.ndarray:
    """Additive-uniform noise surrogate used for training likelihoods."""
    return y + jax.random.uniform(rng, y.shape, y.dtype, -0.5, 0.5)


def gaussian_build_indexes(scales: jnp.ndarray, scale_table: jnp.ndarray) -> jnp.ndarray:
    """Index of the smallest table scale >= scale (clipped to the last entry).

    Matches compressai GaussianConditional.build_indexes (used at MCM.py:867).
    """
    scales = lower_bound(scales.astype(jnp.float32), jnp.float32(scale_table[0]))
    return jnp.searchsorted(
        jnp.asarray(scale_table), scales, side="left"
    ).clip(0, len(scale_table) - 1).astype(jnp.int32)


def gaussian_quantize_symbols(y: jnp.ndarray, means: jnp.ndarray) -> jnp.ndarray:
    """round(y - mu) as int32 symbols (compressai quantize(.., 'symbols', mu))."""
    return jnp.round(y - means).astype(jnp.int32)


def gaussian_dequantize(symbols: jnp.ndarray, means: jnp.ndarray) -> jnp.ndarray:
    return symbols.astype(jnp.float32) + means


def build_gaussian_tables(scale_table: np.ndarray, tail_mass: float = TAIL_MASS) -> CdfTable:
    """Host-side `update_scale_table()`: per-scale integer CDFs.

    For each table scale, the PMF covers [-pmf_center, pmf_center] where
    pmf_center = ceil(scale * multiplier) and multiplier = -Phi^-1(tail/2).
    """
    scale_table = np.asarray(scale_table, dtype=np.float64)
    multiplier = -scipy.stats.norm.ppf(tail_mass / 2)
    pmf_center = np.ceil(scale_table * multiplier).astype(np.int64)
    pmf_length = (2 * pmf_center + 1).astype(np.int64)
    max_length = int(pmf_length.max())

    samples = np.abs(np.arange(max_length, dtype=np.int64)[None, :] - pmf_center[:, None])
    s = scale_table[:, None]
    upper = 0.5 * scipy.special.erfc(-((0.5 - samples) / s) / np.sqrt(2))
    lower = 0.5 * scipy.special.erfc(-((-0.5 - samples) / s) / np.sqrt(2))
    pmf = upper - lower
    tail = 2 * lower[:, 0]
    return pmfs_to_cdf_table(pmf, tail, pmf_length, offset=-pmf_center)
