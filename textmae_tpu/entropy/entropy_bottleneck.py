"""Factorized-prior entropy model ("EntropyBottleneck") in pure JAX.

From-scratch reimplementation of the learned univariate density of Ballé et al.
(2018), matching the behavioral contract the reference depends on via
compressai (/root/reference/models/Compression/MCM.py:9,71,741-744):

  * a per-channel monotone CDF built from K=5 layers of
    softplus(matrix) @ x + bias, with tanh(factor)*tanh(x) residuals between,
  * likelihood(x) = sigmoid(logits(x+.5)) - sigmoid(logits(x-.5)) with the
    sign trick for numerical symmetry,
  * learnable per-channel `quantiles` (tail targets) trained by the aux
    (quantile) loss — the parameters the reference routes to the aux Adam
    (model_utils.py:67-90 selects "*.quantiles"),
  * `update()` -> integer CDF tables over [median-minima, median+maxima].

Everything in `__call__` is vectorized XLA (VPU-friendly elementwise chains +
tiny per-channel matmuls); `build_eb_tables` is host-side numpy, run once
before entropy coding.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import scipy.special

from textmae_tpu.entropy.tables import CdfTable, pmfs_to_cdf_table
from textmae_tpu.ops.ste import lower_bound


def _logits_cumulative(params: dict, x: jnp.ndarray, stop_gradient: bool) -> jnp.ndarray:
    """x: (C, 1, N) -> logits of the cumulative density, same shape."""
    logits = x
    num_layers = len([k for k in params if k.startswith("matrix_")])
    for i in range(num_layers):
        matrix = params[f"matrix_{i}"]
        bias = params[f"bias_{i}"]
        if stop_gradient:
            matrix = jax.lax.stop_gradient(matrix)
            bias = jax.lax.stop_gradient(bias)
        logits = jnp.einsum("cof,cfn->con", jax.nn.softplus(matrix), logits) + bias
        if f"factor_{i}" in params:
            factor = params[f"factor_{i}"]
            if stop_gradient:
                factor = jax.lax.stop_gradient(factor)
            logits = logits + jnp.tanh(factor) * jnp.tanh(logits)
    return logits


def _likelihood_from_logits(params: dict, v: jnp.ndarray, stop_gradient: bool) -> jnp.ndarray:
    lower = _logits_cumulative(params, v - 0.5, stop_gradient)
    upper = _logits_cumulative(params, v + 0.5, stop_gradient)
    sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
    return jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))


class EntropyBottleneck(nn.Module):
    """Learned factorized prior over a (N, H, W, C) latent (NHWC layout)."""

    channels: int
    filters: Tuple[int, ...] = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9
    likelihood_bound: float = 1e-9

    def setup(self):
        dims = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1 / (len(self.filters) + 1))
        params = {}
        for i in range(len(self.filters) + 1):
            init = float(np.log(np.expm1(1 / scale / dims[i + 1])))
            params[f"matrix_{i}"] = self.param(
                f"matrix_{i}",
                lambda rng, shape, val=init: jnp.full(shape, val, jnp.float32),
                (self.channels, dims[i + 1], dims[i]),
            )
            params[f"bias_{i}"] = self.param(
                f"bias_{i}",
                lambda rng, shape: jax.random.uniform(rng, shape, jnp.float32, -0.5, 0.5),
                (self.channels, dims[i + 1], 1),
            )
            if i < len(self.filters):
                params[f"factor_{i}"] = self.param(
                    f"factor_{i}", nn.initializers.zeros, (self.channels, dims[i + 1], 1)
                )
        self._density_params = params
        self.quantiles = self.param(
            "quantiles",
            lambda rng, shape: jnp.tile(
                jnp.array([-self.init_scale, 0.0, self.init_scale], jnp.float32), (shape[0], 1, 1)
            ),
            (self.channels, 1, 3),
        )

    def medians(self) -> jnp.ndarray:
        """Per-channel median of the learned density, shape (C,)."""
        return self.quantiles[:, 0, 1]

    def aux_loss(self) -> jnp.ndarray:
        """Quantile loss steering `quantiles` to the tail-mass targets
        (compressai CompressionModel.aux_loss, used at utils/engine.py:80)."""
        t = float(np.log(2.0 / self.tail_mass - 1.0))
        target = jnp.array([-t, 0.0, t], jnp.float32)
        logits = _logits_cumulative(self._density_params, self.quantiles, stop_gradient=True)
        return jnp.abs(logits - target[None, None, :]).sum()

    def likelihood(self, z: jnp.ndarray) -> jnp.ndarray:
        """Likelihood of already-quantized/noised values. z: (N, H, W, C)."""
        c = z.shape[-1]
        v = z.transpose(3, 0, 1, 2).reshape(c, 1, -1).astype(jnp.float32)
        lik = _likelihood_from_logits(self._density_params, v, stop_gradient=False)
        lik = lower_bound(lik, jnp.float32(self.likelihood_bound))
        return lik.reshape(c, *((z.shape[0],) + z.shape[1:3])).transpose(1, 2, 3, 0)

    def __call__(
        self, z: jnp.ndarray, rng: Optional[jax.Array] = None, training: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (z_tilde, likelihoods). Training uses additive-uniform noise
        (compressai's 'noise' mode); eval uses round-around-median ('dequantize')."""
        medians = self.medians().reshape(1, 1, 1, -1)
        if training:
            if rng is None:
                raise ValueError("training=True requires an rng for noise quantization")
            noise = jax.random.uniform(rng, z.shape, z.dtype, -0.5, 0.5)
            z_tilde = z + noise
        else:
            z_tilde = jnp.round(z - medians) + medians
        return z_tilde, self.likelihood(z_tilde)


def build_eb_tables(variables: dict) -> CdfTable:
    """Host-side `update()`: integer CDF tables from bound EB parameters.

    `variables` is the param subtree of one EntropyBottleneck
    (keys matrix_i / bias_i / factor_i / quantiles).
    """
    params = {k: np.asarray(v) for k, v in variables.items()}
    quantiles = params.pop("quantiles")
    jparams = {k: jnp.asarray(v) for k, v in params.items()}

    medians = quantiles[:, 0, 1]
    minima = np.maximum(np.ceil(medians - quantiles[:, 0, 0]).astype(np.int32), 0)
    maxima = np.maximum(np.ceil(quantiles[:, 0, 2] - medians).astype(np.int32), 0)
    pmf_start = medians - minima
    pmf_length = minima + maxima + 1
    max_length = int(pmf_length.max())

    samples = np.arange(max_length, dtype=np.float32)[None, None, :] + pmf_start[:, None, None]
    lik = np.asarray(
        _likelihood_from_logits(jparams, jnp.asarray(samples), stop_gradient=True)
    )[:, 0, :]
    lower = np.asarray(
        _logits_cumulative(jparams, jnp.asarray(samples - 0.5), stop_gradient=True)
    )[:, 0, :]
    upper = np.asarray(
        _logits_cumulative(jparams, jnp.asarray(samples + 0.5), stop_gradient=True)
    )[:, 0, :]

    def sigmoid(x):
        return scipy.special.expit(x)  # overflow-safe

    tail_mass = sigmoid(lower[:, 0]) + sigmoid(-upper[:, -1])
    # zero out positions beyond each channel's pmf_length before table build
    return pmfs_to_cdf_table(lik, tail_mass, pmf_length, offset=-minima)
