"""Quantization surrogates: straight-through rounding and LowerBound.

These replace the compressai ops the reference imports
(/root/reference/models/Compression/MCM.py:12 `quantize_ste`, and the
LowerBound autograd op used inside compressai's entropy models).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_ste(x: jnp.ndarray) -> jnp.ndarray:
    """round(x) in the forward pass, identity in the backward pass.

    Matches compressai.ops.quantize_ste used at MCM.py:744,776.
    """
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


@jax.custom_vjp
def lower_bound(x: jnp.ndarray, bound: jnp.ndarray) -> jnp.ndarray:
    """max(x, bound) with compressai's LowerBound gradient semantics.

    Gradient passes through when x >= bound OR the incoming gradient pushes x
    up (grad < 0); otherwise it is zeroed. This keeps parameters from getting
    stuck below the bound while still enforcing it in the forward pass.
    """
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)
