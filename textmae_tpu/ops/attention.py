"""Fused multi-head attention for the MCM/MAE token lengths (145–197 tokens).

The reference uses vanilla timm attention inside `Block`
(/root/reference/models/Compression/MCM.py:313-322). Here the forward pass is a
single-block Pallas kernel: for each (batch, head) the full (S, D) q/k/v tiles
live in VMEM, scores+softmax+PV run fused without HBM round-trips. At S<=256,
D=64 everything fits comfortably (3*S*D*4B ≈ 150 KiB per program).

Backward pass recomputes via the jnp reference path (cheap at these sizes, and
keeps a single source of truth for gradients).

Measured on v5e (examples/attn_bench.py, round 2): with the grouped grid
(several (batch, head) slices per program) the kernel BEATS XLA's fused
attention at the d=64 model shapes — (24,12,145,64) f32: 0.067 ms vs 0.082
(1.21x, group 1); (256,12,145,64): 3.97 vs 4.67 ms f32 (1.18x) and 2.67 vs
5.32 ms bf16 (2.00x), group 16. d=32 decoder shapes run faster through XLA
(0.62-0.89x in-kernel), so `fused_attention` routes head_dim < 64 there.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU builds too, but guard for safety
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False


def attention_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(B, H, S, D) reference attention in plain jnp (XLA-fused)."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, group: int):
    # `group` (batch, head) slices per program: amortizes program dispatch /
    # HBM->VMEM pipeline startup over more MXU work (the per-slice matmuls
    # are tiny at S<=197, D<=64, so dispatch overhead is material)
    for g in range(group):
        q = q_ref[g]
        k = k_ref[g]
        v = v_ref[g]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[g] = o.astype(o_ref.dtype)


def _attention_pallas(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, group: int = 0
) -> jnp.ndarray:
    b, h, s, d = q.shape
    scale = d ** -0.5
    bh = b * h
    if group <= 0:
        # measured on v5e (examples/attn_bench.py, 2026-08): small grids run
        # best one slice per program (1.21x vs XLA at (24,12,145,64) f32);
        # large grids amortize dispatch with 16 slices per program (1.18x f32
        # / 2.00x bf16 at (256,12,145,64))
        group = 1 if bh <= 512 else 16
    while bh % group:  # largest divisor of b*h not above the requested group
        group -= 1
    qf = q.reshape(bh, s, d)
    kf = k.reshape(bh, s, d)
    vf = v.reshape(bh, s, d)
    spec = pl.BlockSpec((group, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale, group=group),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        grid=(bh // group,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
    )(qf, kf, vf)
    return out.reshape(b, h, s, d)


@jax.custom_vjp
def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Fused attention: Pallas forward on TPU, jnp gradient via recompute."""
    return _attention_pallas(q, k, v)


def _attention_fwd(q, k, v):
    return _attention_pallas(q, k, v), (q, k, v)


def _attention_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(attention_reference, q, k, v)
    return vjp(g)


attention.defvjp(_attention_fwd, _attention_bwd)


def fused_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, use_pallas: bool = True
) -> jnp.ndarray:
    """Dispatch between the Pallas kernel and the jnp reference path.

    The jnp path is used on CPU (tests / virtual multi-device meshes) and
    whenever the caller is running under a sharded jit where the pallas_call
    would block SPMD partitioning of the (batch, head) grid.
    """
    # head_dim < 64 leaves the MXU contraction lanes half-empty in the
    # kernel while XLA folds the tiny dots into its own fusion better
    # (measured: 0.62-0.89x at (24,16,197,32)); route those to XLA
    if use_pallas and _HAS_PLTPU and q.shape[-1] >= 64 and jax.default_backend() == "tpu":
        return attention(q, k, v)
    return attention_reference(q, k, v)
