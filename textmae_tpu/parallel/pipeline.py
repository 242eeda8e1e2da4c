"""GPipe-style pipeline parallelism for transformer stacks.

The reference's only parallelism is DDP data parallel
(/root/reference/models/MAE/util/misc.py:216-248; SURVEY.md §2.8); this
framework already adds Megatron-style tensor parallelism
(parallel/sharding_rules.py). This module adds the third axis: pipeline
parallelism over a "pipe" mesh axis, for deep stacks (MAE ViT-L/H
pretraining: 24/32 blocks) whose parameters outgrow one chip's HBM or whose
depth maps naturally onto a chain of chips.

Design — the standard TPU scan pipeline (one XLA program, no data-dependent
Python control flow):

  * the per-layer block params are STACKED on a new leading `depth` axis and
    sharded over "pipe": each of the P stages holds depth/P contiguous layers
    in its own HBM (this is the memory win);
  * inside `shard_map`, each stage applies its local layers with `lax.scan`
    over the stacked params;
  * microbatches flow stage-to-stage with `lax.ppermute` over ICI; a scan
    over M + P - 1 "ticks" drives the whole schedule. Stage p is busy during
    ticks [p, p + M), i.e. the classic GPipe bubble of (P-1)/(M+P-1) idle
    fraction — choose M >= P for >= 50% utilization.

Differentiable end-to-end (ppermute's transpose is ppermute, scan's is scan),
so the same helper serves pipelined training steps.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "stack_layer_params",
    "unstack_layer_params",
    "pipeline_apply",
    "pipelined_stack_apply",
]


def stack_layer_params(params, depth: int, prefix: str = "blocks_"):
    """Stack per-layer param subtrees f"{prefix}{i}" on a new leading axis.

    All models in this framework name their transformer layers
    f"{prefix}{i}" (models/mcm.py, models/mae.py, models/vit.py), so one
    helper covers them all. Returns a pytree whose leaves have shape
    (depth, *leaf.shape).
    """
    layers = []
    for i in range(depth):
        key = f"{prefix}{i}"
        if key not in params:
            raise KeyError(f"params has no layer {key!r}")
        layers.append(params[key])
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def unstack_layer_params(stacked, prefix: str = "blocks_"):
    """Inverse of stack_layer_params -> {f"{prefix}{i}": subtree}."""
    depth = jax.tree.leaves(stacked)[0].shape[0]
    return {
        f"{prefix}{i}": jax.tree.map(lambda x: x[i], stacked) for i in range(depth)
    }


def _shard_stacked(stacked, mesh: Mesh, axis: str):
    """device_put stacked layer params with the leading axis over `axis`."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sh), stacked)


def pipeline_apply(
    block_fn: Callable,
    stacked_params,
    xs: jnp.ndarray,
    mesh: Mesh,
    axis: str = "pipe",
    batch_axis: str = None,
):
    """Run `depth` layers over P pipeline stages on M microbatches.

    block_fn        (layer_params, x) -> x, one transformer layer.
    stacked_params  pytree with leading `depth` axis (stack_layer_params);
                    depth must divide evenly by mesh.shape[axis].
    xs              (M, *microbatch_shape) microbatch stack; every microbatch
                    shares one compiled stage program (static shapes).
    batch_axis      optional second mesh axis for data parallelism: the
                    microbatch dim (xs axis 1) is sharded over it, so a
                    ("data", "pipe") mesh runs DP x PP — each data slice
                    flows through its own copy of the pipeline schedule and
                    XLA handles the gradient psum over "data" at the
                    consumer (the usual SPMD contract).

    Returns (M, *microbatch_shape) outputs, replicated over `axis` (and
    sharded over `batch_axis` like the input).
    """
    n_stages = mesh.shape[axis]
    depth = jax.tree.leaves(stacked_params)[0].shape[0]
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by {n_stages} pipeline stages")
    n_micro = xs.shape[0]
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def stage(local_params, xs_local):
        # local_params leaves: (depth/P, ...); xs_local: (M, ...) replicated
        pid = lax.axis_index(axis)

        def run_local(x):
            def body(h, p):
                return block_fn(p, h), None

            h, _ = lax.scan(body, x, local_params)
            return h

        def tick(carry, t):
            state, outbuf = carry
            # state = this stage's output from the previous tick; hand it to
            # the next stage around the ring (stage 0's incoming edge carries
            # the wrapped value from the last stage and is masked off below)
            recv = lax.ppermute(state, axis, perm)
            inject = lax.dynamic_index_in_dim(
                xs_local, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False
            )
            x_in = jnp.where(pid == 0, inject, recv)
            out = run_local(x_in)
            # the last stage retires microbatch t-(P-1) at tick t
            w = t - (n_stages - 1)
            updated = lax.dynamic_update_index_in_dim(
                outbuf, out, jnp.clip(w, 0, n_micro - 1), 0
            )
            outbuf = jnp.where((pid == n_stages - 1) & (w >= 0), updated, outbuf)
            return (out, outbuf), None

        state = jnp.zeros_like(xs_local[0])
        outbuf = jnp.zeros_like(xs_local)
        (_, outbuf), _ = lax.scan(
            tick, (state, outbuf), jnp.arange(n_micro + n_stages - 1)
        )
        # only the last stage holds real outputs; broadcast them to all
        # stages so the caller sees one replicated result
        outbuf = jnp.where(pid == n_stages - 1, outbuf, jnp.zeros_like(outbuf))
        return lax.psum(outbuf, axis)

    xs_spec = P(None, batch_axis) if batch_axis else P()
    in_specs = (jax.tree.map(lambda _: P(axis), stacked_params), xs_spec)
    return jax.shard_map(
        stage, mesh=mesh, in_specs=in_specs, out_specs=xs_spec, check_vma=False
    )(stacked_params, xs)


def pipelined_stack_apply(
    block_module,
    params,
    x: jnp.ndarray,
    mesh: Mesh,
    *,
    depth: int,
    num_microbatches: int,
    prefix: str = "blocks_",
    axis: str = "pipe",
    batch_axis: str = None,
    shard: bool = True,
) -> jnp.ndarray:
    """Pipeline a flax Block stack over `axis`: drop-in for the sequential
    f"{prefix}{i}" loop the models run (e.g. ops/vit.py TransformerStack).

    block_module  a constructed flax module for ONE layer (ops.vit.Block);
                  every layer must share its hyperparameters (true for all
                  stacks here).
    params        the parent params dict holding f"{prefix}{i}" subtrees.
    x             (N, S, D) activations; N must divide by num_microbatches.
    """
    n = x.shape[0]
    if n % num_microbatches:
        raise ValueError(f"batch {n} not divisible by {num_microbatches} microbatches")
    stacked = stack_layer_params(params, depth, prefix)
    if shard:
        stacked = _shard_stacked(stacked, mesh, axis)

    def block_fn(layer_params, h):
        return block_module.apply({"params": layer_params}, h)

    xs = x.reshape(num_microbatches, n // num_microbatches, *x.shape[1:])
    ys = pipeline_apply(block_fn, stacked, xs, mesh, axis=axis, batch_axis=batch_axis)
    return ys.reshape(n, *x.shape[1:])
