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
    param_specs=None,
    xs_spec=None,
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

    if xs_spec is None:
        xs_spec = P(None, batch_axis) if batch_axis else P()
    if param_specs is None:
        param_specs = jax.tree.map(lambda _: P(axis), stacked_params)
    in_specs = (param_specs, xs_spec)
    return jax.shard_map(
        stage, mesh=mesh, in_specs=in_specs, out_specs=xs_spec, check_vma=False
    )(stacked_params, xs)


# ---------------------------------------------------------------------------
# Tensor parallelism INSIDE a pipeline stage (PP x TP, optionally x DP)
# ---------------------------------------------------------------------------
# The NamedSharding TP rules (parallel/sharding_rules.py) rely on XLA's GSPMD
# partitioner; inside shard_map every collective is explicit, so composing TP
# with the GPipe schedule needs a manual Megatron block: attention sharded on
# HEADS (each member runs num_heads/T full heads), the MLP sharded on HIDDEN
# units, one psum over the tp axis per residual branch (after attn.proj and
# mlp.fc2). A contiguous column split of the fused (D, 3D) qkv kernel would
# interleave q/k/v across members, so the kernels are pre-reshaped to expose
# the head axis and sharded on it.


def _tp_reshape_stacked(stacked, num_heads: int):
    """Expose the head axis on the stacked attention kernels.

    qkv kernel (depth, D, 3D)  -> (depth, D, 3, H, Dh)
    qkv bias   (depth, 3D)     -> (depth, 3, H, Dh)
    proj kernel (depth, D, D)  -> (depth, H, Dh, D)
    Everything else unchanged. Inverse: _tp_unreshape_stacked.
    """
    out = jax.tree.map(lambda x: x, stacked)  # shallow copy of the tree
    attn = dict(out["attn"])
    qkv = dict(attn["qkv"])
    proj = dict(attn["proj"])
    d, dim, three_dim = qkv["kernel"].shape
    head_dim = dim // num_heads
    qkv["kernel"] = qkv["kernel"].reshape(d, dim, 3, num_heads, head_dim)
    if "bias" in qkv:
        qkv["bias"] = qkv["bias"].reshape(d, 3, num_heads, head_dim)
    proj["kernel"] = proj["kernel"].reshape(d, num_heads, head_dim, dim)
    attn["qkv"], attn["proj"] = qkv, proj
    out = dict(out)
    out["attn"] = attn
    return out


def _tp_unreshape_stacked(stacked, num_heads: int):
    """Inverse of _tp_reshape_stacked (for mapping gradients back)."""
    out = dict(stacked)
    attn = dict(out["attn"])
    qkv = dict(attn["qkv"])
    proj = dict(attn["proj"])
    d, dim, _, _, head_dim = qkv["kernel"].shape
    qkv["kernel"] = qkv["kernel"].reshape(d, dim, 3 * num_heads * head_dim)
    if "bias" in qkv:
        qkv["bias"] = qkv["bias"].reshape(d, 3 * num_heads * head_dim)
    proj["kernel"] = proj["kernel"].reshape(d, num_heads * head_dim, dim)
    attn["qkv"], attn["proj"] = qkv, proj
    out["attn"] = attn
    return out


def _tp_stacked_specs(stacked, pipe_axis: str, tp_axis: str):
    """PartitionSpec tree for a _tp_reshape_stacked tree: leading depth axis
    over `pipe_axis`, heads / hidden units over `tp_axis`."""

    def one(path, leaf):
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        if p.endswith("attn/qkv/kernel"):
            return P(pipe_axis, None, None, tp_axis, None)
        if p.endswith("attn/qkv/bias"):
            return P(pipe_axis, None, tp_axis, None)
        if p.endswith("attn/proj/kernel"):
            return P(pipe_axis, tp_axis, None, None)
        if p.endswith("mlp/fc1/kernel"):
            return P(pipe_axis, None, tp_axis)
        if p.endswith("mlp/fc1/bias"):
            return P(pipe_axis, tp_axis)
        if p.endswith("mlp/fc2/kernel"):
            return P(pipe_axis, tp_axis, None)
        return P(pipe_axis)

    return jax.tree_util.tree_map_with_path(one, stacked)


def make_tp_block_fn(
    tp_axis: str,
    norm_eps: float = 1e-6,
    dtype=jnp.float32,
    remat: bool = False,
    sp: bool = False,
) -> Callable:
    """(local_params, x) -> x: one pre-norm ViT block on tp-local shards.

    Math-identical to ops.vit.Block (deterministic path) when the local
    shards are concatenated over `tp_axis`: attention heads are independent,
    MLP hidden units are independent, so each member computes a partial sum
    of the row-parallel matmuls and one lax.psum per residual branch
    completes them. LayerNorm statistics run in float32 like flax's.

    sp=True adds Megatron-style SEQUENCE parallelism on the same axis: the
    residual stream between blocks stays sharded over tokens (N, S/T, D), so
    layernorms and residual adds run on 1/T of the activations; the psum of
    each residual branch decomposes into all_gather (before the
    column-parallel matmul, which needs full sequence) + psum_scatter (after
    the row-parallel one). Same total ICI bytes as the two psums, 1/T the
    activation memory — and pipeline-stage ppermute transfers shrink by T.
    S must divide by the axis size (the caller checks).
    """

    def layernorm(x, p):
        x32 = x.astype(jnp.float32)
        mean = x32.mean(-1, keepdims=True)
        var = jnp.maximum((x32 * x32).mean(-1, keepdims=True) - mean * mean, 0.0)
        y = (x32 - mean) * jax.lax.rsqrt(var + norm_eps)
        return (y * p["scale"] + p["bias"]).astype(dtype)

    def block(p, h):
        from textmae_tpu.ops.attention import attention_reference

        y = layernorm(h, p["norm1"])
        if sp:  # tokens local -> full sequence for the column-parallel qkv
            y = lax.all_gather(y, tp_axis, axis=1, tiled=True)
        a = p["attn"]
        # column-parallel qkv on the local heads: (N, S, 3, Hl, Dh)
        qkv = jnp.einsum(
            "nsd,dche->nsche", y, a["qkv"]["kernel"].astype(dtype)
        )
        if "bias" in a["qkv"]:
            qkv = qkv + a["qkv"]["bias"].astype(dtype)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        o = attention_reference(q, k, v)  # (N, Hl, S, Dh)
        # row-parallel proj: partial sums over local heads, completed by
        # psum (TP) or psum_scatter back to token shards (TP+SP)
        o = jnp.einsum(
            "nhse,hed->nsd", o, a["proj"]["kernel"].astype(dtype)
        )
        if sp:
            o = lax.psum_scatter(o, tp_axis, scatter_dimension=1, tiled=True)
        else:
            o = lax.psum(o, tp_axis)
        h = h + o + a["proj"]["bias"].astype(dtype)
        y = layernorm(h, p["norm2"])
        if sp:
            y = lax.all_gather(y, tp_axis, axis=1, tiled=True)
        m = p["mlp"]
        z = y @ m["fc1"]["kernel"].astype(dtype) + m["fc1"]["bias"].astype(dtype)
        z = jax.nn.gelu(z, approximate=False)
        z = z @ m["fc2"]["kernel"].astype(dtype)
        if sp:
            z = lax.psum_scatter(z, tp_axis, scatter_dimension=1, tiled=True)
        else:
            z = lax.psum(z, tp_axis)
        z = z + m["fc2"]["bias"].astype(dtype)
        return h + z

    return jax.checkpoint(block) if remat else block


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
    tp_axis: str = None,
    remat: bool = False,
    shard: bool = True,
    sequence_parallel=False,
) -> jnp.ndarray:
    """Pipeline a flax Block stack over `axis`: drop-in for the sequential
    f"{prefix}{i}" loop the models run (e.g. ops/vit.py TransformerStack).

    block_module  a constructed flax module for ONE layer (ops.vit.Block);
                  every layer must share its hyperparameters (true for all
                  stacks here).
    params        the parent params dict holding f"{prefix}{i}" subtrees.
    x             (N, S, D) activations; N must divide by num_microbatches.
    tp_axis       optional third mesh axis for tensor parallelism INSIDE each
                  pipeline stage (dp x pp x tp): the block runs as a manual
                  Megatron block (make_tp_block_fn) with attention heads and
                  MLP hidden units sharded over `tp_axis` and one psum per
                  residual branch. block_module.num_heads must divide by
                  mesh.shape[tp_axis] (and so must the MLP hidden width).
    sequence_parallel  Megatron SP on `tp_axis` (requires tp_axis): the
                  residual stream between blocks stays token-sharded, the
                  per-branch psum decomposes into all_gather + psum_scatter
                  (see make_tp_block_fn). True requires S % tp == 0 (raises
                  otherwise); "auto" enables SP exactly when S divides —
                  ViT sequences are often odd (cls token), so "auto" lets
                  e.g. the MAE encoder (50 tokens) use SP while the decoder
                  (197) falls back to plain TP in the same step.
    """
    n = x.shape[0]
    if n % num_microbatches:
        raise ValueError(f"batch {n} not divisible by {num_microbatches} microbatches")
    stacked = stack_layer_params(params, depth, prefix)

    use_sp = False
    if sequence_parallel:
        if tp_axis is None:
            raise ValueError("sequence_parallel requires tp_axis")
        seq = x.shape[1]
        if seq % mesh.shape[tp_axis] == 0:
            use_sp = True
        elif sequence_parallel != "auto":
            raise ValueError(
                f"sequence length {seq} not divisible by "
                f"tp={mesh.shape[tp_axis]} (pass sequence_parallel='auto' "
                "to fall back to plain TP on such stacks)"
            )

    if tp_axis is not None:
        tp = mesh.shape[tp_axis]
        num_heads = block_module.num_heads
        hidden = int(block_module.dim * block_module.mlp_ratio)
        if num_heads % tp or hidden % tp:
            raise ValueError(
                f"heads {num_heads} / mlp hidden {hidden} not divisible by "
                f"tp={tp} over axis {tp_axis!r}"
            )
        stacked = _tp_reshape_stacked(stacked, num_heads)
        param_specs = _tp_stacked_specs(stacked, axis, tp_axis)
        block_fn = make_tp_block_fn(
            tp_axis,
            norm_eps=block_module.norm_eps,
            dtype=block_module.dtype,
            remat=remat,
            sp=use_sp,
        )
    else:
        param_specs = None

        def block_fn(layer_params, h):
            return block_module.apply({"params": layer_params}, h)

        if remat:  # honor the flag in the non-TP branch too
            block_fn = jax.checkpoint(block_fn)

    if shard:
        if param_specs is None:
            stacked = _shard_stacked(stacked, mesh, axis)
        else:
            stacked = jax.tree.map(
                lambda t, s: jax.device_put(t, NamedSharding(mesh, s)),
                stacked,
                param_specs,
            )

    xs = x.reshape(num_microbatches, n // num_microbatches, *x.shape[1:])
    # under SP the microbatch stack is token-sharded over tp_axis: shard_map
    # hands each member its (M, B_local, S/T, D) slice, the block keeps the
    # residual stream in that layout, and the output spec reassembles S
    xs_spec = (
        P(None, batch_axis, tp_axis) if use_sp else None
    )
    ys = pipeline_apply(
        block_fn, stacked, xs, mesh,
        axis=axis, batch_axis=batch_axis, param_specs=param_specs,
        xs_spec=xs_spec,
    )
    return ys.reshape(n, *x.shape[1:])
