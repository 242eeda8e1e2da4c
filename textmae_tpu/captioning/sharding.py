"""Tensor-parallel shardings for the BLIP-2 OPT decoder.

blip2-opt-2.7b's language model (hidden 2560, ffn 10240, 32 heads) is the
heavy stage-1 component; serving it on a TPU slice wants Megatron-style TP
over a "model" mesh axis, expressed as NamedShardings — XLA inserts one
all-reduce per residual (scaling-book recipe; the reference runs the HF
model unsharded on one GPU, /root/reference/models/BLIP/__init__.py:5-19).

Per OPT layer:
  q/k/v_proj kernels (D, D)   -> shard axis 1 (head split, column parallel)
  out_proj   kernel  (D, D)   -> shard axis 0 (row parallel, psum after)
  fc1        kernel  (D, 4D)  -> shard axis 1
  fc2        kernel  (4D, D)  -> shard axis 0
Column-parallel biases shard on their only axis. Embeddings shard over the
vocab axis (the tied lm-head matmul contracts over hidden, so a vocab-axis
shard keeps the logits einsum local + one all-gather on the (N, T, V)
output). Norms and position embeddings replicate. The KV caches the decode
scan carries are activations, not params: their (N, heads, S, d) head axis
inherits the head-split automatically from the sharded k/v projections.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COLUMN = ("q_proj", "k_proj", "v_proj", "fc1")
_ROW = ("out_proj", "fc2")


def _opt_spec(path_str: str, leaf, axis: str) -> P:
    if path_str.endswith("embed_tokens/embedding"):
        return P(axis, None)  # vocab split
    if leaf.ndim == 2:
        for name in _COLUMN:
            if path_str.endswith(f"{name}/kernel"):
                return P(None, axis)
        for name in _ROW:
            if path_str.endswith(f"{name}/kernel"):
                return P(axis, None)
    if leaf.ndim == 1:
        for name in _COLUMN:
            if path_str.endswith(f"{name}/bias"):
                return P(axis)
    return P()  # norms, positions, row-parallel biases


def opt_param_shardings(params, mesh: Mesh, axis: str = "model"):
    """NamedSharding tree for an OPTDecoder param tree."""

    def one(path, leaf):
        path_str = "/".join(str(getattr(p, "key", p)) for p in path)
        return NamedSharding(mesh, _opt_spec(path_str, leaf, axis))

    return jax.tree_util.tree_map_with_path(one, params)


def shard_opt_params(params, mesh: Mesh, axis: str = "model"):
    """device_put the OPT tree with TP shardings (no-op specs replicate)."""
    return jax.tree.map(jax.device_put, params, opt_param_shardings(params, mesh, axis))


def shard_captioner_params(params, mesh: Mesh, axis: str = "model"):
    """Full Blip2Captioner tree: TP on the OPT half, replicate the rest.

    The vision tower + Q-Former are < 15% of full-size BLIP-2 FLOPs per
    generated token; replicating them avoids head-count constraints on the
    (much smaller) cross-attention blocks.
    """
    out = dict(params)
    out["opt"] = shard_opt_params(params["opt"], mesh, axis)
    rep = NamedSharding(mesh, P())
    for key in ("vision", "qformer", "proj"):
        out[key] = jax.tree.map(lambda x: jax.device_put(x, rep), params[key])
    return out
