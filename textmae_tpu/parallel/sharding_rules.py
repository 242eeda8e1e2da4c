"""Tensor-parallel sharding rules for the transformer stacks.

The reference is data-parallel only (SURVEY.md §2.8); this module adds the
TPU-native extra: Megatron-style head/hidden sharding of every ViT block's
wide matrices over a "model" mesh axis, expressed purely as NamedSharding
annotations — XLA inserts the all-reduces over ICI.

Pattern per block (column-parallel then row-parallel, one psum per residual):
  attn.qkv kernel  (D, 3D)      -> shard axis 1  (heads split)
  attn.proj kernel (D, D)       -> shard axis 0  (row-parallel, psum after)
  mlp.fc1 kernel   (D, 4D)      -> shard axis 1
  mlp.fc2 kernel   (4D, D)      -> shard axis 0
Biases of column-parallel layers shard on their only axis; everything else
(norms, embeddings, hyperprior convs, entropy model) is replicated — those
are < 15% of MCM FLOPs and irregularly shaped.
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path_str: str, leaf, axis: str) -> P:
    if leaf.ndim == 2:
        if path_str.endswith("attn/qkv/kernel") or path_str.endswith("mlp/fc1/kernel"):
            return P(None, axis)  # column parallel
        if path_str.endswith("attn/proj/kernel") or path_str.endswith("mlp/fc2/kernel"):
            return P(axis, None)  # row parallel
    if leaf.ndim == 1:
        if path_str.endswith("attn/qkv/bias") or path_str.endswith("mlp/fc1/bias"):
            return P(axis)
    return P()  # replicated


def transformer_param_shardings(params, mesh: Mesh, axis: str = "model"):
    """NamedSharding tree: TP rules for block matrices, replication elsewhere."""

    def one(path, leaf):
        path_str = "/".join(str(getattr(p, "key", p)) for p in path)
        return NamedSharding(mesh, _spec_for(path_str, leaf, axis))

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params, mesh: Mesh, axis: str = "model"):
    """device_put the param tree with TP shardings (no-op specs replicate)."""
    shardings = transformer_param_shardings(params, mesh, axis)
    return jax.tree.map(jax.device_put, params, shardings)
