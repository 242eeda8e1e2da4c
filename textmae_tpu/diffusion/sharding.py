"""Tensor-parallel shardings for the SDXL refiner UNet.

The published-scale 3-stage pipeline is refiner-bound (VERDICT r4: 11.6
img/s/chip at SDXL-refiner dims vs the 50 img/s north star); the UNet's
transformer stacks (4 layers per attention block at 768/1280 channels,
GEGLU mult 4) are where its FLOPs live. Megatron-style TP over a "model"
mesh axis, expressed as NamedShardings on the params — XLA inserts one
all-reduce per attention block and one per feed-forward (scaling-book
recipe; the reference runs the diffusers UNet unsharded on one GPU,
/root/reference/models/Diffusion/__init__.py:8-28).

Per BasicTransformerBlock:
  attn to_q/to_k/to_v kernels (D, D)   -> shard axis 1 (head split; the
                                          (b, n, heads, hd) reshape
                                          propagates it onto the head axis)
  attn to_out_0       kernel (D, D)    -> shard axis 0 (row parallel, psum)
  ff proj_h/proj_gate kernels (D, 4D)  -> shard axis 1 (column parallel —
                                          the value/gate halves are separate
                                          kernels precisely so they shard
                                          cleanly; see unet.py GEGLU note)
  ff out              kernel (4D, D)   -> shard axis 0 (row parallel, psum)
Column-parallel biases shard on their only axis; norms, the Transformer2D
proj_in/proj_out bridges, resnets, and up/down-samplers replicate (conv
compute is the minority in the attention blocks, and replicating keeps the
spatial layout untouched). The VAE, CLIP text encoder, and time embeddings
replicate likewise.

Sharded params force the jnp attention path (UNetConfig.use_pallas=False):
a pallas_call blocks GSPMD partitioning of its grid, while the einsum
reference path partitions over the sharded head axis with zero extra
collectives.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COLUMN = ("to_q", "to_k", "to_v", "proj_h", "proj_gate")
_ROW = ("to_out_0", "out")


def _unet_spec(path_str: str, leaf, axis: str) -> P:
    if "transformer_blocks_" not in path_str:
        return P()  # resnets, norms, samplers, time embeddings
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
    return P()  # layer norms, proj_in/out handled by the prefix check above


def unet_param_shardings(params, mesh: Mesh, axis: str = "model"):
    """NamedSharding tree for a UNet2DCondition param tree."""

    def one(path, leaf):
        path_str = "/".join(str(getattr(p, "key", p)) for p in path)
        return NamedSharding(mesh, _unet_spec(path_str, leaf, axis))

    return jax.tree_util.tree_map_with_path(one, params)


def shard_unet_params(params, mesh: Mesh, axis: str = "model"):
    """device_put the UNet tree with TP shardings (no-op specs replicate)."""
    return jax.tree.map(jax.device_put, params, unet_param_shardings(params, mesh, axis))


def shard_refiner_params(params, mesh: Mesh, axis: str = "model"):
    """Full SDXLRefiner tree: TP on the UNet, replicate VAE + text.

    The VAE and text encoder are < 10% of a full refine's FLOPs (the UNet
    runs 2x batch (CFG) x num_steps times per image; the VAE twice, the text
    encoder once); replicating them keeps their conv/embedding layouts
    simple and the denoise scan free of spatial resharding.
    """
    out = dict(params)
    out["unet"] = shard_unet_params(params["unet"], mesh, axis)
    rep = NamedSharding(mesh, P())
    for key in ("vae", "text"):
        out[key] = jax.tree.map(lambda x: jax.device_put(x, rep), params[key])
    return out
