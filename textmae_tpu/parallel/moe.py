"""Expert parallelism: V-MoE-style mixture-of-experts FFN for the ViT stacks.

The reference's parallelism surface is data-parallel only (SURVEY.md §2.8);
this module completes this framework's mesh-axis set (dp / tp / pp / sp / ep)
with the TPU-native expert axis: every MoE layer's stacked expert weights
shard over an "expert" mesh axis, and the dispatched token buffer is
sharding-constrained on the same axis so XLA lowers the dispatch/combine
einsums to an all-to-all over ICI rather than a replicated gather.

Design notes (why this shape of code):
  * Static shapes everywhere — routing uses the Mesh-TensorFlow / V-MoE
    dispatch-tensor formulation (one-hot (tokens, experts, capacity) masks
    consumed by einsums) instead of ragged scatter/gather, so the whole layer
    is three MXU-friendly einsums + a top-k. No data-dependent shapes under
    jit.
  * Token priority is slot-major then token-major (slot 0 of every token
    claims capacity before any slot 1), the V-MoE "importance" default.
  * Overflowed tokens are *dropped* (combine weight 0): with the standard
    residual wiring x + moe(ln(x)) they fall back to the identity branch.
  * The Switch-transformer load-balance auxiliary loss is sown under the
    "intermediates" collection as "moe_aux_loss" — callers that do not ask
    for it (mutable=[]) are unaffected.

No reference counterpart (PARITY.md §2.8 ✚). The MoE math follows the
published Switch/V-MoE recipes; the implementation is original.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from textmae_tpu.ops.vit import Attention, gelu_exact

Dtype = Any


def moe_capacity(
    num_tokens: int, num_experts: int, top_k: int, capacity_factor: float
) -> int:
    """Per-expert token buffer length (static).

    ceil(top_k * T / E * factor), floored at 1 and rounded up to a multiple
    of 8 so the (E, C, D) expert buffers tile cleanly onto (8, 128) VREGs.
    """
    cap = int(-(-num_tokens * top_k * capacity_factor // num_experts))
    return max(8, -(-cap // 8) * 8)


class MoEMlp(nn.Module):
    """Drop-in MoE replacement for ops.vit.Mlp (same (N, T, D) contract).

    Routing: softmax over expert logits, top_k experts per token, gates
    renormalized over the chosen k. Expert FFNs are one stacked parameter
    set (E, D, H) / (E, H, D) evaluated with einsums over the expert axis.

    `mesh`/`expert_axis`: when given, the dispatched (N, E, C, D) buffers are
    sharding-constrained on E — together with shard_moe_params placing the
    stacked expert weights P(expert_axis, ...), that single constraint is
    what turns the dispatch einsum into an all-to-all. Without a mesh the
    layer is an ordinary replicated module (tests, CPU).
    """

    dim: int
    hidden_dim: int
    num_experts: int
    top_k: int = 1
    capacity_factor: float = 1.25
    dtype: Dtype = jnp.float32
    mesh: Optional[Mesh] = None
    expert_axis: str = "expert"
    router_noise: float = 0.0  # train-time jitter on router logits

    def _constrain(self, x: jnp.ndarray, spec: P) -> jnp.ndarray:
        if self.mesh is None:
            return x
        return jax.lax.with_sharding_constraint(x, NamedSharding(self.mesh, spec))

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        n, t, d = x.shape
        e, k = self.num_experts, self.top_k
        cap = moe_capacity(t, e, k, self.capacity_factor)
        xc = x.astype(self.dtype)

        # ---- router (always float32: tiny FLOPs, argmax stability matters)
        logits = nn.Dense(e, dtype=jnp.float32, name="router")(x.astype(jnp.float32))
        if self.router_noise > 0.0 and not deterministic:
            rng = self.make_rng("router")
            logits = logits + self.router_noise * jax.random.normal(
                rng, logits.shape, jnp.float32
            )
        probs = jax.nn.softmax(logits, axis=-1)  # (N, T, E)
        gate_k, idx_k = jax.lax.top_k(probs, k)  # (N, T, K)
        gate_k = gate_k / jnp.maximum(gate_k.sum(-1, keepdims=True), 1e-9)

        # ---- capacity assignment, slot-major priority: slot j's one-hot
        # positions come after every token's slots < j (python loop, k <= 2)
        onehots = [jax.nn.one_hot(idx_k[..., j], e, dtype=jnp.float32) for j in range(k)]
        counts = jnp.zeros((n, 1, e), jnp.float32)
        dispatch = jnp.zeros((n, t, e, cap), self.dtype)
        combine = jnp.zeros((n, t, e, cap), self.dtype)
        for j, oh in enumerate(onehots):
            pos = jnp.cumsum(oh, axis=1) - 1.0 + counts  # (N, T, E)
            keep = (pos < cap) & (oh > 0.0)
            pos_oh = jax.nn.one_hot(pos.astype(jnp.int32), cap, dtype=jnp.float32)
            slot = jnp.where(keep[..., None], oh[..., None] * pos_oh, 0.0)
            dispatch = dispatch + slot.astype(self.dtype)
            combine = combine + (gate_k[..., j, None, None] * slot).astype(self.dtype)
            counts = counts + oh.sum(axis=1, keepdims=True)

        # ---- Switch load-balance aux loss (top-1 assignment fractions)
        frac_tokens = onehots[0].mean(axis=(0, 1))  # (E,)
        frac_probs = probs.mean(axis=(0, 1))  # (E,)
        self.sow(
            "intermediates",
            "moe_aux_loss",
            e * jnp.sum(frac_tokens * frac_probs),
        )

        # ---- dispatch -> expert FFNs -> combine. Params stay plain jnp
        # arrays (house style, see sharding_rules.py): placement comes from
        # shard_moe_params / moe_param_shardings outside the module.
        wi = self.param("wi", nn.initializers.lecun_normal(), (e, d, self.hidden_dim))
        bi = self.param("bi", nn.initializers.zeros_init(), (e, self.hidden_dim))
        wo = self.param("wo", nn.initializers.lecun_normal(), (e, self.hidden_dim, d))
        bo = self.param("bo", nn.initializers.zeros_init(), (e, d))

        buf = jnp.einsum("ntec,ntd->necd", dispatch, xc)  # (N, E, C, D)
        buf = self._constrain(buf, P(None, self.expert_axis))
        h = gelu_exact(
            jnp.einsum("necd,edh->nech", buf, wi.astype(self.dtype))
            + bi.astype(self.dtype)[None, :, None, :]
        )
        out = (
            jnp.einsum("nech,ehd->necd", h, wo.astype(self.dtype))
            + bo.astype(self.dtype)[None, :, None, :]
        )
        out = self._constrain(out, P(None, self.expert_axis))
        return jnp.einsum("ntec,necd->ntd", combine, out)


class MoEBlock(nn.Module):
    """Pre-norm ViT block with the MLP branch replaced by MoEMlp.

    Mirrors ops.vit.Block's residual wiring exactly (including stochastic
    depth), so a capacity-dropped token degrades to the identity branch
    rather than corrupting the stream.
    """

    dim: int
    num_heads: int
    num_experts: int
    mlp_ratio: float = 4.0
    top_k: int = 1
    capacity_factor: float = 1.25
    qkv_bias: bool = True
    use_pallas: bool = True
    dtype: Dtype = jnp.float32
    norm_eps: float = 1e-6
    drop_path: float = 0.0
    mesh: Optional[Mesh] = None
    expert_axis: str = "expert"

    def _drop_path(self, branch: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        # identical semantics to ops.vit.Block._drop_path (timm DropPath)
        if self.drop_path == 0.0 or deterministic:
            return branch
        keep = 1.0 - self.drop_path
        rng = self.make_rng("droppath")
        mask = jax.random.bernoulli(rng, keep, (branch.shape[0], 1, 1))
        return branch * mask.astype(branch.dtype) / keep

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm1")(x)
        x = x + self._drop_path(
            Attention(
                self.dim,
                self.num_heads,
                qkv_bias=self.qkv_bias,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                name="attn",
            )(y),
            deterministic,
        )
        y = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm2")(x)
        return x + self._drop_path(
            MoEMlp(
                self.dim,
                int(self.dim * self.mlp_ratio),
                num_experts=self.num_experts,
                top_k=self.top_k,
                capacity_factor=self.capacity_factor,
                dtype=self.dtype,
                mesh=self.mesh,
                expert_axis=self.expert_axis,
                name="moe",
            )(y, deterministic=deterministic),
            deterministic,
        )


def collect_moe_aux(intermediates) -> jnp.ndarray:
    """Sum every sown "moe_aux_loss" leaf in an intermediates collection
    (one per MoE layer per call); 0.0 when the model has no MoE layers."""
    total = jnp.asarray(0.0)
    for path, leaf in jax.tree_util.tree_leaves_with_path(intermediates):
        if any("moe_aux_loss" == str(getattr(p, "key", p)) for p in path):
            total = total + leaf
    return total


def moe_param_shardings(params, mesh: Mesh, axis: str = "expert"):
    """NamedSharding tree: dim-0 expert sharding for stacked expert params
    (paths `.../moe/{wi,wo,bi,bo}`), replication elsewhere. Composes with
    sharding_rules.transformer_param_shardings for tp x ep layouts (TP rules
    never match MoE paths and vice versa)."""

    def one(path, leaf):
        parts = [str(getattr(p, "key", p)) for p in path]
        if "moe" in parts and parts[-1] in ("wi", "wo", "bi", "bo"):
            return NamedSharding(mesh, P(axis, *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, params)


def shard_moe_params(params, mesh: Mesh, axis: str = "expert"):
    """device_put the param tree with expert shardings (others replicate)."""
    shardings = moe_param_shardings(params, mesh, axis)
    return jax.tree.map(jax.device_put, params, shardings)


def shard_params_tp_ep(
    params, mesh: Mesh, tp_axis: str = "model", ep_axis: str = "expert"
):
    """TP x EP composition in one placement pass: Megatron head/hidden
    sharding (sharding_rules) on every dense block matrix — including the
    attention inside MoE blocks — plus expert sharding on the stacked MoE
    weights. The two rule sets match disjoint paths (TP suffixes never name
    `moe/{wi,wo,bi,bo}` and vice versa), so the merge is a per-leaf pick."""
    from textmae_tpu.parallel.sharding_rules import transformer_param_shardings

    tp = transformer_param_shardings(params, mesh, tp_axis)
    ep = moe_param_shardings(params, mesh, ep_axis)

    def pick(path, leaf, t, m):
        parts = [str(getattr(p, "key", p)) for p in path]
        if "moe" in parts and parts[-1] in ("wi", "wo", "bi", "bo"):
            return m
        return t

    shardings = jax.tree_util.tree_map_with_path(pick, params, tp, ep)
    return jax.tree.map(jax.device_put, params, shardings)
