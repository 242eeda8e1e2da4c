"""ViT building blocks (flax.linen) matching the timm 0.4.5 `Block` semantics
the reference relies on (/root/reference/models/Compression/MCM.py:14,313-350).

Parameter tree mirrors the torch module names (qkv / proj / fc1 / fc2 /
norm1 / norm2) so the torch->jax checkpoint importer is a pure transpose job.

All dense/conv math runs in a configurable compute dtype (bfloat16 by default
on TPU) with float32 parameters; LayerNorm statistics stay in float32.
"""
from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from textmae_tpu.ops.attention import fused_attention

Dtype = Any


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """erf-based GELU — torch nn.GELU default (timm 0.4.5 Mlp act)."""
    return nn.gelu(x, approximate=False)


class PatchEmbed(nn.Module):
    """p x p conv patch embedding -> (N, L, D). Mirrors timm PatchEmbed (MCM.py:300-303)."""

    patch_size: int = 16
    embed_dim: int = 768
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, imgs: jnp.ndarray) -> jnp.ndarray:
        # imgs: (N, C, H, W) -> NHWC for TPU-friendly conv layout
        x = imgs.transpose(0, 2, 3, 1).astype(self.dtype)
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="proj",
        )(x)
        n, h, w, d = x.shape
        return x.reshape(n, h * w, d)


class Attention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    use_pallas: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, s, _ = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(n, s, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))  # (N, H, S, Dh)
        out = fused_attention(q, k, v, use_pallas=self.use_pallas)
        out = out.transpose(0, 2, 1, 3).reshape(n, s, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class Mlp(nn.Module):
    dim: int
    hidden_dim: int
    dtype: Dtype = jnp.float32
    act: Callable = gelu_exact

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class Block(nn.Module):
    """Pre-norm transformer block: x + attn(ln(x)); x + mlp(ln(x)).

    drop_path > 0 enables stochastic depth (timm DropPath; the reference
    finetune uses rates up to 0.1 via --drop_path, main_finetune.py): during
    training each residual branch is dropped per-sample with prob `drop_path`
    and scaled by 1/(1-p) otherwise. Requires an rng under the "droppath"
    collection and deterministic=False.
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_pallas: bool = True
    dtype: Dtype = jnp.float32
    norm_eps: float = 1e-6
    drop_path: float = 0.0

    def _drop_path(self, branch: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
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
        x = x + self._drop_path(
            Mlp(self.dim, int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp")(y),
            deterministic,
        )
        return x


class TransformerStack(nn.Module):
    """depth x Block with shared settings; optionally remat'd for memory."""

    depth: int
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_pallas: bool = True
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        block_cls = nn.remat(Block) if self.remat else Block
        for i in range(self.depth):
            x = block_cls(
                self.dim,
                self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x)
        return x
