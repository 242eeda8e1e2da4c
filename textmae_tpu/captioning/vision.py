"""BLIP-2 vision tower (EVA ViT-g style) in flax.

The reference's stage 1 wraps Salesforce/blip2-opt-2.7b through HF
transformers on CUDA (/root/reference/models/BLIP/__init__.py:5-19); this is
the TPU-native vision half: a pre-norm ViT with class token and learned
position embeddings, returning the full token sequence for the Q-Former's
cross-attention. Defaults mirror the published blip2 vision config
(patch 14, width 1408, depth 39, heads 16 — dims configurable; tiny configs
jit in seconds for tests).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1408
    layers: int = 39
    heads: int = 16
    mlp_ratio: float = 4.3637  # blip2 vision intermediate 6144 / 1408
    dtype: Any = jnp.float32

    @property
    def num_positions(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1


class _VisionLayer(nn.Module):
    cfg: VisionConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.LayerNorm(epsilon=1e-6, name="layer_norm1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=c.heads, qkv_features=c.hidden_size,
            out_features=c.hidden_size, dtype=c.dtype, name="self_attn",
        )(h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, name="layer_norm2")(x)
        h = nn.Dense(int(c.hidden_size * c.mlp_ratio), dtype=c.dtype, name="fc1")(h)
        h = nn.Dense(c.hidden_size, dtype=c.dtype, name="fc2")(nn.gelu(h, approximate=False))
        return x + h


class VisionTower(nn.Module):
    config: VisionConfig = VisionConfig()

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """pixels: (N, H, W, 3) normalized -> (N, 1 + L, hidden) tokens."""
        c = self.config
        x = nn.Conv(
            c.hidden_size, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), padding="VALID",
            dtype=c.dtype, name="patch_embedding",
        )(pixels.astype(c.dtype))
        n, gh, gw, d = x.shape
        x = x.reshape(n, gh * gw, d)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.hidden_size,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (n, 1, d)), x], axis=1
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (c.num_positions, c.hidden_size),
        )
        x = x + pos[None, : x.shape[1]].astype(x.dtype)
        for i in range(c.layers):
            x = _VisionLayer(c, name=f"layers_{i}")(x)
        return nn.LayerNorm(epsilon=1e-6, name="post_layernorm")(x.astype(jnp.float32))
