"""BLIP-2 Q-Former in flax: learned queries distill image tokens.

BERT-style post-norm blocks over a fixed set of learned query embeddings;
every `cross_attention_frequency`-th layer cross-attends to the frozen
vision tokens (the published blip2 design: 32 queries, hidden 768, 12
layers, cross-attention every 2nd layer). Only the query path exists here —
captioning never feeds text into the Q-Former.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class QFormerConfig:
    num_queries: int = 32
    hidden_size: int = 768
    layers: int = 12
    heads: int = 12
    intermediate_size: int = 3072
    cross_attention_frequency: int = 2
    encoder_width: int = 1408  # vision hidden size
    dtype: Any = jnp.float32


class _PostNormAttention(nn.Module):
    """BERT-shaped attention: out = LayerNorm(x + proj(attn(x, ctx)))."""

    cfg: QFormerConfig
    name_prefix: str = "attention"

    @nn.compact
    def __call__(self, x, context=None):
        c = self.cfg
        ctx = x if context is None else context
        h = nn.MultiHeadDotProductAttention(
            num_heads=c.heads, qkv_features=c.hidden_size,
            out_features=c.hidden_size, dtype=c.dtype, name="attn",
        )(x, ctx)
        return nn.LayerNorm(epsilon=1e-12, name="norm")(x + h)


class _QFormerLayer(nn.Module):
    cfg: QFormerConfig
    has_cross: bool

    @nn.compact
    def __call__(self, q, vision):
        c = self.cfg
        q = _PostNormAttention(c, name="attention")(q)
        if self.has_cross:
            q = _PostNormAttention(c, name="crossattention")(q, vision)
        h = nn.Dense(c.intermediate_size, dtype=c.dtype, name="intermediate_query")(q)
        h = nn.Dense(c.hidden_size, dtype=c.dtype, name="output_query")(
            nn.gelu(h, approximate=False)
        )
        return nn.LayerNorm(epsilon=1e-12, name="output_norm")(q + h)


class QFormer(nn.Module):
    config: QFormerConfig = QFormerConfig()

    @nn.compact
    def __call__(self, vision_tokens: jnp.ndarray) -> jnp.ndarray:
        """(N, L, encoder_width) vision tokens -> (N, num_queries, hidden)."""
        c = self.config
        n = vision_tokens.shape[0]
        queries = self.param(
            "query_tokens", nn.initializers.normal(0.02),
            (1, c.num_queries, c.hidden_size),
        )
        q = jnp.broadcast_to(queries, (n, c.num_queries, c.hidden_size)).astype(c.dtype)
        q = nn.LayerNorm(epsilon=1e-12, name="embeddings_norm")(q)
        v = vision_tokens.astype(c.dtype)
        for i in range(c.layers):
            q = _QFormerLayer(
                c, has_cross=(i % c.cross_attention_frequency == 0), name=f"layers_{i}"
            )(q, v)
        return q.astype(jnp.float32)
