"""CLIP-style text encoder in flax — the refiner's caption conditioner.

The SDXL refiner conditions on OpenCLIP ViT-bigG text features (width 1280,
32 layers, 20 heads, penultimate hidden states + a projected pooled
embedding). The reference gets this through diffusers' bundled text encoder
(/root/reference/models/Diffusion/__init__.py:24-27); here it is a native
flax module with configurable dims so the whole conditioning path jits on
TPU.

Tokenization: when a real vocabulary is unavailable (zero-egress builds), a
deterministic hash tokenizer maps words into the vocab range — architecture
and throughput are exercised end-to-end; semantic conditioning requires real
weights + the matching BPE vocab via TEXTMAE_SDXL_PATH (convert.py).
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    max_length: int = 77
    width: int = 1280
    layers: int = 32
    heads: int = 20
    projection_dim: int = 1280
    # OpenCLIP bigG uses exact GELU; OpenAI CLIP-L uses quick-gelu
    quick_gelu: bool = False
    eos_token_id: int = 49407
    bos_token_id: int = 49406
    dtype: Any = jnp.float32


def hash_tokenize(
    texts: List[str], cfg: CLIPTextConfig
) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic fallback tokenizer -> (ids (N, T), eos positions (N,)).

    Lowercased whitespace words hashed (FNV-1a) into [1, vocab-3]; BOS/EOS
    framing and EOS padding match the CLIP convention so pooling stays
    correct once real weights arrive.
    """
    def fnv(word: str) -> int:
        h = 2166136261
        for ch in word.encode():
            h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
        return 1 + h % (cfg.vocab_size - 3)

    ids = np.full((len(texts), cfg.max_length), cfg.eos_token_id, np.int32)
    eos_pos = np.zeros((len(texts),), np.int32)
    for i, t in enumerate(texts):
        words = t.lower().split()[: cfg.max_length - 2]
        row = [cfg.bos_token_id] + [fnv(w) for w in words] + [cfg.eos_token_id]
        ids[i, : len(row)] = row
        eos_pos[i] = len(row) - 1
    return ids, eos_pos


class _CLIPLayer(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=c.heads, dtype=c.dtype, name="self_attn",
            qkv_features=c.width, out_features=c.width,
        )(h, mask=mask)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x)
        h = nn.Dense(c.width * 4, dtype=c.dtype, name="fc1")(h)
        h = (
            h * nn.sigmoid(1.702 * h)
            if c.quick_gelu
            else nn.gelu(h, approximate=False)
        )
        h = nn.Dense(c.width, dtype=c.dtype, name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    config: CLIPTextConfig = CLIPTextConfig()

    @nn.compact
    def __call__(self, ids: jnp.ndarray, eos_pos: jnp.ndarray):
        """ids: (N, T) int32 -> (hidden (N, T, width), pooled (N, proj_dim)).

        hidden is the PENULTIMATE layer's states (what SDXL conditions on);
        pooled is the final-layer EOS state through the text projection.
        """
        c = self.config
        n, t = ids.shape
        x = nn.Embed(c.vocab_size, c.width, dtype=c.dtype, name="token_embedding")(ids)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01), (c.max_length, c.width)
        )
        x = x + pos[None, :t].astype(x.dtype)
        causal = nn.make_causal_mask(ids)
        penultimate = x
        for i in range(c.layers):
            penultimate = x
            x = _CLIPLayer(c, name=f"layers_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)
        pooled = x[jnp.arange(n), eos_pos]
        pooled = nn.Dense(
            c.projection_dim, use_bias=False, name="text_projection"
        )(pooled.astype(jnp.float32))
        return penultimate.astype(jnp.float32), pooled
