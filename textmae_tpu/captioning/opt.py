"""OPT decoder-only LM in flax, with KV-cache greedy decoding under jit.

The BLIP-2 language half (blip2-opt-2.7b: 32 layers, hidden 2560, ReLU FFN,
learned positions with the OPT +2 offset, tied lm_head). All dims come from
`OPTConfig` so tests/bench run tiny instances; the HF importer
(captioning/convert.py) fills the full model from a snapshot.

Decode is TPU-shaped: `prefill` runs the (projected Q-Former prefix +
prompt) embeddings in one pass and fills a static-length KV cache;
`decode_step` is a fixed-shape single-token step (cache update via
dynamic_update_slice, attention masked by position) that the caption loop
drives with `lax.scan` — one compiled program, no host round trips.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 2560
    layers: int = 32
    heads: int = 32
    ffn_size: int = 10240
    max_positions: int = 512  # cache length (prefix + prompt + new tokens)
    bos_token_id: int = 2  # OPT uses </s> as BOS
    eos_token_id: int = 2
    pad_token_id: int = 1
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.heads


class _OPTAttention(nn.Module):
    cfg: OPTConfig

    def setup(self):
        c = self.cfg
        self.q_proj = nn.Dense(c.hidden_size, dtype=c.dtype, name="q_proj")
        self.k_proj = nn.Dense(c.hidden_size, dtype=c.dtype, name="k_proj")
        self.v_proj = nn.Dense(c.hidden_size, dtype=c.dtype, name="v_proj")
        self.out_proj = nn.Dense(c.hidden_size, dtype=c.dtype, name="out_proj")

    def _split(self, x):
        n, t, _ = x.shape
        c = self.cfg
        return x.reshape(n, t, c.heads, c.head_dim).transpose(0, 2, 1, 3)

    def prefill(self, x, cache_len: int):
        """x: (N, T, H) -> (out, (k_cache, v_cache)) with caches (N, h, cache_len, d)."""
        c = self.cfg
        n, t, _ = x.shape
        q = self._split(self.q_proj(x)) * (c.head_dim ** -0.5)
        k = self._split(self.k_proj(x))
        v = self._split(self.v_proj(x))
        mask = jnp.tril(jnp.ones((t, t), bool))
        s = jnp.einsum("nhqd,nhkd->nhqk", q, k).astype(jnp.float32)
        s = jnp.where(mask[None, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("nhqk,nhkd->nhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(n, t, c.hidden_size)
        pad = cache_len - t
        k_cache = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v_cache = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return self.out_proj(o), (k_cache, v_cache)

    def step(self, x, cache, pos):
        """x: (N, 1, H); pos: scalar index of this token. Returns new cache."""
        c = self.cfg
        n = x.shape[0]
        k_cache, v_cache = cache
        q = self._split(self.q_proj(x)) * (c.head_dim ** -0.5)  # (N, h, 1, d)
        k_new = self._split(self.k_proj(x))
        v_new = self._split(self.v_proj(x))
        k_cache = jax.lax.dynamic_update_slice(k_cache, k_new, (0, 0, pos, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v_new, (0, 0, pos, 0))
        valid = jnp.arange(k_cache.shape[2]) <= pos
        s = jnp.einsum("nhqd,nhkd->nhqk", q, k_cache).astype(jnp.float32)
        s = jnp.where(valid[None, None, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1).astype(v_cache.dtype)
        o = jnp.einsum("nhqk,nhkd->nhqd", p, v_cache)
        o = o.transpose(0, 2, 1, 3).reshape(n, 1, c.hidden_size)
        return self.out_proj(o), (k_cache, v_cache)


class _OPTLayer(nn.Module):
    cfg: OPTConfig

    def setup(self):
        c = self.cfg
        self.self_attn = _OPTAttention(c, name="self_attn")
        self.self_attn_layer_norm = nn.LayerNorm(epsilon=1e-5, name="self_attn_layer_norm")
        self.fc1 = nn.Dense(c.ffn_size, dtype=c.dtype, name="fc1")
        self.fc2 = nn.Dense(c.hidden_size, dtype=c.dtype, name="fc2")
        self.final_layer_norm = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")

    def _ffn(self, x):
        return x + self.fc2(nn.relu(self.fc1(self.final_layer_norm(x))))

    def prefill(self, x, cache_len):
        h, cache = self.self_attn.prefill(self.self_attn_layer_norm(x), cache_len)
        return self._ffn(x + h), cache

    def step(self, x, cache, pos):
        h, cache = self.self_attn.step(self.self_attn_layer_norm(x), cache, pos)
        return self._ffn(x + h), cache


class OPTDecoder(nn.Module):
    """Token/position embedding + layer stack + tied lm head.

    Methods are exposed through `apply(..., method=...)`:
      embed(tokens)         -> (N, T, H) embeddings (no positions)
      prefill(embeds)       -> (logits_last, caches) filling the KV cache
      decode_step(tok, caches, pos) -> (logits, caches)
    """

    config: OPTConfig = OPTConfig()

    def setup(self):
        c = self.config
        self.embed_tokens = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.dtype, name="embed_tokens")
        # OPT quirk: learned positions are stored with a +2 offset
        self.embed_positions = nn.Embed(
            c.max_positions + 2, c.hidden_size, dtype=c.dtype, name="embed_positions"
        )
        self.layers = [_OPTLayer(c, name=f"layers_{i}") for i in range(c.layers)]
        self.final_norm = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")

    def embed(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return self.embed_tokens(tokens)

    def _logits(self, h):
        emb = self.embed_tokens.embedding  # tied lm head
        return jnp.einsum("nth,vh->ntv", h.astype(jnp.float32), emb.astype(jnp.float32))

    def prefill(self, embeds: jnp.ndarray) -> Tuple[jnp.ndarray, Tuple]:
        c = self.config
        t = embeds.shape[1]
        pos = self.embed_positions(jnp.arange(t) + 2)
        x = embeds.astype(c.dtype) + pos[None].astype(c.dtype)
        caches = []
        for layer in self.layers:
            x, cache = layer.prefill(x, c.max_positions)
            caches.append(cache)
        x = self.final_norm(x)
        return self._logits(x[:, -1:]), tuple(caches)

    def decode_step(self, token: jnp.ndarray, caches: Tuple, pos) -> Tuple[jnp.ndarray, Tuple]:
        """token: (N,) int32; pos: scalar position of this token."""
        c = self.config
        x = self.embed_tokens(token)[:, None]
        x = x + self.embed_positions(pos + 2)[None, None].astype(x.dtype)
        new_caches = []
        for layer, cache in zip(self.layers, caches):
            x, cache = layer.step(x, cache, pos)
            new_caches.append(cache)
        x = self.final_norm(x)
        return self._logits(x), tuple(new_caches)
