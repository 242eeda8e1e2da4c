"""Fixed 2-D sine-cosine position embeddings + resolution interpolation.

Numerically matches the reference generator
(/root/reference/models/Compression/common/pos_embed.py:23-99): frequencies
omega_d = 1/10000**(2d/D), h-embedding concatenated before w-embedding, sin
before cos, and an optional all-zero cls row prepended.

Host-side (numpy) on purpose: these are computed once at model init and stored
as a frozen constant; nothing here belongs in the jit trace.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """(M,) positions -> (M, embed_dim) with [sin | cos] halves (pos_embed.py:71-96)."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int, cls_token: bool = False) -> np.ndarray:
    """(grid_size², D) table, with an optional leading zero row for cls (pos_embed.py:23-45)."""
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)  # w goes first
    grid = grid.reshape([2, 1, grid_size, grid_size])
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    pos_embed = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        pos_embed = np.concatenate([np.zeros([1, embed_dim]), pos_embed], axis=0)
    return pos_embed.astype(np.float32)


def interpolate_pos_embed(
    pos_embed: jnp.ndarray, new_grid_size: int, num_extra_tokens: int = 1
) -> jnp.ndarray:
    """Bicubic-resize a (1, T, D) position table to a new token grid.

    TPU-native replacement for the checkpoint-surgery helper
    (/root/reference/models/Compression/common/pos_embed.py:103-132); uses
    jax.image.resize(method='bicubic') instead of torch F.interpolate.
    """
    tokens, dim = pos_embed.shape[-2], pos_embed.shape[-1]
    orig_size = int(round((tokens - num_extra_tokens) ** 0.5))
    if orig_size == new_grid_size:
        return pos_embed
    extra = pos_embed[:, :num_extra_tokens]
    grid = pos_embed[:, num_extra_tokens:].reshape(-1, orig_size, orig_size, dim)
    grid = jax.image.resize(
        grid, (grid.shape[0], new_grid_size, new_grid_size, dim), method="bicubic"
    )
    grid = grid.reshape(-1, new_grid_size * new_grid_size, dim)
    return jnp.concatenate([extra, grid], axis=1)
