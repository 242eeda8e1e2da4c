"""SDXL-style conditional UNet in flax — the refiner's denoise network.

TPU-native re-implementation of the architecture diffusers loads for
stabilityai/stable-diffusion-xl-refiner-1.0 (UNet2DConditionModel), which the
reference wraps opaquely (/root/reference/models/Diffusion/__init__.py:8-28).
Defaults follow the published refiner config: block channels
(384, 768, 1280, 1280), cross-attention on 1280-d text states with 4
transformer layers per attention block, 256-d Fourier features for the five
refiner conditioning ids (original size, crop, aesthetic score), and a
1280-d pooled text embedding into the added-condition MLP. Every dimension is
configurable so reduced-dim instances jit-compile quickly in tests/bench.

Design: NHWC layout throughout; GroupNorm/attention in the model dtype
(bf16-able); parameter tree mirrors diffusers' module paths closely enough
for a mechanical converter (textmae_tpu.diffusion.convert).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (384, 768, 1280, 1280)
    # True = the block at this depth carries transformer (cross-attn) layers
    attn_blocks: Tuple[bool, ...] = (False, True, True, False)
    layers_per_block: int = 2
    transformer_layers_per_block: int = 4
    attention_head_dim: int = 64
    cross_attention_dim: int = 1280
    addition_time_embed_dim: int = 256
    num_time_ids: int = 5  # refiner: orig (h, w), crop (top, left), aesthetic
    pooled_projection_dim: int = 1280
    norm_groups: int = 32
    dtype: Any = jnp.float32
    # fused Pallas attention on TPU (ops/attention.py: single-block kernel at
    # S<=256, blockwise flash beyond). False routes the jnp reference path —
    # required under sharded jit (a pallas_call blocks GSPMD partitioning of
    # the (batch, head) grid), so shard_refiner_params flips it off.
    use_pallas: bool = True

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


def timestep_embedding(
    t: jnp.ndarray, dim: int, max_period: float = 10000.0, flip_sin_to_cos: bool = True
) -> jnp.ndarray:
    """Sinusoidal Fourier features, diffusers get_timestep_embedding semantics
    (downscale_freq_shift=1... the SDXL config uses shift 0 with flipped
    sin/cos; we take the SDXL setting)."""
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[..., None] * freqs
    sin, cos = jnp.sin(args), jnp.cos(args)
    return jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)


class TimestepMLP(nn.Module):
    """linear_1 -> silu -> linear_2 (diffusers TimestepEmbedding)."""

    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="linear_1")(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="linear_2")(nn.silu(x))


class ResnetBlock(nn.Module):
    out_ch: int
    norm_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        h = nn.GroupNorm(self.norm_groups, epsilon=1e-5, name="norm1")(x)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1")(nn.silu(h))
        h = h + nn.Dense(self.out_ch, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))[:, None, None, :]
        h = nn.GroupNorm(self.norm_groups, epsilon=1e-5, name="norm2")(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv2")(nn.silu(h))
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    query_dim: int
    heads: int
    dtype: Dtype = jnp.float32
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x, context=None):
        from textmae_tpu.ops.attention import fused_attention

        context = x if context is None else context
        d = self.query_dim
        q = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_v")(context)
        b, n, _ = q.shape
        m = context.shape[1]
        hd = d // self.heads
        q = q.reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, m, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, m, self.heads, hd).transpose(0, 2, 1, 3)
        out = fused_attention(q, k, v, use_pallas=self.use_pallas)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d).astype(self.dtype)
        return nn.Dense(d, dtype=self.dtype, name="to_out_0")(out)


class GEGLUFeedForward(nn.Module):
    """GEGLU MLP with the value/gate projections as SEPARATE kernels.

    diffusers fuses both into one `net.0.proj` weight and splits the output
    in half. Splitting a tensor-parallel-sharded axis in half is exactly the
    wrong layout for TP (each device would hold one half entirely ->
    all-to-all before the gate multiply), so the two halves are separate
    Dense layers here — each column-shards cleanly over "model" — and the
    converter (convert.py) slices the diffusers weight into them.
    """

    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = nn.Dense(inner, dtype=self.dtype, name="proj_h")(x)
        gate = nn.Dense(inner, dtype=self.dtype, name="proj_gate")(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(h * nn.gelu(gate, approximate=False))


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dtype: Dtype = jnp.float32
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x, context):
        x = x + CrossAttention(
            self.dim, self.heads, self.dtype, self.use_pallas, name="attn1"
        )(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x))
        x = x + CrossAttention(
            self.dim, self.heads, self.dtype, self.use_pallas, name="attn2"
        )(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x), context)
        return x + GEGLUFeedForward(self.dim, dtype=self.dtype, name="ff")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        )


class Transformer2D(nn.Module):
    """GroupNorm -> linear proj-in -> N transformer layers -> proj-out + skip."""

    channels: int
    heads: int
    depth: int
    norm_groups: int = 32
    dtype: Dtype = jnp.float32
    use_pallas: bool = True

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(self.norm_groups, epsilon=1e-6, name="norm")(x)
        x = x.reshape(b, h * w, c)
        x = nn.Dense(self.channels, dtype=self.dtype, name="proj_in")(x)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                self.channels, self.heads, self.dtype, self.use_pallas,
                name=f"transformer_blocks_{i}",
            )(x, context)
        x = nn.Dense(self.channels, dtype=self.dtype, name="proj_out")(x)
        return x.reshape(b, h, w, c) + res


class Downsample(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv",
        )(x)


class Upsample(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        return nn.Conv(
            self.channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv"
        )(x)


class UNet2DCondition(nn.Module):
    config: UNetConfig = UNetConfig()

    @nn.compact
    def __call__(self, sample, timestep, encoder_hidden_states, text_embeds, time_ids):
        """sample: (N, H, W, in_ch) latents; timestep: scalar or (N,);
        encoder_hidden_states: (N, T, cross_dim); text_embeds: (N, pooled_dim);
        time_ids: (N, num_time_ids). Returns epsilon prediction, sample shape.
        """
        cfg = self.config
        dt = cfg.dtype
        if timestep.ndim == 0:
            timestep = jnp.broadcast_to(timestep, (sample.shape[0],))

        # time + added conditioning (SDXL add_embedding contract)
        temb = timestep_embedding(timestep, cfg.block_out_channels[0])
        temb = TimestepMLP(cfg.time_embed_dim, dt, name="time_embedding")(temb)
        ids_emb = timestep_embedding(
            time_ids.reshape(-1), cfg.addition_time_embed_dim
        ).reshape(sample.shape[0], cfg.num_time_ids * cfg.addition_time_embed_dim)
        add = jnp.concatenate([text_embeds.astype(jnp.float32), ids_emb], axis=-1)
        temb = temb + TimestepMLP(cfg.time_embed_dim, dt, name="add_embedding")(add)
        temb = temb.astype(dt)

        ctx = encoder_hidden_states.astype(dt)
        hd = cfg.attention_head_dim

        x = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)), dtype=dt, name="conv_in"
        )(sample.astype(dt))

        # ---- down path ----
        skips = [x]
        for bi, ch in enumerate(cfg.block_out_channels):
            for li in range(cfg.layers_per_block):
                x = ResnetBlock(ch, cfg.norm_groups, dt, name=f"down_{bi}_resnet_{li}")(x, temb)
                if cfg.attn_blocks[bi]:
                    x = Transformer2D(
                        ch, ch // hd, cfg.transformer_layers_per_block,
                        cfg.norm_groups, dt, cfg.use_pallas,
                        name=f"down_{bi}_attn_{li}",
                    )(x, ctx)
                skips.append(x)
            if bi < len(cfg.block_out_channels) - 1:
                x = Downsample(ch, dt, name=f"down_{bi}_downsample")(x)
                skips.append(x)

        # ---- mid ----
        mid_ch = cfg.block_out_channels[-1]
        x = ResnetBlock(mid_ch, cfg.norm_groups, dt, name="mid_resnet_0")(x, temb)
        x = Transformer2D(
            mid_ch, mid_ch // hd, cfg.transformer_layers_per_block,
            cfg.norm_groups, dt, cfg.use_pallas, name="mid_attn",
        )(x, ctx)
        x = ResnetBlock(mid_ch, cfg.norm_groups, dt, name="mid_resnet_1")(x, temb)

        # ---- up path ----
        for ui, bi in enumerate(reversed(range(len(cfg.block_out_channels)))):
            ch = cfg.block_out_channels[bi]
            for li in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                if x.shape[1:3] != skip.shape[1:3]:
                    # odd spatial dims: the 2x upsample overshoots the skip's
                    # size by one; resize to match (diffusers passes the skip
                    # size into its upsamplers for exactly this case)
                    x = jax.image.resize(
                        x, (x.shape[0], *skip.shape[1:3], x.shape[3]), "nearest"
                    )
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResnetBlock(ch, cfg.norm_groups, dt, name=f"up_{ui}_resnet_{li}")(x, temb)
                if cfg.attn_blocks[bi]:
                    x = Transformer2D(
                        ch, ch // hd, cfg.transformer_layers_per_block,
                        cfg.norm_groups, dt, cfg.use_pallas,
                        name=f"up_{ui}_attn_{li}",
                    )(x, ctx)
            if bi > 0:
                x = Upsample(ch, dt, name=f"up_{ui}_upsample")(x)

        x = nn.GroupNorm(cfg.norm_groups, epsilon=1e-5, name="conv_norm_out")(x)
        x = nn.Conv(
            cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)), name="conv_out"
        )(nn.silu(x))
        return x.astype(jnp.float32)
