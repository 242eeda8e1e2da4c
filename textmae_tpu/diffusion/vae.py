"""AutoencoderKL (SD/SDXL VAE) in flax — latent codec for the refiner.

The img2img refiner operates in the VAE's 4-channel, 8x-downsampled latent
space; the reference gets this implicitly through diffusers
(/root/reference/models/Diffusion/__init__.py:24-27). Defaults follow the
SDXL VAE (block channels 128/256/512/512, 2 resnets per block, mid-block
self-attention, scaling_factor 0.13025); dims configurable for fast tests.

NHWC, deterministic-encode (mode of the posterior) by default — the refiner
pipeline wants the mean latent, not a sample.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.13025
    dtype: Any = jnp.float32


class VAEResnet(nn.Module):
    out_ch: int
    norm_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(self.norm_groups, epsilon=1e-6, name="norm1")(x)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1")(nn.silu(h))
        h = nn.GroupNorm(self.norm_groups, epsilon=1e-6, name="norm2")(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv2")(nn.silu(h))
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head self-attention over spatial positions (diffusers VAE mid)."""

    channels: int
    norm_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(self.norm_groups, epsilon=1e-6, name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(x)
        attn = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", q, k).astype(jnp.float32) * (c ** -0.5), axis=-1
        ).astype(v.dtype)
        x = nn.Dense(c, dtype=self.dtype, name="to_out_0")(jnp.einsum("bnm,bmc->bnc", attn, v))
        return x.reshape(b, h, w, c) + res


class VAEEncoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dt = cfg.dtype
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)), dtype=dt, name="conv_in")(x.astype(dt))
        for bi, ch in enumerate(cfg.block_out_channels):
            for li in range(cfg.layers_per_block):
                x = VAEResnet(ch, cfg.norm_groups, dt, name=f"down_{bi}_resnet_{li}")(x)
            if bi < len(cfg.block_out_channels) - 1:
                # diffusers VAE downsampler: asymmetric (0, 1) pad
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID", dtype=dt, name=f"down_{bi}_downsample")(x)
        ch = cfg.block_out_channels[-1]
        x = VAEResnet(ch, cfg.norm_groups, dt, name="mid_resnet_0")(x)
        x = VAEAttention(ch, cfg.norm_groups, dt, name="mid_attn")(x)
        x = VAEResnet(ch, cfg.norm_groups, dt, name="mid_resnet_1")(x)
        x = nn.GroupNorm(cfg.norm_groups, epsilon=1e-6, name="conv_norm_out")(x)
        x = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)), name="conv_out")(nn.silu(x))
        # diffusers quant_conv (1x1 on the moments)
        return nn.Conv(2 * cfg.latent_channels, (1, 1), name="quant_conv")(x.astype(jnp.float32))


class VAEDecoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        dt = cfg.dtype
        z = nn.Conv(cfg.latent_channels, (1, 1), name="post_quant_conv")(z)
        rev = tuple(reversed(cfg.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=((1, 1), (1, 1)), dtype=dt, name="conv_in")(z.astype(dt))
        ch = rev[0]
        x = VAEResnet(ch, cfg.norm_groups, dt, name="mid_resnet_0")(x)
        x = VAEAttention(ch, cfg.norm_groups, dt, name="mid_attn")(x)
        x = VAEResnet(ch, cfg.norm_groups, dt, name="mid_resnet_1")(x)
        for bi, ch in enumerate(rev):
            for li in range(cfg.layers_per_block + 1):
                x = VAEResnet(ch, cfg.norm_groups, dt, name=f"up_{bi}_resnet_{li}")(x)
            if bi < len(rev) - 1:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
                x = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), dtype=dt, name=f"up_{bi}_upsample")(x)
        x = nn.GroupNorm(cfg.norm_groups, epsilon=1e-6, name="conv_norm_out")(x)
        return nn.Conv(cfg.in_channels, (3, 3), padding=((1, 1), (1, 1)), name="conv_out")(nn.silu(x)).astype(jnp.float32)


class AutoencoderKL(nn.Module):
    """encode -> (mean, logvar) moments; decode <- scaled latents."""

    config: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = VAEEncoder(self.config, name="encoder")
        self.decoder = VAEDecoder(self.config, name="decoder")

    def encode_moments(self, x):
        return self.encoder(x)

    def encode(self, x):
        """Deterministic: posterior mode, scaled for the diffusion space."""
        mean, _ = jnp.split(self.encoder(x), 2, axis=-1)
        return mean * self.config.scaling_factor

    def decode(self, latents):
        return self.decoder(latents / self.config.scaling_factor)

    def __call__(self, x):
        return self.decode(self.encode(x))
