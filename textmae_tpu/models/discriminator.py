"""Patch discriminator for GAN-loss MAE pretraining.

The reference's MAE init is `mae_visualize_vit_large_ganloss.pth`
(/root/reference/setup.sh:21-22) — the MAE authors' visualization model
finetuned with an adversarial loss so reconstructions look like images
rather than blurry MSE optima. That training code is unpublished; this is
the standard recipe shape it names: a fully-convolutional PatchGAN critic
(pix2pix / taming-transformers lineage) judging local realism of the
composite reconstruction, trained with the hinge objective
(train/gan_engine.py).

TPU notes: NHWC convs, GroupNorm (batch-statistics-free — the jitted step
runs real and fake through the same params), LeakyReLU(0.2); everything is
plain XLA-fusable ops, no custom kernels needed at these sizes.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    in_chans: int = 3
    channels: Tuple[int, ...] = (64, 128, 256)
    norm_groups: int = 8
    dtype: Any = jnp.float32


class PatchDiscriminator(nn.Module):
    """(N, C, H, W) image -> (N, h', w', 1) patch realism logits."""

    config: DiscriminatorConfig = DiscriminatorConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        dt = cfg.dtype
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(dt)  # NCHW -> NHWC
        for i, ch in enumerate(cfg.channels):
            x = nn.Conv(
                ch, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                dtype=dt, name=f"conv_{i}",
            )(x)
            if i > 0:  # pix2pix: no norm on the first block
                x = nn.GroupNorm(cfg.norm_groups, epsilon=1e-5, name=f"norm_{i}")(x)
            x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(
            cfg.channels[-1], (4, 4), padding=((1, 1), (1, 1)), dtype=dt,
            name="conv_pen",
        )(x)
        x = nn.leaky_relu(
            nn.GroupNorm(cfg.norm_groups, epsilon=1e-5, name="norm_pen")(x), 0.2
        )
        return nn.Conv(
            1, (4, 4), padding=((1, 1), (1, 1)), name="conv_out"
        )(x).astype(jnp.float32)
