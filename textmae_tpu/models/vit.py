"""ViT image classifier for MAE finetune / linear probe.

Parity with /root/reference/models/MAE/models_vit.py:20-74: a standard ViT
whose `global_pool` option average-pools patch tokens and applies fc_norm in
place of the final pre-head norm on the cls token. Learnable pos_embed (unlike
the MAE's fixed sincos) so checkpoint import exercises pos-embed interpolation.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from textmae_tpu.ops.vit import Block, PatchEmbed


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: int = 224
    patch_size: int = 16
    num_classes: int = 1000
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    global_pool: bool = True
    drop_path: float = 0.0  # placeholder; stochastic depth not used in eval
    dtype: object = jnp.float32
    use_pallas: bool = True
    # MoE encoder blocks (must mirror the MAEConfig the checkpoint was
    # pretrained with so blocks_i param trees line up; see models/mae.py)
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_every: int = 2
    moe_capacity_factor: float = 1.25

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2


def vit_base_patch16(**kw) -> "VisionTransformer":
    return VisionTransformer(ViTConfig(embed_dim=768, depth=12, num_heads=12, **kw))


def vit_large_patch16(**kw) -> "VisionTransformer":
    return VisionTransformer(ViTConfig(embed_dim=1024, depth=24, num_heads=16, **kw))


def vit_huge_patch14(**kw) -> "VisionTransformer":
    return VisionTransformer(
        ViTConfig(patch_size=14, embed_dim=1280, depth=32, num_heads=16, **kw)
    )


class VisionTransformer(nn.Module):
    config: ViTConfig = ViTConfig()

    def setup(self):
        cfg = self.config
        dt = cfg.dtype
        self.patch_embed = PatchEmbed(cfg.patch_size, cfg.embed_dim, dtype=dt)
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, cfg.embed_dim)
        )
        self.pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, cfg.num_patches + 1, cfg.embed_dim),
        )
        # stochastic depth with linearly increasing per-block rate (timm
        # convention; main_finetune.py --drop_path)
        rates = [
            cfg.drop_path * i / max(cfg.depth - 1, 1) for i in range(cfg.depth)
        ]
        if cfg.moe_experts > 0:
            from textmae_tpu.parallel.moe import MoEBlock

            is_moe = lambda i: i % cfg.moe_every == cfg.moe_every - 1
        else:
            MoEBlock, is_moe = None, lambda i: False
        self.blocks = [
            MoEBlock(
                cfg.embed_dim, cfg.num_heads, num_experts=cfg.moe_experts,
                mlp_ratio=cfg.mlp_ratio, top_k=cfg.moe_top_k,
                capacity_factor=cfg.moe_capacity_factor,
                use_pallas=cfg.use_pallas, dtype=dt, drop_path=rates[i],
                name=f"blocks_{i}",
            )
            if is_moe(i)
            else Block(
                cfg.embed_dim, cfg.num_heads, mlp_ratio=cfg.mlp_ratio,
                use_pallas=cfg.use_pallas, dtype=dt, drop_path=rates[i],
                name=f"blocks_{i}",
            )
            for i in range(cfg.depth)
        ]
        if cfg.global_pool:
            self.fc_norm = nn.LayerNorm(epsilon=1e-6, name="fc_norm")
        else:
            self.norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        self.head = nn.Dense(cfg.num_classes, name="head") if cfg.num_classes else None

    def forward_features(
        self, imgs: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        cfg = self.config
        x = self.patch_embed(imgs)
        cls = jnp.broadcast_to(
            self.cls_token.astype(x.dtype), (x.shape[0], 1, cfg.embed_dim)
        )
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embed.astype(x.dtype)
        for blk in self.blocks:
            x = blk(x, deterministic=deterministic)
        if cfg.global_pool:
            x = x[:, 1:, :].mean(axis=1)  # pool patch tokens (models_vit.py:38-41)
            return self.fc_norm(x.astype(jnp.float32))
        x = self.norm(x.astype(jnp.float32))
        return x[:, 0]

    def __call__(self, imgs: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = self.forward_features(imgs, deterministic=deterministic)
        if self.head is not None:
            x = self.head(x)
        return x
