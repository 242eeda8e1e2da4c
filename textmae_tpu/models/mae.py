"""Masked Autoencoder ViT (flax) — the vendored-MAE secondary workload.

One model covering both reference variants:
  * random masking by argsort of uniform noise
    (/root/reference/models/MAE/models_mae.py:123-148) when `ids_shuffle` is
    None (pass a `mask` rng),
  * externally supplied `ids_shuffle` (score-guided)
    (/root/reference/models/MAE/models_mae_new.py:128-162) — the MAE->MCM
    bridge.

forward returns (loss, pred, mask) with the reference loss semantics
(models_mae.py:198-214): per-patch MSE on masked patches only, optional
norm_pix_loss (per-patch mean/var normalized targets).

Arch factories mirror models_mae.py:223-250 (base/large/huge, patch 16).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from textmae_tpu.ops.patches import patchify, unpatchify
from textmae_tpu.ops.pos_embed import get_2d_sincos_pos_embed
from textmae_tpu.ops.vit import Block, PatchEmbed


@dataclasses.dataclass(frozen=True)
class MAEConfig:
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    norm_pix_loss: bool = False
    dtype: object = jnp.float32
    use_pallas: bool = True
    remat: bool = False
    # mixture-of-experts encoder (V-MoE placement: every `moe_every`-th
    # encoder block's MLP becomes an MoE layer; 0 experts = dense ViT).
    # Expert parallelism comes from parallel.moe.shard_moe_params placing
    # the stacked expert weights over an "expert" mesh axis.
    moe_experts: int = 0
    moe_top_k: int = 1
    moe_every: int = 2
    moe_capacity_factor: float = 1.25

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2


def mae_vit_base_patch16(**kw) -> "MaskedAutoencoderViT":
    return MaskedAutoencoderViT(MAEConfig(embed_dim=768, depth=12, num_heads=12, **kw))


def mae_vit_large_patch16(**kw) -> "MaskedAutoencoderViT":
    return MaskedAutoencoderViT(MAEConfig(embed_dim=1024, depth=24, num_heads=16, **kw))


def mae_vit_huge_patch14(**kw) -> "MaskedAutoencoderViT":
    return MaskedAutoencoderViT(
        MAEConfig(patch_size=14, embed_dim=1280, depth=32, num_heads=16, **kw)
    )


class MaskedAutoencoderViT(nn.Module):
    config: MAEConfig = MAEConfig()

    def setup(self):
        cfg = self.config
        dt = cfg.dtype
        grid = cfg.img_size // cfg.patch_size
        block_cls = nn.remat(Block) if cfg.remat else Block

        self.patch_embed = PatchEmbed(cfg.patch_size, cfg.embed_dim, dtype=dt)
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, cfg.embed_dim)
        )
        self.pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(cfg.embed_dim, grid, cls_token=True)
        )[None]
        if cfg.moe_experts > 0:
            from textmae_tpu.parallel.moe import MoEBlock

            moe_cls = nn.remat(MoEBlock) if cfg.remat else MoEBlock
            is_moe = lambda i: i % cfg.moe_every == cfg.moe_every - 1
        else:
            moe_cls, is_moe = None, lambda i: False
        self.blocks = [
            moe_cls(
                cfg.embed_dim, cfg.num_heads, num_experts=cfg.moe_experts,
                mlp_ratio=cfg.mlp_ratio, top_k=cfg.moe_top_k,
                capacity_factor=cfg.moe_capacity_factor,
                use_pallas=cfg.use_pallas, dtype=dt, name=f"blocks_{i}",
            )
            if is_moe(i)
            else block_cls(
                cfg.embed_dim, cfg.num_heads, mlp_ratio=cfg.mlp_ratio,
                use_pallas=cfg.use_pallas, dtype=dt, name=f"blocks_{i}",
            )
            for i in range(cfg.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-6, name="norm")

        self.decoder_embed = nn.Dense(
            cfg.decoder_embed_dim, kernel_init=nn.initializers.xavier_uniform(),
            dtype=dt, name="decoder_embed",
        )
        self.mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (1, 1, cfg.decoder_embed_dim)
        )
        self.decoder_pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(cfg.decoder_embed_dim, grid, cls_token=True)
        )[None]
        self.decoder_blocks = [
            block_cls(
                cfg.decoder_embed_dim, cfg.decoder_num_heads, mlp_ratio=cfg.mlp_ratio,
                use_pallas=cfg.use_pallas, dtype=dt, name=f"decoder_blocks_{i}",
            )
            for i in range(cfg.decoder_depth)
        ]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-6, name="decoder_norm")
        self.decoder_pred = nn.Dense(
            cfg.patch_size ** 2 * cfg.in_chans,
            kernel_init=nn.initializers.xavier_uniform(), name="decoder_pred",
        )

    # ------------------------------------------------------------------
    def masking(
        self,
        x: jnp.ndarray,
        mask_ratio: float,
        ids_shuffle: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Keep len_keep tokens; returns (x_masked, mask, ids_restore).

        mask: (N, L), 0 = kept, 1 = removed (models_mae.py:143-146).
        """
        n, l, d = x.shape
        len_keep = int(l * (1 - mask_ratio))
        if ids_shuffle is None:
            if rng is None:
                raise ValueError("random masking requires an rng")
            noise = jax.random.uniform(rng, (n, l))
            ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :len_keep]
        x_masked = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
        mask = jnp.ones((n, l), x.dtype)
        mask = mask.at[:, :len_keep].set(0)
        mask = jnp.take_along_axis(mask, ids_restore, axis=1)
        return x_masked, mask, ids_restore

    # The encoder/decoder each split into (pre -> block stack -> post) so the
    # engine can swap the sequential block loop for the pipeline-parallel
    # runner (train/mae_engine.make_pipelined_mae_pretrain_step) while pre/
    # post still run through the same module methods.
    def encode_tokens(self, imgs, mask_ratio, ids_shuffle=None, rng=None):
        """Everything before the encoder blocks -> (x, mask, ids_restore)."""
        if ids_shuffle is None and rng is None:
            rng = self.make_rng("mask")
        x = self.patch_embed(imgs)
        x = x + self.pos_embed[:, 1:, :].astype(x.dtype)
        x, mask, ids_restore = self.masking(x, mask_ratio, ids_shuffle, rng)
        cls = (self.cls_token + self.pos_embed[:, :1, :]).astype(x.dtype)
        cls = jnp.broadcast_to(cls, (x.shape[0], 1, cls.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
        return x, mask, ids_restore

    def encode_norm(self, x):
        return self.norm(x.astype(jnp.float32))

    def forward_encoder(self, imgs, mask_ratio, ids_shuffle=None, rng=None):
        x, mask, ids_restore = self.encode_tokens(imgs, mask_ratio, ids_shuffle, rng)
        for blk in self.blocks:
            x = blk(x)
        x = self.encode_norm(x)
        return x, mask, ids_restore

    def decode_tokens(self, x, ids_restore):
        """Everything before the decoder blocks (embed, unshuffle, pos)."""
        cfg = self.config
        x = self.decoder_embed(x)
        n = x.shape[0]
        num_mask = ids_restore.shape[1] + 1 - x.shape[1]
        mask_tokens = jnp.broadcast_to(
            self.mask_token.astype(x.dtype), (n, num_mask, cfg.decoder_embed_dim)
        )
        x_ = jnp.concatenate([x[:, 1:, :], mask_tokens], axis=1)
        x_ = jnp.take_along_axis(x_, ids_restore[:, :, None], axis=1)
        x = jnp.concatenate([x[:, :1, :], x_], axis=1)  # keep the real cls
        return x + self.decoder_pos_embed.astype(x.dtype)

    def decode_pred(self, x):
        x = self.decoder_norm(x.astype(jnp.float32))
        x = self.decoder_pred(x)
        return x[:, 1:, :]

    def forward_decoder(self, x, ids_restore):
        x = self.decode_tokens(x, ids_restore)
        for blk in self.decoder_blocks:
            x = blk(x)
        return self.decode_pred(x)

    def forward_loss(self, imgs, pred, mask):
        """Masked-patch MSE, optional per-patch normalization
        (models_mae.py:198-214)."""
        cfg = self.config
        target = patchify(imgs.astype(jnp.float32), cfg.patch_size)
        if cfg.norm_pix_loss:
            mean = target.mean(axis=-1, keepdims=True)
            var = target.var(axis=-1, keepdims=True)
            target = (target - mean) / (var + 1e-6) ** 0.5
        loss = ((pred.astype(jnp.float32) - target) ** 2).mean(axis=-1)
        return (loss * mask).sum() / mask.sum()

    def __call__(self, imgs, mask_ratio: float = 0.75, ids_shuffle=None, training=False):
        rng = self.make_rng("mask") if ids_shuffle is None else None
        latent, mask, ids_restore = self.forward_encoder(imgs, mask_ratio, ids_shuffle, rng)
        pred = self.forward_decoder(latent, ids_restore)
        loss = self.forward_loss(imgs, pred, mask)
        return loss, pred, mask

    def reconstruct(self, pred) -> jnp.ndarray:
        return unpatchify(
            pred.astype(jnp.float32), self.config.patch_size, self.config.in_chans
        )
