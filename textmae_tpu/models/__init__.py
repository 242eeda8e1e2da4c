from textmae_tpu.models.mcm import MCM, MCMConfig
from textmae_tpu.models.mae import (
    MAEConfig,
    MaskedAutoencoderViT,
    mae_vit_base_patch16,
    mae_vit_huge_patch14,
    mae_vit_large_patch16,
)
from textmae_tpu.models.vit import (
    ViTConfig,
    VisionTransformer,
    vit_base_patch16,
    vit_huge_patch14,
    vit_large_patch16,
)
from textmae_tpu.models.blip import Blip2
from textmae_tpu.models.diffusion import Diffuser

__all__ = [
    "MCM",
    "MCMConfig",
    "MAEConfig",
    "MaskedAutoencoderViT",
    "mae_vit_base_patch16",
    "mae_vit_large_patch16",
    "mae_vit_huge_patch14",
    "ViTConfig",
    "VisionTransformer",
    "vit_base_patch16",
    "vit_large_patch16",
    "vit_huge_patch14",
    "Blip2",
    "Diffuser",
]
