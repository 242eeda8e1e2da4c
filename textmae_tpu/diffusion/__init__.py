"""TPU-native SDXL-refiner stack (stage 3 of the TextMAE pipeline)."""
from textmae_tpu.diffusion.clip_text import CLIPTextConfig, CLIPTextEncoder, hash_tokenize
from textmae_tpu.diffusion.refiner import RefinerConfig, SDXLRefiner
from textmae_tpu.diffusion.scheduler import (
    EulerSchedule,
    euler_schedule,
    euler_step,
    img2img_slice,
    scale_model_input,
)
from textmae_tpu.diffusion.unet import UNet2DCondition, UNetConfig
from textmae_tpu.diffusion.vae import AutoencoderKL, VAEConfig

__all__ = [
    "AutoencoderKL",
    "CLIPTextConfig",
    "CLIPTextEncoder",
    "EulerSchedule",
    "RefinerConfig",
    "SDXLRefiner",
    "UNet2DCondition",
    "UNetConfig",
    "VAEConfig",
    "euler_schedule",
    "euler_step",
    "hash_tokenize",
    "img2img_slice",
    "scale_model_input",
]
