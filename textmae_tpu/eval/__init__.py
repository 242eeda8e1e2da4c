"""Evaluation: real-bitstream codec, metrics, batch harness, JSON reports."""
from textmae_tpu.eval.codec import CompressedImage, MCMCodec
from textmae_tpu.eval.export import ExportedMCM, export_mcm
from textmae_tpu.eval.metrics import compute_metrics, psnr
from textmae_tpu.eval.harness import eval_model, inference, inference_entropy_estimation
from textmae_tpu.eval.tiling import inference_tiled, tile_image, untile_image

__all__ = [
    "MCMCodec",
    "CompressedImage",
    "ExportedMCM",
    "export_mcm",
    "psnr",
    "compute_metrics",
    "eval_model",
    "inference",
    "inference_entropy_estimation",
    "inference_tiled",
    "tile_image",
    "untile_image",
]
