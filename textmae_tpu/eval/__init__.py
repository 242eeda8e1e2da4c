"""Evaluation: real-bitstream codec, metrics, batch harness, JSON reports."""
from textmae_tpu.eval.codec import MCMCodec
from textmae_tpu.eval.metrics import compute_metrics, psnr
from textmae_tpu.eval.harness import eval_model, inference, inference_entropy_estimation

__all__ = [
    "MCMCodec",
    "psnr",
    "compute_metrics",
    "eval_model",
    "inference",
    "inference_entropy_estimation",
]
