"""TPU-native BLIP-2 captioning (pipeline stage 1).

flax vision tower + Q-Former + OPT decoder with a jitted KV-cache greedy
loop; `convert.load_blip2_weights` fills it from an HF snapshot. Replaces
the reference's torch/HF wrapper (/root/reference/models/BLIP/__init__.py).
"""
from textmae_tpu.captioning.blip2 import Blip2Captioner, Blip2Config
from textmae_tpu.captioning.opt import OPTConfig, OPTDecoder
from textmae_tpu.captioning.qformer import QFormer, QFormerConfig
from textmae_tpu.captioning.vision import VisionConfig, VisionTower

__all__ = [
    "Blip2Captioner",
    "Blip2Config",
    "OPTConfig",
    "OPTDecoder",
    "QFormer",
    "QFormerConfig",
    "VisionConfig",
    "VisionTower",
]
