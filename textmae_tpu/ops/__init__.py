from textmae_tpu.ops.patches import patchify, unpatchify
from textmae_tpu.ops.pos_embed import (
    get_1d_sincos_pos_embed_from_grid,
    get_2d_sincos_pos_embed,
    interpolate_pos_embed,
)
from textmae_tpu.ops.ste import lower_bound, quantize_ste

__all__ = [
    "patchify",
    "unpatchify",
    "get_1d_sincos_pos_embed_from_grid",
    "get_2d_sincos_pos_embed",
    "interpolate_pos_embed",
    "lower_bound",
    "quantize_ste",
]
