"""VGG16 perceptual (feature) loss in flax.

Replaces the reference's torchvision-based loss
(/root/reference/models/Compression/loss/vgg.py): features up to relu4_3,
loss = MSE(relu2_2) + MSE(relu3_3), with the reference's exact normalization
chain (de_normalize assuming [-1,1], then /255 + ImageNet mean/std —
image_utils.py:4-23, quirks preserved for parity).

Fixes the reference's rebuild-per-call bug (vgg.py:99 re-instantiates and
re-downloads VGG16 inside every loss evaluation): here the params live in the
model pytree and the whole loss jits into the training step.

Pretrained torchvision weights can be imported with
`textmae_tpu.train.torch_import.convert_vgg16_state_dict`; with no weights
file available the loss still trains (random projections are a valid
perceptual-ish metric), and callers may disable it via loss weights.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

# torchvision vgg16.features conv layer indices and channel widths
_VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512)
_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


class VGG16Features(nn.Module):
    """First 23 layers of VGG16.features -> (relu1_2, relu2_2, relu3_3, relu4_3)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        # x: (N, C, H, W) -> NHWC
        x = x.transpose(0, 2, 3, 1).astype(self.dtype)
        taps = []
        conv_i = 0
        relu_count = 0
        for item in _VGG16_CFG:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(item, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name=f"conv_{conv_i}")(x)
                x = nn.relu(x)
                conv_i += 1
                relu_count += 1
                if relu_count in (2, 4, 7, 10):  # relu1_2, relu2_2, relu3_3, relu4_3
                    taps.append(x)
        return tuple(taps)


def de_normalize(batch: jnp.ndarray) -> jnp.ndarray:
    """(x+1)/2*255 — the reference's [-1,1] assumption (image_utils.py:4-7)."""
    return (batch + 1.0) / 2.0 * 255.0


def normalize_batch(batch: jnp.ndarray) -> jnp.ndarray:
    """/255 then ImageNet mean/std, NCHW (image_utils.py:10-23)."""
    mean = jnp.asarray(_IMAGENET_MEAN, batch.dtype).reshape(1, 3, 1, 1)
    std = jnp.asarray(_IMAGENET_STD, batch.dtype).reshape(1, 3, 1, 1)
    return (batch / 255.0 - mean) / std


def load_vgg_variables(weights_path: str | None = None, img_size: int = 224):
    """Init VGG16Features params once; import torchvision weights when given.

    weights_path: a torch state dict of torchvision vgg16 (or its `features`
    submodule). Defaults to $TEXTMAE_VGG16_WEIGHTS. Without weights the loss
    uses the random-init network (a fixed random projection — still a usable
    perceptual surrogate, but a DIFFERENT objective than the reference's
    pretrained features, vgg.py:99) — a prominent warning is logged so
    training runs can't silently diverge from the reference objective.
    """
    import logging
    import os

    import jax

    vgg = VGG16Features()
    variables = jax.jit(
        lambda r: vgg.init(r, jnp.zeros((1, 3, img_size, img_size), jnp.float32))
    )(jax.random.PRNGKey(0))
    weights_path = weights_path or os.environ.get("TEXTMAE_VGG16_WEIGHTS")
    if weights_path:
        from textmae_tpu.train.checkpoint import convert_vgg16_state_dict

        variables = {"params": convert_vgg16_state_dict(weights_path, variables["params"])}
    else:
        logging.getLogger(__name__).warning(
            "VGG16 perceptual loss is running on RANDOM-INIT features: no "
            "--vgg-weights given and $TEXTMAE_VGG16_WEIGHTS unset. This "
            "optimizes a different perceptual objective than the reference's "
            "pretrained VGG16 (loss/vgg.py:99). Pass a torchvision vgg16 "
            "state dict to match it."
        )
    return variables


def vgg_feature_loss(
    vgg: VGG16Features, vgg_params, preds: jnp.ndarray, imgs: jnp.ndarray
) -> jnp.ndarray:
    """MSE on relu2_2 + relu3_3 after the reference normalization chain
    (loss/vgg.py:86-115). preds/imgs: (N, C, H, W)."""
    p = normalize_batch(de_normalize(preds))
    g = normalize_batch(de_normalize(imgs))
    feats_p = vgg.apply(vgg_params, p)
    feats_g = vgg.apply(vgg_params, g)
    loss = jnp.mean((feats_p[1] - feats_g[1]) ** 2) + jnp.mean((feats_p[2] - feats_g[2]) ** 2)
    return loss.astype(jnp.float32)
