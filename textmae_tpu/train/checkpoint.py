"""Orbax checkpointing + torch-checkpoint import.

Checkpoint contract parity with the reference
(/root/reference/models/Compression/common/model_utils.py:9-64,
training.py:19-23): dict checkpoints holding model + optimizer state + epoch,
written by the lead process only, best-model copy selected by val loss, resume
restoring optimizers and start epoch. Orbax replaces torch.save; the logical
layout is {"state": TrainState pytree, "meta": {epoch, best_loss, args}}.

The torch importer loads a pretrained MAE checkpoint
(mae_visualize_vit_large[_ganloss].pth, setup.sh:21-22) into MCM/MAE flax
params, transposing torch layouts -> flax (OIHW->HWIO convs, [out,in]->[in,out]
dense), dropping mismatched heads and regenerating fixed sincos pos-embeds at
the target grid (the reference's interpolate_pos_embed + head-drop,
training.py:163-176).
"""
from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


# ---------------------------------------------------------------------------
# Orbax save / restore
# ---------------------------------------------------------------------------
def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def is_lead_process() -> bool:
    return jax.process_index() == 0


def save_checkpoint(directory: os.PathLike, name: str, state, meta: Dict) -> Optional[Path]:
    """Write {state, meta} under directory/name (lead process only).

    The state pytree is canonicalized through flax.serialization so restore
    does not depend on custom pytree node ordering (optax named tuples,
    flax.struct dataclasses).
    """
    if not is_lead_process():
        return None
    import flax.serialization

    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    path = (directory / name).resolve()
    payload = {
        "state": flax.serialization.to_state_dict(jax.tree.map(np.asarray, state)),
        "meta": meta,
    }
    ckptr = _checkpointer()
    ckptr.save(path, payload, force=True)
    return path


def restore_checkpoint(path: os.PathLike, state_template=None) -> Tuple[Any, Dict]:
    """Restore (state, meta); with a template the state keeps its pytree types."""
    import flax.serialization

    path = Path(path).resolve()
    ckptr = _checkpointer()
    payload = ckptr.restore(path)
    state = payload["state"]
    if state_template is not None:
        state = flax.serialization.from_state_dict(state_template, state)
    return state, payload["meta"]


class BestTracker:
    """Best-by-val-loss selection + copy (training.py:188-198 semantics)."""

    def __init__(self, directory: os.PathLike, prefix: str = "checkpoint"):
        self.directory = Path(directory)
        self.prefix = prefix
        self.best_loss = float("inf")

    def save(self, state, meta: Dict, epoch: int, val_loss: float) -> bool:
        meta = dict(meta, epoch=epoch, val_loss=float(val_loss))
        save_checkpoint(self.directory, f"{self.prefix}_epoch{epoch}", state, meta)
        is_best = val_loss < self.best_loss
        if is_best:
            self.best_loss = float(val_loss)
            save_checkpoint(self.directory, f"{self.prefix}_best", state, meta)
        return is_best


# ---------------------------------------------------------------------------
# torch -> flax import
# ---------------------------------------------------------------------------
def _load_torch_state_dict(path: os.PathLike) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    return {k: np.asarray(v) for k, v in ckpt.items()}


def _block_params(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    """One timm-style Block: torch `{prefix}.{norm1,attn.qkv,...}` -> flax tree."""
    t = lambda k: sd[f"{prefix}.{k}"]
    return {
        "norm1": {"scale": t("norm1.weight"), "bias": t("norm1.bias")},
        "attn": {
            "qkv": {"kernel": t("attn.qkv.weight").T, "bias": t("attn.qkv.bias")},
            "proj": {"kernel": t("attn.proj.weight").T, "bias": t("attn.proj.bias")},
        },
        "norm2": {"scale": t("norm2.weight"), "bias": t("norm2.bias")},
        "mlp": {
            "fc1": {"kernel": t("mlp.fc1.weight").T, "bias": t("mlp.fc1.bias")},
            "fc2": {"kernel": t("mlp.fc2.weight").T, "bias": t("mlp.fc2.bias")},
        },
    }


def mae_torch_to_flax(
    sd: Dict[str, np.ndarray],
    encoder_prefix: str = "encoder_blocks",
    decoder_prefix: str = "decoder_blocks",
) -> Dict:
    """Convert a torch MAE state dict to an MCM-shaped flax param subtree.

    Returns only the keys present in the source; merge with `merge_pretrained`.
    pos_embed buffers are intentionally dropped — ours are regenerated sincos
    tables at the target grid (the importer analog of interpolate_pos_embed,
    common/pos_embed.py:103-132).
    """
    out: Dict[str, Any] = {}
    if "patch_embed.proj.weight" in sd:
        out["encoder_embed"] = {
            "proj": {
                # torch conv OIHW -> flax HWIO
                "kernel": sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0),
                "bias": sd["patch_embed.proj.bias"],
            }
        }
    if "cls_token" in sd:
        out["cls_token"] = sd["cls_token"]
    if "mask_token" in sd:
        out["mask_token"] = sd["mask_token"]

    enc_ids = sorted(
        {int(m.group(1)) for k in sd if (m := re.match(r"blocks\.(\d+)\.", k))}
    )
    for i in enc_ids:
        out[f"{encoder_prefix}_{i}"] = _block_params(sd, f"blocks.{i}")
    if "norm.weight" in sd:
        out["encoder_norm"] = {"scale": sd["norm.weight"], "bias": sd["norm.bias"]}

    if "decoder_embed.weight" in sd:
        out["decoder_embed"] = {
            "kernel": sd["decoder_embed.weight"].T,
            "bias": sd["decoder_embed.bias"],
        }
    dec_ids = sorted(
        {int(m.group(1)) for k in sd if (m := re.match(r"decoder_blocks\.(\d+)\.", k))}
    )
    for i in dec_ids:
        out[f"{decoder_prefix}_{i}"] = _block_params(sd, f"decoder_blocks.{i}")
    if "decoder_norm.weight" in sd:
        out["decoder_norm"] = {
            "scale": sd["decoder_norm.weight"],
            "bias": sd["decoder_norm.bias"],
        }
    if "decoder_pred.weight" in sd:
        out["decoder_pred"] = {
            "kernel": sd["decoder_pred.weight"].T,
            "bias": sd["decoder_pred.bias"],
        }
    return out


def merge_pretrained(params: Dict, pretrained: Dict, strict_shapes: bool = True) -> Dict:
    """Overlay `pretrained` onto `params`, skipping shape mismatches (the
    reference drops mismatched `head.*` keys, training.py:167-173)."""
    params = jax.tree.map(lambda x: x, params)  # shallow copy

    def merge(dst, src, path=""):
        for k, v in src.items():
            if k not in dst:
                continue
            if isinstance(v, dict):
                merge(dst[k], v, f"{path}{k}.")
            else:
                if np.shape(dst[k]) != np.shape(v):
                    if strict_shapes:
                        raise ValueError(
                            f"shape mismatch at {path}{k}: "
                            f"{np.shape(dst[k])} vs {np.shape(v)}"
                        )
                    continue
                dst[k] = np.asarray(v, dtype=np.asarray(dst[k]).dtype)

    merge(params, pretrained)
    return params


def convert_vgg16_state_dict(path: os.PathLike, params: Dict) -> Dict:
    """torchvision vgg16 state dict -> VGG16Features flax params.

    Accepts a full vgg16 dict (`features.N.weight`) or a bare features dict
    (`N.weight`); conv weights transpose OIHW -> HWIO. Only the first 10 convs
    (through relu4_3) are consumed — the loss never looks deeper
    (reference loss/vgg.py:22-30).
    """
    sd = _load_torch_state_dict(path)
    conv_keys = sorted(
        (
            int(m.group(1))
            for k in sd
            if (m := re.match(r"(?:features\.)?(\d+)\.weight$", k))
            and sd[k].ndim == 4
        ),
    )
    params = jax.tree.map(np.asarray, params)
    for i, layer_idx in enumerate(conv_keys):
        name = f"conv_{i}"
        if name not in params:
            break
        prefix = f"features.{layer_idx}" if f"features.{layer_idx}.weight" in sd else str(layer_idx)
        params[name] = {
            "kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"{prefix}.bias"],
        }
    return params


def load_mae_pretrained(params: Dict, path: os.PathLike, strict_shapes: bool = False) -> Dict:
    """training.py:163-176 equivalent: torch MAE ckpt -> merged MCM params."""
    sd = _load_torch_state_dict(path)
    return merge_pretrained(params, mae_torch_to_flax(sd), strict_shapes=strict_shapes)
