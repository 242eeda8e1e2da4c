"""HF BLIP-2 checkpoint -> flax captioner converter.

The reference loads Salesforce/blip2-opt-2.7b through HF transformers and
runs it with torch on GPU (/root/reference/models/BLIP/__init__.py:5-19).
Here the torch state dict is converted once into the flax param trees of
textmae_tpu.captioning (vision/qformer/opt), after which captioning runs as
two jitted TPU programs with no torch in the loop.

Conversion is validated end to end in tests/test_captioning.py: a tiny
random HF `Blip2ForConditionalGeneration` is converted and must reproduce
HF's vision/Q-Former activations to f32 noise and its greedy token ids
exactly.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from textmae_tpu.captioning.blip2 import Blip2Captioner, Blip2Config
from textmae_tpu.captioning.opt import OPTConfig
from textmae_tpu.captioning.qformer import QFormerConfig
from textmae_tpu.captioning.vision import VisionConfig


def _t(w) -> np.ndarray:
    """torch tensor -> numpy (f32, detached)."""
    return np.asarray(w.detach().cpu().float().numpy())


def _linear(sd, prefix) -> Dict[str, np.ndarray]:
    """torch nn.Linear -> flax Dense {kernel (in,out), bias}."""
    return {"kernel": _t(sd[f"{prefix}.weight"]).T, "bias": _t(sd[f"{prefix}.bias"])}


def _norm(sd, prefix) -> Dict[str, np.ndarray]:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _mhdpa(q, k, v, out, heads: int) -> Dict[str, Any]:
    """Separate torch q/k/v/out linears -> flax MultiHeadDotProductAttention.

    q/k/v/out are {weight (out_dim,in_dim), bias} numpy dicts. flax wants
    query/key/value kernels (in, heads, head_dim) and out (heads, head_dim, out).
    """
    d_model = q["weight"].shape[0]
    hd = d_model // heads

    def split_in(w, b):
        return {
            "kernel": w.T.reshape(w.shape[1], heads, hd),
            "bias": b.reshape(heads, hd),
        }

    return {
        "query": split_in(q["weight"], q["bias"]),
        "key": split_in(k["weight"], k["bias"]),
        "value": split_in(v["weight"], v["bias"]),
        "out": {
            "kernel": out["weight"].T.reshape(heads, hd, out["weight"].shape[0]),
            "bias": out["bias"],
        },
    }


def _raw_linear(sd, prefix):
    return {"weight": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


# ---------------------------------------------------------------------------
# per-tower converters
# ---------------------------------------------------------------------------
def convert_vision(sd, cfg: VisionConfig) -> Dict[str, Any]:
    """vision_model.* of a Blip2 state dict -> VisionTower params."""
    p: Dict[str, Any] = {
        "class_embedding": _t(sd["vision_model.embeddings.class_embedding"]).reshape(-1),
        "position_embedding": _t(sd["vision_model.embeddings.position_embedding"])[0],
        "patch_embedding": {
            # torch conv (D, 3, P, P) -> flax (P, P, 3, D)
            "kernel": _t(sd["vision_model.embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0),
            "bias": _t(sd["vision_model.embeddings.patch_embedding.bias"]),
        },
        "post_layernorm": _norm(sd, "vision_model.post_layernorm"),
    }
    d = cfg.hidden_size
    for i in range(cfg.layers):
        pre = f"vision_model.encoder.layers.{i}"
        # HF blip2 vision fuses qkv: weight rows [0:D]=q, [D:2D]=k, [2D:3D]=v
        qkv_w = _t(sd[f"{pre}.self_attn.qkv.weight"])
        qkv_b = _t(sd[f"{pre}.self_attn.qkv.bias"])
        q = {"weight": qkv_w[:d], "bias": qkv_b[:d]}
        k = {"weight": qkv_w[d : 2 * d], "bias": qkv_b[d : 2 * d]}
        v = {"weight": qkv_w[2 * d :], "bias": qkv_b[2 * d :]}
        out = _raw_linear(sd, f"{pre}.self_attn.projection")
        p[f"layers_{i}"] = {
            "layer_norm1": _norm(sd, f"{pre}.layer_norm1"),
            "layer_norm2": _norm(sd, f"{pre}.layer_norm2"),
            "self_attn": _mhdpa(q, k, v, out, cfg.heads),
            "fc1": _linear(sd, f"{pre}.mlp.fc1"),
            "fc2": _linear(sd, f"{pre}.mlp.fc2"),
        }
    return p


def convert_qformer(sd, cfg: QFormerConfig) -> Dict[str, Any]:
    """query_tokens + qformer.* -> QFormer params."""
    p: Dict[str, Any] = {
        "query_tokens": _t(sd["query_tokens"]),
        "embeddings_norm": _norm(sd, "qformer.layernorm"),
    }
    for i in range(cfg.layers):
        pre = f"qformer.encoder.layer.{i}"
        layer: Dict[str, Any] = {}
        for ours, theirs in (("attention", "attention"), ("crossattention", "crossattention")):
            if f"{pre}.{theirs}.attention.query.weight" not in sd:
                continue
            layer[ours] = {
                "attn": _mhdpa(
                    _raw_linear(sd, f"{pre}.{theirs}.attention.query"),
                    _raw_linear(sd, f"{pre}.{theirs}.attention.key"),
                    _raw_linear(sd, f"{pre}.{theirs}.attention.value"),
                    _raw_linear(sd, f"{pre}.{theirs}.output.dense"),
                    cfg.heads,
                ),
                "norm": _norm(sd, f"{pre}.{theirs}.output.LayerNorm"),
            }
        layer["intermediate_query"] = _linear(sd, f"{pre}.intermediate_query.dense")
        layer["output_query"] = _linear(sd, f"{pre}.output_query.dense")
        layer["output_norm"] = _norm(sd, f"{pre}.output_query.LayerNorm")
        p[f"layers_{i}"] = layer
    return p


def convert_opt(sd, cfg: OPTConfig) -> Dict[str, Any]:
    """language_model.model.decoder.* -> OPTDecoder params.

    The position table is sliced to cfg.max_positions+2 rows so a smaller
    KV-cache budget than OPT's native 2048 can be chosen at load time.
    """
    dec = "language_model.model.decoder"
    pos = _t(sd[f"{dec}.embed_positions.weight"])
    if pos.shape[0] < cfg.max_positions + 2:
        raise ValueError(
            f"checkpoint has {pos.shape[0] - 2} positions < max_positions={cfg.max_positions}"
        )
    p: Dict[str, Any] = {
        "embed_tokens": {"embedding": _t(sd[f"{dec}.embed_tokens.weight"])},
        "embed_positions": {"embedding": pos[: cfg.max_positions + 2]},
        "final_layer_norm": _norm(sd, f"{dec}.final_layer_norm"),
    }
    for i in range(cfg.layers):
        pre = f"{dec}.layers.{i}"
        p[f"layers_{i}"] = {
            "self_attn": {
                name: _linear(sd, f"{pre}.self_attn.{name}")
                for name in ("q_proj", "k_proj", "v_proj", "out_proj")
            },
            "self_attn_layer_norm": _norm(sd, f"{pre}.self_attn_layer_norm"),
            "final_layer_norm": _norm(sd, f"{pre}.final_layer_norm"),
            "fc1": _linear(sd, f"{pre}.fc1"),
            "fc2": _linear(sd, f"{pre}.fc2"),
        }
    return p


# ---------------------------------------------------------------------------
# whole-model conversion
# ---------------------------------------------------------------------------
def blip2_config_from_hf(hf_config, max_new_tokens: int = 20,
                         max_positions: Optional[int] = None,
                         dtype: Any = jnp.float32) -> Blip2Config:
    """transformers Blip2Config -> our Blip2Config (dims only)."""
    v, q, t = hf_config.vision_config, hf_config.qformer_config, hf_config.text_config
    ratio = v.intermediate_size / v.hidden_size
    assert int(v.hidden_size * ratio) == v.intermediate_size
    return Blip2Config(
        vision=VisionConfig(
            image_size=v.image_size, patch_size=v.patch_size,
            hidden_size=v.hidden_size, layers=v.num_hidden_layers,
            heads=v.num_attention_heads, mlp_ratio=ratio, dtype=dtype,
        ),
        qformer=QFormerConfig(
            num_queries=hf_config.num_query_tokens, hidden_size=q.hidden_size,
            layers=q.num_hidden_layers, heads=q.num_attention_heads,
            intermediate_size=q.intermediate_size,
            cross_attention_frequency=q.cross_attention_frequency,
            encoder_width=v.hidden_size, dtype=dtype,
        ),
        opt=OPTConfig(
            vocab_size=t.vocab_size, hidden_size=t.hidden_size,
            layers=t.num_hidden_layers, heads=t.num_attention_heads,
            ffn_size=t.ffn_dim,
            max_positions=max_positions or min(t.max_position_embeddings, 512),
            bos_token_id=t.bos_token_id, eos_token_id=t.eos_token_id,
            pad_token_id=t.pad_token_id, dtype=dtype,
        ),
        max_new_tokens=max_new_tokens,
    )


def convert_hf_blip2(state_dict, config: Blip2Config) -> Dict[str, Any]:
    """Full torch Blip2ForConditionalGeneration state dict -> captioner params."""
    proj = _linear(state_dict, "language_projection")
    return {
        "vision": convert_vision(state_dict, config.vision),
        "qformer": convert_qformer(state_dict, config.qformer),
        "opt": convert_opt(state_dict, config.opt),
        "proj": proj,
    }


def captioner_from_hf(hf_model, max_new_tokens: int = 20,
                      dtype: Any = jnp.float32) -> Blip2Captioner:
    """In-memory torch Blip2 model -> ready flax captioner (test oracle path)."""
    config = blip2_config_from_hf(hf_model.config, max_new_tokens, dtype=dtype)
    cap = Blip2Captioner(config)
    cap.params = convert_hf_blip2(hf_model.state_dict(), config)
    return cap


def load_blip2_weights(path: Optional[str] = None, max_new_tokens: int = 20,
                       dtype: Any = jnp.float32) -> Blip2Captioner:
    """Local HF snapshot (or $TEXTMAE_BLIP2_PATH) -> flax captioner + tokenizer."""
    import torch  # noqa: F401  (transformers needs it to load the state dict)
    from transformers import AutoTokenizer, Blip2ForConditionalGeneration

    path = path or os.environ.get("TEXTMAE_BLIP2_PATH")
    if not path:
        raise RuntimeError(
            "no BLIP-2 snapshot: pass a path or set TEXTMAE_BLIP2_PATH"
        )
    hf = Blip2ForConditionalGeneration.from_pretrained(path)
    cap = captioner_from_hf(hf, max_new_tokens, dtype=dtype)
    try:
        cap.tokenizer = AutoTokenizer.from_pretrained(path)
    except Exception:
        cap.tokenizer = None  # ids-only decode still works
    return cap
