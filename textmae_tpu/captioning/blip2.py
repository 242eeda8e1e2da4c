"""BLIP-2 captioner assembled: vision -> Q-Former -> OPT, greedy decode.

Native counterpart of the reference's HF wrapper
(/root/reference/models/BLIP/__init__.py:5-19). The full caption path —
vision tower, Q-Former distillation, language projection, OPT prefill and
the token-by-token greedy loop (lax.scan over a KV cache) — compiles into
two TPU programs (prefill + scan), with zero host sync until the final ids.

Tokenization: a real HF tokenizer when $TEXTMAE_BLIP2_PATH provides one
(transformers is installed); otherwise deterministic "tok{id}" placeholders
so the architecture/throughput path runs in zero-egress builds.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from textmae_tpu.captioning.opt import OPTConfig, OPTDecoder
from textmae_tpu.captioning.qformer import QFormer, QFormerConfig
from textmae_tpu.captioning.vision import VisionConfig, VisionTower

# CLIP pixel normalization (the blip2 image processor's constants)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class Blip2Config:
    vision: VisionConfig = VisionConfig()
    qformer: QFormerConfig = QFormerConfig()
    opt: OPTConfig = OPTConfig()
    max_new_tokens: int = 20  # the reference wrapper's default

    @classmethod
    def full(cls, dtype=jnp.float32, max_positions: int = 64) -> "Blip2Config":
        """The published blip2-opt-2.7b dims (EVA ViT-g 1408x39, Q-Former
        768x12, OPT-2.7b 2560x32) with the KV cache sized to the actual
        generation budget (32 query tokens + BOS + max_new_tokens) instead
        of OPT's 512 training positions."""
        return cls(
            vision=VisionConfig(dtype=dtype),
            qformer=QFormerConfig(dtype=dtype),
            opt=OPTConfig(max_positions=max_positions, dtype=dtype),
        )

    @classmethod
    def tiny(cls, dtype=jnp.float32) -> "Blip2Config":
        return cls(
            vision=VisionConfig(
                image_size=56, patch_size=14, hidden_size=32, layers=2,
                heads=2, mlp_ratio=2.0, dtype=dtype,
            ),
            qformer=QFormerConfig(
                num_queries=8, hidden_size=32, layers=2, heads=2,
                intermediate_size=64, encoder_width=32, dtype=dtype,
            ),
            opt=OPTConfig(
                vocab_size=256, hidden_size=32, layers=2, heads=2,
                ffn_size=64, max_positions=64, dtype=dtype,
            ),
            max_new_tokens=6,
        )


class Blip2Captioner:
    """Holds the three module trees + params; `generate_ids` is jitted."""

    def __init__(
        self,
        config: Blip2Config,
        rng: Optional[jax.Array] = None,
        param_dtype=None,
    ):
        """param_dtype: storage dtype for the random-init params (e.g.
        jnp.bfloat16 — full blip2-opt-2.7b dims are ~3.8B params, which only
        fit a 16 GB chip as bf16; the cast happens INSIDE the jitted init so
        the f32 tree is never materialized)."""
        self.config = config
        self.vision = VisionTower(config.vision)
        self.qformer = QFormer(config.qformer)
        self.opt = OPTDecoder(config.opt)
        self.tokenizer = None  # set by convert.load_blip2_weights when available
        self._generate_fn = None  # per-instance jit, built on first generate
        rng = jax.random.PRNGKey(0) if rng is None else rng
        rv, rq, ro, rp = jax.random.split(rng, 4)
        img = jnp.zeros(
            (1, config.vision.image_size, config.vision.image_size, 3), jnp.float32
        )
        vtok = jnp.zeros((1, config.vision.num_positions, config.qformer.encoder_width))

        def cast(tree):
            if param_dtype is None:
                return tree
            return jax.tree.map(
                lambda x: x.astype(param_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                tree,
            )

        self.params = {
            # jitted init: one fused program per submodule instead of eager
            # op-by-op initializer dispatch
            "vision": jax.jit(lambda r, x: cast(self.vision.init(r, x)["params"]))(
                rv, img
            ),
            "qformer": jax.jit(
                lambda r, v: cast(self.qformer.init(r, v)["params"])
            )(rq, vtok),
            "opt": jax.jit(
                lambda r, h: cast(
                    self.opt.init(r, h, method=OPTDecoder.prefill)["params"]
                )
            )(ro, jnp.zeros((1, 4, config.opt.hidden_size))),
            # language_projection: qformer hidden -> OPT hidden
            "proj": jax.jit(
                lambda r: cast({
                    "kernel": jax.random.normal(
                        r, (config.qformer.hidden_size, config.opt.hidden_size)
                    ) * 0.02,
                    "bias": jnp.zeros((config.opt.hidden_size,)),
                })
            )(rp),
        }

    # ------------------------------------------------------------------
    def _generate_impl(self, params, pixels, prompt_ids):
        cfg = self.config
        vtok = self.vision.apply({"params": params["vision"]}, pixels)
        q = self.qformer.apply({"params": params["qformer"]}, vtok)
        prefix = q @ params["proj"]["kernel"] + params["proj"]["bias"]

        opt_p = {"params": params["opt"]}
        prompt_emb = self.opt.apply(opt_p, prompt_ids, method=OPTDecoder.embed)
        embeds = jnp.concatenate([prefix.astype(prompt_emb.dtype), prompt_emb], axis=1)
        logits, caches = self.opt.apply(opt_p, embeds, method=OPTDecoder.prefill)
        first = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        start = embeds.shape[1]
        eos = cfg.opt.eos_token_id
        pad = cfg.opt.pad_token_id

        def body(carry, i):
            tok, caches, done = carry
            logits, caches = self.opt.apply(
                opt_p, tok, caches, start + i, method=OPTDecoder.decode_step
            )
            nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
            done = done | (tok == eos)
            nxt = jnp.where(done, pad, nxt)
            return (nxt, caches, done), nxt

        done0 = first == eos
        (_, _, _), rest = jax.lax.scan(
            body, (first, caches, done0), jnp.arange(cfg.max_new_tokens - 1)
        )
        return jnp.concatenate([first[:, None], rest.T], axis=1)

    # ------------------------------------------------------------------
    def preprocess(self, images: np.ndarray) -> jnp.ndarray:
        """(N, H, W, 3) uint8/float [0,1] -> CLIP-normalized model input.

        Resizes to the vision tower's input size (bicubic, like the HF blip2
        image processor) when the spatial dims differ.
        """
        x = np.asarray(images, np.float32)
        if x.max() > 1.5:
            x = x / 255.0
        size = self.config.vision.image_size
        if x.shape[1] != size or x.shape[2] != size:
            # PIL bicubic over uint8, exactly the HF blip2 image processor's
            # resample path — cv2's INTER_CUBIC uses different filter weights
            # and would drift pixel values (the load_gray lesson: loader
            # mismatches silently break parity with converted weights)
            from PIL import Image

            x = np.stack([
                np.asarray(
                    Image.fromarray(
                        (np.clip(im, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
                    ).resize((size, size), Image.BICUBIC),
                    np.float32,
                )
                for im in x
            ]) / 255.0
        return jnp.asarray((x - CLIP_MEAN) / CLIP_STD)

    def generate_ids(self, pixels: jnp.ndarray) -> np.ndarray:
        if self._generate_fn is None:
            # per-instance jit: a class-level jit with static `self` would pin
            # every instance (and its full param tree) in the global jit cache
            # forever and retrace per instance
            self._generate_fn = jax.jit(self._generate_impl)
        n = pixels.shape[0]
        prompt = jnp.full((n, 1), self.config.opt.bos_token_id, jnp.int32)
        # the KV cache is max_positions long and dynamic_update_slice CLAMPS
        # out-of-range starts — an overflowing decode would silently rewrite
        # the last cache slot and corrupt captions instead of erroring
        # (ADVICE r2); the prompt is 1 BOS token here
        total = self.config.qformer.num_queries + 1 + self.config.max_new_tokens
        if total > self.config.opt.max_positions:
            raise ValueError(
                f"prefix({self.config.qformer.num_queries}) + prompt(1) + "
                f"max_new_tokens({self.config.max_new_tokens}) = {total} "
                f"exceeds opt.max_positions={self.config.opt.max_positions}"
            )
        return np.asarray(self._generate_fn(self.params, pixels, prompt))

    def decode(self, ids: np.ndarray) -> List[str]:
        eos, pad = self.config.opt.eos_token_id, self.config.opt.pad_token_id
        outs = []
        for row in ids:
            toks = [int(t) for t in row if int(t) not in (eos, pad)]
            if self.tokenizer is not None:
                outs.append(self.tokenizer.decode(toks).strip())
            else:
                outs.append(" ".join(f"tok{t}" for t in toks))
        return outs

    def caption(self, images: np.ndarray) -> List[str]:
        return self.decode(self.generate_ids(self.preprocess(images)))
