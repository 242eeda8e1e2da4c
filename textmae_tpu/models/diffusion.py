"""SDXL img2img refiner wrapper — the pipeline's Refinement stage.

Surface parity with /root/reference/models/Diffusion/__init__.py:8-28:
`Diffuser.prepare_model()` then `refine_image(caption, image)`. Standalone
building block (not wired into train/eval — SURVEY.md §0).

Backends:
  * "native" (default): textmae_tpu.diffusion — the flax SDXL-refiner stack
    (UNet + VAE + CLIP text encoder) with the whole denoise loop jitted on
    TPU. $TEXTMAE_SDXL_PATH pointing at a diffusers snapshot loads real
    weights (full refiner dims); without it a reduced-dim random-init model
    exercises the identical code path (zero-egress builds).
  * "torch": the diffusers pipeline, when that package is installed — the
    reference's own execution model, kept for checkpoint-compat debugging.
"""
from __future__ import annotations

import os
from typing import Optional


class Diffuser:
    MODEL_ID = "stabilityai/stable-diffusion-xl-refiner-1.0"

    def __init__(self):
        self.pipeline = None  # torch backend
        self.refiner = None  # native backend

    # ------------------------------------------------------------------
    @classmethod
    def prepare_model(
        cls,
        backend: str = "native",
        num_inference_steps: Optional[int] = None,
        tensor_parallel: int = 1,
    ) -> "Diffuser":
        """tensor_parallel > 1 shards the native refiner's UNet transformer
        matrices over a {"model": N} mesh of the first N local devices
        (diffusion/sharding.py); the denoise scan then runs Megatron-TP with
        XLA-inserted collectives."""
        self = cls()
        if backend == "torch":
            try:
                from diffusers import StableDiffusionXLImg2ImgPipeline
            except Exception as e:  # pragma: no cover
                raise RuntimeError(
                    "diffusers is required for the torch refiner backend"
                ) from e
            path = os.environ.get("TEXTMAE_SDXL_PATH", self.MODEL_ID)
            self.pipeline = StableDiffusionXLImg2ImgPipeline.from_pretrained(path)
            return self
        if backend != "native":
            raise ValueError(f"unknown refiner backend {backend!r}")

        import dataclasses

        from textmae_tpu.diffusion import RefinerConfig, SDXLRefiner

        snapshot = os.environ.get("TEXTMAE_SDXL_PATH")
        cfg = RefinerConfig() if snapshot else RefinerConfig.tiny()
        if num_inference_steps:
            cfg = dataclasses.replace(cfg, num_inference_steps=num_inference_steps)
        self.refiner = SDXLRefiner(cfg)
        if snapshot:
            from textmae_tpu.diffusion.convert import load_sdxl_weights

            load_sdxl_weights(snapshot, self.refiner)
        else:
            import logging

            logging.getLogger(__name__).warning(
                "TEXTMAE_SDXL_PATH unset: native refiner runs REDUCED-DIM "
                "RANDOM-INIT weights (architecture/throughput path only)"
            )
        if tensor_parallel > 1:
            import jax

            from textmae_tpu.parallel import make_mesh

            self.refiner.shard(make_mesh(
                {"model": tensor_parallel},
                devices=jax.devices()[:tensor_parallel],
            ))
        return self

    # ------------------------------------------------------------------
    def refine_image(self, caption: str, image):
        """(caption, PIL image) -> refined PIL image (Diffusion/__init__.py:19-28)."""
        if self.pipeline is not None:
            return self.pipeline(prompt=caption, image=image).images[0]
        if self.refiner is None:
            raise RuntimeError("call prepare_model() first")

        import numpy as np
        from PIL import Image

        factor = 2 ** (len(self.refiner.config.vae.block_out_channels) - 1)
        w, h = image.size
        w2, h2 = max(w // factor, 1) * factor, max(h // factor, 1) * factor
        resized = image.convert("RGB").resize((w2, h2), Image.BICUBIC)
        arr = np.asarray(resized, np.float32)[None] / 255.0
        out = np.asarray(self.refiner.refine_batch(arr, [caption]))[0]
        out_img = Image.fromarray((out * 255.0).round().astype(np.uint8))
        return out_img.resize((w, h), Image.BICUBIC) if (w2, h2) != (w, h) else out_img
