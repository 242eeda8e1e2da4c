"""Stage-1 captioner tests: flax BLIP-2 vs a tiny random HF torch oracle.

Mirrors the MCM parity approach (tests/test_reference_parity.py): the
reference runs Salesforce/blip2-opt-2.7b through HF transformers
(/root/reference/models/BLIP/__init__.py:5-19); here a tiny random
`Blip2ForConditionalGeneration` stands in for it, our converter imports its
weights, and the flax stack must reproduce the torch activations to f32
noise and the greedy caption ids exactly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from textmae_tpu.captioning import Blip2Captioner, Blip2Config

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_hf(seed=0):
    from transformers import (
        Blip2Config as HFBlip2Config,
        Blip2ForConditionalGeneration,
        Blip2QFormerConfig,
        Blip2VisionConfig,
        OPTConfig as HFOPTConfig,
    )

    vis = Blip2VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=56, patch_size=14,
    )
    qf = Blip2QFormerConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, cross_attention_frequency=2,
    )
    txt = HFOPTConfig(
        hidden_size=32, num_hidden_layers=2, ffn_dim=64, num_attention_heads=2,
        vocab_size=256, max_position_embeddings=64, word_embed_proj_dim=32,
    )
    cfg = HFBlip2Config(
        vision_config=vis.to_dict(), qformer_config=qf.to_dict(),
        text_config=txt.to_dict(), num_query_tokens=8,
        image_token_index=255,  # generate() builds [img]*Q + [bos] prompts
    )
    torch.manual_seed(seed)
    return Blip2ForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def oracle():
    from textmae_tpu.captioning.convert import captioner_from_hf

    hf = _tiny_hf()
    cap = captioner_from_hf(hf, max_new_tokens=6)
    rng = np.random.default_rng(0)
    pixels = rng.uniform(-1, 1, size=(2, 56, 56, 3)).astype(np.float32)
    return hf, cap, pixels


def test_vision_parity(oracle):
    hf, cap, pixels = oracle
    with torch.no_grad():
        ref = hf.vision_model(
            torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()
    ours = np.asarray(cap.vision.apply({"params": cap.params["vision"]}, jnp.asarray(pixels)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_qformer_parity(oracle):
    hf, cap, pixels = oracle
    with torch.no_grad():
        image_embeds = hf.vision_model(
            torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).last_hidden_state
        ref = hf.qformer(
            query_embeds=hf.query_tokens.expand(image_embeds.shape[0], -1, -1),
            encoder_hidden_states=image_embeds,
        ).last_hidden_state.numpy()
    vtok = cap.vision.apply({"params": cap.params["vision"]}, jnp.asarray(pixels))
    ours = np.asarray(cap.qformer.apply({"params": cap.params["qformer"]}, vtok))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_greedy_ids_match_hf(oracle):
    hf, cap, pixels = oracle
    with torch.no_grad():
        ref = hf.generate(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
            max_new_tokens=6, do_sample=False, num_beams=1,
        ).numpy()
    ours = np.asarray(cap.generate_ids(jnp.asarray(pixels)))
    # HF returns [image tokens + bos] + generated; strip the prompt. If every
    # row hit EOS early, HF's tail is shorter — our fixed-length output must
    # then be pad beyond it.
    prompt_len = hf.config.num_query_tokens + 1
    ref_gen = ref[:, prompt_len:]
    n = min(ref_gen.shape[1], ours.shape[1])
    np.testing.assert_array_equal(ours[:, :n], ref_gen[:, :n])
    pad = cap.config.opt.pad_token_id
    assert (ours[:, n:] == pad).all()


@pytest.fixture(scope="module")
def tiny_captioner():
    # shared read-only instance (per-instance jits re-trace per instance);
    # tests that mutate params (TP sharding) build their own
    return Blip2Captioner(Blip2Config.tiny())


def test_caption_shapes_and_determinism(tiny_captioner):
    cap = tiny_captioner
    imgs = np.random.default_rng(1).uniform(size=(2, 56, 56, 3)).astype(np.float32)
    ids1 = cap.generate_ids(cap.preprocess(imgs))
    ids2 = cap.generate_ids(cap.preprocess(imgs))
    assert ids1.shape == (2, cap.config.max_new_tokens)
    np.testing.assert_array_equal(ids1, ids2)
    caps = cap.caption(imgs)
    assert len(caps) == 2 and all(isinstance(c, str) for c in caps)


def test_kv_cache_overflow_rejected():
    """prefix + prompt + max_new_tokens beyond the KV cache must error:
    dynamic_update_slice clamps out-of-range starts, which would silently
    rewrite the last cache slot and corrupt captions (ADVICE r2)."""
    import dataclasses

    cfg = Blip2Config.tiny()
    cfg = dataclasses.replace(cfg, max_new_tokens=cfg.opt.max_positions)
    cap = Blip2Captioner(cfg)
    pix = cap.preprocess(np.zeros((1, 56, 56, 3), np.float32))
    with pytest.raises(ValueError, match="max_positions"):
        cap.generate_ids(pix)


def test_eos_padding(tiny_captioner):
    """Tokens after EOS must be pad (greedy loop's done-latch)."""
    cap = tiny_captioner
    imgs = np.random.default_rng(2).uniform(size=(1, 56, 56, 3)).astype(np.float32)
    ids = cap.generate_ids(cap.preprocess(imgs))[0]
    eos, pad = cap.config.opt.eos_token_id, cap.config.opt.pad_token_id
    seen_eos = False
    for t in ids:
        if seen_eos:
            assert int(t) == pad
        if int(t) == eos:
            seen_eos = True


def test_opt_tp_generate_matches_replicated():
    """Caption ids under model-axis TP must equal the unsharded ids.

    Megatron-style shardings (captioning/sharding.py) on the OPT half over a
    2-way "model" axis; XLA inserts the collectives. Greedy decode is
    argmax-exact, so the ids must match bit-for-bit.
    """
    from textmae_tpu.captioning.sharding import shard_captioner_params
    from textmae_tpu.parallel import make_mesh

    cap = Blip2Captioner(Blip2Config.tiny())
    imgs = np.random.default_rng(3).uniform(size=(4, 56, 56, 3)).astype(np.float32)
    pixels = cap.preprocess(imgs)
    base = cap.generate_ids(pixels)

    mesh = make_mesh({"data": 4, "model": 2})
    cap.params = shard_captioner_params(cap.params, mesh)
    qkv = cap.params["opt"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert len(qkv.sharding.device_set) >= 2  # actually distributed
    tp = cap.generate_ids(pixels)
    np.testing.assert_array_equal(base, tp)
