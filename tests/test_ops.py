"""Unit tests for core ops: patchify round-trip, sincos golden values,
STE/LowerBound gradients, attention parity, SSIM sanity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textmae_tpu.ops import (
    get_2d_sincos_pos_embed,
    interpolate_pos_embed,
    lower_bound,
    patchify,
    quantize_ste,
    unpatchify,
)
from textmae_tpu.ops.attention import attention_reference, fused_attention
from textmae_tpu.ops.ssim import ms_ssim, ssim
from textmae_tpu.ops.convs import pixel_shuffle


class TestPatches:
    def test_roundtrip(self, rng):
        imgs = jnp.asarray(rng.normal(size=(2, 3, 224, 224)), dtype=jnp.float32)
        p = patchify(imgs, 16)
        assert p.shape == (2, 196, 768)
        back = unpatchify(p, 16)
        np.testing.assert_allclose(back, imgs, rtol=0, atol=0)

    def test_patch_content_order(self):
        # Single 2x2-patch image with known values: patch rows flatten as (p, p, c).
        img = jnp.arange(2 * 3 * 4 * 4, dtype=jnp.float32).reshape(2, 3, 4, 4)[:1]
        p = patchify(img, 2)
        # first patch, first element = img[0, :, 0, 0] laid out channel-last
        np.testing.assert_allclose(p[0, 0, :3], img[0, :, 0, 0])
        np.testing.assert_allclose(p[0, 0, 3:6], img[0, :, 0, 1])

    def test_rejects_nonsquare(self):
        with pytest.raises(ValueError):
            patchify(jnp.zeros((1, 3, 224, 192)), 16)


class TestPosEmbed:
    def test_golden_values(self):
        """Matches the reference numpy formula (common/pos_embed.py:23-96)."""
        pe = get_2d_sincos_pos_embed(8, 2, cls_token=False)
        assert pe.shape == (4, 8)
        # position (h=0, w=0): all sin=0, cos=1
        np.testing.assert_allclose(pe[0], [0, 0, 1, 1, 0, 0, 1, 1], atol=1e-7)
        # position (h=0, w=1): reference feeds grid[0] (the *w* coordinate) to the
        # first half (common/pos_embed.py:60-66 names it emb_h but passes grid[0]).
        omega = 1.0 / 10000 ** (np.arange(2) / 2.0)
        expected_w = np.concatenate([np.sin(omega), np.cos(omega)])
        np.testing.assert_allclose(pe[1, :4], expected_w, atol=1e-6)
        np.testing.assert_allclose(pe[1, 4:], [0, 0, 1, 1], atol=1e-7)

    def test_cls_token_row(self):
        pe = get_2d_sincos_pos_embed(16, 14, cls_token=True)
        assert pe.shape == (197, 16)
        np.testing.assert_allclose(pe[0], np.zeros(16))

    def test_interpolate_identity_and_resize(self):
        pe = jnp.asarray(get_2d_sincos_pos_embed(32, 14, cls_token=True))[None]
        same = interpolate_pos_embed(pe, 14)
        np.testing.assert_allclose(same, pe)
        up = interpolate_pos_embed(pe, 16)
        assert up.shape == (1, 16 * 16 + 1, 32)
        np.testing.assert_allclose(up[:, 0], pe[:, 0])  # cls row untouched


class TestSTE:
    def test_quantize_ste_forward_backward(self):
        x = jnp.array([0.4, 0.6, -1.2])
        np.testing.assert_allclose(quantize_ste(x), jnp.round(x))
        g = jax.grad(lambda v: quantize_ste(v).sum())(x)
        np.testing.assert_allclose(g, jnp.ones_like(x))

    def test_lower_bound_gradient_gating(self):
        x = jnp.array([-1.0, 2.0])
        b = jnp.array(0.5)
        y = lower_bound(x, b)
        np.testing.assert_allclose(y, [0.5, 2.0])
        # positive upstream grad: blocked below bound, passed above
        g = jax.grad(lambda v: (lower_bound(v, b) * jnp.array([1.0, 1.0])).sum())(x)
        np.testing.assert_allclose(g, [0.0, 1.0])
        # negative upstream grad: passes even below the bound
        g = jax.grad(lambda v: (lower_bound(v, b) * jnp.array([-1.0, -1.0])).sum())(x)
        np.testing.assert_allclose(g, [-1.0, -1.0])


class TestAttention:
    def test_reference_matches_naive_softmax(self, rng):
        q = jnp.asarray(rng.normal(size=(2, 4, 17, 8)), dtype=jnp.float32)
        k = jnp.asarray(rng.normal(size=(2, 4, 17, 8)), dtype=jnp.float32)
        v = jnp.asarray(rng.normal(size=(2, 4, 17, 8)), dtype=jnp.float32)
        out = attention_reference(q, k, v)
        scale = 8 ** -0.5
        logits = (q @ k.transpose(0, 1, 3, 2)) * scale
        expected = jax.nn.softmax(logits, axis=-1) @ v
        np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)

    def test_fused_dispatch_on_cpu(self, rng):
        q = jnp.asarray(rng.normal(size=(1, 2, 9, 4)), dtype=jnp.float32)
        out = fused_attention(q, q, q)
        assert out.shape == q.shape

    @pytest.mark.parametrize(
        "sq,skv",
        [
            (300, 300),   # self-attn beyond the single-block kernel's S<=256
            (784, 784),   # 224px UNet latent tokens
            (196, 77),    # cross-attention on text tokens
            (130, 1000),  # non-divisible q AND kv block tails
        ],
    )
    def test_flash_kernel_matches_reference(self, rng, sq, skv):
        """Blockwise online-softmax kernel (interpret mode on CPU) must match
        the jnp reference at long / unequal sequence lengths, including
        partial q and kv tail blocks."""
        from textmae_tpu.ops.attention import _attention_flash

        q = jnp.asarray(rng.normal(size=(1, 2, sq, 64)), dtype=jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, 2, skv, 64)), dtype=jnp.float32)
        v = jnp.asarray(rng.normal(size=(1, 2, skv, 64)), dtype=jnp.float32)
        out = _attention_flash(q, k, v, block_q=128, block_k=256, interpret=True)
        np.testing.assert_allclose(
            out, attention_reference(q, k, v), rtol=2e-5, atol=2e-5
        )


class TestSSIM:
    def test_identity_is_one(self, rng):
        x = jnp.asarray(rng.uniform(size=(1, 3, 64, 64)), dtype=jnp.float32)
        np.testing.assert_allclose(ssim(x, x, data_range=1.0), 1.0, atol=1e-5)

    def test_degrades_with_noise(self, rng):
        x = jnp.asarray(rng.uniform(size=(1, 3, 64, 64)), dtype=jnp.float32)
        y = x + 0.2 * jnp.asarray(rng.normal(size=x.shape), dtype=jnp.float32)
        s_clean = ssim(x, x)
        s_noisy = ssim(x, y)
        assert s_noisy < s_clean
        assert 0.0 < s_noisy < 1.0

    def test_ms_ssim_identity(self, rng):
        x = jnp.asarray(rng.uniform(size=(1, 3, 192, 192)), dtype=jnp.float32)
        np.testing.assert_allclose(ms_ssim(x, x, data_range=1.0), 1.0, atol=1e-5)

    def test_ssim_symmetry(self, rng):
        x = jnp.asarray(rng.uniform(size=(1, 3, 64, 64)), dtype=jnp.float32)
        y = jnp.asarray(rng.uniform(size=(1, 3, 64, 64)), dtype=jnp.float32)
        np.testing.assert_allclose(ssim(x, y), ssim(y, x), rtol=1e-6)


class TestPixelShuffle:
    def test_matches_torch_semantics(self):
        import torch

        x = np.arange(1 * 8 * 2 * 2, dtype=np.float32).reshape(1, 8, 2, 2)
        expected = torch.pixel_shuffle(torch.from_numpy(x), 2).numpy()
        got = pixel_shuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), expected)
