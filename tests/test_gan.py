"""GAN-loss MAE pretraining (train/gan_engine.py, VERDICT r4 Next #5)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from textmae_tpu.models import mae as mae_models
from textmae_tpu.models.discriminator import DiscriminatorConfig, PatchDiscriminator
from textmae_tpu.train import TrainState
from textmae_tpu.train.gan_engine import composite_reconstruction, make_mae_gan_step

TINY = mae_models.MAEConfig(
    img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2,
    decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2,
    use_pallas=False, norm_pix_loss=False,
)


@pytest.fixture(scope="module")
def setup():
    model = mae_models.MaskedAutoencoderViT(TINY)
    disc = PatchDiscriminator(DiscriminatorConfig(channels=(8, 16), norm_groups=4))
    r = np.random.default_rng(0)
    imgs = jnp.asarray(r.random((2, 3, 64, 64), np.float32))
    g_params = jax.jit(
        lambda k: model.init({"params": k, "mask": k}, imgs, 0.75)["params"]
    )(jax.random.PRNGKey(0))
    d_params = jax.jit(lambda k: disc.init(k, imgs)["params"])(jax.random.PRNGKey(1))
    return model, disc, imgs, g_params, d_params


def test_composite_uses_pred_only_on_masked_patches(setup):
    """Visible patches must pass through from the input untouched; masked
    patches must come from the prediction (the critic only judges generated
    content)."""
    model, _, imgs, g_params, _ = setup
    _, pred, mask = model.apply(
        {"params": g_params}, imgs, 0.75, rngs={"mask": jax.random.PRNGKey(2)}
    )
    comp = composite_reconstruction(model, imgs, pred, mask)
    assert comp.shape == imgs.shape
    from textmae_tpu.ops.patches import patchify

    comp_p = patchify(comp, TINY.patch_size)
    img_p = patchify(imgs, TINY.patch_size)
    vis = np.asarray(mask) == 0
    np.testing.assert_allclose(
        np.asarray(comp_p)[vis], np.asarray(img_p)[vis], atol=1e-6
    )
    masked = ~vis
    assert np.abs(np.asarray(comp_p)[masked] - np.asarray(pred)[masked]).max() < 1e-6


def test_gan_step_updates_both_players(setup):
    model, disc, imgs, g_params, d_params = setup
    g_tx = optax.adam(1e-3)
    d_tx = optax.adam(1e-3)
    g_state = TrainState.create(g_params, g_tx)
    d_state = TrainState.create(d_params, d_tx)
    step = make_mae_gan_step(model, disc, g_tx, d_tx, adv_weight=0.1, donate=False)
    g2, d2, m = step(g_state, d_state, imgs, jax.random.PRNGKey(3))
    for k in ("loss", "recon_loss", "g_adv", "d_loss"):
        assert np.isfinite(float(m[k])), (k, m)
    # both players moved
    g_delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), g_state.params, g2.params),
    )
    d_delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), d_state.params, d2.params),
    )
    assert g_delta > 0 and d_delta > 0
    assert int(g2.step) == 1 and int(d2.step) == 1
    # a second step composes (donation disabled here, so states are reusable)
    g3, d3, m2 = step(g2, d2, imgs, jax.random.PRNGKey(3))
    assert np.isfinite(float(m2["loss"]))


def test_discriminator_patch_logits_shape(setup):
    _, disc, imgs, _, d_params = setup
    out = disc.apply({"params": d_params}, imgs)
    # two stride-2 blocks: 64 -> 16 spatial; the pad-1/kernel-4 stride-1
    # tail convs (pix2pix layout) each shrink by one: 16 -> 15 -> 14
    assert out.shape == (2, 14, 14, 1)
    assert out.dtype == jnp.float32
