"""GAN-loss MAE pretraining step (the `ganloss` recipe, VERDICT r4 Next #5).

The reference initializes MCM from `mae_visualize_vit_large_ganloss.pth`
(/root/reference/setup.sh:21-22, training.py:163) — an MAE whose decoder was
finetuned with an adversarial loss. This module implements that recipe shape
natively: masked-patch reconstruction (raw-pixel MSE — the visualize-model
family predicts pixels, not norm_pix targets) plus a hinge-GAN objective
against a PatchGAN critic (models/discriminator.py) on the COMPOSITE image
(visible patches from the input, masked patches from the prediction — the
discriminator only ever judges content the decoder actually generated).

One jitted step updates both players: generator gradients flow through the
composite into the (frozen-for-this-term) critic; critic gradients see the
stop-gradient'd composite. Both updates share one forward of the MAE.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from textmae_tpu.ops.patches import patchify, unpatchify
from textmae_tpu.train.state import TrainState


def composite_reconstruction(model, imgs, pred, mask):
    """Visible patches from `imgs`, masked patches from `pred` -> (N,C,H,W).

    mask: (N, L) with 1 = masked (the MAE convention); pred: (N, L, p^2*C)
    in raw pixel space (norm_pix_loss=False models).
    """
    cfg = model.config
    target = patchify(imgs.astype(jnp.float32), cfg.patch_size)
    comp = target * (1.0 - mask)[..., None] + pred.astype(jnp.float32) * mask[..., None]
    return unpatchify(comp, cfg.patch_size, cfg.in_chans)


def make_mae_gan_step(
    model,
    disc,
    g_tx,
    d_tx,
    mask_ratio: float = 0.75,
    adv_weight: float = 0.1,
    donate: bool = True,
):
    """(g_state, d_state, imgs, rng) -> (g_state, d_state, metrics).

    Hinge objectives (SAGAN/BigGAN standard):
      D: E[relu(1 - D(real))] + E[relu(1 + D(fake))]
      G: recon + adv_weight * (-E[D(fake)])
    """

    def g_loss_fn(g_params, d_params, imgs, rng):
        rec, pred, mask = model.apply(
            {"params": g_params}, imgs, mask_ratio, training=True,
            rngs={"mask": rng},
        )
        fake = composite_reconstruction(model, imgs, pred, mask)
        g_adv = -disc.apply({"params": d_params}, fake).mean()
        return rec + adv_weight * g_adv, (fake, rec, g_adv)

    def d_loss_fn(d_params, imgs, fake):
        real_logits = disc.apply({"params": d_params}, imgs)
        fake_logits = disc.apply({"params": d_params}, fake)
        return (
            jax.nn.relu(1.0 - real_logits).mean()
            + jax.nn.relu(1.0 + fake_logits).mean()
        )

    def step(g_state: TrainState, d_state: TrainState, imgs, rng):
        rng = jax.random.fold_in(rng, g_state.step)
        (g_loss, (fake, rec, g_adv)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(g_state.params, d_state.params, imgs, rng)
        g_updates, g_opt = g_tx.update(g_grads, g_state.opt_state, g_state.params)
        g_state = g_state.replace(
            params=optax.apply_updates(g_state.params, g_updates),
            opt_state=g_opt,
            step=g_state.step + 1,
        )
        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
            d_state.params, imgs, jax.lax.stop_gradient(fake)
        )
        d_updates, d_opt = d_tx.update(d_grads, d_state.opt_state, d_state.params)
        d_state = d_state.replace(
            params=optax.apply_updates(d_state.params, d_updates),
            opt_state=d_opt,
            step=d_state.step + 1,
        )
        metrics = {
            "loss": g_loss,
            "recon_loss": rec,
            "g_adv": g_adv,
            "d_loss": d_loss,
        }
        return g_state, d_state, metrics

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())
