"""Jitted train / eval steps for MCM.

One compiled function per step (engine-layer parity with
/root/reference/utils/engine.py:30-219), but TPU-shaped:
  * forward + combined loss + gradient + both (partitioned) optimizer updates
    in a single jit with donated state (no per-step host sync; the reference
    calls torch.cuda.synchronize() every iteration, engine.py:93),
  * data-parallelism by sharded batch inputs — metric scalars come out global,
    so there is no separate all_reduce_mean (engine.py:117-122) step,
  * the VGG perceptual net's frozen weights are closed over once (the
    reference rebuilds VGG16 on every loss call, loss/vgg.py:99).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import optax

from textmae_tpu.losses.rd_loss import rate_distortion_loss
from textmae_tpu.train.state import TrainState


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    lmbda: float = 1e-4,
    vgg_variables: Optional[Any] = None,
    donate: bool = True,
    moe_aux_weight: float = 0.01,
) -> Callable[[TrainState, Dict, jax.Array], tuple]:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch = {"imgs": (B, C, H, W), "scores": (B, L)}; shard the batch arrays
    over the data mesh axis before calling and XLA handles the rest.

    MoE encoders (MCMConfig.moe_experts > 0) sow a Switch load-balance aux
    loss per MoE layer; it folds into the objective with moe_aux_weight and
    surfaces as the "moe_aux_loss" metric. Dense models skip the mutable
    pass entirely.
    """
    has_moe = getattr(getattr(model, "config", None), "moe_experts", 0) > 0

    def loss_fn(params, batch, rng):
        kwargs = dict(
            training=True, vgg_variables=vgg_variables, rngs={"noise": rng}
        )
        if has_moe:
            from textmae_tpu.parallel.moe import collect_moe_aux

            out, inter = model.apply(
                {"params": params}, batch["imgs"], batch["scores"],
                mutable=["intermediates"], **kwargs,
            )
            moe_aux = collect_moe_aux(inter)
        else:
            out = model.apply(
                {"params": params}, batch["imgs"], batch["scores"], **kwargs
            )
            moe_aux = None
        rd = rate_distortion_loss(out, batch["imgs"], lmbda)
        aux = out["aux_loss"]
        total = rd["loss"] + aux
        metrics = {
            "loss": rd["loss"],
            "bpp_loss": rd["bpp_loss"],
            "ssim_loss": rd["ssim_loss"],
            "L1_loss": rd["L1_loss"],
            "vgg_loss": rd["vgg_loss"],
            "aux_loss": aux,
        }
        if moe_aux is not None:
            total = total + moe_aux_weight * moe_aux
            metrics["moe_aux_loss"] = moe_aux
        return total, metrics

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    model, lmbda: float = 1e-4, vgg_variables: Optional[Any] = None
) -> Callable[[Any, Dict], Dict]:
    """val_one_epoch body (utils/engine.py:159-219): metrics only, no grads."""

    def eval_step(params, batch):
        out = model.apply(
            {"params": params},
            batch["imgs"],
            batch["scores"],
            training=False,
            vgg_variables=vgg_variables,
        )
        rd = rate_distortion_loss(out, batch["imgs"], lmbda)
        return {
            "loss": rd["loss"],
            "bpp_loss": rd["bpp_loss"],
            "ssim_loss": rd["ssim_loss"],
            "L1_loss": rd["L1_loss"],
            "vgg_loss": rd["vgg_loss"],
            "aux_loss": out["aux_loss"],
        }

    return jax.jit(eval_step)
