"""Jitted steps for the MAE secondary workloads: pretrain, finetune, linprobe.

Engine parity with /root/reference/models/MAE/engine_pretrain.py:21-82 and
engine_finetune.py:25-130, TPU-shaped: per-iteration LR comes from an optax
schedule baked into the optimizer (no host-side adjust_learning_rate), AMP
autocast is bf16 compute dtype, the NaN abort check happens on the host from
the returned metric.

Mixup/cutmix (main_finetune.py:218-226 via timm) are implemented as device
ops inside the train step; label smoothing folds into the soft-target
cross-entropy.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from textmae_tpu.train.state import TrainState


# ---------------------------------------------------------------------------
# pretrain
# ---------------------------------------------------------------------------
def _make_update_step(loss_fn, tx, donate: bool):
    """Shared (fold_in -> grad -> optax update) step around a loss_fn(params,
    imgs, rng) — single definition for the sequential and pipelined factories."""

    def step(state: TrainState, imgs: jnp.ndarray, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, imgs, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_mae_pretrain_step(
    model, tx, mask_ratio: float = 0.75, donate: bool = True,
    moe_aux_weight: float = 0.01,
):
    # MoE encoders (MAEConfig.moe_experts > 0) sow a load-balance aux loss
    # per MoE layer; fold it into the objective with a small weight (the
    # Switch-transformer default regime). Dense models skip the mutable pass.
    has_moe = getattr(getattr(model, "config", None), "moe_experts", 0) > 0

    def loss_fn(params, imgs, rng):
        if has_moe:
            from textmae_tpu.parallel.moe import collect_moe_aux

            (loss, _, _), inter = model.apply(
                {"params": params}, imgs, mask_ratio, training=True,
                rngs={"mask": rng}, mutable=["intermediates"],
            )
            return loss + moe_aux_weight * collect_moe_aux(inter)
        loss, _, _ = model.apply(
            {"params": params}, imgs, mask_ratio, training=True, rngs={"mask": rng}
        )
        return loss

    return _make_update_step(loss_fn, tx, donate)


def make_pipelined_mae_pretrain_step(
    model,
    tx,
    mesh,
    mask_ratio: float = 0.75,
    num_microbatches: int = 4,
    axis: str = "pipe",
    batch_axis: str = None,
    tp_axis: str = None,
    sequence_parallel=False,
    donate: bool = True,
):
    """Pretrain step with the encoder/decoder block stacks run as pipeline
    stages over `mesh`'s `axis` (parallel/pipeline.py): each stage holds
    depth/P layers in its own HBM — for ViT-L/H depths whose params outgrow
    one chip. Math-equivalent to make_mae_pretrain_step (tested); embed/
    norm/pred stay replicated module calls. depth and decoder_depth must
    divide by the stage count; the global batch by num_microbatches.

    batch_axis: name of a data axis in `mesh` for DP x PP — shard the batch
    over it (parallel.shard_batch(batch, mesh, axis=batch_axis)) and each
    data slice runs its own pipeline; gradients sync through XLA's SPMD
    partitioning as usual.

    tp_axis: name of a model axis in `mesh` for tensor parallelism INSIDE
    each pipeline stage (dp x pp x tp): the blocks run as manual Megatron
    blocks (parallel.pipeline.make_tp_block_fn) with heads / MLP hidden
    units sharded over it. num_heads and the MLP hidden width of both
    stacks must divide by mesh.shape[tp_axis].

    sequence_parallel: Megatron SP on tp_axis (residual stream token-sharded
    between blocks; see parallel.pipeline.pipelined_stack_apply). Pass
    "auto" for MAE: the encoder sequence (e.g. 50 kept tokens at 0.75
    masking) usually divides while the decoder's (196 + cls = 197) does
    not — "auto" applies SP per stack exactly where it divides.
    """
    from textmae_tpu.models.mae import MaskedAutoencoderViT as M
    from textmae_tpu.ops.vit import Block
    from textmae_tpu.parallel.pipeline import pipelined_stack_apply

    cfg = model.config
    # mirror the model's own block construction, INCLUDING remat — dropping
    # activation checkpointing here would regress memory exactly on the
    # large models this step targets
    import flax.linen as nn

    block_cls = nn.remat(Block) if cfg.remat else Block
    enc_block = block_cls(
        cfg.embed_dim, cfg.num_heads, mlp_ratio=cfg.mlp_ratio,
        use_pallas=cfg.use_pallas, dtype=cfg.dtype,
    )
    dec_block = block_cls(
        cfg.decoder_embed_dim, cfg.decoder_num_heads, mlp_ratio=cfg.mlp_ratio,
        use_pallas=cfg.use_pallas, dtype=cfg.dtype,
    )

    def loss_fn(params, imgs, rng):
        v = {"params": params}
        x, mask, ids_restore = model.apply(
            v, imgs, mask_ratio, method=M.encode_tokens, rngs={"mask": rng}
        )
        x = pipelined_stack_apply(
            enc_block, params, x, mesh, depth=cfg.depth,
            num_microbatches=num_microbatches, prefix="blocks_", axis=axis,
            batch_axis=batch_axis, tp_axis=tp_axis, remat=cfg.remat,
            shard=False, sequence_parallel=sequence_parallel,
        )
        x = model.apply(v, x, method=M.encode_norm)
        x = model.apply(v, x, ids_restore, method=M.decode_tokens)
        x = pipelined_stack_apply(
            dec_block, params, x, mesh, depth=cfg.decoder_depth,
            num_microbatches=num_microbatches, prefix="decoder_blocks_",
            axis=axis, batch_axis=batch_axis, tp_axis=tp_axis,
            remat=cfg.remat, shard=False,
            sequence_parallel=sequence_parallel,
        )
        pred = model.apply(v, x, method=M.decode_pred)
        return model.apply(v, imgs, pred, mask, method=M.forward_loss)

    return _make_update_step(loss_fn, tx, donate)


# ---------------------------------------------------------------------------
# classification (finetune / linprobe)
# ---------------------------------------------------------------------------
def mixup_cutmix(
    rng: jax.Array,
    imgs: jnp.ndarray,
    labels_onehot: jnp.ndarray,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    switch_prob: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device mixup/cutmix over the batch (timm Mixup semantics, batch mode)."""
    n = imgs.shape[0]
    r_perm, r_lam, r_switch, r_box = jax.random.split(rng, 4)
    perm = jax.random.permutation(r_perm, n)
    use_cutmix = jax.random.bernoulli(r_switch, switch_prob)

    lam_mix = jax.random.beta(r_lam, mixup_alpha, mixup_alpha)
    lam_cut = jax.random.beta(r_lam, cutmix_alpha, cutmix_alpha)

    h, w = imgs.shape[-2], imgs.shape[-1]

    def do_mixup(_):
        lam = lam_mix
        mixed = lam * imgs + (1 - lam) * imgs[perm]
        return mixed, lam

    def do_cutmix(_):
        lam = lam_cut
        cut_ratio = jnp.sqrt(1.0 - lam)
        ch, cw = (h * cut_ratio).astype(jnp.int32), (w * cut_ratio).astype(jnp.int32)
        cy = jax.random.randint(r_box, (), 0, h)
        cx = jax.random.randint(jax.random.fold_in(r_box, 1), (), 0, w)
        y0 = jnp.clip(cy - ch // 2, 0, h)
        y1 = jnp.clip(cy + ch // 2, 0, h)
        x0 = jnp.clip(cx - cw // 2, 0, w)
        x1 = jnp.clip(cx + cw // 2, 0, w)
        yy = jnp.arange(h)[:, None]
        xx = jnp.arange(w)[None, :]
        box = ((yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1)).astype(imgs.dtype)
        mixed = imgs * (1 - box) + imgs[perm] * box
        lam_adj = 1.0 - ((y1 - y0) * (x1 - x0)) / (h * w)
        return mixed, lam_adj

    mixed, lam = jax.lax.cond(use_cutmix, do_cutmix, do_mixup, None)
    targets = lam * labels_onehot + (1 - lam) * labels_onehot[perm]
    return mixed, targets


def soft_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return -(targets * jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)).sum(-1).mean()


def make_classifier_train_step(
    model,
    tx,
    num_classes: int,
    label_smoothing: float = 0.1,
    mixup: bool = True,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    frozen_backbone: bool = False,
    donate: bool = True,
    moe_aux_weight: float = 0.01,
):
    """Finetune (mixup + smoothing) or linear-probe (frozen features) step.

    frozen_backbone stops gradients into everything but the head
    (main_linprobe.py:222-231's requires_grad_(False) analog).

    MoE classifiers (ViTConfig.moe_experts > 0) keep their router balanced
    during finetuning the same way pretraining does: the sown aux loss folds
    in with moe_aux_weight. Pass moe_aux_weight=0.0 to skip the mutable
    intermediates pass entirely (linear probe: the router is frozen anyway,
    so the aux term would be a gradient-free constant).
    """
    has_moe = (
        getattr(getattr(model, "config", None), "moe_experts", 0) > 0
        and moe_aux_weight > 0.0
    )

    def loss_fn(params, imgs, labels, rng):
        mix_rng, dp_rng = jax.random.split(rng)
        onehot = jax.nn.one_hot(labels, num_classes)
        if label_smoothing > 0:
            onehot = onehot * (1 - label_smoothing) + label_smoothing / num_classes
        if mixup:
            imgs, onehot = mixup_cutmix(mix_rng, imgs, onehot, mixup_alpha, cutmix_alpha)
        if frozen_backbone:
            head = params["head"]
            frozen = jax.lax.stop_gradient({k: v for k, v in params.items() if k != "head"})
            params = {**frozen, "head": head}
        if has_moe:
            from textmae_tpu.parallel.moe import collect_moe_aux

            logits, inter = model.apply(
                {"params": params}, imgs, deterministic=False,
                rngs={"droppath": dp_rng}, mutable=["intermediates"],
            )
            return soft_cross_entropy(logits, onehot) + moe_aux_weight * collect_moe_aux(inter)
        logits = model.apply(
            {"params": params}, imgs, deterministic=False,
            rngs={"droppath": dp_rng},
        )
        return soft_cross_entropy(logits, onehot)

    def step(state: TrainState, imgs, labels, rng):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, imgs, labels, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_classifier_eval_step(model):
    """Top-1/top-5 accuracy counts (engine_finetune.py:98-130)."""

    def step(params, imgs, labels):
        logits = model.apply({"params": params}, imgs)
        k = min(5, logits.shape[-1])
        topk = jax.lax.top_k(logits, k)[1]
        correct1 = (topk[:, 0] == labels).sum()
        correct5 = (topk == labels[:, None]).any(axis=1).sum()
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), labels
        ).mean()
        return {"correct1": correct1, "correct5": correct5, "loss": loss,
                "count": jnp.int32(labels.shape[0])}

    return jax.jit(step)
