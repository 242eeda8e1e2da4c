"""LR schedules + layer-wise decay + MAE optimizer factories.

Parity targets:
  * warmup + half-cosine per-iteration schedule
    (/root/reference/models/MAE/util/lr_sched.py:9-21, applied per-step via
    engine_pretrain.py:42-43) — here a proper optax schedule, no host loop,
  * blr scaling lr = blr * eff_batch / 256 (main_pretrain.py:165-166),
  * BEiT-style layer-wise lr decay for finetune
    (util/lr_decay.py:15-76) — expressed as per-leaf lr multipliers inside
    one optax transformation instead of torch param groups,
  * LARS for linear probe (util/lars.py:14-47) via optax.lars.
"""
from __future__ import annotations

import re
from typing import Optional

import jax
import optax


def scaled_lr(blr: float, batch_size: int, accum_iter: int = 1, world: int = 1) -> float:
    """lr = blr * eff_batch / 256 (main_pretrain.py:165-166)."""
    return blr * batch_size * accum_iter * world / 256.0


def warmup_half_cosine(
    base_lr: float,
    warmup_epochs: float,
    total_epochs: float,
    steps_per_epoch: int,
    min_lr: float = 0.0,
) -> optax.Schedule:
    """util/lr_sched.py:9-21: linear warmup then half-cosine to min_lr."""
    warmup_steps = max(int(warmup_epochs * steps_per_epoch), 1)
    total_steps = max(int(total_epochs * steps_per_epoch), warmup_steps + 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=base_lr,
        warmup_steps=warmup_steps,
        decay_steps=total_steps,
        end_value=min_lr,
    )


# ---------------------------------------------------------------------------
# layer-wise lr decay (BEiT / util/lr_decay.py)
# ---------------------------------------------------------------------------
def _vit_layer_id(path_str: str, num_layers: int) -> int:
    """util/lr_decay.py:56-76: embed/cls/pos -> 0, blocks_i -> i+1, rest -> last."""
    if any(k in path_str for k in ("cls_token", "pos_embed", "patch_embed")):
        return 0
    m = re.search(r"blocks_(\d+)", path_str)
    if m:
        return int(m.group(1)) + 1
    return num_layers


def layer_decay_mults(params, num_layers: int, decay: float):
    """Per-leaf multipliers decay^(num_layers+1 - layer_id)."""

    def mult(path, _):
        path_str = "/".join(str(getattr(p, "key", p)) for p in path)
        lid = _vit_layer_id(path_str, num_layers + 1)
        return decay ** (num_layers + 1 - lid)

    return jax.tree_util.tree_map_with_path(mult, params)


def scale_by_layer_decay(mults) -> optax.GradientTransformation:
    """Multiply updates leaf-wise by precomputed layer-decay factors."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree.map(lambda u, m: u * m, updates, mults), state

    return optax.GradientTransformation(init_fn, update_fn)


def no_weight_decay_mask(params):
    """True where weight decay applies: exclude biases, norms, cls/pos/mask
    tokens (util/lr_decay.py:40-47, timm convention: ndim < 2 skipped)."""

    def check(path, leaf):
        path_str = "/".join(str(getattr(p, "key", p)) for p in path)
        if any(k in path_str for k in ("cls_token", "pos_embed", "mask_token")):
            return False
        return getattr(leaf, "ndim", 0) >= 2

    return jax.tree_util.tree_map_with_path(check, params)


# ---------------------------------------------------------------------------
# optimizer factories for the three MAE workloads
# ---------------------------------------------------------------------------
def mae_pretrain_optimizer(
    params, schedule: optax.Schedule, weight_decay: float = 0.05,
    clip_grad: Optional[float] = None,
) -> optax.GradientTransformation:
    """AdamW(0.9, 0.95) + wd masking (main_pretrain.py:162-170)."""
    chain = []
    if clip_grad:
        chain.append(optax.clip_by_global_norm(clip_grad))
    chain.append(
        optax.adamw(
            schedule, b1=0.9, b2=0.95, weight_decay=weight_decay,
            mask=no_weight_decay_mask(params),
        )
    )
    return optax.chain(*chain)


def mae_finetune_optimizer(
    params, schedule: optax.Schedule, weight_decay: float = 0.05,
    layer_decay: float = 0.75, num_layers: int = 12,
    clip_grad: Optional[float] = None,
) -> optax.GradientTransformation:
    """AdamW + BEiT layer decay (main_finetune.py:232-238)."""
    chain = []
    if clip_grad:
        chain.append(optax.clip_by_global_norm(clip_grad))
    chain.append(
        optax.adamw(
            schedule, weight_decay=weight_decay, mask=no_weight_decay_mask(params)
        )
    )
    chain.append(scale_by_layer_decay(layer_decay_mults(params, num_layers, layer_decay)))
    return optax.chain(*chain)


def linprobe_optimizer(schedule: optax.Schedule, momentum: float = 0.9) -> optax.GradientTransformation:
    """LARS, no weight decay on the probe head (main_linprobe.py:252)."""
    return optax.lars(schedule, momentum=momentum, weight_decay=0.0)
