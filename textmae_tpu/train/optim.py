"""Dual-optimizer configuration (main Adam + aux Adam over quantiles).

Reference contract (/root/reference/models/Compression/common/model_utils.py:67-90):
parameters named `*.quantiles` train under a separate aux Adam driven by the
quantile loss; everything else under the main Adam with grad-clip 1.0
(utils/engine.py:82-88). Here both updates come from ONE combined scalar
(rd_loss + aux_loss): the aux loss touches only `quantiles` (density params are
stop_gradient'ed inside aux_loss) and the rd loss has no gradient path into
`quantiles` (the STE cancels the medians term), so an `optax.multi_transform`
partitioned on the quantiles/non-quantiles split applied to the combined
gradient is mathematically identical to the reference's two backward passes —
in a single jit, one gradient computation.
"""
from __future__ import annotations

import jax
import optax


def is_quantiles_path(path) -> bool:
    last = path[-1]
    key = getattr(last, "key", getattr(last, "name", str(last)))
    return key == "quantiles"


def param_labels(params):
    """'aux' for *.quantiles leaves, 'main' for everything else (disjoint and
    exhaustive — the split model_utils.py:80 asserts)."""
    return jax.tree_util.tree_map_with_path(
        lambda p, _: "aux" if is_quantiles_path(p) else "main", params
    )


def configure_optimizers(
    params,
    learning_rate: float = 1e-4,
    aux_learning_rate: float = 1e-3,
    clip_grad: float = 1.0,
    grad_accum: int = 1,
) -> optax.GradientTransformation:
    """One GradientTransformation applying main Adam (with clip) to non-quantile
    params and aux Adam to quantiles.

    Defaults mirror training.py:40-46 (--learning-rate 1e-4,
    --aux-learning-rate 1e-3) and the clip at utils/engine.py:84.
    """
    main_chain = []
    if clip_grad:
        main_chain.append(optax.clip_by_global_norm(clip_grad))
    main_chain.append(optax.adam(learning_rate))
    tx = optax.multi_transform(
        {"main": optax.chain(*main_chain), "aux": optax.adam(aux_learning_rate)},
        param_labels(params),
    )
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx
