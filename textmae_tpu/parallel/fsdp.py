"""Fully-sharded data parallelism (ZeRO-3 style) as sharding annotations.

The reference's parallelism surface is data-parallel only with fully
replicated parameters and optimizer state (SURVEY.md §2.8 — torch DDP over
NCCL, models/MAE/util/misc.py:216-248). On TPU the idiomatic upgrade is not a
wrapper class but a *placement rule*: shard every large parameter across the
"data" mesh axis and let XLA's SPMD partitioner insert the all-gathers
(forward/backward weight collection) and reduce-scatters (gradient reduction)
over ICI. Optimizer moments inherit the layout for free because they are
created with ``zeros_like`` from already-sharded params (train/optim.py), so
param + grad + moment memory all divide by the axis size — the full ZeRO-3
memory equation, with zero new runtime code.

Rules (per leaf):
  * pick the LARGEST dim divisible by the axis size and shard it; prefer the
    trailing-most dim on ties (better for row-major layouts feeding the MXU);
  * leaves with fewer than ``min_size`` elements replicate — all-gathering a
    LayerNorm scale costs more latency than the bytes it saves;
  * dims already taken by TP stay with TP: ``fsdp_param_shardings(...,
    tp_axis="model")`` starts from sharding_rules' Megatron specs and adds
    the "data" axis on a remaining dim (the standard 2-D FSDP x TP layout).

Multi-host: the "data" axis spans processes under cli.launch; checkpoint
saves gather cross-process shards collectively (train/checkpoint.py
``save_checkpoint`` routes non-fully-addressable leaves through
``multihost_utils.process_allgather`` on EVERY process before the lead
writes), so ZeRO-3 training checkpoints work beyond one host.

No reference counterpart (PARITY.md §2.8 ✚). The recipe follows the public
jax scaling-book / t5x "fsdp as a mesh axis" pattern; implementation original.
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _fsdp_spec(base: P, shape, n: int, axis: str, min_size: int) -> P:
    """Extend `base` (possibly empty / TP-assigned) with `axis` on the best
    free dim; return `base` unchanged when nothing qualifies."""
    size = 1
    for d in shape:
        size *= d
    if size < min_size or n <= 1:
        return base
    spec = list(base) + [None] * (len(shape) - len(base))
    best = -1
    for i, d in enumerate(shape):
        if spec[i] is None and d % n == 0 and (best < 0 or d >= shape[best]):
            best = i
    if best < 0:
        return base
    spec[best] = axis
    return P(*spec)


def fsdp_param_shardings(
    params,
    mesh: Mesh,
    axis: str = "data",
    min_size: int = 2**13,
    tp_axis: Optional[str] = None,
):
    """NamedSharding tree: ZeRO-3 placement over `axis`, optionally layered
    on top of the Megatron TP rules (`tp_axis`)."""
    n = int(mesh.shape[axis])

    if tp_axis is not None:
        from textmae_tpu.parallel.sharding_rules import _spec_for

        def base_spec(path_str, leaf):
            return _spec_for(path_str, leaf, tp_axis)
    else:
        def base_spec(path_str, leaf):
            return P()

    def one(path, leaf):
        path_str = "/".join(str(getattr(p, "key", p)) for p in path)
        spec = _fsdp_spec(
            base_spec(path_str, leaf), leaf.shape, n, axis, min_size
        )
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params_fsdp(
    params,
    mesh: Mesh,
    axis: str = "data",
    min_size: int = 2**13,
    tp_axis: Optional[str] = None,
):
    """device_put the param tree with FSDP (+ optional TP) shardings.

    Call BEFORE optimizer init so the Adam moments inherit the layout
    (TrainState.create -> optax zeros_like keeps input sharding)."""
    shardings = fsdp_param_shardings(params, mesh, axis, min_size, tp_axis)
    return jax.tree.map(jax.device_put, params, shardings)


def fsdp_report(params, axis: str = "data") -> str:
    """One line stating how many param leaves actually FSDP-sharded — a
    debug-tiny run where every kernel is below min_size silently exercises
    only the plumbing (ADVICE r3), so CLIs print (and e2e tests assert) the
    placement rather than assume it."""
    leaves = jax.tree.leaves(params)
    n_sharded = 0
    for leaf in leaves:
        spec = getattr(getattr(leaf, "sharding", None), "spec", None) or ()
        for entry in spec:
            names = entry if isinstance(entry, tuple) else (entry,)
            if axis in names:
                n_sharded += 1
                break
    return f"FSDP sharded {n_sharded}/{len(leaves)} param leaves over '{axis}'"
