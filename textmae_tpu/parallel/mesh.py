"""Mesh + sharding helpers (the whole "distributed backend").

The reference's parallelism surface is data-parallel only (SURVEY.md §2.8);
here DP is a 1-D "data" mesh axis. The helpers still accept extra axes (e.g.
("data", "model")) so the same code serves tensor-parallel experiments — pass
`axes={"data": 4, "model": 2}`.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(**kwargs) -> None:
    """Multi-process init (torch init_process_group analog, util/misc.py:216-248).

    Rendezvous comes from explicit kwargs or the JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars that cli.launch exports
    (jax.distributed.initialize only auto-detects scheduler environments like
    SLURM/OMPI/TPU pods, not these). No-op when single-process (the common
    case under a single host with many chips — JAX already sees all local
    devices).
    """
    import os

    if kwargs:
        jax.distributed.initialize(**kwargs)
    elif "JAX_COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )


def make_mesh(
    axes: Optional[Dict[str, int]] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a Mesh; default = all devices on one "data" axis."""
    devices = list(devices if devices is not None else jax.devices())
    if axes is None:
        axes = {"data": len(devices)}
    names = tuple(axes.keys())
    shape = tuple(axes.values())
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh {axes} needs {np.prod(shape)} devices, have {len(devices)}")
    return Mesh(np.array(devices).reshape(shape), names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over `axis`, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a pytree of host arrays with batch-dim sharding."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def repin_state(state, tx, mesh: Mesh, resharder):
    """Re-pin a restored TrainState to a mesh layout (params + opt_state).

    Checkpoint restore yields host arrays; params go through `resharder`
    (shard_params / shard_moe_params / shard_params_fsdp, already bound to
    any extra kwargs) and every optimizer-state leaf takes the sharding
    ``tx.init`` would have produced from the re-sharded params — left
    replicated, the two param-tree-sized Adam moments cost 2x full model
    size per device and defeat the layout established before the original
    ``tx.init``. Scalar leaves (Adam counts) replicate over the mesh.
    """
    sharded = resharder(state.params, mesh)
    template = tx.init(sharded)

    def _pin(restored, t):
        sh = getattr(t, "sharding", None)
        if not isinstance(sh, NamedSharding) or sh.mesh != mesh:
            sh = NamedSharding(mesh, P())
        return jax.device_put(restored, sh)

    opt_state = jax.tree.map(_pin, state.opt_state, template)
    return state.replace(params=sharded, opt_state=opt_state)


def host_local_value(arr) -> np.ndarray:
    """Host numpy value of a jax.Array from this process's shards alone.

    np.asarray works on fully-replicated or fully-addressable arrays only.
    Arrays sharded over an INTRA-process mesh axis and replicated across
    processes (the dp x tp layout: "model" within a host, "data" across
    hosts) are neither — yet every process holds a complete copy in its
    addressable shards. Assemble it without communication; checkpoint save
    paths use this so TP-sharded states checkpoint as cheaply as DP ones
    (the reference's DP-only equivalent is plain .cpu(), misc.py:295-329).

    Raises ValueError when local shards do NOT cover the array (sharded over
    a cross-process axis) — that case needs a gather, not a local fetch.
    """
    if getattr(arr, "is_fully_replicated", True) or arr.is_fully_addressable:
        return np.asarray(arr)
    out = np.empty(arr.shape, arr.dtype)
    seen = np.zeros(arr.shape, bool)
    for sh in arr.addressable_shards:
        out[sh.index] = np.asarray(sh.data)
        seen[sh.index] = True
    if not seen.all():
        raise ValueError(
            "local shards cover only part of the array (sharded over a "
            "cross-process axis); all-gather it instead of host_local_value"
        )
    return out
