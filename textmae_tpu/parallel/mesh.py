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
