"""Train state pytree: params + optimizer state + counters."""
from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp


class TrainState(flax.struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar
    epoch: int = flax.struct.field(pytree_node=False, default=0)

    @classmethod
    def create(cls, params, tx, epoch: int = 0) -> "TrainState":
        return cls(
            params=params,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            epoch=epoch,
        )
