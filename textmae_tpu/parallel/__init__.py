"""Device mesh construction, sharding rules, and multi-host init.

Replaces the reference's torch.distributed/NCCL layer
(/root/reference/models/MAE/util/misc.py:170-248,
models/Compression/common/distributed.py) with the SPMD model: one jit over a
`jax.sharding.Mesh`, XLA inserting collectives over ICI/DCN. Metric all-reduce
(`all_reduce_mean`, logger sync) is free — scalars produced under jit from
sharded inputs are already global.
"""
from textmae_tpu.parallel.mesh import (
    batch_sharding,
    host_local_value,
    init_distributed,
    make_mesh,
    repin_state,
    replicate,
    shard_batch,
)
from textmae_tpu.parallel.pipeline import (
    pipeline_apply,
    pipelined_stack_apply,
    stack_layer_params,
    unstack_layer_params,
)
from textmae_tpu.parallel.moe import (
    MoEBlock,
    MoEMlp,
    moe_param_shardings,
    shard_moe_params,
    shard_params_tp_ep,
)
from textmae_tpu.parallel.fsdp import (
    fsdp_param_shardings,
    shard_params_fsdp,
)
from textmae_tpu.parallel.sharding_rules import (
    shard_params,
    transformer_param_shardings,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "shard_batch",
    "replicate",
    "host_local_value",
    "init_distributed",
    "repin_state",
    "shard_params",
    "transformer_param_shardings",
    "pipeline_apply",
    "pipelined_stack_apply",
    "stack_layer_params",
    "unstack_layer_params",
    "MoEBlock",
    "MoEMlp",
    "moe_param_shardings",
    "shard_moe_params",
    "shard_params_tp_ep",
    "fsdp_param_shardings",
    "shard_params_fsdp",
]
