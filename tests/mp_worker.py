"""Worker process for the real multi-process jax.distributed smoke test.

Run as: python tests/mp_worker.py <proc_id> <nproc> <port> <outfile>

Each process owns 2 virtual CPU devices; together they form one global
("data",) mesh. The MCM train step runs SPMD over that mesh exactly as it
would over a multi-host TPU slice — gradient/metric reductions cross the
process boundary through the gloo CPU collectives backend (the CI analog of
XLA collectives over ICI/DCN; reference: torch.distributed NCCL init at
/root/reference/models/MAE/util/misc.py:216-248).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_PROC_ID, _NPROC = int(sys.argv[1]), int(sys.argv[2])

os.environ["JAX_PLATFORMS"] = "cpu"
# 2 devices per process; nproc=1 is the single-process baseline with the
# same 4-device global topology (2 procs x 2 devs == 1 proc x 4 devs)
_LOCAL = 2 if _NPROC > 1 else 4
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={_LOCAL}"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main() -> None:
    proc_id, nproc, port = _PROC_ID, _NPROC, sys.argv[3]
    outfile = sys.argv[4]

    from textmae_tpu.parallel.mesh import init_distributed

    if nproc > 1:
        init_distributed(
            coordinator_address=f"localhost:{port}",
            num_processes=nproc,
            process_id=proc_id,
        )

    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from textmae_tpu.models.mcm import MCM, MCMConfig
    from textmae_tpu.parallel.mesh import batch_sharding, make_mesh, replicate
    from textmae_tpu.train.state import TrainState
    from textmae_tpu.train.step import make_train_step

    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4

    cfg = MCMConfig(
        img_size=96,
        encoder_embed_dim=16,
        encoder_depth=1,
        encoder_num_heads=2,
        decoder_embed_dim=16,
        decoder_depth=1,
        decoder_num_heads=2,
        latent_depth=8,
        hyperprior_depth=8,
        num_slices=2,
        num_keep_patches=16,
        use_pallas=False,
    )
    model = MCM(cfg)
    mesh = make_mesh()  # global ("data", 2*nproc) mesh

    # identical global batch on every process; each keeps its contiguous
    # block (process p's devices come first in jax.devices() order, so the
    # assembled global array preserves the original row order)
    r = np.random.default_rng(0)
    global_batch = 2 * len(jax.devices())
    per_proc = global_batch // nproc
    imgs = r.random((global_batch, 3, 96, 96), np.float32)
    scores = r.random((global_batch, cfg.num_patches), np.float32)
    sh = batch_sharding(mesh)
    lo, hi = proc_id * per_proc, (proc_id + 1) * per_proc
    batch = {
        "imgs": jax.make_array_from_process_local_data(sh, imgs[lo:hi]),
        "scores": jax.make_array_from_process_local_data(sh, scores[lo:hi]),
    }

    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "noise": key},
        imgs[:1],
        scores[:1],
        training=False,
        compute_loss=False,
    )
    tx = optax.adam(1e-4)
    state = TrainState.create(variables["params"], tx)
    state = jax.device_put(state, replicate(mesh))
    train_step = make_train_step(model, tx, lmbda=1e-4)

    losses = []
    for _ in range(2):
        state, metrics = train_step(state, batch, key)
        losses.append(float(metrics["loss"]))

    psum = float(
        sum(float(jax.numpy.sum(x)) for x in jax.tree.leaves(state.params))
    )
    with open(outfile, "w") as f:
        json.dump(
            {
                "proc": proc_id,
                "num_processes": jax.process_count(),
                "global_devices": len(jax.devices()),
                "losses": losses,
                "param_sum": psum,
            },
            f,
        )


if __name__ == "__main__":
    main()
