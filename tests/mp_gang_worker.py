"""Worker for the elastic gang-restart MCM training test.

Launched BY textmae_tpu.cli.launch (which exports the JAX_COORDINATOR_* env
vars): 2 processes x 4 virtual CPU devices = one global ("data", 8) mesh.
Trains tiny-MCM with per-step checkpointing; on the FIRST attempt process 0
simulates a preemption (hard exit) after step 2, the launcher tears the gang
down and relaunches it (--max-restarts), and the restarted gang auto-resumes
from the checkpoint — submitit's requeue semantics
(/root/reference/models/MAE/submitit_pretrain.py:61-71) end to end.

Run as: python tests/mp_gang_worker.py <workdir>
"""
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

TOTAL_STEPS = 4
FAIL_AFTER_STEP = 2


def main() -> None:
    workdir = Path(sys.argv[1])
    from textmae_tpu.parallel.mesh import (
        batch_sharding,
        init_distributed,
        make_mesh,
        replicate,
    )

    init_distributed()  # env-var rendezvous exported by cli.launch
    proc_id = jax.process_index()

    import numpy as np
    import optax

    from textmae_tpu.models.mcm import MCM, MCMConfig
    from textmae_tpu.train.state import TrainState
    from textmae_tpu.train.step import make_train_step

    assert jax.process_count() == 2
    assert len(jax.devices()) == 8

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
    mesh = make_mesh()  # ("data", 8) across both processes

    r = np.random.default_rng(0)
    global_batch = len(jax.devices())
    per_proc = global_batch // jax.process_count()
    imgs = r.random((global_batch, 3, 96, 96), np.float32)
    scores = r.random((global_batch, cfg.num_patches), np.float32)
    sh = batch_sharding(mesh)
    lo = proc_id * per_proc
    batch = {
        "imgs": jax.make_array_from_process_local_data(sh, imgs[lo : lo + per_proc]),
        "scores": jax.make_array_from_process_local_data(
            sh, scores[lo : lo + per_proc]
        ),
    }

    key = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda r, x, s: model.init(
            {"params": r, "noise": r}, x, s, training=False, compute_loss=False
        )
    )(key, jax.numpy.asarray(imgs[:1]), jax.numpy.asarray(scores[:1]))
    params = variables["params"]

    tx = optax.adam(1e-3)
    state = TrainState.create(params, tx)

    # resume: all processes read the replicated FULL TrainState checkpoint
    # (params + Adam moments + step — submitit's requeue restores optimizer
    # state too, util/misc.py:295-329; params-only resume would optimize
    # differently post-restart). Written lead-only, numbered-leaf npz keyed
    # by the state treedef — process-count agnostic.
    ckpt = workdir / "gang_ckpt.npz"
    meta_file = workdir / "gang_ckpt_meta.json"
    treedef = jax.tree.structure(state)
    start_step = 0
    if ckpt.is_file() and meta_file.is_file():
        with np.load(ckpt) as z:
            leaves = [z[f"leaf_{i}"] for i in range(len(z.files))]
        state = jax.tree.unflatten(treedef, leaves)
        start_step = json.loads(meta_file.read_text())["step"]

    state = jax.device_put(state, replicate(mesh))
    train_step = make_train_step(model, tx, lmbda=1e-4)

    def save_state(path: Path, st) -> None:
        leaves = jax.tree.leaves(jax.tree.map(np.asarray, st))
        tmp = path.with_name(path.name + ".tmp.npz")  # savez appends .npz
        np.savez_compressed(tmp, **{f"leaf_{i}": a for i, a in enumerate(leaves)})
        os.replace(tmp, path)  # atomic: mid-write preemption must not corrupt

    losses = []
    for step in range(start_step, TOTAL_STEPS):
        state, metrics = train_step(state, batch, jax.random.fold_in(key, step))
        losses.append(float(metrics["loss"]))
        if proc_id == 0:
            save_state(ckpt, state)
            tmp = meta_file.with_suffix(".tmp")
            tmp.write_text(json.dumps({"step": step + 1}))
            tmp.replace(meta_file)

        marker = workdir / "preempted.marker"
        if step + 1 == FAIL_AFTER_STEP and not marker.exists():
            if proc_id == 0:
                marker.write_text("preempted after step 2")
                sys.stdout.flush()
                os._exit(17)  # simulated preemption: hard kill, no cleanup
            else:
                # peer waits to be torn down by the launcher
                import time

                time.sleep(120)
                os._exit(1)

    psum = float(sum(float(jax.numpy.sum(x)) for x in jax.tree.leaves(state.params)))
    out = workdir / f"gang_result_{proc_id}.json"
    out.write_text(
        json.dumps(
            {
                "proc": proc_id,
                "num_processes": jax.process_count(),
                "global_devices": len(jax.devices()),
                "start_step": start_step,
                "losses": losses,
                "param_sum": psum,
            }
        )
    )


if __name__ == "__main__":
    main()
