"""Worker for the elastic gang-restart MCM training test.

Launched BY textmae_tpu.cli.launch (which exports the JAX_COORDINATOR_* env
vars): 2 processes x 4 virtual CPU devices = one global ("data", 8) mesh.
Trains tiny-MCM with per-step checkpointing; on the FIRST attempt process 0
simulates a preemption (hard exit) after step 2, the launcher tears the gang
down and relaunches it (--max-restarts), and the restarted gang auto-resumes
from the checkpoint — submitit's requeue semantics
(/root/reference/models/MAE/submitit_pretrain.py:61-71) end to end.

Run as: python tests/mp_gang_worker.py <workdir> [tp]

With the "tp" argument the gang trains the TP-SHARDED step instead
(VERDICT r2 Next #8): a ("data", 2) x ("model", 4) mesh — "data" across
the two processes, "model" over each process's 4 local devices — with
qkv/proj/fc1/fc2 sharded over "model" (parallel.shard_params) BEFORE
optimizer init so the Adam moments inherit the layout. The checkpoint is
written from process-local shards (parallel.host_local_value) and, after
the simulated preemption, the restarted gang re-pins BOTH params and
moments to the TP layout (the cli.train --resume pattern) — the result
JSON records the post-restart shardings so the test can verify moments
did not silently land replicated.
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
    tp_mode = len(sys.argv) > 2 and sys.argv[2] == "tp"
    from textmae_tpu.parallel.mesh import (
        batch_sharding,
        host_local_value,
        init_distributed,
        make_mesh,
        replicate,
    )
    from textmae_tpu.parallel.sharding_rules import shard_params

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
    if tp_mode:
        # "data" spans the two processes (jax device order groups local
        # devices per process), "model" is intra-process: TP collectives
        # ride the fast local links, DP gradient psum crosses hosts
        mesh = make_mesh({"data": 2, "model": 4})
    else:
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
    if tp_mode:
        # sharded BEFORE tx.init so the Adam moments inherit the TP layout
        params = shard_params(params, mesh)

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
        restored = jax.tree.unflatten(treedef, leaves)
        start_step = json.loads(meta_file.read_text())["step"]
        if tp_mode:
            # re-pin the TP layout on params AND moments: the freshly-built
            # `state` above carries the intended shardings (params sharded
            # before tx.init), so it is the template — restored host leaves
            # land on each template leaf's sharding (cli.train --resume
            # semantics; a blanket replicate here would silently cost 3x
            # model size per device and defeat TP)
            from jax.sharding import NamedSharding

            def _pin(r, t):
                sh = getattr(t, "sharding", None)
                if not isinstance(sh, NamedSharding) or sh.mesh != mesh:
                    sh = replicate(mesh)  # scalars (Adam count, step)
                return jax.device_put(r, sh)

            state = jax.tree.map(_pin, restored, state)
        else:
            state = jax.device_put(restored, replicate(mesh))
    elif tp_mode:
        # fresh start: params/moments already sharded on the mesh; pin the
        # stragglers (scalar leaves off tx.init) so every jit input is a
        # global array on this mesh
        from jax.sharding import NamedSharding

        def _fix(x):
            sh = getattr(x, "sharding", None)
            if isinstance(sh, NamedSharding) and sh.mesh == mesh:
                return x
            return jax.device_put(x, replicate(mesh))

        state = jax.tree.map(_fix, state)
    else:
        state = jax.device_put(state, replicate(mesh))
    train_step = make_train_step(model, tx, lmbda=1e-4)

    def save_state(path: Path, st) -> None:
        # host_local_value: TP-sharded leaves assemble from process-local
        # shards (np.asarray only handles fully-replicated / -addressable)
        leaves = jax.tree.leaves(jax.tree.map(host_local_value, st))
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

    psum = float(
        sum(float(np.sum(host_local_value(x))) for x in jax.tree.leaves(state.params))
    )
    result = {
        "proc": proc_id,
        "num_processes": jax.process_count(),
        "global_devices": len(jax.devices()),
        "start_step": start_step,
        "losses": losses,
        "param_sum": psum,
    }
    if tp_mode:
        # post-run sharding proof: the qkv kernel and its Adam mu moment
        # must both carry the TP spec (moments silently landing replicated
        # after restart is the regression this drill exists to catch)
        flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
        qkv_path = next(
            p for p, leaf in flat
            if "/".join(str(getattr(k, "key", k)) for k in p).endswith(
                "attn/qkv/kernel")
        )

        def leaf_at(tree, path):
            for k in path:
                tree = tree[getattr(k, "key", k)]
            return tree

        mu = state.opt_state[0].mu  # optax.adam: (ScaleByAdamState, ...)
        result["qkv_param_spec"] = str(leaf_at(state.params, qkv_path).sharding.spec)
        result["qkv_mu_spec"] = str(leaf_at(mu, qkv_path).sharding.spec)
    out = workdir / f"gang_result_{proc_id}.json"
    out.write_text(json.dumps(result))


if __name__ == "__main__":
    main()
