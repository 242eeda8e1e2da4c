"""MCM training CLI.

Flag-compatible in spirit with /root/reference/training.py:26-100 (same names
where meaningful). Differences by design (SURVEY.md §7):
  * the epoch loop advances by 1 (the reference's `range(start, epochs, 5)` at
    training.py:188 skips 4 of every 5 epochs — a quirk, not replicated),
  * the pretrained MAE checkpoint actually loads (the reference's
    load_state_dict is commented out, training.py:175),
  * AMP loss scaling is unnecessary: TPU trains in bf16 compute without a
    scaler (the reference's NativeScaler is created but unused anyway,
    utils/engine.py).
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train the MCM compression model (TPU).")
    p.add_argument("-d", "--dataset", type=str, required=True, help="dataset root (train/ + val/)")
    p.add_argument("-e", "--epochs", type=int, default=1000)
    p.add_argument("-lr", "--learning-rate", type=float, default=1e-4)
    p.add_argument("--aux-learning-rate", type=float, default=1e-3)
    p.add_argument("--lmbda", type=float, default=1e-4, help="R-D tradeoff (distortion weight)")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--val-batch-size", type=int, default=32)
    p.add_argument("--input-size", type=int, default=224)
    p.add_argument("--num-keep-patches", type=int, default=144)
    p.add_argument("--accum-iter", type=int, default=1)
    p.add_argument("--clip-grad", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--output-dir", type=str, default="./out")
    p.add_argument("--log-dir", type=str, default=None)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--auto-resume", action="store_true",
                   help="resume from the newest checkpoint in --output-dir "
                        "(elastic-recovery analog of the reference's submitit "
                        "requeue hook, submitit_pretrain.py:61-71)")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="capture a jax.profiler trace of the first training steps")
    p.add_argument("--mae-checkpoint", type=str, default=None,
                   help="pretrained torch MAE checkpoint to import")
    p.add_argument("--no-vgg", action="store_true", help="disable the VGG perceptual term")
    p.add_argument("--vgg-weights", type=str, default=None,
                   help="torchvision vgg16 state dict for the perceptual loss "
                        "(default $TEXTMAE_VGG16_WEIGHTS; unset -> random-init "
                        "features, with a logged warning)")
    p.add_argument("--bf16", action="store_true", help="bfloat16 transformer compute")
    p.add_argument("--print-freq", type=int, default=10)
    p.add_argument("--save-every", type=int, default=1)
    p.add_argument("--tensor-parallel", type=int, default=1,
                   help="shard every ViT block's qkv/proj/fc1/fc2 over a "
                        "'model' mesh axis of this size (Megatron-style TP, "
                        "parallel.sharding_rules); remaining devices form the "
                        "data axis. 1 = pure DP (reference semantics)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3: shard every large parameter (and therefore "
                        "its Adam moments) over the 'data' mesh axis "
                        "(parallel/fsdp.py); composes with --tensor-parallel "
                        "into the 2-D data x model layout")
    p.add_argument("--fsdp-min-size", type=int, default=2**13,
                   help="parameters with fewer elements than this replicate "
                        "instead of FSDP-sharding (all-gathering a LayerNorm "
                        "scale costs more latency than the bytes it saves); "
                        "lower it for debug-tiny models so sharding actually "
                        "engages")
    p.add_argument("--moe-experts", type=int, default=0,
                   help="mixture-of-experts MAE encoder: every "
                        "--moe-every'th encoder block's MLP becomes this "
                        "many routed expert FFNs (0 = dense reference "
                        "semantics; parallel/moe.py)")
    p.add_argument("--moe-top-k", type=int, default=1,
                   help="experts routed per token (1 or 2)")
    p.add_argument("--moe-every", type=int, default=2,
                   help="MoE block cadence in the encoder (V-MoE: every 2nd)")
    p.add_argument("--expert-parallel", type=int, default=1,
                   help="with --moe-experts: width of the 'expert' mesh axis "
                        "— stacked expert weights shard over it, remaining "
                        "devices form the data axis")
    p.add_argument("--debug-tiny", action="store_true",
                   help="tiny model dims at the usual --input-size "
                        "(CI/e2e smoke only)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from textmae_tpu.data import ImageScoreDataset, batch_iterator
    from textmae_tpu.models.mcm import MCM, MCMConfig
    from textmae_tpu.parallel import init_distributed, make_mesh, shard_batch
    from textmae_tpu.train import (
        MetricLogger,
        TrainState,
        configure_optimizers,
        make_eval_step,
        make_train_step,
    )
    from textmae_tpu.train.checkpoint import (
        BestTracker,
        load_mae_pretrained,
        restore_checkpoint,
    )
    from textmae_tpu.train.logger import ScalarWriter
    from textmae_tpu.utils import enable_compile_cache, profile_trace

    enable_compile_cache()
    init_distributed()  # consumes cli.launch's JAX_COORDINATOR_* env vars
    # One GLOBAL seed: under SPMD, params and the jitted step's rng are
    # replicated inputs and must be identical on every host (the reference's
    # per-rank seed, training.py:109, relies on DDP broadcasting rank-0
    # weights — there is no such broadcast here). Per-step variation comes
    # from fold_in(rng, state.step) inside the step.
    seed = args.seed
    train_ds = ImageScoreDataset(args.dataset, "train", img_size=args.input_size)
    val_ds = ImageScoreDataset(args.dataset, "val", img_size=args.input_size)

    moe_kw = dict(
        moe_experts=args.moe_experts, moe_top_k=args.moe_top_k,
        moe_every=args.moe_every,
    )
    if args.debug_tiny:
        cfg = MCMConfig(
            img_size=args.input_size,
            num_keep_patches=args.num_keep_patches,
            encoder_embed_dim=32, encoder_depth=2, encoder_num_heads=2,
            decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2,
            latent_depth=24, hyperprior_depth=16, num_slices=4,
            use_pallas=False,
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
            **moe_kw,
        )
    else:
        cfg = MCMConfig(
            img_size=args.input_size,
            num_keep_patches=args.num_keep_patches,
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
            **moe_kw,
        )
    model = MCM(cfg)
    rng = jax.random.PRNGKey(seed)
    sample_imgs = jnp.zeros((2, 3, args.input_size, args.input_size), jnp.float32)
    sample_scores = jnp.zeros((2, cfg.num_patches), jnp.float32)
    variables = jax.jit(
        lambda r: model.init(
            {"params": r, "noise": r}, sample_imgs, sample_scores,
            training=False, compute_loss=False,
        )
    )(rng)
    params = variables["params"]

    if args.mae_checkpoint:
        params = load_mae_pretrained(params, args.mae_checkpoint)
        print(f"loaded MAE checkpoint {args.mae_checkpoint}")

    # mesh before optimizer init: with --tensor-parallel, params must land
    # sharded so tx.init's moments inherit the same layout
    tp = args.tensor_parallel
    ep = args.expert_parallel
    if ep > 1:
        if args.fsdp:
            raise SystemExit("--fsdp does not compose with --expert-parallel")
        if args.moe_experts <= 0:
            raise SystemExit("--expert-parallel needs --moe-experts > 0")
        if args.moe_experts % ep:
            raise SystemExit("--moe-experts must divide by --expert-parallel")
        ndev = len(jax.devices())
        if ndev % (tp * ep):
            raise SystemExit(
                f"--tensor-parallel {tp} x --expert-parallel {ep} does not "
                f"divide {ndev} devices"
            )
        dp = max(ndev // (tp * ep), 1)
        axes = {"data": dp, "expert": ep} if tp == 1 else {
            "data": dp, "model": tp, "expert": ep
        }
        mesh = make_mesh(axes, devices=jax.devices()[: dp * tp * ep])
        from textmae_tpu.parallel import shard_moe_params, shard_params_tp_ep

        # placed before optimizer init so the Adam moments inherit the
        # expert (and TP) sharding (zeros_like follows its operand)
        params = (
            shard_params_tp_ep(params, mesh)
            if tp > 1
            else shard_moe_params(params, mesh)
        )
        print(
            "mesh " + " x ".join(f"{k}{v}" for k, v in axes.items())
            + " (EP over MoE experts"
            + (", TP over ViT blocks)" if tp > 1 else ")")
        )
    elif tp > 1:
        ndev = len(jax.devices())
        if ndev % tp:
            raise SystemExit(
                f"--tensor-parallel {tp} does not divide {ndev} devices"
            )
        mesh = make_mesh({"data": ndev // tp, "model": tp})
        if args.fsdp:
            from textmae_tpu.parallel import shard_params_fsdp

            params = shard_params_fsdp(
                params, mesh, min_size=args.fsdp_min_size, tp_axis="model"
            )
            print(f"mesh data{ndev // tp} x model{tp} (FSDP x TP)")
            from textmae_tpu.parallel.fsdp import fsdp_report
            print(fsdp_report(params))
        else:
            from textmae_tpu.parallel import shard_params

            params = shard_params(params, mesh)
            print(f"mesh data{ndev // tp} x model{tp} (TP over ViT blocks)")
    else:
        mesh = make_mesh()
        if args.fsdp:
            from textmae_tpu.parallel import shard_params_fsdp

            params = shard_params_fsdp(params, mesh, min_size=args.fsdp_min_size)
            print(f"mesh data{mesh.shape['data']} (FSDP / ZeRO-3)")
            from textmae_tpu.parallel.fsdp import fsdp_report
            print(fsdp_report(params))

    vgg_variables = None
    if not args.no_vgg:
        from textmae_tpu.losses.vgg import load_vgg_variables

        vgg_variables = load_vgg_variables(args.vgg_weights)

    tx = configure_optimizers(
        params,
        learning_rate=args.learning_rate,
        aux_learning_rate=args.aux_learning_rate,
        clip_grad=args.clip_grad,
        grad_accum=args.accum_iter,
    )
    state = TrainState.create(params, tx)
    start_epoch = 0
    resume_path = args.resume
    if resume_path is None and args.auto_resume:
        from pathlib import Path as _P

        ckpts = sorted(
            _P(args.output_dir).glob("checkpoint_epoch*"),
            key=lambda p: int(p.name.rsplit("epoch", 1)[1]),
        )
        resume_path = str(ckpts[-1]) if ckpts else None
    resumed_val_loss = float("inf")
    if resume_path:
        state, meta = restore_checkpoint(resume_path, state_template=state)
        start_epoch = int(meta.get("epoch", -1)) + 1
        resumed_val_loss = float(meta.get("val_loss", float("inf")))
        print(f"resumed from {resume_path} at epoch {start_epoch}")
        if tp > 1 or ep > 1 or args.fsdp:
            # restore yields host arrays; re-pin the TP/EP/FSDP layout on the
            # params AND the optimizer moments (two param-tree-sized Adam
            # moments — left replicated they cost 2x full model size per
            # device and defeat the sharding established before tx.init)
            import functools

            from textmae_tpu.parallel import (
                repin_state,
                shard_moe_params,
                shard_params,
                shard_params_fsdp,
                shard_params_tp_ep,
            )

            if tp > 1 and ep > 1:
                resharder = shard_params_tp_ep
            elif args.fsdp:
                resharder = functools.partial(
                    shard_params_fsdp,
                    min_size=args.fsdp_min_size,
                    tp_axis="model" if tp > 1 else None,
                )
            elif tp > 1:
                resharder = shard_params
            else:
                resharder = shard_moe_params
            state = repin_state(state, tx, mesh, resharder)

    train_step = make_train_step(model, tx, lmbda=args.lmbda, vgg_variables=vgg_variables)
    eval_step = make_eval_step(model, lmbda=args.lmbda, vgg_variables=vgg_variables)

    writer = ScalarWriter(args.log_dir) if jax.process_index() == 0 else ScalarWriter(None)
    tracker = BestTracker(args.output_dir)  # self-seeds from its sidecar
    # fallback for output dirs from before the sidecar existed
    tracker.best_loss = min(tracker.best_loss, resumed_val_loss)
    step_rng = jax.random.PRNGKey(seed ^ 0x5EED)

    for epoch in range(start_epoch, args.epochs):
        logger = MetricLogger()
        header = f"Epoch: [{epoch}]"
        it = batch_iterator(
            train_ds, args.batch_size, shuffle=True, seed=seed, epoch=epoch,
            drop_last=True, num_threads=args.num_workers, channels_first=True,
            shard_index=jax.process_index(), shard_count=jax.process_count(),
        )
        profiling = profile_trace(args.profile_dir if epoch == start_epoch else None)
        with profiling:
            # metrics stay device-side; sync only at print frequency so the
            # step pipeline never blocks on the host (the reference syncs
            # every iteration, utils/engine.py:93-100)
            it_count = 0
            for imgs, scores in logger.log_every(it, args.print_freq, header):
                batch = shard_batch(
                    {"imgs": imgs, "scores": scores}, mesh
                )
                state, metrics = train_step(state, batch, step_rng)
                if it_count % args.print_freq == 0:
                    vals = {k: float(v) for k, v in metrics.items()}
                    if not np.isfinite(vals["loss"]):  # NaN abort
                        raise RuntimeError(
                            f"Loss is {vals['loss']}, stopping training"
                        )
                    logger.update(**vals)
                it_count += 1
        for k, meter in logger.meters.items():
            writer.add_scalar(f"train/{k}", meter.global_avg, epoch)

        # validation
        vlogger = MetricLogger()
        vit = batch_iterator(
            val_ds, args.val_batch_size, channels_first=True,
            num_threads=args.num_workers,
        )
        for imgs, scores in vit:
            metrics = eval_step(state.params, {"imgs": jnp.asarray(imgs), "scores": jnp.asarray(scores)})
            vlogger.update(**{k: float(v) for k, v in metrics.items()})
        val_loss = vlogger.meters["loss"].global_avg
        for k, meter in vlogger.meters.items():
            writer.add_scalar(f"val/{k}", meter.global_avg, epoch)
        print(f"{header} val loss {val_loss:.6f}")

        if epoch % args.save_every == 0 or epoch == args.epochs - 1:
            is_best = tracker.save(state, {"args": vars(args)}, epoch, val_loss)
            if is_best:
                print(f"{header} new best ({val_loss:.6f})")
        writer.flush()

    writer.close()


if __name__ == "__main__":
    main()
