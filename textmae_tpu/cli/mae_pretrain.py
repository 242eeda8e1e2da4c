"""MAE pretraining CLI (secondary workload).

Parity with /root/reference/models/MAE/main_pretrain.py:38-221: ViT-L/16 MAE,
AdamW(β2=0.95) with blr*eff_batch/256 scaling, warmup+half-cosine schedule,
norm_pix loss, periodic checkpoints, NaN abort (engine_pretrain.py:52-54).
Multi-host DP replaces DDP/submitit: run one process per host with
jax.distributed (textmae_tpu.parallel.init_distributed); in-process chips are
covered by the sharded batch.
"""
from __future__ import annotations

import argparse
import math

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="MAE pretraining (TPU)")
    p.add_argument("--data_path", required=True, help="ImageFolder root with train/")
    p.add_argument("--model", default="mae_vit_large_patch16",
                   choices=["mae_vit_base_patch16", "mae_vit_large_patch16", "mae_vit_huge_patch14"])
    p.add_argument("--epochs", type=int, default=800)
    p.add_argument("--warmup_epochs", type=int, default=40)
    p.add_argument("--batch_size", type=int, default=64, help="per process")
    p.add_argument("--accum_iter", type=int, default=1)
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--mask_ratio", type=float, default=0.75)
    p.add_argument("--norm_pix_loss", action="store_true")
    p.add_argument("--blr", type=float, default=1e-3)
    p.add_argument("--min_lr", type=float, default=0.0)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_workers", type=int, default=10)
    p.add_argument("--output_dir", default="./out_pretrain")
    p.add_argument("--log_dir", default=None)
    p.add_argument("--resume", default=None)
    p.add_argument("--auto_resume", action="store_true",
                   help="resume from the newest checkpoint in --output_dir "
                        "(elastic-recovery analog of submitit_pretrain.py:61-71)")
    p.add_argument("--save_every", type=int, default=20)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--print_freq", type=int, default=20)
    p.add_argument("--pipeline_stages", type=int, default=1,
                   help="run the encoder/decoder block stacks as this many "
                        "pipeline-parallel stages over the local devices "
                        "(depths must divide evenly; ViT-L 24/8 -> 2,4,8)")
    p.add_argument("--microbatches", type=int, default=4,
                   help="pipeline microbatches per step (>= stages for "
                        "reasonable bubble overhead); batch_size must divide")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="tensor-parallel width: with --pipeline_stages, "
                        "INSIDE each pipeline stage (dp x pp x tp mesh); "
                        "without, a data x model mesh with Megatron block "
                        "sharding (heads and MLP hidden must divide evenly)")
    p.add_argument("--debug_tiny", action="store_true",
                   help="tiny model dims at the usual --input_size "
                        "(CI/e2e smoke only; mirrors cli.train --debug-tiny)")
    p.add_argument("--moe_experts", type=int, default=0,
                   help="mixture-of-experts encoder: every --moe_every'th "
                        "encoder block's MLP becomes an MoE layer with this "
                        "many experts (0 = dense; parallel/moe.py)")
    p.add_argument("--moe_top_k", type=int, default=1,
                   help="experts routed per token (1 or 2)")
    p.add_argument("--moe_every", type=int, default=2,
                   help="MoE layer placement period over encoder blocks")
    p.add_argument("--expert_parallel", type=int, default=1,
                   help="with --moe_experts: width of the \"expert\" mesh "
                        "axis — stacked expert weights shard over it, the "
                        "rest of the devices form the data axis (experts "
                        "and device count must divide evenly)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3: shard every large parameter (and its Adam "
                        "moments) over the 'data' mesh axis "
                        "(parallel/fsdp.py); composes with --tensor_parallel "
                        "into the 2-D data x model layout")
    p.add_argument("--fsdp_min_size", type=int, default=2**13,
                   help="parameters with fewer elements than this replicate "
                        "instead of FSDP-sharding; lower it for debug_tiny "
                        "models so sharding actually engages")
    p.add_argument("--sequence_parallel", action="store_true",
                   help="with --tensor_parallel: Megatron SP on the model "
                        "axis — residual stream token-sharded between "
                        "blocks (all_gather + psum_scatter per branch); "
                        "applied per stack where the sequence length "
                        "divides (the MAE decoder's odd 197 falls back to "
                        "plain TP)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from textmae_tpu.data.classification import ImageFolderDataset, class_batch_iterator
    from textmae_tpu.models import mae as mae_models
    from textmae_tpu.parallel import init_distributed, make_mesh, shard_batch
    from textmae_tpu.train import MetricLogger, TrainState
    from textmae_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from textmae_tpu.train.logger import ScalarWriter
    from textmae_tpu.train.mae_engine import make_mae_pretrain_step
    from textmae_tpu.train.schedules import (
        mae_pretrain_optimizer,
        scaled_lr,
        warmup_half_cosine,
    )

    init_distributed()
    # per-host seed ONLY for data augmentation; params and the step rng are
    # replicated SPMD inputs and must be seeded identically on every host
    # (the reference's per-rank seed works because DDP broadcasts rank-0
    # weights — SPMD has no broadcast)
    host_seed = args.seed + jax.process_index()
    dataset = ImageFolderDataset(
        f"{args.data_path}/train", args.input_size, train=True, seed=host_seed
    )

    factory = getattr(mae_models, args.model)
    if args.moe_experts > 0 and args.pipeline_stages > 1:
        raise SystemExit("--moe_experts does not compose with "
                         "--pipeline_stages yet (MoE blocks are not part of "
                         "the pipelined block runner)")
    common = dict(
        img_size=args.input_size,
        norm_pix_loss=args.norm_pix_loss,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        moe_experts=args.moe_experts,
        moe_top_k=args.moe_top_k,
        moe_every=args.moe_every,
    )
    if args.debug_tiny:
        from textmae_tpu.models.mae import MAEConfig, MaskedAutoencoderViT

        model = MaskedAutoencoderViT(MAEConfig(
            embed_dim=32, depth=4, num_heads=2,
            decoder_embed_dim=16, decoder_depth=2, decoder_num_heads=2,
            use_pallas=False, **common,
        ))
    else:
        model = factory(**common)

    rng = jax.random.PRNGKey(args.seed)
    sample = jnp.zeros((2, 3, args.input_size, args.input_size), jnp.float32)
    variables = jax.jit(
        lambda r: model.init({"params": r, "mask": r}, sample, args.mask_ratio)
    )(rng)
    params = variables["params"]

    # non-pipelined TP / EP / TP x EP: one mesh, params placed before
    # optimizer init so the Adam moments inherit the sharding (zeros_like
    # follows its operand). With --pipeline_stages > 1 the pipelined step
    # owns --tensor_parallel instead (stacked per-stage block params).
    ep_mesh = None
    if args.fsdp:
        if args.pipeline_stages > 1 or args.expert_parallel > 1:
            raise SystemExit(
                "--fsdp composes with --tensor_parallel only "
                "(not --pipeline_stages / --expert_parallel)"
            )
        from textmae_tpu.parallel import shard_params_fsdp

        tp = max(args.tensor_parallel, 1)
        ndev = len(jax.devices())
        if ndev % tp:
            raise SystemExit(
                f"--tensor_parallel {tp} does not divide {ndev} devices"
            )
        axes = {"data": ndev // tp}
        if tp > 1:
            axes["model"] = tp
        ep_mesh = make_mesh(axes)
        params = shard_params_fsdp(
            params, ep_mesh, min_size=args.fsdp_min_size,
            tp_axis="model" if tp > 1 else None,
        )
        print(
            "mesh " + " x ".join(f"{k}{v}" for k, v in axes.items())
            + " (FSDP / ZeRO-3" + (" x TP)" if tp > 1 else ")")
        )
        from textmae_tpu.parallel.fsdp import fsdp_report

        print(fsdp_report(params))
    elif args.pipeline_stages == 1 and (
        args.expert_parallel > 1 or args.tensor_parallel > 1
    ):
        ep = max(args.expert_parallel, 1)
        tp = max(args.tensor_parallel, 1)
        if ep > 1 and args.moe_experts % ep:
            raise SystemExit("--moe_experts must divide by --expert_parallel")
        ndev = len(jax.devices())
        if ndev % (tp * ep):
            raise SystemExit(
                f"--tensor_parallel {tp} x --expert_parallel {ep} does not "
                f"divide {ndev} devices"
            )
        dp = max(ndev // (tp * ep), 1)
        axes = {"data": dp}
        if tp > 1:
            axes["model"] = tp
        if ep > 1:
            axes["expert"] = ep
        ep_mesh = make_mesh(axes, devices=jax.devices()[: dp * tp * ep])
        from textmae_tpu.parallel import (
            shard_moe_params,
            shard_params,
            shard_params_tp_ep,
        )

        if tp > 1 and ep > 1:
            params = shard_params_tp_ep(params, ep_mesh)
        elif ep > 1:
            params = shard_moe_params(params, ep_mesh)
        else:
            params = shard_params(params, ep_mesh)
        print("mesh " + " x ".join(f"{k}{v}" for k, v in axes.items()))

    world = jax.process_count()
    steps_per_epoch = max(len(dataset) // (args.batch_size * world), 1)
    lr = scaled_lr(args.blr, args.batch_size, args.accum_iter, world)
    schedule = warmup_half_cosine(
        lr, args.warmup_epochs, args.epochs, steps_per_epoch, args.min_lr
    )
    tx = mae_pretrain_optimizer(params, schedule, args.weight_decay)
    state = TrainState.create(params, tx)
    start_epoch = 0
    resume = args.resume
    if resume is None and args.auto_resume:
        from pathlib import Path as _P

        ckpts = sorted(
            _P(args.output_dir).glob("checkpoint-*"),
            key=lambda p: int(p.name.split("-")[-1]),
        )
        resume = str(ckpts[-1]) if ckpts else None
    if resume:
        state, meta = restore_checkpoint(resume, state_template=state)
        start_epoch = int(meta.get("epoch", -1)) + 1
        print(f"resumed from {resume} at epoch {start_epoch}")
        if ep_mesh is not None:
            # restore yields host arrays: re-pin the TP/EP/FSDP layout on
            # params AND Adam moments (parallel.repin_state)
            import functools

            from textmae_tpu.parallel import (
                repin_state,
                shard_moe_params,
                shard_params,
                shard_params_fsdp,
                shard_params_tp_ep,
            )

            tp_w = max(args.tensor_parallel, 1)
            if args.fsdp:
                resharder = functools.partial(
                    shard_params_fsdp,
                    min_size=args.fsdp_min_size,
                    tp_axis="model" if tp_w > 1 else None,
                )
            elif tp_w > 1 and args.expert_parallel > 1:
                resharder = shard_params_tp_ep
            elif args.expert_parallel > 1:
                resharder = shard_moe_params
            else:
                resharder = shard_params
            state = repin_state(state, tx, ep_mesh, resharder)

    if args.pipeline_stages > 1:
        from textmae_tpu.train.mae_engine import make_pipelined_mae_pretrain_step

        if jax.process_count() > 1:
            raise SystemExit(
                "--pipeline_stages is a single-process (all-local-devices) "
                "feature for now: the per-process data loading below feeds "
                "per-host batches, which a cross-host pipe/data mesh would "
                "silently mis-shard. Use cli.launch multi-process DP without "
                "pipelining, or run the pipelined job on one host."
            )
        # DP x PP (x TP): leftover devices become a "data" axis (batch
        # sharded over it) while stages pipeline over "pipe" and, with
        # --tensor_parallel > 1, heads/hidden shard over "model" inside
        # each stage
        tp = max(args.tensor_parallel, 1)
        dp = max(len(jax.devices()) // (args.pipeline_stages * tp), 1)
        axes = {"pipe": args.pipeline_stages}
        if tp > 1:
            axes["model"] = tp
        if dp > 1:
            axes = {"data": dp, **axes}
        mesh = make_mesh(
            axes, devices=jax.devices()[: dp * args.pipeline_stages * tp]
        )
        step = make_pipelined_mae_pretrain_step(
            model, tx, mesh, args.mask_ratio,
            num_microbatches=args.microbatches,
            batch_axis="data" if dp > 1 else None,
            tp_axis="model" if tp > 1 else None,
            sequence_parallel=(
                "auto" if args.sequence_parallel and tp > 1 else False
            ),
        )
    else:
        mesh = ep_mesh if ep_mesh is not None else make_mesh()
        step = make_mae_pretrain_step(model, tx, args.mask_ratio)
    writer = ScalarWriter(args.log_dir if jax.process_index() == 0 else None)
    step_rng = jax.random.PRNGKey(args.seed ^ 0xAE)

    print(f"lr={lr:.2e} steps/epoch={steps_per_epoch} world={world}")
    for epoch in range(start_epoch, args.epochs):
        logger = MetricLogger()
        it = class_batch_iterator(
            dataset, args.batch_size, seed=args.seed, epoch=epoch,
            num_threads=args.num_workers,
            shard_index=jax.process_index(), shard_count=world,
        )
        for imgs, _ in logger.log_every(it, args.print_freq, f"Epoch: [{epoch}]"):
            # shard over the "data" axis when the mesh has one (a pipe-only
            # mesh replicates the batch; microbatches flow through "pipe")
            imgs = jnp.asarray(imgs)
            if "data" in mesh.shape:
                imgs = shard_batch(imgs, mesh)
            state, metrics = step(state, imgs, step_rng)
            loss = float(metrics["loss"])
            if not math.isfinite(loss):  # NaN abort (engine_pretrain.py:52-54)
                raise RuntimeError(f"Loss is {loss}, stopping training")
            logger.update(loss=loss)
        writer.add_scalar("train/loss", logger.meters["loss"].global_avg, epoch)
        writer.flush()
        if epoch % args.save_every == 0 or epoch == args.epochs - 1:
            save_checkpoint(args.output_dir, f"checkpoint-{epoch}", state,
                            {"epoch": epoch, "args": vars(args)})

    writer.close()


if __name__ == "__main__":
    main()
