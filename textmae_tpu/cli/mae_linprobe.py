"""MAE linear-probe CLI (frozen backbone + linear head, LARS).

Parity with /root/reference/models/MAE/main_linprobe.py:116-316: backbone
frozen, BatchNorm-free affine-normalized head (our head applies LayerNorm-less
feature standardization via stop-gradient statistics, matching the intent of
the reference's affine-less BatchNorm at main_linprobe.py:222), LARS
optimizer, no mixup/smoothing, weaker augmentation (RandomResizedCrop
scale=(0.08, 1.0) + flip).
"""
from __future__ import annotations

import argparse
import math

import jax
import jax.numpy as jnp


def build_parser():
    p = argparse.ArgumentParser(description="MAE linear probe (TPU)")
    p.add_argument("--data_path", required=True)
    p.add_argument("--model", default="vit_large_patch16",
                   choices=["vit_base_patch16", "vit_large_patch16", "vit_huge_patch14"])
    p.add_argument("--nb_classes", type=int, default=1000)
    p.add_argument("--finetune", default=None, help="pretrained checkpoint")
    p.add_argument("--moe_experts", type=int, default=0,
                   help="MoE encoder blocks — must mirror the pretrain "
                        "config so blocks_i param trees line up")
    p.add_argument("--moe_top_k", type=int, default=1)
    p.add_argument("--moe_every", type=int, default=2)
    p.add_argument("--epochs", type=int, default=90)
    p.add_argument("--warmup_epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--blr", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_workers", type=int, default=10)
    p.add_argument("--output_dir", default="./out_linprobe")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--print_freq", type=int, default=20)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from textmae_tpu.cli.mae_finetune import evaluate, load_finetune_checkpoint
    from textmae_tpu.data.classification import ImageFolderDataset, class_batch_iterator
    from textmae_tpu.models import vit as vit_models
    from textmae_tpu.parallel import init_distributed, make_mesh, shard_batch
    from textmae_tpu.train import MetricLogger, TrainState
    from textmae_tpu.train.checkpoint import save_checkpoint
    from textmae_tpu.train.mae_engine import (
        make_classifier_eval_step,
        make_classifier_train_step,
    )
    from textmae_tpu.train.schedules import linprobe_optimizer, scaled_lr, warmup_half_cosine

    init_distributed()
    # per-host seed only for data augmentation; params/step rng are
    # replicated SPMD inputs and must match on every host
    host_seed = args.seed + jax.process_index()
    # linear probe uses cls-token features, no global pool (main_linprobe.py:221)
    factory = getattr(vit_models, args.model)
    model = factory(
        num_classes=args.nb_classes, global_pool=False, img_size=args.input_size,
        moe_experts=args.moe_experts, moe_top_k=args.moe_top_k,
        moe_every=args.moe_every,
    )

    rng = jax.random.PRNGKey(args.seed)
    sample = jnp.zeros((2, 3, args.input_size, args.input_size), jnp.float32)
    params = jax.jit(lambda r: model.init(r, sample))(rng)["params"]
    if args.finetune:
        params = load_finetune_checkpoint(params, args.finetune, model.config)

    val_ds = ImageFolderDataset(f"{args.data_path}/val", args.input_size, train=False)
    eval_step = make_classifier_eval_step(model)
    if args.eval:
        evaluate(eval_step, params, val_ds, args.batch_size, args.num_workers)
        return

    train_ds = ImageFolderDataset(f"{args.data_path}/train", args.input_size, train=True, seed=host_seed)
    world = jax.process_count()
    steps_per_epoch = max(len(train_ds) // (args.batch_size * world), 1)
    lr = scaled_lr(args.blr, args.batch_size, 1, world)
    schedule = warmup_half_cosine(lr, args.warmup_epochs, args.epochs, steps_per_epoch)
    tx = linprobe_optimizer(schedule)
    state = TrainState.create(params, tx)

    mesh = make_mesh()
    step = make_classifier_train_step(
        model, tx, args.nb_classes, label_smoothing=0.0, mixup=False,
        frozen_backbone=True, moe_aux_weight=0.0,
    )
    step_rng = jax.random.PRNGKey(args.seed ^ 0x11)
    best_acc = 0.0
    for epoch in range(args.epochs):
        logger = MetricLogger()
        it = class_batch_iterator(
            train_ds, args.batch_size, seed=args.seed, epoch=epoch,
            num_threads=args.num_workers,
            shard_index=jax.process_index(), shard_count=world,
        )
        for imgs, labels in logger.log_every(it, args.print_freq, f"Epoch: [{epoch}]"):
            batch = shard_batch({"i": jnp.asarray(imgs), "l": jnp.asarray(labels)}, mesh)
            state, metrics = step(state, batch["i"], batch["l"], step_rng)
            loss = float(metrics["loss"])
            if not math.isfinite(loss):
                raise RuntimeError(f"Loss is {loss}, stopping training")
            logger.update(loss=loss)
        stats = evaluate(eval_step, state.params, val_ds, args.batch_size, args.num_workers)
        if stats["acc1"] > best_acc:
            best_acc = stats["acc1"]
            save_checkpoint(args.output_dir, "checkpoint-best", state,
                            {"epoch": epoch, "acc1": stats["acc1"]})


if __name__ == "__main__":
    main()
