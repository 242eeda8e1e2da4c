"""MAE finetuning CLI (classification head on pretrained encoder).

Parity with /root/reference/models/MAE/main_finetune.py:42-356: ViT classifier
init from an MAE checkpoint (head dropped, pos-embed interpolated), mixup/
cutmix + label smoothing, AdamW with BEiT layer-wise lr decay, warmup+cosine,
top-1/top-5 eval.
"""
from __future__ import annotations

import argparse
import math

import jax
import jax.numpy as jnp
import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="MAE finetune (TPU)")
    p.add_argument("--data_path", required=True, help="root with train/ and val/")
    p.add_argument("--model", default="vit_large_patch16",
                   choices=["vit_base_patch16", "vit_large_patch16", "vit_huge_patch14"])
    p.add_argument("--nb_classes", type=int, default=1000)
    p.add_argument("--finetune", default=None,
                   help="pretrained MAE/ViT checkpoint (torch .pth or this "
                        "framework's .npz distribution file)")
    p.add_argument("--moe_experts", type=int, default=0,
                   help="MoE encoder blocks — must mirror the pretrain "
                        "config so blocks_i param trees line up "
                        "(cli.mae_pretrain --moe_experts)")
    p.add_argument("--moe_top_k", type=int, default=1)
    p.add_argument("--moe_every", type=int, default=2)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--warmup_epochs", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--accum_iter", type=int, default=1)
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--blr", type=float, default=1e-3)
    p.add_argument("--min_lr", type=float, default=1e-6)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--layer_decay", type=float, default=0.75)
    p.add_argument("--smoothing", type=float, default=0.1)
    p.add_argument("--mixup", type=float, default=0.8)
    p.add_argument("--cutmix", type=float, default=1.0)
    p.add_argument("--clip_grad", type=float, default=None)
    p.add_argument("--drop_path", type=float, default=0.1,
                   help="stochastic depth rate (main_finetune.py default)")
    p.add_argument("--global_pool", action="store_true", default=True)
    p.add_argument("--cls_token", dest="global_pool", action="store_false")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_workers", type=int, default=10)
    p.add_argument("--output_dir", default="./out_finetune")
    p.add_argument("--log_dir", default=None)
    p.add_argument("--resume", default=None)
    p.add_argument("--eval", action="store_true", help="evaluation only")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--print_freq", type=int, default=20)
    return p


def evaluate(eval_step, params, dataset, batch_size, num_workers):
    from textmae_tpu.data.classification import class_batch_iterator

    totals = {"correct1": 0, "correct5": 0, "loss": 0.0, "count": 0}
    for imgs, labels in class_batch_iterator(
        dataset, batch_size, shuffle=False, drop_last=False, num_threads=num_workers
    ):
        m = eval_step(params, jnp.asarray(imgs), jnp.asarray(labels))
        totals["correct1"] += int(m["correct1"])
        totals["correct5"] += int(m["correct5"])
        totals["loss"] += float(m["loss"]) * int(m["count"])
        totals["count"] += int(m["count"])
    c = max(totals["count"], 1)
    acc1, acc5 = 100.0 * totals["correct1"] / c, 100.0 * totals["correct5"] / c
    loss = totals["loss"] / c
    # exact reference output format (engine_finetune.py:126-129 / FINETUNE.md)
    print(f"* Acc@1 {acc1:.3f} Acc@5 {acc5:.3f} loss {loss:.3f}")
    return {"acc1": acc1, "acc5": acc5, "loss": loss}


def load_finetune_checkpoint(params, path, model_cfg):
    """Pretrained MAE/ViT checkpoint -> classifier params: drop mismatched
    head, interpolate pos_embed (main_finetune.py:245-262).

    Accepts the torch layouts the reference consumes AND this framework's
    own flat ``.npz`` distribution files (save_params_npz — e.g. an MAE
    pretrained with cli.mae_pretrain, including MoE encoders): the flax tree
    merges directly (decoder_* keys skip because the classifier has no such
    keys; the MAE's sincos pos_embed is not a param, so the classifier keeps
    its learnable init)."""
    from textmae_tpu.ops.pos_embed import interpolate_pos_embed
    from textmae_tpu.train.checkpoint import (
        _load_torch_state_dict,
        mae_torch_to_flax,
        merge_pretrained,
    )

    from pathlib import Path as _P

    if _P(path).suffix == ".npz":
        from textmae_tpu.train.checkpoint import load_params_npz

        return merge_pretrained(params, load_params_npz(path), strict_shapes=False)

    sd = _load_torch_state_dict(path)
    converted = mae_torch_to_flax(sd, encoder_prefix="blocks", decoder_prefix="__drop")
    converted = {k: v for k, v in converted.items() if not k.startswith("__drop")}
    converted.pop("decoder_embed", None)
    converted.pop("decoder_norm", None)
    converted.pop("decoder_pred", None)
    converted.pop("mask_token", None)
    # encoder_embed -> patch_embed, encoder_norm -> norm naming for the classifier
    if "encoder_embed" in converted:
        converted["patch_embed"] = converted.pop("encoder_embed")
    if "encoder_norm" in converted:
        converted["norm"] = converted.pop("encoder_norm")
    if "pos_embed" in sd:
        new_grid = int(round((params["pos_embed"].shape[1] - 1) ** 0.5))
        converted["pos_embed"] = np.asarray(
            interpolate_pos_embed(jnp.asarray(sd["pos_embed"]), new_grid)
        )
    return merge_pretrained(params, converted, strict_shapes=False)


def main(argv=None):
    args = build_parser().parse_args(argv)

    from textmae_tpu.data.classification import ImageFolderDataset, class_batch_iterator
    from textmae_tpu.models import vit as vit_models
    from textmae_tpu.parallel import init_distributed, make_mesh, shard_batch
    from textmae_tpu.train import MetricLogger, TrainState
    from textmae_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from textmae_tpu.train.logger import ScalarWriter
    from textmae_tpu.train.mae_engine import (
        make_classifier_eval_step,
        make_classifier_train_step,
    )
    from textmae_tpu.train.schedules import (
        mae_finetune_optimizer,
        scaled_lr,
        warmup_half_cosine,
    )

    init_distributed()
    # per-host seed only for data augmentation; params/step rng are
    # replicated SPMD inputs and must match on every host
    host_seed = args.seed + jax.process_index()
    factory = getattr(vit_models, args.model)
    model = factory(
        num_classes=args.nb_classes,
        global_pool=args.global_pool,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        img_size=args.input_size,
        drop_path=args.drop_path,
        moe_experts=args.moe_experts,
        moe_top_k=args.moe_top_k,
        moe_every=args.moe_every,
    )

    rng = jax.random.PRNGKey(args.seed)
    sample = jnp.zeros((2, 3, args.input_size, args.input_size), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, sample))(rng)
    params = variables["params"]
    if args.finetune:
        params = load_finetune_checkpoint(params, args.finetune, model.config)
        print(f"loaded pretrained checkpoint {args.finetune}")

    val_ds = ImageFolderDataset(f"{args.data_path}/val", args.input_size, train=False)
    eval_step = make_classifier_eval_step(model)
    if args.eval:
        evaluate(eval_step, params, val_ds, args.batch_size, args.num_workers)
        return

    train_ds = ImageFolderDataset(f"{args.data_path}/train", args.input_size, train=True, seed=host_seed)
    world = jax.process_count()
    steps_per_epoch = max(len(train_ds) // (args.batch_size * world), 1)
    lr = scaled_lr(args.blr, args.batch_size, args.accum_iter, world)
    schedule = warmup_half_cosine(lr, args.warmup_epochs, args.epochs, steps_per_epoch, args.min_lr)
    tx = mae_finetune_optimizer(
        params, schedule, args.weight_decay, args.layer_decay,
        num_layers=model.config.depth, clip_grad=args.clip_grad,
    )
    state = TrainState.create(params, tx)
    start_epoch = 0
    resumed_acc = 0.0
    if args.resume:
        state, meta = restore_checkpoint(args.resume, state_template=state)
        start_epoch = int(meta.get("epoch", -1)) + 1
        # don't let the first post-resume epoch overwrite checkpoint-best
        resumed_acc = float(meta.get("acc1", 0.0))

    mesh = make_mesh()
    step = make_classifier_train_step(
        model, tx, args.nb_classes, args.smoothing,
        mixup=args.mixup > 0, mixup_alpha=args.mixup, cutmix_alpha=args.cutmix,
    )
    writer = ScalarWriter(args.log_dir if jax.process_index() == 0 else None)
    step_rng = jax.random.PRNGKey(args.seed ^ 0xF1)
    best_acc = resumed_acc

    for epoch in range(start_epoch, args.epochs):
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
        writer.add_scalar("train/loss", logger.meters["loss"].global_avg, epoch)
        stats = evaluate(eval_step, state.params, val_ds, args.batch_size, args.num_workers)
        writer.add_scalar("val/acc1", stats["acc1"], epoch)
        if stats["acc1"] > best_acc:
            best_acc = stats["acc1"]
            save_checkpoint(args.output_dir, "checkpoint-best", state,
                            {"epoch": epoch, "acc1": stats["acc1"]})
        writer.flush()
    writer.close()


if __name__ == "__main__":
    main()
