"""MAE-pretrain an encoder/decoder on Kodak crops, for MCM initialization.

The reference workflow initializes MCM from an MAE-pretrained checkpoint
(setup.sh:21-22 downloads mae_visualize_vit_large_ganloss.pth; training.py:163
loads it — note the shipped code has the actual load_state_dict commented out
at training.py:175, so the *shipped* reference trains from scratch). That
checkpoint is not downloadable in this zero-egress environment, so this
script reproduces the workflow with what IS here: pretrain our flax MAE-base
(models/mae.py — dims exactly match the MCM towers: 768/12/12 encoder,
512/8/16 decoder) with random 75%-masking on random crops of the non-holdout
Kodak images, then hand the npz to examples/rd_sweep.py --mae-init to seed
the MCM towers (train/checkpoint.py mae_flax_to_mcm + merge_pretrained).

Inputs are ImageNet-normalized — the distribution the downstream MCM trains
on (utils/dataloader.py:61).
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

DEFAULT_HOLDOUT = "kodim20,kodim23"  # keep in lockstep with rd_sweep/rd_eval


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=60000)
    p.add_argument("--holdout", type=str, default=DEFAULT_HOLDOUT,
                   help="comma-separated image stems EXCLUDED from "
                        "pretraining; recorded in the npz meta so "
                        "rd_sweep.py --mae-init can reject a leaky split")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--pool", type=int, default=3072)
    p.add_argument("--mask-ratio", type=float, default=0.75)
    p.add_argument("--blr", type=float, default=1.5e-4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--save", type=str, required=True, help="output npz")
    p.add_argument("--ckpt-dir", type=str, default=None,
                   help="periodic checkpoints + auto-resume (wedged-tunnel "
                        "recovery, same contract as rd_sweep.py)")
    p.add_argument("--eval-every", type=int, default=10000)
    p.add_argument("--flip", action="store_true",
                   help="random horizontal-flip augmentation (mirror-"
                        "equivariant scores, data/crops.py)")
    p.add_argument("--rrc", type=str, default=None, metavar="LO,HI",
                   help="MAE-style RandomResizedCrop: pool crops sample a "
                        "uniform area fraction in [LO,HI] of the source and "
                        "resize to 224 (e.g. 0.2,1.0 — the published MAE "
                        "pretrain augmentation); default: fixed 224 crops")
    p.add_argument("--gan", action="store_true",
                   help="GAN-loss pretrain (the reference init's recipe "
                        "shape, setup.sh:21-22 mae_visualize_*_ganloss): "
                        "raw-pixel masked MSE + hinge adversarial loss from "
                        "a PatchGAN critic on the composite reconstruction "
                        "(train/gan_engine.py). Implies norm_pix_loss=False")
    p.add_argument("--gan-weight", type=float, default=0.1,
                   help="adversarial term weight in the generator objective")
    p.add_argument("--gan-lr", type=float, default=1e-4,
                   help="discriminator Adam learning rate")
    p.add_argument("--init", type=str, default=None,
                   help="warm-start the MAE from a params npz (e.g. the "
                        "committed mae_kodak_rrc200k — GAN-FINETUNE like the "
                        "published ganloss checkpoint, which finetunes a "
                        "trained MAE)")
    p.add_argument("--debug-tiny", action="store_true")
    args = p.parse_args()

    import jax

    if args.debug_tiny:
        jax.config.update("jax_platforms", "cpu")

    from textmae_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from textmae_tpu.data.crops import CropPool
    from textmae_tpu.data.paths import find_kodak
    from textmae_tpu.models import mae as mae_models
    from textmae_tpu.train import TrainState
    from textmae_tpu.train.checkpoint import save_params_npz
    from textmae_tpu.train.mae_engine import make_mae_pretrain_step
    from textmae_tpu.train.schedules import (
        mae_pretrain_optimizer,
        scaled_lr,
        warmup_half_cosine,
    )

    kodak = find_kodak()
    if kodak is None:
        raise SystemExit("no Kodak directory found")
    holdout = {n.strip() for n in args.holdout.split(",") if n.strip()}
    train_files = [f for f in sorted(kodak.glob("*.png")) if f.stem not in holdout]
    print(f"pretraining on {len(train_files)} images from {kodak}", flush=True)
    scale_range = None
    if args.rrc:
        lo, hi = (float(v) for v in args.rrc.split(","))
        scale_range = (lo, hi)
    pool = CropPool(train_files, args.pool, 224, seed=args.seed, verbose=True,
                    scale_range=scale_range)

    # GAN mode predicts raw pixels (the visualize/ganloss model family);
    # norm_pix targets would make the composite image meaningless
    norm_pix = not args.gan
    if args.debug_tiny:
        model = mae_models.MaskedAutoencoderViT(
            mae_models.MAEConfig(
                embed_dim=32, depth=2, num_heads=2,
                decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2,
                use_pallas=False, norm_pix_loss=norm_pix,
            )
        )
    else:
        model = mae_models.mae_vit_base_patch16(norm_pix_loss=norm_pix)

    rng = jax.random.PRNGKey(args.seed)
    sample = jnp.zeros((2, 3, 224, 224), jnp.float32)
    params = jax.jit(
        lambda r: model.init({"params": r, "mask": r}, sample, args.mask_ratio)
    )(rng)["params"]

    # steps-based warmup+half-cosine (main_pretrain.py's epoch schedule with
    # 1k-step pseudo-epochs)
    spe = 1000
    lr = scaled_lr(args.blr, args.batch, 1, 1)
    schedule = warmup_half_cosine(
        lr, max(args.steps // (20 * spe), 1), max(args.steps // spe, 1), spe, 0.0
    )
    if args.init:
        from textmae_tpu.train.checkpoint import load_params_npz

        params = load_params_npz(args.init)
        print(f"warm-started MAE params from {args.init}", flush=True)

    tx = mae_pretrain_optimizer(params, schedule, weight_decay=0.05)
    state = TrainState.create(params, tx)
    d_state = None
    if args.gan:
        import optax

        from textmae_tpu.models.discriminator import (
            DiscriminatorConfig, PatchDiscriminator,
        )
        from textmae_tpu.train.gan_engine import make_mae_gan_step

        disc = PatchDiscriminator(
            DiscriminatorConfig(channels=(16, 32) if args.debug_tiny else (64, 128, 256))
        )
        d_params = jax.jit(lambda r: disc.init(r, sample)["params"])(
            jax.random.PRNGKey(args.seed + 1)
        )
        d_tx = optax.adam(args.gan_lr, b1=0.5, b2=0.9)  # standard GAN betas
        d_state = TrainState.create(d_params, d_tx)
        gan_step = make_mae_gan_step(
            model, disc, tx, d_tx, mask_ratio=args.mask_ratio,
            adv_weight=args.gan_weight,
        )

        def step(state, bi, rng, _pair=[d_state]):
            s, _pair[0], m = gan_step(state, _pair[0], bi, rng)
            return s, m
    else:
        step = make_mae_pretrain_step(model, tx, mask_ratio=args.mask_ratio)

    start_step = 0
    if args.ckpt_dir:
        from textmae_tpu.train.checkpoint import (
            latest_step_checkpoint, restore_checkpoint, save_checkpoint)

        newest = latest_step_checkpoint(args.ckpt_dir)
        if newest is not None:
            state, cmeta = restore_checkpoint(str(newest), state_template=state)
            state = jax.device_put(state)
            start_step = int(cmeta["step"])
            print(f"resumed from {newest} at step {start_step}", flush=True)

    gather = pool.to_device()
    t0 = time.time()
    for it in range(start_step, args.steps):
        r = np.random.default_rng(args.seed * 999983 + it)
        idx = r.integers(0, args.pool, args.batch)
        flip = jnp.asarray(r.random(args.batch) < 0.5) if args.flip else None
        bi, _ = gather(jnp.asarray(idx), flip)
        state, m = step(state, bi, rng)
        if it % max(args.steps // 20, 1) == 0:
            loss = float(m["loss"])
            if not np.isfinite(loss):
                raise SystemExit(f"NaN/inf loss at step {it}, aborting")
            print(f"step {it}: loss={loss:.4f} ({time.time() - t0:.0f}s)", flush=True)
        if args.ckpt_dir and args.eval_every and (it + 1) % args.eval_every == 0:
            save_checkpoint(Path(args.ckpt_dir), f"step{it + 1}", state,
                            {"step": it + 1})
    print(f"{args.steps} steps in {time.time() - t0:.0f}s", flush=True)

    path = save_params_npz(
        Path(args.save), jax.device_get(state.params),
        meta={
            "model": "mae_vit_base_patch16" if not args.debug_tiny else "tiny",
            "mask_ratio": args.mask_ratio,
            "steps": args.steps,
            "norm_pix_loss": norm_pix,
            "normalize": True,
            "holdout": ",".join(sorted(holdout)),
            **(
                {"loss": "ganloss", "gan_weight": args.gan_weight,
                 "init": str(args.init or "")}
                if args.gan else {}
            ),
        },
    )
    print(f"saved {path}", flush=True)


if __name__ == "__main__":
    main()
