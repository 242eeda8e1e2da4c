"""Mask-ratio R-D sweep under the reference's eval protocol (VERDICT r2 #2).

Reproduces the *shape* of the reference's published R-D curve
(/root/reference/README.md:6-7 -> assets/1-2.png: 0.02 bpp / 22.44 dB at
75% masked, 0.07 / 25.6 at 50%, 0.15 / 27.8 at 25% for the airplane image;
0.018/22.2, 0.06/26.1, 0.12/27.5 for kodim23) in the zero-egress
environment:

  * trains one MCM per mask ratio (``--keep`` 49 / 100 / 144) with
    ``canonical_keep_order=False`` — the reference's token ordering, whose
    ids_restore side info is a full 196-permutation (testing.py:73-76);
  * training data is random 224x224 crops of the 22 NON-holdout full-res
    Kodak images (the zero-egress stand-in for the reference's training
    set; the MAE-pretrained init of setup.sh:21-22 is not downloadable
    here, so absolute numbers carry a from-scratch gap that the report
    quantifies);
  * evaluation is on the HELD-OUT images (default kodim20 "airplane" +
    kodim23 "parrots" — exactly the two images the reference publishes
    per-image points for), resized to 224 like the reference test
    transform, through the real rANS codec, with the reference's bpp
    accounting: bitstream bytes x 8 plus entropy-coded ids_restore side
    info, over the pixel count (testing.py:88-89).

Holding the eval images out is what makes the sweep informative: on unseen
content the y/z rate cannot collapse to the memorized-near-zero regime that
made the round-1 fixed-set sweep rate-degenerate (VERIFICATION.md), so both
axes of the (bpp, PSNR) trend are exercised.

Writes a JSON report per run (committed under reports/) and a f16 npz
checkpoint. Aggregate the three runs with ``--tabulate``.
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

DEFAULT_HOLDOUT = "kodim20,kodim23"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--keep", type=int, required=True, help="kept patches: 49/100/144")
    p.add_argument("--lmbda", type=float, default=1.0)
    p.add_argument("--steps", type=int, default=40000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--pool", type=int, default=3072, help="precomputed crop pool size")
    p.add_argument("--holdout", type=str, default=DEFAULT_HOLDOUT)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-every", type=int, default=10000)
    p.add_argument("--report", type=str, default=None, help="JSON report path")
    p.add_argument("--save", type=str, default=None, help="f16 npz checkpoint path")
    p.add_argument("--debug-tiny", action="store_true",
                   help="tiny model dims (CPU smoke test of the harness only)")
    p.add_argument("--ckpt-dir", type=str, default=None,
                   help="checkpoint at every --eval-every mark and AUTO-RESUME "
                        "from the newest checkpoint here (wedged-tunnel "
                        "recovery: a watchdog can kill + relaunch losing at "
                        "most one eval interval)")
    p.add_argument("--canonical-order", action="store_true",
                   help="train with this framework's canonical (ascending-"
                        "index) kept-token order instead of the reference's "
                        "score ordering — the committed-checkpoint / serving "
                        "convention (subset-coded side info)")
    p.add_argument("--flip", action="store_true",
                   help="random horizontal-flip augmentation (mirror-"
                        "equivariant scores, data/crops.py)")
    p.add_argument("--mae-init", type=str, default=None,
                   help="npz of flax-MAE params (examples/mae_pretrain_kodak.py) "
                        "to seed the MCM encoder/decoder towers — the "
                        "reference's MAE-init workflow (training.py:163-176, "
                        "shipped commented-out) reproduced in-framework")
    args = p.parse_args()

    import jax

    if args.debug_tiny:
        # harness smoke runs must not touch (or contend for) the real chip;
        # the axon plugin overrides JAX_PLATFORMS, so force via config
        jax.config.update("jax_platforms", "cpu")

    from textmae_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    from PIL import Image

    from textmae_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD
    from textmae_tpu.data.paths import find_kodak
    from textmae_tpu.data.score_maps import total_score_for_image
    from textmae_tpu.eval import MCMCodec, compute_metrics
    from textmae_tpu.eval.harness import code_side_info
    from textmae_tpu.models.mcm import MCM, MCMConfig
    from textmae_tpu.train import TrainState, configure_optimizers, make_train_step

    kodak = find_kodak()
    if kodak is None:
        raise SystemExit("no Kodak directory found")
    holdout = {n.strip() for n in args.holdout.split(",") if n.strip()}
    if args.mae_init:
        # leakage guard, before any compile: the seeding MAE must not have
        # trained on this sweep's holdout images (mae_pretrain_kodak.py
        # records its split in the npz meta); a contaminated init silently
        # inflates the reported generalization numbers
        from textmae_tpu.train.checkpoint import load_npz_meta

        mae_holdout = load_npz_meta(Path(args.mae_init)).get("holdout")
        if mae_holdout is not None:
            missing = holdout - {
                n.strip() for n in str(mae_holdout).split(",") if n.strip()
            }
            if missing:
                raise SystemExit(
                    f"--mae-init {args.mae_init} was pretrained ON this "
                    f"sweep's holdout images {sorted(missing)} (its own "
                    f"holdout was '{mae_holdout}'); re-pretrain with "
                    f"mae_pretrain_kodak.py --holdout {args.holdout}"
                )
    files = sorted(kodak.glob("*.png"))
    train_files = [f for f in files if f.stem not in holdout]
    eval_files = [f for f in files if f.stem in holdout]
    print(f"train on {len(train_files)} images, hold out "
          f"{[f.stem for f in eval_files]} from {kodak}", flush=True)

    from textmae_tpu.data.crops import CropPool

    pool = CropPool(train_files, args.pool, 224, seed=args.seed, verbose=True)
    mean = IMAGENET_MEAN.reshape(1, 1, 1, 3).astype(np.float32)
    std = IMAGENET_STD.reshape(1, 1, 1, 3).astype(np.float32)

    order = bool(args.canonical_order)
    if args.debug_tiny:
        cfg = MCMConfig(
            num_keep_patches=args.keep, canonical_keep_order=order,
            encoder_embed_dim=32, encoder_depth=2, encoder_num_heads=2,
            decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2,
            latent_depth=24, hyperprior_depth=16, num_slices=4,
            use_pallas=False,
        )
    else:
        cfg = MCMConfig(num_keep_patches=args.keep, canonical_keep_order=order)
    model = MCM(cfg)
    rng = jax.random.PRNGKey(args.seed)
    sample = jnp.zeros((1, 3, 224, 224), jnp.float32)
    sscore = jnp.zeros((1, cfg.num_patches), jnp.float32)
    variables = jax.jit(
        lambda k: model.init(
            {"params": k, "noise": k}, sample, sscore,
            training=False, compute_loss=False,
        )
    )(rng)
    if args.mae_init:
        from textmae_tpu.train.checkpoint import (
            load_params_npz,
            mae_flax_to_mcm,
            merge_pretrained,
        )

        mae_params = load_params_npz(Path(args.mae_init))
        variables = dict(variables)
        variables["params"] = merge_pretrained(
            variables["params"], mae_flax_to_mcm(mae_params)
        )
        print(f"initialized MCM towers from {args.mae_init}", flush=True)

    tx = configure_optimizers(variables["params"])
    state = TrainState.create(variables["params"], tx)
    step = make_train_step(model, tx, lmbda=args.lmbda)

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

    def save_mid(tag: int):
        if args.ckpt_dir:
            save_checkpoint(Path(args.ckpt_dir), f"step{tag}", state, {"step": tag})

    # held-out eval inputs: resized-to-224 RGB + canonical full-res gray score
    eval_raw, eval_norm, eval_scores = [], [], []
    for f in eval_files:
        with Image.open(f) as im:
            im = im.convert("RGB")
            g = np.asarray(im.convert("L"), np.uint8)
            r = np.asarray(im.resize((224, 224), Image.BICUBIC), np.float32) / 255.0
        eval_raw.append(r)
        eval_scores.append(total_score_for_image(g))
    eval_raw = np.stack(eval_raw)
    eval_norm = (eval_raw - mean) / std
    eval_raw_d = jnp.asarray(eval_raw.transpose(0, 3, 1, 2))
    eval_norm_d = jnp.asarray(eval_norm.transpose(0, 3, 1, 2))
    eval_scores_d = jnp.asarray(np.stack(eval_scores))

    num_px = 224 * 224

    def eval_holdout(params, tag, raw_quirk=False):
        """raw_quirk=True: the reference testing path's exact input handling —
        UNNORMALIZED pixels into a model trained on normalized ones
        (dataloader.py:57-73 normalizes train/val but not test)."""
        codec = MCMCodec(model, {"params": params})
        codec.update(force=True)
        per_image = {}
        mean_d = jnp.asarray(IMAGENET_MEAN.reshape(1, 3, 1, 1))
        std_d = jnp.asarray(IMAGENET_STD.reshape(1, 3, 1, 1))
        inp = eval_raw_d if raw_quirk else eval_norm_d
        t0 = time.time()
        streams, ids_restore = codec.compress(inp, eval_scores_d)
        enc_t = time.time() - t0
        payloads, ids = code_side_info(
            np.asarray(ids_restore), cfg.num_keep_patches, cfg.canonical_keep_order
        )
        t0 = time.time()
        x_hat = codec.decompress(streams, ids)
        dec_t = time.time() - t0
        x_px = x_hat if raw_quirk else x_hat * std_d + mean_d
        for i, f in enumerate(eval_files):
            m = compute_metrics(eval_raw_d[i : i + 1], x_px[i : i + 1])
            # reference bpp accounting (testing.py:88-89): bitstream bytes x 8
            # + entropy-coded ids_restore side info, over the pixel count
            sbits = streams[i].num_bits()
            pbits = len(payloads[i]) * 8
            per_image[f.stem] = {
                "psnr": round(float(m["psnr"]), 3),
                "ms_ssim": round(float(m["ms-ssim"]), 5),
                "bpp": round((sbits + pbits) / num_px, 5),
                "bpp_streams": round(sbits / num_px, 5),
                "bpp_side_info": round(pbits / num_px, 5),
            }
        agg = {
            k: round(float(np.mean([v[k] for v in per_image.values()])), 5)
            for k in next(iter(per_image.values()))
        }
        agg.update(encoding_time=enc_t / len(eval_files),
                   decoding_time=dec_t / len(eval_files))
        print(tag, json.dumps({"mean": agg, "per_image": per_image}), flush=True)
        return per_image, agg

    if start_step == 0:
        eval_holdout(state.params, "BEFORE:")

    # device-resident pool: upload the uint8 crops once and gather/normalize
    # each batch on device — per-step H2D is just the index vector (a full
    # float batch is ~4.8 MB, ~240 ms over the remote-attach tunnel, 4x the
    # train step itself; measured in the round-3 keep-49 run)
    gather = pool.to_device()
    t0 = time.time()
    for it in range(start_step, args.steps):
        # step-keyed sampling: a resumed run draws the same batch sequence
        r = np.random.default_rng(args.seed * 1000003 + it)
        idx = r.integers(0, args.pool, args.batch)
        flip = jnp.asarray(r.random(args.batch) < 0.5) if args.flip else None
        bi, bs = gather(jnp.asarray(idx), flip)
        state, m = step(state, {"imgs": bi, "scores": bs}, rng)
        if it % max(args.steps // 20, 1) == 0:
            print(
                f"step {it}: loss={float(m['loss']):.4f} bpp={float(m['bpp_loss']):.4f} "
                f"ssim={float(m['ssim_loss']):.4f} l1={float(m['L1_loss']):.4f} "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )
        if args.eval_every and (it + 1) % args.eval_every == 0:
            save_mid(it + 1)
            if it + 1 < args.steps:
                eval_holdout(state.params, f"EVAL@{it + 1}:")
    train_s = time.time() - t0
    print(f"{args.steps} steps in {train_s:.0f}s", flush=True)
    per_image, agg = eval_holdout(state.params, "AFTER:")
    per_image_raw, agg_raw = eval_holdout(state.params, "AFTER(raw-quirk):",
                                          raw_quirk=True)

    if args.save:
        from textmae_tpu.train.checkpoint import save_params_npz

        path = save_params_npz(
            Path(args.save), jax.device_get(state.params),
            meta={
                "normalize": True,
                "num_keep_patches": args.keep,
                "canonical_keep_order": order,
                "lmbda": args.lmbda,
                "steps": args.steps,
                # so rd_eval --set train/holdout labels by THIS run's split,
                # not its hardcoded default
                "holdout": ",".join(sorted(holdout)),
            },
        )
        print(f"saved {path}", flush=True)
    if args.report:
        report = {
            "config": {
                "keep": args.keep,
                "masked_pct": round(100 * (1 - args.keep / 196), 1),
                "canonical_keep_order": order,
                "lmbda": args.lmbda,
                "steps": args.steps,
                "batch": args.batch,
                "pool": args.pool,
                "train_images": [f.stem for f in train_files],
                "holdout": sorted(holdout),
                "seed": args.seed,
                "flip_augmentation": bool(args.flip),
                "train_seconds": round(train_s, 1),
                "init": (
                    f"MCM towers from MAE-pretrained {args.mae_init} "
                    "(in-framework reproduction of the reference's "
                    "training.py:163-176 workflow)"
                    if args.mae_init
                    else "from scratch (no MAE-pretrained encoder; "
                         "setup.sh:21-22 weights not downloadable here; note "
                         "the shipped reference also trains from scratch — "
                         "its load_state_dict is commented out, "
                         "training.py:175)"
                ),
            },
            "protocol": "holdout eval at 224, real rANS codec, reference bpp "
                        "accounting (bitstream bytes x 8 + permutation-coded "
                        "ids_restore side info) / 224^2 px (testing.py:88-89)",
            "per_image": per_image,
            "mean": agg,
            "raw_quirk": {
                "note": "reference testing.py exact input handling: "
                        "unnormalized test pixels (dataloader.py:57-73)",
                "per_image": per_image_raw,
                "mean": agg_raw,
            },
        }
        Path(args.report).parent.mkdir(parents=True, exist_ok=True)
        Path(args.report).write_text(json.dumps(report, indent=1))
        print(f"wrote {args.report}", flush=True)


if __name__ == "__main__":
    main()
