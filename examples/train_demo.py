"""Train MCM on Kodak-24 and show the real-codec R-D metrics improving.

Measured on a single v5e chip (f32, batch 8, ~40-55ms/step, fresh random
init — no MAE-pretrained checkpoint available in the zero-egress
environment). Consistent-distribution eval (default; --eval-raw for the
reference's unnormalized-test quirk):

    --steps 400  --lmbda 1e-4 (canonical rate-dominated objective):
        loss 1.05 -> 0.34, real-bitstream bpp 0.32 -> 0.19
    --steps 150000 --lmbda 1.0 (in 3 resumed segments; ~70 min compute):
        Kodak-24 full-CLI eval (test_model --normalize, all 24 images):
        PSNR 37.74 dB / MS-SSIM 0.980 at 0.00659 bpp total.
        Trajectory at 75k/90k/105k/135k/150k (8-image eval):
        37.98/38.32/38.77/39.53/39.03 dB at ~0.0065 bpp.

This is the reference's own Quicktest.ipynb protocol (train on Kodak, test
on Kodak — memorization evidence, not generalization). Generalizing R-D at
the reference's published points additionally needs the MAE-pretrained
encoder init (setup.sh:21-22) and an ImageNet-scale train set.
NOTE: eval must reuse the SAME precomputed score artifact as training —
the threshold-based quadtree amplifies ±1 gray-level differences between
PIL/cv2 grayscale into different keep sets (VERIFICATION.md).
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--lmbda", type=float, default=1e-4)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--eval-n", type=int, default=8)
    p.add_argument("--eval-every", type=int, default=0,
                   help="run the real-codec eval every N steps (0 = only at the end)")
    p.add_argument("--save", type=str, default=None,
                   help="checkpoint directory: saves at the end / --eval-every marks")
    p.add_argument("--resume", type=str, default=None,
                   help="resume from a checkpoint saved by --save")
    p.add_argument("--save-npz", type=str, default=None,
                   help="also write the final params as a f16 npz with "
                        "__meta__ provenance (the in-repo distribution format)")
    p.add_argument("--eval-raw", action="store_true",
                   help="evaluate on unnormalized images (the reference "
                        "testing.py quirk); default evaluates on the training "
                        "distribution and de-normalizes for metrics")
    args = p.parse_args()

    import jax

    from textmae_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import load_images
    from textmae_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD
    from textmae_tpu.data.score_maps import total_score_for_image
    from textmae_tpu.eval import MCMCodec, inference
    from textmae_tpu.models.mcm import MCM, MCMConfig
    from textmae_tpu.train import TrainState, configure_optimizers, make_train_step

    imgs_np, grays = load_images()
    if grays is None:
        scores_np = np.random.default_rng(1).random((len(imgs_np), 196)).astype(np.float32)
    else:
        scores_np = np.stack([total_score_for_image(g) for g in grays])
    norm = (imgs_np - IMAGENET_MEAN) / IMAGENET_STD
    imgs_all = jnp.asarray(norm.transpose(0, 3, 1, 2))
    raw_all = jnp.asarray(imgs_np.transpose(0, 3, 1, 2))
    scores_all = jnp.asarray(scores_np)
    n = imgs_all.shape[0]

    cfg = MCMConfig()
    model = MCM(cfg)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda k: model.init(
            {"params": k, "noise": k}, imgs_all[:1], scores_all[:1],
            training=False, compute_loss=False,
        )
    )(rng)
    tx = configure_optimizers(variables["params"])
    state = TrainState.create(variables["params"], tx)
    start_step = 0
    if args.resume:
        from textmae_tpu.train.checkpoint import restore_checkpoint

        state, meta = restore_checkpoint(args.resume, state_template=state)
        state = jax.device_put(state)  # orbax restores host numpy arrays
        start_step = int(meta.get("demo_step", 0))
        print(f"resumed from {args.resume} at step {start_step}", flush=True)
    step = make_train_step(model, tx, lmbda=args.lmbda)

    def save(tag: int):
        if not args.save:
            return
        from textmae_tpu.train.checkpoint import save_checkpoint

        path = save_checkpoint(
            Path(args.save), f"demo_step{tag}", state, {"demo_step": tag}
        )
        print(f"saved {path}", flush=True)

    def eval_codec(params, tag):
        codec = MCMCodec(model, {"params": params})
        codec.update(force=True)
        k = args.eval_n
        if args.eval_raw:
            # reference testing.py quirk: eval feeds UNNORMALIZED images to a
            # model trained on ImageNet-normalized ones (dataloader.py:57-73
            # normalizes train/val but not test) — the distribution shift
            # caps PSNR regardless of how well the model trained
            res = inference(codec, raw_all[:k], scores_all[:k])
            res.pop("x_hat")
        else:
            # consistent eval: same input distribution as training; metrics
            # on the de-normalized reconstruction vs the raw pixels
            import time as _t

            from textmae_tpu.eval import compute_metrics
            from textmae_tpu.eval.harness import code_side_info

            t0 = _t.time()
            streams, ids_restore = codec.compress(imgs_all[:k], scores_all[:k])
            payloads, ids = code_side_info(
                ids_restore, cfg.num_keep_patches, cfg.canonical_keep_order
            )
            enc_t = _t.time() - t0
            t0 = _t.time()
            x_hat = codec.decompress(streams, ids)
            dec_t = _t.time() - t0
            mean = jnp.asarray(IMAGENET_MEAN.reshape(1, 3, 1, 1))
            std = jnp.asarray(IMAGENET_STD.reshape(1, 3, 1, 1))
            res = compute_metrics(raw_all[:k], x_hat * std + mean)
            num_px = k * cfg.img_size * cfg.img_size
            bits = sum(s.num_bits() + len(p) * 8 for s, p in zip(streams, payloads))
            res.update(
                bpp=bits / num_px,
                encoding_time=enc_t / k,
                decoding_time=dec_t / k,
            )
        print(tag, {k2: round(float(v), 4) for k2, v in res.items()}, flush=True)

    eval_codec(state.params, "BEFORE:")
    order = np.random.default_rng(start_step)
    t0 = time.time()
    for it in range(start_step, start_step + args.steps):
        idx = order.integers(0, n, args.batch)
        state, m = step(state, {"imgs": imgs_all[idx], "scores": scores_all[idx]}, rng)
        if (it - start_step) % max(args.steps // 10, 1) == 0:
            print(
                f"step {it}: loss={float(m['loss']):.4f} bpp={float(m['bpp_loss']):.4f} "
                f"ssim={float(m['ssim_loss']):.4f} l1={float(m['L1_loss']):.4f} "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )
        if args.eval_every and (it + 1) % args.eval_every == 0:
            eval_codec(state.params, f"EVAL@{it + 1}:")
            save(it + 1)
    print(f"{args.steps} steps in {time.time() - t0:.0f}s", flush=True)
    # skip the trailing eval/save when the loop's last step just did both
    # (the in-loop trigger fires on the absolute step, so test that)
    if not (args.eval_every and (start_step + args.steps) % args.eval_every == 0):
        eval_codec(state.params, "AFTER:")
        save(start_step + args.steps)
    if args.save_npz:
        from textmae_tpu.train.checkpoint import save_params_npz

        path = save_params_npz(
            Path(args.save_npz), jax.device_get(state.params),
            meta={
                "normalize": not args.eval_raw,
                "num_keep_patches": cfg.num_keep_patches,
                "canonical_keep_order": cfg.canonical_keep_order,
                "lmbda": args.lmbda,
                "steps": start_step + args.steps,
            },
        )
        print(f"saved npz {path}", flush=True)


if __name__ == "__main__":
    main()
