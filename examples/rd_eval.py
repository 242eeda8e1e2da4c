"""Post-hoc R-D evaluation of a saved MCM checkpoint under BOTH bpp accountings.

Context (VERDICT r2 #2): the reference publishes its R-D curve only as README
asset annotations (/root/reference/README.md:6-7 -> assets/1-2.png). Its own
eval harness (testing.py:85-89) divides total bits by the pixel count of the
RESIZED 224x224 model input — but under that accounting the published
"0.02 bpp at 75% masked" point is impossible: the Huffman-coded 196-element
ids_restore permutation alone is ~1490 bits = 0.0297 bpp at 224^2 (each value
occurs once, so Huffman degenerates to ~log2(196) bits/symbol;
utils/huffman.py returns a bit-string whose len() is counted at
testing.py:89). The published numbers are therefore per ORIGINAL pixel
(768x512 for Kodak), where the same side info is a negligible 0.0038 bpp.
This script reports both accountings, plus PSNR at 224 (the reference metric,
testing.py:44-49) and at the original resolution (recon upsampled bicubic,
matching save_output's resize at testing.py:52-57).

Self-configures from the npz __meta__ (keep, token order, normalize). Use
``--images`` for an explicit list, or ``--set holdout|train|all`` with the
same holdout split as examples/rd_sweep.py — evaluating a sweep checkpoint on
its own TRAIN images quantifies the memorization/generalization gap that the
from-scratch, 22-image training regime carries (no MAE-pretrained init is
downloadable in this environment; setup.sh:21-22).
"""
import argparse
import json
import time
from pathlib import Path
import sys

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

HOLDOUT = {"kodim20", "kodim23"}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="f16 npz checkpoint")
    p.add_argument("--images", default=None, help="comma-separated stems")
    p.add_argument("--set", default="holdout", choices=["holdout", "train", "all"],
                   help="image set by the rd_sweep holdout split")
    p.add_argument("--report", default=None, help="JSON output path")
    p.add_argument("--platform", default=None,
                   help="jax platform override (e.g. cpu while the chip is busy)")
    p.add_argument("--batch", type=int, default=8, help="codec batch size")
    args = p.parse_args()

    import jax

    if args.platform:
        # must go through jax.config: the axon sitecustomize overrides env vars
        jax.config.update("jax_platforms", args.platform)

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
    from textmae_tpu.train.checkpoint import load_npz_meta, load_params_npz

    meta = load_npz_meta(Path(args.ckpt))
    params = load_params_npz(Path(args.ckpt))
    holdout = (set(str(meta["holdout"]).split(",")) if "holdout" in meta
               else HOLDOUT)
    if "holdout" not in meta and args.set != "all":
        print(f"note: no holdout split in npz meta; assuming {sorted(HOLDOUT)} "
              "(pre-meta sweep checkpoints used exactly this split)", flush=True)
    keep = int(meta.get("num_keep_patches", 144))
    canonical = bool(meta.get("canonical_keep_order", True))
    normalize = bool(meta.get("normalize", False))
    cfg = MCMConfig(num_keep_patches=keep, canonical_keep_order=canonical)
    model = MCM(cfg)
    print(f"ckpt meta: keep={keep} canonical={canonical} normalize={normalize} "
          f"lmbda={meta.get('lmbda')} steps={meta.get('steps')}", flush=True)

    kodak = find_kodak()
    if kodak is None:
        raise SystemExit("no Kodak directory found")
    files = sorted(kodak.glob("*.png"))
    if args.images:
        want = {s.strip() for s in args.images.split(",")}
        files = [f for f in files if f.stem in want]
    elif args.set == "holdout":
        files = [f for f in files if f.stem in holdout]
    elif args.set == "train":
        files = [f for f in files if f.stem not in holdout]
    if not files:
        raise SystemExit("no images selected")

    mean = jnp.asarray(IMAGENET_MEAN.reshape(1, 3, 1, 1))
    std = jnp.asarray(IMAGENET_STD.reshape(1, 3, 1, 1))

    codec = MCMCodec(model, {"params": params})
    codec.update(force=True)

    per_image = {}
    for lo in range(0, len(files), args.batch):
        chunk = files[lo : lo + args.batch]
        raws, scores, origs = [], [], []
        for f in chunk:
            with Image.open(f) as im:
                im = im.convert("RGB")
                g = np.asarray(im.convert("L"), np.uint8)
                origs.append(np.asarray(im, np.float32) / 255.0)
                raws.append(
                    np.asarray(im.resize((224, 224), Image.BICUBIC), np.float32)
                    / 255.0
                )
            scores.append(total_score_for_image(g))
        raw_d = jnp.asarray(np.stack(raws).transpose(0, 3, 1, 2))
        scores_d = jnp.asarray(np.stack(scores))
        inp = (raw_d - mean) / std if normalize else raw_d

        t0 = time.time()
        streams, ids_restore = codec.compress(inp, scores_d)
        enc_t = (time.time() - t0) / len(chunk)
        payloads, ids = code_side_info(np.asarray(ids_restore), keep, canonical)
        t0 = time.time()
        x_hat = codec.decompress(streams, ids)
        dec_t = (time.time() - t0) / len(chunk)
        x_px = jnp.clip(x_hat * std + mean if normalize else x_hat, 0.0, 1.0)
        x_np = np.asarray(x_px).transpose(0, 2, 3, 1)

        for i, f in enumerate(chunk):
            m224 = compute_metrics(raw_d[i : i + 1], x_px[i : i + 1])
            # upsample the recon to the original resolution (testing.py:52-57
            # resizes the saved output the same way) and measure against the
            # untouched original pixels
            h, w = origs[i].shape[:2]
            rec_img = Image.fromarray(
                (np.clip(x_np[i], 0, 1) * 255).round().astype(np.uint8)
            ).resize((w, h), Image.BICUBIC)
            a = (origs[i] * 255).round()
            b = np.asarray(rec_img, np.float32)
            mse = float(np.mean((a - b) ** 2))
            psnr_orig = 10 * np.log10(255.0**2 / mse) if mse > 0 else float("inf")

            bits = streams[i].num_bits() + len(payloads[i]) * 8
            per_image[f.stem] = {
                "psnr_224": round(float(m224["psnr"]), 3),
                "ms_ssim_224": round(float(m224["ms-ssim"]), 5),
                "psnr_orig": round(psnr_orig, 3),
                "bpp_224": round(bits / (224 * 224), 5),
                "bpp_orig": round(bits / (h * w), 5),
                "bits": int(bits),
                "enc_s": round(enc_t, 3),
                "dec_s": round(dec_t, 3),
            }
            print(f.stem, json.dumps(per_image[f.stem]), flush=True)

    agg = {
        k: round(float(np.mean([v[k] for v in per_image.values()])), 5)
        for k in next(iter(per_image.values()))
    }
    out = {
        "ckpt": str(args.ckpt),
        "meta": {k: (v.item() if hasattr(v, "item") else v) for k, v in meta.items()},
        "set": args.images or args.set,
        "accounting": {
            "bpp_224": "total bits / 224^2 (reference testing.py:85-89 harness)",
            "bpp_orig": "total bits / original HxW (the published README-curve "
                        "accounting; see module docstring for why it cannot be "
                        "the 224^2 one)",
        },
        "mean": agg,
        "per_image": per_image,
    }
    print("MEAN:", json.dumps(agg), flush=True)
    if args.report:
        Path(args.report).parent.mkdir(parents=True, exist_ok=True)
        Path(args.report).write_text(json.dumps(out, indent=1))
        print(f"wrote {args.report}", flush=True)


if __name__ == "__main__":
    main()
