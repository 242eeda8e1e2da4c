"""Full three-stage pipeline CLI: caption -> compress/decompress -> refine.

The reference exposes the stages as classes the user composes manually
(README demo; SURVEY.md §0, §3.5). This CLI wires them end to end:

  1. BLIP-2 caption (optional; requires transformers weights)
  2. MCM compress -> bitstream -> decompress
  3. SDXL img2img refinement conditioned on the caption (optional; diffusers)

Stages 1/3 degrade gracefully when their model weights are unavailable
(zero-egress environments): the pipeline then reports compression-only
results, which matches the reference's trained/evaluated artifact.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="TextMAE 3-stage pipeline (TPU)")
    p.add_argument("-i", "--image", required=True, help="input image path")
    p.add_argument("-o", "--output", default="pipeline_out", help="output dir")
    p.add_argument("-p", "--checkpoint", default=None,
                   help="MCM checkpoint (Orbax dir or params npz; default: the "
                        "committed checkpoints/*.npz when present)")
    p.add_argument("--normalize", action="store_true", default=None,
                   help="ImageNet-normalize model inputs / de-normalize outputs "
                        "(checkpoints trained with train --normalize need this; "
                        "defaults to on when the committed checkpoint is used)")
    p.add_argument("--random-init", action="store_true",
                   help="skip checkpoint loading even if one is available")
    p.add_argument("--input-size", type=int, default=224)
    p.add_argument("--num-keep-patches", type=int, default=None,
                   help="kept patches (default: the checkpoint's __meta__ "
                        "provenance when -p is an npz, else 144)")
    p.add_argument("--reference-order", action="store_true",
                   help="canonical_keep_order=False: the reference's token "
                        "ordering. Required for reference-trained / rd_sweep "
                        "checkpoints (auto-set from npz __meta__)")
    p.add_argument("--moe-experts", type=int, default=None,
                   help="MoE encoder topology of the checkpoint (default: "
                        "meta, else param-tree inference, else dense)")
    p.add_argument("--moe-top-k", type=int, default=None)
    p.add_argument("--moe-every", type=int, default=None)
    p.add_argument("--no-caption", action="store_true")
    p.add_argument("--caption-backend", choices=("native", "torch"), default="native",
                   help="native = flax BLIP-2 jitted on TPU (textmae_tpu.captioning, "
                        "weights from $TEXTMAE_BLIP2_PATH); torch = HF pipeline")
    p.add_argument("--no-refine", action="store_true")
    p.add_argument("--refine-backend", choices=("native", "torch"), default="native",
                   help="native = flax SDXL refiner jitted on TPU "
                        "(textmae_tpu.diffusion); torch = diffusers pipeline")
    p.add_argument("--refine-steps", type=int, default=None,
                   help="denoise steps for the refiner (default: config)")
    p.add_argument("--tensor-parallel", type=int, default=1,
                   help="shard the native refiner's UNet over a {'model': N} "
                        "mesh of the first N local devices (Megatron TP, "
                        "diffusion/sharding.py)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from textmae_tpu.eval.harness import code_side_info
    from textmae_tpu.data.score_maps import load_gray, total_score_for_image
    from textmae_tpu.eval import MCMCodec, compute_metrics
    from textmae_tpu.models.mcm import MCM, MCMConfig

    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)

    with Image.open(args.image) as im:
        pil = im.convert("RGB")
        orig_size = pil.size
    gray = load_gray(args.image)  # the one canonical grayscale path
    # score-map resolution must follow --input-size (the default 224 map
    # yields 196 scores, wrong for any other patch grid)
    score = total_score_for_image(gray, (args.input_size, args.input_size))

    # ---- stage 1: caption --------------------------------------------------
    caption = None
    if not args.no_caption:
        try:
            if args.caption_backend == "native":
                from textmae_tpu.captioning.convert import load_blip2_weights

                cap = load_blip2_weights()
                caption = cap.caption(np.asarray(pil, np.uint8)[None])[0]
            else:
                from textmae_tpu.models.blip import Blip2

                blip = Blip2.prepare_model()
                caption = blip.generate_caption(pil)
            print(f"caption: {caption!r}")
        except Exception as e:
            print(f"[stage 1 skipped] {e}")

    # ---- stage 2: compression ---------------------------------------------
    # --random-init overrides ANY checkpoint, including an explicit -p
    ckpt = None if args.random_init else args.checkpoint
    if ckpt is None and not args.random_init:
        # prefer the committed trained weights (trained with --normalize;
        # that npz predates the __meta__ provenance, hence the explicit
        # normalize defaulting here)
        default = Path(__file__).resolve().parents[2] / "checkpoints" / "mcm_kodak_l1_150k.f16.npz"
        if default.is_file() and args.num_keep_patches in (None, 144) and args.input_size == 224:
            ckpt = str(default)
            if args.normalize is None:
                args.normalize = True

    # self-configure keep count / token ordering / normalize from the
    # checkpoint's training provenance BEFORE the config is built: a
    # mismatched flag silently decodes wrong pixels (ADVICE r2)
    if ckpt:
        from textmae_tpu.train.checkpoint import apply_npz_meta_to_args

        apply_npz_meta_to_args(args, ckpt)
    if args.num_keep_patches is None:
        args.num_keep_patches = 144

    cfg = MCMConfig(
        img_size=args.input_size, num_keep_patches=args.num_keep_patches,
        canonical_keep_order=not args.reference_order,
        dtype=jnp.bfloat16,
        moe_experts=args.moe_experts or 0,
        moe_top_k=args.moe_top_k or 1,
        moe_every=args.moe_every or 2,
    )
    model = MCM(cfg)
    resized = pil.resize((cfg.img_size, cfg.img_size), Image.BICUBIC)
    imgs = jnp.asarray(
        (np.asarray(resized, np.float32) / 255.0).transpose(2, 0, 1)[None]
    )
    scores = jnp.asarray(score[None])

    rng = jax.random.PRNGKey(0)
    if ckpt and ckpt.endswith(".npz"):
        from textmae_tpu.train.checkpoint import load_params_npz

        variables = {"params": load_params_npz(ckpt)}
    else:
        variables = jax.jit(
            lambda r: model.init(
                {"params": r, "noise": r}, imgs, scores, training=False, compute_loss=False
            )
        )(rng)
        if ckpt:
            from textmae_tpu.train import TrainState, configure_optimizers
            from textmae_tpu.train.checkpoint import restore_checkpoint

            tx = configure_optimizers(variables["params"])
            template = TrainState.create(variables["params"], tx)
            state, _ = restore_checkpoint(ckpt, state_template=template)
            variables = {"params": state.params}
    if ckpt:
        print(f"loaded MCM checkpoint {ckpt}")

    imgs_model = imgs
    if args.normalize:
        from textmae_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD

        mean = jnp.asarray(IMAGENET_MEAN).reshape(1, 3, 1, 1)
        std = jnp.asarray(IMAGENET_STD).reshape(1, 3, 1, 1)
        imgs_model = (imgs - mean) / std

    codec = MCMCodec(model, variables)
    codec.update(force=True)
    streams, ids_restore = codec.compress(imgs_model, scores)
    payloads, ids = code_side_info(
        ids_restore, cfg.num_keep_patches, cfg.canonical_keep_order
    )
    x_hat = codec.decompress(streams, ids)
    if args.normalize:
        x_hat = jnp.clip(x_hat * std + mean, 0.0, 1.0)
    num_pixels = cfg.img_size * cfg.img_size
    bpp = (streams[0].num_bits() + len(payloads[0]) * 8) / num_pixels
    metrics = compute_metrics(imgs, x_hat)

    recon = np.clip(np.asarray(x_hat[0]).transpose(1, 2, 0), 0, 1)
    recon_img = Image.fromarray((recon * 255).round().astype(np.uint8)).resize(
        orig_size, Image.BICUBIC
    )
    recon_path = out_dir / "reconstruction.png"
    recon_img.save(recon_path)

    # ---- stage 3: refinement ----------------------------------------------
    refined_path = None
    if not args.no_refine:
        try:
            from textmae_tpu.models.diffusion import Diffuser

            diffuser = Diffuser.prepare_model(
                backend=args.refine_backend,
                num_inference_steps=args.refine_steps,
                tensor_parallel=args.tensor_parallel,
            )
            refined = diffuser.refine_image(caption or "a photo", recon_img)
            refined_path = out_dir / "refined.png"
            refined.save(refined_path)
        except Exception as e:
            print(f"[stage 3 skipped] {e}")

    report = {
        "caption": caption,
        "bpp": round(bpp, 5),
        **{k: round(v, 4) for k, v in metrics.items()},
        "reconstruction": str(recon_path),
        "refined": str(refined_path) if refined_path else None,
    }
    (out_dir / "report.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
