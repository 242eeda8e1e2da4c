"""MCM evaluation CLI (real bitstream or entropy estimation).

Flag parity in spirit with /root/reference/testing.py:168-196: dataset dir,
output dir, checkpoint path(s), --entropy-estimation, --half; emits the JSON
metrics report to stdout and report.txt (testing.py:242-250).
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import jax.numpy as jnp


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Evaluate MCM on an image dataset (TPU).")
    p.add_argument("-d", "--dataset", type=str, required=True, help="test image directory")
    p.add_argument("-o", "--output_path", type=str, default="reconstruction")
    p.add_argument("-p", "--path", dest="paths", type=str, nargs="+", default=[None],
                   help="checkpoint path(s); omit to evaluate a fresh model")
    p.add_argument("--input-size", type=int, default=224)
    p.add_argument("--num-keep-patches", type=int, default=None,
                   help="default: checkpoint meta, else 144 "
                        "(None sentinel so an explicit 144 is distinguishable "
                        "from 'unset' when a meta contradicts it)")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--pipeline", type=int, default=1,
                   help="overlap this many batches' round trips (throughput mode)")
    p.add_argument("--entropy-estimation", action="store_true")
    p.add_argument("--normalize", action="store_true",
                   help="ImageNet-normalize eval inputs and de-normalize for "
                        "metrics: consistent with the train/val distribution "
                        "(the reference's test path skips normalization — "
                        "dataloader.py:57-73 — which caps measurable quality "
                        "for checkpoints trained on normalized pixels)")
    from textmae_tpu.coding import available_entropy_coders

    p.add_argument("--entropy-coder", type=str, default="rans",
                   choices=available_entropy_coders(),
                   help="bitstream coder backend (testing.py:176-179 parity)")
    p.add_argument("--tiled", action="store_true",
                   help="full-resolution eval: tile each image into input-size "
                        "tiles instead of downscaling (eval/tiling.py)")
    p.add_argument("--half", action="store_true", help="bfloat16 transformer compute")
    p.add_argument("--reference-order", action="store_true",
                   help="canonical_keep_order=False: the reference's token "
                        "ordering (MCM.py:640-652); ids_restore side info is "
                        "then the full permutation, as testing.py:73-76 codes. "
                        "Required for reference-trained / rd_sweep checkpoints")
    p.add_argument("--moe-experts", type=int, default=None,
                   help="MoE encoder topology of the checkpoint (default: "
                        "checkpoint meta, else inferred from the param tree, "
                        "else dense)")
    p.add_argument("--moe-top-k", type=int, default=None,
                   help="experts routed per token (default: meta, else 1 — "
                        "NOT inferable from weights)")
    p.add_argument("--moe-every", type=int, default=None,
                   help="MoE block cadence (default: meta/param tree, else 2)")
    p.add_argument("--save-recon", action="store_true")
    p.add_argument("--debug-tiny", action="store_true",
                   help="tiny model dims (smoke-testing the eval path on CPU; "
                        "mirrors cli.train --debug-tiny)")
    p.add_argument("-v", "--verbose", action="store_true")
    return p


def _apply_npz_meta(args) -> None:
    """Self-configure still-default flags from a single npz ckpt's __meta__.

    Explicit CLI flags win (only parser-default values are replaced); a
    stored meta that contradicts an explicit flag gets a warning. Prevents
    the silent-misconfiguration class ADVICE r2 #4 flagged for pipeline.py:
    a checkpoint trained with --normalize / a non-default keep count decodes
    garbage when evaluated without them.
    """
    if len(args.paths) == 1:
        from textmae_tpu.train.checkpoint import apply_npz_meta_to_args

        apply_npz_meta_to_args(args, args.paths[0])
    if args.num_keep_patches is None:
        args.num_keep_patches = 144
    args.moe_experts = 0 if args.moe_experts is None else args.moe_experts
    args.moe_top_k = 1 if args.moe_top_k is None else args.moe_top_k
    args.moe_every = 2 if args.moe_every is None else args.moe_every


def main(argv=None):
    args = build_parser().parse_args(argv)
    _apply_npz_meta(args)

    import jax

    from textmae_tpu.coding import set_entropy_coder
    from textmae_tpu.data import ImageScoreDataset
    from textmae_tpu.eval import MCMCodec, eval_model
    from textmae_tpu.eval.harness import write_report
    from textmae_tpu.models.mcm import MCM, MCMConfig
    from textmae_tpu.train.checkpoint import restore_params_any

    set_entropy_coder(args.entropy_coder)
    dataset = ImageScoreDataset(
        args.dataset, "test", img_size=args.input_size, normalize=args.normalize
    )

    tiny = dict(
        encoder_embed_dim=32, encoder_depth=2, encoder_num_heads=2,
        decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2,
        latent_depth=24, hyperprior_depth=16, num_slices=4, use_pallas=False,
    ) if args.debug_tiny else {}
    cfg = MCMConfig(
        img_size=args.input_size,
        num_keep_patches=args.num_keep_patches,
        canonical_keep_order=not args.reference_order,
        dtype=jnp.bfloat16 if args.half else jnp.float32,
        moe_experts=args.moe_experts,
        moe_top_k=args.moe_top_k,
        moe_every=args.moe_every,
        **tiny,
    )
    model = MCM(cfg)

    all_results = {}
    for ckpt in args.paths:
        rng = jax.random.PRNGKey(0)
        sample = jnp.zeros((1, 3, args.input_size, args.input_size), jnp.float32)
        sscore = jnp.zeros((1, cfg.num_patches), jnp.float32)
        variables = jax.jit(
            lambda r: model.init(
                {"params": r, "noise": r}, sample, sscore,
                training=False, compute_loss=False,
            )
        )(rng)
        if ckpt:
            params = restore_params_any(ckpt, variables["params"])
            # commit restored (host numpy) params to device once — otherwise
            # every jitted eval program re-uploads the full tree per call
            variables = jax.device_put({"params": params})
            name = Path(ckpt).name
        else:
            name = "untrained"

        if args.tiled:
            import numpy as np
            from PIL import Image

            from textmae_tpu.eval import MCMCodec as _C
            from textmae_tpu.eval.tiling import inference_tiled

            codec = MCMCodec(model, variables)
            codec.update(force=True)
            agg: dict = {}
            for f in dataset.files:
                with Image.open(f) as im:
                    img = np.asarray(im.convert("RGB"), np.float32) / 255.0
                res = inference_tiled(
                    codec, img, tile=args.input_size,
                    normalize=bool(args.normalize),
                )
                res.pop("x_hat")
                if args.verbose:
                    print(f.name, {k: round(float(v), 4) for k, v in res.items()})
                for k, v in res.items():
                    agg[k] = agg.get(k, 0.0) + float(v)
            results = {k: v / len(dataset.files) for k, v in agg.items()}
        elif args.entropy_estimation:
            results = eval_model(
                model, dataset, entropy_estimation=True, variables=variables,
                batch_size=args.batch_size, verbose=args.verbose,
                pipeline=args.pipeline, denormalize=args.normalize,
                output_dir=args.output_path if args.save_recon else None,
            )
        else:
            codec = MCMCodec(model, variables)
            codec.update(force=True)
            results = eval_model(
                codec, dataset, batch_size=args.batch_size, verbose=args.verbose,
                pipeline=args.pipeline, denormalize=args.normalize,
                output_dir=args.output_path if args.save_recon else None,
            )
        all_results[name] = results

    desc = (
        "entropy estimation"
        if args.entropy_estimation
        else f"Inference ({args.entropy_coder})"
    )
    report = write_report(all_results, Path(args.output_path + "_report.txt")
                          if not Path(args.output_path).is_dir()
                          else Path(args.output_path) / "report.txt", desc)
    json.dump(report, sys.stdout, indent=2)
    print()


if __name__ == "__main__":
    main()
