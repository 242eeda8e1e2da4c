"""MAE reconstruction visualization (reference demo/mae_visualize.ipynb parity).

Loads an image, runs MaskedAutoencoderViT with random or score-guided masking,
and saves a 4-panel figure: original / masked / reconstruction / recon+visible.

    python examples/mae_visualize.py -i image.png [-c mae_checkpoint.pth] \
        [--mask-ratio 0.75] [--score-guided] [-o mae_viz.png]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


def main():
    p = argparse.ArgumentParser()
    from textmae_tpu.data.paths import find_kodak

    kodak = find_kodak()
    p.add_argument(
        "-i", "--image",
        default=str(kodak / "kodim23.png") if kodak else None, required=kodak is None,
    )
    p.add_argument("-c", "--checkpoint", default=None, help="torch MAE checkpoint")
    p.add_argument("--model", default="mae_vit_base_patch16")
    p.add_argument("--mask-ratio", type=float, default=0.75)
    p.add_argument("--score-guided", action="store_true")
    p.add_argument("-o", "--output", default="mae_viz.png")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from textmae_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD
    from textmae_tpu.models import mae as mae_models

    with Image.open(args.image) as im:
        pil = im.convert("RGB").resize((224, 224), Image.BICUBIC)
    img = np.asarray(pil, np.float32) / 255.0
    x = jnp.asarray(((img - IMAGENET_MEAN) / IMAGENET_STD).transpose(2, 0, 1)[None])

    model = getattr(mae_models, args.model)(norm_pix_loss=False)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda k: model.init({"params": k, "mask": k}, x, args.mask_ratio)
    )(rng)["params"]
    if args.checkpoint:
        from textmae_tpu.train.checkpoint import load_mae_pretrained

        params = load_mae_pretrained(
            params, args.checkpoint
        )

    ids_shuffle = None
    if args.score_guided:
        import cv2

        from textmae_tpu.data.score_maps import total_score_for_image
        from textmae_tpu.masking import get_ids_shuffle

        gray = cv2.imread(args.image, cv2.IMREAD_GRAYSCALE)
        score = total_score_for_image(gray)
        num_keep = int(model.config.num_patches * (1 - args.mask_ratio))
        ids_shuffle = get_ids_shuffle(jnp.asarray(score[None]), num_keep)

    loss, pred, mask = model.apply(
        {"params": params}, x, args.mask_ratio, ids_shuffle=ids_shuffle,
        rngs={"mask": jax.random.PRNGKey(2)},
    )
    recon = np.asarray(model.reconstruct(pred)[0]).transpose(1, 2, 0)
    recon = recon * IMAGENET_STD + IMAGENET_MEAN

    p_sz = model.config.patch_size
    grid = 224 // p_sz
    mask_img = np.asarray(mask[0]).reshape(grid, grid)
    mask_full = np.kron(mask_img, np.ones((p_sz, p_sz)))[..., None]

    panels = [
        ("original", img),
        ("masked", img * (1 - mask_full) + 0.5 * mask_full),
        ("reconstruction", np.clip(recon, 0, 1)),
        ("recon + visible", np.clip(recon * mask_full + img * (1 - mask_full), 0, 1)),
    ]
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 4, figsize=(16, 4))
    for ax, (title, panel) in zip(axes, panels):
        ax.imshow(panel)
        ax.set_title(title)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    print(f"loss={float(loss):.4f} -> {args.output}")


if __name__ == "__main__":
    main()
