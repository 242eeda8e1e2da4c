"""Orbax checkpointing + torch-checkpoint import.

Checkpoint contract parity with the reference
(/root/reference/models/Compression/common/model_utils.py:9-64,
training.py:19-23): dict checkpoints holding model + optimizer state + epoch,
written by the lead process only, best-model copy selected by val loss, resume
restoring optimizers and start epoch. Orbax replaces torch.save; the logical
layout is {"state": TrainState pytree, "meta": {epoch, best_loss, args}}.

The torch importer loads a pretrained MAE checkpoint
(mae_visualize_vit_large[_ganloss].pth, setup.sh:21-22) into MCM/MAE flax
params, transposing torch layouts -> flax (OIHW->HWIO convs, [out,in]->[in,out]
dense), dropping mismatched heads and regenerating fixed sincos pos-embeds at
the target grid (the reference's interpolate_pos_embed + head-drop,
training.py:163-176).
"""
from __future__ import annotations

import os
import re
import sys
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


# ---------------------------------------------------------------------------
# Orbax save / restore
# ---------------------------------------------------------------------------
def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def is_lead_process() -> bool:
    return jax.process_index() == 0


def save_checkpoint(directory: os.PathLike, name: str, state, meta: Dict) -> Optional[Path]:
    """Write {state, meta} under directory/name; the LEAD process writes.

    COLLECTIVE under multi-host sharding: when any leaf is sharded across
    processes (FSDP over a cross-process "data" axis), the gather below is
    a collective — call this from EVERY process with the same decision
    (never under an ``if is_lead_process():`` guard, and never behind a
    condition that can diverge across processes; either hangs the gang).
    Single-host callers are unaffected (non-lead is then a cheap no-op).

    Scale note: the gather materializes the full unsharded state (params +
    both Adam moments) transiently in host RAM on every process — fine for
    this repo's model sizes; at ZeRO-3 scale where hosts are sized for
    sharded state, switch to Orbax's sharded-array save (no all-to-one
    gather) instead.

    The state pytree is canonicalized through flax.serialization so restore
    does not depend on custom pytree node ordering (optax named tuples,
    flax.struct dataclasses).
    """
    import flax.serialization

    # Cross-process-sharded leaves (multi-host FSDP: parallel/fsdp.py shards
    # params + moments over the "data" axis, which spans processes under
    # cli.launch) cannot be np.asarray'd on one host. process_allgather is a
    # COLLECTIVE — every process must participate — so the gather runs before
    # the lead-only early return below.
    def _to_host(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    state_host = jax.tree.map(_to_host, state)
    if not is_lead_process():
        return None

    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    path = (directory / name).resolve()
    payload = {
        "state": flax.serialization.to_state_dict(state_host),
        "meta": meta,
    }
    ckptr = _checkpointer()
    ckptr.save(path, payload, force=True)
    return path


def latest_step_checkpoint(
    directory: os.PathLike, prefix: str = "step"
) -> Optional[Path]:
    """Newest completed ``{prefix}{N}`` checkpoint dir under ``directory``.

    Resumable checkpoints are exactly the all-digit-suffix dirs: a kill during
    save_checkpoint leaves Orbax's ``{prefix}{N}.orbax-checkpoint-tmp`` staging
    dir behind, which must never be selected (restore would fail and wedge an
    unattended retry loop on every attempt).
    """
    directory = Path(directory)
    if not directory.is_dir():
        return None
    done = [p for p in directory.glob(f"{prefix}*")
            if p.is_dir() and p.name[len(prefix):].isdigit()]
    return max(done, key=lambda p: int(p.name[len(prefix):]), default=None)


def restore_checkpoint(path: os.PathLike, state_template=None) -> Tuple[Any, Dict]:
    """Restore (state, meta); with a template the state keeps its pytree types."""
    import flax.serialization

    path = Path(path).resolve()
    ckptr = _checkpointer()
    payload = ckptr.restore(path)
    state = payload["state"]
    if state_template is not None:
        state = flax.serialization.from_state_dict(state_template, state)
    return state, payload["meta"]


def save_params_npz(
    path: os.PathLike, params: Dict, dtype=np.float16, meta: Optional[Dict] = None
) -> Path:
    """Write a params pytree as a flat compressed npz (distribution format).

    Float leaves are cast to `dtype` (f16 halves the artifact size; rounding
    is applied identically on encode and decode since the codec rebuilds its
    CDF tables from the loaded params, so bitstream round-trips stay exact).
    Keys are "/"-joined paths. Counterpart of the reference's torch.save
    weights file (model_utils.py:40-48) for shipping trained weights in-repo.

    meta: small scalar facts about how the checkpoint was trained (e.g.
    ``{"normalize": True, "num_keep_patches": 144}``), stored under
    ``__meta__/<key>`` entries so consumers can self-configure instead of
    requiring the user to re-pass training-time flags (ADVICE r2: an npz
    without its --normalize provenance silently decodes wrong pixel values).
    """
    import flax.traverse_util as tu

    flat = tu.flatten_dict(jax.tree.map(np.asarray, params), sep="/")
    out = {
        k: (v.astype(dtype) if np.issubdtype(v.dtype, np.floating) else v)
        for k, v in flat.items()
    }
    for k, v in (meta or {}).items():
        out[f"__meta__/{k}"] = np.asarray(v)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # atomic: a preemption mid-write must not leave a truncated npz that the
    # next restart loads and crashes on (the elastic gang-restart contract)
    tmp = path.with_name(path.name + ".tmp.npz")  # savez appends .npz otherwise
    np.savez_compressed(tmp, **out)
    os.replace(tmp, path)
    return path


def load_params_npz(path: os.PathLike, dtype=np.float32) -> Dict:
    """Load a params pytree saved by save_params_npz; floats cast to `dtype`.

    ``__meta__/*`` provenance entries are not params — read them with
    load_npz_meta.
    """
    import flax.traverse_util as tu

    with np.load(Path(path)) as z:
        flat = {
            k: (
                np.asarray(v, dtype)
                if np.issubdtype(v.dtype, np.floating)
                else np.asarray(v)
            )
            for k, v in z.items()
            if not k.startswith("__meta__/")
        }
    return tu.unflatten_dict(flat, sep="/")


def load_npz_meta(path: os.PathLike) -> Dict:
    """Provenance meta stored by save_params_npz(meta=...); {} for old files."""
    meta = {}
    with np.load(Path(path)) as z:
        for k in z.files:
            if k.startswith("__meta__/"):
                v = z[k]
                meta[k[len("__meta__/"):]] = v.item() if v.ndim == 0 else v
    return meta


def apply_npz_meta_to_args(args, path: Optional[os.PathLike]) -> None:
    """Self-configure still-default CLI flags from an npz checkpoint's
    ``__meta__`` provenance (``save_params_npz(meta=...)``).

    One call site for test_model / serve / pipeline — a checkpoint trained
    with ``--normalize``, a non-default keep count, or the reference token
    ordering silently decodes garbage when evaluated or SERVED without the
    matching flags (the misconfiguration class ADVICE r2 #4 flagged).
    Handles, when the attribute exists on ``args``:

      * ``num_keep_patches`` — applied only while still the ``None`` parser
        default (an explicit value wins; a contradiction warns)
      * ``reference_order`` — set when meta says ``canonical_keep_order`` is
        False; an explicit flag contradicting the meta warns
      * ``normalize`` — tri-state aware (``None`` = decide from meta;
        store_true flags are promoted when the meta says True)
    """
    if not (path and str(path).endswith(".npz") and Path(path).is_file()):
        return
    meta = load_npz_meta(path)
    updates = {}
    if "num_keep_patches" in meta and hasattr(args, "num_keep_patches"):
        mk = int(meta["num_keep_patches"])
        if args.num_keep_patches is None:
            updates["num_keep_patches"] = mk
        elif args.num_keep_patches != mk:
            print(f"warning: --num-keep-patches {args.num_keep_patches} "
                  f"contradicts checkpoint meta num_keep_patches={mk}",
                  file=sys.stderr)
    if "canonical_keep_order" in meta and hasattr(args, "reference_order"):
        mc = bool(meta["canonical_keep_order"])
        if not mc and not args.reference_order:
            updates["reference_order"] = True
        elif mc and args.reference_order:
            print("warning: --reference-order set but checkpoint meta says "
                  "canonical_keep_order=True", file=sys.stderr)
    if "normalize" in meta and hasattr(args, "normalize"):
        mn = bool(meta["normalize"])
        if args.normalize is None or (mn and not args.normalize):
            if bool(args.normalize) is not mn:
                updates["normalize"] = mn
        elif bool(args.normalize) != mn:
            print(f"warning: --normalize={bool(args.normalize)} but the "
                  f"checkpoint was trained with normalize={mn}",
                  file=sys.stderr)
    if getattr(args, "moe_experts", False) is None:
        # MoE topology: meta first (exact, may carry top_k), else inferred
        # from the param tree itself — expert count and block cadence are
        # structural, so an MoE checkpoint without meta still self-configures
        if "moe_experts" in meta:
            updates["moe_experts"] = int(meta["moe_experts"])
            for k in ("moe_top_k", "moe_every"):
                if k in meta and getattr(args, k, False) is None:
                    updates[k] = int(meta[k])
        else:
            inferred = infer_moe_from_npz(path)
            if inferred:
                updates["moe_experts"] = inferred["moe_experts"]
                if getattr(args, "moe_every", False) is None:
                    updates["moe_every"] = inferred["moe_every"]
                if getattr(args, "moe_top_k", False) is None:
                    print("warning: MoE checkpoint without moe_top_k meta; "
                          "assuming top_k=1 (pass --moe-top-k to override)",
                          file=sys.stderr)
    for k, v in updates.items():
        print(f"note: {k}={v} from checkpoint meta", file=sys.stderr)
        setattr(args, k, v)


def infer_moe_from_npz(path: os.PathLike):
    """``{"moe_experts": E, "moe_every": n}`` inferred from the param tree of
    an npz distribution file, or None when the encoder is dense. The expert
    count is dim 0 of any stacked ``moe/wi`` and the cadence is the first MoE
    block's index + 1 (V-MoE placement: blocks i with i % every == every-1).
    ``top_k`` is a routing hyperparameter invisible in the weights — it must
    come from meta or a flag."""
    import re

    with np.load(Path(path)) as z:
        idx = sorted({
            int(m.group(1))
            for k in z.files
            for m in [re.match(r"encoder_blocks_(\d+)/moe/wi$", k)]
            if m
        })
        if not idx:
            return None
        experts = int(z[f"encoder_blocks_{idx[0]}/moe/wi"].shape[0])
    return {"moe_experts": experts, "moe_every": idx[0] + 1}


def restore_params_any(path: os.PathLike, params_template: Dict) -> Dict:
    """Params from either format a CLI may be handed: a flat ``.npz``
    distribution file (save_params_npz) or an Orbax train-state checkpoint
    directory (save_checkpoint). One call site for serve/test_model/pipeline.
    """
    path = Path(path)
    if path.suffix == ".npz":
        return load_params_npz(path)
    from textmae_tpu.train.optim import configure_optimizers
    from textmae_tpu.train.state import TrainState

    tx = configure_optimizers(params_template)
    template = TrainState.create(params_template, tx)
    state, _ = restore_checkpoint(path, state_template=template)
    return state.params


class BestTracker:
    """Best-by-val-loss selection + copy (training.py:188-198 semantics)."""

    def __init__(self, directory: os.PathLike, prefix: str = "checkpoint"):
        self.directory = Path(directory)
        self.prefix = prefix
        # survive restarts: a fresh tracker starting at inf would let the
        # first post-restart epoch overwrite {prefix}_best with a worse
        # model; the JSON sidecar records the best loss across process lives
        self.best_loss = float("inf")
        try:
            import json

            with open(self._sidecar()) as f:
                self.best_loss = float(json.load(f)["val_loss"])
        except (OSError, ValueError, KeyError):
            pass

    def _sidecar(self) -> Path:
        return self.directory / f"{self.prefix}_best.json"

    def save(self, state, meta: Dict, epoch: int, val_loss: float) -> bool:
        meta = dict(meta, epoch=epoch, val_loss=float(val_loss))
        save_checkpoint(self.directory, f"{self.prefix}_epoch{epoch}", state, meta)
        is_best = val_loss < self.best_loss
        if is_best:
            self.best_loss = float(val_loss)
            save_checkpoint(self.directory, f"{self.prefix}_best", state, meta)
            if is_lead_process():
                import json

                with open(self._sidecar(), "w") as f:
                    json.dump({"val_loss": self.best_loss, "epoch": epoch}, f)
        return is_best


# ---------------------------------------------------------------------------
# torch -> flax import
# ---------------------------------------------------------------------------
def _load_torch_state_dict(path: os.PathLike) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    return {k: np.asarray(v) for k, v in ckpt.items()}


def _block_params(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    """One timm-style Block: torch `{prefix}.{norm1,attn.qkv,...}` -> flax tree."""
    t = lambda k: sd[f"{prefix}.{k}"]
    return {
        "norm1": {"scale": t("norm1.weight"), "bias": t("norm1.bias")},
        "attn": {
            "qkv": {"kernel": t("attn.qkv.weight").T, "bias": t("attn.qkv.bias")},
            "proj": {"kernel": t("attn.proj.weight").T, "bias": t("attn.proj.bias")},
        },
        "norm2": {"scale": t("norm2.weight"), "bias": t("norm2.bias")},
        "mlp": {
            "fc1": {"kernel": t("mlp.fc1.weight").T, "bias": t("mlp.fc1.bias")},
            "fc2": {"kernel": t("mlp.fc2.weight").T, "bias": t("mlp.fc2.bias")},
        },
    }


def mae_torch_to_flax(
    sd: Dict[str, np.ndarray],
    encoder_prefix: str = "encoder_blocks",
    decoder_prefix: str = "decoder_blocks",
) -> Dict:
    """Convert a torch MAE state dict to an MCM-shaped flax param subtree.

    Returns only the keys present in the source; merge with `merge_pretrained`.
    pos_embed buffers are intentionally dropped — ours are regenerated sincos
    tables at the target grid (the importer analog of interpolate_pos_embed,
    common/pos_embed.py:103-132).
    """
    out: Dict[str, Any] = {}
    if "patch_embed.proj.weight" in sd:
        out["encoder_embed"] = {
            "proj": {
                # torch conv OIHW -> flax HWIO
                "kernel": sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0),
                "bias": sd["patch_embed.proj.bias"],
            }
        }
    if "cls_token" in sd:
        out["cls_token"] = sd["cls_token"]
    if "mask_token" in sd:
        out["mask_token"] = sd["mask_token"]

    enc_ids = sorted(
        {int(m.group(1)) for k in sd if (m := re.match(r"blocks\.(\d+)\.", k))}
    )
    for i in enc_ids:
        out[f"{encoder_prefix}_{i}"] = _block_params(sd, f"blocks.{i}")
    if "norm.weight" in sd:
        out["encoder_norm"] = {"scale": sd["norm.weight"], "bias": sd["norm.bias"]}

    if "decoder_embed.weight" in sd:
        out["decoder_embed"] = {
            "kernel": sd["decoder_embed.weight"].T,
            "bias": sd["decoder_embed.bias"],
        }
    dec_ids = sorted(
        {int(m.group(1)) for k in sd if (m := re.match(r"decoder_blocks\.(\d+)\.", k))}
    )
    for i in dec_ids:
        out[f"{decoder_prefix}_{i}"] = _block_params(sd, f"decoder_blocks.{i}")
    if "decoder_norm.weight" in sd:
        out["decoder_norm"] = {
            "scale": sd["decoder_norm.weight"],
            "bias": sd["decoder_norm.bias"],
        }
    if "decoder_pred.weight" in sd:
        out["decoder_pred"] = {
            "kernel": sd["decoder_pred.weight"].T,
            "bias": sd["decoder_pred.bias"],
        }
    return out


def merge_pretrained(params: Dict, pretrained: Dict, strict_shapes: bool = True) -> Dict:
    """Overlay `pretrained` onto `params`, skipping shape mismatches (the
    reference drops mismatched `head.*` keys, training.py:167-173)."""
    params = jax.tree.map(lambda x: x, params)  # shallow copy

    def merge(dst, src, path=""):
        for k, v in src.items():
            if k not in dst:
                continue
            if isinstance(v, dict):
                merge(dst[k], v, f"{path}{k}.")
            else:
                if np.shape(dst[k]) != np.shape(v):
                    if strict_shapes:
                        raise ValueError(
                            f"shape mismatch at {path}{k}: "
                            f"{np.shape(dst[k])} vs {np.shape(v)}"
                        )
                    continue
                dst[k] = np.asarray(v, dtype=np.asarray(dst[k]).dtype)

    merge(params, pretrained)
    return params


def mae_flax_to_mcm(mae_params: Dict) -> Dict:
    """Flax-MAE params (models/mae.py) -> MCM-shaped param subtree.

    The in-framework analog of the reference's MAE-checkpoint surgery
    (training.py:163-176): lets a checkpoint pretrained with
    cli/mae_pretrain.py initialize the MCM encoder/decoder towers. Pure key
    rename — both models share ops/vit.py blocks and identical dims at
    base scale (768/12/12 enc, 512/8/16 dec), and both regenerate sincos
    pos-embeds (nothing to interpolate). Merge with `merge_pretrained`
    (non-strict: MCM-only modules — g_a/g_s, hyperprior, slice nets —
    keep their fresh init).
    """
    rename = {"patch_embed": "encoder_embed", "norm": "encoder_norm"}
    out = {}
    for k, v in mae_params.items():
        if k.startswith("blocks_"):
            out["encoder_" + k] = v
        else:
            out[rename.get(k, k)] = v
    return out


def _conv_oihw(w: np.ndarray) -> np.ndarray:
    return w.transpose(2, 3, 1, 0)  # torch OIHW -> flax HWIO


def mcm_torch_to_flax(sd: Dict[str, np.ndarray], config) -> Dict:
    """Full torch-MCM state dict -> textmae_tpu MCM flax params.

    The `MCM.from_state_dict` interop path (reference MCM.py:448): lets a
    torch-trained reference checkpoint drive this framework for R-D parity
    checks. Covers the transformer stacks, g_a/g_s (ConvTranspose 1x1 == conv
    with transposed IO), h_a, h_s (subpel convs keep torch PixelShuffle
    channel order), the 12 per-slice cc/lrp nets restacked into
    StackedSliceNet rows (layer-0 kernels zero-padded to the uniform support
    width), and compressai's EntropyBottleneck (_matrix/_bias/_factor i,
    quantiles). Fixed sincos pos-embeds and gaussian_conditional buffers are
    regenerated, not imported.
    """
    out = mae_torch_to_flax(
        {
            k.replace("encoder_blocks.", "blocks.")
            .replace("encoder_embed.", "patch_embed.")
            .replace("encoder_norm.", "norm."): v
            for k, v in sd.items()
            if not k.startswith(("g_a", "g_s", "h_a", "h_s", "cc_", "lrp_", "entropy", "gaussian"))
        }
    )
    # mae_torch_to_flax emitted patch_embed under "encoder_embed" name already
    g = config.group_ch
    m = config.max_support
    latent = config.latent_depth

    # --- g_a (Conv2d 1x1) / g_s (ConvTranspose2d 1x1) ---
    for name, transpose_io in (("g_a", False), ("g_s", True)):
        tree = {}
        idxs = sorted(
            int(mm.group(1)) for k in sd
            if (mm := re.match(rf"{name}\.(\d+)\.weight$", k))
        )
        for j, ti in enumerate(idxs):
            w = sd[f"{name}.{ti}.weight"]
            # Conv2d: (O, I, 1, 1); ConvTranspose2d: (I, O, 1, 1)
            kern = w.transpose(2, 3, 0, 1) if transpose_io else _conv_oihw(w)
            tree[f"conv_{j}"] = {"kernel": kern, "bias": sd[f"{name}.{ti}.bias"]}
        if tree:
            out[name] = tree

    # --- h_a ---
    ha_idxs = sorted(
        int(mm.group(1)) for k in sd if (mm := re.match(r"h_a\.(\d+)\.weight$", k))
    )
    for j, ti in enumerate(ha_idxs):
        out[f"h_a_{j}"] = {
            "conv": {
                "kernel": _conv_oihw(sd[f"h_a.{ti}.weight"]),
                "bias": sd[f"h_a.{ti}.bias"],
            }
        }

    # --- h_s mean / scale: conv at 0,4,8; subpel (Sequential .0) at 2,6 ---
    for prefix in ("h_s_mean", "h_s_scale"):
        for j, ti in enumerate((0, 2, 4, 6, 8)):
            key = f"{prefix}.{ti}.0.weight" if ti in (2, 6) else f"{prefix}.{ti}.weight"
            if key not in sd:
                continue
            bkey = key.replace("weight", "bias")
            out[f"{prefix}_{j}"] = {
                "conv": {"kernel": _conv_oihw(sd[key]), "bias": sd[bkey]}
            }

    # --- cc / lrp slice nets -> stacked rows ---
    for name in ("cc_transform_mean", "cc_transform_scale", "lrp_transform"):
        if f"{name}.0.0.weight" not in sd:
            continue
        num_slices = config.num_slices
        layer_idxs = sorted(
            int(mm.group(1)) for k in sd
            if (mm := re.match(rf"{name}\.0\.(\d+)\.weight$", k))
        )
        base_in = latent + g * (m + (1 if name == "lrp_transform" else 0))
        tree = {}
        for j, ti in enumerate(layer_idxs):
            kernels, biases = [], []
            for i in range(num_slices):
                w = _conv_oihw(sd[f"{name}.{i}.{ti}.weight"])  # (3,3,in_i,out)
                b = sd[f"{name}.{i}.{ti}.bias"]
                if j == 0 and w.shape[2] < base_in:
                    # reference layer-0 input width latent + g*min(i, m) [+g];
                    # embed into the uniform width, zero for absent channels.
                    # Channel order is [latent | slice0..slice5 (| y_hat)]:
                    # the lrp y_hat block sits at the END in our layout, so
                    # move it there when present.
                    pad = np.zeros(
                        (w.shape[0], w.shape[1], base_in, w.shape[3]), w.dtype
                    )
                    if name == "lrp_transform":
                        supp = w.shape[2] - latent - g  # g * min(i, m)
                        pad[:, :, : latent + supp] = w[:, :, : latent + supp]
                        pad[:, :, latent + g * m :] = w[:, :, latent + supp :]
                    else:
                        pad[:, :, : w.shape[2]] = w
                    w = pad
                kernels.append(w)
                biases.append(b)
            tree[f"kernel_{j}"] = np.stack(kernels)
            tree[f"bias_{j}"] = np.stack(biases)
        out[name] = tree

    # --- entropy bottleneck ---
    eb = {}
    for k, v in sd.items():
        mm = re.match(r"entropy_bottleneck\._(matrix|bias|factor)(\d+)$", k)
        if mm:
            eb[f"{mm.group(1)}_{mm.group(2)}"] = v
    if "entropy_bottleneck.quantiles" in sd:
        eb["quantiles"] = sd["entropy_bottleneck.quantiles"]
    if eb:
        out["entropy_bottleneck"] = eb
    return out


def load_mcm_torch_checkpoint(params: Dict, path: os.PathLike, config) -> Dict:
    """Reference-trained MCM torch checkpoint -> merged flax params."""
    if getattr(config, "canonical_keep_order", False):
        raise ValueError(
            "reference-trained checkpoints expect the reference's score-ordered "
            "kept tokens; construct MCMConfig(canonical_keep_order=False)"
        )
    sd = _load_torch_state_dict(path)
    return merge_pretrained(params, mcm_torch_to_flax(sd, config), strict_shapes=True)


def mcm_flax_to_torch(params: Dict, config) -> Dict[str, np.ndarray]:
    """Inverse of mcm_torch_to_flax: textmae_tpu MCM params -> a reference-
    layout torch state dict (so weights trained here can drive the original
    PyTorch MCM; two-way interop for R-D parity checks).

    Stacked slice nets are split back into 12 ragged per-slice nets by
    cropping the zero-padded layer-0 input channels; fixed sincos pos-embeds
    are regenerated torch-side by the reference itself (not exported).
    """
    params = jax.tree.map(np.asarray, params)
    g, m, latent = config.group_ch, config.max_support, config.latent_depth
    sd: Dict[str, np.ndarray] = {}

    def put_block(prefix: str, tree: Dict):
        sd[f"{prefix}.norm1.weight"] = tree["norm1"]["scale"]
        sd[f"{prefix}.norm1.bias"] = tree["norm1"]["bias"]
        sd[f"{prefix}.attn.qkv.weight"] = tree["attn"]["qkv"]["kernel"].T
        sd[f"{prefix}.attn.qkv.bias"] = tree["attn"]["qkv"]["bias"]
        sd[f"{prefix}.attn.proj.weight"] = tree["attn"]["proj"]["kernel"].T
        sd[f"{prefix}.attn.proj.bias"] = tree["attn"]["proj"]["bias"]
        sd[f"{prefix}.norm2.weight"] = tree["norm2"]["scale"]
        sd[f"{prefix}.norm2.bias"] = tree["norm2"]["bias"]
        sd[f"{prefix}.mlp.fc1.weight"] = tree["mlp"]["fc1"]["kernel"].T
        sd[f"{prefix}.mlp.fc1.bias"] = tree["mlp"]["fc1"]["bias"]
        sd[f"{prefix}.mlp.fc2.weight"] = tree["mlp"]["fc2"]["kernel"].T
        sd[f"{prefix}.mlp.fc2.bias"] = tree["mlp"]["fc2"]["bias"]

    sd["encoder_embed.proj.weight"] = params["encoder_embed"]["proj"]["kernel"].transpose(3, 2, 0, 1)
    sd["encoder_embed.proj.bias"] = params["encoder_embed"]["proj"]["bias"]
    sd["cls_token"] = params["cls_token"]
    sd["mask_token"] = params["mask_token"]
    for i in range(config.encoder_depth):
        put_block(f"encoder_blocks.{i}", params[f"encoder_blocks_{i}"])
    sd["encoder_norm.weight"] = params["encoder_norm"]["scale"]
    sd["encoder_norm.bias"] = params["encoder_norm"]["bias"]
    sd["decoder_embed.weight"] = params["decoder_embed"]["kernel"].T
    sd["decoder_embed.bias"] = params["decoder_embed"]["bias"]
    for i in range(config.decoder_depth):
        put_block(f"decoder_blocks.{i}", params[f"decoder_blocks_{i}"])
    sd["decoder_norm.weight"] = params["decoder_norm"]["scale"]
    sd["decoder_norm.bias"] = params["decoder_norm"]["bias"]
    sd["decoder_pred.weight"] = params["decoder_pred"]["kernel"].T
    sd["decoder_pred.bias"] = params["decoder_pred"]["bias"]

    for j in range(4):  # g_a Conv2d / g_s ConvTranspose2d, 1x1
        k = params["g_a"][f"conv_{j}"]
        sd[f"g_a.{2 * j}.weight"] = k["kernel"].transpose(3, 2, 0, 1)
        sd[f"g_a.{2 * j}.bias"] = k["bias"]
        k = params["g_s"][f"conv_{j}"]
        sd[f"g_s.{2 * j}.weight"] = k["kernel"].transpose(2, 3, 0, 1)
        sd[f"g_s.{2 * j}.bias"] = k["bias"]
    for j in range(5):
        k = params[f"h_a_{j}"]["conv"]
        sd[f"h_a.{2 * j}.weight"] = k["kernel"].transpose(3, 2, 0, 1)
        sd[f"h_a.{2 * j}.bias"] = k["bias"]
    for prefix in ("h_s_mean", "h_s_scale"):
        for j, ti in enumerate((0, 2, 4, 6, 8)):
            k = params[f"{prefix}_{j}"]["conv"]
            key = f"{prefix}.{ti}.0" if ti in (2, 6) else f"{prefix}.{ti}"
            sd[f"{key}.weight"] = k["kernel"].transpose(3, 2, 0, 1)
            sd[f"{key}.bias"] = k["bias"]

    for name, extra in (
        ("cc_transform_mean", 0), ("cc_transform_scale", 0), ("lrp_transform", g),
    ):
        tree = params[name]
        n_layers = len([k for k in tree if k.startswith("kernel_")])
        for i in range(config.num_slices):
            s = min(i, m)
            for j in range(n_layers):
                w = tree[f"kernel_{j}"][i]  # (3,3,in,out) HWIO
                if j == 0:
                    if name == "lrp_transform":
                        w = np.concatenate(
                            [w[:, :, : latent + g * s], w[:, :, latent + g * m :]],
                            axis=2,
                        )
                    else:
                        w = w[:, :, : latent + g * s]
                sd[f"{name}.{i}.{2 * j}.weight"] = w.transpose(3, 2, 0, 1)
                sd[f"{name}.{i}.{2 * j}.bias"] = tree[f"bias_{j}"][i]

    eb = params["entropy_bottleneck"]
    for k, v in eb.items():
        mm = re.match(r"(matrix|bias|factor)_(\d+)$", k)
        if mm:
            sd[f"entropy_bottleneck._{mm.group(1)}{mm.group(2)}"] = v
    sd["entropy_bottleneck.quantiles"] = eb["quantiles"]
    return sd


def convert_vgg16_state_dict(path: os.PathLike, params: Dict) -> Dict:
    """torchvision vgg16 state dict -> VGG16Features flax params.

    Accepts a full vgg16 dict (`features.N.weight`) or a bare features dict
    (`N.weight`); conv weights transpose OIHW -> HWIO. Only the first 10 convs
    (through relu4_3) are consumed — the loss never looks deeper
    (reference loss/vgg.py:22-30).
    """
    sd = _load_torch_state_dict(path)
    conv_keys = sorted(
        (
            int(m.group(1))
            for k in sd
            if (m := re.match(r"(?:features\.)?(\d+)\.weight$", k))
            and sd[k].ndim == 4
        ),
    )
    params = jax.tree.map(np.asarray, params)
    for i, layer_idx in enumerate(conv_keys):
        name = f"conv_{i}"
        if name not in params:
            break
        prefix = f"features.{layer_idx}" if f"features.{layer_idx}.weight" in sd else str(layer_idx)
        params[name] = {
            "kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"{prefix}.bias"],
        }
    return params


def load_mae_pretrained(params: Dict, path: os.PathLike, strict_shapes: bool = False) -> Dict:
    """training.py:163-176 equivalent: torch MAE ckpt -> merged MCM params."""
    sd = _load_torch_state_dict(path)
    return merge_pretrained(params, mae_torch_to_flax(sd), strict_shapes=strict_shapes)
