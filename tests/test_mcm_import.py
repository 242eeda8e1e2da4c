"""Torch-MCM checkpoint importer tests: key mapping, ragged->stacked embedding."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from textmae_tpu.models.mcm import MCM, MCMConfig
from textmae_tpu.models.slice_nets import StackedSliceNet
from textmae_tpu.train.checkpoint import mcm_torch_to_flax, merge_pretrained

TINY = MCMConfig(
    img_size=96,
    encoder_embed_dim=32,
    encoder_depth=2,
    encoder_num_heads=2,
    decoder_embed_dim=16,
    decoder_depth=1,
    decoder_num_heads=2,
    latent_depth=24,
    hyperprior_depth=16,
    num_slices=4,
    num_keep_patches=16,
    use_pallas=False,
)


def _block(sd, prefix, dim, rng):
    sd.update({
        f"{prefix}.norm1.weight": np.ones(dim, np.float32),
        f"{prefix}.norm1.bias": np.zeros(dim, np.float32),
        f"{prefix}.attn.qkv.weight": rng.standard_normal((3 * dim, dim)).astype(np.float32),
        f"{prefix}.attn.qkv.bias": np.zeros(3 * dim, np.float32),
        f"{prefix}.attn.proj.weight": rng.standard_normal((dim, dim)).astype(np.float32),
        f"{prefix}.attn.proj.bias": np.zeros(dim, np.float32),
        f"{prefix}.norm2.weight": np.ones(dim, np.float32),
        f"{prefix}.norm2.bias": np.zeros(dim, np.float32),
        f"{prefix}.mlp.fc1.weight": rng.standard_normal((4 * dim, dim)).astype(np.float32),
        f"{prefix}.mlp.fc1.bias": np.zeros(4 * dim, np.float32),
        f"{prefix}.mlp.fc2.weight": rng.standard_normal((dim, 4 * dim)).astype(np.float32),
        f"{prefix}.mlp.fc2.bias": np.zeros(dim, np.float32),
    })


def synthetic_mcm_sd(cfg: MCMConfig, seed=0):
    """Reference-shaped (MCM.py) torch state dict with random values."""
    r = np.random.default_rng(seed)
    e, d, latent, hyper = (
        cfg.encoder_embed_dim, cfg.decoder_embed_dim, cfg.latent_depth, cfg.hyperprior_depth,
    )
    g, m, S = cfg.group_ch, cfg.max_support, cfg.num_slices
    p = cfg.patch_size
    f32 = lambda *s: r.standard_normal(s).astype(np.float32) * 0.05
    sd = {
        "encoder_embed.proj.weight": f32(e, 3, p, p),
        "encoder_embed.proj.bias": f32(e),
        "cls_token": f32(1, 1, e),
        "mask_token": f32(1, 1, d),
        "encoder_norm.weight": np.ones(e, np.float32),
        "encoder_norm.bias": np.zeros(e, np.float32),
        "decoder_embed.weight": f32(d, e),
        "decoder_embed.bias": f32(d),
        "decoder_norm.weight": np.ones(d, np.float32),
        "decoder_norm.bias": np.zeros(d, np.float32),
        "decoder_pred.weight": f32(p * p * 3, d),
        "decoder_pred.bias": f32(p * p * 3),
    }
    for i in range(cfg.encoder_depth):
        _block(sd, f"encoder_blocks.{i}", e, r)
    for i in range(cfg.decoder_depth):
        _block(sd, f"decoder_blocks.{i}", d, r)

    ga = cfg.ga_channels
    dims = (e,) + tuple(ga)
    for j in range(4):
        sd[f"g_a.{2 * j}.weight"] = f32(dims[j + 1], dims[j], 1, 1)
        sd[f"g_a.{2 * j}.bias"] = f32(dims[j + 1])
    gs = cfg.gs_channels
    dims = (latent,) + tuple(gs)
    for j in range(4):
        # ConvTranspose2d: (in, out, 1, 1)
        sd[f"g_s.{2 * j}.weight"] = f32(dims[j], dims[j + 1], 1, 1)
        sd[f"g_s.{2 * j}.bias"] = f32(dims[j + 1])
    ha = cfg.ha_channels
    dims = (latent,) + tuple(ha)
    for j in range(5):
        sd[f"h_a.{2 * j}.weight"] = f32(dims[j + 1], dims[j], 3, 3)
        sd[f"h_a.{2 * j}.bias"] = f32(dims[j + 1])
    hs = cfg.hs_channels
    dims = (hyper,) + tuple(hs)
    for prefix in ("h_s_mean", "h_s_scale"):
        for j, ti in enumerate((0, 2, 4, 6, 8)):
            mult = 4 if ti in (2, 6) else 1  # subpel convs emit out*r^2
            key = f"{prefix}.{ti}.0" if ti in (2, 6) else f"{prefix}.{ti}"
            sd[f"{key}.weight"] = f32(dims[j + 1] * mult, dims[j], 3, 3)
            sd[f"{key}.bias"] = f32(dims[j + 1] * mult)
    cc = cfg.cc_channels
    for name, extra in (("cc_transform_mean", 0), ("cc_transform_scale", 0), ("lrp_transform", g)):
        for i in range(S):
            in0 = latent + g * min(i, m) + extra
            dims = (in0,) + tuple(cc)
            for j in range(5):
                sd[f"{name}.{i}.{2 * j}.weight"] = f32(dims[j + 1], dims[j], 3, 3)
                sd[f"{name}.{i}.{2 * j}.bias"] = f32(dims[j + 1])
    filters = (1, 3, 3, 3, 3, 1)
    for j in range(5):
        sd[f"entropy_bottleneck._matrix{j}"] = f32(hyper, filters[j + 1], filters[j])
        sd[f"entropy_bottleneck._bias{j}"] = f32(hyper, filters[j + 1], 1)
        if j < 4:
            sd[f"entropy_bottleneck._factor{j}"] = f32(hyper, filters[j + 1], 1)
    sd["entropy_bottleneck.quantiles"] = f32(hyper, 1, 3)
    return sd


@pytest.fixture(scope="module")
def setup():
    model = MCM(TINY)
    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)
    imgs = jnp.asarray(r.random((1, 3, 96, 96), np.float32))
    scores = jnp.asarray(r.random((1, TINY.num_patches), np.float32))
    variables = jax.jit(lambda r, x, s: model.init(
        {"params": r, "noise": r}, x, s, training=False, compute_loss=False
    ))(rng, imgs, scores)
    return model, variables["params"], imgs, scores


def test_full_import_strict_shapes(setup):
    """Every converted tensor lands with the exact expected shape."""
    model, params, imgs, scores = setup
    sd = synthetic_mcm_sd(TINY)
    converted = mcm_torch_to_flax(sd, TINY)
    merged = merge_pretrained(params, converted, strict_shapes=True)
    out = model.apply(
        {"params": merged}, imgs, scores, training=False, compute_loss=False
    )
    assert np.isfinite(np.asarray(out["x_hat"]).sum())
    # entropy bottleneck came through
    np.testing.assert_allclose(
        np.asarray(merged["entropy_bottleneck"]["quantiles"]),
        sd["entropy_bottleneck.quantiles"],
    )


def test_import_covers_all_params(setup):
    """Only pos-embeds (regenerated) may be missing from the converted tree."""
    _, params, _, _ = setup
    converted = mcm_torch_to_flax(synthetic_mcm_sd(TINY), TINY)

    def flatten(d, prefix=""):
        for k, v in d.items():
            if isinstance(v, dict):
                yield from flatten(v, f"{prefix}{k}/")
            else:
                yield f"{prefix}{k}"

    missing = set(flatten(params)) - set(flatten(converted))
    assert missing == set(), f"unconverted params: {missing}"


def test_ragged_embedding_semantics(setup):
    """Zero-padded stacked layer-0 == the reference's ragged conv on the
    corresponding ragged input, for both cc and lrp channel layouts."""
    _, params, _, _ = setup
    cfg = TINY
    g, m, latent = cfg.group_ch, cfg.max_support, cfg.latent_depth
    sd = synthetic_mcm_sd(cfg)
    converted = mcm_torch_to_flax(sd, cfg)
    r = np.random.default_rng(1)

    for name, extra in (("cc_transform_mean", 0), ("lrp_transform", g)):
        for i in range(cfg.num_slices):
            s = min(i, m)
            in0 = latent + g * s + extra
            ragged_w = sd[f"{name}.{i}.0.weight"]  # (out, in0, 3, 3)
            ragged_b = sd[f"{name}.{i}.0.bias"]
            x_ragged = r.standard_normal((1, 4, 4, in0)).astype(np.float32)

            # reference computation: direct conv on the ragged input
            ref = jax.lax.conv_general_dilated(
                jnp.asarray(x_ragged),
                jnp.asarray(ragged_w.transpose(2, 3, 1, 0)),
                (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + ragged_b

            # our computation: padded input through the stacked row
            x_pad = np.zeros((1, 4, 4, latent + g * m + extra), np.float32)
            if name == "lrp_transform":
                x_pad[..., : latent + g * s] = x_ragged[..., : latent + g * s]
                x_pad[..., latent + g * m :] = x_ragged[..., latent + g * s :]
            else:
                x_pad[..., :in0] = x_ragged
            kern = jnp.asarray(converted[name]["kernel_0"][i])
            bias = jnp.asarray(converted[name]["bias_0"][i])
            ours = jax.lax.conv_general_dilated(
                jnp.asarray(x_pad), kern, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias
            np.testing.assert_allclose(
                np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-5,
                err_msg=f"{name} slice {i}",
            )


def test_config_validation():
    with pytest.raises(ValueError, match="divisible"):
        MCMConfig(img_size=100)
    with pytest.raises(ValueError, match="num_slices"):
        MCMConfig(latent_depth=100, num_slices=12)
    with pytest.raises(ValueError, match="exceeds"):
        MCMConfig(img_size=96, num_keep_patches=144)
    with pytest.raises(ValueError, match="4x4"):
        MCMConfig(num_keep_patches=9)
    with pytest.raises(ValueError, match="perfect square"):
        MCMConfig(num_keep_patches=145)


def test_flax_to_torch_roundtrip(setup):
    """export(import(sd)) == sd for every reference key (two-way interop)."""
    from textmae_tpu.train.checkpoint import mcm_flax_to_torch

    _, params, _, _ = setup
    sd = synthetic_mcm_sd(TINY)
    merged = merge_pretrained(params, mcm_torch_to_flax(sd, TINY), strict_shapes=True)
    exported = mcm_flax_to_torch(merged, TINY)
    missing = set(sd) - set(exported)
    assert missing == set(), f"unexported keys: {missing}"
    for k in sd:
        np.testing.assert_array_equal(exported[k], sd[k], err_msg=k)


def test_mae_flax_to_mcm_init(setup):
    """Flax-MAE pretrain -> MCM tower init (the in-framework analog of the
    reference's MAE-checkpoint surgery, training.py:163-176): every MAE
    encoder/decoder param lands on its MCM counterpart; MCM-only modules
    keep their fresh init."""
    from textmae_tpu.models.mae import MAEConfig, MaskedAutoencoderViT
    from textmae_tpu.train.checkpoint import mae_flax_to_mcm

    _, params, imgs, _ = setup
    mae = MaskedAutoencoderViT(MAEConfig(
        img_size=96,
        embed_dim=32, depth=2, num_heads=2,
        decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2,
        use_pallas=False,
    ))
    mae_params = jax.jit(lambda r, x: mae.init(
        {"params": r, "mask": r}, x, 0.75
    ))(jax.random.PRNGKey(1), imgs)["params"]

    converted = mae_flax_to_mcm(mae_params)
    merged = merge_pretrained(params, converted, strict_shapes=True)

    # every converted key exists in the MCM tree and was copied verbatim
    def leaves(tree, prefix=""):
        for k, v in tree.items():
            if isinstance(v, dict):
                yield from leaves(v, f"{prefix}{k}.")
            else:
                yield f"{prefix}{k}", v

    merged_flat = dict(leaves(merged))
    converted_flat = dict(leaves(converted))
    params_flat = dict(leaves(params))
    assert set(converted_flat) <= set(merged_flat)
    # the MAE covers both towers: blocks, norms, embeds, tokens, pred
    for want in ("encoder_blocks_0.", "encoder_norm.", "encoder_embed.",
                 "cls_token", "decoder_blocks_0.", "decoder_norm.",
                 "decoder_embed.", "mask_token", "decoder_pred."):
        assert any(k.startswith(want) for k in converted_flat), want
    for k, v in converted_flat.items():
        np.testing.assert_array_equal(merged_flat[k], np.asarray(v), err_msg=k)
    # MCM-only modules untouched
    for k in params_flat:
        if k.startswith(("g_a.", "g_s.", "h_a.", "entropy_bottleneck.")):
            np.testing.assert_array_equal(
                merged_flat[k], np.asarray(params_flat[k]), err_msg=k
            )
