"""FLOPs/MFU accounting (utils/flops.py) used by the bench scoreboard."""
import jax
import jax.numpy as jnp
import numpy as np

from textmae_tpu.utils import chip_peak_flops, compiled_flops, mfu
from textmae_tpu.utils.flops import _PEAKS


def test_compiled_flops_matmul_exact():
    f = jax.jit(lambda a, b: a @ b)
    x = jnp.ones((128, 128), jnp.float32)
    assert compiled_flops(f, x, x) == 2 * 128**3


def test_chip_peak_none_off_tpu():
    # conftest pins the CPU backend; MFU must be omitted, not fabricated
    assert chip_peak_flops() is None
    assert mfu(1e12) is None


def test_peak_table_kind_strings():
    class FakeDev:
        platform = "tpu"

        def __init__(self, kind):
            self.device_kind = kind

    # the tunnel chip reports "TPU v5 lite" (measured); v5e peak is 197 T
    assert chip_peak_flops(FakeDev("TPU v5 lite")) == 197e12
    assert chip_peak_flops(FakeDev("TPU v4")) == 275e12
    assert chip_peak_flops(FakeDev("TPU v6 lite")) == 918e12
    assert chip_peak_flops(FakeDev("weird accelerator")) is None


def test_mcm_forward_flops_scale():
    """XLA's cost analysis on the real model: forward FLOPs must be within
    2x of the hand-derived transformer-core floor (sanity against unit
    errors like counting bytes or macs)."""
    from textmae_tpu.models.mcm import MCM, MCMConfig

    cfg = MCMConfig(
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
    model = MCM(cfg)
    r = np.random.default_rng(0)
    imgs = jnp.asarray(r.random((2, 3, 96, 96), np.float32))
    scores = jnp.asarray(r.random((2, cfg.num_patches), np.float32))
    variables = jax.jit(lambda k: model.init(
        {"params": k, "noise": k}, imgs, scores,
        training=False, compute_loss=False,
    ))(jax.random.PRNGKey(0))
    from textmae_tpu.utils.flops import _block_flops, _conv3_flops

    # per-component: analytic counts matmul/conv terms only, so it must land
    # just BELOW the compiled count (XLA adds elementwise gelu/softmax/norm
    # flops) but within 30% of it
    enc = jax.jit(lambda x, s: model.apply(
        variables, x, s, method=model.forward_encoder
    ))
    got = compiled_flops(enc, imgs, scores)
    want = 2 * (
        2 * cfg.num_patches * cfg.encoder_embed_dim * (16 * 16 * 3)
        + cfg.encoder_depth
        * _block_flops(cfg.num_keep_patches + 1, cfg.encoder_embed_dim, 4.0)
    )
    assert 0.7 * got < want <= got, (want, got)

    xr, ids = enc(imgs, scores)
    dec = jax.jit(lambda a, b: model.apply(
        variables, a, b, method=model.forward_decoder
    ))
    got = compiled_flops(dec, xr, ids)
    L, D = cfg.num_patches, cfg.decoder_embed_dim
    want = 2 * (
        2 * cfg.num_keep_patches * cfg.encoder_embed_dim * D
        + cfg.decoder_depth * _block_flops(L + 1, D, 4.0)
        + 2 * (L + 1) * D * (256 * 3)
    )
    assert 0.7 * got < want <= got, (want, got)

    ha = jax.jit(lambda y: model.apply(variables, y, method=model.run_h_a))
    y = jnp.ones((2, 4, 4, cfg.latent_depth))
    got = compiled_flops(ha, y)
    s, want = 4, 0.0
    for ci, co, st in zip(
        (cfg.latent_depth,) + cfg.ha_channels, cfg.ha_channels, (1, 1, 2, 1, 2)
    ):
        want += 2 * _conv3_flops(s, s, ci, co, st)
        s = -(-s // st)
    assert 0.7 * got < want <= got, (want, got)

    # full forward: XLA's cost analysis counts the lax.scan slice-chain body
    # ONCE (not x num_slices), so the compiled total under-counts; the
    # analytic total (what bench MFU uses) must bracket it accordingly
    from textmae_tpu.utils.flops import mcm_forward_flops

    fwd = jax.jit(lambda x, s: model.apply(
        variables, x, s, training=False, compute_loss=False
    ))
    flops = compiled_flops(fwd, imgs, scores)
    analytic = mcm_forward_flops(cfg, batch=2)
    assert 0.9 * flops < analytic < 1.6 * flops, (analytic, flops)


def test_unet_vae_flops_vs_cost_analysis():
    """Refiner FLOPs estimators (bench refine_mfu) vs XLA's own cost
    analysis on the compiled tiny-dims programs: the analytic count covers
    matmul/conv terms only, so it must land just below the compiled count
    but within 30% of it (same bracketing contract as the MCM estimator)."""
    from textmae_tpu.diffusion import (
        AutoencoderKL, RefinerConfig, UNet2DCondition,
    )
    from textmae_tpu.utils.flops import (
        unet_forward_flops, vae_roundtrip_flops,
    )

    cfg = RefinerConfig.tiny()
    ucfg = cfg.unet
    unet = UNet2DCondition(ucfg)
    n, lh, lw, t = 2, 8, 8, 7
    sample = jnp.zeros((n, lh, lw, ucfg.in_channels))
    ctx = jnp.zeros((n, t, ucfg.cross_attention_dim))
    pooled = jnp.zeros((n, ucfg.pooled_projection_dim))
    tids = jnp.zeros((n, ucfg.num_time_ids))
    params = jax.jit(
        lambda r: unet.init(r, sample, jnp.float32(1.0), ctx, pooled, tids)
    )(jax.random.PRNGKey(0))
    fwd = jax.jit(lambda s, c, p, i: unet.apply(params, s, jnp.float32(1.0), c, p, i))
    got = compiled_flops(fwd, sample, ctx, pooled, tids)
    want = unet_forward_flops(ucfg, lh, lw, t, batch=n)
    assert 0.7 * got < want <= got, (want, got)

    vae = AutoencoderKL(cfg.vae)
    img = jnp.zeros((n, 16, 16, 3))
    vparams = jax.jit(lambda r: vae.init(r, img))(jax.random.PRNGKey(1))
    vfwd = jax.jit(lambda x: vae.apply(vparams, x))
    vgot = compiled_flops(vfwd, img)
    vwant = vae_roundtrip_flops(cfg.vae, 16, 16, batch=n)
    assert 0.7 * vgot < vwant <= vgot, (vwant, vgot)


def test_refiner_flops_composition():
    """refiner_forward_flops = VAE round trip + run-steps x CFG-doubled
    UNet (the scan trip count the compiled analysis cannot see)."""
    from textmae_tpu.diffusion import RefinerConfig
    from textmae_tpu.utils.flops import (
        refiner_forward_flops, unet_forward_flops, vae_roundtrip_flops,
    )

    cfg = RefinerConfig.tiny()  # 4 steps, strength 0.5 -> 2 run steps
    h = w = 32
    factor = 2 ** (len(cfg.vae.block_out_channels) - 1)
    want = vae_roundtrip_flops(cfg.vae, h, w, 1) + 2 * unet_forward_flops(
        cfg.unet, h // factor, w // factor, cfg.text.max_length, batch=2
    )
    assert refiner_forward_flops(cfg, h, w, 1) == want
