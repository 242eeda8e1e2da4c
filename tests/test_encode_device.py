"""The single-jit encode_device research path agrees with the codec's
shared-program chain on well-separated (non-borderline) inputs."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from textmae_tpu.entropy.gaussian import get_scale_table
from textmae_tpu.eval import MCMCodec
from textmae_tpu.models.mcm import MCM, MCMConfig

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


def test_encode_device_matches_chain():
    model = MCM(TINY)
    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)
    imgs = jnp.asarray(r.random((2, 3, 96, 96), np.float32))
    scores = jnp.asarray(r.random((2, TINY.num_patches), np.float32))
    variables = jax.jit(lambda r, x, s: model.init(
        {"params": r, "noise": r}, x, s, training=False, compute_loss=False
    ))(rng, imgs, scores)
    st = jnp.asarray(get_scale_table())
    out = jax.jit(
        lambda v, i, s: model.apply(v, i, s, st, method=MCM.encode_device)
    )(variables, imgs, scores)

    codec = MCMCodec(model, variables)
    front = codec._front(variables, imgs, scores)
    lm, ls = codec._hyper(variables, front["z_sym"])
    syms, idxs, _ = codec._run_slice_chain(front["y"], lm, ls)

    np.testing.assert_array_equal(np.asarray(out["z_sym"]), np.asarray(front["z_sym"]))
    np.testing.assert_array_equal(np.asarray(out["symbols"]), np.asarray(syms))
    np.testing.assert_array_equal(np.asarray(out["indexes"]), np.asarray(idxs).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(out["ids_restore"]), np.asarray(front["ids_restore"])
    )
