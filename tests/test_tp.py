"""Tensor-parallel sharding tests on the 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from textmae_tpu.models.mcm import MCM, MCMConfig
from textmae_tpu.parallel import make_mesh, shard_batch, shard_params, transformer_param_shardings
from textmae_tpu.train import TrainState, configure_optimizers, make_train_step

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


@pytest.fixture(scope="module")
def setup():
    model = MCM(TINY)
    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)
    imgs = jnp.asarray(r.random((4, 3, 96, 96), np.float32))
    scores = jnp.asarray(r.random((4, TINY.num_patches), np.float32))
    params = jax.jit(lambda r, x, s: model.init(
        {"params": r, "noise": r}, x, s, training=False, compute_loss=False
    ))(rng, imgs, scores)["params"]
    return model, params, imgs, scores


def test_sharding_rules_specs(setup):
    _, params, _, _ = setup
    mesh = make_mesh({"data": 4, "model": 2})
    shardings = transformer_param_shardings(params, mesh)
    blk = shardings["encoder_blocks_0"]
    assert blk["attn"]["qkv"]["kernel"].spec == P(None, "model")
    assert blk["attn"]["proj"]["kernel"].spec == P("model", None)
    assert blk["mlp"]["fc1"]["kernel"].spec == P(None, "model")
    assert blk["mlp"]["fc2"]["kernel"].spec == P("model", None)
    assert blk["attn"]["qkv"]["bias"].spec == P("model")
    assert blk["norm1"]["scale"].spec == P()  # replicated
    assert shardings["entropy_bottleneck"]["quantiles"].spec == P()


def test_tp_dp_train_step_matches_replicated(setup):
    """One dp4 x tp2 train step must equal the single-device step numerically."""
    model, params, imgs, scores = setup
    tx = configure_optimizers(params)
    batch = {"imgs": imgs, "scores": scores}
    rng = jax.random.PRNGKey(7)

    step = make_train_step(model, tx, lmbda=1e-4, donate=False)
    _, base = step(TrainState.create(params, tx), batch, rng)

    mesh = make_mesh({"data": 4, "model": 2})
    params_tp = shard_params(params, mesh)
    state_tp = TrainState.create(params_tp, tx)
    batch_tp = shard_batch(batch, mesh, axis="data")
    step_tp = make_train_step(model, tx, lmbda=1e-4, donate=False)
    state_tp, metrics = step_tp(state_tp, batch_tp, rng)
    # sharded params actually landed distributed
    qkv = state_tp.params["encoder_blocks_0"]["attn"]["qkv"]["kernel"]
    assert len(qkv.sharding.device_set) >= 2
    np.testing.assert_allclose(
        float(metrics["loss"]), float(base["loss"]), rtol=5e-4
    )


def test_host_local_value_roundtrip():
    """host_local_value assembles a TP-sharded array from local shards and
    passes replicated/unsharded arrays straight through (mesh.py)."""
    from textmae_tpu.parallel.mesh import host_local_value

    mesh = make_mesh({"data": 2, "model": 4})
    x = np.arange(64, dtype=np.float32).reshape(8, 8)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharded = jax.device_put(x, NamedSharding(mesh, P(None, "model")))
    np.testing.assert_array_equal(host_local_value(sharded), x)
    repl = jax.device_put(x, NamedSharding(mesh, P()))
    np.testing.assert_array_equal(host_local_value(repl), x)
    np.testing.assert_array_equal(host_local_value(jax.numpy.asarray(x)), x)
