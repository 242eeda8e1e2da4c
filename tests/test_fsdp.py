"""FSDP (ZeRO-3 placement) tests on the 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from textmae_tpu.models.mcm import MCM, MCMConfig
from textmae_tpu.parallel import (
    fsdp_param_shardings,
    make_mesh,
    shard_batch,
    shard_params_fsdp,
)
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
    imgs = jnp.asarray(r.random((8, 3, 96, 96), np.float32))
    scores = jnp.asarray(r.random((8, TINY.num_patches), np.float32))
    params = jax.jit(lambda r, x, s: model.init(
        {"params": r, "noise": r}, x, s, training=False, compute_loss=False
    ))(rng, imgs, scores)["params"]
    return model, params, imgs, scores


def test_fsdp_specs(setup):
    _, params, _, _ = setup
    mesh = make_mesh({"data": 8})
    sh = fsdp_param_shardings(params, mesh, min_size=256)
    blk = sh["encoder_blocks_0"]
    # qkv kernel (32, 96): largest dim divisible by 8 is 96 -> axis 1
    assert blk["attn"]["qkv"]["kernel"].spec == P(None, "data")
    # fc1 kernel (32, 128): 128 on axis 1
    assert blk["mlp"]["fc1"]["kernel"].spec == P(None, "data")
    # LayerNorm scale (32,): below min_size -> replicated
    assert blk["norm1"]["scale"].spec == P()
    # a tiny leaf replicates even when divisible
    tiny = fsdp_param_shardings(params, mesh, min_size=2**20)
    assert tiny["encoder_blocks_0"]["attn"]["qkv"]["kernel"].spec == P()


def test_fsdp_tp_composition_specs(setup):
    _, params, _, _ = setup
    mesh = make_mesh({"data": 4, "model": 2})
    sh = fsdp_param_shardings(params, mesh, min_size=256, tp_axis="model")
    blk = sh["encoder_blocks_0"]
    # column-parallel qkv (32, 96): TP takes axis 1, FSDP gets axis 0
    assert blk["attn"]["qkv"]["kernel"].spec == P("data", "model")
    # row-parallel proj (32, 32): TP takes axis 0, FSDP gets axis 1
    assert blk["attn"]["proj"]["kernel"].spec == P("model", "data")
    # 1-dim TP bias has no free dim left -> stays TP-only
    assert blk["attn"]["qkv"]["bias"].spec == P("model")


def test_fsdp_actually_shards_memory(setup):
    """Each device must hold 1/8 of a sharded kernel, and moments inherit."""
    _, params, _, _ = setup
    mesh = make_mesh({"data": 8})
    p = shard_params_fsdp(params, mesh, min_size=256)
    kern = p["encoder_blocks_0"]["mlp"]["fc1"]["kernel"]
    shard = kern.addressable_shards[0]
    assert shard.data.size == kern.size // 8
    # Adam moments created from sharded params carry the same layout
    tx = configure_optimizers(p)
    state = TrainState.create(p, tx)
    found = False
    def scan(tree):
        nonlocal found
        for leaf in jax.tree_util.tree_leaves(tree):
            if hasattr(leaf, "sharding") and leaf.shape == kern.shape:
                assert leaf.sharding.spec == kern.sharding.spec
                found = True
    scan(state.opt_state)
    assert found, "no moment leaf matched the sharded kernel shape"


@pytest.mark.slow  # ~54s: the FSDP x TP composition test covers the base ZeRO-3 mechanics by default
def test_fsdp_train_step_matches_replicated(setup):
    """One dp8 ZeRO-3 train step must equal the replicated step numerically."""
    model, params, imgs, scores = setup
    tx = configure_optimizers(params)
    batch = {"imgs": imgs, "scores": scores}
    rng = jax.random.PRNGKey(7)

    step = make_train_step(model, tx, lmbda=1e-4, donate=False)
    base_state, base = step(TrainState.create(params, tx), batch, rng)

    mesh = make_mesh({"data": 8})
    p = shard_params_fsdp(params, mesh, min_size=256)
    state = TrainState.create(p, tx)
    sbatch = shard_batch(batch, mesh, axis="data")
    step_f = make_train_step(model, tx, lmbda=1e-4, donate=False)
    state, metrics = step_f(state, sbatch, rng)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(base["loss"]), rtol=5e-4
    )
    # updated params still live sharded and match the replicated update
    kern = state.params["encoder_blocks_0"]["mlp"]["fc1"]["kernel"]
    assert len(kern.sharding.device_set) == 8
    np.testing.assert_allclose(
        np.asarray(kern),
        np.asarray(base_state.params["encoder_blocks_0"]["mlp"]["fc1"]["kernel"]),
        rtol=1e-4, atol=1e-6,
    )


def test_fsdp_tp_train_step_matches_replicated(setup):
    """The 2-D FSDP x TP layout (data4 x model2) trains identically too."""
    model, params, imgs, scores = setup
    tx = configure_optimizers(params)
    batch = {"imgs": imgs, "scores": scores}
    rng = jax.random.PRNGKey(7)
    step = make_train_step(model, tx, lmbda=1e-4, donate=False)
    _, base = step(TrainState.create(params, tx), batch, rng)

    mesh = make_mesh({"data": 4, "model": 2})
    p = shard_params_fsdp(params, mesh, min_size=256, tp_axis="model")
    state = TrainState.create(p, tx)
    sbatch = shard_batch(batch, mesh, axis="data")
    step_f = make_train_step(model, tx, lmbda=1e-4, donate=False)
    _, metrics = step_f(state, sbatch, rng)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(base["loss"]), rtol=5e-4
    )
