"""Pipeline parallelism (parallel/pipeline.py): the GPipe scan schedule over
a "pipe" mesh axis must be exactly the sequential block stack, forward and
backward, for any (stages, microbatches) split."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textmae_tpu.ops.vit import Block
from textmae_tpu.parallel import make_mesh
from textmae_tpu.parallel.pipeline import (
    pipeline_apply,
    pipelined_stack_apply,
    stack_layer_params,
    unstack_layer_params,
)

DEPTH, DIM, HEADS, N, S = 8, 16, 2, 8, 12


@pytest.fixture(scope="module")
def setup():
    block = Block(DIM, HEADS, use_pallas=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (N, S, DIM))
    params = {
        f"blocks_{i}": block.init(jax.random.PRNGKey(i + 2), x)["params"]
        for i in range(DEPTH)
    }
    y_ref = x
    for i in range(DEPTH):
        y_ref = block.apply({"params": params[f"blocks_{i}"]}, y_ref)
    return block, params, x, y_ref


@pytest.mark.parametrize("stages,micro", [(2, 2), (4, 4), (4, 8), (8, 4)])
def test_pipeline_matches_sequential(setup, stages, micro):
    block, params, x, y_ref = setup
    mesh = make_mesh({"pipe": stages}, devices=jax.devices()[:stages])
    y = pipelined_stack_apply(
        block, params, x, mesh, depth=DEPTH, num_microbatches=micro
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)


def test_pipeline_gradients_match_sequential(setup):
    block, params, x, _ = setup
    mesh = make_mesh({"pipe": 4}, devices=jax.devices()[:4])

    def loss_pp(p):
        return pipelined_stack_apply(
            block, p, x, mesh, depth=DEPTH, num_microbatches=4, shard=False
        ).sum()

    def loss_seq(p):
        h = x
        for i in range(DEPTH):
            h = block.apply({"params": p[f"blocks_{i}"]}, h)
        return h.sum()

    # jit the grads: eager jax.grad re-traces and runs the backward op-by-op
    # (~11 s per call here); one cached compile is ~instant on warm runs
    g_pp = jax.jit(jax.grad(loss_pp))(params)
    g_seq = jax.jit(jax.grad(loss_seq))(params)
    scale = max(
        jax.tree.leaves(jax.tree.map(lambda a: float(jnp.abs(a).max()), g_seq))
    )
    diff = max(
        jax.tree.leaves(
            jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g_pp, g_seq)
        )
    )
    assert diff <= 1e-5 * scale + 1e-5, (diff, scale)


def test_stack_unstack_roundtrip(setup):
    _, params, _, _ = setup
    stacked = stack_layer_params(params, DEPTH)
    assert jax.tree.leaves(stacked)[0].shape[0] == DEPTH
    rt = unstack_layer_params(stacked)
    assert set(rt) == set(params)
    for k in params:
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(a, b), params[k], rt[k]
        )


def test_pipeline_param_memory_is_sharded(setup):
    """Each stage must hold only depth/P layers (the HBM win): the stacked
    params' per-device shard covers 1/P of the leading axis."""
    _, params, _, _ = setup
    mesh = make_mesh({"pipe": 4}, devices=jax.devices()[:4])
    from textmae_tpu.parallel.pipeline import _shard_stacked

    stacked = _shard_stacked(stack_layer_params(params, DEPTH), mesh, "pipe")
    leaf = jax.tree.leaves(stacked)[0]
    shard_rows = {s.data.shape[0] for s in leaf.addressable_shards}
    assert shard_rows == {DEPTH // 4}


def test_pipeline_validation_errors(setup):
    block, params, x, _ = setup
    mesh = make_mesh({"pipe": 4}, devices=jax.devices()[:4])
    with pytest.raises(ValueError):  # depth 8 over 3 stages
        mesh3 = make_mesh({"pipe": 3}, devices=jax.devices()[:3])
        pipelined_stack_apply(block, params, x, mesh3, depth=DEPTH, num_microbatches=4)
    with pytest.raises(ValueError):  # batch 8 into 3 microbatches
        pipelined_stack_apply(block, params, x, mesh, depth=DEPTH, num_microbatches=3)
    with pytest.raises(KeyError):
        stack_layer_params(params, DEPTH + 1)


def test_pipeline_apply_generic_fn():
    """pipeline_apply works for any per-layer fn, not just flax blocks."""
    mesh = make_mesh({"pipe": 4}, devices=jax.devices()[:4])
    depth, m, d = 4, 4, 6
    w = jax.random.normal(jax.random.PRNGKey(0), (depth, d, d)) * 0.3
    xs = jax.random.normal(jax.random.PRNGKey(1), (m, 3, d))

    y = pipeline_apply(lambda p, h: jnp.tanh(h @ p), w, xs, mesh)
    y_ref = xs
    for i in range(depth):
        y_ref = jnp.tanh(y_ref @ w[i])
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)


def test_pipelined_mae_pretrain_step_matches_sequential():
    """The pipelined pretrain step computes the same loss and parameter
    update as make_mae_pretrain_step for identical inputs and rng."""
    import optax

    from textmae_tpu.models.mae import MAEConfig, MaskedAutoencoderViT
    from textmae_tpu.train import TrainState
    from textmae_tpu.train.mae_engine import (
        make_mae_pretrain_step,
        make_pipelined_mae_pretrain_step,
    )

    cfg = MAEConfig(
        img_size=32, patch_size=8, embed_dim=16, depth=4, num_heads=2,
        decoder_embed_dim=8, decoder_depth=2, decoder_num_heads=2,
        use_pallas=False,
    )
    model = MaskedAutoencoderViT(cfg)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 32, 32))
    variables = jax.jit(
        lambda r, x: model.init({"params": r, "mask": r}, x, 0.75)
    )(rng, imgs)
    tx = optax.adam(1e-3)

    mesh = make_mesh({"pipe": 2}, devices=jax.devices()[:2])
    s_seq = TrainState.create(variables["params"], tx)
    s_pp = TrainState.create(variables["params"], tx)
    step_seq = make_mae_pretrain_step(model, tx, 0.75, donate=False)
    step_pp = make_pipelined_mae_pretrain_step(
        model, tx, mesh, 0.75, num_microbatches=2, donate=False
    )
    key = jax.random.PRNGKey(7)
    for _ in range(2):
        s_seq, m_seq = step_seq(s_seq, imgs, key)
        s_pp, m_pp = step_pp(s_pp, imgs, key)
        assert float(m_seq["loss"]) == pytest.approx(float(m_pp["loss"]), rel=1e-5)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), s_seq.params, s_pp.params
    )
    # Adam divides by sqrt(v): float-noise gradient differences surface as
    # ~1e-5-scale param deltas after a couple of steps — not a schedule bug
    assert max(jax.tree.leaves(diffs)) < 1e-4


def test_dp_x_pp_matches_sequential(setup):
    """("data", "pipe") mesh: batch sharded over data while layers pipeline
    over pipe — output must still equal the sequential stack."""
    block, params, x, y_ref = setup
    mesh = make_mesh({"data": 2, "pipe": 4}, devices=jax.devices()[:8])
    y = pipelined_stack_apply(
        block, params, x, mesh, depth=DEPTH, num_microbatches=2,
        batch_axis="data",
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)


def test_dp_x_pp_pretrain_step_matches_sequential():
    """DP x PP pretrain step == sequential step (loss + params)."""
    import optax

    from textmae_tpu.models.mae import MAEConfig, MaskedAutoencoderViT
    from textmae_tpu.parallel import shard_batch
    from textmae_tpu.train import TrainState
    from textmae_tpu.train.mae_engine import (
        make_mae_pretrain_step,
        make_pipelined_mae_pretrain_step,
    )

    cfg = MAEConfig(
        img_size=32, patch_size=8, embed_dim=16, depth=4, num_heads=2,
        decoder_embed_dim=8, decoder_depth=2, decoder_num_heads=2,
        use_pallas=False,
    )
    model = MaskedAutoencoderViT(cfg)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 32, 32))
    variables = jax.jit(
        lambda r, x: model.init({"params": r, "mask": r}, x, 0.75)
    )(rng, imgs)
    tx = optax.adam(1e-3)
    mesh = make_mesh({"data": 2, "pipe": 2}, devices=jax.devices()[:4])

    s_seq = TrainState.create(variables["params"], tx)
    s_pp = TrainState.create(variables["params"], tx)
    step_seq = make_mae_pretrain_step(model, tx, 0.75, donate=False)
    step_pp = make_pipelined_mae_pretrain_step(
        model, tx, mesh, 0.75, num_microbatches=2, batch_axis="data",
        donate=False,
    )
    key = jax.random.PRNGKey(7)
    s_seq, m_seq = step_seq(s_seq, imgs, key)
    s_pp, m_pp = step_pp(s_pp, shard_batch(imgs, mesh, axis="data"), key)
    assert float(m_seq["loss"]) == pytest.approx(float(m_pp["loss"]), rel=1e-5)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), s_seq.params, s_pp.params
    )
    assert max(jax.tree.leaves(diffs)) < 1e-4


# ---------------------------------------------------------------------------
# PP x TP (x DP): tensor parallelism inside each pipeline stage
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "axes,micro",
    [
        ({"pipe": 2, "model": 2}, 4),
        ({"pipe": 4, "model": 2}, 4),
        ({"data": 2, "pipe": 2, "model": 2}, 2),
    ],
)
def test_pp_x_tp_matches_sequential(setup, axes, micro):
    block, params, x, y_ref = setup
    ndev = int(np.prod(list(axes.values())))
    mesh = make_mesh(axes, devices=jax.devices()[:ndev])
    y = pipelined_stack_apply(
        block, params, x, mesh, depth=DEPTH, num_microbatches=micro,
        batch_axis="data" if "data" in axes else None, tp_axis="model",
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)


def test_pp_x_tp_gradients_match_sequential(setup):
    block, params, x, _ = setup
    mesh = make_mesh({"pipe": 2, "model": 2}, devices=jax.devices()[:4])

    def loss_tp(p):
        return pipelined_stack_apply(
            block, p, x, mesh, depth=DEPTH, num_microbatches=4,
            tp_axis="model", shard=False,
        ).sum()

    def loss_seq(p):
        h = x
        for i in range(DEPTH):
            h = block.apply({"params": p[f"blocks_{i}"]}, h)
        return h.sum()

    g_tp = jax.jit(jax.grad(loss_tp))(params)
    g_seq = jax.jit(jax.grad(loss_seq))(params)
    scale = max(
        jax.tree.leaves(jax.tree.map(lambda a: float(jnp.abs(a).max()), g_seq))
    )
    diff = max(
        jax.tree.leaves(
            jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g_tp, g_seq)
        )
    )
    assert diff <= 1e-5 * scale + 1e-5, (diff, scale)


def test_pp_x_tp_param_memory_is_sharded(setup):
    """Each device must hold depth/P layers AND 1/T of the wide matrices."""
    from textmae_tpu.parallel.pipeline import (
        _tp_reshape_stacked,
        _tp_stacked_specs,
        _tp_unreshape_stacked,
    )
    from jax.sharding import NamedSharding

    _, params, _, _ = setup
    mesh = make_mesh({"pipe": 2, "model": 2}, devices=jax.devices()[:4])
    stacked = stack_layer_params(params, DEPTH)
    reshaped = _tp_reshape_stacked(stacked, HEADS)
    specs = _tp_stacked_specs(reshaped, "pipe", "model")
    sharded = jax.tree.map(
        lambda t, s: jax.device_put(t, NamedSharding(mesh, s)), reshaped, specs
    )
    qkv = sharded["attn"]["qkv"]["kernel"]  # (depth, D, 3, H, Dh)
    shard_shapes = {s.data.shape for s in qkv.addressable_shards}
    assert shard_shapes == {(DEPTH // 2, DIM, 3, HEADS // 2, DIM // HEADS)}
    fc1 = sharded["mlp"]["fc1"]["kernel"]  # (depth, D, 4D)
    shard_shapes = {s.data.shape for s in fc1.addressable_shards}
    assert shard_shapes == {(DEPTH // 2, DIM, 4 * DIM // 2)}
    # round trip back to the flax layout
    rt = _tp_unreshape_stacked(_tp_reshape_stacked(stacked, HEADS), HEADS)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b), stacked, rt
    )


def test_pp_x_tp_validation():
    block = Block(DIM, 1, use_pallas=False)  # 1 head doesn't divide by tp=2
    x = jax.random.normal(jax.random.PRNGKey(1), (N, S, DIM))
    params = {
        f"blocks_{i}": block.init(jax.random.PRNGKey(i), x)["params"]
        for i in range(DEPTH)
    }
    mesh = make_mesh({"pipe": 2, "model": 2}, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="not divisible"):
        pipelined_stack_apply(
            block, params, x, mesh, depth=DEPTH, num_microbatches=4,
            tp_axis="model",
        )


@pytest.mark.slow  # ~37s: 3-axis composition; the 2-axis equivalence tests stay default
def test_dp_x_pp_x_tp_pretrain_step_matches_sequential():
    """Full 3-axis mesh (data x pipe x model) pretrain step == sequential."""
    import optax

    from textmae_tpu.models.mae import MAEConfig, MaskedAutoencoderViT
    from textmae_tpu.parallel import shard_batch
    from textmae_tpu.train import TrainState
    from textmae_tpu.train.mae_engine import (
        make_mae_pretrain_step,
        make_pipelined_mae_pretrain_step,
    )

    cfg = MAEConfig(
        img_size=32, patch_size=8, embed_dim=16, depth=4, num_heads=2,
        decoder_embed_dim=8, decoder_depth=2, decoder_num_heads=2,
        use_pallas=False,
    )
    model = MaskedAutoencoderViT(cfg)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 32, 32))
    variables = jax.jit(
        lambda r, x: model.init({"params": r, "mask": r}, x, 0.75)
    )(rng, imgs)
    tx = optax.adam(1e-3)

    mesh = make_mesh(
        {"data": 2, "pipe": 2, "model": 2}, devices=jax.devices()[:8]
    )
    s_seq = TrainState.create(variables["params"], tx)
    s_3d = TrainState.create(variables["params"], tx)
    step_seq = make_mae_pretrain_step(model, tx, 0.75, donate=False)
    step_3d = make_pipelined_mae_pretrain_step(
        model, tx, mesh, 0.75, num_microbatches=2,
        batch_axis="data", tp_axis="model", donate=False,
    )
    key = jax.random.PRNGKey(7)
    for _ in range(2):
        s_seq, m_seq = step_seq(s_seq, imgs, key)
        s_3d, m_3d = step_3d(s_3d, shard_batch(imgs, mesh, axis="data"), key)
        assert float(m_seq["loss"]) == pytest.approx(float(m_3d["loss"]), rel=1e-5)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), s_seq.params, s_3d.params
    )
    assert max(jax.tree.leaves(diffs)) < 1e-4


# ---------------------------------------------------------------------------
# sequence parallelism (Megatron SP) on the tp axis
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "axes,micro",
    [
        ({"pipe": 2, "model": 2}, 4),
        ({"pipe": 4, "model": 2}, 4),
        ({"data": 2, "pipe": 2, "model": 2}, 2),
    ],
)
def test_pp_x_tp_x_sp_matches_sequential(setup, axes, micro):
    """Token-sharded residual stream (all_gather + psum_scatter per branch)
    must be exactly the plain-TP / sequential math; S=12 divides by tp."""
    block, params, x, y_ref = setup
    ndev = int(np.prod(list(axes.values())))
    mesh = make_mesh(axes, devices=jax.devices()[:ndev])
    y = pipelined_stack_apply(
        block, params, x, mesh, depth=DEPTH, num_microbatches=micro,
        batch_axis="data" if "data" in axes else None, tp_axis="model",
        sequence_parallel=True,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)


def test_sp_gradients_match_sequential(setup):
    block, params, x, _ = setup
    mesh = make_mesh({"pipe": 2, "model": 2}, devices=jax.devices()[:4])

    def loss_sp(p):
        return pipelined_stack_apply(
            block, p, x, mesh, depth=DEPTH, num_microbatches=4,
            tp_axis="model", sequence_parallel=True, shard=False,
        ).sum()

    def loss_seq(p):
        h = x
        for i in range(DEPTH):
            h = block.apply({"params": p[f"blocks_{i}"]}, h)
        return h.sum()

    g_sp = jax.jit(jax.grad(loss_sp))(params)
    g_seq = jax.jit(jax.grad(loss_seq))(params)
    scale = max(
        jax.tree.leaves(jax.tree.map(lambda a: float(jnp.abs(a).max()), g_seq))
    )
    diff = max(
        jax.tree.leaves(
            jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g_sp, g_seq)
        )
    )
    assert diff <= 1e-5 * scale + 1e-5, (diff, scale)


def test_sp_validation_and_auto_fallback(setup):
    """sequence_parallel=True on an indivisible S raises; "auto" falls back
    to plain TP and still matches the sequential stack; SP without tp_axis
    is rejected."""
    block, params, x, _ = setup
    mesh = make_mesh({"pipe": 2, "model": 2}, devices=jax.devices()[:4])
    x_odd = x[:, : S - 1]  # 11 tokens: not divisible by tp=2
    with pytest.raises(ValueError, match="not divisible"):
        pipelined_stack_apply(
            block, params, x_odd, mesh, depth=DEPTH, num_microbatches=4,
            tp_axis="model", sequence_parallel=True,
        )
    with pytest.raises(ValueError, match="requires tp_axis"):
        pipelined_stack_apply(
            block, params, x, mesh, depth=DEPTH, num_microbatches=4,
            sequence_parallel=True,
        )
    y = pipelined_stack_apply(
        block, params, x_odd, mesh, depth=DEPTH, num_microbatches=4,
        tp_axis="model", sequence_parallel="auto",
    )
    y_ref = x_odd
    for i in range(DEPTH):
        y_ref = block.apply({"params": params[f"blocks_{i}"]}, y_ref)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)


def test_sp_pretrain_step_matches_sequential():
    """dp x pp x tp + SP("auto") MAE pretrain step == sequential: the
    encoder stack (keep 7 + cls = 8 tokens at mask 0.5625) runs SP while the
    decoder (17 tokens) auto-falls back to plain TP in the same step."""
    import optax

    from textmae_tpu.models.mae import MAEConfig, MaskedAutoencoderViT
    from textmae_tpu.parallel import shard_batch
    from textmae_tpu.train import TrainState
    from textmae_tpu.train.mae_engine import (
        make_mae_pretrain_step,
        make_pipelined_mae_pretrain_step,
    )

    cfg = MAEConfig(
        img_size=32, patch_size=8, embed_dim=16, depth=4, num_heads=2,
        decoder_embed_dim=8, decoder_depth=2, decoder_num_heads=2,
        use_pallas=False,
    )
    model = MaskedAutoencoderViT(cfg)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 32, 32))
    variables = jax.jit(
        lambda r, x: model.init({"params": r, "mask": r}, x, 0.5625)
    )(rng, imgs)
    tx = optax.adam(1e-3)

    mesh = make_mesh(
        {"data": 2, "pipe": 2, "model": 2}, devices=jax.devices()[:8]
    )
    s_seq = TrainState.create(variables["params"], tx)
    s_sp = TrainState.create(variables["params"], tx)
    step_seq = make_mae_pretrain_step(model, tx, 0.5625, donate=False)
    step_sp = make_pipelined_mae_pretrain_step(
        model, tx, mesh, 0.5625, num_microbatches=2,
        batch_axis="data", tp_axis="model", sequence_parallel="auto",
        donate=False,
    )
    key = jax.random.PRNGKey(7)
    for _ in range(2):
        s_seq, m_seq = step_seq(s_seq, imgs, key)
        s_sp, m_sp = step_sp(s_sp, shard_batch(imgs, mesh, axis="data"), key)
        assert float(m_seq["loss"]) == pytest.approx(float(m_sp["loss"]), rel=1e-5)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), s_seq.params, s_sp.params
    )
    assert max(jax.tree.leaves(diffs)) < 1e-4
