"""MAE secondary-workload tests: model semantics, engines, schedules."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from textmae_tpu.models.mae import MAEConfig, MaskedAutoencoderViT
from textmae_tpu.models.vit import ViTConfig, VisionTransformer
from textmae_tpu.train import TrainState
from textmae_tpu.train.mae_engine import (
    make_classifier_eval_step,
    make_classifier_train_step,
    make_mae_pretrain_step,
    mixup_cutmix,
)
from textmae_tpu.train.schedules import (
    layer_decay_mults,
    mae_finetune_optimizer,
    mae_pretrain_optimizer,
    no_weight_decay_mask,
    scaled_lr,
    warmup_half_cosine,
)

TINY_MAE = MAEConfig(
    img_size=64, embed_dim=32, depth=2, num_heads=2,
    decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2,
    use_pallas=False,
)
TINY_VIT = ViTConfig(
    img_size=64, num_classes=10, embed_dim=32, depth=2, num_heads=2,
    use_pallas=False,
)


@pytest.fixture(scope="module")
def mae_setup():
    model = MaskedAutoencoderViT(TINY_MAE)
    rng = jax.random.PRNGKey(0)
    imgs = jnp.asarray(np.random.default_rng(0).random((2, 3, 64, 64), np.float32))
    variables = jax.jit(
        lambda r, x: model.init({"params": r, "mask": r}, x, 0.75)
    )(rng, imgs)
    return model, variables["params"], imgs


def test_mae_forward_and_mask_fraction(mae_setup):
    model, params, imgs = mae_setup
    loss, pred, mask = model.apply(
        {"params": params}, imgs, 0.75, rngs={"mask": jax.random.PRNGKey(1)}
    )
    L = TINY_MAE.num_patches
    assert pred.shape == (2, L, 16 * 16 * 3)
    assert mask.shape == (2, L)
    # exactly L - int(L*0.25) patches masked per sample
    expected_masked = L - int(L * 0.25)
    np.testing.assert_array_equal(np.asarray(mask.sum(axis=1)), expected_masked)
    assert np.isfinite(float(loss))


def test_mae_external_ids_shuffle(mae_setup):
    """Score-guided bridge (models_mae_new.py): explicit shuffle is honored."""
    model, params, imgs = mae_setup
    L = TINY_MAE.num_patches
    ids_shuffle = jnp.stack([jnp.arange(L), jnp.arange(L)[::-1]])
    loss1, pred1, mask1 = model.apply({"params": params}, imgs, 0.5, ids_shuffle=ids_shuffle)
    loss2, pred2, mask2 = model.apply({"params": params}, imgs, 0.5, ids_shuffle=ids_shuffle)
    np.testing.assert_array_equal(np.asarray(pred1), np.asarray(pred2))  # deterministic
    # first sample keeps the first half, second keeps the reversed first half
    assert np.asarray(mask1)[0, : L // 2].sum() == 0
    assert np.asarray(mask1)[1, L // 2 :].sum() == 0


def test_mae_norm_pix_loss(mae_setup):
    _, params, imgs = mae_setup
    model_np = MaskedAutoencoderViT(
        MAEConfig(**{**TINY_MAE.__dict__, "norm_pix_loss": True})
    )
    loss, _, _ = model_np.apply(
        {"params": params}, imgs, 0.75, rngs={"mask": jax.random.PRNGKey(1)}
    )
    assert np.isfinite(float(loss))


def test_mae_pretrain_step_descends(mae_setup):
    model, params, imgs = mae_setup
    sched = warmup_half_cosine(1e-3, 1, 10, 10)
    tx = mae_pretrain_optimizer(params, sched)
    state = TrainState.create(params, tx)
    step = make_mae_pretrain_step(model, tx, donate=False)
    losses = []
    for _ in range(4):
        state, m = step(state, imgs, jax.random.PRNGKey(3))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == 4


@pytest.fixture(scope="module")
def vit_setup():
    model = VisionTransformer(TINY_VIT)
    rng = jax.random.PRNGKey(0)
    imgs = jnp.asarray(np.random.default_rng(0).random((4, 3, 64, 64), np.float32))
    params = jax.jit(lambda r, x: model.init(r, x))(rng, imgs)["params"]
    labels = jnp.asarray(np.array([0, 1, 2, 3], np.int32))
    return model, params, imgs, labels


def test_vit_global_pool_and_cls(vit_setup):
    model, params, imgs, _ = vit_setup
    out = model.apply({"params": params}, imgs)
    assert out.shape == (4, 10)
    model_cls = VisionTransformer(ViTConfig(**{**TINY_VIT.__dict__, "global_pool": False}))
    params_cls = model_cls.init(jax.random.PRNGKey(0), imgs)["params"]
    out2 = model_cls.apply({"params": params_cls}, imgs)
    assert out2.shape == (4, 10)


def test_classifier_train_and_eval(vit_setup):
    model, params, imgs, labels = vit_setup
    sched = warmup_half_cosine(1e-3, 1, 5, 5)
    tx = mae_finetune_optimizer(params, sched, num_layers=TINY_VIT.depth)
    state = TrainState.create(params, tx)
    step = make_classifier_train_step(model, tx, 10, donate=False)
    state, m = step(state, imgs, labels, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))

    eval_step = make_classifier_eval_step(model)
    em = eval_step(state.params, imgs, labels)
    assert 0 <= int(em["correct1"]) <= 4
    assert int(em["correct1"]) <= int(em["correct5"])
    assert int(em["count"]) == 4


def test_linprobe_frozen_backbone(vit_setup):
    model, params, imgs, labels = vit_setup
    tx = optax.sgd(1e-2)
    state = TrainState.create(params, tx)
    step = make_classifier_train_step(
        model, tx, 10, label_smoothing=0.0, mixup=False,
        frozen_backbone=True, donate=False,
    )
    state2, _ = step(state, imgs, labels, jax.random.PRNGKey(0))
    # head moved, backbone untouched
    assert not np.allclose(
        np.asarray(state2.params["head"]["kernel"]), np.asarray(params["head"]["kernel"])
    )
    np.testing.assert_array_equal(
        np.asarray(state2.params["blocks_0"]["attn"]["qkv"]["kernel"]),
        np.asarray(params["blocks_0"]["attn"]["qkv"]["kernel"]),
    )


def test_mixup_preserves_target_mass():
    rng = jax.random.PRNGKey(0)
    imgs = jnp.ones((4, 3, 8, 8))
    onehot = jax.nn.one_hot(jnp.array([0, 1, 2, 3]), 4)
    mixed, targets = mixup_cutmix(rng, imgs, onehot)
    np.testing.assert_allclose(np.asarray(targets.sum(axis=-1)), 1.0, rtol=1e-5)
    assert mixed.shape == imgs.shape


def test_layer_decay_mults(vit_setup):
    _, params, _, _ = vit_setup
    mults = layer_decay_mults(params, TINY_VIT.depth, 0.75)
    flat = {
        "/".join(str(getattr(p, "key", p)) for p in path): v
        for path, v in jax.tree_util.tree_leaves_with_path(mults)
    }
    embed_key = next(k for k in flat if "patch_embed" in k)
    head_key = next(k for k in flat if "head" in k)
    b0 = next(k for k in flat if "blocks_0/" in k)
    assert flat[embed_key] < flat[b0] < flat[head_key]
    assert flat[head_key] == pytest.approx(1.0)


def test_no_weight_decay_mask(vit_setup):
    _, params, _, _ = vit_setup
    mask = no_weight_decay_mask(params)
    assert mask["cls_token"] is False
    assert mask["pos_embed"] is False
    assert mask["head"]["kernel"] is True
    assert mask["head"]["bias"] is False


def test_scaled_lr():
    assert scaled_lr(1e-3, 256) == pytest.approx(1e-3)
    assert scaled_lr(1e-3, 64, accum_iter=2, world=2) == pytest.approx(1e-3)


def test_drop_path_train_vs_eval(rng=None):
    """Stochastic depth: eval is deterministic; training with droppath rng
    runs and produces different outputs across rngs."""
    model = VisionTransformer(
        ViTConfig(**{**TINY_VIT.__dict__, "drop_path": 0.5})
    )
    r = np.random.default_rng(0)
    imgs = jnp.asarray(r.random((4, 3, 64, 64), np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs)["params"]
    e1 = model.apply({"params": params}, imgs)
    e2 = model.apply({"params": params}, imgs)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))  # eval deterministic
    t1 = model.apply({"params": params}, imgs, deterministic=False,
                     rngs={"droppath": jax.random.PRNGKey(1)})
    t2 = model.apply({"params": params}, imgs, deterministic=False,
                     rngs={"droppath": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(t1), np.asarray(t2))
