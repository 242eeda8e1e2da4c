import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from bench import load_images
from textmae_tpu.data.score_maps import total_score_for_image
from textmae_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD
from textmae_tpu.models.mcm import MCM, MCMConfig
from textmae_tpu.train import TrainState, configure_optimizers, make_train_step
from textmae_tpu.eval import MCMCodec, inference

imgs_np, grays = load_images()
scores_np = np.stack([total_score_for_image(g) for g in grays])
norm = (imgs_np - IMAGENET_MEAN) / IMAGENET_STD
imgs_all = jnp.asarray(norm.transpose(0,3,1,2))
raw_all = jnp.asarray(imgs_np.transpose(0,3,1,2))
scores_all = jnp.asarray(scores_np)

for keep, mask_pct in ((49, 75), (100, 49), (144, 27)):
    cfg = MCMConfig(num_keep_patches=keep)
    model = MCM(cfg)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(lambda k: model.init({"params":k,"noise":k}, imgs_all[:1], scores_all[:1], training=False, compute_loss=False))(rng)
    tx = configure_optimizers(variables["params"])
    state = TrainState.create(variables["params"], tx)
    step = make_train_step(model, tx, lmbda=1e-2)
    order = np.random.default_rng(0)
    t0 = time.time()
    for it in range(15000):
        idx = order.integers(0, 24, 8)
        state, m = step(state, {"imgs": imgs_all[idx], "scores": scores_all[idx]}, rng)
    jax.block_until_ready(state.params)
    train_s = time.time() - t0
    codec = MCMCodec(model, {"params": state.params})
    codec.update(force=True)
    res = inference(codec, raw_all[:8], scores_all[:8]); res.pop("x_hat")
    print(f"KEEP={keep} (~{mask_pct}% masked) 15k steps in {train_s:.0f}s:",
          {k: round(float(v), 4) for k, v in res.items()}, flush=True)
