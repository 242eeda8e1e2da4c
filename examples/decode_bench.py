"""Measure decompress latency: host rANS chain vs on-device decode chain.

VERDICT r2 Next #6: the MCM slice chain's per-slice host round trips
(~43 ms RTT each over the remote-attach tunnel) floor the host decode
path. coding.device_rans runs the rans64 state machine inside jit, so
`MCMCodec.decompress(device_chain=True)` dispatches the whole chain
asynchronously and blocks only on the final image fetch.

Prints one JSON line with both paths' per-image decode latency (single
image and batch) and the byte-identity check. Run on the real chip.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


def main():
    from textmae_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from bench import load_images
    from textmae_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD
    from textmae_tpu.data.score_maps import total_score_for_image
    from textmae_tpu.eval import MCMCodec
    from textmae_tpu.eval.harness import code_side_info
    from textmae_tpu.models.mcm import MCM, MCMConfig
    from textmae_tpu.train.checkpoint import load_params_npz

    imgs_np, grays = load_images()
    scores_np = np.stack([total_score_for_image(g) for g in grays])
    cfg = MCMConfig(dtype=jnp.bfloat16)
    model = MCM(cfg)
    ckpt = Path(__file__).parent.parent / "checkpoints" / "mcm_kodak_l1_150k.f16.npz"
    variables = {"params": load_params_npz(ckpt)}
    mean = jnp.asarray(IMAGENET_MEAN).reshape(1, 3, 1, 1)
    std = jnp.asarray(IMAGENET_STD).reshape(1, 3, 1, 1)
    imgs = (jnp.asarray(imgs_np.transpose(0, 3, 1, 2)) - mean) / std
    scores = jnp.asarray(scores_np)

    codec = MCMCodec(model, variables, num_threads=16)
    codec.update(force=True)
    streams, ids_restore = codec.compress(imgs, scores)
    _, ids = code_side_info(
        np.asarray(ids_restore), cfg.num_keep_patches, cfg.canonical_keep_order
    )

    out = {"backend": jax.default_backend(), "n": len(streams)}

    def timed(name, fn, reps=5):
        fn()  # warm/compile
        best = min(
            (lambda t0: (jax.block_until_ready(fn()), time.time() - t0)[1])(
                time.time()
            )
            for _ in range(reps)
        )
        out[name] = round(best, 4)
        return best

    x_host = codec.decompress(streams, ids, device_chain=False)
    x_dev = codec.decompress(streams, ids, device_chain=True)
    out["byte_identical"] = bool(jnp.all(x_host == x_dev))

    # single image: the latency-sensitive case where host alternations floor
    timed("host_1img_s", lambda: codec.decompress(streams[:1], ids[:1],
                                                  device_chain=False))
    timed("device_1img_s", lambda: codec.decompress(streams[:1], ids[:1],
                                                    device_chain=True))
    # full batch
    timed("host_24img_s", lambda: codec.decompress(streams, ids,
                                                   device_chain=False), reps=3)
    timed("device_24img_s", lambda: codec.decompress(streams, ids,
                                                     device_chain=True), reps=3)
    out["speedup_1img"] = round(out["host_1img_s"] / out["device_1img_s"], 3)
    out["speedup_24img"] = round(out["host_24img_s"] / out["device_24img_s"], 3)

    # compress side: host C++ encode (+ symbol wire) vs in-jit encoder
    s_h = codec.compress(imgs, scores, device_encode=False)[0]
    s_d = codec.compress(imgs, scores, device_encode=True)[0]
    out["enc_byte_identical"] = all(
        a.y_string == b.y_string and a.z_string == b.z_string
        for a, b in zip(s_h, s_d)
    )
    timed("enc_host_1img_s", lambda: codec.compress(imgs[:1], scores[:1],
                                                    device_encode=False))
    timed("enc_device_1img_s", lambda: codec.compress(imgs[:1], scores[:1],
                                                      device_encode=True))
    timed("enc_host_24img_s", lambda: codec.compress(imgs, scores,
                                                     device_encode=False), reps=3)
    timed("enc_device_24img_s", lambda: codec.compress(imgs, scores,
                                                       device_encode=True), reps=3)
    out["enc_speedup_1img"] = round(
        out["enc_host_1img_s"] / out["enc_device_1img_s"], 3
    )
    out["enc_speedup_24img"] = round(
        out["enc_host_24img_s"] / out["enc_device_24img_s"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
