"""Microbenchmark: Pallas fused attention vs the XLA reference path.

Sweeps the per-program group size (how many (batch, head) slices one Pallas
program handles) and both f32/bf16 at the model's shapes; refresh the numbers
in ops/attention.py + VERIFICATION.md whenever the kernel changes
(VERDICT r1 Weak #4 / Next #9).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from textmae_tpu.ops.attention import attention_reference, _attention_pallas


def timeit(f, *args, reps=50):
    o = jax.block_until_ready(f(*args))  # compile
    t0 = time.time()
    for _ in range(reps):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.time() - t0) / reps, o


for dtype in (np.float32, jnp.bfloat16):
    for (b, h, s, d) in [(24, 12, 145, 64), (24, 16, 197, 32), (256, 12, 145, 64)]:
        r = np.random.default_rng(0)
        q = jnp.asarray(r.standard_normal((b, h, s, d)), dtype)
        k = jnp.asarray(r.standard_normal((b, h, s, d)), dtype)
        v = jnp.asarray(r.standard_normal((b, h, s, d)), dtype)
        dt_ref, o1 = timeit(jax.jit(attention_reference), q, k, v)
        name = np.dtype(dtype).name if dtype is np.float32 else "bfloat16"
        print(f"({b},{h},{s},{d}) {name} xla: {dt_ref*1e3:.3f} ms", flush=True)
        for g in (1, 2, 4, 8, 16):
            pal = jax.jit(functools.partial(_attention_pallas, group=g))
            dt, o2 = timeit(pal, q, k, v)
            err = float(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32)).max())
            print(
                f"({b},{h},{s},{d}) {name} pallas g={g}: {dt*1e3:.3f} ms "
                f"({dt_ref/dt:.2f}x vs xla, max|d|={err:.1e})",
                flush=True,
            )
