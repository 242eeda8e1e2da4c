"""Microbenchmark: Pallas fused attention vs the XLA reference path."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from textmae_tpu.ops.attention import attention_reference, _attention_pallas

for (b, h, s, d) in [(24, 12, 145, 64), (24, 16, 197, 32), (256, 12, 145, 64)]:
    r = np.random.default_rng(0)
    q = jnp.asarray(r.standard_normal((b, h, s, d)).astype(np.float32))
    k = jnp.asarray(r.standard_normal((b, h, s, d)).astype(np.float32))
    v = jnp.asarray(r.standard_normal((b, h, s, d)).astype(np.float32))
    ref = jax.jit(attention_reference)
    pal = jax.jit(_attention_pallas)
    o1 = jax.block_until_ready(ref(q, k, v))
    o2 = jax.block_until_ready(pal(q, k, v))
    err = float(jnp.abs(o1 - o2).max())
    for name, f in (("xla", ref), ("pallas", pal)):
        t0 = time.time()
        for _ in range(50):
            o = f(q, k, v)
        jax.block_until_ready(o)
        dt = (time.time() - t0) / 50
        print(f"({b},{h},{s},{d}) {name}: {dt*1e3:.3f} ms", flush=True)
    print(f"  max|diff|={err:.2e}", flush=True)
