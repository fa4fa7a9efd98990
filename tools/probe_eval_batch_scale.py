"""Probe: does a bigger user batch buy throughput on the 500k fused dot chain?

B=1024 was the measured optimum at C=100k (r2). At C=500k the chain is
scores-pass bound, so per-item cost should be ~B-invariant — but fixed
costs (selection sort, merge, dispatch) amortize. One program per B.

Usage: python tools/probe_eval_batch_scale.py [B ...]  (default 1024 2048)

MEASURED (v5e-1, C=501760, D=256, K=100, E=64):
    B=1024:  9.960 ms/step  51.6e9 items/s
    B=2048: 19.274 ms/step  53.3e9 items/s
+3.3% throughput for 2x the latency — the chain is scores-pass bound and
the fixed selection costs are already small at B=1024. Default stays 1024.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from sibrar_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sibrar_tpu.ops.pallas_peel import peel_masked_topk_dot  # noqa: E402

C, D, K, EXCL = 501_760, 256, 100, 64
ITERS = 25

bs = [int(a) for a in sys.argv[1:]] or [1024, 2048]
rng = np.random.default_rng(1)
it = jnp.asarray(rng.normal(size=(C, D)).astype(np.float32))

for B in bs:
    u = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    cols = jnp.asarray(np.sort(rng.integers(0, C, size=(B, EXCL)),
                               axis=1).astype(np.int32))
    mask = jnp.ones((B, EXCL), bool)

    @jax.jit
    def step(u, it, cols=cols, mask=mask):
        return peel_masked_topk_dot(u, it, cols, mask, K, c_real=C,
                                    with_fallback=False)

    v, i, ok = step(u, it)
    v.block_until_ready()
    assert bool(ok.all()), B
    t0 = time.perf_counter()
    for _ in range(ITERS):
        v, i, ok = step(u, it)
    v.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"B={B:5d}: {dt:7.3f} ms/step  "
          f"{B * C / dt * 1e3 / 1e9:.1f}e9 items/s", flush=True)
