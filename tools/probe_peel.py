"""TPU probe: eval-chain step time by top-k method at bench scale.

Usage: python probe_peel.py {scatter|peel|fused} [t]
One jitted program per process (tunnel compile budget).
"""
import json
import sys
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np

from sibrar_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sibrar_tpu.ops.sparse import DeviceCSR  # noqa: E402

B, C, D, K, EXCL, ITERS = 1024, 100_352, 256, 100, 64, 30


def verify():
    """Hardware parity: peel (+fused) vs the full scatter+lax.top_k oracle on
    the real chip — interpret-mode tests can't catch Mosaic-only numerics."""
    from sibrar_tpu.ops.pallas_peel import peel_masked_topk
    from sibrar_tpu.ops.topk import masked_topk

    rng = np.random.default_rng(3)
    b, c, d, e, k = 256, 20480, 256, 48, 100
    u = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    it = jnp.asarray(rng.normal(size=(c, d)).astype(np.float32))
    cols = np.sort(rng.integers(0, c, size=(b, e)), axis=1).astype(np.int32)
    indptr = np.arange(b + 1, dtype=np.int32) * e
    csr = DeviceCSR(indptr=jnp.asarray(indptr), indices=jnp.asarray(cols.ravel()),
                    n_rows=b, n_cols=c, max_row_len=e)
    rows = jnp.arange(b, dtype=jnp.int32)
    scores = u @ it.T
    vf, _ = masked_topk(scores, csr, rows, k, method="full")
    vp, ip = masked_topk(scores, csr, rows, k, method="peel")
    vfu, ifu = peel_masked_topk(u, it, jnp.asarray(cols),
                                jnp.ones((b, e), bool), k)
    sc = np.asarray(scores)
    out = {"peel_vals_equal": bool(np.array_equal(np.asarray(vf), np.asarray(vp))),
           "peel_idx_valid": bool(np.allclose(
               np.take_along_axis(sc, np.asarray(ip), 1), np.asarray(vp))),
           "fused_vals_close": bool(np.allclose(np.asarray(vfu), np.asarray(vf),
                                                rtol=1e-4, atol=1e-4)),
           "excluded_absent": bool(all(
               not (set(np.asarray(ip)[r].tolist()) & set(cols[r].tolist()))
               for r in range(b)))}
    print(json.dumps(out))


def main():
    method = sys.argv[1]
    if method == "verify":
        verify()
        return
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    it = jnp.asarray(rng.normal(size=(C, D)).astype(np.float32))
    cols = np.sort(rng.integers(0, C, size=(B, EXCL)), axis=1).astype(np.int32)
    indptr = np.arange(B + 1, dtype=np.int32) * EXCL
    csr = DeviceCSR(indptr=jnp.asarray(indptr), indices=jnp.asarray(cols.ravel()),
                    n_rows=B, n_cols=C, max_row_len=EXCL)
    rows = jnp.arange(B, dtype=jnp.int32)
    colsj = jnp.asarray(cols)
    maskj = jnp.ones((B, EXCL), bool)

    if method == "fused":
        from sibrar_tpu.ops.pallas_peel import peel_masked_topk

        @jax.jit
        def step(u):
            return peel_masked_topk(u, it, colsj, maskj, K, t=t)
    else:
        from sibrar_tpu.ops.topk import masked_topk

        @jax.jit
        def step(u):
            scores = u @ it.T
            return masked_topk(scores, csr, rows, K, method=method)

    v, i = step(u)
    v.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        v, i = step(u)
    v.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"method": method, "t": t, "ms": round(dt * 1e3, 3),
                      "items_per_s": round(B * C / dt)}))


if __name__ == "__main__":
    main()
