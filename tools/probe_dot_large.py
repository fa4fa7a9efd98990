"""TPU probe: the evaluator's dot fast path (`peel_masked_topk_dot`, fused
native-layout GEMM epilogue) at an Onion-scale catalog, vs bench_jax_large's
generic scores chain (XLA matmul + masked_topk auto) whose separate
window_max pass the epilogue deletes.

Usage: python tools/probe_dot_large.py [catalog_size] [iters]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from sibrar_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    import bench

    B, D, K, EXCL = bench.B, bench.D, bench.K, bench.EXCL
    C = int(sys.argv[1]) if len(sys.argv) > 1 else bench.C_LARGE
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    from sibrar_tpu.ops.pallas_peel import peel_masked_topk_dot

    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    it = jnp.asarray(rng.normal(size=(C, D)).astype(np.float32))
    cols = jnp.asarray(np.sort(rng.integers(0, C, size=(B, EXCL)),
                               axis=1).astype(np.int32))
    mask = jnp.ones((B, EXCL), dtype=bool)

    @jax.jit
    def step(u, it, cols, mask):
        return peel_masked_topk_dot(u, it, cols, mask, K,
                                    with_fallback=False)

    v, i, ok = step(u, it, cols, mask)
    v.block_until_ready()
    n_ok = int(jnp.sum(ok))
    t0 = time.perf_counter()
    for _ in range(iters):
        v, i, ok = step(u, it, cols, mask)
    v.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "chain": "peel_masked_topk_dot", "C": C, "ms": round(dt * 1e3, 3),
        "items_per_sec": round(B * C / dt), "ok_rows": n_ok, "B": B,
    }))


if __name__ == "__main__":
    main()
