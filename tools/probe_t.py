"""TPU probe: peel depth ``t`` sweep for the fused (100k, `peel_masked_topk`)
and dot (500k, `peel_masked_topk_dot`) chains.

``t`` trades peel-kernel rounds + merge-sort width (both ∝ m·t) against
completeness headroom (a window holding > t of the batch-k winners trips the
per-row redo). t=12 was the r2 pick; this measures smaller depths now that
m is sublane-rounded.

Usage: python tools/probe_t.py [t] [iters]   (one t per process: 2 programs)
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
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    from sibrar_tpu.ops.pallas_peel import (
        peel_masked_topk,
        peel_masked_topk_dot,
    )

    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    out = {"t": t}
    for name, c, fn in (("fused_100k", bench.C, peel_masked_topk),
                        ("dot_500k", bench.C_LARGE, peel_masked_topk_dot)):
        it = jnp.asarray(rng.normal(size=(c, D)).astype(np.float32))
        cols = jnp.asarray(np.sort(rng.integers(0, c, size=(B, EXCL)),
                                   axis=1).astype(np.int32))
        mask = jnp.ones((B, EXCL), dtype=bool)

        @jax.jit
        def step(u, it, cols=cols, mask=mask, fn=fn, c=c):
            return fn(u, it, cols, mask, K, t=t, with_fallback=False)

        v, i, ok = step(u, it)
        v.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            v, i, ok = step(u, it)
        v.block_until_ready()
        dt = time.perf_counter() - t0
        out[name] = {"ms": round(dt / iters * 1e3, 3),
                     "ok_rows": int(ok.sum()),
                     "items_per_sec": round(B * c * iters / dt)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
