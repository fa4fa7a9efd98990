"""TPU probe: per-stage cost of the direct-gather peel pipeline.

Usage: python tools/probe_peel_stages.py {matmul|scatter|wmax|wtopk|dgather|
peel|merge|recover|full}
One jitted program per process (tunnel compile budget).
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
from jax import lax  # noqa: E402

from sibrar_tpu.ops.pallas_peel import (  # noqa: E402
    gather_score_windows,
    peel_values,
)
from sibrar_tpu.ops.sparse import DeviceCSR, csr_row_gather, scatter_fill_rows  # noqa: E402

B, C, D, K, T, EXCL, ITERS = 1024, 100_352, 256, 100, 16, 64, 30
M = K  # no margin (scatter-excluded scores)
NW = C // 128


def main():
    stage = sys.argv[1]
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    it = jnp.asarray(rng.normal(size=(C, D)).astype(np.float32))
    cols = np.sort(rng.integers(0, C, size=(B, EXCL)), axis=1).astype(np.int32)
    indptr = np.arange(B + 1, dtype=np.int32) * EXCL
    csr = DeviceCSR(indptr=jnp.asarray(indptr), indices=jnp.asarray(cols.ravel()),
                    n_rows=B, n_cols=C, max_row_len=EXCL)
    urows = jnp.arange(B, dtype=jnp.int32)

    def pipeline(u):
        scores = u @ it.T
        if stage == "matmul":
            return jnp.sum(scores)
        gcols, gmask = csr_row_gather(csr, urows)
        scores = scatter_fill_rows(scores, gcols, gmask, n_cols=C, fill=-1e30)
        if stage == "scatter":
            return jnp.sum(scores)
        wmax = scores.reshape(B, NW, 128).max(-1)
        if stage == "wmax":
            return jnp.sum(wmax)
        _, widx = lax.top_k(wmax, M)
        if stage == "wtopk":
            return jnp.sum(widx)
        g = gather_score_windows(scores, widx)
        if stage == "dgather":
            return jnp.sum(g)
        vals = peel_values(g.reshape(B * M, 128), T).reshape(B, M, T)
        if stage == "peel":
            return jnp.sum(vals)
        v, p = lax.top_k(vals.reshape(B, M * T), K)
        if stage == "merge":
            return jnp.sum(v) + jnp.sum(p)
        wslot = p // T
        oh_m = wslot[:, :, None] == jnp.arange(M, dtype=wslot.dtype)
        widx_sel = jnp.sum(jnp.where(oh_m, widx[:, None, :], 0), axis=-1)
        rows2 = gather_score_windows(scores, widx_sel)
        hit = rows2 == v[:, :, None]
        lane = jnp.min(jnp.where(hit, jnp.arange(128, dtype=jnp.int32), 128),
                       axis=-1)
        n_hit = jnp.sum(hit, axis=-1)
        idx = widx_sel * 128 + jnp.minimum(lane, 127)
        return jnp.sum(v) + jnp.sum(idx) + jnp.sum(n_hit)

    if stage == "full":
        from sibrar_tpu.ops.topk import masked_topk

        @jax.jit
        def step(u):
            scores = u @ it.T
            v, i = masked_topk(scores, csr, urows, K, method="peel")
            return jnp.sum(v) + jnp.sum(i)
    else:
        step = jax.jit(pipeline)

    out = step(u)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = step(u)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"stage": stage, "ms": round(dt * 1e3, 3)}))


if __name__ == "__main__":
    main()
