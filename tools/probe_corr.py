"""TPU probe: corrected-wmax vs +E-margin window selection at large C.

The `_CORR_MAX_ROW_BYTES` gate (see `ops/pallas_peel._use_corrected_wmax`)
was calibrated when the correction gather ran the predicated chunked path
(a whole extra [B, C]-pass equivalent at C=500k).  Now that the correction
gather rides the sorted-run kernel (excl windows are ascending by the CSR
contract), re-measure whether exact post-exclusion maxima (m = k+1) beat
the +E margin (m = k+E+1) at Onion scale.

One variant per process (the jit cache would otherwise reuse the first
trace): `python tools/probe_corr.py {margin|corr} [C] [iters] [E]`.
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
    mode = sys.argv[1] if len(sys.argv) > 1 else "corr"
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 501_760
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    b, d, k = 1024, 256, 100
    e = int(sys.argv[4]) if len(sys.argv) > 4 else 64

    from sibrar_tpu.ops import pallas_peel as pp

    if mode == "corr":
        pp._CORR_MAX_ROW_BYTES = 1 << 31  # force the corrected path
    else:
        pp._CORR_MAX_ROW_BYTES = 0  # force the +E margin path

    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    it = jnp.asarray(rng.normal(size=(c, d)).astype(np.float32))
    cols = jnp.asarray(np.sort(rng.integers(0, c, size=(b, e)),
                               axis=1).astype(np.int32))
    mask = jnp.ones((b, e), dtype=bool)

    @jax.jit
    def step(u, it):
        scores = u @ it.T
        return pp.peel_masked_topk_scores(scores, cols, mask, k,
                                          with_fallback=False)

    v, i, ok = step(u, it)
    v.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        v, i, ok = step(u, it)
    v.block_until_ready()
    dt = time.perf_counter() - t0
    print(json.dumps({"mode": mode, "C": c, "E": e,
                      "ms": round(dt / iters * 1e3, 3),
                      "ok_rows": int(ok.sum()),
                      "items_per_sec": round(b * c * iters / dt)}))


if __name__ == "__main__":
    main()
