"""TPU probe: window-maxima formulations over a [B, C] score matrix at 500k.

The profiled eval chain shows `scores.reshape(B, NW, 128).max(-1)` is NOT a
free view: XLA materializes a [B, NW, 128] relayout copy (6.2 ms at
C=501760, 2 GB) before the reduce (2.7 ms). Candidates measured inside the
real producer chain (matmul -> wmax -> consume):

  reshape : current reshape+max
  pool    : lax.reduce_window max-pool (1,128) stride (1,128)
  pallas  : Pallas lane-group max on the native layout (if implemented)

Usage: python tools/probe_wmax.py {reshape|pool}
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

B, C, D, ITERS = 1024, 501_760, 256, 20
NW = C // 128


def main():
    variant = sys.argv[1]
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    it = jnp.asarray(rng.normal(size=(C, D)).astype(np.float32))

    @jax.jit
    def step(u, it):
        scores = u @ it.T
        if variant == "reshape":
            wmax = scores.reshape(B, NW, 128).max(-1)
        elif variant == "pool":
            wmax = lax.reduce_window(scores, -jnp.inf, lax.max,
                                     (1, 128), (1, 128), "VALID")
        else:
            raise SystemExit(f"unknown variant {variant}")
        # consume both so neither matmul nor wmax dead-codes; top_k keeps the
        # wmax consumer shape-realistic
        v, i = lax.top_k(wmax, 164)
        return v.sum() + scores[0, 0]

    r = step(u, it)
    r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = step(u, it)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"variant": variant, "ms": round(dt * 1e3, 3)}))


if __name__ == "__main__":
    main()
