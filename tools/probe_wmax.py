"""TPU probe: window-maxima formulations over a [B, C] score matrix at 500k.

KEPT AS A CAUTIONARY ARTIFACT: this wall-clock probe reported 0.022 ms for
a 263-GFLOP matmul chain through the remote tunnel — physically impossible
numbers, exactly as the dev notes warn for standalone micro-probes. The
trustworthy measurements came from `tools/probe_eval_profile.py` (device-op
durations out of jax.profiler traces), which showed BOTH XLA spellings
relayout the full matrix (reshape+max: 6.2 ms copy + 2.7 reduce;
reduce_window: 6.3 ms transpose copy + 3.1 pool) and drove the Pallas
`ops/pallas_peel.window_max` design (2.89 ms, native layout).

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
