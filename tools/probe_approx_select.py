"""TPU probe: lax.approx_max_k vs lax.top_k for window SELECTION.

Window selection picks the top-m of NW per-window maxima ([B, NW] f32,
NW = C/128). lax.top_k lowers to a full variadic sort here (measured
1.99 ms at NW=3920/m=168, 0.25 ms at NW=784/m=104 — the 2nd-largest op of
the 500k dot chain). approx_max_k rides the TPU PartialReduce unit; a
cheap post-hoc guard (all windows above the selected min were selected,
and the kth merged value covers that min) folds any recall miss into the
existing per-row `ok` fallback channel.

Usage: python tools/probe_approx_select.py [NW] [m] [iters]
(2 jitted programs per process: top_k then approx_max_k.)
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


def main():
    nw = int(sys.argv[1]) if len(sys.argv) > 1 else 3920
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 168
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    b = 1024
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, nw)).astype(np.float32))

    @jax.jit
    def exact(x):
        v, i = lax.top_k(x, m)
        return v.sum() + i.sum(), i

    @jax.jit
    def approx(x):
        v, i = lax.approx_max_k(x, m, recall_target=0.95)
        return v.sum() + i.sum(), i

    out = {}
    for name, fn in (("top_k", exact), ("approx_max_k", approx)):
        s, i = fn(x)
        s.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            s, i = fn(x)
        s.block_until_ready()
        out[name + "_ms"] = round((time.perf_counter() - t0) / iters * 1e3, 4)
    # measured recall on this input
    _, ie = exact(x)
    _, ia = approx(x)
    ie, ia = np.asarray(ie), np.asarray(ia)
    rec = np.mean([len(np.intersect1d(ie[r], ia[r])) / m for r in range(b)])
    out.update(NW=nw, m=m, recall=round(float(rec), 5))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
