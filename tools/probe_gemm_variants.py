"""TPU probe: bisect score_native_wmax's 6.8 ms (vs XLA matmul 3.7) at 500k.

Variants: `full` (scores + wmax epilogue, = production), `noscores`
(dot + wmax only — no [B, C] write), `nowmax` (dot + scores only — no
[NW, B] strided out block), `xla` (plain jnp matmul, no epilogue).

One variant per process: python tools/probe_gemm_variants.py VARIANT [C] [iters]
"""
import functools
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
    mode = sys.argv[1]
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 501_760
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    b, d = 1024, 256
    window, tb, bc = 128, 1024, 1024
    nwb = bc // window

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k_full(u_ref, it_ref, s_ref, wmaxt_ref):
        blk = lax.dot_general(u_ref[:], it_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
        s_ref[...] = blk
        for w in range(nwb):
            wmaxt_ref[w, :] = blk[:, w * window:(w + 1) * window].max(axis=1)

    def k_noscores(u_ref, it_ref, wmaxt_ref):
        blk = lax.dot_general(u_ref[:], it_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
        for w in range(nwb):
            wmaxt_ref[w, :] = blk[:, w * window:(w + 1) * window].max(axis=1)

    def k_nowmax(u_ref, it_ref, s_ref):
        blk = lax.dot_general(u_ref[:], it_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
        s_ref[...] = blk

    in_specs = [
        pl.BlockSpec((tb, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bc, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
    ]
    s_spec = pl.BlockSpec((tb, bc), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((nwb, tb), lambda i, j: (j, i),
                          memory_space=pltpu.VMEM)
    s_shape = jax.ShapeDtypeStruct((b, c), jnp.float32)
    w_shape = jax.ShapeDtypeStruct((c // window, b), jnp.float32)

    conf = {
        "full": (k_full, [s_spec, w_spec], [s_shape, w_shape]),
        "noscores": (k_noscores, [w_spec], [w_shape]),
        "nowmax": (k_nowmax, [s_spec], [s_shape]),
    }

    if mode == "xla":
        @jax.jit
        def step(u, it):
            return (u @ it.T,)
    else:
        kern, out_specs, out_shapes = conf[mode]

        @jax.jit
        def step(u, it):
            r = pl.pallas_call(kern, grid=(b // tb, c // bc),
                               in_specs=in_specs, out_specs=out_specs,
                               out_shape=out_shapes)(u, it)
            return r if isinstance(r, (tuple, list)) else (r,)

    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    it = jnp.asarray(rng.normal(size=(c, d)).astype(np.float32))
    r = step(u, it)
    r[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = step(u, it)
    r[0].block_until_ready()
    dt = time.perf_counter() - t0
    print(json.dumps({"mode": mode, "C": c,
                      "ms": round(dt / iters * 1e3, 3)}))


if __name__ == "__main__":
    main()
