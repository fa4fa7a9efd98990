"""TPU probe: Mosaic dot_general precision inside the GEMM epilogue.

Hypothesis (r3): `score_native_wmax` at C=501760 costs 6.77 ms where the
plain XLA matmul costs 3.66 — because the kernel's `lax.dot_general`
defaults to a multi-pass f32 MXU schedule while XLA's DEFAULT precision is
a single bf16 pass (dev notes: f32 matmuls show ~5e-3 relative error).

One variant per process: `python tools/probe_gemm_precision.py
{default|highest|asis} [C] [iters]`.
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
    mode = sys.argv[1] if len(sys.argv) > 1 else "default"
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 501_760
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    b, d = 1024, 256

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    prec = {"default": lax.Precision.DEFAULT,
            "highest": lax.Precision.HIGHEST,
            "asis": None}[mode]

    def kernel(u_ref, it_ref, s_ref, wmaxt_ref, *, nwb, window):
        kw = {} if prec is None else {"precision": prec}
        blk = lax.dot_general(u_ref[:], it_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32, **kw)
        s_ref[...] = blk
        for w in range(nwb):
            wmaxt_ref[w, :] = blk[:, w * window:(w + 1) * window].max(axis=1)

    window, tb, bc = 128, 1024, 1024
    nwb = bc // window

    @jax.jit
    def step(u, it):
        return pl.pallas_call(
            functools.partial(kernel, nwb=nwb, window=window),
            grid=(b // tb, c // bc),
            in_specs=[
                pl.BlockSpec((tb, d), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bc, d), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tb, bc), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nwb, tb), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, c), jnp.float32),
                jax.ShapeDtypeStruct((c // window, b), jnp.float32),
            ],
        )(u, it)

    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    it = jnp.asarray(rng.normal(size=(c, d)).astype(np.float32))
    s, wm = step(u, it)
    s.block_until_ready()
    # accuracy vs the XLA matmul (same DEFAULT precision class)
    ref = (u[:8] @ it[:1024].T)
    rel = float(jnp.max(jnp.abs(s[:8, :1024] - ref))
                / jnp.max(jnp.abs(ref)))
    t0 = time.perf_counter()
    for _ in range(iters):
        s, wm = step(u, it)
    s.block_until_ready()
    dt = time.perf_counter() - t0
    print(json.dumps({"mode": mode, "C": c,
                      "ms": round(dt / iters * 1e3, 3),
                      "rel_vs_xla_slice": rel}))


if __name__ == "__main__":
    main()
