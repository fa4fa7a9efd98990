"""A/B probe: f32 vs bf16 GEMM inputs through peel_masked_topk_dot at C=500k.

Measures the EvalConfig.score_dtype="bfloat16" win on the large-catalog dot
chain (an f32 matmul is three bf16 MXU passes; bf16 inputs collapse it to
one, f32 accumulation unchanged).

MEASURED (v5e-1, B=1024, C=501760, D=256, K=100, E=64):
    f32  10.054 ms/step (51.1e9 items/s)
    bf16  9.559 ms/step (53.7e9 items/s)   -> 1.05x
The GEMM epilogue overlaps its MXU passes with the 2 GB f32 scores write, so
cutting 3 passes to 1 only surfaces ~0.5 ms — the chain stays scores-pass
bound (docs/performance.md). The knob matters more as D grows (the GEMM
share scales with D; the scores passes don't). Scores themselves must stay
f32: bf16 scores collide heavily at C=500k (8-bit mantissa), which breaks
the peel path's distinct-value extraction and trips its exactness checks.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from sibrar_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sibrar_tpu.ops.pallas_peel import peel_masked_topk_dot  # noqa: E402

B, C, D, K, EXCL = 1024, 501760, 256, 100, 64
ITERS = 30

rng = np.random.default_rng(1)
u = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
it = jnp.asarray(rng.normal(size=(C, D)).astype(np.float32))
cols = jnp.asarray(np.sort(rng.integers(0, C, size=(B, EXCL)),
                           axis=1).astype(np.int32))
mask = jnp.ones((B, EXCL), bool)


@jax.jit
def step(u, it):
    return peel_masked_topk_dot(u, it, cols, mask, K, c_real=C,
                                with_fallback=False)


def run(tag, u_in, it_in):
    v, i, ok = step(u_in, it_in)
    v.block_until_ready()
    assert bool(ok.all()), tag
    t0 = time.perf_counter()
    for _ in range(ITERS):
        v, i, ok = step(u_in, it_in)
    v.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{tag}: {dt:.3f} ms/step  {B * C / dt * 1e3 / 1e9:.1f}e9 items/s",
          flush=True)
    return dt


f32 = run("f32 ", u, it)
bf16 = run("bf16", u.astype(jnp.bfloat16), it.astype(jnp.bfloat16))
print(f"speedup {f32 / bf16:.2f}x", flush=True)
