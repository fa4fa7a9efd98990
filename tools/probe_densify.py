"""Probe: cmp-densify vs window-factored one-hot MXU densify, embedded in the
real producer chain (densify → first-layer matmul → bwd), per the dev-notes
rule that standalone micro-probes through the tunnel are untrustworthy.

Shapes = the SBNet train-bench item tower: B'=512*11 rows, n_cols=12288
(n_users), L=60, h=512.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sibrar_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

BP, NC, L, H = 512 * 11, 12288, 60, 512
rng = np.random.default_rng(0)
cols = np.stack([np.sort(rng.choice(NC, size=L, replace=False))
                 for _ in range(BP)]).astype(np.int32)
mask = rng.random((BP, L)) < 0.9
kernel = rng.normal(size=(NC, H)).astype(np.float32) * 0.02
dpre = rng.normal(size=(BP, H)).astype(np.float32)

cols_d, mask_d = jnp.asarray(cols), jnp.asarray(mask)
kernel_d, dpre_d = jnp.asarray(kernel), jnp.asarray(dpre)


def densify_cmp(cols, mask):
    iota = jnp.arange(NC, dtype=jnp.int32)
    hit = (cols[..., None] == iota) & mask[..., None]
    return hit.any(axis=-2).astype(jnp.float32)


def densify_mxu(cols, mask):
    wn = NC // 128
    w = cols // 128
    r = cols % 128
    ohw = ((w[..., None] == jnp.arange(wn, dtype=jnp.int32))
           & mask[..., None]).astype(jnp.bfloat16)
    ohr = (r[..., None] == jnp.arange(128, dtype=jnp.int32)
           ).astype(jnp.bfloat16)
    dense = jnp.einsum("blw,blr->bwr", ohw, ohr,
                       preferred_element_type=jnp.float32)
    return dense.reshape(cols.shape[0], NC)


def chain(densify):
    @jax.jit
    def fwd_bwd(kernel):
        vec = densify(cols_d, mask_d)

        def loss(k):
            pre = vec @ k
            return jnp.vdot(pre, dpre_d)

        val, g = jax.value_and_grad(loss)(kernel)
        return val, g

    return fwd_bwd


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


# one mode per process: tunnel compiles cost minutes each (CLAUDE.md rule:
# ≤2 jitted programs per TPU probe process). Correctness is covered on CPU
# in tests/test_sampling.py.
mode = sys.argv[1] if len(sys.argv) > 1 else "both"
if mode in ("cmp", "both"):
    print(f"cmp-densify chain: {timeit(chain(densify_cmp), kernel_d):.3f} ms")
if mode in ("mxu", "both"):
    print(f"mxu-densify chain: {timeit(chain(densify_mxu), kernel_d):.3f} ms")
