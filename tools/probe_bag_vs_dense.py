"""Probe: interaction-tower first-layer fwd+bwd at Onion scale — bag gather
vs MXU one-hot densify vs a hybrid (bag fwd, densify-GEMM bwd).

Motivated by the r3 Onion-scale SBNet profile (tools/probe_sbnet_onion.py):
with n_cols=50k, L=41, h=512, rows=3756/step the BAG path costs ~9 ms/step —
XLA materializes the [rows, L, h] gather three times (gather out, a retiling
reshape copy, the backward's broadcast) and pays a 4.15 ms scatter-add
backward — while the break-even gate (256·L <= n_cols) still picks bag.

Usage: python tools/probe_bag_vs_dense.py [rows] [n_cols] [L] [h]

MEASURED (v5e-1):
  rows=3756, n_cols=50k, L=41, h=512 (Onion item tower):
      bag 8.56 / dense 4.43 / hybrid 5.43 ms
  rows=512, n_cols=100352, L=69, h=128 (Onion user tower):
      bag 1.51 / dense 1.38 / hybrid 1.82 ms
  -> per-element costs: bag ~50 ns/(row,l) occurrence, dense ~25 ps/(row,col);
     break-even factor ~2048 (layers.BAG_BREAK_EVEN_FACTOR).
  dense_tvjp (custom-vjp dW = (g^T @ dense)^T, trying to dodge the 376 MB
  bf16 transpose copy XLA inserts for the dW GEMM): 4.458 vs 4.414 ms,
  grads bit-identical — XLA canonicalizes both spellings to the same
  program. Measured NEGATIVE; kept for the record.
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

args = sys.argv[1:]
ROWS = int(args[0]) if len(args) > 0 else 3756
NC = int(args[1]) if len(args) > 1 else 50_000
L = int(args[2]) if len(args) > 2 else 41
H = int(args[3]) if len(args) > 3 else 512
ITERS = 50

rng = np.random.default_rng(0)
cols = np.stack([np.sort(rng.choice(NC, size=L, replace=False))
                 for _ in range(ROWS)]).astype(np.int32)
mask = rng.random((ROWS, L)) < 0.9
kernel = (rng.normal(size=(NC, H)) * 0.02).astype(np.float32)
dpre = rng.normal(size=(ROWS, H)).astype(np.float32)

cols_d, mask_d = jnp.asarray(cols), jnp.asarray(mask)
kernel_d, dpre_d = jnp.asarray(dpre), None
kernel_d = jnp.asarray(kernel)
dpre_d = jnp.asarray(dpre)


def bag_fwd(k, cols, mask):
    gathered = jnp.take(k, cols, axis=0)  # [rows, L, H]
    return (gathered * mask[..., None]).sum(axis=-2)


def densify_mxu(cols, mask):
    wn = -(-NC // 128)
    ohw = ((cols[..., None] // 128 == jnp.arange(wn, dtype=jnp.int32))
           & mask[..., None]).astype(jnp.bfloat16)
    ohr = (cols[..., None] % 128 == jnp.arange(128, dtype=jnp.int32)
           ).astype(jnp.bfloat16)
    dense = jnp.einsum("blw,blr->bwr", ohw, ohr,
                       preferred_element_type=jnp.float32)
    return dense.reshape(cols.shape[0], wn * 128)[:, :NC]


def dense_fwd(k, cols, mask):
    return densify_mxu(cols, mask) @ k


@jax.custom_vjp
def hybrid_bag(k, cols, mask):
    return bag_fwd(k, cols, mask)


def _hb_fwd(k, cols, mask):
    return bag_fwd(k, cols, mask), (cols, mask)


def _hb_bwd(res, g):
    cols, mask = res
    # dW = dense^T @ g via the window-factored one-hot GEMM — no scatter-add
    dk = densify_mxu(cols, mask).T @ g
    return dk, None, None


hybrid_bag.defvjp(_hb_fwd, _hb_bwd)


@jax.custom_vjp
def _dense_mm_tvjp(vec, k):
    return vec @ k


def _dmt_fwd(vec, k):
    return vec @ k, vec


def _dmt_bwd(vec, g):
    # dK = vec^T @ g spelled (g^T @ vec)^T: transpose the SMALL operands
    # ([R, h] and [NC, h]) instead of letting XLA materialize the [R, NC]
    # dense matrix transposed (a 376 MB bf16 copy at the Onion item shape)
    dk = (g.T @ vec).T
    return jnp.zeros_like(vec), dk  # vec cotangent is dead (table data)


_dense_mm_tvjp.defvjp(_dmt_fwd, _dmt_bwd)


def dense_tvjp_fwd(k, cols, mask):
    return _dense_mm_tvjp(densify_mxu(cols, mask), k)


def make_chain(fwd):
    @jax.jit
    def fwd_bwd(k):
        def loss(k):
            return jnp.vdot(fwd(k, cols_d, mask_d), dpre_d)

        val, gk = jax.value_and_grad(loss)(k)
        return val, gk

    return fwd_bwd


def run(tag, fn):
    v, g = fn(kernel_d)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        v, g = fn(kernel_d)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{tag:8s} {dt:7.3f} ms/chain   val={float(v):.4g}", flush=True)
    return v, g, dt


v1, g1, t_bag = run("bag", make_chain(bag_fwd))
v2, g2, t_dense = run("dense", make_chain(dense_fwd))
v3, g3, t_hyb = run("hybrid", make_chain(hybrid_bag))
v4, g4, t_tv = run("dense_tvjp", make_chain(dense_tvjp_fwd))
print("grad parity tvjp vs dense:",
      float(jnp.abs(g2 - g4).max() / jnp.abs(g2).max()))
print("fwd parity dense vs bag:", float(jnp.abs(v1 - v2)) / abs(float(v1)))
print("grad parity dense vs bag:",
      float(jnp.abs(g1 - g2).max() / jnp.abs(g1).max()))
print("grad parity hybrid vs bag:",
      float(jnp.abs(g1 - g3).max() / jnp.abs(g1).max()))
