"""Fused 0/1-CSR × dense matmul for interaction towers.

**Measured NEGATIVE result (v5e, SBNet bench shapes: B'=5632, L≈88,
n_cols=12000, h=512): 57 ms/step vs 11 ms for the production
densify+matmul path.** The per-nonzero predicated [1, h] read-modify-write
is a serial scalar-indexed chain — the same latency-bound shape that sank
the round-1 iterative top-k extraction (`ops/pallas_topk.py`), multiplied
here by the number of weight tiles each nonzero must be tested against.
Kept (flag-gated OFF, `models/layers.INTERACTION_SPMM`) as a correct,
tested record closing this avenue; the dense compare-broadcast densify +
MXU matmul remains optimal for this sparsity regime.

Design, for the record: the interaction modality's first layer is
``densify(csr_rows) @ kernel`` (`models/layers.InteractionTower`). Because
the rows are 0/1, ``out[b] = Σ_{c ∈ row(b)} kernel[c]`` — this kernel
computes that sum directly from the padded column lists: per nonzero, one
dynamic-sublane [1, h] read + add, with the weight matrix blocked over
sublanes so VMEM never holds more than a ``[KC, h]`` tile. The dense 0/1
matrix never exists, in either forward or backward:

- forward: ``spmm_onehot(cols, mask, kernel)`` — out [B, h]
- backward (custom VJP): d kernel[c] += Σ_{b: c ∈ row(b)} g[b] — the same
  loop shape with a [1, h] read-modify-write accumulate per nonzero
  (conflict-free: rows are processed serially within a block, and the
  col-block axis is the outer grid dimension so each weight tile is
  visited by every row group before moving on).

Numerics: bit-exact accumulation order per row = column order (sorted CSR),
which differs from the MXU matmul's reduction tree — parity tests use
small-magnitude tolerances accordingly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _spmm_fwd_kernel(cols_ref, kern_ref, out_ref, *, gb: int, l: int,
                     kc: int):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    lo = j * kc

    @pl.when(j == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    def body(i, carry):
        for bb in range(gb):  # static unroll over the row group
            c = cols_ref[bb, i]
            rel = c - lo

            @pl.when((rel >= 0) & (rel < kc))
            def _():
                out_ref[bb:bb + 1, :] = (out_ref[bb:bb + 1, :]
                                         + kern_ref[pl.ds(rel, 1), :])
        return carry

    lax.fori_loop(0, l, body, 0)


@functools.partial(jax.jit, static_argnames=("gb", "kc", "interpret"))
def _spmm_fwd(cols: jax.Array, kernel: jax.Array, *, gb: int = 8,
              kc: int = 2048, interpret: bool = False) -> jax.Array:
    """``out[b] = Σ_l kernel[cols[b, l]]`` for cols[b, l] < n_cols (pass
    masked-out slots as ``n_cols + anything`` — they fall outside every
    weight tile and contribute nothing)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, l = cols.shape
    n_cols, h = kernel.shape
    bp = -(-b // gb) * gb
    if bp != b:
        cols = jnp.pad(cols, ((0, bp - b), (0, 0)),
                       constant_values=n_cols + kc)
    ncp = -(-n_cols // kc) * kc
    if ncp != n_cols:
        kernel = jnp.pad(kernel, ((0, ncp - n_cols), (0, 0)))
    kern = functools.partial(_spmm_fwd_kernel, gb=gb, l=l, kc=kc)
    out = pl.pallas_call(
        kern,
        grid=(bp // gb, ncp // kc),
        in_specs=[
            pl.BlockSpec((gb, l), lambda i, j: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((kc, h), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, h), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, h), kernel.dtype),
        interpret=interpret,
    )(cols, kernel)
    return out[:b]


def _spmm_bwd_kernel(cols_ref, g_ref, dk_ref, *, gb: int, l: int, kc: int):
    from jax.experimental import pallas as pl

    i = pl.program_id(1)  # row-group axis: fastest, so each dk tile sees
    lo = pl.program_id(0) * kc  # all row groups in consecutive iterations

    @pl.when(i == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)

    def body(s, carry):
        for bb in range(gb):  # serial within the block: no write conflicts
            c = cols_ref[bb, s]
            rel = c - lo

            @pl.when((rel >= 0) & (rel < kc))
            def _():
                dk_ref[pl.ds(rel, 1), :] = (dk_ref[pl.ds(rel, 1), :]
                                            + g_ref[bb:bb + 1, :])
        return carry

    lax.fori_loop(0, l, body, 0)


@functools.partial(jax.jit, static_argnames=("n_cols", "gb", "kc", "interpret"))
def _spmm_bwd(cols: jax.Array, g: jax.Array, n_cols: int, *, gb: int = 8,
              kc: int = 2048, interpret: bool = False) -> jax.Array:
    """``dk[c] = Σ_{b, l: cols[b,l]==c} g[b]`` — the transpose accumulate."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, l = cols.shape
    h = g.shape[1]
    bp = -(-b // gb) * gb
    if bp != b:
        cols = jnp.pad(cols, ((0, bp - b), (0, 0)),
                       constant_values=n_cols + kc)
        g = jnp.pad(g, ((0, bp - b), (0, 0)))
    ncp = -(-n_cols // kc) * kc
    kern = functools.partial(_spmm_bwd_kernel, gb=gb, l=l, kc=kc)
    # grid order: row groups are the FASTEST axis so each weight-grad tile
    # accumulates every row group in consecutive iterations (Mosaic output
    # revisits must be adjacent) before the next tile is touched
    dk = pl.pallas_call(
        kern,
        grid=(ncp // kc, bp // gb),
        in_specs=[
            pl.BlockSpec((gb, l), lambda j, i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((gb, h), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kc, h), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ncp, h), g.dtype),
        interpret=interpret,
    )(cols, g)
    return dk[:n_cols]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def spmm_onehot(cols: jax.Array, mask: jax.Array, kernel: jax.Array,
                interpret: bool = False) -> jax.Array:
    """``out[b] = Σ_{l: mask[b,l]} kernel[cols[b,l]]`` without materializing
    the dense [B, n_cols] 0/1 matrix — forward and backward are Pallas
    accumulate kernels. Differentiable in `kernel` only (cols/mask are
    data)."""
    safe = jnp.where(mask, cols, kernel.shape[0] + 4096)
    return _spmm_fwd(safe.astype(jnp.int32), kernel, interpret=interpret)


def _spmm_vjp_fwd(cols, mask, kernel, interpret=False):
    return spmm_onehot(cols, mask, kernel, interpret), (cols, mask,
                                                        kernel.shape[0])


def _spmm_vjp_bwd(interpret, res, g):
    cols, mask, n_cols = res
    safe = jnp.where(mask, cols, n_cols + 4096)
    dk = _spmm_bwd(safe.astype(jnp.int32), g, n_cols, interpret=interpret)
    return jnp.zeros_like(cols), jnp.zeros_like(mask), dk


spmm_onehot.defvjp(_spmm_vjp_fwd, _spmm_vjp_bwd)
