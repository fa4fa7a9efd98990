"""Device-side CSR utilities.

The reference does all sparse work on host with scipy (row slicing + `.toarray()`
per batch, e.g. `/root/reference/data/dataset.py:306-319` and the eval exclude-mask
densification at `/root/reference/eval/eval.py:219`). Here the CSR arrays live on
device and the three hot primitives — dense-row materialization, membership test,
and exclusion-aware sampling support — are jit-compatible vectorized ops with
static shapes, so they fuse into the surrounding train/eval steps.
"""
from __future__ import annotations

from functools import partial

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class DeviceCSR:
    """A CSR matrix resident on device. Rows with no entries have start==end.

    The shape metadata is static (non-pytree) so jitted consumers can use it
    for shapes and loop bounds.
    """

    indptr: jax.Array  # [n_rows + 1] int32
    indices: jax.Array  # [nnz] int32, sorted within each row
    n_rows: int = flax.struct.field(pytree_node=False)
    n_cols: int = flax.struct.field(pytree_node=False)
    max_row_len: int = flax.struct.field(pytree_node=False)
    # optional [n_rows, Lpad] padded-row materialization (`with_cols_pad`):
    # turns `csr_row_gather` into one vectorized row gather where the flat
    # indices outgrow the Pallas segment kernel's VMEM cap (the XLA
    # element-gather fallback costs ~6.6 ns/element — 1.0 ms/step for the
    # Onion item tower's 154k cols, r3 profile)
    cols_pad: jax.Array | None = None

    @staticmethod
    def from_scipy(mat) -> "DeviceCSR":
        csr = mat.tocsr()
        csr.sort_indices()
        row_lens = np.diff(csr.indptr)
        return DeviceCSR(
            indptr=jnp.asarray(csr.indptr, dtype=jnp.int32),
            indices=jnp.asarray(csr.indices, dtype=jnp.int32),
            n_rows=csr.shape[0],
            n_cols=csr.shape[1],
            max_row_len=int(row_lens.max()) if len(row_lens) else 0,
        )

    @property
    def nnz(self) -> int:
        return int(self.indices.shape[0])


# Segment-gather kernel viability: the flat indices array must fit a VMEM
# block. Beyond this, `with_cols_pad` (padded-row materialization) takes
# over where its HBM budget allows; the XLA element-gather path remains the
# last resort.
_SEG_GATHER_MAX_BYTES = 4 * 1024 * 1024

# VMEM budget for the HBM-DMA segment gather's scratch (gb aligned row
# windows) plus out block; rows longer than ~a quarter-million columns fall
# back to the XLA element gather
_SEG_GATHER_DMA_MAX_VMEM = 8 * 1024 * 1024

# Budget for a CSR's padded-row materialization (per CSR). 64 MB covers
# Onion-scale interaction CSRs (100k rows × 128-lane-padded histories at
# 51 MB); million-row × multi-k-history CSRs fall back to the element
# gather. Kept moderate deliberately: pos_csr/exclude_csr are CLOSED OVER
# by the jitted epoch/eval programs (unlike the tower tables, which ride
# `state.tables` as jit arguments), and closed-over device arrays bake into
# the HLO as literals — the remote-compile tunnel 413'd at a 514 MB literal
# (r3 finding), so four CSRs at 64 MB stay well under that cliff.
_PADDED_COLS_MAX_BYTES = 64 * 1024 * 1024


def padded_cols_viable(n_rows: int, max_row_len: int, nnz: int) -> bool:
    """True when a CSR earns the `with_cols_pad` materialization: the flat
    indices outgrow the segment kernel's VMEM cap AND the padded table fits
    the HBM budget. Shared by `DeviceData` construction and the interaction
    towers' table declarations (both sides must agree so `populate_tables`
    always has the table the module expects)."""
    if nnz == 0 or max_row_len == 0:
        return False
    if nnz * 4 <= _SEG_GATHER_MAX_BYTES:
        return False  # the Pallas segment gather is already near-free
    l_pad = -(-max_row_len // 128) * 128
    return n_rows * l_pad * 4 <= _PADDED_COLS_MAX_BYTES


def build_cols_pad(indptr: jax.Array, indices: jax.Array, n_rows: int,
                   max_row_len: int) -> jax.Array:
    """Materialize ``[n_rows, Lpad]`` padded row columns (pad value 0; the
    consumer recomputes masks from ``indptr``). One-time cost at dataset
    load; Lpad is 128-lane aligned so per-batch row gathers stay on the
    vectorized full-row path."""
    l_pad = -(-max_row_len // 128) * 128
    pos = indptr[:n_rows, None] + jnp.arange(l_pad, dtype=jnp.int32)
    mask = pos < indptr[1:, None]
    cap = max(int(indices.shape[0]) - 1, 0)
    cols = indices[jnp.minimum(pos, cap)]
    return jnp.where(mask, cols, 0)


def with_cols_pad(csr: DeviceCSR) -> DeviceCSR:
    """Attach the padded-row materialization when `padded_cols_viable`."""
    if csr.cols_pad is not None or not padded_cols_viable(
            csr.n_rows, csr.max_row_len, csr.nnz):
        return csr
    return csr.replace(cols_pad=build_cols_pad(
        csr.indptr, csr.indices, csr.n_rows, csr.max_row_len))


def _seg_gather_kernel(st_ref, flat_ref, o_ref, *, gb: int, width: int,
                       l_out: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    for bb in range(gb):  # static unroll over the row group
        s = st_ref[bb, 0]
        base = pl.multiple_of((s // 128) * 128, 128)
        blk = flat_ref[:, pl.ds(base, width)]  # [1, width] aligned superset
        rolled = pltpu.roll(blk, -(s % 128), 1)  # dynamic lane roll
        o_ref[bb:bb + 1, :] = rolled[:, :l_out]


@partial(jax.jit, static_argnames=("l_out", "width", "gb", "interpret"))
def _segment_gather(flat: jax.Array, starts: jax.Array, l_out: int,
                    width: int, gb: int = 8, interpret: bool = False
                    ) -> jax.Array:
    """``out[b, j] = flat[starts[b] + j]`` for j < l_out, as one Pallas pass:
    each row is a 128-aligned block read + a dynamic-shift lane roll (Mosaic
    accepts traced roll amounts at power-of-2 lane widths — probed; 384-lane
    rolls silently mis-rotate, see tools/probe_roll.py). Replaces the XLA
    per-element gather, which scalarizes at ~20 ns/element on TPU."""
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = starts.shape[0]
    bp = -(-b // gb) * gb
    if bp != b:
        starts = jnp.pad(starts, (0, bp - b))
    n = flat.shape[0]
    n_pad = -(-(n + width) // 128) * 128
    flat2 = jnp.pad(flat, (0, n_pad - n)).reshape(1, n_pad)
    kernel = ft.partial(_seg_gather_kernel, gb=gb, width=width, l_out=l_out)
    out = pl.pallas_call(
        kernel,
        grid=(bp // gb,),
        in_specs=[
            pl.BlockSpec((gb, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, l_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, l_out), flat.dtype),
        interpret=interpret,
    )(starts.astype(jnp.int32).reshape(-1, 1), flat2)
    return out[:b]


def _next_pow2(x: int) -> int:
    p = 256
    while p < x:
        p *= 2
    return p


def _seg_gather_dma_kernel(st_ref, flat_hbm, o_ref, scratch, sems, *,
                           gb: int, width: int, l_out: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # start all row-window DMAs for the group, then drain: per row, one
    # 128-aligned [1, width] HBM→VMEM copy overlapping the others' issue.
    # The scratch is ONE [1, gb*width] lane row — Mosaic rejects sublane
    # slices of an (8,128)-tiled buffer that aren't 8-aligned ("slice shape
    # along dimension 0 must be aligned to tiling (8), but is 1"), so each
    # row's slot is a 128-aligned LANE range of the single sublane instead
    dmas = []
    for bb in range(gb):
        s = st_ref[bb, 0]
        base = pl.multiple_of((s // 128) * 128, 128)
        d = pltpu.make_async_copy(
            flat_hbm.at[:, pl.ds(base, width)],
            scratch.at[:, bb * width:(bb + 1) * width],
            sems.at[bb])
        d.start()
        dmas.append((d, s))
    for bb, (d, s) in enumerate(dmas):
        d.wait()
        rolled = pltpu.roll(scratch[:, bb * width:(bb + 1) * width],
                            -(s % 128), 1)
        o_ref[bb:bb + 1, :] = rolled[:, :l_out]


@partial(jax.jit, static_argnames=("l_out", "width", "gb", "interpret"))
def _segment_gather_dma(flat: jax.Array, starts: jax.Array, l_out: int,
                        width: int, gb: int = 8, interpret: bool = False
                        ) -> jax.Array:
    """`_segment_gather` for flat arrays PAST the VMEM cap: the indices stay
    in HBM (`pltpu.ANY`) and each row issues one aligned [1, width] async
    DMA into a VMEM scratch slot, then lane-rolls exactly like the in-VMEM
    kernel. Found by the r5 north-star profile: the e2e item CSR (1.22M nnz,
    max_row_len 2205 — popularity skew) missed the 4 MB in-VMEM gate AND the
    64 MB cols_pad budget, fell into the XLA element gather, and that single
    gather was 42.7 of the 52.5 ms train step (81%)."""
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = starts.shape[0]
    bp = -(-b // gb) * gb
    if bp != b:
        starts = jnp.pad(starts, (0, bp - b))
    n = flat.shape[0]
    n_pad = -(-(n + width) // 128) * 128
    flat2 = jnp.pad(flat, (0, n_pad - n)).reshape(1, n_pad)
    kernel = ft.partial(_seg_gather_dma_kernel, gb=gb, width=width,
                        l_out=l_out)
    out = pl.pallas_call(
        kernel,
        grid=(bp // gb,),
        in_specs=[
            pl.BlockSpec((gb, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((gb, l_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, l_out), flat.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, gb * width), flat.dtype),
            pltpu.SemaphoreType.DMA((gb,)),
        ],
        interpret=interpret,
    )(starts.astype(jnp.int32).reshape(-1, 1), flat2)
    return out[:b]


def csr_row_gather(csr: DeviceCSR, rows: jax.Array,
                   interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """Gather the (padded) column indices of `rows`.

    Returns ``(cols[B..., max_row_len] int32, mask[B..., max_row_len] bool)``;
    padded positions have mask False and column value 0 (clamped).

    On TPU, 1-D row batches ride the Pallas segment-gather kernel (one
    aligned block read + dynamic lane roll per row) when the flat indices
    fit a VMEM block — ~100× fewer memory ops than the per-element XLA
    gather for typical exclusion lists (B=1024, L=250: ~5 ms → ~0.05 ms).
    """
    if csr.nnz == 0:  # e.g. cold-start exclude masks: no train items in catalog
        shape = (*rows.shape, max(csr.max_row_len, 1))
        return (jnp.zeros(shape, jnp.int32), jnp.zeros(shape, bool))
    l_out = max(csr.max_row_len, 1)
    if csr.cols_pad is not None:
        # padded-row materialization: ONE vectorized full-row gather
        # (pad value 0 matches the contract; mask from row lengths)
        cols = csr.cols_pad[rows][..., :l_out]
        lens = csr.indptr[rows + 1] - csr.indptr[rows]
        mask = jnp.arange(l_out, dtype=jnp.int32) < lens[..., None]
        return cols, mask
    if rows.ndim > 1:
        # n-D row batches (e.g. the routed interaction tower's [G, n_pairs]
        # blocks) ride the same 1-D segment-gather kernel flattened — the
        # XLA fallback below scalarizes (~20 ns/element; profiled 0.8 ms/step
        # of the SBNet epoch before this reshape)
        cols, mask = csr_row_gather(csr, rows.reshape(-1), interpret)
        return (cols.reshape(*rows.shape, l_out),
                mask.reshape(*rows.shape, l_out))
    on_tpu = interpret or jax.default_backend() == "tpu"
    use_seg = (rows.ndim == 1 and csr.nnz * 4 <= _SEG_GATHER_MAX_BYTES
               and on_tpu)
    starts = csr.indptr[rows]  # [...]
    ends = csr.indptr[rows + 1]
    width = _next_pow2(l_out + 127)
    if use_seg:
        seg = _segment_gather(csr.indices, starts, l_out, width,
                              interpret=interpret)
        mask = jnp.arange(l_out, dtype=jnp.int32)[None, :] < (ends - starts)[:, None]
        return jnp.where(mask, seg, 0), mask
    if (rows.ndim == 1 and on_tpu
            and 8 * (width + l_out) * 4 <= _SEG_GATHER_DMA_MAX_VMEM):
        # indices past the VMEM cap: per-row async DMA from HBM (r5 —
        # popularity-skewed CSRs blow BOTH the in-VMEM gate and the
        # cols_pad budget, and the XLA element gather below costs ~8.6 ns
        # per element: 42.7 ms/step on the north-star item tower)
        seg = _segment_gather_dma(csr.indices, starts, l_out, width,
                                  interpret=interpret)
        mask = jnp.arange(l_out, dtype=jnp.int32)[None, :] < (ends - starts)[:, None]
        return jnp.where(mask, seg, 0), mask
    offs = jnp.arange(l_out, dtype=jnp.int32)  # [L]
    pos = starts[..., None] + offs  # [..., L]
    mask = pos < ends[..., None]
    pos = jnp.minimum(pos, max(csr.nnz - 1, 0))
    cols = csr.indices[pos]
    return jnp.where(mask, cols, 0), mask


# XLA row scatters on TPU cost ~20 ns per scattered element; a fused
# compare-broadcast densify streams B·L·n_cols lane-ops (measured r2, 2.9 ms
# faster than scatters at B'=5632, L=50, n_cols=12000). The window-factored
# MXU one-hot densify (below) moves the same element count onto the matrix
# unit: r3 probe at B'=5632, L=60, n_cols=12288, h=512 — first-layer
# fwd+bwd chain 5.88 ms (cmp) vs 3.66 ms (MXU), tools/probe_densify.py.
# Compare only survives for small widths where two one-hot builds plus a
# batched matmul can't amortize.
_CMP_DENSIFY_MAX_COLS = 2048


def csr_rows_to_dense(
    csr: DeviceCSR, rows: jax.Array, dtype=jnp.float32
) -> jax.Array:
    """Materialize dense 0/1 rows ``[..., n_cols]`` for a batch of row ids.

    TPU-friendly replacement for scipy ``matrix[rows].toarray()``. Two paths:

    - small ``n_cols``: one fused compare-broadcast (``cols[..., None] ==
      iota`` any-reduced over L) on the VPU;
    - otherwise the **window-factored one-hot MXU densify**: with
      ``w = col // 128`` and ``r = col % 128``,
      ``dense[b, w, r] = Σ_l 1[w_l == w]·1[r_l == r]`` — the same B'·L·n_cols
      element count as the compare pass, but as a batched bf16 matmul the MXU
      eats instead of a VPU bool stream; the ``[..., wn, 128] → [...,
      n_cols]`` view is free (row-major). The one-hot factors are exact in
      bf16 (0/1 values) with f32 accumulation, and CSR rows have distinct
      columns, so the sum is exactly the 0/1 row. Measured on v5e at the
      SBNet-bench item-tower shape (B'=5632, n_cols=12288, L=60, h=512
      first-layer fwd+bwd chain): 5.88 ms (compare) → 3.66 ms
      (tools/probe_densify.py).
    """
    cols, mask = csr_row_gather(csr, rows)  # [..., L]
    if csr.n_cols <= _CMP_DENSIFY_MAX_COLS:
        iota = jnp.arange(csr.n_cols, dtype=jnp.int32)
        hit = (cols[..., None] == iota) & mask[..., None]
        return hit.any(axis=-2).astype(dtype)
    # flatten multi-dim row batches through the einsum: XLA tiles the LAST
    # TWO dims, so a [..., wn, 128] einsum over a multi-dim batch lands in a
    # transposed-batch layout whose reshape to [..., n_cols] is a full-size
    # retiling copy (1.7 ms/step at the Onion item-tower shape — r3
    # profile); flat [R, L] keeps einsum → [R, wn·128] view free, leaving
    # one unavoidable reshape at the output
    cols2 = cols.reshape(-1, cols.shape[-1])
    mask2 = mask.reshape(-1, mask.shape[-1])
    wn = (csr.n_cols + 127) // 128
    ohw = ((cols2[..., None] // 128 == jnp.arange(wn, dtype=jnp.int32))
           & mask2[..., None]).astype(jnp.bfloat16)  # [R, L, wn]
    ohr = (cols2[..., None] % 128 == jnp.arange(128, dtype=jnp.int32)
           ).astype(jnp.bfloat16)  # [R, L, 128]
    dense = jnp.einsum("blw,blv->bwv", ohw, ohr,
                       preferred_element_type=jnp.float32)
    dense = dense.reshape(cols2.shape[0], wn * 128)
    if wn * 128 != csr.n_cols:
        dense = dense[:, :csr.n_cols]
    return dense.astype(dtype).reshape(*cols.shape[:-1], csr.n_cols)


def _searchsorted_segment(
    sorted_flat: jax.Array, starts: jax.Array, ends: jax.Array, queries: jax.Array,
    n_iters: int,
) -> jax.Array:
    """Vectorized binary search of `queries[i]` within `sorted_flat[starts[i]:ends[i]]`.

    Returns the insertion position (left) within the segment, as an absolute index
    into `sorted_flat`. Runs a fixed `n_iters` of bisection so it stays jit-static.
    """
    lo = starts
    hi = ends
    cap = jnp.maximum(sorted_flat.shape[0] - 1, 0)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        mid_val = sorted_flat[jnp.minimum(mid, cap)]
        go_right = mid_val < queries
        new_lo = jnp.where(go_right, mid + 1, lo)
        new_hi = jnp.where(go_right, hi, mid)
        keep = lo < hi
        return jnp.where(keep, new_lo, lo), jnp.where(keep, new_hi, hi)

    lo, hi = jax.lax.fori_loop(0, n_iters, body, (lo, hi))
    return lo


def csr_contains(csr: DeviceCSR, rows: jax.Array, cols: jax.Array) -> jax.Array:
    """Membership test: is (rows[i], cols[i]) a stored entry? Broadcasts over any shape.

    Implements the host-side ``searchsorted`` exclusion check of the reference
    sampler (`/root/reference/data/sampling.py:7-32`) as a fixed-iteration
    on-device bisection over the row segment of the flat CSR indices.
    """
    rows = jnp.asarray(rows)
    cols = jnp.asarray(cols)
    rows_b, cols_b = jnp.broadcast_arrays(rows, cols)
    shape = rows_b.shape
    if csr.nnz == 0:
        return jnp.zeros(shape, bool)
    rflat = rows_b.reshape(-1)
    cflat = cols_b.reshape(-1)
    starts = csr.indptr[rflat]
    ends = csr.indptr[rflat + 1]
    n_iters = max(int(np.ceil(np.log2(max(csr.max_row_len, 1) + 1))) + 1, 1)
    pos = _searchsorted_segment(csr.indices, starts, ends, cflat, n_iters)
    cap = max(csr.nnz - 1, 0)
    found = (pos < ends) & (csr.indices[jnp.minimum(pos, cap)] == cflat)
    return found.reshape(shape)


def csr_contains_rows(csr: DeviceCSR, rows: jax.Array, cols: jax.Array
                      ) -> jax.Array:
    """Membership of ``cols[b, k]`` in row ``rows[b]`` — the row-batched case
    of `csr_contains` (evaluator hit tests, negative-sampling exclusion).

    For short rows the whole column list is gathered once per row and
    compared (B·K·L lane-ops — measured 1.7 ms vs 8.5 ms for the bisection
    at B=1024, K=100, L≈80 on v5e: the bisection's per-element index gathers
    scalarize at ~20 ns each). On TPU the Pallas segment gather makes the
    row fetch nearly free, so the compare path extends to L ≤ 2048 there.
    Longer rows keep the fixed-iteration bisection, whose gather count is
    K·log L instead of L per row."""
    if csr.nnz == 0:
        return jnp.zeros((*rows.shape, cols.shape[-1]), bool)
    pre = contains_rows_pregather(csr, rows)
    if pre is not None:
        return contains_pregathered(*pre, cols)
    return csr_contains(csr, rows[..., None], cols)


def contains_rows_pregather(csr: DeviceCSR, rows: jax.Array):
    """The ``(row_cols, row_mask)`` gather `csr_contains_rows` performs for
    these rows, or ``None`` when the bisection path applies — this IS
    `csr_contains_rows`' dispatch (single source of truth).

    Lets rejection-sampling loops hoist the per-round row fetch: the fetch
    is loop-invariant, but inside a `fori_loop` body XLA re-runs it every
    round (8 rounds re-gathered ≈ 1.6 ms/step at Onion scale, 2M-nnz CSR —
    r3 profile). Pair with `contains_pregathered` in the loop body.

    Compare-path gate: the row fetch must be cheap — the Pallas segment
    gather (small nnz) or a padded-cols row gather (`with_cols_pad`) extend
    it to L ≤ 2048; with only the XLA element-gather fallback available the
    bisection wins past L = 128."""
    if csr.nnz == 0:
        return None
    fetch_ok = (csr.cols_pad is not None
                or (csr.nnz * 4 <= _SEG_GATHER_MAX_BYTES
                    and jax.default_backend() == "tpu"))
    if csr.max_row_len <= (2048 if fetch_ok else 128):
        return csr_row_gather(csr, rows)
    return None


def contains_pregathered(row_cols: jax.Array, row_mask: jax.Array,
                         cols: jax.Array) -> jax.Array:
    """Membership of ``cols[b, k]`` against pre-gathered row columns
    (`contains_rows_pregather`); the compare tail of `csr_contains_rows`."""
    hit = ((cols[..., None] == row_cols[..., None, :])
           & row_mask[..., None, :])
    return hit.any(-1)


@partial(jax.jit, static_argnames=("n_cols", "fill"))
def scatter_fill_rows(
    scores: jax.Array, cols: jax.Array, mask: jax.Array, *, n_cols: int,
    fill: float = -jnp.inf,
) -> jax.Array:
    """Set ``scores[b, cols[b, j]] = fill`` where ``mask[b, j]``.

    Used to exclude already-interacted items from full-catalog ranking — the
    on-device equivalent of the reference's per-batch CSR densification
    (`/root/reference/eval/eval.py:219-220`).
    """
    del n_cols
    safe_cols = jnp.where(mask, cols, 0)
    fill_vals = jnp.where(mask, fill, 0.0).astype(scores.dtype)
    return jax.vmap(lambda s, c, v: s.at[c].add(v))(scores, safe_cols, fill_vals)
