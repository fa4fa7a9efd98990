"""Pallas TPU kernels for windowed full-catalog scoring (experimental).

These kernels were built to kill two measured costs in the eval hot path at
B=1024, C=100k, D=256, K=100, E=64 on v5e (see `ops/topk.py` for the
production path):

- ``score_windows(u, items)``: the GEMM with scores written once in a
  `[NW, B, W]` windowed tiling plus the per-window max as a free epilogue —
  2.45 ms, i.e. the same as the plain XLA matmul, so the window maxes and
  the gather-ready layout are free. Each window's lane slice lands in its
  own leading-dim plane: users stay on sublanes and window elements on
  lanes on both sides of every copy, so no vreg transposition happens
  anywhere (a `[B, NW, W]` target would need sublane→plane relayout, which
  Mosaic executes at ~15 ms — measured, avoid).
- ``window_scores_from(scores)``: same epilogue for a precomputed `[B, C]`
  score matrix (arbitrary scorers, e.g. DMF's clamped cosine).
- ``gather_windows(sw_t, widx)``: per-user window gather with dynamic
  leading-dim indexing — ~0.8 ms in-program where the XLA (1,1,W)-slice
  gather costs ~17 ms.

Phase 2 (`window_topk_phase2`) selects the top-(k + E) windows per user by
window max (covering theorem: an excluded item can displace at most its own
window — see `ops/topk.py`), gathers them, then applies exclusion by
**finalist re-ranking**: take the top-(k + E (+W−1 if padded)) candidates,
map them to catalog ids with one-hot matmuls (XLA element gathers scalarize
at ~20 ns/element), mask excluded/padded ids by direct comparison, re-rank.
No scatter, no big index tensors, exact.

NET RESULT (the honest part): the whole pipeline is exact but ~1.8× slower
end-to-end than the scatter path, because the k+E window margin inflates the
final `lax.top_k` to (n=(k+E)·W, k=k+E) and XLA's top-k costs ≈ n·k·4.6 ns
per 1024 rows — 16 ms of a 21 ms step. Every alternative was measured: a
Mosaic iterative-extraction selection kernel (`ops/pallas_topk.py`) is
latency-bound at ~94 ms; bf16 end-to-end buys 10%; smaller windows lose
(W=64 → 13.2 ms, W=32 → 20.9 ms vs W=128 → 11.9 ms on the scatter path).
These kernels stay as tested substrate: the missing piece is a fast exact
selection primitive, nothing else.

Replaces the reference's eval chain `torch.mm → scores[mask] = -inf → topk`
(`/root/reference/eval/eval.py:207-222`). Exact: same results as
scatter + `lax.top_k` (ties broken arbitrarily, as in `torch.topk`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_NEG = -1e30


# --------------------------------------------------------------------- kernels
def _score_windows_kernel(u_ref, it_ref, swt_ref, wmaxt_ref, *, nwb: int,
                          window: int):
    blk = lax.dot_general(u_ref[:], it_ref[:], (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32)  # [TB, BC]
    # Write each window as a lane slice into its own leading-dim plane of the
    # [NW, B, W] output: b stays on sublanes and w on lanes on both sides, so
    # no vreg transposition happens anywhere (a [B, NW, W] target would put b
    # on planes — a sublane->plane relayout Mosaic executes very slowly).
    cols = []
    for w in range(nwb):
        sl = blk[:, w * window:(w + 1) * window]  # [TB, W], 128-aligned slice
        swt_ref[w, :, :] = sl
        cols.append(sl.max(axis=1, keepdims=True))
    # keepdims maxima on lanes + ONE relayout per step (see
    # _score_native_kernel: per-window sublane->lane stores cost +85%)
    wmaxt_ref[...] = jnp.concatenate(cols, axis=1).T


def _retile_kernel(s_ref, swt_ref, wmaxt_ref, *, nwb: int, window: int):
    blk = s_ref[:]
    cols = []
    for w in range(nwb):
        sl = blk[:, w * window:(w + 1) * window]
        swt_ref[w, :, :] = sl
        cols.append(sl.max(axis=1, keepdims=True))
    wmaxt_ref[...] = jnp.concatenate(cols, axis=1).T


def _score_native_kernel(u_ref, it_ref, s_ref, wmaxt_ref, *, nwb: int,
                         window: int):
    blk = lax.dot_general(u_ref[:], it_ref[:], (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32)  # [TB, BC]
    s_ref[...] = blk
    # wmax rows go to SUBLANES of a [NW, B]-transposed output (sublane-row
    # stores are legal; single-lane stores are not) — the 16 MB transpose
    # back to [B, NW] happens on the XLA side, off the 2 GB hot path.
    # CRITICAL spelling (r3, tools/probe_gemm_bisect.py at C=501760): compute
    # the per-window maxima with keepdims on LANES (users stay on sublanes,
    # the window_max pattern) and relayout ONCE per grid step — 3.68 ms for
    # the whole fused GEMM, i.e. XLA-matmul parity, where nwb separate
    # `wmaxt_ref[w, :] = blk[...].max(axis=1)` stores each pay their own
    # sublane->lane relayout and drag the kernel to 6.77 ms (+85%).
    cols = [blk[:, w * window:(w + 1) * window].max(axis=1, keepdims=True)
            for w in range(nwb)]
    wmaxt_ref[...] = jnp.concatenate(cols, axis=1).T


@functools.partial(jax.jit, static_argnames=("window", "tb", "bc", "interpret"))
def score_windows(u: jax.Array, items: jax.Array, *, window: int = 128,
                  tb: int = 256, bc: int = 1024, interpret: bool = False
                  ) -> tuple[jax.Array, jax.Array]:
    """Dot-product scores written once in windowed tiling.

    Returns ``(sw_t [C/window, B, window], wmax [B, C/window])`` for
    ``scores = u @ items.T``. Requires B % tb == 0, C % bc == 0,
    bc % window == 0, D % 128 == 0 (pad upstream; see `pallas_masked_topk`).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, d = u.shape
    c = items.shape[0]
    if b % tb or c % bc or bc % window or d % 128 or window % 128:
        raise ValueError(
            f"shape misalignment: B={b}%{tb}, C={c}%{bc}, bc={bc}%{window}, "
            f"D={d}%128, window={window}%128")
    nwb = bc // window
    kernel = functools.partial(_score_windows_kernel, nwb=nwb, window=window)
    sw_t, wmax_t = pl.pallas_call(
        kernel,
        grid=(b // tb, c // bc),
        in_specs=[
            pl.BlockSpec((tb, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nwb, tb, window), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nwb, tb), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c // window, b, window), jnp.float32),
            jax.ShapeDtypeStruct((c // window, b), jnp.float32),
        ],
        interpret=interpret,
    )(u, items)
    return sw_t, wmax_t.T


@functools.partial(jax.jit, static_argnames=("window", "tb", "bc", "interpret"))
def window_scores_from(scores: jax.Array, *, window: int = 128, tb: int = 256,
                       bc: int = 1024, interpret: bool = False
                       ) -> tuple[jax.Array, jax.Array]:
    """Retile a precomputed [B, C] score matrix to ``(sw_t, wmax)`` in one pass."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, c = scores.shape
    if b % tb or c % bc or bc % window or window % 128:
        raise ValueError(
            f"shape misalignment: B={b}%{tb}, C={c}%{bc}, bc={bc}%{window}, "
            f"window={window}%128")
    nwb = bc // window
    kernel = functools.partial(_retile_kernel, nwb=nwb, window=window)
    sw_t, wmax_t = pl.pallas_call(
        kernel,
        grid=(b // tb, c // bc),
        in_specs=[pl.BlockSpec((tb, bc), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((nwb, tb, window), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nwb, tb), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c // window, b, window), jnp.float32),
            jax.ShapeDtypeStruct((c // window, b), jnp.float32),
        ],
        interpret=interpret,
    )(scores)
    return sw_t, wmax_t.T


@functools.partial(jax.jit, static_argnames=("window", "tb", "bc", "interpret"))
def score_native_wmax(u: jax.Array, items: jax.Array, *, window: int = 128,
                      tb: int = 1024, bc: int = 1024, interpret: bool = False
                      ) -> tuple[jax.Array, jax.Array]:
    """Fused GEMM epilogue writing NATIVE-layout scores plus window maxima:
    ``(scores [B, C], wmax [B, C/window])`` for ``scores = u @ items.T``.

    Feeds `ops/pallas_peel.peel_topk_from_scores` with its `wmax` already
    computed, deleting the separate full-matrix window_max read (one ~2 GB
    HBM pass at C=500k). Unlike `score_windows` the score matrix keeps the
    matmul's own [B, C] tiling, so the downstream window gather and the
    dense scatter fallback read it directly. Same alignment contract as
    `score_windows` (pad upstream)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, d = u.shape
    c = items.shape[0]
    tb = min(tb, b)
    if b % tb or c % bc or bc % window or d % 128 or window % 128:
        raise ValueError(
            f"shape misalignment: B={b}%{tb}, C={c}%{bc}, bc={bc}%{window}, "
            f"D={d}%128, window={window}%128")
    nwb = bc // window
    kernel = functools.partial(_score_native_kernel, nwb=nwb, window=window)
    scores, wmax_t = pl.pallas_call(
        kernel,
        grid=(b // tb, c // bc),
        in_specs=[
            pl.BlockSpec((tb, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
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
        interpret=interpret,
    )(u, items)
    return scores, wmax_t.T


# ----------------------------------------------------------------- gather
def _gather_kernel(widx_ref, swt_ref, cand_ref, *, m: int, window: int,
                   gb: int):
    from jax.experimental import pallas as pl

    def body(j, carry):
        for bb in range(gb):  # static unroll over the user group
            wi = widx_ref[bb, j]
            cand_ref[bb, pl.ds(j * window, window)] = swt_ref[wi, bb, :]
        return carry

    lax.fori_loop(0, m, body, 0)


@functools.partial(jax.jit, static_argnames=("gb", "interpret"))
def gather_windows(sw_t: jax.Array, widx: jax.Array, *, gb: int = 8,
                   interpret: bool = False) -> jax.Array:
    """``cand[b, j*W:(j+1)*W] = sw_t[widx[b, j], b, :]`` as a Pallas kernel.

    The XLA equivalent (`vmap(lambda s, w: s[w], in_axes=(1, 0))`) lowers to a
    scalarized (1, 1, W)-slice gather — measured 17 ms for B=1024, m=165 on
    v5e. Here each grid step streams the full window axis for a group of
    ``gb`` users into VMEM and copies the selected rows with dynamic
    leading-dim indexing; the lane offsets ``j*W`` are provably 128-aligned.
    ~1 ms for the same shape.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nw, b, w = sw_t.shape
    m = widx.shape[1]
    if b % gb:
        gb = b  # one group (legal block: sublane dim == full array dim)
    if w % 128:
        raise ValueError(f"shape misalignment: W={w}%128")
    kernel = functools.partial(_gather_kernel, m=m, window=w, gb=gb)
    return pl.pallas_call(
        kernel,
        grid=(b // gb,),
        in_specs=[
            pl.BlockSpec((gb, m), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((nw, gb, w), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, m * w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m * w), jnp.float32),
        interpret=interpret,
    )(widx, sw_t)


# --------------------------------------------------------------------- phase 2
def window_topk_phase2(sw_t: jax.Array, wmax: jax.Array, excl_cols: jax.Array,
                       excl_mask: jax.Array, k: int, c_real: int,
                       interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """Exact top-k from windowed scores with per-user column exclusion.

    ``sw_t`` is the [NW, B, W] windowed score tensor from the kernels above;
    ``excl_cols [B, E]`` / ``excl_mask [B, E]`` are the padded per-user
    excluded catalog columns; ``c_real`` masks any padded catalog tail.

    Everything here is lane-friendly by construction: no scatter (the
    reference semantics' ``scores[mask] = -inf`` is replaced by finalist
    re-ranking), no big index tensors, no XLA element gathers (replaced by
    tiny one-hot matmuls — exact for catalogs < 2**24 items, f32 integers).

    Exactness: (1) top-(k+E+pad) windows by raw max cover the post-exclusion
    top-k (an excluded item inflates at most its own window's max; the single
    partially-padded window adds one more). (2) Candidate lanes beyond
    ``c_real`` are masked to −∞ BEFORE the finalist top-k — pad items (score
    0.0 from the zero-padded GEMM) would otherwise beat negative real scores
    and, when m exceeds the live window count (small catalogs / wide E),
    flood every finalist slot. (3) Among the masked candidates, excluded
    items occupy at most E of the top-(k+E) slots, so the post-exclusion
    top-k survives into the finalist set, where exclusion is applied by
    direct id comparison and the final k re-ranked.
    """
    nw, b, w = sw_t.shape
    e = excl_cols.shape[1]
    padded = nw * w > c_real
    if padded:  # fully-padded tail windows can't win
        win_ok = (jnp.arange(nw, dtype=jnp.int32) * w) < c_real
        wmax = jnp.where(win_ok[None, :], wmax, _NEG)
    m = min(k + e + (1 if padded else 0), nw)
    _, widx = lax.top_k(wmax, m)  # [B, m]
    cand_v = gather_windows(sw_t, widx, interpret=interpret)  # [B, m*W] flat
    if padded:
        # dead-mask pad lanes inside the selected windows (each candidate's
        # catalog id is known from its window id + lane, a [B, m, W] pass)
        gid = (widx[:, :, None] * w
               + lax.broadcasted_iota(jnp.int32, (b, m, w), 2))
        cand_v = jnp.where((gid >= c_real).reshape(b, m * w), _NEG, cand_v)
    k2 = min(k + e + (w - 1 if padded else 0), m * w)
    v2, p2 = lax.top_k(cand_v, k2)  # finalists
    # map finalist positions back to catalog ids via one-hot matmul (an XLA
    # take_along_axis lane gather scalarizes to ~20 ns/element on TPU)
    pw = p2 // w
    oh = (pw[:, :, None] == jnp.arange(m, dtype=pw.dtype)).astype(jnp.float32)
    wsel = jnp.einsum("bpm,bm->bp", oh, widx.astype(jnp.float32))
    cidx = wsel.astype(jnp.int32) * w + (p2 % w)  # [B, k2]
    if e:
        sent = jnp.where(excl_mask, excl_cols, -1)  # -1 never matches
        bad = (cidx[:, None, :] == sent[:, :, None]).any(axis=1)
    else:
        bad = jnp.zeros(v2.shape, bool)
    if padded:
        bad = bad | (cidx >= c_real)
    v2 = jnp.where(bad, _NEG, v2)
    v, p3 = lax.top_k(v2, min(k, c_real))
    oh3 = (p3[:, :, None] == jnp.arange(k2, dtype=p3.dtype)).astype(jnp.float32)
    idx = jnp.einsum("bpq,bq->bp", oh3, cidx.astype(jnp.float32))
    return v, idx.astype(jnp.int32)


# ------------------------------------------------------------------ end-to-end
def _pad_excl(excl_cols, excl_mask, b, bp):
    if excl_cols is None:
        excl_cols = jnp.zeros((bp, 0), jnp.int32)
        excl_mask = jnp.zeros((bp, 0), bool)
    elif bp != b:
        excl_cols = jnp.pad(excl_cols, ((0, bp - b), (0, 0)))
        excl_mask = jnp.pad(excl_mask, ((0, bp - b), (0, 0)))
    return excl_cols, excl_mask


@functools.partial(jax.jit,
                   static_argnames=("k", "window", "tb", "bc", "interpret"))
def pallas_masked_topk(u: jax.Array, items: jax.Array,
                       excl_cols: jax.Array | None,
                       excl_mask: jax.Array | None, k: int, *,
                       window: int = 128, tb: int = 256, bc: int = 1024,
                       interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """Fused dot-product scores + exclusion + exact top-k (auto-padding)."""
    b, d = u.shape
    c = items.shape[0]
    bp, cp, dp = -(-b // tb) * tb, -(-c // bc) * bc, -(-d // 128) * 128
    if dp != d:
        u = jnp.pad(u, ((0, 0), (0, dp - d)))
        items = jnp.pad(items, ((0, 0), (0, dp - d)))
    if bp != b:
        u = jnp.pad(u, ((0, bp - b), (0, 0)))
    if cp != c:
        items = jnp.pad(items, ((0, cp - c), (0, 0)))
    excl_cols, excl_mask = _pad_excl(excl_cols, excl_mask, b, bp)
    sw, wmax = score_windows(u, items, window=window, tb=tb, bc=bc,
                             interpret=interpret)
    v, idx = window_topk_phase2(sw, wmax, excl_cols, excl_mask, k, c,
                                interpret=interpret)
    return v[:b], idx[:b]


@functools.partial(jax.jit,
                   static_argnames=("k", "window", "tb", "bc", "interpret"))
def pallas_masked_topk_scores(scores: jax.Array, excl_cols: jax.Array | None,
                              excl_mask: jax.Array | None, k: int, *,
                              window: int = 128, tb: int = 256, bc: int = 1024,
                              interpret: bool = False
                              ) -> tuple[jax.Array, jax.Array]:
    """Exclusion + exact top-k over a precomputed [B, C] score matrix."""
    b, c = scores.shape
    bp, cp = -(-b // tb) * tb, -(-c // bc) * bc
    if bp != b or cp != c:
        scores = jnp.pad(scores, ((0, bp - b), (0, cp - c)),
                         constant_values=_NEG)
    excl_cols, excl_mask = _pad_excl(excl_cols, excl_mask, b, bp)
    sw, wmax = window_scores_from(scores, window=window, tb=tb, bc=bc,
                                  interpret=interpret)
    v, idx = window_topk_phase2(sw, wmax, excl_cols, excl_mask, k, c,
                                interpret=interpret)
    return v[:b], idx[:b]
