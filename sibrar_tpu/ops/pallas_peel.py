"""Throughput-oriented exact top-k selection: vectorized value peeling.

This is the "future throughput-shaped selection kernel" that round 1's
latency-bound iterative extraction (`ops/pallas_topk.py`) pointed at. The
round-1 kernel extracted one element per user per round through a serial
scalar chain (≈94 ms at B=1024 — no cross-user ILP). Two measured findings
(v5e stage bisect, tools/probe_peel_stages.py) shape this design:

- restructured as full-width VPU ops over ``[rows=B·m, W=128]`` tiles (one
  window per row, all users×windows in parallel), a 16-round extraction
  WITH per-round argmax costs ~8 ms — the int argmin/mask chains dominate;
- the same peel extracting **values only** (clear-all-ties per round, no
  index tracking) costs **~0.4 ms**. So indices are recovered OUTSIDE the
  kernel, only for the k winners.

Pipeline:

1. window phase: per-window maxima either as the `score_windows` MXU
   epilogue (`ops/pallas_window.py`, fused matmul path) or as a free-view
   XLA reshape-reduce over a precomputed [B, C] matrix;
2. correct the maxima of the ≤E windows containing the user's excluded
   items (gather those windows, mask the excluded lanes, re-max, splice) —
   with EXACT post-exclusion maxima the covering theorem needs no margin:
   select only the top-``m = k (+1 if padded)`` windows per user. (Beyond
   ``_CORR_MAX_E`` excluded items the +E margin path remains.)
3. gather the selected windows user-major (``[B, m, W]``) so every
   downstream reshape is a free row-major view;
4. mask the excluded lanes of the gathered windows with a batched one-hot
   MXU matmul (``[E, m] @ [E, W]`` per user — no scalarized scatter, no
   [B, C] pass). Exclusion MUST happen before the peel: excluded train items
   score high and cluster in id space (popular ids adjoin), so they would
   otherwise eat a window's peel budget and force the fallback for exactly
   the users the selection correction exists for;
5. **value-peel kernel**: ``t`` rounds of (row-max → clear ALL tied lanes)
   → the top-t *distinct* values per window, ~17 vector ops/round/vreg;
6. merged `lax.top_k` over the ``m·t`` peeled values per user (n = m·t ≪
   m·W — this replaces the dominating (n=m·W, k) top-k of the scatter path);
7. **index recovery for the k winners only**: re-gather each winner's
   window row from the dead-masked `g` (`gather_subwindows`), take the min
   lane equal to the winner value, count equal lanes in the same pass, and
   read the winner's catalog window id via an integer [B,k,m] one-hot
   select-sum (XLA fuses the cluster; the fused-kernel spelling of this
   step is a measured negative — see `recover_winners`);
8. **exactness checks** feeding one `lax.cond` dense fallback for the whole
   batch: (a) completeness — no window's t-th distinct value beats the
   merged k-th value (any unpeeled element is strictly below its window's
   t-th distinct value); (b) uniqueness — every winner matched exactly one
   lane in its window (an in-window duplicate of a winner value is an
   element the distinct-value merge under-counted). Exactness is therefore
   unconditional; t only tunes the fallback rate (top-k occupancy over ≥k
   windows is ≈ Poisson(1): P(any window > 16) is negligible for
   non-adversarial layouts, and real score duplicates are razor-thin).

Replaces the reference's eval ranking `scores[mask] = -inf → torch.topk`
(`/root/reference/eval/eval.py:219-222`) as the production TPU path.

Measured v5e-1, B=1024, C=100352, D=256, K=100, E=64 (tools/probe_peel*.py;
hardware parity checks bit-exact):

- scatter + windowed lax.top_k (r1 production): 11.96 ms — of which the XLA
  exclusion scatter alone is 4.2 ms and the (n=12800, k=100) top-k ~4.5 ms;
- peel on precomputed scores (`masked_topk(method="peel")`, the `auto`
  choice on TPU): **7.1 ms** (14.5e9 items/s) — no scatter (corrected
  maxima + one-hot masks), no retile (windows gathered straight off [B, C]
  with `pl.multiple_of`-aligned dynamic lane slices); 8.4 ms at E=250;
- fused matmul→top-k (`peel_masked_topk`, t=12): **6.1 ms**
  (16.9e9 items/s);
- r3 sublane-rounded m + lane-reduced completeness + t=8 default:
  scores chain 5.40 ms at C=100k / 14.8 ms at C=501760, fused 5.58 ms;
- r3 final (approx window selection + sorted-run gather + GEMM epilogue,
  trace-profiled device steps): scores chain 4.18 ms at C=100k / 12.2 ms
  at C=501760, fused dot chain 3.69 ms at C=100k / ~10.0 ms at C=501760.

Peel depth default (t=8, measured sweep in tools/probe_t.py): t=12→8→6→4
gives 5.98/5.58/5.32/5.16 ms fused at C=100k and 15.7/14.0/13.5/13.5 ms
for the 500k dot chain, but t=4 already trips completeness on 6/1024
RANDOM rows, and a simulated popularity-clustered catalog (zipf boost on
low ids — the realistic failure mode, item ids follow debut order) shows
per-user max window occupancy up to 7 at C=100k. t=8 keeps ≥1 slot of
margin over that worst case while giving up ≤0.4 ms vs t=4.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

from sibrar_tpu.ops.pallas_window import _pad_excl, score_windows
from sibrar_tpu.ops.sparse import scatter_fill_rows

_NEG = -1e30
_PEELED = float("-inf")  # strictly below any live score incl. the -1e30 mask

# Above this exclusion width the corrected-wmax pass's [B, E, NW] broadcast
# reductions get expensive; fall back to the +E window margin there.
_CORR_MAX_E = 512

# Beyond this per-row byte size the +E margin path beats the corrected-wmax
# pass. Re-measured r3 AFTER the correction gather learned the sorted-run
# chunked path (tools/probe_corr.py, v5e, C=501760/E=64/t=8): corrected
# 16.6 ms vs margin 13.8 ms — the gather is no longer the problem (it rides
# the same runs kernel as the main gather); what remains is the splice
# itself, whose [B, E, NW] match/where broadcasts scale with the window
# count (≈0.26 G element-ops per mask at NW=3920) and outgrow the margin
# path's wider sort + peel (both ∝ E but NW-independent).
_CORR_MAX_ROW_BYTES = 1 << 20

# Window-selection spelling switch: below this window count the exact
# lax.top_k sort over [B, NW] is cheap (0.25 ms at NW=784) and not worth
# the approx_max_k counting guard's extra [B, NW] pass; above it the sort
# dominates (1.99 ms at NW=3920) and PartialReduce selection wins. The
# guard keeps the approximate path exact (see _peel_select).
_APPROX_SEL_MIN_NW = 1024

# Winner-index recovery spelling: the fused `recover_winners` kernel vs the
# XLA cluster (`gather_subwindows` + hit/lane/one-hot fusions). A/B probe
# switch (tools/probe_eval_profile.py) — see _peel_select for the measured
# verdict.
_RECOVER_KERNEL = os.environ.get("SIBRAR_PEEL_RECOVER_KERNEL", "0") == "1"


def _use_corrected_wmax(c_real: int, e: int) -> bool:
    # Cost crossover (r3, tools/probe_fused_profile.py at C=100k/B=1024):
    # the correction pays ONE extra full stream of the score tensor — its
    # gather rides the same chunked kernel as the main window gather, so
    # ~C·B·4/HBM_BW (0.55 ms at C=100k) plus the [B, E, NW] splice
    # broadcasts. The margin path instead grows peel + merge + dead-mask by
    # ΔE windows (NW-independent, ~5.4 µs per excluded item per 1024 rows:
    # peel 2.0 + merge-sort 2.4 + bf16 dead-mask ~1.0). Equating the two
    # gives E* ≈ C/1024: below it the +E margin is cheaper than re-reading
    # the matrix (bench E=64 at C=100k → margin, −0.6 ms/step); above it
    # the correction amortizes (E=250 at C=100k → corrected).
    return (0 < e <= _CORR_MAX_E and c_real * 4 <= _CORR_MAX_ROW_BYTES
            and e > c_real // 1024)


def _round_m(m: int, nw: int) -> int:
    """Selected-window count rounded up to a sublane multiple (8), capped at
    the window count. With m % 8 == 0 the [B, m, W] gathered tensor is
    tile-compatible with its [B·m, W] peel-row view and the [B, m, t] peel
    output with its merge view, so the reshapes around `peel_values` lower to
    bitcasts instead of relayout copies (profiled 0.16 ms reshape + 0.07 ms
    copy at B=1024, m=100, C=100k). The extra windows are the real next-best
    windows from the same `lax.top_k`: covering holds a fortiori and the
    values stay as distinct as the data is.

    Opportunistic: the rounding only applies while the rounded m keeps the
    `2m <= nw` peel-wins margin (`peel_viable`). At small window counts
    (tiny catalogs / many item shards) the +<=7 windows are a material
    fraction of the gather and not worth a sub-0.25 ms relayout saving —
    there the unrounded cap (r2 behavior) is returned, so `peel_viable`
    verdicts are unchanged by the rounding."""
    r = -(-m // 8) * 8
    return r if 2 * r <= nw else min(m, nw)

# Per-block VMEM ceiling for the user-group gathers. Mosaic's scoped-vmem
# window is 16 MB, the pipelined [gb, C] (or [NW, gb, W]) input block is
# double-buffered, AND the block's second-to-last dim must be a multiple of
# 8 (so gb cannot drop below 8). 8·C·4·2 ≤ ~12 MB ⇒ the peel gathers only
# work up to C ≈ 192k; `peel_viable` dispatches larger catalogs to the
# scatter path (measured: gb=8 at C=501760 is a hard compile error,
# "scoped allocation 30.62M exceeds 16.00M"; gb=2 violates the sublane
# rule). A catalog-chunked gather (grid over C with conditional copies)
# would lift this.
_GATHER_VMEM_BYTES = 12 << 20
# Mosaic's hard scoped-VMEM window (double-buffered pipelined blocks must
# fit it exactly — exceeding it is a compile error, not a slowdown)
_MOSAIC_VMEM_BYTES = 16 << 20
_PEEL_MAX_ROW_BYTES = _GATHER_VMEM_BYTES // (8 * 2)  # per-row bytes at gb=8


# ---------------------------------------------------------- value-peel kernel
def _peel_values_kernel(x_ref, vals_ref, *, t: int):
    cur = x_ref[...]  # [R, W] — one 128-lane window per row
    vcols = []
    for r in range(t):  # static unroll; every op is a full-width vector op
        v = cur.max(axis=1, keepdims=True)  # [R, 1]
        vcols.append(v)
        if r + 1 < t:
            cur = jnp.where(cur == v, _PEELED, cur)  # clear ALL tied lanes
    vals_ref[...] = jnp.concatenate(vcols, axis=1)  # [R, t] distinct, desc


@functools.partial(jax.jit, static_argnames=("t", "rows_per_block", "interpret"))
def peel_values(x: jax.Array, t: int, *, rows_per_block: int = 512,
                interpret: bool = False) -> jax.Array:
    """Top-``t`` *distinct* values per row of ``x [R, W]``, descending
    (-inf-padded once a row runs out of distinct values). W % 128 == 0.

    rows_per_block=512 measured 5× faster than 64 on v5e for this values-only
    kernel (fewer grid steps; the float max/mask chains don't pressure the
    vreg file the way the indexed variant's int chains did)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r_total, w = x.shape
    if w % 128:
        raise ValueError(f"window width {w} must be a multiple of 128")
    t = min(t, w)
    rb = min(rows_per_block, -(-r_total // 8) * 8)
    pad = (-r_total) % rb
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)), constant_values=_PEELED)
    kernel = functools.partial(_peel_values_kernel, t=t)
    vals = pl.pallas_call(
        kernel,
        grid=((r_total + pad) // rb,),
        in_specs=[pl.BlockSpec((rb, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rb, t), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_total + pad, t), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.float32))
    return vals[:r_total]


def _peel_values_grouped_kernel(x_ref, vals_ref, *, t: int, ub: int, m: int):
    w = x_ref.shape[-1]
    # ONE transpose per block puts the peel rows on LANES, so every round's
    # winners land lane-major and store straight into the [t, ub·m] out
    # block. (Winners computed row-major need a vector<ub·m x t> →
    # <t x ub·m>-family shape cast on the way out, which Mosaic rejects:
    # "infer-vector-layout: unsupported shape cast".)
    cur = x_ref[...].reshape(ub * m, w).T  # [W, ub·m]
    rows = []
    for r in range(t):  # static unroll; every op is a full-width vector op
        v = cur.max(axis=0, keepdims=True)  # [1, ub·m] winners on lanes
        rows.append(v)
        if r + 1 < t:
            cur = jnp.where(cur == v, _PEELED, cur)  # clear ALL tied lanes
    vals_ref[...] = jnp.concatenate(rows, axis=0)  # [t, ub·m] desc rounds


@functools.partial(jax.jit,
                   static_argnames=("t", "users_per_block", "interpret"))
def peel_values_grouped(g: jax.Array, t: int, *, users_per_block: int = 16,
                        interpret: bool = False):
    """`peel_values` over ``g [B, m, W]`` with LANE-COMPACT outputs:
    ``(vals [B, m·t], last [B, m])`` where ``vals[b, s·t + r]`` is window
    ``s``'s round-``r`` peel and ``last`` is each window's t-th (deepest)
    value — the exactness driver's completeness check reads it directly.

    The row-flat kernel's ``[B·m, t]`` output tiles t=8 values into a
    128-lane tile row — 16× the physical HBM bytes (88 MB at B=1024,
    m=168), all re-read by the merge-view reshape and the completeness
    min-reduce (≈0.2-0.35 ms/step trace-profiled at C∈{100k, 500k}). Here
    the kernel writes a compact ``[t, B·m]`` plane (round-major) and XLA
    re-folds it to the merge layout — a 5.5 MB transpose instead of 88 MB
    of padded tiles.

    Requires ``B % ub == 0`` and ``(ub·m) % 128 == 0`` (the out-block lane
    width); with `_round_m`'s m % 8 rounding, ub=16 always satisfies the
    latter. Callers fall back to `peel_values` otherwise."""
    b, m, w = g.shape
    ub = users_per_block
    if w % 128:
        raise ValueError(f"window width {w} must be a multiple of 128")
    if b % ub or (ub * m) % 128:
        raise ValueError(f"B={b} must be a multiple of ub={ub} and "
                         f"ub·m={ub * m} a multiple of 128")
    t = min(t, w)
    kernel = functools.partial(_peel_values_grouped_kernel, t=t, ub=ub, m=m)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    vals_t = pl.pallas_call(
        kernel,
        grid=(b // ub,),
        in_specs=[pl.BlockSpec((ub, m, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((t, ub * m), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, b * m), jnp.float32),
        interpret=interpret,
    )(g.astype(jnp.float32))
    # [t, B, m] → [B, m, t] → [B, m·t]: the (window, round) merge order the
    # selection driver decodes (wslot = p // t); ~5.5 MB, one XLA transpose
    vals_flat = (vals_t.reshape(t, b, m).transpose(1, 2, 0)
                 .reshape(b, m * t))
    last = vals_t[t - 1].reshape(b, m)
    return vals_flat, last


# ----------------------------------------------------------- window maxima
def _window_max_kernel(s_ref, o_ref, *, gb: int, wpb: int, w: int):
    # static unroll with INDEPENDENT per-window reduces and one final
    # concatenate (the peel_values pattern): a fori_loop carrying the out
    # tile through `where` inserts serializes every iteration behind the
    # previous select — measured 39.7 ms/step for this kernel at C=501760
    # against ~2.5 ms for the unrolled form
    cols = []
    for j in range(wpb):
        cols.append(s_ref[:, j * w:(j + 1) * w].max(axis=1, keepdims=True))
    o_ref[...] = jnp.concatenate(cols, axis=1)


@functools.partial(jax.jit, static_argnames=("w", "gb", "interpret"))
def window_max(scores: jax.Array, w: int = 128, *, gb: int = 8,
               interpret: bool = False) -> jax.Array:
    """``out[b, j] = max(scores[b, j*w:(j+1)*w])`` on the NATIVE [B, C]
    layout. Both XLA spellings materialize a full relayout of the score
    matrix first (profiled at C=501760: ``reshape(B, NW, w).max(-1)`` a
    6.2 ms {1,0}→window-tiled copy + 2.7 ms reduce; ``lax.reduce_window``
    a 6.3 ms {1,0}→{0,1} transpose copy + 3.1 ms pool) because a (8 users,
    128 lanes) tile of the source contributes to a (8 windows, …)-tiled
    destination. Here each grid block keeps the matmul's own tiling and
    builds the [gb, 128] window-max tile with in-VMEM lane-group reduces.

    The window axis of the main call is blocked in groups of 128 (out lane
    rule); the <128-window remainder — windows are NW = C/w, rarely a
    multiple of 128 — runs through the XLA reshape on a small tail slice.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, c = scores.shape
    if c % w or w % 128:
        raise ValueError(f"shape misalignment: C={c}%{w}, W={w}%128")
    nw = c // w
    on_tpu = interpret or jax.default_backend() == "tpu"
    wpb = 128  # windows per out tile
    nw_main = (nw // wpb) * wpb
    if not on_tpu or not nw_main:
        return scores.reshape(b, nw, w).max(-1)
    if b % gb:
        gb = b  # full-dim block satisfies the sublane rule for any B
    kernel = functools.partial(_window_max_kernel, gb=gb, wpb=wpb, w=w)
    wm_main = pl.pallas_call(
        kernel,
        grid=(b // gb, nw_main // wpb),
        in_specs=[pl.BlockSpec((gb, wpb * w), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((gb, wpb), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nw_main), jnp.float32),
        interpret=interpret,
    )(scores)
    if nw == nw_main:
        return wm_main
    tail = scores[:, nw_main * w:]  # small: < 128 windows
    wm_tail = tail.reshape(b, nw - nw_main, w).max(-1)
    return jnp.concatenate([wm_main, wm_tail], axis=1)


# -------------------------------------------------------- user-major gather
def _gather_rows_kernel(widx_ref, swt_ref, out_ref, *, m: int, gb: int):
    def body(j, carry):
        for bb in range(gb):  # static unroll over the user group
            wi = widx_ref[bb, j]
            out_ref[bb, j, :] = swt_ref[wi, bb, :]
        return carry

    lax.fori_loop(0, m, body, 0)


@functools.partial(jax.jit, static_argnames=("gb", "interpret"))
def gather_windows_rows(sw_t: jax.Array, widx: jax.Array, *, gb: int = 8,
                        interpret: bool = False) -> jax.Array:
    """``out[b, j, :] = sw_t[widx[b, j], b, :]`` — user-major variant of
    `pallas_window.gather_windows`. The [B, m, W] output is row-major in
    (user, window) so the ``[B·m, W]`` peel-row view is a free byte
    reinterpretation — no plane↔sublane relayout, no transposes anywhere."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nw, b, w = sw_t.shape
    m = widx.shape[1]
    if b % gb:
        gb = b
    if w % 128:
        raise ValueError(f"shape misalignment: W={w}%128")
    kernel = functools.partial(_gather_rows_kernel, m=m, gb=gb)
    return pl.pallas_call(
        kernel,
        grid=(b // gb,),
        in_specs=[
            pl.BlockSpec((gb, m), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((nw, gb, w), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, m, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, w), jnp.float32),
        interpret=interpret,
    )(widx, sw_t)


# ----------------------------------------------- direct [B, C] window gather
def _gather_cols_kernel(widx_ref, s_ref, *rest, m: int, gb: int,
                        w: int, has_dead: bool):
    from jax.experimental import pallas as pl

    dead_ref, out_ref = rest if has_dead else (None, rest[0])

    def body(j, carry):
        for bb in range(gb):  # static unroll over the user group
            off = pl.multiple_of(widx_ref[bb, j] * w, w)  # provably aligned
            row = s_ref[bb, pl.ds(off, w)]
            if has_dead:  # mask excluded/pad lanes on copy (no extra pass)
                row = jnp.where(dead_ref[bb, j, :], _PEELED, row)
            out_ref[bb, j, :] = row
        return carry

    lax.fori_loop(0, m, body, 0)


def _gather_cols_chunked_kernel(widx_ref, s_ref, *rest, m: int, gb: int,
                                w: int, cb: int, has_dead: bool):
    """Catalog-chunked variant: the [gb, C] row block would blow Mosaic's
    scoped-VMEM window for C ≳ 192k, so the grid adds a C axis and each step
    sees only a [gb, cb] chunk; every (row, window) pair copies from exactly
    the one chunk containing it (predicated store; the out block is revisited
    across the inner C axis and written back once at the end)."""
    from jax.experimental import pallas as pl

    dead_ref, out_ref = rest if has_dead else (None, rest[0])
    base = pl.program_id(1) * cb

    def body(j, carry):
        for bb in range(gb):  # static unroll over the user group
            off = widx_ref[bb, j] * w - base

            @pl.when((off >= 0) & (off < cb))
            def _copy(off=off, bb=bb, j=j):
                row = s_ref[bb, pl.ds(pl.multiple_of(off, w), w)]
                if has_dead:
                    row = jnp.where(dead_ref[bb, j, :], _PEELED, row)
                out_ref[bb, j, :] = row
        return carry

    lax.fori_loop(0, m, body, 0)


def _gather_cols_runs_kernel(widx_ref, bounds_ref, s_ref, *rest,
                             gb: int, w: int, cb: int, has_dead: bool):
    """Sorted-rows chunked variant: rows of `widx` are ascending, so the
    windows a chunk serves form one contiguous run [bounds[b, ci],
    bounds[b, ci+1]) per row — each grid step copies exactly its run with
    dynamic loop bounds instead of scanning all m with a predicate. At
    C=501760, m=164, 4 chunks this is 168k copies total instead of 671k
    predicated iterations (profiled 9.3 → ~4 ms expectation)."""
    from jax.experimental import pallas as pl

    dead_ref, out_ref = rest if has_dead else (None, rest[0])
    ci = pl.program_id(1)
    base = ci * cb

    for bb in range(gb):  # static unroll over the user group
        def body(j, carry, bb=bb):
            off = widx_ref[bb, j] * w - base
            row = s_ref[bb, pl.ds(pl.multiple_of(off, w), w)]
            if has_dead:
                row = jnp.where(dead_ref[bb, j, :], _PEELED, row)
            out_ref[bb, j, :] = row
            return carry

        lax.fori_loop(bounds_ref[bb, ci], bounds_ref[bb, ci + 1], body, 0)


def _gather_out_bytes(gb: int, m: int, w: int) -> int:
    """Scoped-VMEM bytes of the gather's [gb, m, w] out block plus the
    optional bool dead-mask input block of the same shape (both counted
    double-buffered: they change at every user-group grid step)."""
    return 2 * gb * m * w * (4 + 1)


def _pick_chunk(c: int, gb: int, w: int, m: int) -> int:
    """Largest divisor of C that is a multiple of W and keeps the
    double-buffered [gb, cb] input block PLUS the [gb, m, w] out block
    inside the scoped-VMEM budget (the out block grows with the peel margin
    m = k+E+1, so ignoring it lets large-E configs blow Mosaic's 16 MB
    scoped window at compile time)."""
    budget_cols = max(_GATHER_VMEM_BYTES - _gather_out_bytes(gb, m, w),
                      0) // (gb * 4 * 2)
    n_chunks = 1
    while (c // n_chunks > budget_cols or c % n_chunks
           or (c // n_chunks) % w):
        n_chunks += 1
        if n_chunks > c // w:
            return w  # degenerate; every chunk is one window
    return c // n_chunks


@functools.partial(jax.jit,
                   static_argnames=("w", "gb", "sorted_rows", "interpret"))
def gather_score_windows(scores: jax.Array, widx: jax.Array, *, w: int = 128,
                         gb: int = 8, sorted_rows: bool = False,
                         dead: jax.Array | None = None,
                         interpret: bool = False) -> jax.Array:
    """``out[b, j, :] = scores[b, widx[b,j]*w : (widx[b,j]+1)*w]`` straight
    off the [B, C] score matrix: the lane offsets are dynamic but provably
    128-aligned (`pl.multiple_of`), which Mosaic accepts — so the windowed
    [NW, B, W] retile pass (an extra 2×[B,C] HBM round trip) is not needed
    at all on this path. Catalogs too wide for a resident [gb, C] block
    (C ≳ 192k) switch to a chunked kernel automatically; pass
    ``sorted_rows=True`` (rows of `widx` ascending) there so each chunk
    copies one contiguous run per row instead of predicating over all m.

    ``dead`` ([B, m, W] bool) lanes are set to −∞ ON COPY. Mosaic accepts
    pred VMEM blocks (tools/probe_pred_input.py), but NOTE the measured
    negative: on the peel path this is a net LOSS — XLA widens the pred to
    s32 to materialize it for the kernel (88 MB, 0.44 ms/step at B=1024,
    m=168) where the plain XLA where fuses the whole mask computation into
    one pass over the output (0.27 ms/step) — so `_peel_select` keeps the
    where in XLA. The input remains for callers whose mask is already
    materialized."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, c = scores.shape
    m = widx.shape[1]
    if b % gb:
        gb = b
    if c % w or w % 128:
        raise ValueError(f"shape misalignment: C={c}%{w}, W={w}%128")
    has_dead = dead is not None
    dead_ops = (dead,) if has_dead else ()

    def _dead_spec(index_map):
        return (pl.BlockSpec((gb, m, w), index_map,
                             memory_space=pltpu.VMEM),) if has_dead else ()

    if gb * c * 4 * 2 + _gather_out_bytes(gb, m, w) > _GATHER_VMEM_BYTES:
        cb = _pick_chunk(c, gb, w, m)
        n_chunks = c // cb
        if sorted_rows:
            wpc = cb // w
            edges = jnp.arange(n_chunks + 1, dtype=jnp.int32) * wpc
            bounds = jnp.sum(widx[:, :, None] < edges[None, None, :],
                             axis=1).astype(jnp.int32)  # [B, n_chunks+1]
            kernel = functools.partial(_gather_cols_runs_kernel, gb=gb,
                                       w=w, cb=cb, has_dead=has_dead)
            return pl.pallas_call(
                kernel,
                grid=(b // gb, n_chunks),
                in_specs=[
                    pl.BlockSpec((gb, m), lambda i, j: (i, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((gb, n_chunks + 1), lambda i, j: (i, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((gb, cb), lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM),
                    *_dead_spec(lambda i, j: (i, 0, 0)),
                ],
                out_specs=pl.BlockSpec((gb, m, w), lambda i, j: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((b, m, w), jnp.float32),
                interpret=interpret,
            )(widx, bounds, scores, *dead_ops)
        kernel = functools.partial(_gather_cols_chunked_kernel, m=m, gb=gb,
                                   w=w, cb=cb, has_dead=has_dead)
        return pl.pallas_call(
            kernel,
            grid=(b // gb, n_chunks),
            in_specs=[
                pl.BlockSpec((gb, m), lambda i, j: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((gb, cb), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                *_dead_spec(lambda i, j: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((gb, m, w), lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, m, w), jnp.float32),
            interpret=interpret,
        )(widx, scores, *dead_ops)
    kernel = functools.partial(_gather_cols_kernel, m=m, gb=gb, w=w,
                               has_dead=has_dead)
    return pl.pallas_call(
        kernel,
        grid=(b // gb,),
        in_specs=[
            pl.BlockSpec((gb, m), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((gb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *_dead_spec(lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((gb, m, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, w), jnp.float32),
        interpret=interpret,
    )(widx, scores, *dead_ops)


# ------------------------------------------------------- winner-row gather
def _gather_sub_kernel(slot_ref, g_ref, out_ref, *, kk: int, gb: int):
    def body(s, carry):
        for bb in range(gb):  # static unroll over the user group
            out_ref[bb, s, :] = g_ref[bb, slot_ref[bb, s], :]
        return carry

    lax.fori_loop(0, kk, body, 0)


@functools.partial(jax.jit, static_argnames=("gb", "interpret"))
def gather_subwindows(g: jax.Array, slots: jax.Array, *, gb: int = 8,
                      interpret: bool = False) -> jax.Array:
    """``out[b, s, :] = g[b, slots[b, s], :]`` — winner-row fetch from the
    already-gathered (and dead-masked) [B, m, W] window tensor: one ~86 MB
    pass instead of re-reading the full [B, C] scores, and the exclusion
    masking comes along for free."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, m, w = g.shape
    kk = slots.shape[1]
    if b % gb:
        gb = b
    kernel = functools.partial(_gather_sub_kernel, kk=kk, gb=gb)
    return pl.pallas_call(
        kernel,
        grid=(b // gb,),
        in_specs=[
            pl.BlockSpec((gb, kk), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((gb, m, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, kk, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, kk, w), jnp.float32),
        interpret=interpret,
    )(slots, g)


# -------------------------------------------------------- winner recovery
def _recover_kernel(slot_ref, slot_v_ref, widx_ref, v_ref, g_ref,
                    lane_ref, nhit_ref, wsel_ref, rows_ref, *,
                    kk: int, gb: int, m: int, w: int):
    def body(s, carry):
        for bb in range(gb):  # static unroll over the user group
            rows_ref[bb, s, :] = g_ref[bb, slot_ref[bb, s], :]
        return carry

    lax.fori_loop(0, kk, body, 0)
    rows = rows_ref[...]
    hit = rows == v_ref[...]  # [gb, kk, W] vs [gb, kk, 1] lane broadcast
    lane_iota = lax.broadcasted_iota(jnp.int32, (gb, kk, w), 2)
    lane_ref[...] = jnp.min(jnp.where(hit, lane_iota, w), axis=-1)
    nhit_ref[...] = jnp.sum(hit.astype(jnp.int32), axis=-1)
    # winner window ids on the VPU: a [gb, kk, m] one-hot select against the
    # slot ids — NOT a per-winner scalar SMEM lookup chain (3 scalar ops ×
    # gb·kk per block serialize to ~0.9 ms/step at B=1024, kk=100; the
    # vector spelling is ~17M lane-ops total, noise)
    slot_iota = lax.broadcasted_iota(jnp.int32, (gb, kk, m), 2)
    oh = slot_iota == slot_v_ref[...]  # [gb, kk, m] vs [gb, kk, 1]
    widx_b = jnp.reshape(widx_ref[...], (gb, 1, m))
    wsel_ref[...] = jnp.max(jnp.where(oh, widx_b, 0), axis=-1)


@functools.partial(jax.jit, static_argnames=("gb", "interpret"))
def recover_winners(g: jax.Array, widx: jax.Array, slots: jax.Array,
                    v: jax.Array, *, gb: int = 8, interpret: bool = False):
    """Fused winner-index recovery: for each winner ``(b, s)`` fetch its
    window row ``g[b, slots[b,s], :]`` into VMEM scratch and emit

    - ``lane [B, kk]``: first lane whose value equals the winner value,
    - ``n_hit [B, kk]``: number of equal lanes (the uniqueness check input),
    - ``widx_sel [B, kk]``: the winner's catalog window id ``widx[b, slots]``.

    MEASURED NEGATIVE (r3, trace-profiled A/B at both C=100k and C=500k,
    B=1024/kk=100/m=168 on v5e): this kernel costs **1.20–1.41 ms/step**
    where the XLA cluster it was meant to replace (`gather_subwindows` +
    hit/lane fusions + integer one-hot widx contraction) costs ~0.69 ms
    (whole step 4.18 vs 4.62 ms at 100k, 12.22 vs 12.75 ms at 500k). The
    fusion-avoidance intuition (keep the [B, kk, W] rows tensor and the
    [B, kk, m] one-hot out of HBM) loses to two Mosaic costs the XLA path
    doesn't pay: the 800 scalar-chained row copies per block serialize
    against their SMEM slot loads, and the (gb, kk, 1) value/slot blocks
    need lane-broadcast relayouts before every vector compare. Kept behind
    ``SIBRAR_PEEL_RECOVER_KERNEL=1`` (off by default) as the record of the
    experiment; `_peel_select` rides the XLA spelling."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, m, w = g.shape
    kk = slots.shape[1]
    if b % gb:
        gb = b
    kernel = functools.partial(_recover_kernel, kk=kk, gb=gb, m=m, w=w)
    lane, n_hit, widx_sel = pl.pallas_call(
        kernel,
        grid=(b // gb,),
        in_specs=[
            pl.BlockSpec((gb, kk), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((gb, kk, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, kk, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, m, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((gb, kk), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, kk), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, kk), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, kk), jnp.int32),
                   jax.ShapeDtypeStruct((b, kk), jnp.int32),
                   jax.ShapeDtypeStruct((b, kk), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((gb, kk, w), jnp.float32)],
        interpret=interpret,
    )(slots, slots[:, :, None], widx, v[:, :, None], g)
    return lane, n_hit, widx_sel


# ------------------------------------------------------------- orchestration
def _peel_select(gather_fn, wmax, excl_cols, excl_mask, k: int, c_real: int,
                 nw: int, w: int, fallback_fn, *, t: int,
                 interpret: bool, with_fallback: bool = True,
                 b_real: int | None = None):
    """Shared peel pipeline: window selection → gather → pre-peel exclusion →
    value peel → merged top-k → winner-only index recovery → exactness
    checks with a `lax.cond` dense fallback.

    ``gather_fn(widx [B, m]) -> [B, m, W]`` must return bit-exact score rows.
    All index motion avoids XLA element gathers (which scalarize at
    ~20 ns/element on TPU); winner window ids use an integer one-hot
    contraction (a float einsum would ride the MXU's lossy bf16 passes).

    ``b_real`` masks batch-padding rows (appended when B % tb != 0) out of
    the exactness checks: pad rows have constant scores, so every winner
    value ties across its whole window (n_hit = W) — without the mask the
    uniqueness check is identically False and every padded batch silently
    takes the dense fallback.
    """
    b = wmax.shape[0]
    b_real = b if b_real is None else b_real
    e = excl_cols.shape[1]
    padded = nw * w > c_real
    if padded:  # fully-padded tail windows can't win
        win_ok = (jnp.arange(nw, dtype=jnp.int32) * w) < c_real
        wmax = jnp.where(win_ok[None, :], wmax, _NEG)

    correct_wmax = _use_corrected_wmax(c_real, e)
    if correct_wmax:
        # exact post-exclusion maxima for the ≤E affected windows: gather
        # them, mask the user's excluded lanes, re-max, and splice back.
        # This removes the +E window margin entirely (m = k+1 instead of
        # k+E+1): selection by corrected maxima needs no displacement slack,
        # every downstream stage shrinks by ~E/k, and peel viability stops
        # depending on user-history length.
        excl_w = jnp.where(excl_mask, excl_cols // w, nw)  # nw: no window
        # Sort the per-row window keys (pads carry the sentinel nw, sorting
        # past every real window) so the correction gather rides the chunked
        # kernel's sorted-run fast path REGARDLESS of pad placement — shard-
        # local exclusion masks interleave pads (parallel/mesh._local_
        # exclusions), so trailing-pad order can't be assumed. A lane sort
        # of [B, E] int32 is VPU-cheap; no argsort/take_along_axis (which
        # scalarizes) is needed because slot→entry pairing happens through
        # the same one-hot contraction that builds the dead-lane masks.
        key = jnp.sort(excl_w, axis=1)  # [B, E] ascending, pads last
        ge = gather_fn(jnp.minimum(key, nw - 1), sorted_rows=True)  # [B,E,W]
        # dead lanes of sorted slot s: any excluded col whose window is the
        # slot's window (pads never match: key==nw has no excl_w pair with
        # excl_mask set... excl_w==nw pairs ONLY with pad slots, and those
        # are masked out of the splice below via key < nw)
        slot_w = ((excl_w[:, :, None] == key[:, None, :])
                  & excl_mask[:, :, None]).astype(jnp.bfloat16)  # [B, E, Es]
        oh_le = (excl_cols[:, :, None] % w
                 == jnp.arange(w, dtype=jnp.int32)).astype(jnp.bfloat16)
        # bf16 one-hots are exact 0/1 and accumulate in f32 — and keep the
        # contraction off the VPU loop-fusion path (the f32 spelling ran as
        # a Σ_E compare-product fusion: 0.4 ms at [1024, 64, 104]·[.., 128])
        dead_e = jnp.einsum("bes,bel->bsl", slot_w, oh_le,
                            preferred_element_type=jnp.float32) > 0.0
        corr = jnp.where(dead_e, _PEELED, ge).max(-1)  # [B, Es]
        match = key[:, :, None] == jnp.arange(nw, dtype=jnp.int32)
        corr_b = jnp.max(jnp.where(match, corr[:, :, None], _NEG), axis=1)
        wmax = jnp.where(match.any(axis=1), corr_b, wmax)
        m = _round_m(k + (1 if padded else 0), nw)  # exact maxima: no margin
    else:
        m = _round_m(k + e + (1 if padded else 0), nw)
    # Adaptive peel depth: the t=8 default is a STATISTICAL margin that only
    # holds when the top-k spreads over many windows (measured worst-case
    # per-user window occupancy 7 at C=100k, even popularity-clustered). At
    # small window counts — tiny catalogs or per-shard slices of an item-
    # sharded mesh — one window can hold most of the top-k, so deepen toward
    # the t >= k completeness guarantee (3·k/nw reaches it exactly where a
    # 3x-of-expected occupancy no longer fits the default). Cost is ∝ m·t
    # and m is small exactly when nw is, so the deep rounds stay cheap.
    # Count LIVE windows only: catalog padding to the chunk size can append
    # fully-dead windows (nw_real=2 vs nw=8 at c_real=256, bc=1024) that
    # never hold a winner and must not dilute the occupancy estimate.
    kk0 = min(k, c_real)
    nw_real = -(-c_real // w)
    t = max(t, min(-(-3 * kk0) // nw_real, kk0))
    t = min(t, w)

    # [B, m] window selection by (corrected) maxima. At large window counts
    # the exact lax.top_k is a full [B, NW] variadic sort (1.99 ms of the
    # 10.8 ms 500k dot chain); lax.approx_max_k rides the TPU PartialReduce
    # unit instead. Exactness survives approximation through a counting
    # guard: if every window whose max exceeds the selected minimum WAS
    # selected, then any unselected window's max <= thresh <= each selected
    # window's max, so >= m live-margin items dominate any unselected item
    # and the covering argument goes through verbatim — a recall miss just
    # trips the guard and rides the existing per-row fallback channel.
    # (Measured recall on random wmax at NW=3920/m=168: 1.0.)
    sel_ok = None
    if nw >= _APPROX_SEL_MIN_NW:
        sel_v, widx = lax.approx_max_k(wmax, m, recall_target=0.95)
        thresh = jnp.min(sel_v, axis=1, keepdims=True)  # [B, 1]
        sel_ok = (jnp.sum(wmax > thresh, axis=1)
                  == jnp.sum(sel_v > thresh, axis=1))  # [B]
    else:
        _, widx = lax.top_k(wmax, m)
    # ascending window order: every downstream stage is permutation-invariant
    # over the m axis (the merge top-ks over all m·t), and the chunked gather
    # then copies one contiguous run per catalog chunk instead of predicating
    # over all m windows each chunk
    widx = jnp.sort(widx, axis=1)

    # pre-peel exclusion: mask each user's excluded lanes within the selected
    # windows. oh_s[b,e,s]·oh_l[b,e,l] sums over e into a [B, m, W] hit mask —
    # a batched one-hot matmul the MXU eats, instead of a scalarized scatter.
    # Measured negative (r3): applying the mask ON COPY inside the gather
    # kernel (gather_score_windows's `dead` input) forces the bool mask to
    # materialize for the kernel (XLA widens the pred to s32 — an 88 MB
    # write, 0.44 ms/step), where the XLA spelling below fuses the whole
    # einsum→compare→where into ONE pass over g (0.27 ms/step). Keep the
    # where in XLA.
    dead = None
    if e:
        excl_w = excl_cols // w  # window of each excluded column
        oh_s = ((excl_w[:, :, None] == widx[:, None, :]) & excl_mask[:, :, None]
                ).astype(jnp.bfloat16)  # [B, E, m]
        oh_l = (excl_cols[:, :, None] % w
                == jnp.arange(w, dtype=jnp.int32)).astype(jnp.bfloat16)  # [B,E,W]
        # bf16 0/1 one-hots with f32 accumulation: exact counts, and the
        # contraction stays off the VPU loop-fusion path (f32 spelling:
        # 0.4 ms as a Σ_E compare-product fusion at [1024, 64, 104]·[.., 128])
        dead = jnp.einsum("bes,bel->bsl", oh_s, oh_l,
                          preferred_element_type=jnp.float32) > 0.0  # [B,m,W]
    if padded:  # zero-score pad items in the partial window must not peel
        gid = (widx[:, :, None] * w
               + lax.broadcasted_iota(jnp.int32, (b, m, w), 2))
        pad_dead = gid >= c_real
        dead = pad_dead if dead is None else (dead | pad_dead)
    g = gather_fn(widx, sorted_rows=True)  # [B, m, W]
    if dead is not None:
        g = jnp.where(dead, _PEELED, g)

    # grouped peel emits the merge layout [B, m·t] lane-compact plus each
    # window's deepest value (the row-flat [B·m, t] output tiles t values
    # into 128-lane rows: 16× the HBM bytes, re-read twice downstream)
    if b % 16 == 0 and (16 * m) % 128 == 0:
        vals_flat, last = peel_values_grouped(g, t, interpret=interpret)
    else:  # odd batches / unrounded m: the row-flat kernel is unconstrained
        vals = peel_values(g.reshape(b * m, w), t,
                           interpret=interpret).reshape(b, m, t)
        vals_flat = vals.reshape(b, m * t)
        last = jnp.min(vals, axis=-1)

    kk = min(k, c_real)
    v, p = lax.top_k(vals_flat, kk)  # n = m·t ≪ m·W

    # winner-only index recovery. Two spellings, trace-profiled r3 at
    # B=1024/kk=100/m=168 (v5e): the fused `recover_winners` kernel keeps
    # the [B, kk, W] rows tensor and the [B, kk, m] one-hot out of HBM but
    # costs 1.20 ms/step — its 800 scalar-chained row copies per block plus
    # the (gb, kk, 1) lane-broadcast relayouts dominate — where the XLA
    # cluster below (gather_subwindows + hit/lane fusions + integer one-hot
    # widx contraction) runs at ~0.69 ms/step riding full XLA fusion. The
    # kernel stays behind SIBRAR_PEEL_RECOVER_KERNEL=1 as a measured
    # negative. The window id uses an INTEGER one-hot contraction and the
    # winner's row is re-fetched from the dead-masked `g` itself — both
    # bit-exact (a float einsum would ride the MXU's lossy bf16 passes).
    wslot = p // t
    if _RECOVER_KERNEL:
        lane, n_hit, widx_sel = recover_winners(g, widx, wslot, v,
                                                interpret=interpret)
    else:
        oh_m = (wslot[:, :, None]
                == jnp.arange(m, dtype=wslot.dtype))  # [B, kk, m]
        widx_sel = jnp.sum(jnp.where(oh_m, widx[:, None, :], 0), axis=-1)
        rows = gather_subwindows(g, wslot, interpret=interpret)  # [B, kk, W]
        hit = rows == v[:, :, None]  # [B, kk, W]
        lane_iota = jnp.arange(w, dtype=jnp.int32)
        lane = jnp.min(jnp.where(hit, lane_iota, w), axis=-1)  # [B, kk]
        n_hit = jnp.sum(hit, axis=-1)  # in-window duplicates of a winner
    idx = widx_sel * w + jnp.minimum(lane, w - 1)

    # exactness checks (docstring item 8), PER ROW. A -inf winner means the
    # selected windows ran out of distinct values before filling k slots
    # (duplicate-heavy degenerate scores) — the distinct-value merge
    # under-counts there, so it must also take the dense fallback. Per-row
    # flags let drivers redo only affected batches instead of the whole
    # evaluation, and keep one degenerate user (e.g. cold items with equal
    # embeddings sharing a window) from defeating the peel batch-wide.
    # per-window t-th peeled value == min over the (descending) peel rounds,
    # emitted directly by the grouped kernel's `last` output
    complete = jnp.all(last <= v[:, kk - 1:kk], axis=1)
    unique = jnp.all(n_hit == 1, axis=1)
    all_live = jnp.all(v > _PEELED, axis=1)
    ok = complete & unique & all_live
    if sel_ok is not None:  # approximate window selection: counting guard
        ok = ok & sel_ok
    if b_real < b:  # batch-padding rows never count against exactness
        ok = ok | (jnp.arange(b, dtype=jnp.int32) >= b_real)

    if not with_fallback:
        # caller handles the (rare) not-ok redo at the driver level. This
        # variant exists because XLA predicates `lax.cond` inside
        # `lax.scan`/`lax.map` bodies — BOTH branches execute, so the dense
        # fallback's full-catalog top-k would run every batch (measured:
        # ~0.19 s/batch instead of ~8 ms in the fused whole-eval program).
        return v, idx, ok

    def _peeled(_):
        return v, idx

    def _fallback(_):
        # rare: a window held > t distinct winner values, a winner value
        # duplicates inside its window, or the peel ran dry — recompute the
        # whole batch densely from the caller-provided score source
        scores = fallback_fn()
        if e:
            scores = scatter_fill_rows(scores, excl_cols, excl_mask,
                                       n_cols=nw * w, fill=_NEG)
        if padded:
            live_col = jnp.arange(nw * w, dtype=jnp.int32) < c_real
            scores = jnp.where(live_col[None, :], scores, _NEG)
        fv, fi = lax.top_k(scores, kk)
        return fv, fi

    return lax.cond(jnp.all(ok), _peeled, _fallback, operand=None)


def peel_topk_windows(sw_t: jax.Array, wmax: jax.Array, excl_cols: jax.Array,
                      excl_mask: jax.Array, k: int, c_real: int, *,
                      t: int = 8, interpret: bool = False,
                      with_fallback: bool = True, b_real: int | None = None):
    """Exact top-k (+ per-user exclusion) from [NW, B, W] windowed scores
    (the `score_windows` fused-matmul layout) via value peeling."""
    nw, b, w = sw_t.shape

    def gather_fn(wi, sorted_rows=False, dead=None):  # plane gather
        g = gather_windows_rows(sw_t, wi, interpret=interpret)
        if dead is not None:  # windowed-layout path: mask as an XLA pass
            g = jnp.where(dead, _PEELED, g)
        return g

    def fallback_fn():
        return sw_t.transpose(1, 0, 2).reshape(b, nw * w)

    return _peel_select(gather_fn, wmax, excl_cols, excl_mask, k, c_real,
                        nw, w, fallback_fn, t=t, interpret=interpret,
                        with_fallback=with_fallback, b_real=b_real)


def peel_topk_from_scores(scores: jax.Array, excl_cols: jax.Array,
                          excl_mask: jax.Array, k: int, c_real: int, *,
                          window: int = 128, t: int = 8,
                          interpret: bool = False,
                          with_fallback: bool = True,
                          b_real: int | None = None,
                          wmax: jax.Array | None = None):
    """Exact top-k (+ per-user exclusion) straight off a padded [B, C] score
    matrix: window maxima are one max-pool pass on the native layout and
    windows are gathered with aligned dynamic lane slices — the [NW, B, W]
    retile pass (2 extra [B, C] HBM round trips) never happens. Producers
    that already have the maxima (the fused `score_native_wmax` epilogue)
    pass them via ``wmax``, skipping that read entirely."""
    b, c = scores.shape
    nw = c // window
    if wmax is None:
        wmax = window_max(scores, window, interpret=interpret)

    def gather_fn(wi, sorted_rows=False, dead=None):
        return gather_score_windows(scores, wi, w=window,
                                    sorted_rows=sorted_rows, dead=dead,
                                    interpret=interpret)

    return _peel_select(gather_fn, wmax, excl_cols, excl_mask, k, c_real,
                        nw, window, lambda: scores, t=t, interpret=interpret,
                        with_fallback=with_fallback, b_real=b_real)


# ------------------------------------------------------------------ end-to-end
@functools.partial(jax.jit,
                   static_argnames=("k", "t", "window", "tb", "bc", "interpret",
                                    "with_fallback"))
def peel_masked_topk_scores(scores: jax.Array, excl_cols: jax.Array | None,
                            excl_mask: jax.Array | None, k: int, *,
                            t: int = 8, window: int = 128, tb: int = 256,
                            bc: int = 1024, interpret: bool = False,
                            with_fallback: bool = True):
    """Exclusion + exact top-k over a precomputed [B, C] score matrix —
    scatter-free and retile-free: direct window gathers + value peeling."""
    b, c = scores.shape
    bp, cp = -(-b // tb) * tb, -(-c // bc) * bc
    if bp != b or cp != c:
        scores = jnp.pad(scores, ((0, bp - b), (0, cp - c)),
                         constant_values=_NEG)
    excl_cols, excl_mask = _pad_excl(excl_cols, excl_mask, b, bp)
    out = peel_topk_from_scores(scores, excl_cols, excl_mask, k, c,
                                window=window, t=t, interpret=interpret,
                                with_fallback=with_fallback, b_real=b)
    if with_fallback:
        v, idx = out
        return v[:b], idx[:b]
    v, idx, ok = out
    return v[:b], idx[:b], ok[:b]


@functools.partial(jax.jit,
                   static_argnames=("k", "t", "window", "tb", "bc", "interpret",
                                    "with_fallback", "c_real"))
def peel_masked_topk_dot(u: jax.Array, items: jax.Array,
                         excl_cols: jax.Array | None,
                         excl_mask: jax.Array | None,
                         k: int, *, t: int = 8, window: int = 128,
                         tb: int = 256, bc: int = 1024,
                         interpret: bool = False,
                         with_fallback: bool = True,
                         c_real: int | None = None):
    """Dot-product scores + exclusion + exact top-k with the fused
    native-layout epilogue: one GEMM pass writes [B, C] scores AND their
    window maxima (`ops/pallas_window.score_native_wmax`), then selection
    runs the scores-path peel with its wmax read deleted. Unlike
    `peel_masked_topk` (windowed [NW, B, W] tiling, VMEM-capped at
    C ≈ 192k) this scales to arbitrary catalogs via the chunked sorted-run
    gather.

    ``c_real``: callers that hold the item table across many batches (the
    fused whole-eval driver) pre-pad it ONCE to the ``bc`` chunk multiple
    with zero rows and pass the live count here — the per-call jnp.pad of
    a big table costs 0.137 ms/step at C=100k (trace-profiled r3). Zero pad
    rows are exactly what the internal pad produces, and `_peel_select`
    dead-masks every lane ≥ c_real."""
    from sibrar_tpu.ops.pallas_window import score_native_wmax

    b, d = u.shape
    c, di = items.shape
    if c_real is None:
        c_real = c
    elif not (c % bc == 0 and c_real <= c < c_real + bc):
        raise ValueError(
            f"c_real={c_real}: items must be pre-padded to the next bc="
            f"{bc} multiple (got {c} rows)")
    bp, cp, dp = (-(-b // tb) * tb, -(-c // bc) * bc,
                  -(-max(d, di) // 128) * 128)
    if dp != d:
        u = jnp.pad(u, ((0, 0), (0, dp - d)))
    if dp != di:
        items = jnp.pad(items, ((0, 0), (0, dp - di)))
    if bp != b:
        u = jnp.pad(u, ((0, bp - b), (0, 0)))
    if cp != c:
        items = jnp.pad(items, ((0, cp - c), (0, 0)))
    excl_cols, excl_mask = _pad_excl(excl_cols, excl_mask, b, bp)
    # the GEMM's user-block size must divide the padded batch: 1024 (items
    # read once) when it does, else this function's own tb (bp % tb == 0 by
    # construction) — without this a 1536-row padded batch hits the kernel's
    # alignment check
    gemm_tb = 1024 if bp % 1024 == 0 else (bp if bp <= 1024 else tb)
    scores, wmax = score_native_wmax(u, items, window=window, tb=gemm_tb,
                                     bc=bc, interpret=interpret)
    out = peel_topk_from_scores(scores, excl_cols, excl_mask, k, c_real,
                                window=window, t=t, interpret=interpret,
                                with_fallback=with_fallback, b_real=b,
                                wmax=wmax)
    if with_fallback:
        v, idx = out
        return v[:b], idx[:b]
    v, idx, ok = out
    return v[:b], idx[:b], ok[:b]


@functools.partial(jax.jit,
                   static_argnames=("k", "t", "window", "tb", "bc", "interpret",
                                    "with_fallback"))
def peel_masked_topk(u: jax.Array, items: jax.Array,
                     excl_cols: jax.Array | None, excl_mask: jax.Array | None,
                     k: int, *, t: int = 8, window: int = 128, tb: int = 256,
                     bc: int = 1024, interpret: bool = False,
                     with_fallback: bool = True):
    """Fused dot-product scores + exclusion + exact top-k: the [B, C] score
    matrix never materializes — `score_windows` writes the windowed tiling
    (+ window maxima) straight out of the MXU epilogue."""
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
    out = peel_topk_windows(sw, wmax, excl_cols, excl_mask, k, c, t=t,
                            interpret=interpret, with_fallback=with_fallback,
                            b_real=b)
    if with_fallback:
        v, idx = out
        return v[:b], idx[:b]
    v, idx, ok = out
    return v[:b], idx[:b], ok[:b]


def peel_viable(c: int, k: int, e: int, *, window: int = 128,
                t: int = 8, fused: bool = False) -> bool:
    """Static dispatch predicate: peeling wins when the selected window set
    is a small fraction of the catalog. With the corrected-wmax pass the
    margin no longer depends on E (m = k+1) up to ``_CORR_MAX_E``; beyond
    that the +E margin applies and the scatter path wins for wide margins.

    ``fused=True`` asks about the fused matmul→top-k path
    (`peel_masked_topk`): its [NW, gb, W] windowed-layout gather holds the
    whole row set in VMEM, so catalogs beyond ``_PEEL_MAX_ROW_BYTES``
    (C ≳ 192k) are not viable there. The scores path has a catalog-chunked
    gather and carries no C limit."""
    nw = -(-c // window)
    if fused and nw * window * 4 > _PEEL_MAX_ROW_BYTES:
        return False
    corrected = e > 0 and _use_corrected_wmax(c, e)
    margin = 1 if (e == 0 or corrected) else e + 1
    m = _round_m(k + margin, nw)  # matches _peel_select's sublane rounding
    # the scores-path window gather must fit its [gb, m, W] out block plus
    # at least a one-window input chunk in scoped VMEM (m grows with E on
    # the margin path — see _pick_chunk)
    if (not fused and _gather_out_bytes(8, m, window) + 2 * 8 * window * 4
            > _GATHER_VMEM_BYTES):
        return False
    # the fused path's gather_windows_rows is NOT chunked: the whole
    # [NW, gb, W] row set AND its [gb, width, W] out block (width = m for
    # the margin gather, E for the corrected-wmax gather) live in scoped
    # VMEM double-buffered. The row cap alone admits inputs that consume
    # the entire window at large-E margins / wide corrected gathers — a
    # hard Mosaic compile error ("scoped allocation exceeds 16.00M"), so
    # this bound is against the real 16 MB window, not the conservative
    # planning budget above.
    if fused:
        gwidth = max(m, e if corrected else 0)
        # >= — at exactly 16 MB there is zero headroom and compile success
        # is not guaranteed; the scores-path chunked gather covers the
        # geometry anyway
        if (2 * 8 * nw * window * 4 + 2 * 8 * gwidth * window * 4
                >= _MOSAIC_VMEM_BYTES):
            return False
    return m * t >= k and 2 * m <= nw
