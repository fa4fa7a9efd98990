"""Throughput-oriented exact top-k selection: vectorized window peeling.

This is the "future throughput-shaped selection kernel" that rounds 1's
latency-bound iterative extraction (`ops/pallas_topk.py`) pointed at. The
round-1 kernel extracted one element per user per round through a serial
scalar chain (≈94 ms at B=1024 — no cross-user ILP). Here the extraction is
restructured so that EVERY op is a full-width VPU vector op across
users × windows simultaneously:

1. window phase (existing kernels, `ops/pallas_window.py`): scores land in
   the `[NW, B, W]` windowed tiling with per-window maxima as a free epilogue;
2. select the top-``m = k + E (+1)`` windows per user by raw window max
   (covering theorem with exclusion margin, see `ops/topk.py`);
3. gather them window-major: ``[m, B, W]`` — a free reshape away from
   ``[m·B, W]`` rows, one 128-lane window per row;
4. mask the excluded lanes of the gathered windows with a batched one-hot
   MXU matmul (``[E, m] @ [E, W]`` per user — ~2.7 GFLOP at B=1024/E=64, no
   scalarized scatter, no [B, C] pass). Exclusion MUST happen before the
   peel: excluded train items score high and cluster in id space (popular
   ids adjoin), so they would otherwise eat a window's peel budget and force
   the fallback for exactly the users the margin exists for;
5. **peel kernel**: ``t`` rounds of (row-max → min-index-of-max → mask) over
   ``[R, W]`` tiles. Every round is ~5 vector ops on full vregs — all rows
   peel in parallel, the only serial chain is the t≤16 rounds themselves;
6. merged exact top-k over the ``m·t`` peeled candidates per user (a
   `lax.top_k` at n = m·t ≪ m·W);
7. **exactness check**: the peel is complete for a user iff no window's last
   (t-th) peeled value beats the merged k-th value — any unpeeled element
   is ≤ its window's t-th value. If any user fails (post-exclusion window
   occupancy > t), a `lax.cond` branch recomputes the whole batch with the
   dense scatter + `lax.top_k` path. Exactness is unconditional; ``t`` only
   tunes the fallback rate (occupancy of the global top-k over ≥k windows
   is ≈ Poisson(1), so P(any window > 16) is negligible for
   non-adversarial score layouts).

Replaces the reference's eval ranking `scores[mask] = -inf → torch.topk`
(`/root/reference/eval/eval.py:219-222`) as the production TPU path.

Measured v5e-1, B=1024, C=100352, D=256, K=100, E=64 (see bench.py /
tests/test_pallas_peel.py for exactness): the scatter + windowed-`lax.top_k`
path runs ~12.2 ms/step end-to-end; this path replaces the dominating
(n=12800, k=100) `lax.top_k` (≈5.9 ms) and the scatter pass with the peel
kernel + an (n=m·t, k) top-k.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from sibrar_tpu.ops.pallas_window import (
    score_windows,
    window_scores_from,
)
from sibrar_tpu.ops.sparse import scatter_fill_rows

_NEG = -1e30
_PEELED = float("-inf")  # strictly below any live score incl. the -1e30 mask


# ------------------------------------------------------------------ peel kernel
def _peel_kernel(x_ref, vals_ref, lanes_ref, *, t: int, w: int):
    cur = x_ref[...]  # [R, W] — one 128-lane window per row
    lane_iota = lax.broadcasted_iota(jnp.int32, cur.shape, 1)
    vcols, lcols = [], []
    for r in range(t):  # static unroll; every op is a full-width vector op
        v = cur.max(axis=1, keepdims=True)  # [R, 1]
        li = jnp.min(jnp.where(cur == v, lane_iota, w), axis=1, keepdims=True)
        vcols.append(v)
        lcols.append(li)
        if r + 1 < t:
            cur = jnp.where(lane_iota == li, _PEELED, cur)
    vals_ref[...] = jnp.concatenate(vcols, axis=1)  # [R, t]
    lanes_ref[...] = jnp.concatenate(lcols, axis=1)


@functools.partial(jax.jit, static_argnames=("t", "rows_per_block", "interpret"))
def peel_rows(x: jax.Array, t: int, *, rows_per_block: int = 512,
              interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """Per-row top-``t`` (values + lane indices, descending, min-index ties)
    of ``x [R, W]`` — W must be a 128 multiple (one window per row)."""
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
    kernel = functools.partial(_peel_kernel, t=t, w=w)
    vals, lanes = pl.pallas_call(
        kernel,
        grid=((r_total + pad) // rb,),
        in_specs=[pl.BlockSpec((rb, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((rb, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r_total + pad, t), jnp.float32),
            jax.ShapeDtypeStruct((r_total + pad, t), jnp.int32),
        ],
        interpret=interpret,
    )(x.astype(jnp.float32))
    return vals[:r_total], lanes[:r_total]


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
    (user, window) so BOTH downstream views are free byte-reinterpretations:
    ``[B·m, W]`` peel rows and ``[B, m·T]`` merged candidates — no
    plane↔sublane relayout, no transposes anywhere in the pipeline."""
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


# ------------------------------------------------------------- orchestration
def _onehot_f32(idx: jax.Array, n: int) -> jax.Array:
    return (idx[..., None] == jnp.arange(n, dtype=idx.dtype)).astype(jnp.float32)


def peel_topk_windows(sw_t: jax.Array, wmax: jax.Array, excl_cols: jax.Array,
                      excl_mask: jax.Array, k: int, c_real: int, *,
                      t: int = 16, interpret: bool = False
                      ) -> tuple[jax.Array, jax.Array]:
    """Exact top-k (+ per-user exclusion) from windowed scores via peeling.

    All index motion avoids XLA element gathers (which scalarize at
    ~20 ns/element on TPU): peeled lane indices come out of the kernel as
    dense tensors and the final position→id mapping runs as tiny one-hot
    matmuls (exact for ids < 2**24 in f32).
    """
    nw, b, w = sw_t.shape
    e = excl_cols.shape[1]
    padded = nw * w > c_real
    if padded:  # fully-padded tail windows can't win
        win_ok = (jnp.arange(nw, dtype=jnp.int32) * w) < c_real
        wmax = jnp.where(win_ok[None, :], wmax, _NEG)
    m = min(k + e + (1 if padded else 0), nw)
    t = min(t, w)
    if m * t < k:
        raise ValueError(f"m*t = {m}*{t} < k = {k}: peel cannot cover top-k")

    _, widx = lax.top_k(wmax, m)  # [B, m] raw-max window selection
    g = gather_windows_rows(sw_t, widx, interpret=interpret)  # [B, m, W]

    # pre-peel exclusion: mask each user's excluded lanes within the selected
    # windows. oh_s[b,e,s]·oh_l[b,e,l] sums over e into a [B, m, W] hit mask —
    # a batched one-hot matmul the MXU eats, instead of a scalarized scatter.
    dead = None
    if e:
        excl_w = excl_cols // w  # window of each excluded column
        oh_s = ((excl_w[:, :, None] == widx[:, None, :]) & excl_mask[:, :, None]
                ).astype(jnp.float32)  # [B, E, m]
        oh_l = (excl_cols[:, :, None] % w
                == jnp.arange(w, dtype=jnp.int32)).astype(jnp.float32)  # [B,E,W]
        dead = jnp.einsum("bes,bel->bsl", oh_s, oh_l) > 0.0  # [B, m, W]
    if padded:  # zero-score pad items in the partial window must not peel
        gid = (widx[:, :, None] * w
               + lax.broadcasted_iota(jnp.int32, (b, m, w), 2))
        pad_dead = gid >= c_real
        dead = pad_dead if dead is None else (dead | pad_dead)
    if dead is not None:
        g = jnp.where(dead, _NEG, g)

    # [B, m, W] is (user, window)-row-major: both views below are free
    vals_r, lanes_r = peel_rows(g.reshape(b * m, w), t, interpret=interpret)
    vals = vals_r.reshape(b, m, t)
    lanes = lanes_r.reshape(b, m, t)
    mvals = vals.reshape(b, m * t)

    kk = min(k, c_real)
    v, p = lax.top_k(mvals, kk)  # n = m·t ≪ m·W
    # position → (window slot, peel round) → catalog id via one-hot matmuls
    wslot = p // t
    oh_m = _onehot_f32(wslot, m)  # [B, kk, m]
    widx_sel = jnp.einsum("bkm,bm->bk", oh_m, widx.astype(jnp.float32))
    lanes_by_round = jnp.einsum("bkm,bmr->bkr", oh_m,
                                lanes.astype(jnp.float32))  # [B, kk, t]
    oh_r = _onehot_f32(p % t, t)
    lane_sel = jnp.sum(oh_r * lanes_by_round, axis=-1)  # [B, kk]
    idx = (widx_sel * w + lane_sel).astype(jnp.int32)

    # exactness check: any unpeeled element of window slot s is ≤ its raw t-th
    # peeled value, so if no slot's t-th raw value beats the merged k-th value,
    # nothing better than the chosen k was left behind (ties arbitrary).
    ok = jnp.all(vals[:, :, t - 1] <= v[:, kk - 1:kk])

    def _peeled(_):
        return v, idx

    def _fallback(_):
        # rare: some window held > t of a user's top-k — recompute densely
        scores = sw_t.transpose(1, 0, 2).reshape(b, nw * w)
        if e:
            scores = scatter_fill_rows(scores, excl_cols, excl_mask,
                                       n_cols=nw * w, fill=_NEG)
        if padded:
            live = jnp.arange(nw * w, dtype=jnp.int32) < c_real
            scores = jnp.where(live[None, :], scores, _NEG)
        fv, fi = lax.top_k(scores, kk)
        return fv, fi

    return lax.cond(ok, _peeled, _fallback, operand=None)


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
                   static_argnames=("k", "t", "window", "tb", "bc", "interpret"))
def peel_masked_topk_scores(scores: jax.Array, excl_cols: jax.Array | None,
                            excl_mask: jax.Array | None, k: int, *,
                            t: int = 16, window: int = 128, tb: int = 256,
                            bc: int = 1024, interpret: bool = False
                            ) -> tuple[jax.Array, jax.Array]:
    """Exclusion + exact top-k over a precomputed [B, C] score matrix —
    scatter-free: one retile pass + peel selection."""
    b, c = scores.shape
    bp, cp = -(-b // tb) * tb, -(-c // bc) * bc
    if bp != b or cp != c:
        scores = jnp.pad(scores, ((0, bp - b), (0, cp - c)),
                         constant_values=_NEG)
    excl_cols, excl_mask = _pad_excl(excl_cols, excl_mask, b, bp)
    sw, wmax = window_scores_from(scores, window=window, tb=tb, bc=bc,
                                  interpret=interpret)
    v, idx = peel_topk_windows(sw, wmax, excl_cols, excl_mask, k, c, t=t,
                               interpret=interpret)
    return v[:b], idx[:b]


@functools.partial(jax.jit,
                   static_argnames=("k", "t", "window", "tb", "bc", "interpret"))
def peel_masked_topk(u: jax.Array, items: jax.Array,
                     excl_cols: jax.Array | None, excl_mask: jax.Array | None,
                     k: int, *, t: int = 16, window: int = 128, tb: int = 256,
                     bc: int = 1024, interpret: bool = False
                     ) -> tuple[jax.Array, jax.Array]:
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
    v, idx = peel_topk_windows(sw, wmax, excl_cols, excl_mask, k, c, t=t,
                               interpret=interpret)
    return v[:b], idx[:b]


def peel_viable(c: int, k: int, e: int, *, window: int = 128,
                t: int = 16) -> bool:
    """Static dispatch predicate: peeling wins when the margin window set is
    a small fraction of the catalog (heavy-history users blow up the margin
    m = k + E + 1 — the scatter path handles those better)."""
    nw = -(-c // window)
    m = min(k + e + 1, nw)
    return m * t >= k and 2 * m <= nw
