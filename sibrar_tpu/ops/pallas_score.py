"""Pallas TPU kernel: fused score + window-max for full-catalog ranking.

One kernel pass computes, per (user-tile, catalog-block) grid step:

    scores_t = items_block @ u_tile.T          (MXU, catalog-major layout)
    wmax_t   = per-window max over catalog rows (VPU reduce, matmul epilogue)

writing the transposed score block [BC, TB] and its window maxes [BC/W, TB].
The catalog-major layout keeps every block offset tile-aligned (Mosaic requires
lane offsets provably divisible by 128 and sublane offsets by 8 — a [B, C/W]
window-max row fails that; [C/W, B] blocks don't). Compared to the XLA pipeline
(matmul → full-array exclusion scatter copy → reshape-max read), this removes
one full read+write of the score matrix: the window maxes fall out of the
matmul epilogue and no scatter pass exists.

Exclusion moves to the candidate phase: select the top-(k + L) windows (an
excluded item can displace at most one window each, so the covering theorem in
`ops/topk.py` still guarantees exactness with L = exclusion-list width), gather
their elements, mask the excluded ones with an unrolled broadcast compare, and
rerank exactly.

Replaces the reference's eval chain `torch.mm → scores[mask] = -inf → topk`
(`/root/reference/eval/eval.py:207-222`) for dot-product scorers. Gated to
L ≤ ~256; for heavier exclusion the scatter path in `ops/topk.py` wins.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -1e30


def _kernel(u_ref, it_ref, scores_t_ref, wmax_t_ref, *, window: int, bc: int):
    scores_t = jnp.dot(it_ref[:], u_ref[:].T,
                       preferred_element_type=jnp.float32)  # [BC, TB]
    tb = scores_t.shape[1]
    scores_t_ref[:] = scores_t
    # consecutive catalog rows share a window: split the sublane axis
    wmax_t_ref[:] = scores_t.reshape(bc // window, window, tb).max(axis=1)


@functools.partial(jax.jit, static_argnames=("window", "tb", "bc", "interpret"))
def fused_score_wmax(u: jax.Array, items: jax.Array, *, window: int = 64,
                     tb: int = 256, bc: int = 512, interpret: bool = False
                     ) -> tuple[jax.Array, jax.Array]:
    """(scores_t [C, B], window maxes wmax_t [C/window, B]) in one pass.

    Requires B % tb == 0, C % bc == 0, bc % window == 0, D % 128 == 0,
    window ≥ 8 (sublane tiling).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, d = u.shape
    c = items.shape[0]
    if b % tb or c % bc or bc % window or d % 128 or window % 8:
        raise ValueError(
            f"shape misalignment: B={b}%{tb}, C={c}%{bc}, bc={bc}%{window}, "
            f"D={d}%128, window={window}%8")

    grid = (b // tb, c // bc)
    kernel = functools.partial(_kernel, window=window, bc=bc)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bc, tb), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bc // window, tb), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, b), jnp.float32),
            jax.ShapeDtypeStruct((c // window, b), jnp.float32),
        ],
        interpret=interpret,
    )(u, items)


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


@functools.partial(jax.jit, static_argnames=("k", "window", "tb", "bc",
                                             "interpret"))
def fused_masked_topk(u: jax.Array, items: jax.Array, excl_cols: jax.Array,
                      k: int, *, window: int = 64, tb: int = 256,
                      bc: int = 512, interpret: bool = False
                      ) -> tuple[jax.Array, jax.Array]:
    """End-to-end: dot-product scores with exclusion → exact top-k.

    `excl_cols` is [B, L] int32, padded with any sentinel ≥ C. Phase 1 is the
    fused Pallas kernel; phase 2 selects the top-(k+L) windows from the
    precomputed wmax, masks excluded candidates, and reranks exactly. Pads
    B/C/D as needed; returns catalog indices.
    """
    b, d = u.shape
    c = items.shape[0]
    n_excl = excl_cols.shape[1]
    pad_b = (-b) % tb
    pad_c = (-c) % bc
    pad_d = (-d) % 128
    if pad_d:
        u = jnp.pad(u, ((0, 0), (0, pad_d)))
        items = jnp.pad(items, ((0, 0), (0, pad_d)))
    if pad_b:
        u = jnp.pad(u, ((0, pad_b), (0, 0)))
        excl_cols = jnp.pad(excl_cols, ((0, pad_b), (0, 0)),
                            constant_values=np.int32(2**30))
    if pad_c:
        items = jnp.pad(items, ((0, pad_c), (0, 0)))

    scores_t, wmax_t = fused_score_wmax(
        u, items, window=window, tb=tb, bc=bc, interpret=interpret)
    cp, bp = scores_t.shape
    n_win = cp // window
    wmax = wmax_t.T  # [B, n_win] (tiny)
    if pad_c:
        # padded catalog tail: zero item rows score 0 and could win windows
        win_ok = (jnp.arange(n_win) * window) < c
        wmax = jnp.where(win_ok[None, :], wmax, _NEG)

    # +1 when the catalog is padded: the window straddling c contains
    # zero-score pad items whose max can displace one real window when all
    # true scores are negative (mirrors ops/pallas_window.window_topk_phase2)
    m = min(k + n_excl + (1 if pad_c else 0), n_win)
    _, widx = jax.lax.top_k(wmax, m)  # [B, m]
    # gather candidate windows from the catalog-major scores
    sw = scores_t.reshape(n_win, window, bp)
    cand_v = jax.vmap(lambda wi, col: sw[wi, :, col], in_axes=(0, 0))(
        widx, jnp.arange(bp))  # [B, m, window]
    cand_v = cand_v.reshape(bp, m * window)
    cand_c = (widx[:, :, None] * window
              + jnp.arange(window, dtype=widx.dtype)[None, None, :]
              ).reshape(bp, m * window)
    hit = cand_c >= c  # padded tail
    for e in range(n_excl):  # unrolled broadcast compare (see module docstring)
        hit = hit | (cand_c == excl_cols[:, e][:, None])
    cand_v = jnp.where(hit, _NEG, cand_v)
    v, p = jax.lax.top_k(cand_v, min(k, c))
    idx = jnp.take_along_axis(cand_c, p, axis=1)
    return v[:b], idx[:b]
