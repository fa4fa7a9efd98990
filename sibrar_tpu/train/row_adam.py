"""Row-wise sparse Adam for large id-embedding tables (TPU-first).

Dense-Adam training of a `[n, d]` embedding table pays full-table HBM
passes every step twice over: autodiff materializes the dense grad
(scatter-add of the batch rows into zeros), then adam re-reads and
rewrites the params and both moment tables. At Onion scale
(n=500k, d=256) that is ~11 GB of HBM traffic per step for work that
only concerns a few thousand rows — step cost scales with TABLE size,
not batch size.

This module implements `torch.optim.SparseAdam` semantics
(the standard embedding-table optimizer; the reference's dense torch Adam
is the same math restricted to touched rows, with untouched rows' momentum
frozen instead of coasting):

- moments update ONLY for rows touched this step;
- bias correction uses the GLOBAL step count;
- duplicate indices in a batch coalesce exactly (grads sum, the row
  updates once) — matching dense autodiff's scatter-add.

Everything is row-granular: `[M, d]` gathers, a sorted-run coalesce, and
full-row scatters — all shapes XLA vectorizes on TPU (the scalarization
cliffs are for small-minor-dim element gathers; full-row ops are fast).
The forward side is handled by `models.layers.Embedding`'s row injection:
the trainer gathers `table[idxs]` outside autodiff and differentiates
w.r.t. the rows, so no dense `[n, d]` grad ever exists.

Reference analog: none — `/root/reference/train/trainer.py:62-66` builds
dense `torch.optim.Adam` only; this is the scaling path the reference
lacks for embedding-table-dominant models (MF family at large catalogs).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


def row_adam_init(table: jax.Array) -> Dict[str, jax.Array]:
    """Zero first/second moments, same shape/dtype as the table."""
    return {"mu": jnp.zeros_like(table), "nu": jnp.zeros_like(table)}


def coalesce_rows(idx: jax.Array, g: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Sort ``idx`` and replace each row of ``g`` with its duplicate-group
    total, so every occurrence of a row index carries the SAME coalesced
    grad (scatters with duplicate indices then write identical values —
    deterministic by construction).

    Returns ``(sorted_idx [M], coalesced_g [M, d])``.
    """
    order = jnp.argsort(idx)
    s_idx = idx[order]
    s_g = g[order]
    run_start = jnp.concatenate(
        [jnp.ones((1,), bool), s_idx[1:] != s_idx[:-1]])
    run_id = jnp.cumsum(run_start) - 1  # [M] dense ranks, ascending
    tot = jax.ops.segment_sum(s_g, run_id, num_segments=s_idx.shape[0])
    return s_idx, tot[run_id]


def row_adam_update(
    table: jax.Array,
    opt: Dict[str, jax.Array],
    idx: jax.Array,
    g: jax.Array,
    step: jax.Array,
    *,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    wd: float = 0.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One SparseAdam step on the rows ``idx`` of ``table``.

    ``idx`` may contain duplicates (a batch that samples the same item
    twice); their grads coalesce exactly as dense autodiff would sum them.
    ``step`` is the POST-update global step count (1 on the first step),
    used for bias correction — torch SparseAdam's `state['step']`.
    ``wd`` applies torch's L2-into-grad decay to TOUCHED rows only (torch
    SparseAdam has no weight_decay at all; this is the natural sparse
    extension, documented as a deviation).
    """
    d = table.shape[-1]
    idx = idx.reshape(-1).astype(jnp.int32)
    g = g.reshape(-1, d).astype(table.dtype)
    s_idx, g_c = coalesce_rows(idx, g)

    p_rows = table[s_idx]
    if wd:
        g_c = g_c + wd * p_rows
    mu_rows = b1 * opt["mu"][s_idx] + (1.0 - b1) * g_c
    nu_rows = b2 * opt["nu"][s_idx] + (1.0 - b2) * g_c * g_c
    t = step.astype(jnp.float32)
    mu_hat = mu_rows / (1.0 - b1**t)
    nu_hat = nu_rows / (1.0 - b2**t)
    new_rows = p_rows - lr * mu_hat / (jnp.sqrt(nu_hat) + eps)

    # plain set-scatter, NO lowering hints (duplicates write identical
    # values — deterministic). Measured on [500k, 256] (v5e traces +
    # optimized HLO): XLA runs each scatter IN PLACE as a kCustom fusion,
    # but the row loop is sequential at ~81 ns/row (0.46 ms for 5632 item
    # rows; the user table's 512 rows cost 0.04 ms) — ~1.4 ms/step total,
    # still ~8× under dense adam's full-table moment passes. Alternatives,
    # all measured NEGATIVES:
    # - `indices_are_sorted=True` flips the lowering to a full-scan merge
    #   (1.6 ms per scatter, 10 ms/step total); drop-mode dedup +
    #   `unique_indices=True` is equally bad (two full passes each);
    # - an optimization_barrier between the row math and the scatter
    #   changes nothing — the 81 ns/row is the scatter loop itself;
    # - a Pallas per-row-DMA scatter kernel is TILING-BLOCKED: Mosaic
    #   rejects single-row slices of (8,128)-tiled buffers ("slice shape
    #   along dimension 0 must be aligned to tiling (8)"), and the
    #   8-aligned block read-modify-write alternative costs 2 DMA issues +
    #   16 rows of traffic per update plus same-block serialization —
    #   strictly worse than XLA's loop at these row counts.
    return (
        table.at[s_idx].set(new_rows),
        {"mu": opt["mu"].at[s_idx].set(mu_rows),
         "nu": opt["nu"].at[s_idx].set(nu_rows)},
    )


def find_sparse_tables(model: Any, params: Dict[str, Any],
                       min_rows: int) -> Dict[str, str]:
    """``{module_name: "user"|"item"}`` for every table the model declares
    in its ``table_index_map`` whose params hold an `Embedding` table with
    at least ``min_rows`` rows.

    The contract a declaring model promises: the named module is our
    `layers.Embedding`, applied EXACTLY ONCE per training forward, with
    exactly the user index batch (``"user"`` → the `[B]` user ids) or the
    item index batch (``"item"`` → the `[B, 1+n_neg]` global item ids).
    The Embedding's shape assert catches violations at trace time.
    """
    spec: Dict[str, str] = {}
    timap = getattr(model, "table_index_map", None) or {}
    for name, src in timap.items():
        if src not in ("user", "item"):
            raise ValueError(
                f"table_index_map[{name!r}] must be 'user' or 'item', "
                f"got {src!r}")
        sub = params.get(name)
        table = sub.get("embedding") if isinstance(sub, dict) else None
        # features >= 8: sub-sublane rows (bias tables, d=1) would scatter
        # 1-lane updates — and at [n, 1] the dense adam pass is trivially
        # cheap anyway, so those stay dense
        if table is not None and table.ndim == 2 and \
                table.shape[0] >= min_rows and table.shape[1] >= 8:
            spec[name] = src
    return spec
