"""Ranking metrics, computed on device from top-k hit vectors.

Semantics parity with the reference's metric definitions
(`/root/reference/eval/metrics.py`: binary relevance, NaN→0 for users without
positives, NDCG clamped to ≤1, IDCG over the top-min(n_pos,k) ideal ranking) and
with the metric surface of the external `rmet` package used by the reference
evaluator (ndcg, recall, precision, f_score, hitrate, ap + the distribution
metric coverage; SURVEY.md §2.7).

TPU-first difference: instead of materializing dense `[B, n_items]` label
matrices and indexing them with top-k ids (reference
`eval/metrics.py:22-24`), every user-level metric here is derived from just
``hits[B, k_max]`` (was each top-ranked item a positive?) and ``n_pos[B]`` —
both computed with a CSR membership bisection — so the full-catalog label
densification never happens.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("ks", "metrics"))
def user_metrics_from_hits(
    hits: jax.Array,  # [B, k_max] float 0/1 — hit indicator at each rank
    n_pos: jax.Array,  # [B] int — number of relevant items per user
    ks: tuple[int, ...],
    metrics: tuple[str, ...] | None = None,
) -> dict[str, jax.Array]:
    """Per-user ndcg/recall/precision/f_score/hitrate/ap at every cutoff in `ks`.

    Returns a dict ``{f"{metric}@{k}": [B] float32}``. ``metrics`` restricts
    the emitted keys (XLA then dead-code-eliminates the unrequested chains;
    without it everything, incl. wndcg, is computed and accumulated).
    """
    k_max = hits.shape[1]
    ranks = jnp.arange(k_max)
    discount = 1.0 / jnp.log2(ranks + 2.0)  # [k_max]
    disc_cumsum = jnp.cumsum(discount)  # IDCG prefix sums
    hit_cumsum = jnp.cumsum(hits, axis=1)  # [B, k_max]
    dcg_cumsum = jnp.cumsum(hits * discount, axis=1)  # [B, k_max]
    # precision@i at every rank i (for AP)
    prec_at_i = hit_cumsum / (ranks + 1.0)  # [B, k_max]
    ap_num_cumsum = jnp.cumsum(prec_at_i * hits, axis=1)  # [B, k_max]

    n_pos_f = n_pos.astype(jnp.float32)
    out: dict[str, jax.Array] = {}
    for k in ks:
        kk = min(k, k_max)
        num_hits = hit_cumsum[:, kk - 1]
        dcg = dcg_cumsum[:, kk - 1]
        # ideal DCG: all of the first min(n_pos, k) ranks are hits
        ideal_n = jnp.clip(n_pos, 0, kk)
        idcg = jnp.where(ideal_n > 0, disc_cumsum[jnp.maximum(ideal_n - 1, 0)], 0.0)
        ndcg = jnp.where(idcg > 0, dcg / idcg, 0.0)
        ndcg = jnp.clip(ndcg, 0.0, 1.0)  # precision-safety clamp (reference :100)
        recall = jnp.where(n_pos_f > 0, num_hits / n_pos_f, 0.0)
        precision = num_hits / kk
        f_den = precision + recall
        f_score = jnp.where(f_den > 0, 2 * precision * recall / f_den, 0.0)
        hitrate = (num_hits > 0).astype(jnp.float32)
        ap_den = jnp.maximum(jnp.clip(n_pos, 0, kk), 1).astype(jnp.float32)
        ap = jnp.where(n_pos > 0, ap_num_cumsum[:, kk - 1] / ap_den, 0.0)
        # wNDCG (eq.9 of ieeexplore 9514867, reference eval/metrics.py:108-128):
        # per-rank weight w(pos,K) = discount(pos) / sum(discount[:n_pos]), so the
        # per-user sum over hit ranks is DCG / IDCG@min(n_pos,k) — with binary
        # relevance this is NDCG without the precision clamp. Wired as its own
        # key for parity with the reference metric surface.
        wndcg = jnp.where(idcg > 0, dcg / idcg, 0.0)
        for name, val in (("wndcg", wndcg), ("ndcg", ndcg),
                          ("recall", recall), ("precision", precision),
                          ("f_score", f_score), ("hitrate", hitrate),
                          ("ap", ap)):
            if metrics is None or name in metrics:
                out[f"{name}@{k}"] = val
    return out


USER_METRICS = ("ndcg", "wndcg", "recall", "precision", "f_score", "hitrate", "ap")
DISTRIBUTION_METRICS = ("coverage",)


@partial(jax.jit, static_argnames=("ks", "n_catalog"))
def coverage_flags(topk_idx: jax.Array, ks: tuple[int, ...], n_catalog: int
                   ) -> dict[str, jax.Array]:
    """Per-cutoff boolean item flags: was item i recommended to any user in this
    batch within the top-k? OR-accumulated across batches, coverage@k is then
    ``flags.mean()`` (fraction of the catalog ever recommended — the `rmet`
    coverage distribution metric)."""
    out = {}
    for k in ks:
        kk = min(k, topk_idx.shape[1])
        flags = jnp.zeros((n_catalog,), dtype=bool)
        flags = flags.at[topk_idx[:, :kk].reshape(-1)].set(True)
        out[f"coverage@{k}"] = flags
    return out


def weight_ndcg_at_k(n_pos: int, k: int = 10) -> np.ndarray:
    """wNDCG@k rank weights: w(pos, K) = (1/log2(pos+2)) / IDCG@K over the
    first `n_pos` ranks (reference eval/metrics.py:108-128, eq.9 of
    ieeexplore 9514867). Returns [k] float32."""
    discount = 1.0 / np.log2(np.arange(2, k + 2, dtype=np.float32))
    return (discount / discount[:n_pos].sum()).astype(np.float32)
