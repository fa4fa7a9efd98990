"""Fast exact top-k with exclusion for full-catalog ranking — the eval hot path.

The reference's eval loop densifies CSR exclusion rows and calls torch.topk per
user batch (`/root/reference/eval/eval.py:207-222`). Here the whole chain is
jit-fused and the top-k itself uses a two-phase **exact** windowed algorithm
tuned for TPU:

1. reshape scores [B, C] → [B, C/W, W], take per-window max (VPU reduce);
2. select the top-M windows per user (top-k over C/W ≪ C elements);
3. gather those windows' scores (M·W elements) and run exact top-k on them.

Exactness: any global top-k item's window has window-max ≥ that item's value,
and at most k windows can have window-max ≥ the k-th item's value (each such
window contains a distinct item ≥ it), so the top-k windows cover all top-k
items (ties broken arbitrarily, same as torch.topk). Measured on v5e at
B=512, C=100k, K=100: ~2.9× over naive `lax.top_k` end-to-end.

Exclusion variants:
- ``scatter``: scatter −∞ into the excluded positions, then windowed top-k.
- ``noscatter``: select top-(k + margin) windows on RAW scores with
  margin ≥ the per-user exclusion count (an excluded item can displace at most
  one window each), then mask excluded candidates by bisecting each user's
  sorted exclusion list. Avoids the full [B, C] scatter pass; exact by the
  same covering argument with ≤ margin additional high windows.

``masked_topk`` picks automatically based on exclusion-list length.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from sibrar_tpu.ops.sparse import DeviceCSR, csr_row_gather, scatter_fill_rows

_NEG = -1e30


@partial(jax.jit, static_argnames=("k", "window"))
def windowed_topk(scores: jax.Array, k: int, window: int = 128
                  ) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over the last axis via the two-phase window algorithm."""
    b, c = scores.shape
    if k >= c or c <= 2 * window:
        return lax.top_k(scores, min(k, c))
    pad = (-c) % window
    if pad:
        scores = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=_NEG)
    n_win = (c + pad) // window
    sw = scores.reshape(b, n_win, window)
    wmax = sw.max(-1)
    m = min(k, n_win)
    _, widx = lax.top_k(wmax, m)  # [B, m]
    cand_v = jnp.take_along_axis(sw, widx[:, :, None], axis=1).reshape(b, m * window)
    cand_c = (widx[:, :, None] * window
              + jnp.arange(window, dtype=widx.dtype)[None, None, :]
              ).reshape(b, m * window)
    v, p = lax.top_k(cand_v, k)
    return v, jnp.take_along_axis(cand_c, p, axis=1)


@partial(jax.jit, static_argnames=("k", "window", "margin"))
def windowed_topk_excluded(scores: jax.Array, exclude_csr: DeviceCSR,
                           u_idxs: jax.Array, k: int, *, window: int = 64,
                           margin: int | None = None
                           ) -> tuple[jax.Array, jax.Array]:
    """Exact top-k of `scores` with each user's CSR row columns treated as −∞ —
    without ever scattering into the [B, C] matrix. Exclusion membership is the
    fixed-iteration CSR bisection (`ops/sparse.csr_contains`), which stays fully
    vectorized on TPU (a vmapped `searchsorted` lowers to a serial per-row loop
    — measured 40× slower)."""
    from sibrar_tpu.ops.sparse import csr_contains

    b, c = scores.shape
    margin = exclude_csr.max_row_len if margin is None else margin
    pad = (-c) % window
    if pad:
        scores = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=_NEG)
    n_win = (c + pad) // window
    sw = scores.reshape(b, n_win, window)
    wmax = sw.max(-1)
    m = min(k + margin, n_win)
    _, widx = lax.top_k(wmax, m)
    cand_v = jnp.take_along_axis(sw, widx[:, :, None], axis=1).reshape(b, m * window)
    cand_c = (widx[:, :, None] * window
              + jnp.arange(window, dtype=widx.dtype)[None, None, :]
              ).reshape(b, m * window)
    hit = csr_contains(exclude_csr, u_idxs[:, None], cand_c)
    cand_v = jnp.where(hit, _NEG, cand_v)
    v, p = lax.top_k(cand_v, k)
    return v, jnp.take_along_axis(cand_c, p, axis=1)


def masked_topk(scores: jax.Array, exclude_csr: DeviceCSR, u_idxs: jax.Array,
                k: int, method: str = "auto", return_ok: bool = False):
    """Top-k of `scores[b]` with the user's already-interacted items excluded
    (set to −∞). All methods are exact; they differ only in speed.

    With ``return_ok=True`` returns ``(values, indices, ok)`` where ``ok``
    is a per-row [B] bool vector and the peel method SKIPS its in-graph dense
    fallback: callers inside `lax.scan`/`lax.map` bodies must use this and
    redo batches with any not-ok row themselves — XLA predicates `lax.cond`
    inside loop bodies, so the in-graph fallback would execute (and bill)
    every iteration. Non-peel methods are fallback-free and return all-True.

    - ``full``: scatter + plain `lax.top_k` (the baseline semantics).
    - ``scatter``: scatter + windowed top-k.
    - ``noscatter``: windowed top-k with candidate-phase exclusion.
    - ``pallas``: fused retile+window-max Pallas kernel + margin-window
      selection + finalist re-ranking exclusion (`ops/pallas_window.py`).
      Exact, TPU only, and currently ~1.8× SLOWER than ``scatter`` end-to-end
      (21 ms vs 11.9 ms at B=1024, C=100k, K=100, E=64 on v5e): the k+E
      window margin inflates the final `lax.top_k` to (n=21120, k=164),
      and XLA's top-k costs ≈ n·k·4.6 ns per 1024 rows — it dominates
      everything. Kept as the substrate for a future in-kernel selection.
    - ``peel``: the vectorized value-peel selection pipeline
      (`ops/pallas_peel.py`) — scatter-free exclusion via corrected window
      maxima + one-hot masks, direct aligned window gathers off [B, C],
      and an (n=k·t, k) merged `lax.top_k` instead of the dominating
      (n=k·W, k) one. Exact (covering theorem + peel-completeness checks
      with a rare dense fallback/redo).
    - ``auto``: ``peel`` on TPU whenever `peel_viable` passes (the CLAUDE.md
      invariant — the production eval path); ``full`` for tiny catalogs
      (C ≤ 4096 or k ≥ C); ``scatter`` otherwise and on every non-TPU
      backend. (The noscatter variant measured ~40× slower on v5e — the
      candidate-phase CSR-bisection gathers do not vectorize well; the
      round-1 ``pallas`` pipeline loses on the top-k margin. W=128 is the
      measured optimum: W=64 → 13.2 ms, W=32 → 20.9 ms on the scatter
      chain.)
    """
    c = scores.shape[-1]
    if method == "auto":
        if c <= 4096 or k >= c:
            method = "full"
        elif jax.default_backend() == "tpu":
            from sibrar_tpu.ops.pallas_peel import peel_viable

            # v5e, B=1024/C=100k/K=100/E=64: peel 7.9 ms vs scatter 12.0 ms
            # (1.5×; the XLA exclusion scatter alone costs 4.2 ms). Scatter
            # remains for huge exclusion margins and small catalogs.
            method = ("peel" if peel_viable(c, k, exclude_csr.max_row_len)
                      else "scatter")
        else:
            method = "scatter"
    elif method == "peel":
        # explicit request still has to pass the same gates the `auto` path
        # applies: the Pallas kernels are TPU-only (they fail at runtime on
        # CPU/GPU) and a non-viable geometry (m*t < k) would make the merged
        # lax.top_k(n=m*t, k) an invalid call. Degrade to scatter with a log
        # rather than crash — configs carry method across backends.
        from sibrar_tpu.ops.pallas_peel import peel_viable

        if (jax.default_backend() != "tpu"
                or not peel_viable(c, k, exclude_csr.max_row_len)):
            import logging

            logging.getLogger(__name__).warning(
                "topk method 'peel' requested but not usable here "
                "(backend=%s, C=%d, k=%d, E=%d); using 'scatter'",
                jax.default_backend(), c, k, exclude_csr.max_row_len)
            method = "scatter"
    elif method == "pallas" and jax.default_backend() != "tpu":
        # same degrade rule as explicit 'peel': Pallas kernels fail at
        # runtime off-TPU and configs carry method across backends
        import logging

        logging.getLogger(__name__).warning(
            "topk method 'pallas' requested on backend=%s (TPU-only); "
            "using 'scatter'", jax.default_backend())
        method = "scatter"

    if method == "peel":
        # exclusion rides the peel's window margin + one-hot masking — the
        # XLA row scatter alone costs ~4.2 ms at B=1024/C=100k/E=64 on v5e
        # (the single biggest line item of the whole eval chain)
        from sibrar_tpu.ops.pallas_peel import peel_masked_topk_scores

        cols, mask = csr_row_gather(exclude_csr, u_idxs)
        tb = min(256, -(-scores.shape[0] // 8) * 8)
        return peel_masked_topk_scores(scores, cols, mask, k, tb=tb,
                                       with_fallback=not return_ok)

    if return_ok:  # every non-peel method is fallback-free by construction
        v, i = masked_topk(scores, exclude_csr, u_idxs, k, method=method)
        return v, i, jnp.ones(scores.shape[0], bool)

    if method == "pallas":
        from sibrar_tpu.ops.pallas_window import pallas_masked_topk_scores

        cols, mask = csr_row_gather(exclude_csr, u_idxs)
        tb = min(256, -(-scores.shape[0] // 8) * 8)  # small batches: one tile
        return pallas_masked_topk_scores(scores, cols, mask, k, tb=tb)

    if method == "noscatter" and exclude_csr.max_row_len > 0:
        return windowed_topk_excluded(scores, exclude_csr, u_idxs, k)

    cols, mask = csr_row_gather(exclude_csr, u_idxs)
    scores = scatter_fill_rows(scores, cols, mask, n_cols=c, fill=_NEG)
    if method in ("scatter", "noscatter"):
        return windowed_topk(scores, k)
    return lax.top_k(scores, min(k, c))
