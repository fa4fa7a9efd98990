"""Full-catalog evaluation engine.

Parity target: the reference `FullEvaluator` + `evaluate_recommender_algorithm`
(`/root/reference/eval/eval.py:20-227`): iterate users in the split, score the
whole catalog, mask out already-interacted (train/val) items with −inf, compute
ndcg/recall/precision/f_score/hitrate/ap at all cutoffs (mean and std across
users), coverage over accumulated top-k lists, and optional per-user-group
breakdowns on categorical user features. Key naming matches the reference:
``{prefix}/{metric}@{k}`` plus ``..._std`` variants, group keys
``{prefix}/{feature}/{label}/{metric}@{k}``.

TPU-first design: item representations are computed once for the catalog, each
user batch is one jitted step (einsum scoring → exclusion scatter → top-k →
CSR-bisection hit test → metric derivation) with no dense label matrices and no
host round-trips inside the loop; the per-user metric vectors that leave the
device are tiny ``[B]`` arrays.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sibrar_tpu.config.schema import EvalConfig, FeatureType
from sibrar_tpu.data.dataset import DeviceData, RecDataset
from sibrar_tpu.eval.metrics import (
    DISTRIBUTION_METRICS,
    USER_METRICS,
    coverage_flags,
    user_metrics_from_hits,
)
from sibrar_tpu.ops.sparse import csr_contains_rows
from sibrar_tpu.ops.topk import masked_topk


def natsort_key(s: str):
    import re

    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]


class FullEvaluator:
    """Batch-incremental metric accumulation over full-catalog rankings."""

    def __init__(
        self,
        config: EvalConfig,
        dataset: RecDataset,
        device_data: Optional[DeviceData] = None,
        evaluator_name: Optional[str] = None,
        mesh=None,
    ):
        self.config = config
        self.name = evaluator_name
        self.dataset = dataset
        self.mesh = mesh  # catalog-sharded top-k over the item axis when set
        self.data = device_data if device_data is not None else dataset.to_device()

        known = set(USER_METRICS) | set(DISTRIBUTION_METRICS)
        invalid = set(config.metrics) - known
        if invalid:
            raise ValueError(f"Metric(s) {invalid} are not supported. Choose from {known}.")
        self._user_metrics = [m for m in config.metrics if m in USER_METRICS]
        self._dist_metrics = [m for m in config.metrics if m in DISTRIBUTION_METRICS]
        self.ks = tuple(sorted(config.top_k))
        self.k_max = min(max(self.ks), self.dataset.n_items_in_split)

        # group-metric features must be categorical (reference eval/eval.py:85-87)
        self._group_features = {}
        for fname in config.group_metrics:
            feat = dataset.user_features.get(fname)
            if feat is None:
                raise ValueError(f'Dataset does not contain user feature "{fname}".')
            if feat.type != FeatureType.CATEGORICAL:
                raise ValueError(f'User feature "{fname}" is not categorical.')
            self._group_features[fname] = feat

        self._eval_batch_raw = self._make_eval_batch()
        self._eval_batch = jax.jit(self._eval_batch_raw)
        # only the peel top-k can report not-ok rows; when it cannot be
        # chosen, skip the per-batch ok sync on the eager driver entirely
        # (each host round trip costs ~25 ms through remote tunnels and
        # would break the accumulate-on-device invariant for nothing).
        # Item-sharded meshes peel per shard, so they count too.
        self._peel_possible = (
            jax.default_backend() == "tpu"
            and getattr(config, "topk_method", "auto") in ("auto", "peel"))
        self.reset()

    def reset(self):
        self._per_user: Dict[str, list] = {}
        self._per_user_users: list = []
        self._valid: list = []
        self._cov_flags: Dict[str, jax.Array] = {}

    def _metrics_from_topk(self, topk_idx, u_idxs):
        """Shared metric tail: hit-test the top-k ids against the positive
        CSR and derive every requested user metric + coverage flags."""
        data, ks = self.data, self.ks
        hits = csr_contains_rows(data.pos_csr, u_idxs,
                                 topk_idx).astype(jnp.float32)
        n_pos = (data.pos_csr.indptr[u_idxs + 1]
                 - data.pos_csr.indptr[u_idxs])
        return (user_metrics_from_hits(hits, n_pos, ks,
                                       metrics=tuple(self._user_metrics)),
                coverage_flags(topk_idx, ks, self.dataset.n_items_in_split))

    # ------------------------------------------------------------------ build step
    def _make_eval_batch(self, method: Optional[str] = None):
        """Build ``eval_batch(scores, u_idxs) -> (metrics, cov, ok)``.

        ``ok`` is a scalar bool: False only when the peel top-k's exactness
        check tripped. The in-graph dense fallback is deliberately NOT used —
        XLA predicates `lax.cond` inside `lax.map`/`lax.scan` bodies, so it
        would execute every batch (measured ~0.19 s/batch vs ~8 ms). Drivers
        redo not-ok batches with the scatter variant
        (`_scatter_eval_batch`)."""
        data = self.data
        k_max = self.k_max
        n_catalog = self.dataset.n_items_in_split

        method = method or getattr(self.config, "topk_method", "auto")
        mesh = self.mesh

        def eval_batch(scores: jax.Array, u_idxs: jax.Array):
            # exclusion + exact top-k in one fused fast path
            # (reference eval/eval.py:219-222 semantics; see ops/topk.py)
            if mesh is not None and mesh.shape.get("item", 1) > 1:
                # multi-chip: per-shard exclusion (only the user's columns
                # that land in each shard's slice — no full [B, C] scatter)
                # + per-shard selection (peel on TPU when viable) + tiny
                # candidate merge over ICI. method='scatter' (the redo
                # variant) forces the fallback-free per-shard path.
                from sibrar_tpu.ops.sparse import csr_row_gather
                from sibrar_tpu.parallel.mesh import sharded_masked_topk

                cols, mask = csr_row_gather(data.exclude_csr, u_idxs)
                n_shards = mesh.shape["item"]
                pad = (-n_catalog) % n_shards
                s = scores
                if pad:
                    s = jnp.pad(s, ((0, 0), (0, pad)), constant_values=-1e30)
                # honor ANY explicit non-peel method (scatter/full/noscatter/
                # pallas) as the fallback-free per-shard scatter: those
                # methods disable _peel_possible (no ok sync, no redo), so
                # letting the auto gate pick peel here would silently accept
                # tripped exactness flags
                _, topk_idx, ok = sharded_masked_topk(
                    s, cols, mask, k_max, mesh,
                    use_peel=(None if method in ("auto", "peel") else False),
                    return_ok=True)
            else:
                _, topk_idx, ok = masked_topk(
                    scores, data.exclude_csr, u_idxs, k_max, method=method,
                    return_ok=True)
            metrics, cov = self._metrics_from_topk(topk_idx, u_idxs)
            return metrics, cov, ok

        return eval_batch

    def _scatter_eval_batch(self):
        """Fallback-free redo variant (scatter exclusion + windowed top-k)."""
        if not hasattr(self, "_eval_batch_scatter"):
            self._eval_batch_scatter = self._make_eval_batch(method="scatter")
        return self._eval_batch_scatter

    def _jit_scatter_eval_batch(self):
        """Cached JITted redo program — shared by the eager driver
        (`eval_batch`) and the fused whole-eval driver (`evaluate_model`) so
        a redo never retraces/recompiles per validation."""
        if not hasattr(self, "_jit_eval_batch_scatter"):
            self._jit_eval_batch_scatter = jax.jit(self._scatter_eval_batch())
        return self._jit_eval_batch_scatter

    def make_dot_eval_batch(self, user_repr_fn, items, interpret: bool = False):
        """Fused matmul→exclusion→top-k eval batch for plain dot-product
        models: one GEMM pass writes the [B, C] scores AND their window
        maxima (`score_native_wmax` epilogue), then the chunked sorted-run
        peel selects (`ops/pallas_peel.peel_masked_topk_dot` — 4.81 ms vs
        the generic scores chain's ~5.4 at B=1024/C=100k/E=64 on v5e, and
        15.3 vs 14.5-17.7 at C=500k). Returns None when the fast path
        doesn't apply (sharded catalog handled separately, non-TPU backend,
        unviable margins) — callers then fall back to the generic scores
        path."""
        import jax as _jax

        # an explicit scatter/full/noscatter topk_method pins the scores
        # path (e.g. to rule out the peel kernels while debugging) — the
        # dot fast paths are peel-based, so they must stand down
        if getattr(self.config, "topk_method", "auto") not in ("auto", "peel"):
            return None
        # test hook: lets the full evaluate_model driver (which cannot pass
        # interpret) exercise the Pallas paths on the CPU mesh in CI
        interpret = interpret or getattr(self, "dot_interpret", False)
        if self.mesh is not None and self.mesh.shape.get("item", 1) > 1:
            return self._make_sharded_dot_eval_batch(user_repr_fn, items,
                                                     interpret=interpret)
        if _jax.default_backend() != "tpu" and not interpret:
            return None
        from sibrar_tpu.ops.pallas_peel import (
            peel_masked_topk_dot,
            peel_viable,
        )

        data = self.data
        n_catalog = self.dataset.n_items_in_split
        if items.shape[0] != n_catalog:
            return None
        e = data.exclude_csr.max_row_len
        # one kernel at every catalog scale: the native-layout GEMM epilogue
        # writes [B, C] scores + window maxima in one pass and selection
        # runs the chunked sorted-run peel (peel_masked_topk_dot — bitwise
        # identical scores to the XLA matmul, no C limit). The windowed-
        # tiling variant (peel_masked_topk) was re-measured r3 at t=8 and
        # lost at its own home scale (5.58 ms vs 4.81 at B=1024/C=100k,
        # E=64): its [NW, B, W] plane gather never gained the sublane-
        # rounding/sorted-run wins of the scores-path chain.
        if not peel_viable(n_catalog, self.k_max, e):
            return None
        k_max = self.k_max
        # pad the catalog to the kernel's chunk multiple ONCE: items are
        # encoded once per evaluation but eval_batch runs per user batch,
        # and the in-kernel jnp.pad of a big table costs 0.137 ms/step at
        # C=100k (trace-profiled r3). Zero rows match the kernel's own pad.
        bc = 1024
        cp = -(-n_catalog // bc) * bc
        items_p = (jnp.pad(items, ((0, cp - n_catalog), (0, 0)))
                   if cp != n_catalog else items)

        def eval_batch(u_idxs):
            from sibrar_tpu.ops.sparse import csr_row_gather

            u_repr = user_repr_fn(u_idxs)
            cols, mask = csr_row_gather(data.exclude_csr, u_idxs)
            tb = min(256, -(-u_idxs.shape[0] // 8) * 8)
            _, topk_idx, ok = peel_masked_topk_dot(
                u_repr, items_p, cols, mask, k_max, tb=tb, bc=bc,
                interpret=interpret, c_real=n_catalog,
                with_fallback=False)  # not-ok batches redone by the driver
            metrics, cov = self._metrics_from_topk(topk_idx, u_idxs)
            return metrics, cov, ok

        return eval_batch

    def _make_sharded_dot_eval_batch(self, user_repr_fn, items,
                                     interpret: bool = False):
        """Multi-chip dot fast path: every item shard runs the fused
        GEMM→{scores, wmax}→peel chain on its catalog slice
        (`parallel.mesh.sharded_masked_topk_dot`) — the single-chip peel
        pipeline's biggest win applied per shard, with the unsharded [B, C]
        score matrix never materializing anywhere. Returns None when the
        per-shard slice fails the peel margins; callers then fall back to
        the generic scores path (whose sharded selection is exact but pays
        the materialized-scores passes)."""
        from sibrar_tpu.parallel.mesh import (
            sharded_dot_viable,
            sharded_masked_topk_dot,
        )

        data = self.data
        n_catalog = self.dataset.n_items_in_split
        if items.shape[0] != n_catalog:
            return None
        e = data.exclude_csr.max_row_len
        if not sharded_dot_viable(n_catalog, self.k_max, e, self.mesh,
                                  interpret=interpret):
            return None
        k_max, mesh = self.k_max, self.mesh

        def eval_batch(u_idxs):
            from sibrar_tpu.ops.sparse import csr_row_gather

            u_repr = user_repr_fn(u_idxs)
            cols, mask = csr_row_gather(data.exclude_csr, u_idxs)
            _, topk_idx, ok = sharded_masked_topk_dot(
                u_repr, items, cols, mask, k_max, mesh, interpret=interpret)
            metrics, cov = self._metrics_from_topk(topk_idx, u_idxs)
            return metrics, cov, ok

        return eval_batch

    # ------------------------------------------------------------------ accumulate
    def eval_batch(self, u_idxs: jax.Array, scores: jax.Array,
                   valid: Optional[np.ndarray] = None):
        """Accumulate one user batch. `scores` is [B, n_catalog]; `valid` masks
        padded rows (they are excluded from every statistic).

        Results stay ON DEVICE until `get_results` — a single bulk transfer at
        the end replaces per-batch per-metric host syncs (each device→host
        round trip costs real latency, painfully so through remote tunnels)."""
        metrics, cov, ok = self._eval_batch(scores, u_idxs)
        if self._peel_possible and not bool(jnp.all(ok)):
            # rare peel-exactness redo (forces one device sync, but this
            # eager path is itself the rare fallback driver; when peel can't
            # be chosen `ok` is constant-True and the sync is skipped)
            metrics, cov, _ = self._jit_scatter_eval_batch()(scores, u_idxs)
        self._accumulate(u_idxs, valid, metrics, cov)

    def eval_batch_from_topk(self, u_idxs: jax.Array, topk_idx: jax.Array,
                             valid: Optional[np.ndarray] = None):
        """Accumulate one batch from ALREADY-SELECTED exclusion-masked top-k
        indices (``topk_idx [B, >=k_max]``). Drivers that compute the masked
        top-k anyway for export (run_gather) feed it here instead of paying
        the dominant [B, C] exclusion + selection chain a second time inside
        `eval_batch`."""
        if topk_idx.shape[1] < self.k_max:
            raise ValueError(
                f"topk_idx provides k={topk_idx.shape[1]} < k_max={self.k_max}")
        if not hasattr(self, "_jit_metrics_from_topk"):
            self._jit_metrics_from_topk = jax.jit(self._metrics_from_topk)
        metrics, cov = self._jit_metrics_from_topk(
            topk_idx[:, :self.k_max], u_idxs)
        self._accumulate(u_idxs, valid, metrics, cov)

    def _accumulate(self, u_idxs, valid, metrics, cov):
        self._per_user_users.append(u_idxs)
        self._valid.append(np.ones(int(u_idxs.shape[0]), bool)
                           if valid is None else np.asarray(valid))
        for k, v in metrics.items():
            self._per_user.setdefault(k, []).append(v)
        for k, flags in cov.items():
            # NOTE: padded rows can inflate coverage only with duplicate users'
            # own top-k, which are already counted — acceptable; padded rows use
            # a real user id from the split.
            if k in self._cov_flags:
                self._cov_flags[k] = self._cov_flags[k] | flags
            else:
                self._cov_flags[k] = flags

    # -------------------------------------------------------------------- results
    def _key(self, base: str) -> str:
        return f"{self.name}/{base}" if self.name else base

    def get_results(self, return_raw_results: bool = False):
        # ONE bulk device→host transfer for everything accumulated — per-array
        # fetches each pay a full round trip (~25-100 ms through remote
        # tunnels), so metrics, coverage flags and user ids travel together
        valid = np.concatenate(self._valid) if self._valid else np.zeros(0, bool)
        fetched, cov_fetched, users_dev = jax.device_get((
            {k: jnp.concatenate(v) for k, v in self._per_user.items()
             if k.split("@")[0] in self._user_metrics},
            {k: flags for k, flags in self._cov_flags.items()
             if k.split("@")[0] in self._dist_metrics},
            (jnp.concatenate(self._per_user_users)
             if self._group_features and self._per_user_users else ()),
        ))
        raw = {self._key(k): np.asarray(v)[valid] for k, v in fetched.items()}
        out = {k: float(v.mean()) for k, v in raw.items()}
        if self.config.compute_std:
            out.update({f"{k}_std": float(v.std()) for k, v in raw.items()})

        for k, flags in cov_fetched.items():
            out[self._key(k)] = float(np.asarray(flags).mean())

        if self._group_features:
            users = np.asarray(users_dev)[valid]
            for fname, feat in self._group_features.items():
                codes = np.asarray(feat.table)[users]
                inv = {v: k for k, v in feat.value_map.items()}
                for code in np.unique(codes):
                    sel = codes == code
                    label = str(inv[int(code)]).lower()
                    for mk, vals in fetched.items():
                        v = np.asarray(vals)[valid][sel]
                        out[self._key(f"{fname}/{label}/{mk}")] = float(v.mean())
                        if self.config.compute_std:
                            out[self._key(f"{fname}/{label}/{mk}_std")] = float(v.std())

        out = {k: out[k] for k in sorted(out, key=natsort_key)}
        self.reset()
        if return_raw_results:
            return out, raw
        return out


def evaluate_model(
    score_fn: Callable[[jax.Array], jax.Array],
    evaluator: FullEvaluator,
    batch_size: int = 256,
    fused: bool = True,
) -> dict:
    """Drive a full evaluation: `score_fn(u_idxs[B]) -> scores[B, n_catalog]`.

    For SGD models the caller builds `score_fn` so that item representations are
    computed once and closed over (reference eval/eval.py:207-217); for matrix
    models it is a row gather of the precomputed prediction matrix.

    With `fused=True` (default) the whole evaluation — scoring, exclusion,
    top-k, metric derivation for every user batch — runs as ONE device program
    (`lax.map` over batches): per-batch Python dispatch and its latency vanish,
    replacing the reference's per-batch eager loop entirely. Falls back to the
    batched Python loop if the score_fn doesn't trace.
    """
    # opt-in low-precision scoring (EvalConfig.score_dtype): cast the dot
    # parts ONCE so every consumer below — the fused dot path, the generic
    # scores path, the scatter redo, and the eager fallback loop — ranks the
    # SAME bf16-input scores (mirrors serve.Recommender's dtype mode).
    dot_parts = getattr(score_fn, "dot_parts", None)
    sd = getattr(evaluator.config, "score_dtype", None)
    if sd not in (None, "float32"):
        if sd != "bfloat16":
            # fail loud even when EvalConfig.validate() was never called
            # (programmatic use bypasses the CLI config loader)
            raise ValueError(
                f"unsupported score_dtype {sd!r} (use 'float32' or 'bfloat16')")
        if dot_parts is None:
            import logging

            logging.getLogger(__name__).warning(
                "eval.score_dtype=%s requested but the score_fn exposes no "
                "dot_parts; evaluation stays in the score_fn's own "
                "precision", sd)
        else:
            dt = jnp.dtype(sd)
            _urf, _items = dot_parts
            dot_parts = ((lambda u, _f=_urf: _f(u).astype(dt)),
                         jnp.asarray(_items, dt))

            def score_fn(u_idxs, _p=dot_parts):  # noqa: F811 — cast rebind
                return jnp.dot(_p[0](u_idxs), _p[1].T,
                               preferred_element_type=jnp.float32)

    users = np.asarray(evaluator.data.users_in_split)
    n = len(users)
    bs = min(batch_size, max(n, 1))
    pad = (-n) % bs
    users_padded = np.concatenate([users, np.repeat(users[-1:], pad)]) if pad \
        else users
    valid = np.ones(n + pad, dtype=bool)
    if pad:
        valid[n:] = False
    n_batches = len(users_padded) // bs

    if fused:
        try:
            u_dev = jnp.asarray(users_padded, dtype=jnp.int32).reshape(n_batches, bs)

            # dot-product fast path: trainers attach (user_repr_fn, items)
            # to score_fn when the model combine is a plain dot, letting the
            # whole batch run through the fused matmul→top-k kernel
            # (dot_parts resolved — and optionally cast — above)
            dot_batch = (evaluator.make_dot_eval_batch(*dot_parts)
                         if dot_parts is not None else None)

            def run_map(batch_fn):
                def one_batch(u):
                    return batch_fn(u)

                return jax.lax.map(one_batch, u_dev)

            def fast_batch(u):
                if dot_batch is not None:
                    return dot_batch(u)
                return evaluator._eval_batch_raw(score_fn(u), u)

            metrics, covs, oks = run_map(fast_batch)
            # oks is [n_batches, B] (per-row peel exactness flags); ONE host
            # sync of the reduced per-batch flags, then redo only affected
            # batches with the fallback-free scatter variant (the in-graph
            # lax.cond fallback is useless inside lax.map — XLA predicates
            # loop-body conditionals, executing both branches every batch)
            bad = np.flatnonzero(~np.asarray(jnp.all(oks, axis=-1)))
            if bad.size:
                import logging

                logging.getLogger(__name__).info(
                    "peel top-k exactness check tripped in %d/%d batches; "
                    "re-running those batches with the scatter top-k",
                    int(bad.size), n_batches)
                # reuse the evaluator's cached jitted scatter program — a
                # fresh jax.jit object here would retrace (and recompile)
                # on every validation that trips a redo
                scatter_batch = evaluator._jit_scatter_eval_batch()
                for bi in bad:
                    m_b, c_b, _ = scatter_batch(score_fn(u_dev[bi]),
                                                u_dev[bi])
                    metrics = {k: v.at[bi].set(m_b[k])
                               for k, v in metrics.items()}
                    covs = {k: v.at[bi].set(c_b[k])
                            for k, v in covs.items()}
            # flatten batch structure; OR-reduce coverage across batches
            metrics = {k: v.reshape(-1) for k, v in metrics.items()}
            for k, flags in covs.items():
                evaluator._cov_flags[k] = flags.any(axis=0)
            evaluator._per_user = {k: [v] for k, v in metrics.items()}
            evaluator._per_user_users = [jnp.asarray(users_padded, jnp.int32)]
            evaluator._valid = [valid]
            return evaluator.get_results()
        except (jax.errors.JAXTypeError, jax.errors.UnexpectedTracerError) as e:
            # only trace-time failures (a score_fn that isn't jittable) may
            # degrade to the eager loop; genuine bugs in the score path (bad
            # shapes, NaN guards, OOM) must propagate
            import logging

            logging.getLogger(__name__).warning(
                "fused eval path failed to trace (%s: %s); falling back to "
                "the eager per-batch loop", type(e).__name__, e)
            evaluator.reset()

    for start in range(0, len(users_padded), bs):
        batch = users_padded[start:start + bs]
        u = jnp.asarray(batch, dtype=jnp.int32)
        scores = score_fn(u)
        evaluator.eval_batch(u, scores, valid=valid[start:start + bs])
    return evaluator.get_results()
