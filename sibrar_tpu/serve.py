"""Low-latency top-k recommendation serving over a fitted run.

The reference framework has no serving path — inference happens only inside
evaluation (`/root/reference/eval/eval.py:207-222` scores batches to compute
metrics and discards the rankings). This module packages the same exact
selection pipeline for production use:

- item representations are computed once at load (the model's
  ``dot_parts``/``score_fn`` exactly as evaluation uses them);
- the serve step is ONE jitted program at a fixed batch size, so repeated
  calls never retrace (requests are padded to the batch size);
- already-interacted items are excluded on device through the same CSR the
  evaluator uses (train for a val-split recommender, train+val for test);
- selection is the exact `masked_topk` chain (peel kernels on TPU, windowed
  scatter elsewhere), and catalog positions are mapped back to global item
  ids before returning.
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sibrar_tpu.data.dataset import DeviceData, RecDataset


def quantize_rows_int8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization: ``q = round(x / s)`` with
    ``s = max|row| / 127`` (floored at a tiny epsilon so all-zero rows stay
    zero instead of dividing by 0). Returns ``(q int8 [R, D], s f32 [R])``;
    dequantization is ``q.astype(f32) * s[:, None]``."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s[:, None]),
                 -127, 127).astype(jnp.int8)
    return q, s


def _int8_scores(u_repr: jax.Array, q_items: jax.Array,
                 s_items: jax.Array) -> jax.Array:
    """int8×int8 → int32 score GEMM with per-row scales on both sides.

    The contraction runs natively on the MXU's int8 path (2× bf16
    throughput on v5e) and the dequant is two rank-1 scale products fused
    into the epilogue. Exact given the quantized inputs: int32 accumulation
    over D ≤ 2^15 int8 products cannot overflow (|acc| ≤ D·127²)."""
    q_u, s_u = quantize_rows_int8(u_repr)
    acc = jax.lax.dot_general(q_u, q_items, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * s_u[:, None] * s_items[None, :]


class Recommender:
    """Serve exact top-k recommendations for user ids of a fitted model.

    Parameters
    ----------
    score_fn:
        ``score_fn(u_idxs [B]) -> scores [B, n_catalog]`` over the split's
        catalog — the same callable evaluation uses (`Trainer.make_score_fn`
        or a matrix algorithm's ``score_fn``). A ``dot_parts`` attribute
        (user_repr_fn, items), when present, routes serving through the
        fused dot kernels.
    dataset:
        The split `RecDataset` the score_fn was built against (supplies the
        catalog mapping and exclusion lists).
    k:
        Maximum list length served; ``recommend`` can ask for any ``k`` up
        to this.
    batch_size:
        Fixed device batch; requests are padded up to a multiple of it.
    exclude_seen:
        When True (default), each user's already-interacted items (the
        split's exclusion lists: train, plus val for a test split) are
        removed from their ranking, exactly as in evaluation.
    dtype:
        Optional low-precision serving mode for dot-product models:

        - ``"bfloat16"`` casts the GEMM inputs (user representations and
          the item table) once at build, turning the score matmul from
          three bf16 MXU passes (XLA's f32 spelling) into one, with f32
          accumulation. Scores are bf16-input approximations (~3e-3
          relative), the standard serving trade.
        - ``"int8"`` post-training-quantizes BOTH GEMM sides with per-row
          symmetric scales (``q = round(x / s)``, ``s = max|row|/127``):
          the item table once at build, the user representations per step.
          The score matmul runs int8×int8 → int32 on the MXU (2× bf16
          throughput on v5e) and dequantizes with the two rank-1 scale
          vectors. Item-table HBM residency/read drops 4× vs f32 — the
          dominant cost of LOW-BATCH serving, where the step is
          table-read-bound rather than scores-write-bound. Score error is
          ~1% relative (two 7-bit mantissa sides).

        Selection stays EXACT for the scores it is given in both modes, and
        exclusion semantics are exact. Ignored (with a warning) when the
        model exposes no ``dot_parts``. Default None = full f32,
        bit-identical to evaluation.
    selection:
        ``"exact"`` (default) runs the evaluator's exact masked top-k
        chain. ``"approx"`` swaps the ranking step for
        ``jax.lax.approx_max_k`` at ``recall_target`` — TPU's native
        PartialReduce selection — after applying the exclusions exactly
        (excluded items can never surface; only the top-k *ranking* is
        approximate). The latency knob for serving fleets where per-item
        recall@k is an SLO, not a proof obligation. Single-device path
        only: with a multi-chip mesh the per-shard exact chain already
        amortizes selection over shards, so ``"approx"`` logs a warning
        and serves exact.
    """

    def __init__(self, score_fn: Callable, dataset: RecDataset,
                 device_data: Optional[DeviceData] = None, *,
                 k: int = 100, batch_size: int = 256,
                 exclude_seen: bool = True, mesh=None,
                 dot_interpret: bool = False,
                 dtype: Optional[str] = None,
                 selection: str = "exact",
                 recall_target: float = 0.95):
        self.dataset = dataset
        self.data = device_data if device_data is not None else dataset.to_device()
        self.k = min(k, dataset.n_items_in_split)
        self.batch_size = batch_size
        self.exclude_seen = exclude_seen
        self.score_fn = score_fn
        self.mesh = mesh
        self.dtype = jnp.dtype(dtype) if dtype is not None else None
        if selection not in ("exact", "approx"):
            raise ValueError(f"unknown selection mode {selection!r} "
                             "(expected 'exact' or 'approx')")
        if not (0.0 < recall_target <= 1.0):
            raise ValueError(f"recall_target must be in (0, 1], got {recall_target}")
        self.selection = selection
        self.recall_target = recall_target
        # test hook: run the Pallas kernels in interpret mode (CI covers the
        # mesh dot path on the virtual CPU mesh)
        self.dot_interpret = dot_interpret
        self._catalog_items = np.asarray(dataset.items_in_split)
        self._step = self._build_step()

    # ------------------------------------------------------------------ build
    def _build_step(self):
        from sibrar_tpu.ops.sparse import DeviceCSR
        from sibrar_tpu.ops.topk import masked_topk

        data, k = self.data, self.k
        if self.exclude_seen:
            csr = data.exclude_csr
        else:  # empty exclusion CSR: masked_topk degenerates to plain top-k
            csr = DeviceCSR(
                indptr=jnp.zeros(self.dataset.n_users + 1, jnp.int32),
                indices=jnp.zeros((0,), jnp.int32),
                n_rows=self.dataset.n_users,
                n_cols=self.dataset.n_items_in_split, max_row_len=0)
        score_fn = self.score_fn
        dot_parts = getattr(score_fn, "dot_parts", None)

        # Every scores-path program below consumes
        # ``score_call(u_idxs, *score_args)`` with ``score_args`` threaded as
        # jit ARGUMENTS: closed-over device arrays bake into the HLO as
        # literal constants (dev-notes r3: a 514 MB item-table closure blew
        # the remote-compile tunnel's request limit) — that applies to the
        # mesh scatter chain and the eager redo exactly as much as to the
        # single-device step. The user table inside the caller's score_fn is
        # the caller's closure; keep user-side tables small or jit them as
        # arguments upstream.
        score_call, score_args = None, ()
        if self.dtype is not None:
            if dot_parts is None:
                import logging

                logging.getLogger(__name__).warning(
                    "dtype=%s requested but the score_fn exposes no "
                    "dot_parts; serving stays in the score_fn's own "
                    "precision", self.dtype)
            elif self.dtype == jnp.int8:
                # post-training quantization: the item table once at build,
                # the user side per step. The quantized table rides the
                # SCORES path (the fused f32/bf16 dot kernels don't apply).
                _urf, _items = dot_parts
                _q, _s = quantize_rows_int8(jnp.asarray(_items))
                dot_parts = None
                score_args = (_q, _s)

                def score_call(u_idxs, q_arg, s_arg, _f=_urf):
                    return _int8_scores(_f(u_idxs), q_arg, s_arg)
            else:
                # low-precision GEMM inputs, cast ONCE at build (the item
                # table) / per step on the tiny [B, d] side. Every branch
                # below — fused kernels, the sharded chain, and the scatter
                # redo's score_call — consumes the same cast parts, so a redo
                # ranks the same bf16-input scores the fast path ranked.
                dtype = self.dtype
                _urf, _items = dot_parts
                _items = jnp.asarray(_items, dtype)
                dot_parts = ((lambda u, _f=_urf: _f(u).astype(dtype)), _items)
                score_args = (_items,)

                def score_call(u_idxs, items_arg, _f=_urf, _dt=dtype):
                    # dot_general contracting on items' dim 1 (NOT
                    # `items_arg.T` — with the table as a jit argument XLA
                    # fuses the transpose into the dot and the f32
                    # accumulation order drifts an ulp off the eager/
                    # constant-folded oracle; contracting dims keep bit
                    # parity with `jnp.dot(u, items.T)`)
                    return jax.lax.dot_general(
                        _f(u_idxs).astype(_dt), items_arg,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
        if score_call is None:

            def score_call(u_idxs, _f=score_fn):
                return _f(u_idxs)

        if self.mesh is not None and self.mesh.shape.get("item", 1) > 1:
            if self.selection == "approx":
                import logging

                logging.getLogger(__name__).warning(
                    "selection='approx' is a single-device knob; the mesh "
                    "path amortizes exact per-shard selection over the item "
                    "axis already — serving exact")
            # multi-chip serving: catalog sharded over the item axis with the
            # evaluator's per-shard selection + tiny [B, k] candidate merge.
            # Dot models ride the per-shard fused GEMM→peel chain
            # (`sharded_masked_topk_dot`) with an eager scatter redo when a
            # peel exactness flag trips (serving is eager, so the one host
            # sync per batch is the cheap place to branch); everything else
            # takes the fallback-free per-shard scatter chain.
            from sibrar_tpu.ops.sparse import csr_row_gather
            from sibrar_tpu.parallel.mesh import (
                sharded_dot_viable,
                sharded_masked_topk,
                sharded_masked_topk_dot,
            )

            mesh = self.mesh
            n_catalog = self.dataset.n_items_in_split
            n_shards = mesh.shape["item"]
            pad = (-n_catalog) % n_shards
            e = csr.max_row_len

            def _excl(u_idxs):
                if csr.max_row_len:
                    return csr_row_gather(csr, u_idxs)
                # no exclusions: a single always-masked column
                return (jnp.zeros((u_idxs.shape[0], 1), jnp.int32),
                        jnp.zeros((u_idxs.shape[0], 1), bool))

            def scatter_step(u_idxs, *sargs):
                scores = score_call(u_idxs, *sargs)
                cols, mask = _excl(u_idxs)
                if pad:
                    scores = jnp.pad(scores, ((0, 0), (0, pad)),
                                     constant_values=-1e30)
                v, i = sharded_masked_topk(scores, cols, mask, k, mesh,
                                           use_peel=False)
                # a user with fewer than k unseen items can tie into the
                # -1e30 pad columns; clamp so the host-side catalog-id
                # gather in `recommend` stays in range
                return v, jnp.minimum(i, n_catalog - 1)

            jit_scatter = jax.jit(scatter_step)

            interp = self.dot_interpret
            if dot_parts is not None and sharded_dot_viable(
                    n_catalog, k, max(e, 1), mesh, interpret=interp):
                user_repr_fn, items = dot_parts
                self._redo_step = lambda u: jit_scatter(u, *score_args)

                def step(u_idxs, items_arg):
                    u_repr = user_repr_fn(u_idxs)
                    cols, mask = _excl(u_idxs)
                    v, i, ok = sharded_masked_topk_dot(
                        u_repr, items_arg, cols, mask, k, mesh,
                        interpret=interp)
                    return v, i, ok

                # the item table rides as a jit ARGUMENT: closed-over device
                # arrays bake into the HLO as literal constants (a 514 MB
                # table blew the remote-compile tunnel's request limit at
                # C=500k — dev-notes r3 finding)
                jit_step = jax.jit(step)
                return lambda u_idxs: jit_step(u_idxs, items)

            return lambda u_idxs: jit_scatter(u_idxs, *score_args)

        use_dot = False
        if (dot_parts is not None and jax.default_backend() == "tpu"
                and self.selection == "exact"):
            from sibrar_tpu.ops.pallas_peel import peel_viable

            c = self.dataset.n_items_in_split
            use_dot = peel_viable(c, k, csr.max_row_len) or peel_viable(
                c, k, csr.max_row_len, fused=True)

        if use_dot:
            from sibrar_tpu.ops.pallas_peel import (
                peel_masked_topk,
                peel_masked_topk_dot,
                peel_viable,
            )
            from sibrar_tpu.ops.sparse import csr_row_gather

            user_repr_fn, items = dot_parts
            # same preference as the evaluator's unified dot fast path
            # (make_dot_eval_batch, commit "Unify the dot fast path"):
            # the GEMM-epilogue + chunked sorted-run chain beat the windowed
            # fused kernel 4.81 vs 5.58 ms at its own home scale — the
            # windowed kernel remains only for geometries where solely the
            # fused margins are viable (its row set is VMEM-resident, so it
            # escapes the scores-path gather-block gate)
            c = self.dataset.n_items_in_split
            dot_ok = peel_viable(c, k, csr.max_row_len)
            if dot_ok:
                # pre-pad the catalog ONCE to the kernel's chunk multiple
                # (the per-call jnp.pad of a big table costs 0.137 ms/step
                # at C=100k — evaluator finding, make_dot_eval_batch)
                bc = 1024
                cp = -(-c // bc) * bc
                if cp != c:
                    items = jnp.pad(items, ((0, cp - c), (0, 0)))

            def step(u_idxs, items_arg, csr_arg):
                u_repr = user_repr_fn(u_idxs)
                cols, mask = csr_row_gather(csr_arg, u_idxs)
                # with_fallback=True: serving calls are not inside lax loops,
                # so the in-graph dense redo only runs when actually needed
                if dot_ok:
                    return peel_masked_topk_dot(u_repr, items_arg, cols,
                                                mask, k, bc=bc, c_real=c)
                return peel_masked_topk(u_repr, items_arg, cols, mask, k)

            # item table and exclusion CSR ride as jit ARGUMENTS: closed-over
            # device arrays bake into the HLO as literal constants (a 514 MB
            # item table blew the remote-compile tunnel's request limit at
            # C=500k — dev-notes r3 finding). The user table inside
            # user_repr_fn is the caller's closure; keep user-side tables
            # small or jit them as arguments upstream.
            jit_step = jax.jit(step)
            return lambda u_idxs: jit_step(u_idxs, items, csr)

        approx = self.selection == "approx"
        recall_target = self.recall_target

        def _rank(scores, u_idxs, csr_arg):
            if not approx:
                return masked_topk(scores, csr_arg, u_idxs, k, method="auto")
            # approximate mode: exclusions applied EXACTLY (scatter fill),
            # only the ranking step is approx_max_k's PartialReduce
            from sibrar_tpu.ops.sparse import csr_row_gather, scatter_fill_rows

            if csr.max_row_len:
                cols, mask = csr_row_gather(csr_arg, u_idxs)
                scores = scatter_fill_rows(scores, cols, mask,
                                           n_cols=scores.shape[1], fill=-1e30)
            return jax.lax.approx_max_k(scores, k,
                                        recall_target=recall_target)

        def step(u_idxs, csr_arg, *sargs):
            scores = score_call(u_idxs, *sargs)
            return _rank(scores, u_idxs, csr_arg)

        jit_step = jax.jit(step)
        return lambda u_idxs: jit_step(u_idxs, csr, *score_args)

    # ------------------------------------------------------------------ serve
    def recommend(self, user_ids, k: Optional[int] = None,
                  return_scores: bool = False):
        """Exact top-k item ids (global ids) for ``user_ids``.

        Returns ``ids [N, k] int64`` (or ``(ids, scores)`` with
        ``return_scores=True``). ``k`` defaults to the recommender's
        configured maximum.
        """
        k = self.k if k is None else min(k, self.k)
        users = np.asarray(user_ids, dtype=np.int32).reshape(-1)
        n = len(users)
        if n == 0:
            ids = np.zeros((0, k), dtype=self._catalog_items.dtype)
            return (ids, np.zeros((0, k), np.float32)) if return_scores else ids
        bs = self.batch_size
        pad = (-n) % bs
        if pad:
            users = np.concatenate([users, np.repeat(users[-1:], pad)])
        vals, idxs = [], []
        for start in range(0, len(users), bs):
            batch = jnp.asarray(users[start:start + bs])
            out = self._step(batch)
            if len(out) == 3:  # mesh dot path: peel exactness flags
                v, i, ok = out
                if not bool(jnp.all(ok)):
                    # rare: redo this batch with the fallback-free per-shard
                    # scatter chain (serving is eager, so branching here
                    # costs one host sync only on the batch that tripped)
                    v, i = self._redo_step(batch)
            else:
                v, i = out
            vals.append(v)
            idxs.append(i)
        v = np.asarray(jnp.concatenate(vals))[:n, :k]
        i = np.asarray(jnp.concatenate(idxs))[:n, :k]
        ids = self._catalog_items[i]  # catalog position -> global item id
        return (ids, v) if return_scores else ids

    # ------------------------------------------------------------------ load
    @classmethod
    def from_run_dir(cls, run_dir: str, split: str = "test", **kwargs
                     ) -> "Recommender":
        """Rebuild a fitted run from disk and wrap it for serving.

        ``split`` picks the catalog/exclusion context: "test" excludes
        train+val interactions (the usual serving setup), "val" excludes
        train only. The run's ``parallel:`` block applies to serving too
        (auto-enabled mesh on multi-chip TPU backends → catalog-sharded
        selection); pass ``mesh=None`` explicitly to force single-device.
        """
        from sibrar_tpu.config.schema import ExperimentConfig, from_dict
        from sibrar_tpu.experiment import _load_split
        from sibrar_tpu.models.registry import get_algorithm
        from sibrar_tpu.utils.analysis import _read_yaml

        conf = from_dict(ExperimentConfig,
                         _read_yaml(os.path.join(run_dir, "conf.yml")))
        conf.results_path = run_dir
        if "mesh" not in kwargs:
            from sibrar_tpu.parallel.mesh import make_mesh_from_config

            kwargs["mesh"] = make_mesh_from_config(conf.parallel)
        spec = get_algorithm(conf.algorithm)
        train_ds = _load_split(conf, "train")
        serve_ds = _load_split(conf, split)
        if spec.kind == "sgd":
            from sibrar_tpu.eval.evaluator import FullEvaluator
            from sibrar_tpu.train.trainer import Trainer

            device_data = train_ds.to_device()
            model = spec.build(conf.model, train_ds, device_data)
            evaluator = FullEvaluator(conf.eval, serve_ds,
                                      evaluator_name=split)
            trainer = Trainer(model, train_ds, evaluator, conf.learn,
                              conf.dataset, seed=conf.run_settings.seed,
                              device_data=device_data,
                              init_for_training=False)
            trainer.load(run_dir)
            score_fn = trainer.make_score_fn()
            return cls(score_fn, serve_ds, device_data=evaluator.data,
                       k=kwargs.pop("k", max(conf.eval.top_k)), **kwargs)
        alg = spec.build(conf.model, train_ds)
        alg.load(run_dir)
        score_fn = alg.score_fn(serve_ds.items_in_split)
        return cls(score_fn, serve_ds,
                   k=kwargs.pop("k", max(conf.eval.top_k)), **kwargs)
