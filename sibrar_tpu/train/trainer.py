"""Training loop: one jitted, scanned train epoch + Python-side early stopping.

Parity target: the reference `Trainer` (`/root/reference/train/trainer.py:18-256`):
initial validation before training, per-epoch train (forward → rec_loss + model
reg_loss → optimizer step with adam/adagrad/adamw), early stopping on patience,
best-checkpoint saving when the optimizing metric improves, optional train-set
evaluation, `max_batches_per_epoch` cap, and metric logging hooks.

TPU-first design (SURVEY.md §7.1): the reference's eager per-batch loop —
host-side negative sampling, per-batch H2D copies, per-batch optimizer step —
becomes a single `lax.scan` over the epoch's permuted interaction batches inside
one jit: on-device uniform/popular negative sampling, on-device feature gathers,
fused forward/backward/update. Early stopping and checkpointing stay in Python
around the jitted epoch, exactly like the reference's epoch loop structure.
"""
from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Callable, Dict, Optional

import flax.serialization
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from sibrar_tpu.config.schema import DatasetConfig, LearningConfig
from sibrar_tpu.data.dataset import DeviceData, RecDataset
from sibrar_tpu.data.sampling import sample_negatives
from sibrar_tpu.eval.evaluator import FullEvaluator, evaluate_model
from sibrar_tpu.models.base import collect_reg_loss, init_model, init_model_abstract
from sibrar_tpu.parallel.mesh import batch_multiple, shard_batch, shard_catalog
from sibrar_tpu.train.losses import build_rec_loss


@flax.struct.dataclass
class TrainState:
    params: Any
    tables: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    step: jax.Array


def build_optimizer(learn: LearningConfig, mask=None
                    ) -> optax.GradientTransformation:
    """adam/adagrad/adamw with torch-equivalent weight-decay placement:
    for adam/adagrad the decay enters the gradient before the moment updates
    (torch's L2-style `weight_decay`); adamw uses decoupled decay.

    ``learn.moment_dtype = "bfloat16"`` stores the adam first moment in
    bf16 (optax ``mu_dtype``) — an opt-in production knob that trims
    optimizer HBM traffic on large tables; the default keeps the
    reference's all-f32 torch-Adam semantics bit-for-bit.

    ``mask``: optional ``optax.masked`` mask (pytree-of-bools or callable
    on params). Leaves masked False are left to the row-sparse table
    optimizer (`train/row_adam.py`): no dense moment buffers are allocated
    for them and their (structurally zero) grads pass through untouched."""
    mu_dtype = (jnp.bfloat16 if learn.moment_dtype == "bfloat16" else None)
    if learn.optimizer == "adam":
        txs = []
        if learn.wd:
            txs.append(optax.add_decayed_weights(learn.wd))
        txs += [optax.scale_by_adam(mu_dtype=mu_dtype),
                optax.scale(-learn.lr)]
        tx = optax.chain(*txs)
    elif learn.optimizer == "adagrad":
        txs = []
        if learn.wd:
            txs.append(optax.add_decayed_weights(learn.wd))
        txs += [optax.scale_by_rss(initial_accumulator_value=0.0), optax.scale(-learn.lr)]
        tx = optax.chain(*txs)
    elif learn.optimizer == "adamw":
        tx = optax.adamw(learn.lr, weight_decay=learn.wd, mu_dtype=mu_dtype)
    else:
        raise ValueError(f"unsupported optimizer {learn.optimizer!r}")
    return optax.masked(tx, mask) if mask is not None else tx


class Trainer:
    """Fits a RecModel on one split with full-catalog validation."""

    def __init__(
        self,
        model,
        train_data: RecDataset,
        val_evaluator: FullEvaluator,
        learn: LearningConfig,
        dataset_conf: DatasetConfig,
        batch_size: int = 128,
        eval_batch_size: int = 256,
        seed: int = 0,
        results_path: Optional[str] = None,
        log_fn: Optional[Callable[[dict], None]] = None,
        device_data: Optional[DeviceData] = None,
        mesh=None,
        train_evaluator: Optional[FullEvaluator] = None,
        post_val_fn: Optional[Callable[[Any, int], dict]] = None,
        init_for_training: bool = True,
        profile_dir: Optional[str] = None,
        shard_towers: bool = True,
        tower_min_rows: int = 8192,
    ):
        self.model = model
        self.mesh = mesh
        if mesh is not None and batch_size % batch_multiple(mesh):
            raise ValueError(
                f"batch_size {batch_size} must divide over the mesh "
                f"({batch_multiple(mesh)} devices)")
        self.train_dataset = train_data
        self.data = device_data if device_data is not None else train_data.to_device()
        self.val_evaluator = val_evaluator
        self.learn = learn
        self.dataset_conf = dataset_conf
        self.batch_size = batch_size
        self.eval_batch_size = eval_batch_size
        self.seed = seed
        self.results_path = results_path
        self.log_fn = log_fn or (lambda d: None)
        # optional metrics on the train interactions (reference trainer.py:136-137)
        self.train_evaluator = train_evaluator
        # optional model hook after each validation, e.g. ProtoMF prototype
        # diagnostics (reference trainer.py:161-162; see eval/explanations.py)
        self.post_val_fn = post_val_fn

        self.n_neg = dataset_conf.n_negative_samples
        self.rec_loss = build_rec_loss(
            learn.rec_loss,
            n_items=train_data.n_items_in_split,
            n_neg=self.n_neg,
            aggregator=learn.loss_aggregator,
            train_neg_strategy=dataset_conf.negative_sampling_strategy,
        )
        self.profile_dir = profile_dir

        rng = jax.random.PRNGKey(seed)
        if init_for_training:
            variables = init_model(model, rng, self.data, n_neg=self.n_neg)
            self._setup_optimizer(variables["params"])
            opt_state = self.init_opt_state(variables["params"])
        else:
            # load-only path (run_test / run_gather): structure via eval_shape,
            # no init compile, no optimizer state — the checkpoint overwrites
            # params/batch_stats right after construction
            variables = init_model_abstract(model, rng, self.data, n_neg=self.n_neg)
            self._setup_optimizer(variables["params"])
            opt_state = ()
        self.state = TrainState(
            params=variables["params"],
            tables=variables.get("tables", {}),
            batch_stats=variables.get("batch_stats", {}),
            opt_state=opt_state,
            rng=jax.random.fold_in(rng, 7),
            step=jnp.zeros((), jnp.int32),
        )
        self.shard_towers = shard_towers
        self.tower_min_rows = tower_min_rows
        self._apply_tower_sharding()
        self._epoch_fns: dict = {}  # (n_batches, tail) -> jitted epoch piece
        self.best_params = None
        self.best_batch_stats = None
        self.best_value = -np.inf
        self.best_epoch = -1

    def _setup_optimizer(self, params):
        """Build the optimizer, splitting off row-sparse tables when
        ``learn.sparse_tables`` is on: big id-embedding tables the model
        declares in ``table_index_map`` leave the dense optax chain
        (`optax.masked` — no dense moment buffers) and update through
        `train/row_adam.row_adam_update` with per-step touched rows only.
        Works on abstract (eval_shape) params — only shapes are read."""
        self._sparse_spec = {}
        if self.learn.sparse_tables:
            from sibrar_tpu.train.row_adam import find_sparse_tables

            self._sparse_spec = find_sparse_tables(
                self.model, params, self.learn.sparse_table_min_rows)
        mask = None
        if self._sparse_spec:
            names = frozenset(self._sparse_spec)

            def mask(params):  # noqa: F811 — optax.masked callable form
                from flax import traverse_util

                flat = traverse_util.flatten_dict(params)
                return traverse_util.unflatten_dict({
                    p: not (len(p) >= 2 and p[0] in names
                            and p[-1] == "embedding")
                    for p in flat})

        self.optimizer = build_optimizer(self.learn, mask)

    def init_opt_state(self, params):
        """Fresh optimizer state for ``params`` — the masked dense chain's
        state plus zero row-adam moments for each sparse table. Public so
        benches/probes that fill params host-side can rebuild the state."""
        dense = self.optimizer.init(params)
        if not self._sparse_spec:
            return dense
        from sibrar_tpu.train.row_adam import row_adam_init

        return {"dense": dense,
                "rows": {name: row_adam_init(params[name]["embedding"])
                         for name in self._sparse_spec}}

    def _apply_tower_sharding(self):
        """Tensor-parallel placement of interaction-tower first layers over
        the mesh's item axis (`parallel/mesh.shard_tower_state`): the
        [n_items, h]/[n_users, h] kernels and their optimizer moments are
        row-sharded; GSPMD splits the first-layer contraction per shard and
        psums the [B, h] partials over ICI. Re-applied after checkpoint
        restores so the epoch jit keeps one stable input-sharding signature."""
        self._tp_sharded = False
        if self.mesh is None or not self.shard_towers:
            return
        from sibrar_tpu.parallel.mesh import shard_tower_state

        (params, opt_state), n = shard_tower_state(
            (self.state.params, self.state.opt_state), self.mesh,
            min_rows=self.tower_min_rows)
        if n:
            self.state = self.state.replace(params=params, opt_state=opt_state)
            self._tp_sharded = True

    # ----------------------------------------------------------------- train step
    def _model_variables(self, state: TrainState) -> dict:
        v = {"params": state.params}
        if state.tables:
            v["tables"] = state.tables
        if state.batch_stats:
            v["batch_stats"] = state.batch_stats
        return v

    def _loss_fn(self, params, state: TrainState, u, i_global, labels, rngs,
                 rows=None):
        variables = self._model_variables(state)
        variables["params"] = params
        if rows is not None:
            # sparse-table training: inject the pre-gathered embedding rows
            # (differentiated instead of the tables — layers.Embedding
            # returns them, so no dense [n, d] grad ever materializes)
            variables["rows"] = {name: {"rows": r} for name, r in rows.items()}
        mutable = ["losses"] + (["batch_stats"] if state.batch_stats else [])
        logits, aux = self.model.apply(
            variables, u, i_global, train=True, rngs=rngs, mutable=mutable)
        loss = self.rec_loss(logits, labels)
        reg = collect_reg_loss(aux)
        new_batch_stats = aux.get("batch_stats", state.batch_stats)
        return loss + reg, (loss, reg, new_batch_stats)

    def _make_epoch_fn(self, n_batches: int, tail: int = 0):
        data = self.data
        strategy = self.dataset_conf.negative_sampling_strategy
        n_catalog = self.train_dataset.n_items_in_split
        n_neg = self.n_neg
        bs = self.batch_size
        squash = self.dataset_conf.popularity_squashing_factor

        mesh = self.mesh
        # pure-DP batches spread over EVERY mesh axis; with tensor-parallel
        # tower kernels on the item axis the batch stays on the data axis so
        # the first-layer contraction splits over item instead
        flat = not getattr(self, "_tp_sharded", False)

        def train_step(state: TrainState, idxs):
            rng = jax.random.fold_in(state.rng, state.step)
            k_neg, k_sample, k_drop = jax.random.split(rng, 3)
            # data-parallel sharding of the batch over the mesh's data axis
            # (SURVEY.md §2.9 TPU-native mapping); params stay replicated, so
            # the only train-path collective is the gradient all-reduce XLA
            # inserts for the sharded autodiff.
            u = shard_batch(data.train_users[idxs], mesh, flat=flat)  # [bs]
            pos_cat = shard_batch(data.train_items_cat[idxs], mesh, flat=flat)  # [bs]
            negs_cat = sample_negatives(
                k_neg, u, data.pos_csr, data.popularity,
                strategy=strategy, n_catalog=n_catalog, n_neg=n_neg,
                squashing_factor=squash)
            i_cat = jnp.concatenate([pos_cat[:, None], negs_cat], axis=1)
            i_global = shard_batch(data.catalog[i_cat], mesh, flat=flat)  # [bs, 1+n_neg]
            labels = shard_batch(
                jnp.zeros((idxs.shape[0], 1 + n_neg), jnp.float32)
                .at[:, 0].set(1.0), mesh, flat=flat)

            rngs = {"sample": k_sample, "dropout": k_drop}
            if self._sparse_spec:
                # row-sparse tables: gather the touched rows OUTSIDE autodiff
                # and differentiate w.r.t. them (layers.Embedding consumes the
                # injected rows), then row-adam only those rows — the dense
                # [n, d] grad scatter and full-table moment passes of dense
                # adam never happen (train/row_adam.py)
                from sibrar_tpu.train.row_adam import row_adam_update

                idx_map = {"user": u, "item": i_global}
                rows = {name: state.params[name]["embedding"][idx_map[src]]
                        for name, src in self._sparse_spec.items()}
                grad_fn = jax.value_and_grad(
                    self._loss_fn, argnums=(0, 6), has_aux=True)
                (total, (loss, reg, new_bs)), (grads, g_rows) = grad_fn(
                    state.params, state, u, i_global, labels, rngs, rows)
                updates, new_dense = self.optimizer.update(
                    grads, state.opt_state["dense"], state.params)
                # masked leaves pass their (structurally zero) grads through;
                # apply_updates adds zero there — the row updates below write
                # the real new tables
                new_params = optax.apply_updates(state.params, updates)
                t = state.step + 1
                new_rows_state = {}
                for name, src in self._sparse_spec.items():
                    # row-update from the ORIGINAL table, not new_params':
                    # apply_updates' add of the (zero) passthrough grad is
                    # semantically a no-op, and reading through it forced a
                    # full-table materialization per step (0.46 ms each on
                    # [500k, 256]); from state.params the add chain is DCE'd
                    table, ropt = row_adam_update(
                        state.params[name]["embedding"],
                        state.opt_state["rows"][name],
                        idx_map[src], g_rows[name], t,
                        lr=self.learn.lr, wd=self.learn.wd)
                    sub = dict(new_params[name])
                    sub["embedding"] = table
                    new_params = dict(new_params)
                    new_params[name] = sub
                    new_rows_state[name] = ropt
                state = state.replace(
                    params=new_params,
                    opt_state={"dense": new_dense, "rows": new_rows_state},
                    batch_stats=new_bs, step=t)
                return state, jnp.stack([total, loss, reg])

            grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
            (total, (loss, reg, new_bs)), grads = grad_fn(
                state.params, state, u, i_global, labels, rngs)
            updates, new_opt = self.optimizer.update(
                grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            state = state.replace(
                params=new_params, opt_state=new_opt, batch_stats=new_bs,
                step=state.step + 1)
            return state, jnp.stack([total, loss, reg])

        # donate the train state: params/opt buffers update in place on device
        # instead of doubling HBM residency every epoch
        @partial(jax.jit, donate_argnums=(0,))
        def epoch(state: TrainState, perm):
            batches = perm[: n_batches * bs].reshape(n_batches, bs)
            state, losses = jax.lax.scan(train_step, state, batches)
            mean = losses.mean(axis=0)
            if tail:
                # the final partial batch trains too — the reference iterates
                # every interaction each epoch (its DataLoader simply emits a
                # smaller last batch, /root/reference/train/trainer.py:204);
                # this is one extra fixed-shape step inside the same jit, so
                # no masking/weighting enters the loss math (padding instead
                # would leak pad rows into in-model reg losses like SBNet's
                # InfoNCE). It does instantiate train_step at a second shape
                # — a one-time compile cost, amortized by the persistent
                # compilation cache. The epoch mean weights it by its true
                # size.
                state, tail_losses = train_step(
                    state, perm[n_batches * bs: n_batches * bs + tail])
                frac = tail / bs
                mean = (losses.sum(axis=0) + tail_losses * frac) / (
                    n_batches + frac)
            return state, mean

        return epoch

    @staticmethod
    def epoch_batch_plan(n_inter: int, batch_size: int,
                         max_batches: Optional[int]) -> tuple[int, int]:
        """(n_full_batches, tail_size): every interaction lands in exactly one
        batch per epoch unless `max_batches_per_epoch` caps the count (then
        the cap wins and there is no tail, same as the reference's cap at
        trainer.py:225-228)."""
        n_batches = n_inter // batch_size
        tail = n_inter - n_batches * batch_size
        if max_batches and n_batches >= max_batches:
            return max_batches, 0
        return n_batches, tail

    # ------------------------------------------------------------------- epoch api
    def train_epoch(self) -> Dict[str, float]:
        # shape only — np.asarray here would device_get the whole array
        # (tens of MB through a remote tunnel) just to read its length
        n_inter = int(self.data.train_users.shape[0])
        n_batches, tail = self.epoch_batch_plan(
            n_inter, self.batch_size, self.learn.max_batches_per_epoch)
        if n_batches == 0 and tail == 0:
            raise ValueError("not enough interactions for a single batch")
        if n_batches == 0:  # fewer interactions than one batch: tail only
            n_batches, tail = 1, 0
            self.batch_size = min(self.batch_size, n_inter)
        perm_key = jax.random.fold_in(self.state.rng, 1000003 + int(self.state.step))
        perm = jax.random.permutation(perm_key, n_inter)
        bs = self.batch_size
        # Long epochs run as a SEQUENCE of bounded scan programs instead of
        # one epoch-length program: the remote-execution tunnel (and any
        # preemptible runtime) handles many short executions far better than
        # a single multi-thousand-step one — an unchunked 2383-step SBNet
        # epoch reproducibly crashed the axon TPU worker where 5 × ≤512-step
        # calls of the SAME step function run clean (r5 e2e). One extra
        # compile for the remainder-length chunk, both cached; numerics are
        # the same weighted per-step loss mean.
        chunk = self.learn.epoch_scan_chunk
        if not chunk or n_batches <= chunk:
            pieces = [(n_batches, tail)]
        else:
            n_full, rem = divmod(n_batches, chunk)
            pieces = [(chunk, 0)] * n_full
            if rem or tail:
                # rem == 0 with a tail yields a (0, tail) piece: a zero-length
                # scan plus the one partial-batch step, weighted tail/bs
                pieces.append((rem, tail))
        state = self.state
        means, weights, off = [], [], 0
        for k, t in pieces:
            fn = self._epoch_fns.get((k, t))
            if fn is None:
                fn = self._epoch_fns[(k, t)] = self._make_epoch_fn(k, t)
            state, m = fn(state, perm[off: off + k * bs + t])
            means.append(m)
            weights.append(k + t / bs)
            off += k * bs
        self.state = state
        if len(means) == 1:
            total, rec, reg = np.asarray(means[0])
        else:
            w = np.asarray(weights)[:, None]
            total, rec, reg = (np.asarray(jnp.stack(means)) * w).sum(0) / w.sum()
        return {"train/loss": float(total), "train/rec_loss": float(rec),
                "train/reg_loss": float(reg)}

    # ------------------------------------------------------------------ evaluation
    def _eval_fns(self):
        """Jitted eval primitives, compiled once (variables passed as operands
        so parameter updates between epochs never trigger recompilation)."""
        if not hasattr(self, "_jit_item_repr"):
            self._jit_item_repr = jax.jit(
                lambda v, i: self.model.apply(
                    v, i, train=False, method=self.model.item_repr))
            self._jit_score = jax.jit(
                lambda v, u, i_repr: self.model.apply(
                    v,
                    self.model.apply(v, u, train=False, method=self.model.user_repr),
                    i_repr,
                    method=self.model.combine))
        return self._jit_item_repr, self._jit_score

    def make_score_fn(self, params=None, batch_stats=None,
                      item_chunk: int = 8192) -> Callable:
        """Precompute catalog item reprs once, return a user-batch scorer
        (the reference's compute-items-once eval split, eval/eval.py:207-217).

        The catalog encode runs in `item_chunk`-sized pieces (lax.map) so that
        per-item intermediates — e.g. SBNet/DMF's dense ``[chunk, n_users]``
        interaction rows — never materialize for the whole catalog at once
        (at 100k items × 50k users that would be ~20 GB)."""
        variables = {"params": params if params is not None else self.state.params}
        if self.state.tables:
            variables["tables"] = self.state.tables
        bstats = batch_stats if batch_stats is not None else self.state.batch_stats
        if bstats:
            variables["batch_stats"] = bstats

        item_repr_fn, score_fn = self._eval_fns()
        catalog = self.val_evaluator.data.catalog
        c = catalog.shape[0]
        if c > item_chunk:
            pad = (-c) % item_chunk
            cat_p = jnp.pad(catalog, (0, pad), mode="edge") if pad else catalog
            chunks = cat_p.reshape(-1, item_chunk)
            if not hasattr(self, "_jit_item_repr_chunked"):
                # per-item encode work (towers, modality MLPs — "usually the
                # bottleneck", reference eval/eval.py:208) spreads over the
                # mesh: each chunk's item rows shard across devices (all axes
                # in pure DP; data axis only when TP towers hold the item
                # axis, so the tower contraction splits over item instead)
                flat = not getattr(self, "_tp_sharded", False)
                self._jit_item_repr_chunked = jax.jit(
                    lambda v, ch: jax.lax.map(
                        lambda ck: self.model.apply(
                            v, shard_batch(ck, self.mesh, flat=flat),
                            train=False, method=self.model.item_repr),
                        ch))
            stacked = self._jit_item_repr_chunked(variables, chunks)
            i_repr = jax.tree_util.tree_map(
                lambda x: x.reshape(-1, *x.shape[2:])[:c], stacked)
        else:
            i_repr = item_repr_fn(variables, catalog)
        # catalog-dim sharding for full-catalog scoring (SURVEY.md §5.7): the
        # [C, d] item table and the [B, C] score matrix partition on the item axis
        i_repr = jax.tree_util.tree_map(
            lambda x: shard_catalog(x, self.mesh), i_repr)
        fn = lambda u_idxs: score_fn(variables, u_idxs, i_repr)  # noqa: E731

        # models whose combine ranks like a dot product expose their parts so
        # the evaluator can run the fused matmul→top-k path
        # (evaluator.make_dot_eval_batch) instead of materializing [B, C] —
        # under an item-sharded mesh that becomes the per-shard fused chain
        # (evaluator._make_sharded_dot_eval_batch)
        if hasattr(self.model, "eval_rank_dot_parts"):
            u_raw_fn = lambda u: self.model.apply(  # noqa: E731
                variables, u, train=False, method=self.model.user_repr)
            parts = self.model.eval_rank_dot_parts(u_raw_fn, i_repr)
            if parts is not None:
                u_fn, items = parts
                if isinstance(items, jax.Array) and items.ndim == 2:
                    try:  # models with host-side eval tables don't trace
                        u_shape = jax.eval_shape(u_fn,
                                                 jnp.zeros((2,), jnp.int32))
                    except Exception:
                        u_shape = None
                    if (isinstance(u_shape, jax.ShapeDtypeStruct)
                            and len(u_shape.shape) == 2
                            and u_shape.shape[1] == items.shape[1]):
                        fn.dot_parts = (u_fn, items)
        return fn

    def validate(self) -> dict:
        score_fn = self.make_score_fn()
        return evaluate_model(score_fn, self.val_evaluator, self.eval_batch_size)

    def evaluate_on_train(self) -> dict:
        """Metrics over the training interactions (reference `train_eval`)."""
        assert self.train_evaluator is not None
        score_fn = self.make_score_fn()
        return evaluate_model(score_fn, self.train_evaluator, self.eval_batch_size)

    # ---------------------------------------------------------------------- fit
    def fit(self) -> dict:
        """Run the full training loop; returns the best validation metrics."""
        metric_name = self.learn.optimizing_metric
        key = (f"{self.val_evaluator.name}/{metric_name}"
               if self.val_evaluator.name else metric_name)

        # initial validation before training (reference trainer.py:103-119)
        metrics = self.validate()
        if key not in metrics:
            # silent failure mode otherwise: best_value stays -inf, the best
            # model is never updated OR SAVED, and fit returns the untrained
            # initial metrics (e.g. optimizing_metric ndcg@10 with top_k [5])
            raise ValueError(
                f"optimizing metric {key!r} is not produced by the validation "
                f"evaluator (available: {sorted(metrics)}); check "
                f"learn.optimizing_metric against eval.top_k/eval.metrics")
        self.log_fn({"epoch": -1, **metrics})
        self._maybe_update_best(metrics.get(key, -np.inf), -1)
        best_metrics = metrics

        patience = 0
        for epoch in range(self.learn.n_epochs):
            epoch_t0 = time.perf_counter()
            if epoch == 0 and self.profile_dir:
                # profile the FIRST real epoch instead of running an extra one
                # before fit() — profiled runs keep the same epoch count and
                # RNG/step sequence as unprofiled runs of the same config
                with jax.profiler.trace(self.profile_dir):
                    train_metrics = self.train_epoch()
            else:
                train_metrics = self.train_epoch()
            train_wall = time.perf_counter() - epoch_t0
            metrics = self.validate()
            if self.train_evaluator is not None:
                train_metrics.update(self.evaluate_on_train())
            if self.post_val_fn is not None:
                metrics.update(self.post_val_fn(self.state.params, epoch) or {})
            self.log_fn({"epoch": epoch, **train_metrics, **metrics,
                         "train/epoch_wall_s": round(train_wall, 2),
                         "val/wall_s": round(
                             time.perf_counter() - epoch_t0 - train_wall, 2)})
            value = metrics.get(key, -np.inf)
            if value > self.best_value:
                self._maybe_update_best(value, epoch)
                best_metrics = metrics
                patience = 0
            else:
                patience += 1
                if patience >= self.learn.max_patience:
                    break
        # restore best for downstream use
        if self.best_params is not None:
            self.state = self.state.replace(
                params=self.best_params, batch_stats=self.best_batch_stats)
        return best_metrics

    def _maybe_update_best(self, value: float, epoch: int):
        if value > self.best_value:
            self.best_value = value
            self.best_epoch = epoch
            # deep copy: the epoch fn donates the train state, so aliasing
            # state.params here would leave best_params pointing at buffers
            # that the next epoch reuses
            self.best_params = jax.tree_util.tree_map(jnp.copy, self.state.params)
            self.best_batch_stats = jax.tree_util.tree_map(
                jnp.copy, self.state.batch_stats)
            if self.results_path:
                self.save(self.results_path)

    # ----------------------------------------------------------- full-state resume
    def save_checkpoint(self, path: str):
        """Full training-state checkpoint (params + optimizer state + RNG +
        step + best-tracking) enabling mid-training resume — a capability the
        reference lacks entirely (SURVEY.md §5.4: best-params only, no
        optimizer state, no resume). Uses orbax when available, else flax
        msgpack."""
        os.makedirs(path, exist_ok=True)
        state = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "rng": self.state.rng,
            "step": self.state.step,
            "best": {
                "params": self.best_params if self.best_params is not None
                else self.state.params,
                "batch_stats": self.best_batch_stats
                if self.best_batch_stats is not None else self.state.batch_stats,
                "value": jnp.asarray(self.best_value),
                "epoch": jnp.asarray(self.best_epoch),
            },
        }
        try:
            import orbax.checkpoint as ocp

            ckpt = ocp.PyTreeCheckpointer()
            ckpt.save(os.path.join(os.path.abspath(path), "train_state"),
                      state, force=True)
        except Exception as exc:
            if not isinstance(exc, ImportError):
                # a real save failure (not just orbax being absent) must be
                # visible: the msgpack fallback changes which artifact is
                # newest and load_checkpoint picks by mtime
                import logging

                logging.getLogger(__name__).warning(
                    "orbax checkpoint save failed (%s); writing msgpack "
                    "fallback", exc)
            with open(os.path.join(path, "train_state.msgpack"), "wb") as fh:
                fh.write(flax.serialization.to_bytes(state))

    def load_checkpoint(self, path: str):
        target = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "rng": self.state.rng,
            "step": self.state.step,
            "best": {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "value": jnp.asarray(self.best_value),
                "epoch": jnp.asarray(self.best_epoch),
            },
        }
        orbax_path = os.path.join(os.path.abspath(path), "train_state")
        msgpack_path = os.path.join(path, "train_state.msgpack")
        # when BOTH artifacts exist, restore the newer one: a failed orbax
        # save falls back to msgpack (save_checkpoint), so a stale orbax dir
        # from an earlier epoch must not shadow the up-to-date msgpack
        has_orbax = os.path.exists(orbax_path)
        has_msgpack = os.path.exists(msgpack_path)
        if has_orbax and has_msgpack:
            has_orbax = (os.path.getmtime(orbax_path)
                         >= os.path.getmtime(msgpack_path))
        if has_orbax:
            import orbax.checkpoint as ocp

            restored = ocp.PyTreeCheckpointer().restore(orbax_path, item=target)
        elif has_msgpack:
            with open(msgpack_path, "rb") as fh:
                restored = flax.serialization.from_bytes(target, fh.read())
        else:
            raise FileNotFoundError(f"no train-state checkpoint in {path!r}")
        # from_bytes yields numpy leaves; keep params as device arrays so
        # traced eval paths (fused eval, dot fast path) stay usable
        restored = jax.tree_util.tree_map(jnp.asarray, restored)
        self.state = self.state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            rng=jnp.asarray(restored["rng"]),
            step=jnp.asarray(restored["step"]))
        self.best_params = restored["best"]["params"]
        self.best_batch_stats = restored["best"]["batch_stats"]
        self.best_value = float(restored["best"]["value"])
        self.best_epoch = int(restored["best"]["epoch"])
        self._apply_tower_sharding()

    # ---------------------------------------------------------------- persistence
    def save(self, path: str):
        os.makedirs(path, exist_ok=True)
        payload = {"params": self.best_params if self.best_params is not None
                   else self.state.params,
                   "batch_stats": self.best_batch_stats if self.best_batch_stats
                   is not None else self.state.batch_stats}
        with open(os.path.join(path, "model.msgpack"), "wb") as fh:
            fh.write(flax.serialization.to_bytes(payload))

    def load(self, path: str):
        with open(os.path.join(path, "model.msgpack"), "rb") as fh:
            payload = {"params": self.state.params,
                       "batch_stats": self.state.batch_stats}
            restored = flax.serialization.from_bytes(payload, fh.read())
        # from_bytes yields numpy leaves; traced eval paths need device arrays
        restored = jax.tree_util.tree_map(jnp.asarray, restored)
        self.state = self.state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"])
        self._apply_tower_sharding()
