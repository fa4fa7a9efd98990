"""Experiment orchestration: config → data → model → train/fit → eval → artifacts.

Parity target: `/root/reference/experiment_helper.py` (run_train_val :42-90,
run_test :123-149, run_gather :168-186, run_train_val_test :189-191): wires the
config to datasets and the algorithm registry, dispatches on model family
(SGD vs fit-once matrix), saves `conf.yml` / `metrics_val.yml` /
`metrics_test.yml` and the best model into the run directory, and logs to W&B
when available/enabled.

TPU-first: the SGD path hands everything to the jitted Trainer; the optional
`profile_training` flag wraps one training epoch in `jax.profiler.trace`
(TensorBoard/Perfetto) — the moral equivalent of the reference's torch.profiler
Chrome-trace epoch (`/root/reference/train/trainer.py:173-182`).
"""
from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np

from sibrar_tpu.config.loader import yaml_save
from sibrar_tpu.config.schema import ExperimentConfig, as_dict
from sibrar_tpu.data.dataset import RecDataset
from sibrar_tpu.eval.evaluator import FullEvaluator, evaluate_model
from sibrar_tpu.models.registry import get_algorithm
from sibrar_tpu.train.trainer import Trainer
from sibrar_tpu.utils.misc import generate_id, log_info_results, reproducible


def _load_split(conf: ExperimentConfig, split_set: str) -> RecDataset:
    return RecDataset.load(
        conf.dataset.dataset_path,
        split_set,
        user_feature_definitions=conf.dataset.user_features or None,
        item_feature_definitions=conf.dataset.item_features or None,
        n_negative_samples=conf.dataset.n_negative_samples,
        negative_sampling_strategy=conf.dataset.negative_sampling_strategy,
        popularity_squashing_factor=conf.dataset.popularity_squashing_factor,
    )


def _results_path(conf: ExperimentConfig) -> str:
    if not conf.results_path:
        conf.results_path = os.path.join(
            "results", conf.dataset_name, conf.split_type.dir_name, conf.algorithm,
            conf.run_id or generate_id())
    os.makedirs(conf.results_path, exist_ok=True)
    return conf.results_path


def _maybe_wandb(conf: ExperimentConfig):
    """Return a live wandb run or None (gated on config + availability)."""
    if not (conf.wandb.use_wandb or conf.run_settings.use_wandb):
        return None
    try:
        import wandb
    except ImportError:
        import logging

        logging.warning("wandb requested but not installed; logging disabled")
        return None
    if getattr(wandb, "run", None) is not None:
        # under a server-driven sweep agent (sweep.wandb_train_val_agent)
        # the sweep-controlled run is already open — reuse it so metrics
        # land on the run the sweep controller watches (reinit=True here
        # would spawn a fresh run the server never sees), and do NOT finish
        # it on exit: the agent owns its lifecycle
        return wandb.run
    run = wandb.init(
        project=conf.wandb.project, entity=conf.wandb.entity,
        name=conf.run_id or None, tags=list(conf.wandb.tags) or None,
        config=as_dict(conf), reinit=True)
    if run is not None:
        run._sibrar_owned = True  # only runs we opened get finished by us
    return run


def _fit_matrix_algorithm(alg, train_ds: RecDataset):
    """Dispatch fit kwargs per algorithm family (reference
    experiment_helper.py:72-77 + ItemFeatureKNN's feature matrix)."""
    kwargs = {}
    feature_name = getattr(alg, "feature_name", None)
    if feature_name:
        feat = train_ds.item_features[feature_name]
        # dense_table densifies TAG/CATEGORICAL code tables to multi-/one-hot
        # before similarity (reference algorithms/knn_algs.py:129-140)
        kwargs["feature_matrix"] = feat.dense_table()
    alg.fit(matrix=train_ds.user_sampling_matrix, **kwargs)


def _make_log_fn(conf: ExperimentConfig, wandb_run):
    """Per-epoch metric sink: W&B and/or Ray Tune (reference
    train/trainer.py:113-117,164-168 — `session.report` when `in_tune`)."""
    sinks = []
    if wandb_run:
        sinks.append(wandb_run.log)
    if conf.run_settings.in_tune:
        try:
            from ray.air import session

            sinks.append(lambda d: session.report(
                {k: v for k, v in d.items() if isinstance(v, (int, float))}))
        except ImportError:
            import logging

            logging.warning("in_tune requested but ray is not installed")

    import logging

    console = logging.getLogger("sibrar_tpu.train")

    def log(d: dict):
        # always narrate epochs to the console like the reference's trainer
        # (train/trainer.py:113-117) — a multi-hour run must not be silent
        head = {k: d[k] for k in ("epoch", "train/loss",
                                  "train/epoch_wall_s", "val/wall_s")
                if k in d}
        opt = conf.learn.optimizing_metric
        for k in (f"val/{opt}", f"val/{opt}".replace("val/", "train/")):
            if k in d:
                head[k] = d[k]
        console.info("%s", " ".join(
            f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in head.items()))
        for sink in sinks:
            sink(d)

    return log


def _tower_kwargs(conf: ExperimentConfig) -> dict:
    """Trainer kwargs for tensor-parallel interaction towers (conf.parallel)."""
    p = conf.parallel
    if p is None:
        return {}
    return {"shard_towers": p.shard_towers, "tower_min_rows": p.tower_min_rows}


def _make_run_mesh(conf: ExperimentConfig):
    """Resolve conf.parallel into a device mesh (None on single-device runs)
    and reconcile batch sizes with the mesh's device multiple — the wiring
    that makes a stock config on a v5e-8 run data-parallel + catalog-sharded
    (SURVEY.md §2.9; the reference has no distributed execution at all)."""
    from sibrar_tpu.parallel.mesh import (
        batch_multiple,
        make_mesh_from_config,
        pad_to_multiple,
    )

    mesh = make_mesh_from_config(conf.parallel)
    if mesh is None:
        return None
    mult = batch_multiple(mesh)
    if conf.loader.batch_size % mult:
        if not conf.parallel.adjust_batch_sizes:
            raise ValueError(
                f"loader.batch_size={conf.loader.batch_size} does not divide "
                f"over the mesh ({mult} devices); set "
                f"parallel.adjust_batch_sizes or fix the batch size")
        import logging

        new = pad_to_multiple(conf.loader.batch_size, mult)
        logging.getLogger(__name__).info(
            "rounding loader.batch_size %d → %d to divide over the "
            "%d-device mesh", conf.loader.batch_size, new, mult)
        conf.loader.batch_size = new
    return mesh


# ------------------------------------------------------------------------ runs
def _apply_run_settings(conf: ExperimentConfig) -> None:
    reproducible(conf.run_settings.seed)
    if conf.run_settings.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)


def run_train_val(conf: ExperimentConfig, log_fn=None) -> dict:
    """Train on train split, validate on val; returns best val metrics."""
    _apply_run_settings(conf)
    results_path = _results_path(conf)

    spec = get_algorithm(conf.algorithm)
    mesh = _make_run_mesh(conf)  # may round loader batch sizes up to the
    # mesh's data-axis multiple — persist conf AFTER so the saved run config
    # records the batch size the run actually used
    yaml_save(os.path.join(results_path, "conf.yml"), as_dict(conf))
    train_ds = _load_split(conf, "train")
    val_ds = _load_split(conf, "val")
    evaluator = FullEvaluator(conf.eval, val_ds, evaluator_name="val",
                              mesh=mesh)

    wandb_run = _maybe_wandb(conf)
    _log = log_fn or _make_log_fn(conf, wandb_run)

    if spec.kind == "sgd":
        device_data = train_ds.to_device()
        model = spec.build(conf.model, train_ds, device_data)
        train_evaluator = None
        if conf.train_eval:  # metrics on the train interactions (reference flag)
            train_evaluator = FullEvaluator(conf.eval, train_ds,
                                            evaluator_name="train", mesh=mesh)
        post_val_fn = None
        if conf.algorithm.endswith("protomf") or conf.algorithm.endswith("protomfs"):
            from sibrar_tpu.eval.explanations import protomf_post_val

            # uiprotomf(s) hold BOTH prototype sets — export both sides
            # (reference post_val runs per contained module, sgd_alg.py)
            entities = (("user", "item") if conf.algorithm.startswith("ui")
                        else ("item",) if conf.algorithm[0] == "i"
                        else ("user",))

            def post_val_fn(params, epoch, _entities=entities):
                out = {}
                for ent in _entities:
                    out.update(protomf_post_val(params, ent, epoch,
                                                results_dir=results_path))
                return out
        trainer = Trainer(
            model, train_ds, evaluator, conf.learn, conf.dataset,
            batch_size=conf.loader.batch_size,
            eval_batch_size=conf.loader.eval_batch_size,
            seed=conf.run_settings.seed,
            results_path=results_path,
            log_fn=_log,
            device_data=device_data,
            mesh=mesh,
            **_tower_kwargs(conf),
            train_evaluator=train_evaluator,
            post_val_fn=post_val_fn,
            profile_dir=(os.path.join(results_path, "profile")
                         if conf.profile_training else None),
        )
        metrics = trainer.fit()
    else:
        alg = spec.build(conf.model, train_ds)
        _fit_matrix_algorithm(alg, train_ds)
        alg.save(results_path)
        metrics = evaluate_model(
            alg.score_fn(val_ds.items_in_split), evaluator,
            conf.loader.eval_batch_size)
        _log(metrics)

    yaml_save(os.path.join(results_path, "metrics_val.yml"), metrics)
    log_info_results(metrics)
    if wandb_run and getattr(wandb_run, "_sibrar_owned", False):
        wandb_run.finish()
    return metrics


def run_test(conf: ExperimentConfig, log_fn=None) -> dict:
    """Evaluate the saved best model on the test split
    (reference experiment_helper.py:123-149)."""
    _apply_run_settings(conf)
    results_path = _results_path(conf)

    spec = get_algorithm(conf.algorithm)
    mesh = _make_run_mesh(conf)
    train_ds = _load_split(conf, "train")
    test_ds = _load_split(conf, "test")
    evaluator = FullEvaluator(conf.eval, test_ds, evaluator_name="test",
                              mesh=mesh)

    wandb_run = _maybe_wandb(conf)
    if wandb_run is not None and hasattr(wandb_run, "define_metric"):
        # custom x-axis for test metrics: logging test/* at step 0 is
        # rejected on already-running W&B runs (reference
        # experiment_helper.py:139-145)
        wandb_run.define_metric("test/step")
        wandb_run.define_metric("test/*", step_metric="test/step")
    _log = log_fn or _make_log_fn(conf, wandb_run)

    if spec.kind == "sgd":
        device_data = train_ds.to_device()
        model = spec.build(conf.model, train_ds, device_data)
        trainer = Trainer(
            model, train_ds, evaluator, conf.learn, conf.dataset,
            batch_size=conf.loader.batch_size,
            eval_batch_size=conf.loader.eval_batch_size,
            seed=conf.run_settings.seed,
            device_data=device_data,
            mesh=mesh,
            **_tower_kwargs(conf),
            init_for_training=False,  # load-only: no init compile, no optimizer
        )
        trainer.load(results_path)
        metrics = trainer.validate()
    else:
        alg = spec.build(conf.model, train_ds)
        alg.load(results_path)
        metrics = evaluate_model(
            alg.score_fn(test_ds.items_in_split), evaluator,
            conf.loader.eval_batch_size)
    _log(metrics)

    yaml_save(os.path.join(results_path, "metrics_test.yml"), metrics)
    log_info_results(metrics)
    if wandb_run and getattr(wandb_run, "_sibrar_owned", False):
        wandb_run.finish()
    return metrics


def run_combine_experiment(u_run_dir: str, i_run_dir: str,
                           split_set: str = "test") -> dict:
    """UIProtoMFsCombine (reference enum `uiprotomfs_combine`,
    sgd_alg.py:1088-1115): score-sum of two separately fitted runs (typically
    UProtoMFs + IProtoMFs), evaluated without any training."""
    from sibrar_tpu.models.protomf import UIProtoMFsCombine
    from sibrar_tpu.utils.analysis import reload_run

    u_conf, u_score = reload_run(u_run_dir)
    i_conf, i_score = reload_run(i_run_dir)
    eval_ds = _load_split(u_conf, split_set)
    evaluator = FullEvaluator(u_conf.eval, eval_ds, evaluator_name=split_set,
                              mesh=_make_run_mesh(u_conf))
    combined = UIProtoMFsCombine(u_score, i_score)
    metrics = evaluate_model(combined, evaluator,
                             u_conf.loader.eval_batch_size)
    log_info_results(metrics)
    return metrics


def run_train_val_test(conf: ExperimentConfig) -> tuple[dict, dict]:
    val_metrics = run_train_val(conf)
    test_metrics = run_test(conf)
    return val_metrics, test_metrics


def run_gather(conf: ExperimentConfig, split_set: str = "test",
               k: Optional[int] = None, out_name: Optional[str] = None) -> dict:
    """Re-evaluate a saved model, exporting per-user raw metrics and top-k
    indices/logits to a pickle (reference Gatherer, eval/eval.py:258-333).

    Field parity with the reference payload: ``topk_item_indices`` /
    ``topk_logits`` are taken AFTER masking already-interacted (train/val)
    items to −inf (reference eval/eval.py:290-299), plus ``user_indices``,
    ``targets``, ``n_users``, ``n_items``, ``k``, ``metrics``, ``raw_metrics``.
    ``targets`` are (user_row, item_position) pairs of the split's positives;
    user_row indexes into the exported ``user_indices`` order (the reference's
    per-batch ``torch.argwhere(labels)`` rows are batch-local, which is
    ambiguous once concatenated — global rows are the usable equivalent)."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    from sibrar_tpu.ops.topk import masked_topk

    _apply_run_settings(conf)
    results_path = _results_path(conf)

    spec = get_algorithm(conf.algorithm)
    mesh = _make_run_mesh(conf)
    train_ds = _load_split(conf, "train")
    eval_ds = _load_split(conf, split_set)
    evaluator = FullEvaluator(conf.eval, eval_ds, evaluator_name=split_set,
                              mesh=mesh)

    if spec.kind == "sgd":
        device_data = train_ds.to_device()
        model = spec.build(conf.model, train_ds, device_data)
        trainer = Trainer(
            model, train_ds, evaluator, conf.learn, conf.dataset,
            batch_size=conf.loader.batch_size,
            eval_batch_size=conf.loader.eval_batch_size,
            seed=conf.run_settings.seed, device_data=device_data,
            mesh=mesh, **_tower_kwargs(conf), init_for_training=False)
        trainer.load(results_path)
        score_fn = trainer.make_score_fn()
    else:
        alg = spec.build(conf.model, train_ds)
        alg.load(results_path)
        score_fn = alg.score_fn(eval_ds.items_in_split)

    if k is None:  # reference default: max cutoff (eval/eval.py:273)
        k = max(conf.eval.top_k)
    k = min(k, eval_ds.n_items_in_split)
    users = np.asarray(evaluator.data.users_in_split)
    top_idx, top_logits = [], []
    bs = conf.loader.eval_batch_size
    for start in range(0, len(users), bs):
        batch = users[start:start + bs]
        valid = np.ones(len(batch), bool)
        if len(batch) < bs:
            pad = bs - len(batch)
            batch = np.concatenate([batch, np.repeat(batch[-1:], pad)])
            valid = np.concatenate([valid, np.zeros(pad, bool)])
        u = jnp.asarray(batch, dtype=jnp.int32)
        scores = score_fn(u)
        # exclusion-masked top-k: exported lists must not contain train/val
        # items (reference eval/eval.py:290-299 masks to -inf before topk)
        v, i = masked_topk(scores, evaluator.data.exclude_csr, u, k)
        top_idx.append(np.asarray(i)[valid])
        top_logits.append(np.asarray(v)[valid])
        if k >= evaluator.k_max:
            # the export's masked top-k covers every metric cutoff: feed it
            # to the evaluator instead of re-running the [B, C] exclusion +
            # selection chain (the dominant per-batch cost) a second time
            evaluator.eval_batch_from_topk(u, i, valid=valid)
        else:  # shallow export (k < max cutoff): metrics need their own pass
            evaluator.eval_batch(u, scores, valid=valid)
    metrics, raw = evaluator.get_results(return_raw_results=True)

    # split positives as (user_row, item_position) pairs, rows in `users` order
    inter = eval_ds.interactions
    pos_sp = sp.csr_matrix(
        (np.ones(len(inter), np.int8),
         (inter[:, 0], eval_ds.item_to_catalog[inter[:, 1]])),
        shape=(eval_ds.n_users, eval_ds.n_items_in_split))
    pos_coo = pos_sp[users].tocoo()
    targets = np.stack([pos_coo.row, pos_coo.col], axis=1).astype(np.int64)

    payload = {
        "metrics": metrics,
        "raw_metrics": raw,
        "user_indices": users,
        "topk_item_indices": np.concatenate(top_idx),  # positions in items_in_split
        "topk_logits": np.concatenate(top_logits),
        "targets": targets,
        "n_users": eval_ds.n_users_in_split,
        "n_items": eval_ds.n_items_in_split,
        "k": k,
        "items_in_split": np.asarray(eval_ds.items_in_split),
    }
    out = os.path.join(results_path, out_name or f"gather_{split_set}.pkl")
    with open(out, "wb") as fh:
        pickle.dump(payload, fh)
    log_info_results(metrics)
    return payload
