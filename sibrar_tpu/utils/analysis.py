"""Run-result analysis utilities.

Parity target: `/root/reference/utilities/analysis_utils.py:41-270` (W&B run
retrieval → pandas, run-directory lookup, experiment reloading for offline
eval) re-based on the local results tree: every run directory carries
`conf.yml` + `metrics_val.yml` / `metrics_test.yml` (written by
`sibrar_tpu.experiment`), which is the source of truth here rather than a W&B
server. Also carries the `filter_by` pandas condition DSL
(`/root/reference/utilities/pd_utils.py`).
"""
from __future__ import annotations

import glob
import os
from typing import Any, Optional

import pandas as pd
import yaml


def _read_yaml(path: str) -> dict:
    with open(path) as fh:
        return yaml.safe_load(fh) or {}


def collect_runs(results_base: str) -> pd.DataFrame:
    """Scan a results tree for run dirs (identified by conf.yml) and flatten
    config + metrics into one row per run."""
    rows = []
    for conf_path in glob.glob(os.path.join(results_base, "**", "conf.yml"),
                               recursive=True):
        run_dir = os.path.dirname(conf_path)
        row: dict[str, Any] = {"results_path": run_dir}
        conf = _read_yaml(conf_path)
        for k in ("run_id", "algorithm", "dataset_name", "split_type"):
            row[k] = conf.get(k)
        for key, sub in (conf.get("learn") or {}).items():
            row[f"learn.{key}"] = sub
        for key, sub in (conf.get("model") or {}).items():
            if not isinstance(sub, (dict, list)):
                row[f"model.{key}"] = sub
        for split in ("val", "test"):
            mp = os.path.join(run_dir, f"metrics_{split}.yml")
            if os.path.exists(mp):
                row.update(_read_yaml(mp))
        rows.append(row)
    return pd.DataFrame(rows)


def best_run(results_base: str, metric: str, maximize: bool = True
             ) -> Optional[pd.Series]:
    df = collect_runs(results_base)
    if df.empty or metric not in df.columns:
        return None
    df = df.dropna(subset=[metric])
    if df.empty:
        return None
    idx = df[metric].idxmax() if maximize else df[metric].idxmin()
    return df.loc[idx]


def reload_run(run_dir: str):
    """Rebuild (conf, score_fn) from a stored run for offline analysis
    (reference analysis_utils.py:218-270)."""
    from sibrar_tpu.config.schema import ExperimentConfig, from_dict
    from sibrar_tpu.experiment import _load_split
    from sibrar_tpu.models.registry import get_algorithm

    conf = from_dict(ExperimentConfig, _read_yaml(os.path.join(run_dir, "conf.yml")))
    conf.results_path = run_dir
    spec = get_algorithm(conf.algorithm)
    train_ds = _load_split(conf, "train")
    test_ds = _load_split(conf, "test")
    if spec.kind == "sgd":
        from sibrar_tpu.eval.evaluator import FullEvaluator
        from sibrar_tpu.train.trainer import Trainer

        device_data = train_ds.to_device()
        model = spec.build(conf.model, train_ds, device_data)
        evaluator = FullEvaluator(conf.eval, test_ds, evaluator_name="test")
        trainer = Trainer(model, train_ds, evaluator, conf.learn, conf.dataset,
                          seed=conf.run_settings.seed, device_data=device_data)
        trainer.load(run_dir)
        return conf, trainer.make_score_fn()
    alg = spec.build(conf.model, train_ds)
    alg.load(run_dir)
    return conf, alg.score_fn(test_ds.items_in_split)


def filter_by(df: pd.DataFrame, conditions: dict[str, Any]) -> pd.DataFrame:
    """Tiny condition DSL over DataFrames (reference utilities/pd_utils.py):
    values may be scalars (equality), lists/sets (isin), or callables."""
    mask = pd.Series(True, index=df.index)
    for column, cond in conditions.items():
        if callable(cond):
            mask &= df[column].map(cond)
        elif isinstance(cond, (list, set, tuple)):
            mask &= df[column].isin(list(cond))
        else:
            mask &= df[column] == cond
    return df[mask]
