"""Sweep, significance-test, and analysis-utility tests."""
import os

import numpy as np
import pandas as pd
import pytest
import yaml

from sibrar_tpu.eval.stat_tests import paired_t_tests
from sibrar_tpu.sweep import SweepConfig, run_sweep, sample_trials
from sibrar_tpu.utils.analysis import collect_runs, best_run, filter_by


def test_sample_trials_random_and_grid():
    sweep = SweepConfig(
        method="random", n_trials=5, seed=1,
        parameters={"learn.lr": {"min": 1e-4, "max": 1e-1,
                                 "distribution": "log_uniform"},
                    "model.embedding_dim": {"values": [8, 16]}})
    trials = sample_trials(sweep)
    assert len(trials) == 5
    assert all(1e-4 <= t["learn.lr"] <= 1e-1 for t in trials)
    assert all(t["model.embedding_dim"] in (8, 16) for t in trials)

    grid = SweepConfig(method="grid", parameters={
        "learn.lr": {"values": [0.1, 0.01]},
        "model.embedding_dim": {"values": [8, 16, 32]}})
    points = sample_trials(grid)
    assert len(points) == 6
    with pytest.raises(ValueError, match="explicit 'values'"):
        sample_trials(SweepConfig(method="grid",
                                  parameters={"x": {"min": 0, "max": 1}}))


def test_run_sweep_orders_and_prunes(tmp_path):
    """Stubbed run_fn: check ordering by metric and top-N model pruning."""
    sweep = SweepConfig(method="grid", metric="val/ndcg@10", keep_top_runs=1,
                        parameters={"learn.lr": {"values": [0.1, 0.2, 0.3]}},
                        base_config={"algorithm": "mf"})

    def fake_run(conf):
        os.makedirs(conf.results_path, exist_ok=True)
        with open(os.path.join(conf.results_path, "model.msgpack"), "wb") as fh:
            fh.write(b"x")
        value = conf.learn.lr  # higher lr → "better" for this fake
        return {"val/ndcg@10": value}, {"test/ndcg@10": value}

    records = run_sweep(sweep, str(tmp_path), run_fn=fake_run)
    assert [r["params"]["learn.lr"] for r in records] == [0.3, 0.2, 0.1]
    # only the best kept its model file
    kept = [os.path.exists(os.path.join(r["results_path"], "model.msgpack"))
            for r in records]
    assert kept == [True, False, False]
    assert os.path.exists(tmp_path / "sweep_state.yml")


def test_sweep_cli_end_to_end(tmp_path):
    """Real mini-sweep over MF on artifacts through the sweep agent CLI."""
    import sweep_agent
    from sibrar_tpu.data.synthetic import make_synthetic_splits, write_reference_artifacts

    art = tmp_path / "data"
    write_reference_artifacts(
        str(art), make_synthetic_splits(n_users=40, n_items=50,
                                        n_interactions=800, seed=2))
    sweep_conf = {
        "method": "grid",
        "metric": "val/ndcg@10",
        "keep_top_runs": 1,
        "parameters": {"model.embedding_dim": {"values": [4, 8]}},
        "base_config": {
            "algorithm": "mf",
            "dataset": {"dataset_path": str(art), "n_negative_samples": 2},
            "learn": {"n_epochs": 1, "rec_loss": "bpr",
                      "optimizing_metric": "ndcg@10"},
            "eval": {"top_k": [10], "metrics": ["ndcg"]},
            "loader": {"batch_size": 32, "eval_batch_size": 64},
        },
    }
    conf_path = tmp_path / "sweep.yml"
    with open(conf_path, "w") as fh:
        yaml.safe_dump(sweep_conf, fh)
    sweep_agent.main(["-c", str(conf_path), "-o", str(tmp_path / "runs")])

    df = collect_runs(str(tmp_path / "runs"))
    assert len(df) == 2
    assert "val/ndcg@10" in df.columns
    best = best_run(str(tmp_path / "runs"), "val/ndcg@10")
    assert best is not None and np.isfinite(best["val/ndcg@10"])


def test_paired_t_tests_bonferroni():
    rng = np.random.default_rng(0)
    base = rng.normal(size=500)
    metrics = {
        "a": base + 0.5 + rng.normal(size=500),   # statistically tied with b
        "b": base + 0.42 + rng.normal(size=500),
        "worse": base - 2.0 + rng.normal(size=500),  # clearly worse
    }
    comps = paired_t_tests(metrics, threshold=0.05)
    winner = comps[0].best_model
    assert winner in ("a", "b")  # the tied pair supplies the empirical best
    assert all(c.best_model == winner for c in comps)
    assert all(c.threshold == pytest.approx(0.025) for c in comps)  # /2 models
    by_other = {c.other_model: c for c in comps}
    assert by_other["worse"].significant
    tied_other = "b" if winner == "a" else "a"
    assert not by_other[tied_other].significant
    with pytest.raises(ValueError):
        paired_t_tests({"only": base})


def test_filter_by_dsl():
    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "x"]})
    assert len(filter_by(df, {"b": "x"})) == 2
    assert len(filter_by(df, {"a": [1, 3]})) == 2
    assert len(filter_by(df, {"a": lambda v: v > 1, "b": "x"})) == 1
