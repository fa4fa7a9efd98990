"""Experiment-layer tests: registry completeness, CLI → train/test/gather on
reference-format artifacts written to disk (the full L7→L1 stack of SURVEY.md §1)."""
import os

import numpy as np
import pytest
import yaml

from sibrar_tpu.config.loader import get_config
from sibrar_tpu.config.schema import DatasetSplitType
from sibrar_tpu.data.synthetic import make_synthetic_splits, write_reference_artifacts
from sibrar_tpu.models.registry import ALGORITHMS, get_algorithm

# minimal model confs per algorithm (keys mirror the reference's conf yamls)
MODEL_CONFS = {
    "sgdbias": {},
    "mf": {"embedding_dim": 8},
    "acf": {"embedding_dim": 8, "n_anchors": 4},
    "uprotomf": {"embedding_dim": 8, "n_prototypes": 4},
    "iprotomf": {"embedding_dim": 8, "n_prototypes": 4},
    "uiprotomf": {"embedding_dim": 8, "u_n_prototypes": 4, "i_n_prototypes": 4},
    "uprotomfs": {"embedding_dim": 8, "n_prototypes": 4},
    "iprotomfs": {"embedding_dim": 8, "n_prototypes": 4},
    "uiprotomfs": {"embedding_dim": 8, "u_n_prototypes": 4, "i_n_prototypes": 4},
    "ecf": {"embedding_dim": 8, "n_clusters": 4, "top_n": 2, "top_m": 2,
            "top_p": 2, "tag_feature": "genres"},
    "dmf": {"u_mid_layers": [8], "i_mid_layers": [8], "final_dimension": 8},
    "ifeatmf": {"feature_name": "audio", "embedding_dim": 8},
    "ufeatmf": {"feature_name": "profile_vec", "embedding_dim": 8},
    "dropoutnet": {
        "shared_common_dim": 8,
        "user": {"features": [{"feature_name": "profile_vec", "embedding_dim": 8}],
                 "preference_layers": [8], "common_hidden_layers": [8]},
        "item": {"features": [{"feature_name": "audio", "embedding_dim": 8}],
                 "preference_layers": [8], "common_hidden_layers": [8]},
    },
    "sbnet": {
        "shared_common_dim": 8,
        "user": {"feature_name": "user_embedding", "embedding_dim": 8},
        "item": {"features": [{"feature_name": "audio"},
                              {"feature_name": "text"}],
                 "single_branch_hidden_layers": [8], "common_modality_dim": 8},
    },
    "uknn": {"k": 5},
    "iknn": {"k": 5},
    "ifknn": {"k": 5, "feature_name": "audio"},
    "svd": {"n_factors": 4},
    "als": {"factors": 4, "n_iterations": 2, "regularization": 0.1, "alpha": 1.0},
    "rbmf": {"n_representatives": 4, "lam": 0.1},
    "slim": {"alpha": 0.01, "l1_ratio": 0.5, "max_iter": 5},
    "ease": {"lam": 1.0},
    "p3alpha": {"alpha": 1.0},
    "rand": {},
    "pop": {},
}


def test_registry_covers_reference_zoo():
    # the reference enum's 26 algorithms minus uiprotomfs_combine (a
    # predict-time composition, provided as UIProtoMFsCombine)
    assert set(MODEL_CONFS) == set(ALGORITHMS)
    assert len(ALGORITHMS) >= 25


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("synth_random")
    splits = make_synthetic_splits(n_users=50, n_items=60, n_interactions=1200, seed=11)
    write_reference_artifacts(str(out), splits)
    return str(out)


def _write_conf(tmp_path, base_overrides=None) -> str:
    conf = {
        "learn": {"n_epochs": 2, "lr": 0.005, "rec_loss": "bpr",
                  "optimizing_metric": "ndcg@10"},
        "eval": {"top_k": [10], "metrics": ["ndcg", "recall", "coverage"]},
        "loader": {"batch_size": 32, "eval_batch_size": 64},
        "dataset": {
            "n_negative_samples": 2,
            "user_features": [{"name": "gender", "type": "categorical"},
                              {"name": "profile_vec", "type": "vector"}],
            "item_features": [{"name": "audio", "type": "vector"},
                              {"name": "text", "type": "vector"},
                              {"name": "genres", "type": "tag"}],
        },
    }
    if base_overrides:
        conf.update(base_overrides)
    path = os.path.join(str(tmp_path), "conf.yml")
    with open(path, "w") as fh:
        yaml.safe_dump(conf, fh)
    return path


@pytest.mark.parametrize("algorithm", ["mf", "uiprotomf", "ecf"])
def test_cli_train_val_test_sgd(tmp_path, artifact_dir, algorithm):
    import run_experiment

    conf_path = _write_conf(tmp_path, {"model": MODEL_CONFS[algorithm],
                                       "results_path": str(tmp_path / "run")})
    run_experiment.main([
        "-a", algorithm, "-d", artifact_dir, "-t", "train_val_test",
        "-c", conf_path])
    res = str(tmp_path / "run")
    assert os.path.exists(os.path.join(res, "conf.yml"))
    assert os.path.exists(os.path.join(res, "model.msgpack"))
    with open(os.path.join(res, "metrics_val.yml")) as fh:
        val = yaml.safe_load(fh)
    with open(os.path.join(res, "metrics_test.yml")) as fh:
        test = yaml.safe_load(fh)
    assert np.isfinite(val["val/ndcg@10"]) and np.isfinite(test["test/ndcg@10"])


@pytest.mark.parametrize("algorithm", ["ease", "pop", "iknn"])
def test_cli_train_val_test_matrix(tmp_path, artifact_dir, algorithm):
    import run_experiment

    conf_path = _write_conf(tmp_path, {"model": MODEL_CONFS[algorithm],
                                       "results_path": str(tmp_path / "run")})
    run_experiment.main([
        "-a", algorithm, "-d", artifact_dir, "-t", "train_val_test",
        "-c", conf_path])
    res = str(tmp_path / "run")
    assert os.path.exists(os.path.join(res, "model.npz"))
    with open(os.path.join(res, "metrics_test.yml")) as fh:
        test = yaml.safe_load(fh)
    assert np.isfinite(test["test/ndcg@10"])


def test_gather_exports_topk(tmp_path, artifact_dir):
    import pickle

    import run_experiment

    conf_path = _write_conf(tmp_path, {"model": MODEL_CONFS["mf"],
                                       "results_path": str(tmp_path / "run")})
    run_experiment.main(["-a", "mf", "-d", artifact_dir, "-t", "train_val",
                         "-c", conf_path])
    run_experiment.main(["-a", "mf", "-d", artifact_dir, "-t", "gather",
                         "-c", conf_path])
    with open(tmp_path / "run" / "gather_test.pkl", "rb") as fh:
        payload = pickle.load(fh)
    n_users = len(payload["user_indices"])
    assert payload["topk_item_indices"].shape[0] == n_users
    assert payload["topk_logits"].shape == payload["topk_item_indices"].shape
    assert "test/ndcg@10" in payload["metrics"]
    assert payload["raw_metrics"]["test/ndcg@10"].shape == (n_users,)
    assert payload["n_users"] == n_users
    assert payload["k"] == payload["topk_item_indices"].shape[1]

    # reference parity (eval/eval.py:290-299): exported lists must exclude
    # already-interacted (train[/val]) items
    import scipy.sparse as sp

    from sibrar_tpu.data.dataset import RecDataset

    eval_ds = RecDataset.load(artifact_dir, "test")
    excl = eval_ds.exclude_matrix()[:, eval_ds.items_in_split].tocsr()
    for row, u in enumerate(payload["user_indices"]):
        banned = set(excl.indices[excl.indptr[u]:excl.indptr[u + 1]])
        assert not banned.intersection(payload["topk_item_indices"][row])

    # targets: (user_row, item_position) pairs of the split positives
    pos = sp.csr_matrix(
        (np.ones(len(eval_ds.interactions), np.int8),
         (eval_ds.interactions[:, 0],
          eval_ds.item_to_catalog[eval_ds.interactions[:, 1]])),
        shape=(eval_ds.n_users, eval_ds.n_items_in_split))
    assert payload["targets"].shape[1] == 2
    u0 = payload["user_indices"][0]
    expect0 = set(pos.indices[pos.indptr[u0]:pos.indptr[u0 + 1]])
    got0 = set(payload["targets"][payload["targets"][:, 0] == 0, 1])
    assert got0 == expect0


def test_run_test_is_load_only(tmp_path, artifact_dir, monkeypatch):
    """run_test must not re-initialize the model (init compile) or build
    optimizer state — the load-only path restores straight into eval-shaped
    buffers (VERDICT r1 item 9)."""
    import run_experiment
    import sibrar_tpu.train.trainer as trainer_mod

    conf_path = _write_conf(tmp_path, {"model": MODEL_CONFS["mf"],
                                       "results_path": str(tmp_path / "run")})
    run_experiment.main(["-a", "mf", "-d", artifact_dir, "-t", "train_val",
                         "-c", conf_path])

    def boom(*a, **k):
        raise AssertionError("init_model must not run in the load-only path")

    monkeypatch.setattr(trainer_mod, "init_model", boom)
    run_experiment.main(["-a", "mf", "-d", artifact_dir, "-t", "test",
                         "-c", conf_path])
    with open(tmp_path / "run" / "metrics_test.yml") as fh:
        test = yaml.safe_load(fh)
    assert np.isfinite(test["test/ndcg@10"])


def test_cli_conflicting_split_type_errors(tmp_path, artifact_dir):
    conf_path = _write_conf(tmp_path, {"split_type": "temporal"})
    with pytest.raises(ValueError, match="authoritative"):
        get_config(conf_path, algorithm="mf", dataset_name="x",
                   split_type="random")


def test_all_registry_entries_build(artifact_dir):
    """Every algorithm constructs from its minimal conf (init-only smoke)."""
    from sibrar_tpu.data.dataset import RecDataset
    from sibrar_tpu.config.schema import FeatureDefinition, FeatureType

    ufd = [FeatureDefinition("gender", FeatureType.CATEGORICAL),
           FeatureDefinition("profile_vec", FeatureType.VECTOR)]
    ifd = [FeatureDefinition("audio", FeatureType.VECTOR),
           FeatureDefinition("text", FeatureType.VECTOR),
           FeatureDefinition("genres", FeatureType.TAG)]
    train = RecDataset.load(artifact_dir, "train",
                            user_feature_definitions=ufd,
                            item_feature_definitions=ifd)
    dd = train.to_device()
    for name, spec in ALGORITHMS.items():
        conf = MODEL_CONFS[name]
        if spec.kind == "sgd":
            model = spec.build(conf, train, dd)
            assert model is not None, name
        else:
            alg = spec.build(conf, train)
            assert alg is not None, name


def test_train_eval_and_post_val_hooks(tmp_path, artifact_dir):
    """train_eval flag reports train/* metrics; ProtoMF runs post_val
    diagnostics each epoch (reference trainer.py:136-137,161-162)."""
    import run_experiment

    logged = []
    conf_path = _write_conf(tmp_path, {
        "model": MODEL_CONFS["uprotomf"],
        "results_path": str(tmp_path / "run"),
        "train_eval": True,
    })
    from sibrar_tpu.config.loader import get_config
    from sibrar_tpu.experiment import run_train_val

    conf = get_config(conf_path, algorithm="uprotomf", dataset_name="x")
    conf.dataset.dataset_path = artifact_dir
    run_train_val(conf, log_fn=logged.append)
    epoch_logs = [d for d in logged if d.get("epoch", -1) >= 0]
    assert any("train/ndcg@10" in d for d in epoch_logs)
    assert any("user_proto_sim_mean" in d for d in epoch_logs)


@pytest.mark.parametrize("algorithm", sorted(MODEL_CONFS))
def test_zoo_cli_end_to_end(tmp_path, artifact_dir, algorithm):
    """Every registry algorithm runs fit→predict→metrics through the CLI
    (VERDICT r2 #3: the init-only build smoke let a broken `fit` pass CI for
    ~10 of the 26 algorithms). Reference: every enum entry is runnable via
    run_experiment.py (`/root/reference/algorithms/algorithms_utils.py:11-42`)."""
    import run_experiment

    res = str(tmp_path / "run")
    conf_path = _write_conf(tmp_path, {
        "model": MODEL_CONFS[algorithm], "results_path": res,
        "learn": {"n_epochs": 1, "lr": 0.005, "rec_loss": "bpr",
                  "optimizing_metric": "ndcg@10", "max_batches_per_epoch": 4},
    })
    run_experiment.main(["-a", algorithm, "-d", artifact_dir,
                         "-t", "train_val_test", "-c", conf_path])
    for name, prefix in (("metrics_val.yml", "val"),
                         ("metrics_test.yml", "test")):
        with open(os.path.join(res, name)) as fh:
            m = yaml.safe_load(fh)
        for metric in (f"{prefix}/ndcg@10", f"{prefix}/recall@10",
                       f"{prefix}/coverage@10"):
            assert np.isfinite(m[metric]), (algorithm, metric)


def test_uiprotomfs_combine(tmp_path, artifact_dir):
    import run_experiment
    from sibrar_tpu.experiment import run_combine_experiment

    for alg in ("uprotomfs", "iprotomfs"):
        conf_path = _write_conf(tmp_path, {"model": MODEL_CONFS[alg],
                                           "results_path": str(tmp_path / alg)})
        run_experiment.main(["-a", alg, "-d", artifact_dir, "-t", "train_val",
                             "-c", conf_path])
    metrics = run_combine_experiment(str(tmp_path / "uprotomfs"),
                                     str(tmp_path / "iprotomfs"))
    assert np.isfinite(metrics["test/ndcg@10"])
    # and through the CLI (reference exposes the combine as an algorithm
    # enum entry, algorithms_utils.py:11-42)
    run_experiment.main(["-a", "uiprotomfs_combine",
                         "--u_run_dir", str(tmp_path / "uprotomfs"),
                         "--i_run_dir", str(tmp_path / "iprotomfs"),
                         "--split_set", "test"])


def test_cli_gather_split_set_and_k(tmp_path, artifact_dir):
    """run_gather's split_set/k are CLI-reachable (VERDICT r2 #9)."""
    import pickle

    import run_experiment

    conf_path = _write_conf(tmp_path, {"model": MODEL_CONFS["mf"],
                                       "results_path": str(tmp_path / "run")})
    run_experiment.main(["-a", "mf", "-d", artifact_dir, "-t", "train_val",
                         "-c", conf_path])
    run_experiment.main(["-a", "mf", "-d", artifact_dir, "-t", "gather",
                         "-c", conf_path, "--split_set", "val",
                         "--gather_k", "7"])
    with open(tmp_path / "run" / "gather_val.pkl", "rb") as fh:
        payload = pickle.load(fh)
    assert payload["k"] == 7
    assert payload["topk_item_indices"].shape[1] == 7


def test_cli_sbnet_mesh_matches_single_device(tmp_path, artifact_dir):
    """VERDICT r2 #1 'done when': `run_experiment.py -a sbnet -t
    train_val_test` on the 8-device CPU mesh (`parallel.enabled=true` — the
    config knob; TPU backends auto-enable) produces the same metrics as the
    single-device run. Catalog sharding + distributed top-k are exact; the
    only tolerated difference is gradient all-reduce summation order."""
    import jax

    import run_experiment

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device virtual platform")

    def run(tag, enabled):
        res = str(tmp_path / tag)
        conf_path = _write_conf(tmp_path, {
            "model": MODEL_CONFS["sbnet"], "results_path": res,
            "learn": {"n_epochs": 1, "lr": 0.005, "rec_loss": "bpr",
                      "optimizing_metric": "ndcg@10"},
        })
        run_experiment.main([
            "-a", "sbnet", "-d", artifact_dir, "-t", "train_val_test",
            "-c", conf_path, "-o", f"parallel.enabled={enabled}"])
        with open(os.path.join(res, "metrics_val.yml")) as fh:
            val = yaml.safe_load(fh)
        with open(os.path.join(res, "metrics_test.yml")) as fh:
            test = yaml.safe_load(fh)
        return val, test

    v1, t1 = run("single", "false")
    v2, t2 = run("mesh", "true")
    for a, b in ((v1, v2), (t1, t2)):
        assert a.keys() == b.keys()
        for k in a:
            assert abs(a[k] - b[k]) < 2e-3, (k, a[k], b[k])
