"""The shipped example configs must parse, inherit correctly, and (where the
synthetic dataset carries the referenced features) build their models."""
import glob
import os

import pytest

from sibrar_tpu.config.loader import get_config, load_config_dict
from sibrar_tpu.config.schema import ExperimentConfig, from_dict
from sibrar_tpu.data.synthetic import make_synthetic_splits
from sibrar_tpu.models.registry import get_algorithm

CONF_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "conf")


def test_all_confs_parse():
    paths = glob.glob(os.path.join(CONF_DIR, "**", "*.yml"), recursive=True)
    assert len(paths) >= 10
    for p in paths:
        d = load_config_dict(p)
        assert isinstance(d, dict) and d


def test_base_inheritance_applies():
    conf = get_config(os.path.join(CONF_DIR, "sbnet_cold_item.yml"),
                      algorithm="sbnet", dataset_name="x")
    # grandparent (base.yml) leaks through two levels
    assert conf.learn.optimizer == "adam"
    # parent (sbnet_warm.yml) model survives, leaf override lands
    assert conf.model["item"]["eval_modalities"] == ["audio", "text", "genres"]
    assert conf.model["item"]["common_modality_dim"] == 512


@pytest.mark.parametrize("name,alg", [
    ("mf.yml", "mf"), ("dmf.yml", "dmf"), ("ecf.yml", "ecf"),
    ("sbnet_warm.yml", "sbnet"), ("sbnet_cold_item.yml", "sbnet"),
    ("sbnet_missing_modality.yml", "sbnet"),
])
def test_model_confs_build(name, alg):
    splits = make_synthetic_splits(n_users=30, n_items=40, n_interactions=500)
    train = splits["train"]
    conf = get_config(os.path.join(CONF_DIR, name), algorithm=alg,
                      dataset_name="x")
    dd = train.to_device()
    spec = get_algorithm(alg)
    model = spec.build(conf.model, train, dd)
    assert model is not None


def test_sweep_conf_loads_with_relative_base():
    from sibrar_tpu.sweep import load_sweep_config, sample_trials

    sweep = load_sweep_config(os.path.join(CONF_DIR, "sweeps", "sbnet_random.yml"))
    trials = sample_trials(sweep)
    assert len(trials) == 32
    assert all(1e-4 <= t["learn.lr"] <= 1e-2 for t in trials)
    # the relative ../sbnet_warm.yml (and its base.yml) resolved at load time
    assert sweep.base_config["model"]["item"]["common_modality_dim"] == 512
    assert sweep.base_config["learn"]["optimizer"] == "adam"
    assert "base_configs" not in sweep.base_config


def test_preprocessing_conf_loads():
    from sibrar_tpu.preprocessing.ppconfig import PreprocessingConfig

    d = load_config_dict(os.path.join(CONF_DIR, "preprocessing", "ml1m.yml"))
    cfg = from_dict(PreprocessingConfig, d)
    assert cfg.interactions.k_core == 5
    assert cfg.split.ratios == [0.8, 0.1, 0.1]
    assert any(f.normalization for f in cfg.item_features)
