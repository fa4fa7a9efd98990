"""Config loader/merge semantics tests (reference conf_parser merge rules)."""
import os

import pytest

from sibrar_tpu.config import (
    DatasetSplitType, EvalConfig, ExperimentConfig, LearningConfig,
    extend_by_base_configs, from_dict, load_config_dict, merge_dicts,
    nested_dict_get, update_nested_dict,
)


def test_merge_dicts_leaf_wins():
    a = {"x": 1, "sub": {"a": 1, "b": 2}, "lst": [1, 2]}
    b = {"x": 3, "sub": {"b": 5, "c": 6}, "lst": [9]}
    m = merge_dicts(a, b)
    assert m["x"] == 3
    assert m["sub"] == {"a": 1, "b": 5, "c": 6}
    # lists are replaced wholesale, not merged
    assert m["lst"] == [9]


def test_base_config_precedence(tmp_path):
    """Leaf wins; later bases beat earlier bases; relative paths resolve
    against the including file (reference conf_parser.py:116-137)."""
    (tmp_path / "base1.yml").write_text("a: 1\nb: 1\nc: 1\n")
    (tmp_path / "base2.yml").write_text("b: 2\nc: 2\n")
    (tmp_path / "leaf.yml").write_text(
        "base_configs: [base1.yml, base2.yml]\nc: 3\n")
    cfg = load_config_dict(str(tmp_path / "leaf.yml"))
    assert cfg == {"a": 1, "b": 2, "c": 3}


def test_recursive_base_chain(tmp_path):
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "grandbase.yml").write_text("deep: {x: 10, y: 20}\n")
    (sub / "base.yml").write_text("base_configs: grandbase.yml\ndeep: {y: 30}\n")
    (tmp_path / "leaf.yml").write_text("base_configs: [sub/base.yml]\ndeep: {z: 40}\n")
    cfg = load_config_dict(str(tmp_path / "leaf.yml"))
    assert cfg["deep"] == {"x": 10, "y": 30, "z": 40}


def test_nested_dict_helpers():
    d = {}
    update_nested_dict(d, "a.b.c", 5)
    assert d == {"a": {"b": {"c": 5}}}
    assert nested_dict_get(d, "a.b.c") == 5
    assert nested_dict_get(d, "a.x.y", "dflt") == "dflt"


def test_experiment_config_from_dict():
    cfg = from_dict(ExperimentConfig, {
        "algorithm": "sbnet",
        "split_type": "cold_start_item",
        "learn": {"lr": 0.01, "optimizer": "adamw", "rec_loss": "bpr"},
        "eval": {"top_k": [5, 10]},
        "unknown_key": 123,  # silently dropped (SoftBaseConfig behaviour)
    })
    assert cfg.algorithm == "sbnet"
    assert cfg.split_type == DatasetSplitType.COLD_START_ITEM
    assert cfg.split_type.is_cold_start
    assert cfg.learn.optimizer == "adamw"
    assert cfg.eval.top_k == [5, 10]


def test_config_validation():
    with pytest.raises(ValueError):
        from_dict(LearningConfig, {"optimizer": "sgd_bogus"})
    with pytest.raises(ValueError):
        from_dict(EvalConfig, {"top_k": [0]})
    with pytest.raises(ValueError):
        from_dict(LearningConfig, {"lr": -1.0})


def test_machine_paths_resolution(tmp_path, monkeypatch):
    """Hostname→root maps from the user paths file (reference data_paths.py)."""
    import socket
    import yaml as _yaml

    import sibrar_tpu.config.paths as paths

    pf = tmp_path / "paths.yml"
    with open(pf, "w") as fh:
        _yaml.safe_dump({"machines": {
            socket.gethostname(): {"data": "/mnt/data", "results": "/mnt/res"},
            "default": {"data": "/d", "results": "/r"},
        }}, fh)
    monkeypatch.setattr(paths, "_PATHS_FILE", str(pf))
    monkeypatch.delenv("SIBRAR_DATA_ROOT", raising=False)
    assert paths.get_data_root() == "/mnt/data"
    assert paths.get_results_root() == "/mnt/res"
    assert paths.get_dataset_path("ml1m", "cold_start_item") == \
        "/mnt/data/ml1m/cold_start_item"
    # env var beats the file
    monkeypatch.setenv("SIBRAR_DATA_ROOT", "/env")
    assert paths.get_dataset_path("ml1m", "random").startswith("/env/")


def test_update_nested_dict_none_section_and_scalar_intermediate():
    """An empty YAML section header (None) accepts nested overrides; a scalar
    intermediate raises a NAMED error instead of an opaque TypeError."""
    import pytest as _pytest

    from sibrar_tpu.config.loader import update_nested_dict

    d = {"learn": None}  # `learn:` with no body parses to None
    update_nested_dict(d, "learn.lr", 0.01)
    assert d == {"learn": {"lr": 0.01}}
    d2 = {"learn": 3}
    with _pytest.raises(ValueError, match="learn"):
        update_nested_dict(d2, "learn.lr", 0.01)
