"""Layered YAML/JSON config loading with `base_configs` inheritance.

Reproduces the semantics of the reference config system
(`/root/reference/conf/conf_parser.py:109-137` and
`/root/reference/data/data_utils.py:99-124`):

- a config file may list ``base_configs`` (str or list of str); relative paths
  resolve against the directory of the *including* file;
- bases are merged recursively; **later bases take precedence over earlier
  bases**, and the leaf config always wins;
- the merge is a deep merge: dict values merge key-wise, any non-dict value
  (including lists) is replaced wholesale by the higher-precedence side.
"""
from __future__ import annotations

import copy
import json
import os
from typing import Any

import yaml


def merge_dicts(first: dict, second: dict) -> dict:
    """Deep-merge two dicts; on conflicts of non-dict values `second` wins."""
    out: dict = {}
    for k in first.keys() | second.keys():
        if k in first and k in second:
            if isinstance(first[k], dict) and isinstance(second[k], dict):
                out[k] = merge_dicts(first[k], second[k])
            else:
                out[k] = copy.deepcopy(second[k])
        elif k in first:
            out[k] = copy.deepcopy(first[k])
        else:
            out[k] = copy.deepcopy(second[k])
    return out


def parse_conf_file(config_path: str) -> dict:
    if not os.path.isfile(config_path):
        raise FileNotFoundError(f'Configuration file "{config_path}" not found!')
    _, ext = os.path.splitext(config_path)
    with open(config_path, "r") as fh:
        if ext in (".yml", ".yaml"):
            return yaml.safe_load(fh) or {}
        if ext == ".json":
            return json.load(fh)
    raise ValueError(f'Config files of type "{ext}" are not supported (.yml/.yaml/.json).')


def extend_by_base_configs(config: dict, config_path: str | None = None) -> dict:
    """Resolve and fold in the ``base_configs`` chain of `config`."""
    all_base: dict = {}
    base_paths = config.get("base_configs")
    if base_paths:
        if isinstance(base_paths, str):
            base_paths = [base_paths]
        for base_path in base_paths:
            if not os.path.isabs(base_path) and config_path is not None:
                base_path = os.path.join(os.path.dirname(config_path), base_path)
            base = load_config_dict(base_path)
            # later bases beat earlier bases
            all_base = merge_dicts(all_base, base)
    # the leaf config always wins
    merged = merge_dicts(all_base, config)
    merged.pop("base_configs", None)
    return merged


def load_config_dict(config_path: str, ignore_base_configs: bool = False) -> dict:
    config = parse_conf_file(config_path)
    if not ignore_base_configs:
        config = extend_by_base_configs(config, config_path)
    return config


def update_nested_dict(d: dict, key: str, value: Any) -> None:
    """Set ``d['a']['b']['c'] = value`` given key ``'a.b.c'``, creating levels.

    An empty YAML section header (``learn:`` parses to None) is treated as an
    empty dict; a SCALAR intermediate raises a named error — both previously
    died with an opaque 'NoneType/... does not support item assignment' on a
    CLI override like ``-o learn.lr=0.01``."""
    keys = key.split(".")
    cur = d
    for i, k in enumerate(keys[:-1]):
        nxt = cur.setdefault(k, {})
        if nxt is None:  # empty YAML section header
            nxt = {}
            cur[k] = nxt
        elif not isinstance(nxt, dict):
            raise ValueError(
                f"config key {'.'.join(keys[:i + 1])!r} holds a scalar "
                f"({nxt!r}); cannot set nested key {key!r}")
        cur = nxt
    cur[keys[-1]] = value


def nested_dict_get(d: dict, key: str, default: Any = None) -> Any:
    keys = key.split(".")
    cur: Any = d
    for k in keys[:-1]:
        nxt = cur.get(k) if isinstance(cur, dict) else None
        if not isinstance(nxt, dict):
            return default
        cur = nxt
    return cur.get(keys[-1], default) if isinstance(cur, dict) else default


def get_config(config_path: str, algorithm: str | None = None,
               dataset_name: str | None = None, split_type: str | None = None,
               overrides: dict | None = None):
    """Load a config file into a typed `ExperimentConfig`.

    Mirrors the reference `get_config` (`/root/reference/conf/conf_parser.py:12-50`):
    resolves the `base_configs` inheritance chain, then applies CLI-provided
    algorithm/dataset/split — which are authoritative: a conflicting value in
    the file is an error (reference conf_parser.py:85-87).
    """
    from sibrar_tpu.config.schema import ExperimentConfig, from_dict
    from sibrar_tpu.utils.misc import generate_id

    conf = load_config_dict(config_path)
    for key, value in (("algorithm", algorithm), ("dataset_name", dataset_name),
                       ("split_type", split_type)):
        if value is None:
            continue
        if key in conf and conf[key] != value:
            raise ValueError(
                f"config file sets {key}={conf[key]!r} but the command line "
                f"says {value!r}; the command line is authoritative — remove "
                f"the key from the file or change the flag")
        conf[key] = value
    for key, value in (overrides or {}).items():
        update_nested_dict(conf, key, value)
    conf.setdefault("run_id", generate_id(conf.get("algorithm")))
    return from_dict(ExperimentConfig, conf)


def yaml_save(file_path: str, data: Any) -> None:
    with open(file_path, "w") as fh:
        yaml.safe_dump(data, fh)


def save_config(conf_dir: str, conf: dict) -> None:
    yaml_save(os.path.join(conf_dir, "conf.yml"), conf)
