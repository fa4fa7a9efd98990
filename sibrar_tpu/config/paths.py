"""Machine-specific dataset/results path resolution.

Parity target: `/root/reference/data_paths.py:10-96` — hostname/username maps
from machine names to data and results roots, plus the split-type directory
naming. Maps are loaded from an optional user file instead of being hardcoded
in source (the reference hardcodes its lab machines): `~/.sibrar_tpu/paths.yml`
or `$SIBRAR_PATHS_FILE`, with entries

    machines:
      my-tpu-vm:   {data: /data/recsys, results: /results/recsys}
      default:     {data: ./data,       results: ./results}
"""
from __future__ import annotations

import os
import socket
from typing import Optional

import yaml

from sibrar_tpu.config.schema import DatasetSplitType

_PATHS_FILE = os.environ.get(
    "SIBRAR_PATHS_FILE", os.path.expanduser("~/.sibrar_tpu/paths.yml"))


def _machine_entry() -> dict:
    if not os.path.exists(_PATHS_FILE):
        return {}
    with open(_PATHS_FILE) as fh:
        machines = (yaml.safe_load(fh) or {}).get("machines", {})
    host = socket.gethostname()
    return machines.get(host, machines.get("default", {}))


def get_data_root(default: str = "./data") -> str:
    return os.environ.get("SIBRAR_DATA_ROOT") or \
        _machine_entry().get("data", default)


def get_results_root(default: str = "./results") -> str:
    return os.environ.get("SIBRAR_RESULTS_ROOT") or \
        _machine_entry().get("results", default)


def get_dataset_path(dataset_name: str,
                     split_type: DatasetSplitType | str,
                     data_root: Optional[str] = None) -> str:
    """`{data_root}/{dataset}/{split_dir}` with the reference's split-dir
    naming (random_split / temporal_split / cold_start_{user,item,both})."""
    st = DatasetSplitType(split_type) if isinstance(split_type, str) else split_type
    return os.path.join(data_root or get_data_root(), dataset_name, st.dir_name)
