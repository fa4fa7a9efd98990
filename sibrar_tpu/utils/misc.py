"""General utilities: run ids, seeding, result logging, stdout tee.

Parity targets: `/root/reference/utilities/utils.py:11-56` (generate_id,
reproducible, log_info_results, FunctionWrapper) and `/root/reference/data/tee.py`
(stdout duplication with exception capture). `row_wise_sample` (the reference's
modality sampler, utils.py:60-90) lives on-device instead:
`sibrar_tpu.data.sampling.sample_k_modalities`.
"""
from __future__ import annotations

import contextlib
import io
import logging
import random
import sys
import traceback
from datetime import datetime

import numpy as np


def generate_id(prefix: str | None = None, postfix: str | None = None) -> str:
    """Timestamped run id (reference utilities/utils.py:11-19)."""
    dtstr = datetime.now().strftime("%y%m%d-%H%M%S")
    parts = [p for p in (prefix, dtstr, postfix) if p]
    return "_".join(parts)


def reproducible(seed: int) -> None:
    """Seed every host-side RNG (reference utilities/utils.py:22-27).

    JAX randomness is explicit-key (threaded from this seed through the train
    state), so unlike torch there is no global device RNG to pin; numpy/python
    seeding covers host-side shuffles and synthetic data generation.
    """
    random.seed(seed)
    np.random.seed(seed)


def log_info_results(metrics: dict) -> None:
    """Log metrics at INFO level (reference utilities/utils.py:30-37)."""
    for key, value in metrics.items():
        logging.info(f"{key}: {value}")


class FunctionWrapper:
    """Pickle-friendly callable wrapper (reference utilities/utils.py:40-56)."""

    def __init__(self, function):
        self.function = function

    def __call__(self, *args, **kwargs):
        return self.function(*args, **kwargs)

    def __repr__(self):
        return f"FunctionWrapper({self.function!r})"


class Tee:
    """Duplicate stdout to a log file, capturing exceptions on exit
    (reference data/tee.py:10-66)."""

    def __init__(self, file_path: str):
        self.file_path = file_path
        self._file = None
        self._stdout = None

    def __enter__(self):
        self._file = open(self.file_path, "a")
        self._stdout = sys.stdout
        sys.stdout = self
        return self

    def __exit__(self, exc_type, exc_value, tb):
        if exc_type is not None:
            self._file.write(traceback.format_exc())
        sys.stdout = self._stdout
        self._file.close()
        return False

    def write(self, data):
        self._file.write(data)
        self._stdout.write(data)

    def flush(self):
        self._file.flush()
        self._stdout.flush()


@contextlib.contextmanager
def silence_stdout():
    """Suppress stdout inside the block (reference
    utilities/notebook_utils.py stdout silencers, used around chatty
    third-party loaders)."""
    sink = io.StringIO()
    with contextlib.redirect_stdout(sink):
        yield sink
