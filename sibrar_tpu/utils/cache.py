"""Persistent XLA compilation cache.

The reference has nothing comparable (eager torch); for a jit-compiled
framework, first-compile latency dominates short runs and sweeps (each sweep
trial re-jits the train epoch). Enabling JAX's persistent compilation cache
makes recompiles of identical programs near-free across processes — especially
valuable when compilation goes through a remote-compile tunnel.
"""
from __future__ import annotations

import logging
import os

_DEFAULT_DIR = os.environ.get(
    "SIBRAR_COMPILATION_CACHE", os.path.expanduser("~/.cache/sibrar_tpu/xla"))


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Turn on the persistent compilation cache; returns the dir (or None on
    failure). Safe to call multiple times."""
    import jax

    cache_dir = cache_dir or _DEFAULT_DIR
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return cache_dir
    except Exception as e:  # older jax versions / read-only fs
        logging.getLogger(__name__).warning(
            "could not enable persistent compilation cache: %s", e)
        return None
