"""Multi-host (pod) initialization and hierarchical collectives notes.

The reference is single-process (SURVEY.md §2.9). For multi-host TPU pods the
entry point is `jax.distributed.initialize`, after which the mesh in
`parallel/mesh.py` spans every chip in the pod: keep the `item` axis within a
slice (its all-gathers ride ICI) and put the `data` axis across hosts (gradient
all-reduces tolerate DCN), which is what `make_mesh`'s row-major device order
yields when `jax.devices()` enumerates slice-major.
"""
from __future__ import annotations

import logging
import os
from typing import Optional


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialize multi-host JAX if the environment calls for it.

    No-ops (returns False) for single-process runs: TPU pod environments
    advertise themselves via standard env vars which
    `jax.distributed.initialize` auto-detects; explicit args override.
    """
    import jax

    explicit = coordinator_address is not None
    # NOTE: TPU_WORKER_HOSTNAMES is deliberately NOT a trigger — single-host
    # runtimes set it too (observed: sitecustomize pins it to "localhost")
    auto = any(v in os.environ for v in (
        "COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
        "JAX_COORDINATOR_ADDRESS"))
    if not (explicit or auto):
        return False
    # already-initialized check WITHOUT touching jax.process_count():
    # process_count() initializes the local backend, after which
    # jax.distributed.initialize refuses to run ("must be called before any
    # JAX computations") — the exact trap that made this module dead
    # scaffolding in r3
    try:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return True
    except ImportError:  # private-module layout changed; fall through
        pass
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        logging.getLogger(__name__).info(
            "jax.distributed initialized: process %d of %d",
            jax.process_index(), jax.process_count())
        return True
    except Exception as e:
        logging.getLogger(__name__).warning(
            "jax.distributed.initialize failed (%s); running single-process", e)
        return False
