"""Headline benchmark: full-catalog scored-items/sec/chip (eval hot path).

The reference's evaluation bottleneck is the per-user-batch full-catalog scoring
loop (`/root/reference/eval/eval.py:207-222`): einsum scores → exclusion mask →
top-k. Here that whole chain is one jitted device program using the exact
two-phase windowed top-k with candidate-phase exclusion (`sibrar_tpu/ops/topk.py`
— ~2.9× over naive scatter + lax.top_k on v5e), benchmarked at a realistic
catalog scale. The baseline is the same semantic chain in eager torch (the
reference's stack; CPU build in this image — its GPU numbers are unpublished,
SURVEY.md §6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

B = 1024         # user batch (measured optimum on v5e vs 512)
C = 100_352      # catalog size (Onion-scale), multiple of 128 lanes
D = 256          # representation dim
K = 100          # max metric cutoff
EXCL = 64        # excluded (train) items per user
ITERS = 30


def bench_jax() -> float:
    from sibrar_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from sibrar_tpu.ops.sparse import DeviceCSR
    from sibrar_tpu.ops.topk import masked_topk

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    it = jnp.asarray(rng.normal(size=(C, D)).astype(np.float32))
    # exclusion CSR: EXCL sorted catalog positions per user
    cols = np.sort(rng.integers(0, C, size=(B, EXCL)), axis=1).astype(np.int32)
    indptr = np.arange(B + 1, dtype=np.int32) * EXCL
    csr = DeviceCSR(indptr=jnp.asarray(indptr), indices=jnp.asarray(cols.ravel()),
                    n_rows=B, n_cols=C, max_row_len=EXCL)
    rows = jnp.arange(B, dtype=jnp.int32)

    @jax.jit
    def step(u):
        scores = u @ it.T
        return masked_topk(scores, csr, rows, K, method="auto")

    v, i = step(u)
    v.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        v, i = step(u)
    v.block_until_ready()
    dt = time.perf_counter() - t0
    return B * C * ITERS / dt


def bench_torch() -> float:
    try:
        import torch
    except ImportError:
        return float("nan")
    torch.manual_seed(0)
    iters = 3
    u = torch.randn(B, D)
    it = torch.randn(C, D)
    cols = torch.randint(0, C, (B, EXCL))

    def step():
        scores = u @ it.T
        scores.scatter_(1, cols, float("-inf"))
        return torch.topk(scores, K, dim=1)

    step()
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = time.perf_counter() - t0
    return B * C * iters / dt


def main():
    ours = bench_jax()
    base = bench_torch()
    print(json.dumps({
        "metric": "full-catalog items scored/sec/chip (einsum+mask+exact top-k)",
        "value": round(ours),
        "unit": "items/s",
        "vs_baseline": round(ours / base, 2) if base == base else None,
    }))


if __name__ == "__main__":
    main()
