"""TPU probe: steady-state serving latency of `sibrar_tpu.serve.Recommender`.

Builds a dot-product recommender at production scale and measures per-call
latency of `recommend` for a fixed user batch (the jitted step never
retraces). One jitted program.

Usage: python tools/probe_serve.py [C] [batch] [dtype] [selection]

dtype: float32 | bfloat16 | int8; selection: exact | approx
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from sibrar_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 100_352
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    dtype = sys.argv[3] if len(sys.argv) > 3 else None
    if dtype == "float32":
        dtype = None
    selection = sys.argv[4] if len(sys.argv) > 4 else "exact"
    n_users, d, k = 50_000, 256, 100
    from sibrar_tpu.data.dataset import RecDataset
    from sibrar_tpu.serve import Recommender

    rng = np.random.default_rng(3)
    pairs = np.unique(np.stack([
        rng.integers(0, n_users, 1_500_000),
        rng.integers(0, C, 1_500_000)], axis=1), axis=0)
    ds = RecDataset(split_set="val", n_users=n_users, n_items=C,
                    interactions=pairs[: len(pairs) // 5].astype(np.int64),
                    train_interactions=pairs[len(pairs) // 5:].astype(np.int64),
                    item_features={}, user_features={})

    u_mat = jnp.asarray(rng.standard_normal((n_users, d)).astype(np.float32))
    items = jnp.asarray(
        rng.standard_normal((ds.n_items_in_split, d)).astype(np.float32))

    def score_fn(u):
        return u_mat[u] @ items.T

    score_fn.dot_parts = (lambda u: u_mat[u], items)
    rec = Recommender(score_fn, ds, k=k, batch_size=bs, dtype=dtype,
                      selection=selection)

    users = rng.integers(0, n_users, bs).astype(np.int32)
    rec.recommend(users)  # compile + warm
    lat = []
    for i in range(30):
        batch = rng.integers(0, n_users, bs).astype(np.int32)
        t0 = time.perf_counter()
        rec.recommend(batch)
        lat.append(time.perf_counter() - t0)
    lat = np.array(lat) * 1e3
    print(json.dumps({
        "catalog": C, "batch": bs, "k": k, "dtype": dtype or "float32",
        "selection": selection,
        "p50_ms": round(float(np.percentile(lat, 50)), 2),
        "p95_ms": round(float(np.percentile(lat, 95)), 2),
        "users_per_sec": round(bs / (np.percentile(lat, 50) / 1e3)),
    }))


if __name__ == "__main__":
    main()
