"""TPU probe: whole-evaluation wall time through the REAL driver at scale.

Builds a synthetic split with an Onion-scale catalog, attaches dot_parts,
and runs `evaluate_model` end-to-end (fused lax.map, dot fast path — the
scores-variant peel beyond the fused VMEM gate). Reports wall time, metric
finiteness, and whether any peel-exactness redo fired.

Usage: python tools/probe_eval_e2e.py [n_items] [n_users]
"""
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from sibrar_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    n_items = int(sys.argv[1]) if len(sys.argv) > 1 else 501_760
    n_users = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    from sibrar_tpu.config.schema import EvalConfig
    from sibrar_tpu.data.dataset import RecDataset
    from sibrar_tpu.eval.evaluator import FullEvaluator, evaluate_model

    # uniform-random interactions (make_synthetic_splits densifies a
    # [n_users, n_items] matrix — infeasible at 500k items)
    rng0 = np.random.default_rng(7)
    pairs = np.unique(np.stack([
        rng0.integers(0, n_users, n_users * 30),
        rng0.integers(0, n_items, n_users * 30)], axis=1), axis=0)
    n_tr = int(0.8 * len(pairs))
    val = RecDataset(
        split_set="val", n_users=n_users, n_items=n_items,
        interactions=pairs[n_tr:].astype(np.int64),
        train_interactions=pairs[:n_tr].astype(np.int64),
        item_features={}, user_features={})
    ev = FullEvaluator(EvalConfig(top_k=[10, 100]),
                       val, evaluator_name="val")

    rng = np.random.default_rng(0)
    d = 256
    items_np = rng.standard_normal((val.n_items_in_split, d)).astype(np.float32)
    # plant signal: each user's vector points at the mean of their VAL items
    # (+noise) so ndcg must come out well above chance — a zero here would
    # mean a catalog/id mapping bug at this scale, not bad luck
    u_np = rng.standard_normal((val.n_users, d)).astype(np.float32)
    vu, vi = pairs[n_tr:, 0], pairs[n_tr:, 1]
    np.add.at(u_np, vu, 3.0 * items_np[vi])
    u_mat = jnp.asarray(u_np)
    items = jnp.asarray(items_np)

    def score_fn(u):
        return u_mat[u] @ items.T

    score_fn.dot_parts = (lambda u: u_mat[u], items)

    redo = {"count": 0}

    class H(logging.Handler):
        def emit(self, record):
            if "exactness check tripped" in record.getMessage():
                redo["count"] += 1

    logging.getLogger("sibrar_tpu.eval.evaluator").addHandler(H())

    res = evaluate_model(score_fn, ev, batch_size=1024)  # compile + run
    ev2 = FullEvaluator(EvalConfig(top_k=[10, 100]),
                        val, evaluator_name="val")
    t0 = time.perf_counter()
    res = evaluate_model(score_fn, ev2, batch_size=1024)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "n_items": n_items, "n_users": int(val.n_users),
        "wall_s": round(dt, 3),
        "items_per_sec": round(val.n_users * n_items / dt),
        "ndcg@10": round(float(res["val/ndcg@10"]), 6),
        "finite": bool(np.isfinite(res["val/ndcg@10"])),
        "redo_logs": redo["count"],
    }))


if __name__ == "__main__":
    main()
