"""TPU probe: full evaluate_model wall time, dot fast path on/off.

Usage: python tools/probe_eval.py {dot|scores}
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

from sibrar_tpu.config.schema import EvalConfig  # noqa: E402
from sibrar_tpu.data.dataset import RecDataset  # noqa: E402
from sibrar_tpu.eval.evaluator import FullEvaluator, evaluate_model  # noqa: E402

N_USERS = int(os.environ.get("PE_USERS", 12_288))
C, D, BS = 100_352, 256, 1024


def main():
    mode = sys.argv[1]
    rng = np.random.default_rng(0)
    pairs = np.unique(np.stack([rng.integers(0, N_USERS, 800_000),
                                rng.integers(0, C, 800_000)], 1), axis=0)
    ds = RecDataset(split_set="val", n_users=N_USERS, n_items=C,
                    interactions=pairs[:200_000].astype(np.int64),
                    train_interactions=pairs[200_000:].astype(np.int64))
    ev = FullEvaluator(EvalConfig(top_k=[10, 100], compute_std=False), ds)

    u_mat = jnp.asarray(rng.standard_normal((N_USERS, D)).astype(np.float32))
    items = jnp.asarray(rng.standard_normal((C, D)).astype(np.float32))
    score_fn = lambda u: u_mat[u] @ items.T  # noqa: E731
    if mode == "dot":
        score_fn.dot_parts = (lambda u: u_mat[u], items)

    t0 = time.perf_counter()
    m = evaluate_model(score_fn, ev, batch_size=BS)
    compile_and_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    m = evaluate_model(score_fn, ev, batch_size=BS)
    warm = time.perf_counter() - t0
    print(json.dumps({"mode": mode, "warm_s": round(warm, 3),
                      "first_s": round(compile_and_run, 1),
                      "ndcg10": round(m["ndcg@10"], 5),
                      "users_per_s": round(N_USERS / warm)}))


if __name__ == "__main__":
    main()
