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

    if mode in ("batch", "topk", "hits", "cov", "posgather", "poscmp",
                "npos"):
        import jax
        from sibrar_tpu.ops.topk import masked_topk
        from sibrar_tpu.ops.sparse import csr_contains, csr_row_gather
        from sibrar_tpu.eval.metrics import coverage_flags, user_metrics_from_hits

        data = ev.data
        u = jnp.asarray(np.asarray(data.users_in_split)[:BS], jnp.int32)

        @jax.jit
        def step(u):
            scores = u_mat[u] @ items.T
            _, topk_idx, ok = masked_topk(scores, data.exclude_csr, u, ev.k_max,
                                          return_ok=True)
            if mode == "topk":
                return jnp.sum(topk_idx) + ok
            if mode == "posgather":
                pc, pm = csr_row_gather(data.pos_csr, u)
                return jnp.sum(topk_idx) + jnp.sum(pc) + jnp.sum(pm) + ok
            if mode == "poscmp":
                pc, pm = csr_row_gather(data.pos_csr, u)
                hit = ((topk_idx[..., None] == pc[:, None, :])
                       & pm[:, None, :]).any(-1)
                return jnp.sum(topk_idx) + jnp.sum(hit) + ok
            if mode == "npos":
                n_pos = data.pos_csr.indptr[u + 1] - data.pos_csr.indptr[u]
                return jnp.sum(topk_idx) + jnp.sum(n_pos) + ok
            from sibrar_tpu.ops.sparse import csr_contains_rows
            hits = csr_contains_rows(data.pos_csr, u, topk_idx
                                     ).astype(jnp.float32)
            n_pos = data.pos_csr.indptr[u + 1] - data.pos_csr.indptr[u]
            if mode == "hits":
                return jnp.sum(hits) + jnp.sum(n_pos)
            metrics = user_metrics_from_hits(hits, n_pos, ev.ks)
            if mode == "cov":
                cov = coverage_flags(topk_idx, ev.ks, C)
                return sum(jnp.sum(x) for x in cov.values())
            cov = coverage_flags(topk_idx, ev.ks, C)
            return (sum(jnp.sum(x) for x in metrics.values())
                    + sum(jnp.sum(x) for x in cov.values()) + ok)

        out = step(u)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(20):
            out = step(u)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 20
        print(json.dumps({"mode": mode, "ms_per_batch": round(dt * 1e3, 3)}))
        return

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
