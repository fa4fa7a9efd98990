"""TPU probe: which peel exactness check trips on the probe_eval workload.

Usage: PE_USERS=4096 python tools/probe_checks.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from sibrar_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from sibrar_tpu.config.schema import EvalConfig  # noqa: E402
from sibrar_tpu.data.dataset import RecDataset  # noqa: E402
from sibrar_tpu.eval.evaluator import FullEvaluator  # noqa: E402
from sibrar_tpu.ops.pallas_peel import (  # noqa: E402
    _NEG,
    _PEELED,
    gather_score_windows,
    gather_subwindows,
    peel_values,
)
from sibrar_tpu.ops.sparse import csr_row_gather  # noqa: E402

N_USERS = int(os.environ.get("PE_USERS", 4096))
C, D, K, T, W = 100_352, 256, 100, 12, 128


def main():
    rng = np.random.default_rng(0)
    pairs = np.unique(np.stack([rng.integers(0, N_USERS, 800_000),
                                rng.integers(0, C, 800_000)], 1), axis=0)
    ds = RecDataset(split_set="val", n_users=N_USERS, n_items=C,
                    interactions=pairs[:200_000].astype(np.int64),
                    train_interactions=pairs[200_000:].astype(np.int64))
    ev = FullEvaluator(EvalConfig(top_k=[10, 100], compute_std=False), ds)
    data = ev.data
    E = data.exclude_csr.max_row_len
    u_mat = jnp.asarray(rng.standard_normal((N_USERS, D)).astype(np.float32))
    items = jnp.asarray(rng.standard_normal((C, D)).astype(np.float32))
    u = jnp.asarray(np.asarray(data.users_in_split)[:1024], jnp.int32)

    @jax.jit
    def run(u):
        scores = u_mat[u] @ items.T
        # mirror peel_masked_topk_scores (tb=256 pad is a no-op at B=1024)
        excl_cols, excl_mask = csr_row_gather(data.exclude_csr, u)
        b, c = scores.shape
        cp = -(-c // 1024) * 1024
        if cp != c:
            scores = jnp.pad(scores, ((0, 0), (0, cp - c)),
                             constant_values=_NEG)
        nw = cp // W
        wmax = scores.reshape(b, nw, W).max(-1)
        padded = nw * W > c
        if padded:
            win_ok = (jnp.arange(nw, dtype=jnp.int32) * W) < c
            wmax = jnp.where(win_ok[None, :], wmax, _NEG)
        e = excl_cols.shape[1]
        m = min(K + e + (1 if padded else 0), nw)
        _, widx = lax.top_k(wmax, m)
        g = gather_score_windows(scores, widx)
        excl_w = excl_cols // W
        oh_s = ((excl_w[:, :, None] == widx[:, None, :])
                & excl_mask[:, :, None]).astype(jnp.float32)
        oh_l = (excl_cols[:, :, None] % W
                == jnp.arange(W, dtype=jnp.int32)).astype(jnp.float32)
        dead = jnp.einsum("bes,bel->bsl", oh_s, oh_l) > 0.0
        if padded:
            gid = (widx[:, :, None] * W
                   + lax.broadcasted_iota(jnp.int32, (b, m, W), 2))
            dead = dead | (gid >= c)
        g = jnp.where(dead, _PEELED, g)
        vals = peel_values(g.reshape(b * m, W), T).reshape(b, m, T)
        v, p = lax.top_k(vals.reshape(b, m * T), K)
        wslot = p // T
        rows = gather_subwindows(g, wslot)
        hit = rows == v[:, :, None]
        n_hit = jnp.sum(hit, axis=-1)
        complete_pu = jnp.all(vals[:, :, T - 1] <= v[:, K - 1:K], axis=1)
        unique_pu = jnp.all(n_hit == 1, axis=1)
        live_pu = jnp.all(v > _PEELED, axis=1)
        worst = jnp.max(vals[:, :, T - 1] - v[:, K - 1:K])
        return (jnp.sum(~complete_pu), jnp.sum(~unique_pu), jnp.sum(~live_pu),
                jnp.min(n_hit), jnp.max(n_hit), worst, m)

    nc, nu, nl, mn, mx, worst, m = run(u)
    print(json.dumps({
        "E": int(E), "m": int(np.asarray(m)) if hasattr(m, "shape") else m,
        "users_incomplete": int(nc), "users_nonunique": int(nu),
        "users_dead": int(nl), "n_hit_min": int(mn), "n_hit_max": int(mx),
        "worst_margin": float(worst)}))


if __name__ == "__main__":
    main()
