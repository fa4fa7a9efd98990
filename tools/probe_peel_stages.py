"""TPU probe: per-stage cost of the peel pipeline. Usage:
python probe_peel_stages.py {retile|wtopk|gather|peel|merge|mapback|full|okcheck}
"""
import json
import sys
import time

import numpy as np

from sibrar_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from sibrar_tpu.ops.pallas_peel import (  # noqa: E402
    gather_windows_rows,
    peel_masked_topk_scores,
    peel_rows,
)
from sibrar_tpu.ops.pallas_window import window_scores_from  # noqa: E402

B, C, D, K, T, ITERS = 1024, 100_352, 256, 100, 16, 30
M = K  # no margin (scatter-excluded scores)


def main():
    stage = sys.argv[1]
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    it = jnp.asarray(rng.normal(size=(C, D)).astype(np.float32))

    def pipeline(u, stage):
        scores = u @ it.T
        if stage == "matmul":
            return jnp.sum(scores)
        sw, wmax = window_scores_from(scores, tb=256, bc=1024)
        if stage == "retile":
            return jnp.sum(wmax) + jnp.sum(sw[0])
        _, widx = lax.top_k(wmax, M)
        if stage == "wtopk":
            return jnp.sum(widx)
        g = gather_windows_rows(sw, widx)
        if stage == "gather":
            return jnp.sum(g)
        vals_r, lanes_r = peel_rows(g.reshape(M * B, 128), T)
        if stage == "peel":
            return jnp.sum(vals_r) + jnp.sum(lanes_r)
        vals = vals_r.reshape(M, B, T).transpose(1, 0, 2)
        lanes = lanes_r.reshape(M, B, T).transpose(1, 0, 2)
        mvals = vals.reshape(B, M * T)
        v, p = lax.top_k(mvals, K)
        if stage == "merge":
            return jnp.sum(v) + jnp.sum(p)
        wslot = p // T
        oh_m = (wslot[:, :, None] == jnp.arange(M)).astype(jnp.float32)
        widx_sel = jnp.einsum("bkm,bm->bk", oh_m, widx.astype(jnp.float32))
        lanes_by_round = jnp.einsum("bkm,bmr->bkr", oh_m,
                                    lanes.astype(jnp.float32))
        oh_r = ((p % T)[:, :, None] == jnp.arange(T)).astype(jnp.float32)
        lane_sel = jnp.sum(oh_r * lanes_by_round, axis=-1)
        idx = (widx_sel * 128 + lane_sel).astype(jnp.int32)
        if stage == "mapback":
            return jnp.sum(v) + jnp.sum(idx)
        ok = jnp.all(vals[:, :, T - 1] <= v[:, K - 1:K])
        return jnp.sum(v) + jnp.sum(idx) + ok.astype(jnp.float32)

    if stage.startswith("peelvar"):
        # peel-kernel variants in the real producer chain:
        # peelvar:<rb>:<t>:<idx 0|1>
        _, rb, tt, track = stage.split(":")
        rb, tt, track = int(rb), int(tt), bool(int(track))
        import functools

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def var_kernel(x_ref, vals_ref, lanes_ref, *, t, w):
            cur = x_ref[...]
            lane_iota = lax.broadcasted_iota(jnp.int32, cur.shape, 1)
            vcols, lcols = [], []
            for r in range(t):
                v = cur.max(axis=1, keepdims=True)
                if track:
                    li = jnp.min(jnp.where(cur == v, lane_iota, w), axis=1,
                                 keepdims=True)
                    lcols.append(li)
                    if r + 1 < t:
                        cur = jnp.where(lane_iota == li, float("-inf"), cur)
                else:
                    if r + 1 < t:
                        cur = jnp.where(cur == v, float("-inf"), cur)
                vcols.append(v)
            vals_ref[...] = jnp.concatenate(vcols, axis=1)
            if track:
                lanes_ref[...] = jnp.concatenate(lcols, axis=1)
            else:
                lanes_ref[...] = jnp.zeros(lanes_ref.shape, jnp.int32)

        def var_peel(x, t):
            r_total, w = x.shape
            pad = (-r_total) % rb
            if pad:
                x = jnp.pad(x, ((0, pad), (0, 0)),
                            constant_values=float("-inf"))
            kern = functools.partial(var_kernel, t=t, w=w)
            vals, lanes = pl.pallas_call(
                kern,
                grid=((r_total + pad) // rb,),
                in_specs=[pl.BlockSpec((rb, w), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=[
                    pl.BlockSpec((rb, t), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rb, t), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((r_total + pad, t), jnp.float32),
                    jax.ShapeDtypeStruct((r_total + pad, t), jnp.int32),
                ],
            )(x)
            return vals[:r_total], lanes[:r_total]

        @jax.jit
        def step(u):
            scores = u @ it.T
            sw, wmax = window_scores_from(scores, tb=256, bc=1024)
            _, widx = lax.top_k(wmax, M)
            g = gather_windows_rows(sw, widx)
            vals_r, lanes_r = var_peel(g.reshape(B * M, 128), tt)
            return jnp.sum(vals_r) + jnp.sum(lanes_r)

        out = step(u)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = step(u)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / ITERS
        print(json.dumps({"stage": stage, "ms": round(dt * 1e3, 3)}))
        return

    if stage == "okcheck":
        @jax.jit
        def step(u):
            scores = u @ it.T
            sw, wmax = window_scores_from(scores, tb=256, bc=1024)
            _, widx = lax.top_k(wmax, M)
            g = gather_windows_rows(sw, widx)
            vals_r, _ = peel_rows(g.reshape(M * B, 128), T)
            vals = vals_r.reshape(M, B, T).transpose(1, 0, 2)
            v, _ = lax.top_k(vals.reshape(B, M * T), K)
            per_user = jnp.all(vals[:, :, T - 1] <= v[:, K - 1:K], axis=1)
            return per_user.mean()
        print(json.dumps({"stage": "okcheck",
                          "frac_users_ok": float(step(u))}))
        return

    if stage == "full":
        @jax.jit
        def step(u):
            scores = u @ it.T
            v, i = peel_masked_topk_scores(scores, None, None, K, t=T)
            return jnp.sum(v) + jnp.sum(i)
    else:
        @jax.jit
        def step(u):
            return pipeline(u, stage)

    out = step(u)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = step(u)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({"stage": stage, "ms": round(dt * 1e3, 3)}))


if __name__ == "__main__":
    main()
