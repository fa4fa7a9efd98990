"""TPU probe: bisect score_native_wmax via trace-profiled device-op times.

Standalone wall-clock micro-probes lie through the tunnel (0.03 ms for a
2 GB write — see dev notes); per-op durations parsed from a
jax.profiler.trace don't. Each variant's pallas_call gets its own name so
the trace rows are unambiguous; a sum-consumer forces materialization.

Usage: python tools/probe_gemm_bisect.py VARIANT [C] — VARIANT in
full|noscores|nowmax|xla|wmax_contig (wmax out block contiguous in the
grid's fast axis: 3-D [NJ, nwb, tb] at (j, 0, i) vs the production
[NW, B] at (j, i) — isolates the leading-dim-stride write cost).
"""
import collections
import functools
import glob
import gzip
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


def device_op_ms(trace_dir, n_iters):
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    device_pids = {p for p, n in pid_names.items() if "TPU" in n}
    by = collections.defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and "dur" in e and e.get("pid") in device_pids:
            by[e.get("name", "?")] += e["dur"]
    return {k: round(v / 1000 / n_iters, 3)
            for k, v in sorted(by.items(), key=lambda kv: -kv[1])[:6]}


def main():
    mode = sys.argv[1]
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 501_760
    b, d = 1024, 256
    window, tb, bc = 128, 1024, 1024
    nwb = bc // window
    nj = c // bc

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def dot(u_ref, it_ref):
        return lax.dot_general(u_ref[:], it_ref[:], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)

    def k_full(u_ref, it_ref, s_ref, wmaxt_ref):
        blk = dot(u_ref, it_ref)
        s_ref[...] = blk
        for w in range(nwb):
            wmaxt_ref[w, :] = blk[:, w * window:(w + 1) * window].max(axis=1)

    def k_noscores(u_ref, it_ref, wmaxt_ref):
        blk = dot(u_ref, it_ref)
        for w in range(nwb):
            wmaxt_ref[w, :] = blk[:, w * window:(w + 1) * window].max(axis=1)

    def k_nowmax(u_ref, it_ref, s_ref):
        s_ref[...] = dot(u_ref, it_ref)

    def k_wmax3d(u_ref, it_ref, s_ref, wmaxt_ref):
        blk = dot(u_ref, it_ref)
        s_ref[...] = blk
        for w in range(nwb):
            wmaxt_ref[0, w, :] = blk[:, w * window:(w + 1) * window].max(axis=1)

    def k_wmax_T(u_ref, it_ref, s_ref, wmaxt_ref):
        # window_max's spelling (keepdims maxima concatenated on LANES, users
        # staying on sublanes) + ONE [tb, nwb]->[nwb, tb] relayout per step,
        # instead of nwb per-window sublane->lane relayouts
        blk = dot(u_ref, it_ref)
        s_ref[...] = blk
        cols = [blk[:, w * window:(w + 1) * window].max(axis=1, keepdims=True)
                for w in range(nwb)]
        wmaxt_ref[...] = jnp.concatenate(cols, axis=1).T

    def k_wmax_lanes(u_ref, it_ref, s_ref, wmax_ref):
        # windows stay on lanes end-to-end: out block [tb, nwb] — lane dim 8,
        # offset j*8 (NOT 128-aligned; expected to fail Mosaic's lane rule —
        # probe documents the edge)
        blk = dot(u_ref, it_ref)
        s_ref[...] = blk
        cols = [blk[:, w * window:(w + 1) * window].max(axis=1, keepdims=True)
                for w in range(nwb)]
        wmax_ref[...] = jnp.concatenate(cols, axis=1)

    in_specs = [
        pl.BlockSpec((tb, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bc, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
    ]
    s_spec = pl.BlockSpec((tb, bc), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((nwb, tb), lambda i, j: (j, i),
                          memory_space=pltpu.VMEM)
    w3_spec = pl.BlockSpec((1, nwb, tb), lambda i, j: (j, 0, i),
                           memory_space=pltpu.VMEM)
    s_shape = jax.ShapeDtypeStruct((b, c), jnp.float32)
    w_shape = jax.ShapeDtypeStruct((c // window, b), jnp.float32)
    w3_shape = jax.ShapeDtypeStruct((nj, nwb, tb), jnp.float32)

    conf = {
        "full": (k_full, [s_spec, w_spec], [s_shape, w_shape]),
        "noscores": (k_noscores, [w_spec], [w_shape]),
        "nowmax": (k_nowmax, [s_spec], [s_shape]),
        "wmax_contig": (k_wmax3d, [s_spec, w3_spec], [s_shape, w3_shape]),
        "wmax_T": (k_wmax_T, [s_spec, w_spec], [s_shape, w_shape]),
        "wmax_lanes": (k_wmax_lanes,
                       [s_spec, pl.BlockSpec((tb, nwb), lambda i, j: (i, j),
                                             memory_space=pltpu.VMEM)],
                       [s_shape,
                        jax.ShapeDtypeStruct((b, c // window), jnp.float32)]),
    }

    if mode == "xla":
        @jax.jit
        def step(u, it):
            s = u @ it.T
            return s[:, ::4096].sum()
    else:
        kern, out_specs, out_shapes = conf[mode]

        @jax.jit
        def step(u, it):
            r = pl.pallas_call(kern, grid=(b // tb, nj),
                               in_specs=in_specs, out_specs=out_specs,
                               out_shape=out_shapes)(u, it)
            r = r if isinstance(r, (tuple, list)) else (r,)
            return sum(x[..., ::512].sum() for x in r)

    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    it = jnp.asarray(rng.normal(size=(c, d)).astype(np.float32))
    s = step(u, it)
    s.block_until_ready()
    trace_dir = f"/tmp/jaxtrace_gemm_{mode}"
    n_iters = 8
    with jax.profiler.trace(trace_dir):
        for _ in range(n_iters):
            s = step(u, it)
        s.block_until_ready()
    print(json.dumps({"mode": mode, "C": c,
                      "device_ops_ms_per_it": device_op_ms(trace_dir, n_iters)}))


if __name__ == "__main__":
    main()
