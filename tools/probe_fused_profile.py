"""TPU probe: op-level profile of the FUSED dot eval chain.

Covers both single-chip variants: `peel_masked_topk` (windowed GEMM
epilogue, the C ≲ 192k fast path) and `peel_masked_topk_dot` (native-layout
GEMM epilogue + chunked peel, any C). Same trace-parsing recipe as
`tools/probe_eval_profile.py` (wall-clock micro-probes through the tunnel
lie; device-op durations from jax.profiler traces don't).

Usage: python tools/probe_fused_profile.py [top_n] [catalog_size] [variant]
  variant: auto (default — same dispatch as the evaluator) | fused | dot
"""
import collections
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


def main():
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    import bench

    from sibrar_tpu.ops.pallas_peel import (
        peel_masked_topk,
        peel_masked_topk_dot,
        peel_viable,
    )

    B, D, K, EXCL = bench.B, bench.D, bench.K, bench.EXCL
    C = int(sys.argv[2]) if len(sys.argv) > 2 else bench.C
    variant = sys.argv[3] if len(sys.argv) > 3 else "auto"
    if variant == "auto":
        variant = "fused" if peel_viable(C, K, EXCL, fused=True) else "dot"
    fn = peel_masked_topk if variant == "fused" else peel_masked_topk_dot

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    it = jnp.asarray(rng.normal(size=(C, D)).astype(np.float32))
    cols = jnp.asarray(np.sort(rng.integers(0, C, size=(B, EXCL)),
                               axis=1).astype(np.int32))
    mask = jnp.ones((B, EXCL), bool)

    @jax.jit
    def step(u, it):
        return fn(u, it, cols, mask, K)

    v, i = step(u, it)
    v.block_until_ready()

    trace_dir = "/tmp/jaxtrace_fused"
    n_iters = 8
    with jax.profiler.trace(trace_dir):
        for _ in range(n_iters):
            v, i = step(u, it)
        v.block_until_ready()

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        print("NO TRACE FILES under", trace_dir)
        return
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {pid for pid, n in pid_names.items() if "TPU" in n}
    by_name = collections.defaultdict(float)
    counts = collections.defaultdict(int)
    args_of = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        by_name[name] += e["dur"]
        counts[name] += 1
        if name not in args_of:
            args_of[name] = e.get("args", {})
    total = sum(by_name.values())
    print(f"variant={variant} C={C}")
    print(f"total device-op time: {total/1000:.3f} ms over {n_iters} iters "
          f"({total/1000/n_iters:.3f} ms/it)")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:top_n]:
        a = args_of.get(name, {})
        src = a.get("source", "")
        ln = a.get("long_name", "")[:90]
        print(f"{dur/1000/n_iters:8.3f} ms/it x{counts[name]:<4d} "
              f"{name[:40]:42s} {src}")
        if ln:
            print(f"          {ln}")


if __name__ == "__main__":
    main()
