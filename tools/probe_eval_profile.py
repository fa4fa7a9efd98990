"""TPU probe: op-level profile of the large-catalog (C≈500k) eval step.

Same chain as `bench.bench_jax_large` (score matmul + masked_topk auto →
margin-path peel), wrapped in `jax.profiler.trace`; parses the trace.json.gz
and prints top device ops by total duration.

Usage: python tools/probe_eval_profile.py [top_n] [catalog_size]
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
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    import bench

    from sibrar_tpu.ops.sparse import DeviceCSR
    from sibrar_tpu.ops.topk import masked_topk

    B, D, K, EXCL = bench.B, bench.D, bench.K, bench.EXCL
    C = int(sys.argv[2]) if len(sys.argv) > 2 else bench.C_LARGE
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    it = jnp.asarray(rng.normal(size=(C, D)).astype(np.float32))
    cols = np.sort(rng.integers(0, C, size=(B, EXCL)), axis=1).astype(np.int32)
    indptr = np.arange(B + 1, dtype=np.int32) * EXCL
    csr = DeviceCSR(indptr=jnp.asarray(indptr), indices=jnp.asarray(cols.ravel()),
                    n_rows=B, n_cols=C, max_row_len=EXCL)
    rows = jnp.arange(B, dtype=jnp.int32)

    @jax.jit
    def step(u, it):
        scores = u @ it.T
        return masked_topk(scores, csr, rows, K, method="auto")

    v, i = step(u, it)
    v.block_until_ready()

    trace_dir = "/tmp/jaxtrace_eval"
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
    print(f"total device-op time: {total/1000:.3f} ms over {n_iters} iters")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:top_n]:
        a = args_of.get(name, {})
        src = a.get("source", "")
        ln = a.get("long_name", "")[:90]
        print(f"{dur/1000/n_iters:8.3f} ms/it x{counts[name]:<4d} {name[:40]:42s} {src}")
        if ln:
            print(f"          {ln}")


if __name__ == "__main__":
    main()
