"""TPU probe: packed-key single-operand sort vs approx_max_k vs top_k for
window SELECTION ([B, NW] f32 window maxima -> top-m window ids).

Both lax.top_k and lax.approx_max_k lower to a full VARIADIC (f32, s32)
sort of the whole [B, NW] array on TPU (trace-verified: approx_top_k.2 is
a `sort` HLO, 1.63 ms at NW=3920/m=168 in the 500k dot chain). The
packed-key trick sorts HALF the data with no payload: map wmax f32 ->
sortable u32 (sign-flip transform: monotone total order, no NaN/-inf
hazards), clear the low ceil(log2(NW)) bits (monotone truncation), OR the
lane id into them. One single-operand u32 sort; the window id decodes
from the low bits of the top m lanes. Selection happens in a quantized
domain (11 mantissa bits at NW=3920) so the chain's exactness guard must
compare true f32 wmax post-hoc.

Timing is trace-based (wall micro-probes through the tunnel lie — this
probe's first wall-clock version reported 0.0026 ms for a 16 MB sort).

Usage: python tools/probe_packed_select.py <variant: packed|topk|approx|all> [NW] [m]
(one variant per process on cold caches — 3 cold compiles blow the tunnel's
10-min window; `all` is fine once the compilation cache is warm)
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
from jax import lax  # noqa: E402


def sortable_u32(x):
    """Monotone bijection f32 -> u32 (IEEE total order, -0 < +0)."""
    u = lax.bitcast_convert_type(x, jnp.uint32)
    flip = jnp.where(u >> 31 == 1, jnp.uint32(0xFFFFFFFF),
                     jnp.uint32(0x80000000))
    return u ^ flip


def packed_select(x, m, bits):
    b, nw = x.shape
    mask = jnp.uint32((1 << bits) - 1)
    key = (sortable_u32(x) & ~mask) | jnp.arange(nw, dtype=jnp.uint32)
    skey = lax.sort(key, dimension=1)  # ascending
    top = lax.slice_in_dim(skey, nw - m, nw, axis=1)  # [B, m]
    widx = (top & mask).astype(jnp.int32)
    return jnp.sort(widx, axis=1), skey[:, nw - m]  # ids + threshold key


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    nw = int(sys.argv[2]) if len(sys.argv) > 2 else 3920
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 168
    b = 1024
    bits = max(1, (nw - 1).bit_length())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, nw)).astype(np.float32))

    @jax.jit
    def run_packed(x):
        widx, th = packed_select(x, m, bits)
        return widx, th

    @jax.jit
    def run_topk(x):
        return lax.top_k(x, m)

    @jax.jit
    def run_approx(x):
        return lax.approx_max_k(x, m, recall_target=0.95)

    fns = {"packed": run_packed, "topk": run_topk, "approx": run_approx}
    if which != "all":
        fns = {which: fns[which]}
    for f in fns.values():
        jax.block_until_ready(f(x))  # compile outside the trace

    trace_dir = "/tmp/jaxtrace_sel"
    n_iters = 8
    with jax.profiler.trace(trace_dir):
        for f in fns.values():
            for _ in range(n_iters):
                r = f(x)
            jax.block_until_ready(r)

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))
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
    print(f"NW={nw} m={m} bits={bits}")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        a = args_of.get(name, {})
        src = a.get("source", "")
        print(f"{dur/1000/n_iters:8.3f} ms/it x{counts[name]:<4d} "
              f"{name[:46]:48s} {src}")

    if which == "all":
        # correctness: packed selection contains the exact top-m up to
        # quantization ties at the boundary
        _, ie = run_topk(x)
        ia, _ = run_packed(x)
        ie, ia = np.asarray(ie), np.asarray(ia)
        rec = np.mean([len(np.intersect1d(ie[r], ia[r])) / m
                       for r in range(b)])
        print(json.dumps({"overlap": round(float(rec), 5)}))


if __name__ == "__main__":
    main()
