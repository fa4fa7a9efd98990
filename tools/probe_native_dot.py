"""TPU probe: fused native scores+wmax epilogue vs the separate-pass chain.

Program 1: peel_masked_topk_dot (score_native_wmax -> peel) at bench shapes.
Program 2: XLA matmul -> peel_masked_topk_scores (the current chain).
Compares selections, reports bitwise score-matmul agreement, and prints
device-op times from a profiler trace for program 1.

Usage: python tools/probe_native_dot.py {chain|bits} [C]
  chain: correctness vs the separate-pass chain + trace profile (2 programs)
  bits : bitwise score agreement with the XLA matmul (2 programs)
(split per the <=2-jitted-programs-per-TPU-process rule in CLAUDE.md)
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
    mode = sys.argv[1] if len(sys.argv) > 1 else "chain"
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 501_760
    B, D, K, E = 1024, 256, 100, 64
    from sibrar_tpu.ops.pallas_peel import (
        peel_masked_topk_dot,
        peel_masked_topk_scores,
    )
    from sibrar_tpu.ops.pallas_window import score_native_wmax

    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    it = jnp.asarray(rng.normal(size=(C, D)).astype(np.float32))
    cols = np.sort(rng.integers(0, C, size=(B, E)), axis=1).astype(np.int32)
    mask = np.ones((B, E), bool)

    if mode == "bits":
        # bitwise matmul agreement on a slice: native epilogue vs XLA matmul
        s_nat, _ = score_native_wmax(u, it[:2048])
        s_xla = u @ it[:2048].T
        print(json.dumps(
            {"scores_bitwise_equal_xla": bool(jnp.array_equal(s_nat, s_xla))}))
        return

    @jax.jit
    def chain_native(u, it):
        return peel_masked_topk_dot(u, it, jnp.asarray(cols),
                                    jnp.asarray(mask), K, with_fallback=False)

    @jax.jit
    def chain_scores(u, it):
        s = u @ it.T
        return peel_masked_topk_scores(s, jnp.asarray(cols),
                                       jnp.asarray(mask), K,
                                       with_fallback=False)

    v1, i1, ok1 = chain_native(u, it)
    v2, i2, ok2 = chain_scores(u, it)
    jax.block_until_ready((v1, v2))
    sel_equal = bool(jnp.array_equal(i1, i2)) and bool(jnp.array_equal(v1, v2))
    print(json.dumps({"sel_equal": sel_equal,
                      "ok_all": bool(jnp.all(ok1))}), flush=True)

    trace_dir = "/tmp/jaxtrace_native"
    with jax.profiler.trace(trace_dir):
        for _ in range(8):
            v1, i1, ok1 = chain_native(u, it)
        jax.block_until_ready(v1)
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True))
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    device_pids = {p for p, n in pid_names.items() if "TPU" in n}
    agg = collections.defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and "dur" in e and e.get("pid") in device_pids:
            agg[e.get("name", "?")] += e["dur"]
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:10]:
        print(f"{dur/8000:8.3f} ms/it  {name[:70]}")


if __name__ == "__main__":
    main()
