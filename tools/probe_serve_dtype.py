"""TPU probe: device-time A/B of serve dtype modes (VERDICT r4 #4).

BENCH_r04 recorded serve bf16_b256 p50 73.6 ms vs f32 62.6 ms — through a
tunnel whose constant host<->device sync (~60 ms) and ±5% variance can
swallow the real difference. This probe answers it with trace evidence:
build the f32 and bf16 Recommender steps at bench scale, warm both, wrap
N calls each in `jax.profiler.trace`, and report per-mode DEVICE time
(sum of device-track events / calls), which the tunnel cannot distort.

Usage: python tools/probe_serve_dtype.py [C] [batch] [reps]
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


def device_ms(trace_dir: str, top: int = 6):
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {pid for pid, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower()}
    by_name = collections.defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        by_name[e.get("name", "?")] += e["dur"]
        total += e["dur"]
    tops = sorted(by_name.items(), key=lambda kv: -kv[1])[:top]
    return total / 1e3, [(n[:60], round(d / 1e3, 3)) for n, d in tops]


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 100_352
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    n_users, d, k = 20_000, 256, 100
    from sibrar_tpu.data.dataset import RecDataset
    from sibrar_tpu.serve import Recommender

    rng = np.random.default_rng(3)
    pairs = np.unique(np.stack([
        rng.integers(0, n_users, 600_000),
        rng.integers(0, C, 600_000)], axis=1), axis=0)
    ds = RecDataset(split_set="val", n_users=n_users, n_items=C,
                    interactions=pairs[: len(pairs) // 5].astype(np.int64),
                    train_interactions=pairs[len(pairs) // 5:].astype(np.int64),
                    item_features={}, user_features={})
    dd = ds.to_device()
    u_mat = jnp.asarray(rng.standard_normal((n_users, d)).astype(np.float32))
    items = jnp.asarray(
        rng.standard_normal((ds.n_items_in_split, d)).astype(np.float32))

    def score_fn(u):
        return u_mat[u] @ items.T

    score_fn.dot_parts = (lambda u: u_mat[u], items)

    out = {}
    for name, dtype in (("f32", None), ("bf16", "bfloat16")):
        rec = Recommender(score_fn, ds, dd, k=k, batch_size=bs, dtype=dtype)
        users = rng.integers(0, n_users, bs).astype(np.int32)
        rec.recommend(users)  # compile + warm
        rec.recommend(users)
        trace_dir = f"/tmp/jaxtrace_serve_{name}"
        with jax.profiler.trace(trace_dir):
            for _ in range(reps):
                batch = rng.integers(0, n_users, bs).astype(np.int32)
                rec.recommend(batch)
        total_ms, tops = device_ms(trace_dir)
        out[name] = round(total_ms / reps, 3)
        print(f"{name}: device {total_ms / reps:.3f} ms/call over {reps} calls",
              flush=True)
        for n, ms in tops:
            print(f"    {ms:9.3f} ms  {n}")
    print(json.dumps({f"serve_{n}_device_ms_per_call": v
                      for n, v in out.items()}))


if __name__ == "__main__":
    main()
