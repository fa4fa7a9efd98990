"""TPU probe: MF train step cost at embedding-table scale (Onion-size).

Dense-Adam training of SGDMatrixFactorization with [n, d] user/item tables
measures the full-table HBM tax: autodiff materializes dense [n, d] grads
(scatter-add into zeros) and optax Adam re-reads/rewrites params + both
moments every step, so step cost scales with TABLE size, not batch size.
This probe pins the baseline that the sparse row-update path must beat.

One jitted program (the scanned epoch; tail batch disabled via
max_batches_per_epoch).

Measured (v5e, n=500k, d=256, n_neg=10):
  B=512  dense  17.04 ms/step (compile 425 s)
  B=512  sparse  5.75 ms/step wall, ~1.97 device (compile 31 s)
  B=4096 sparse 20.40 ms/step — the ~81 ns/row XLA scatter rate makes the
  sparse path scatter-bound at M≈45k touched rows; crossover is roughly
  batch·(1+n_neg) ≈ n/8 (docs/performance.md).

Usage: python tools/probe_mf_large.py [n_rows] [batch] [d] [steps] [sparse] [profile]
  sparse: "sparse" switches LearningConfig.sparse_tables on (row-adam path).
  profile: trace the timed epoch and print the top device ops.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from sibrar_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _print_trace(trace_dir: str, top_n: int = 30):
    """Aggregate device-op durations from the newest trace.json.gz
    (same parse as tools/probe_train_profile.py)."""
    import collections
    import glob
    import gzip

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
    device_pids = {pid for pid, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower()}
    by_name = collections.defaultdict(float)
    counts = collections.defaultdict(int)
    args_of = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        by_name[name] += e["dur"]
        counts[name] += 1
        total += e["dur"]
        if name not in args_of:
            args_of[name] = e.get("args", {})
    print(f"total device-op time: {total/1000:.3f} ms "
          f"over {len(by_name)} op names", flush=True)
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:top_n]:
        a = args_of.get(name, {})
        src = a.get("source", "")
        ln = a.get("long_name", "")[:100]
        print(f"{dur/1000:9.3f} ms  x{counts[name]:<5d} {name[:60]:62s} {src}")
        if ln:
            print(f"           {ln}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 50
    sparse = len(sys.argv) > 5 and sys.argv[5] == "sparse"

    from sibrar_tpu.config.schema import (
        DatasetConfig,
        EvalConfig,
        LearningConfig,
    )
    from sibrar_tpu.data.dataset import RecDataset
    from sibrar_tpu.eval.evaluator import FullEvaluator
    from sibrar_tpu.models.mf import SGDMatrixFactorization
    from sibrar_tpu.train.trainer import Trainer

    rng = np.random.default_rng(3)
    n_inter = steps * bs + bs  # enough full batches, no tail (capped anyway)
    pairs = np.stack([rng.integers(0, n, n_inter),
                      rng.integers(0, n, n_inter)], axis=1)
    pairs = np.unique(pairs, axis=0)
    train = RecDataset(split_set="train", n_users=n, n_items=n,
                       interactions=pairs.astype(np.int64),
                       train_interactions=pairs.astype(np.int64))
    device_data = train.to_device()
    model = SGDMatrixFactorization(n_users=n, n_items=n, embedding_dim=d)
    learn = LearningConfig(n_epochs=1, lr=1e-3, rec_loss="bpr",
                           max_batches_per_epoch=steps,
                           optimizing_metric="ndcg@10",
                           sparse_tables=sparse)
    evaluator = FullEvaluator(EvalConfig(top_k=[10]), train,
                              device_data=device_data)
    trainer = Trainer(model, train, evaluator, learn,
                      DatasetConfig(n_negative_samples=10),
                      batch_size=bs, seed=0, device_data=device_data,
                      init_for_training=False)
    # fill params host-side (init compile costs minutes through the tunnel)
    trainer.state = trainer.state.replace(
        params=jax.tree_util.tree_map(
            lambda x: jnp.asarray(
                rng.normal(scale=0.05, size=x.shape).astype(x.dtype))
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            trainer.state.params),
        opt_state=trainer.init_opt_state(trainer.state.params))

    print("built; compiling epoch...", flush=True)
    t0 = time.perf_counter()
    trainer.train_epoch()  # compile + warm
    jax.block_until_ready(trainer.state.params)
    print(f"warm epoch done in {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    if len(sys.argv) > 6 and sys.argv[6] == "profile":
        with jax.profiler.trace("/tmp/jaxtrace_mf"):
            m = trainer.train_epoch()
            jax.block_until_ready(trainer.state.params)
        dt = time.perf_counter() - t0
        _print_trace("/tmp/jaxtrace_mf", top_n=30)
    else:
        m = trainer.train_epoch()
        jax.block_until_ready(trainer.state.params)
        dt = time.perf_counter() - t0
    assert np.isfinite(m["train/loss"]), m
    print(json.dumps({
        "n_rows": n, "batch": bs, "d": d, "steps": steps,
        "sparse": sparse,
        "ms_per_step": round(dt / steps * 1e3, 3),
        "steps_per_sec": round(steps / dt, 1),
        "table_mb": round(n * d * 4 / 2**20, 1),
    }))


if __name__ == "__main__":
    main()
