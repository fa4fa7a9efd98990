"""TPU probe: op-level profile of the bench-scale SBNet train step.

Runs the same scanned epoch program as `probe_train.py full`, wraps a short
epoch in `jax.profiler.trace`, then parses the emitted trace.json.gz and
prints the top device ops by total duration (aggregated by op name prefix).

Usage: python tools/probe_train_profile.py [top_n]
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


def build_trainer():
    import bench

    from sibrar_tpu.config.schema import DatasetConfig, EvalConfig, LearningConfig
    from sibrar_tpu.eval.evaluator import FullEvaluator
    from sibrar_tpu.models.sbnet import SingleBranchNet
    from sibrar_tpu.train.trainer import Trainer

    train = bench._bench_train_dataset()
    device_data = train.to_device()
    feats = [
        {"feature_name": "audio", "feature_hidden_layers": [512]},
        {"feature_name": "text", "feature_hidden_layers": [512]},
        {"feature_name": "genres"},
        {"feature_name": "interactions", "feature_hidden_layers": [512]},
        {"feature_name": "item_embedding"},
    ]
    conf = {
        "shared_common_dim": 256,
        "user": {"feature_name": "user_embedding", "embedding_dim": 256},
        "item": {"features": feats,
                 "single_branch_hidden_layers": bench.SB_HIDDEN,
                 "common_modality_dim": bench.SB_COMMON,
                 "embedding_regularization_type": "pairwise_single",
                 "regularization_weight": 0.5,
                 "regularization_temperature": 0.2},
    }
    model = SingleBranchNet.build_from_conf(conf, train, device_data)
    learn = LearningConfig(n_epochs=1, lr=1e-3, rec_loss="bpr",
                           max_batches_per_epoch=bench.TR_STEPS,
                           optimizing_metric="ndcg@10")
    evaluator = FullEvaluator(EvalConfig(top_k=[10]), train,
                              device_data=device_data)
    trainer = Trainer(model, train, evaluator, learn,
                      DatasetConfig(n_negative_samples=bench.TR_NEG),
                      batch_size=bench.TR_BATCH, seed=0,
                      device_data=device_data, init_for_training=False)
    rng = np.random.default_rng(5)
    trainer.state = trainer.state.replace(
        params=jax.tree_util.tree_map(
            lambda x: jnp.asarray(
                rng.normal(scale=0.05, size=x.shape).astype(x.dtype))
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            trainer.state.params),
        opt_state=trainer.optimizer.init(trainer.state.params))
    return trainer


def main():
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    trainer = build_trainer()
    # warm-up: compile + first run
    m = trainer.train_epoch()
    print("warmup loss:", float(m["train/loss"]), flush=True)

    trace_dir = "/tmp/jaxtrace_train"
    with jax.profiler.trace(trace_dir):
        m = trainer.train_epoch()
        jax.block_until_ready(m)

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        print("NO TRACE FILES under", trace_dir)
        return
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])

    # device-side complete events: pid/tid under TPU device tracks have
    # dur in microseconds; aggregate by name
    by_name = collections.defaultdict(float)
    counts = collections.defaultdict(int)
    args_of = {}
    total = 0.0
    # identify device pids via process_name metadata
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {pid for pid, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower()}
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
    print(f"pids seen: { {pid: n for pid, n in pid_names.items()} }")
    print(f"total device-op time: {total/1000:.3f} ms over {len(by_name)} op names")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:top_n]:
        a = args_of.get(name, {})
        src = a.get("source", "")
        ln = a.get("long_name", "")[:100]
        print(f"{dur/1000:9.3f} ms  x{counts[name]:<5d} {name[:60]:62s} {src}")
        if ln:
            print(f"           {ln}")


if __name__ == "__main__":
    main()
