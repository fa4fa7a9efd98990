"""TPU probe: SBNet train step at Onion18 scale with the paper's huge config.

Mirrors `/root/reference/conf/single/algorithms/sbnet_onion18_huge_conf.yml`:
user entity = interactions-only single branch (no hidden layers, common 128);
item entity = {interactions, genres, jukebox} through a [512,512,512,256,256]
branch, pairwise_single InfoNCE, shared dim 128. Synthetic uniform data at
n_users=50k, n_items=100,352 (the bench's Onion-scale catalog), jukebox
1024-d (real jukebox is 4800-d; the vector dim only scales one small matmul
and the feature-table transfer, not the step structure).

Usage: python tools/probe_sbnet_onion.py [steps] [--profile]

MEASURED (v5e-1, B=512, n_neg=10, 50-step scanned epochs; wall includes
~2-3 ms/step remote-tunnel sync):
  r3 baseline      55.9 steps/s (17.90 ms wall, 16.1 device) — item tower on
                   the bag path (256-factor gate), sampling re-gathering the
                   positives row every rejection round, XLA element gathers
                   for all CSR row fetches
  + sampling hoist + 2048-factor gate (densify item tower):
                   92.9 steps/s (10.76 ms wall, 8.9 device)
  + flat-rows densify + padded-cols row gathers:
                  103.7 steps/s (9.64 ms wall, 6.89 device)
Remaining device step: adamw on the two tower kernels ~1.7 ms (memory
floor), densify+GEMMs ~3.2 (incl. XLA's 376 MB bf16 transpose copy for the
dW GEMM — custom-vjp respelling measured a no-op, see
tools/probe_bag_vs_dense.py), small-layer adam + MLP tail ~1.5.

`--bf16-mu` (the `learn.moment_dtype: bfloat16` production knob) measures
109.8 steps/s (9.11 ms wall) vs 103.7 (9.64) — ~0.5 ms/step off the adamw
passes for halved first-moment storage.
"""
import collections
import glob
import gzip
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

N_USERS, N_ITEMS = 50_000, 100_352
N_INTER = 2_000_000
JUKEBOX_D = 1024
BATCH = 512
N_NEG = 10


def build_trainer(steps: int):
    from sibrar_tpu.config.schema import (
        DatasetConfig,
        EvalConfig,
        FeatureDefinition,
        FeatureType,
        LearningConfig,
    )
    from sibrar_tpu.data.dataset import RecDataset
    from sibrar_tpu.data.feature import Feature
    from sibrar_tpu.eval.evaluator import FullEvaluator
    from sibrar_tpu.models.sbnet import SingleBranchNet
    from sibrar_tpu.train.trainer import Trainer

    rng = np.random.default_rng(11)
    pairs = np.unique(np.stack([
        rng.integers(0, N_USERS, N_INTER),
        rng.integers(0, N_ITEMS, N_INTER)], axis=1), axis=0)
    rng.shuffle(pairs)
    genres = [f"g{t}" for t in range(64)]
    item_features = {
        "jukebox": Feature.build(
            FeatureDefinition("jukebox", FeatureType.VECTOR),
            rng.normal(size=(N_ITEMS, JUKEBOX_D)).astype(np.float32), N_ITEMS),
        "genres": Feature.build(
            FeatureDefinition("genres", FeatureType.TAG),
            ["|".join(rng.choice(genres, size=4, replace=False))
             for _ in range(N_ITEMS)], N_ITEMS),
    }
    train = RecDataset(
        split_set="train", n_users=N_USERS, n_items=N_ITEMS,
        interactions=pairs.astype(np.int64),
        train_interactions=pairs.astype(np.int64),
        item_features=item_features, user_features={})
    device_data = train.to_device()
    conf = {
        "shared_common_dim": 128,
        "user": {
            "features": [{"feature_name": "interactions"}],
            "single_branch_hidden_layers": [],
            "common_modality_dim": 128,
            "normalize_single_branch_input": True,
            "apply_output_activation": True,
        },
        "item": {
            "features": [
                {"feature_name": "interactions"},
                {"feature_name": "genres"},
                {"feature_name": "jukebox"},
            ],
            "single_branch_hidden_layers": [512, 512, 512, 256, 256],
            "common_modality_dim": 512,
            "single_branch_input_dropout": 2e-2,
            "normalize_single_branch_input": True,
            "embedding_regularization_type": "pairwise_single",
            "central_modality": "interactions",
            "regularization_weight": 1.0,
            "regularization_temperature": 1.0,
            "apply_output_activation": True,
            "apply_batch_norm_every": 2,
        },
    }
    model = SingleBranchNet.build_from_conf(conf, train, device_data)
    learn = LearningConfig(n_epochs=1, lr=5e-5, wd=1e-3, optimizer="adamw",
                           rec_loss="bpr", max_batches_per_epoch=steps,
                           optimizing_metric="ndcg@10",
                           moment_dtype=("bfloat16" if "--bf16-mu" in sys.argv
                                         else None))
    evaluator = FullEvaluator(EvalConfig(top_k=[10]), train,
                              device_data=device_data)
    trainer = Trainer(model, train, evaluator, learn,
                      DatasetConfig(n_negative_samples=N_NEG),
                      batch_size=BATCH, seed=0, device_data=device_data,
                      init_for_training=False)
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    steps = int(args[0]) if args else 50
    trainer = build_trainer(steps)
    m = trainer.train_epoch()  # compile + warm
    print("warmup loss:", float(m["train/loss"]), flush=True)
    t0 = time.perf_counter()
    m = trainer.train_epoch()
    jax.block_until_ready(trainer.state.params)
    dt = time.perf_counter() - t0
    print(f"{steps / dt:.1f} steps/s  {dt / steps * 1e3:.2f} ms/step "
          f"(wall, incl. tunnel sync)", flush=True)

    if "--profile" not in sys.argv:
        return
    trace_dir = "/tmp/jaxtrace_sbnet_onion"
    with jax.profiler.trace(trace_dir):
        m = trainer.train_epoch()
        jax.block_until_ready(trainer.state.params)
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
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        by_name[e.get("name", "?")] += e["dur"]
        counts[e.get("name", "?")] += 1
        total += e["dur"]
    print(f"total device-op time: {total / 1000:.3f} ms "
          f"({total / 1000 / steps:.3f} ms/step) over {len(by_name)} ops")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{dur / 1000:9.3f} ms  x{counts[name]:<5d} {name[:90]}")


if __name__ == "__main__":
    main()
