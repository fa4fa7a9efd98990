"""TPU probe: op-level profile of the NORTH-STAR e2e train chunk.

The r5 10-epoch e2e run measured 125 s/epoch wall for 2383 steps (≈52
ms/step) where the 3-modality bench onion model steps at ~7 ms — this
probe builds the SAME model/dataset the e2e runs (shipped
sbnet_onion18_huge_no-user conf over /tmp/sibrar_e2e_onion artifacts),
warms one chunk, traces the next, and prints the top device ops.

Usage: python tools/probe_e2e_train_profile.py [chunk_steps] [top_n]
"""
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sibrar_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402


def main():
    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    art = os.environ.get("SIBRAR_E2E_ONION_DIR", "/tmp/sibrar_e2e_onion")

    from sibrar_tpu.config.loader import get_config
    from sibrar_tpu.eval.evaluator import FullEvaluator
    from sibrar_tpu.experiment import _load_split
    from sibrar_tpu.models.registry import get_algorithm
    from sibrar_tpu.train.trainer import Trainer

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = get_config(
        os.path.join(here, "conf", "single", "sbnet_onion18_huge_no-user.yml"),
        algorithm="sbnet", dataset_name="onion18",
        overrides={
            "dataset.dataset_path": art,
            "dataset.user_features": [],
            "dataset.item_features": [
                {"name": "ivec256", "type": "vector"},
                {"name": "bert", "type": "vector"},
                {"name": "musicnn", "type": "vector"},
                {"name": "genres", "type": "tag"}],
            "eval.group_metrics": [], "eval.top_k": [10],
            "learn.epoch_scan_chunk": chunk,
            "learn.max_batches_per_epoch": chunk,
        })
    tr = _load_split(conf, "train")
    va = _load_split(conf, "val")
    dd = tr.to_device()
    spec = get_algorithm("sbnet")
    model = spec.build(conf.model, tr, dd)
    ev = FullEvaluator(conf.eval, va, evaluator_name="val", device_data=None)
    trainer = Trainer(model, tr, ev, conf.learn, conf.dataset,
                      batch_size=conf.loader.batch_size, seed=0,
                      device_data=dd)
    import time

    t0 = time.perf_counter()
    m = trainer.train_epoch()  # compile + warm (chunk steps)
    print(f"warm chunk ({chunk} steps): {time.perf_counter()-t0:.1f}s "
          f"loss {m['train/loss']:.4f}", flush=True)
    t0 = time.perf_counter()
    m = trainer.train_epoch()
    wall = time.perf_counter() - t0
    print(f"steady chunk: {wall:.2f}s = {wall/chunk*1e3:.2f} ms/step wall",
          flush=True)

    trace_dir = "/tmp/jaxtrace_e2e_train"
    with jax.profiler.trace(trace_dir):
        m = trainer.train_epoch()
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))
    with gzip.open(paths[-1]) as f:
        trc = json.load(f)
    events = trc.get("traceEvents", [])
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
    print(f"device total: {total/1e3:.1f} ms over {chunk} steps = "
          f"{total/1e3/chunk:.2f} ms/step device")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{dur/1e3:9.2f} ms  x{counts[name]:<5d} {name[:70]}")


if __name__ == "__main__":
    main()
