"""Sweep CLI — hyperparameter search worker.

Parity target: `/root/reference/sweep_agent.py` + `/root/reference/run_agent.py`.
Local mode needs no external service; pass `--trial-offset`/`--max-trials` to
shard one sweep across several workers (the reference pins W&B agents to GPUs
via CUDA_VISIBLE_DEVICES; here each worker owns its TPU chip/host).

Example:
    python sweep_agent.py -c conf/sweeps/mf_ml1m.yml -o results/sweeps/mf_ml1m
"""
from __future__ import annotations

import argparse
import json

from sibrar_tpu.sweep import load_sweep_config, run_sweep


def main(argv=None):
    parser = argparse.ArgumentParser(description="sibrar_tpu sweep agent")
    parser.add_argument("--sweep_conf", "-c", default=None)
    parser.add_argument("--results_base", "-o", default=None)
    parser.add_argument("--trial-offset", type=int, default=0)
    parser.add_argument("--max-trials", type=int, default=None)
    parser.add_argument("--wandb-agent", action="store_true",
                        help="server-driven mode: run as a `wandb agent` "
                             "worker pulling hyperparameters from "
                             "wandb.config (reference sweep_agent.py)")
    parser.add_argument("--keep-top-runs", type=int, default=10)
    args = parser.parse_args(argv)

    from sibrar_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.wandb_agent:
        from sibrar_tpu.sweep import wandb_train_val_agent

        wandb_train_val_agent(keep_top_runs=args.keep_top_runs)
        return
    if not (args.sweep_conf and args.results_base):
        parser.error("--sweep_conf/-c and --results_base/-o are required "
                     "in local sweep mode")
    sweep = load_sweep_config(args.sweep_conf)
    records = run_sweep(sweep, args.results_base,
                        trial_offset=args.trial_offset,
                        max_trials=args.max_trials)
    best = records[0]
    print(json.dumps({"best_trial": best["trial"], "params": best["params"],
                      "metric": sweep.metric,
                      "value": best["metrics"].get(sweep.metric)}))


if __name__ == "__main__":
    main()
