"""Multi-worker sweep launcher.

Parity target: `/root/reference/run_agent.py:20-103` — spawn N sweep workers,
monitor them, and tear the whole process group down on Ctrl-C. The reference
pins W&B agents to GPUs via CUDA_VISIBLE_DEVICES; here each worker is a
`sweep_agent.py` process that owns a device (TPU chips/hosts are addressed via
`--devices`, setting JAX_PLATFORMS/TPU visibility per worker) and takes a
disjoint trial shard (`--trial-offset/--max-trials`), so no external sweep
server is needed.

Example (4 workers sharding a 32-trial sweep):
    python run_agent.py -c conf/sweeps/sbnet.yml -o results/sweeps/sbnet \
        -p 4 --trials-per-worker 8
"""
from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

from sibrar_tpu.utils.process import on_parent_exit, terminate_process_group


def main(argv=None):
    parser = argparse.ArgumentParser(description="sibrar_tpu sweep worker launcher")
    parser.add_argument("--sweep_conf", "-c", default=None)
    parser.add_argument("--results_base", "-o", default=None)
    parser.add_argument("--n_parallel", "-p", type=int, default=1)
    parser.add_argument("--trials-per-worker", type=int, default=None)
    parser.add_argument("--devices", default=None,
                        help="comma-separated device visibility strings, one "
                             "per worker (exported as TPU_VISIBLE_DEVICES)")
    parser.add_argument("--wandb-agent", action="store_true",
                        help="spawn server-driven W&B sweep workers instead "
                             "of local trial shards (the reference's "
                             "run_agent.py mode: N `wandb agent` processes "
                             "pinned to devices)")
    args = parser.parse_args(argv)

    if not args.wandb_agent:
        if not (args.sweep_conf and args.results_base
                and args.trials_per_worker):
            parser.error("local mode requires -c, -o and --trials-per-worker")

    devices = (args.devices.split(",") if args.devices
               else [None] * args.n_parallel)
    verbose = args.n_parallel == 1

    processes = []
    for i in range(args.n_parallel):
        if args.wandb_agent:
            cmd = [sys.executable, "sweep_agent.py", "--wandb-agent"]
            desc = "wandb-agent worker"
        else:
            cmd = [sys.executable, "sweep_agent.py",
                   "-c", args.sweep_conf, "-o", args.results_base,
                   "--trial-offset", str(i * args.trials_per_worker),
                   "--max-trials", str(args.trials_per_worker)]
            desc = (f"trials {i * args.trials_per_worker}..."
                    f"{(i + 1) * args.trials_per_worker - 1}")
        env = dict(os.environ)
        if devices[i % len(devices)]:
            env["TPU_VISIBLE_DEVICES"] = devices[i % len(devices)]
        kwargs = {} if verbose else {"stdout": subprocess.DEVNULL,
                                     "stderr": subprocess.DEVNULL}
        p = subprocess.Popen(cmd, env=env, start_new_session=True,
                             preexec_fn=on_parent_exit(), **kwargs)
        print(f"launched worker {i} (pid {p.pid}, {desc})")
        processes.append((p, i))

    try:
        while processes:
            done = [(p, i) for p, i in processes if p.poll() is not None]
            for p, i in done:
                print(f"worker {i} finished with code {p.returncode}")
                processes.remove((p, i))
            time.sleep(1)
        print("all workers finished")
    except (KeyboardInterrupt, SystemExit):
        print("terminating all workers...")
        while alive := [p for p, _ in processes if p.poll() is None]:
            for p in alive:
                terminate_process_group(p, signal.SIGTERM)
            time.sleep(1)
        sys.exit(1)


if __name__ == "__main__":
    main()
