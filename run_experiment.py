"""Experiment CLI — the front door of the framework.

Parity target: `/root/reference/run_experiment.py:9-53` (argparse over
algorithm / dataset / split type / run type), dispatching into the
orchestration layer (`sibrar_tpu/experiment.py`).

Example:
    python run_experiment.py -a mf -d /data/ml1m/random_split -t train_val_test \
        -c conf/mf.yml
"""
from __future__ import annotations

import argparse

from sibrar_tpu.config.loader import get_config
from sibrar_tpu.experiment import (
    run_combine_experiment,
    run_gather,
    run_test,
    run_train_val,
    run_train_val_test,
)
from sibrar_tpu.models.registry import ALGORITHMS

RUN_TYPES = ("train_val", "test", "train_val_test", "gather")
SPLIT_TYPES = ("random", "temporal", "cold_start_user", "cold_start_item",
               "cold_start_both")
# predict-time composition of two fitted runs — selectable like the
# reference's `uiprotomfs_combine` enum entry
# (/root/reference/algorithms/algorithms_utils.py:11-42) but, like there,
# not buildable from a config (sgd_alg.py:871-875 raises): it takes the two
# run directories instead of a conf/dataset pair.
COMBINE_ALG = "uiprotomfs_combine"


def main(argv=None):
    import logging

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    from sibrar_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="sibrar_tpu experiment runner")
    parser.add_argument("--algorithm", "-a", required=True,
                        choices=sorted(ALGORITHMS) + [COMBINE_ALG])
    parser.add_argument("--dataset_path", "-d", default=None,
                        help="preprocessed artifact directory (reference layout)")
    parser.add_argument("--dataset_name", "-n", default=None,
                        help="dataset name for the results tree (default: dir name)")
    parser.add_argument("--split_type", "-s", default=None, choices=SPLIT_TYPES)
    parser.add_argument("--run_type", "-t", default="train_val", choices=RUN_TYPES)
    parser.add_argument("--conf_path", "-c", default=None,
                        help="yaml/json experiment config (base_configs supported)")
    parser.add_argument("--override", "-o", action="append", default=[],
                        metavar="key.path=value",
                        help="config override, e.g. -o learn.lr=0.01")
    parser.add_argument("--split_set", default="test",
                        choices=("train", "val", "test"),
                        help="split evaluated by gather / uiprotomfs_combine")
    parser.add_argument("--gather_k", type=int, default=None,
                        help="top-k export size for gather (default: max cutoff)")
    parser.add_argument("--u_run_dir", default=None,
                        help="uiprotomfs_combine: fitted UProtoMFs run dir")
    parser.add_argument("--i_run_dir", default=None,
                        help="uiprotomfs_combine: fitted IProtoMFs run dir")
    args = parser.parse_args(argv)

    if args.algorithm == COMBINE_ALG:
        if not (args.u_run_dir and args.i_run_dir):
            parser.error(f"{COMBINE_ALG} requires --u_run_dir and --i_run_dir")
        run_combine_experiment(args.u_run_dir, args.i_run_dir,
                               split_set=args.split_set)
        return
    if not (args.dataset_path and args.conf_path):
        parser.error("--dataset_path/-d and --conf_path/-c are required")

    import os

    import yaml

    overrides = {"dataset.dataset_path": args.dataset_path}
    for item in args.override:
        key, _, value = item.partition("=")
        overrides[key] = yaml.safe_load(value)
    conf = get_config(
        args.conf_path, algorithm=args.algorithm,
        dataset_name=args.dataset_name or os.path.basename(
            os.path.normpath(args.dataset_path)),
        split_type=args.split_type, overrides=overrides)

    if args.run_type == "train_val":
        run_train_val(conf)
    elif args.run_type == "test":
        run_test(conf)
    elif args.run_type == "train_val_test":
        run_train_val_test(conf)
    else:
        run_gather(conf, split_set=args.split_set, k=args.gather_k)


if __name__ == "__main__":
    main()
