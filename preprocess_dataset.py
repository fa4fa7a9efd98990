"""Preprocessing CLI: raw dataset dir → split artifacts.

Parity target: `/root/reference/data/preprocess_dataset.py:18-101`. The config
is a YAML matching `sibrar_tpu.preprocessing.ppconfig.PreprocessingConfig`
(split ratios/type/seed, interaction filters, per-feature preprocessing and
normalization steps). Stdout is tee'd to a log file in the output directory.

Example:
    python preprocess_dataset.py -d /raw/ml1m -o /data/ml1m -c conf/pp_ml1m.yml
"""
from __future__ import annotations

import argparse
import os

from sibrar_tpu.config.loader import load_config_dict
from sibrar_tpu.config.schema import from_dict
from sibrar_tpu.preprocessing.pipeline import load_raw, preprocess
from sibrar_tpu.preprocessing.ppconfig import PreprocessingConfig
from sibrar_tpu.utils.misc import Tee, generate_id


def main(argv=None):
    parser = argparse.ArgumentParser(description="sibrar_tpu dataset preprocessing")
    parser.add_argument("--data_dir", "-d", required=True,
                        help="raw dataset directory (listening_history.csv + features)")
    parser.add_argument("--out_dir", "-o", required=True,
                        help="output base directory (split subdir is created inside)")
    parser.add_argument("--conf_path", "-c", default=None,
                        help="preprocessing yaml (default config if omitted)")
    parser.add_argument("--split_type", "-s", default=None,
                        choices=("random", "temporal", "coldstart"))
    parser.add_argument("--cold_start_type", default=None,
                        choices=("user", "item", "both"))
    args = parser.parse_args(argv)

    conf_dict = load_config_dict(args.conf_path) if args.conf_path else {}
    if args.split_type:
        conf_dict.setdefault("split", {})["split_type"] = args.split_type
    if args.cold_start_type:
        conf_dict.setdefault("split", {})["cold_start_type"] = args.cold_start_type
    config = from_dict(PreprocessingConfig, conf_dict)

    os.makedirs(args.out_dir, exist_ok=True)
    log_file = os.path.join(args.out_dir, f"preprocess_{generate_id()}.log")
    with Tee(log_file):
        raw = load_raw(args.data_dir, config)
        preprocess(raw, config, out_base=args.out_dir)


if __name__ == "__main__":
    main()
