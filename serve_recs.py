"""Batch recommendation CLI over a fitted run directory.

The reference framework stops at evaluation (`/root/reference/eval/eval.py`
computes metrics and discards the rankings); serving lists for downstream
consumption is the missing last mile this CLI covers. It reloads a fitted
run (`sibrar_tpu.serve.Recommender.from_run_dir`), scores the requested
users in fixed-size jitted batches, and writes one ranked list per user.

Examples:
    # top-10 test-split lists for every user, as CSV
    python serve_recs.py -r results/mf_run -k 10 -o recs.csv

    # specific users (one id per line), JSONL with scores, bf16 GEMM
    python serve_recs.py -r results/sbnet_run -u users.txt -k 100 \
        --dtype bfloat16 --scores -o recs.jsonl
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _parse_users(arg: str | None, dataset) -> np.ndarray:
    if arg is None:
        return np.asarray(dataset.users_in_split)
    try:  # inline comma-separated ids
        return np.asarray([int(x) for x in arg.split(",")], dtype=np.int64)
    except ValueError:
        pass
    with open(arg) as f:  # one id per line
        return np.asarray([int(line) for line in f if line.strip()],
                          dtype=np.int64)


def main(argv=None):
    import logging

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    from sibrar_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("-r", "--run_dir", required=True,
                   help="fitted run directory (holds conf.yml + model files)")
    p.add_argument("-u", "--users", default=None,
                   help="comma-separated ids or a file with one id per line "
                        "(default: every user in the split)")
    p.add_argument("-k", type=int, default=10, help="list length")
    p.add_argument("-s", "--split_set", default="test",
                   choices=("val", "test"),
                   help="exclusion context: test = train+val seen items")
    p.add_argument("-o", "--out", default="-",
                   help="output path; .jsonl for JSON lines, else CSV "
                        "(default: stdout CSV)")
    p.add_argument("--scores", action="store_true",
                   help="include the score next to each item id")
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--dtype", default="float32",
                   choices=("float32", "bfloat16", "int8"),
                   help="low-precision GEMM inputs for dot models: bfloat16 "
                        "= one MXU pass; int8 = per-row post-training "
                        "quantization, 4x smaller item table "
                        "(see serve.Recommender)")
    p.add_argument("--selection", default="exact",
                   choices=("exact", "approx"),
                   help="approx = lax.approx_max_k ranking at "
                        "--recall_target (exclusions stay exact)")
    p.add_argument("--recall_target", type=float, default=0.95)
    p.add_argument("--include_seen", action="store_true",
                   help="do NOT exclude already-interacted items")
    args = p.parse_args(argv)

    from sibrar_tpu.serve import Recommender

    rec = Recommender.from_run_dir(
        args.run_dir, split=args.split_set, k=args.k,
        batch_size=args.batch_size,
        dtype=None if args.dtype == "float32" else args.dtype,
        selection=args.selection, recall_target=args.recall_target,
        exclude_seen=not args.include_seen)
    users = _parse_users(args.users, rec.dataset)
    ids, scores = rec.recommend(users, k=args.k, return_scores=True)

    jsonl = args.out.endswith(".jsonl")
    out = sys.stdout if args.out == "-" else open(args.out, "w")
    try:
        if jsonl:
            for u, row_i, row_s in zip(users, ids, scores):
                obj = {"user": int(u), "items": [int(i) for i in row_i]}
                if args.scores:
                    obj["scores"] = [round(float(s), 6) for s in row_s]
                out.write(json.dumps(obj) + "\n")
        else:
            hdr = ["user"] + [f"item_{j}" for j in range(args.k)]
            if args.scores:
                hdr += [f"score_{j}" for j in range(args.k)]
            out.write(",".join(hdr) + "\n")
            for u, row_i, row_s in zip(users, ids, scores):
                cells = [str(int(u))] + [str(int(i)) for i in row_i]
                if args.scores:
                    cells += [f"{float(s):.6g}" for s in row_s]
                out.write(",".join(cells) + "\n")
    finally:
        if out is not sys.stdout:
            out.close()
            logging.info("wrote %d lists to %s", len(users), args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
