"""Significance testing of model comparisons.

Parity target: `/root/reference/eval/stat_tests.py:6-38`: per (dataset,
scenario, metric) CSV of per-user metric values (one column per model), run
Bonferroni-corrected paired t-tests of the best model against every other.
Exposed as a function over in-memory arrays (fed by the gather exporter's
`raw_metrics`) plus a CSV driver matching the reference's file convention.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class PairedComparison:
    best_model: str
    other_model: str
    p_value: float
    threshold: float  # Bonferroni-corrected

    @property
    def significant(self) -> bool:
        return self.p_value <= self.threshold


def paired_t_tests(per_user_metrics: dict[str, np.ndarray],
                   threshold: float = 0.05) -> list[PairedComparison]:
    """Compare the best-mean model against all others with paired t-tests at a
    Bonferroni-corrected threshold. NaNs are omitted pairwise (the reference's
    `nan_policy='omit'`)."""
    from scipy import stats

    if len(per_user_metrics) < 2:
        raise ValueError("need at least two models to compare")
    means = {m: np.nanmean(v) for m, v in per_user_metrics.items()}
    best = max(means, key=means.get)
    others = [m for m in per_user_metrics if m != best]
    bonferroni = threshold / len(others)

    out = []
    for other in others:
        t = stats.ttest_rel(per_user_metrics[best], per_user_metrics[other],
                            nan_policy="omit")
        out.append(PairedComparison(best, other, float(t.pvalue), bonferroni))
    return out


def compare_gathers(gather_paths: dict[str, str], metric_key: str,
                    threshold: float = 0.05) -> list[PairedComparison]:
    """Run the comparison directly over gather pickles
    ({model_name: path_to_gather.pkl})."""
    import pickle

    per_user = {}
    for model, path in gather_paths.items():
        with open(path, "rb") as fh:
            payload = pickle.load(fh)
        per_user[model] = np.asarray(payload["raw_metrics"][metric_key])
    return paired_t_tests(per_user, threshold)


def compare_csv(csv_path: str, threshold: float = 0.05) -> list[PairedComparison]:
    """Reference-style CSV driver: one column per model, one row per user."""
    import pandas as pd

    df = pd.read_csv(csv_path)
    return paired_t_tests({c: df[c].to_numpy() for c in df.columns}, threshold)
