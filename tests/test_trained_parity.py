"""Trained-quality parity vs the EXECUTED torch reference (VERDICT r3 #1).

Both frameworks train end-to-end on the same synthetic artifact directory
with the same hyperparameters; the gate is on converged best-validation
ndcg@10 (seeds differ between frameworks — different RNGs — so converged
metrics are compared, not trajectories). This covers what weight-transplant
parity cannot: our on-device negative sampling, scanned donated epochs,
modality routing, masked BN, loss aggregation, and optimizer semantics must
REACH the same quality as the reference's torch loop
(/root/reference/train/trainer.py:98-228, algorithms/sgd_alg.py:126-200,
:2009-2143).

Regression note: this harness caught a real r3 bug on first run — the plain
'{entity}_embedding' SBNet tower read a zero-initialized device table, so
every user shared embedding row 0 (val ndcg@10 0.12 vs the reference's 0.19;
fixed by models/sbnet.PlainIdEmbeddingModule).
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from trained_parity import (  # noqa: E402
    make_artifacts,
    trained_parity_mf,
    trained_parity_sbnet,
)


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("trained_parity")
    return make_artifacts(str(out))


def test_mf_trained_quality_matches_reference(artifact_dir):
    r = trained_parity_mf(artifact_dir, seeds=(0, 1))
    # measured r4: ref 0.180, ours 0.178 over 3 seeds (spread ~±0.015);
    # the tolerance is ~2x the seed std — ours may be better, not worse
    assert r["ours"] >= r["ref"] - 0.025, r
    # both must have learned real signal (popularity-only plateaus ~0.12)
    assert r["ref"] > 0.14 and r["ours"] > 0.14, r


def test_sbnet_trained_quality_matches_reference(artifact_dir):
    r = trained_parity_sbnet(artifact_dir, seeds=(0, 1))
    # measured r4 (post id-embedding fix): ref 0.184, ours 0.189.
    # The pre-fix failure mode sat at ours=0.12 — well below this gate.
    assert r["ours"] >= r["ref"] - 0.03, r
    assert r["ref"] > 0.14 and r["ours"] > 0.14, r


def test_dropoutnet_trained_quality_matches_reference(artifact_dir):
    from trained_parity import trained_parity_dropoutnet

    r = trained_parity_dropoutnet(artifact_dir, seeds=(0, 1))
    # measured r4 (post init + per-row-dropout fixes): ref seeds 0.263/0.220,
    # ours 0.230/0.248. Two r4 failure modes sat well below this gate:
    # kaiming-everywhere init (0.147) and per-instance preference dropout
    # (~0.21 mean).
    assert r["ours"] >= r["ref"] - 0.03, r
    assert r["ref"] > 0.15 and r["ours"] > 0.15, r


def test_dmf_trained_quality_matches_reference(artifact_dir):
    from trained_parity import trained_parity_dmf

    r = trained_parity_dmf(artifact_dir, seeds=(0, 1))
    # measured r4: ref 0.132, ours 0.133 at seed 0 — matched on first run
    # (towers + cosine-mu combine already kaiming-initialized both sides)
    assert r["ours"] >= r["ref"] - 0.03, r
    assert r["ref"] > 0.08 and r["ours"] > 0.08, r


def test_ifeatmf_trained_quality_matches_reference(artifact_dir):
    """CLCRec InfoNCE content alignment (single seed — measured r4:
    ref 0.186, ours 0.211; the harness's heavier families carry the
    multi-seed statistical gates)."""
    from trained_parity import train_ours_ifeatmf, train_reference_ifeatmf

    ref = train_reference_ifeatmf(artifact_dir, seed=0)
    ours = train_ours_ifeatmf(artifact_dir, seed=0)
    assert ours >= ref - 0.04, (ref, ours)
    assert ref > 0.1 and ours > 0.1, (ref, ours)


def test_uprotomf_trained_quality_matches_reference(artifact_dir):
    """Prototype similarity + proto/batch regularizers (single seed —
    measured r4: ref 0.118, ours 0.117)."""
    from trained_parity import train_ours_uprotomf, train_reference_uprotomf

    ref = train_reference_uprotomf(artifact_dir, seed=0)
    ours = train_ours_uprotomf(artifact_dir, seed=0)
    assert ours >= ref - 0.04, (ref, ours)
    assert ref > 0.07 and ours > 0.07, (ref, ours)


def test_ecf_trained_quality_matches_reference(artifact_dir):
    """ECF's straight-through top-k cluster masks + tag/independence losses
    (single seed — measured r4: ref 0.093, ours 0.091)."""
    from trained_parity import train_ours_ecf, train_reference_ecf

    ref = train_reference_ecf(artifact_dir, seed=0)
    ours = train_ours_ecf(artifact_dir, seed=0)
    assert ours >= ref - 0.03, (ref, ours)
    assert ref > 0.05 and ours > 0.05, (ref, ours)


def test_sbnet_cold_item_trained_quality_matches_reference(tmp_path_factory):
    """The paper's HEADLINE scenario: cold-start items. Both frameworks
    train SBNet on a cold_start_item split (val items unseen in training);
    at eval the item entity drops the 'interactions' modality and ranks the
    cold items from content (audio) alone — validating the cold-start
    modality rules end-to-end, not just via transplant."""
    from sibrar_tpu.config.schema import DatasetSplitType
    from trained_parity import (
        make_artifacts,
        train_ours_sbnet,
        train_reference_sbnet,
    )

    d = str(tmp_path_factory.mktemp("cold_parity"))
    make_artifacts(d, split_type=DatasetSplitType.COLD_START_ITEM)
    ref = [train_reference_sbnet(d, seed=s) for s in (0, 1)]
    ours = [train_ours_sbnet(d, seed=s) for s in (0, 1)]
    import numpy as _np

    ref_m, ours_m = float(_np.mean(ref)), float(_np.mean(ours))
    assert ours_m >= ref_m - 0.04, (ref, ours)
    # content-only cold ranking must be far above random (~1/18 split items)
    assert ref_m > 0.08 and ours_m > 0.08, (ref, ours)


def test_ufeatmf_trained_quality_matches_reference(artifact_dir):
    """User-side CLCRec contrastive alignment (single seed — measured r4:
    ref 0.178, ours 0.182)."""
    from trained_parity import train_ours_ufeatmf, train_reference_ufeatmf

    ref = train_reference_ufeatmf(artifact_dir, seed=0)
    ours = train_ours_ufeatmf(artifact_dir, seed=0)
    assert ours >= ref - 0.04, (ref, ours)
    assert ref > 0.1 and ours > 0.1, (ref, ours)


def test_sbnet_huge_architecture_trained_quality(artifact_dir):
    """The huge-family settings (deep branch, batch-norm every 2 layers,
    output activation, input normalization) — the BN-every-2 masked-BN
    semantics have no other trained-level coverage. Measured r4: ref 0.146,
    ours 0.155 (single seed)."""
    from trained_parity import (
        train_ours_sbnet_huge,
        train_reference_sbnet_huge,
    )

    ref = train_reference_sbnet_huge(artifact_dir, seed=0)
    ours = train_ours_sbnet_huge(artifact_dir, seed=0)
    assert ours >= ref - 0.04, (ref, ours)
    assert ref > 0.1 and ours > 0.1, (ref, ours)


def test_sbnet_missing_modality_trained_quality(artifact_dir):
    """The paper's missing-modality scenario: train on
    {interactions, audio}, evaluate with eval_modalities=['audio'] only.
    Measured r4 (2 seeds): ref 0.181/0.175, ours 0.160/0.200 — means
    0.178 vs 0.180."""
    import numpy as _np

    from trained_parity import (
        train_ours_sbnet_missing_modality,
        train_reference_sbnet_missing_modality,
    )

    ref = [train_reference_sbnet_missing_modality(artifact_dir, seed=s)
           for s in (0, 1)]
    ours = [train_ours_sbnet_missing_modality(artifact_dir, seed=s)
            for s in (0, 1)]
    ref_m, ours_m = float(_np.mean(ref)), float(_np.mean(ours))
    assert ours_m >= ref_m - 0.03, (ref, ours)
    assert ref_m > 0.1 and ours_m > 0.1, (ref, ours)
