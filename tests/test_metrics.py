"""Golden-value metric tests against a direct numpy re-derivation of the
reference formulas (`/root/reference/eval/metrics.py`: binary relevance,
NaN→0, NDCG clamp, IDCG over ideal top-k)."""
import numpy as np
import pandas as pd
import pytest
import jax.numpy as jnp

from sibrar_tpu.eval.metrics import coverage_flags, user_metrics_from_hits


def ref_metrics(scores: np.ndarray, y_true: np.ndarray, k: int):
    """Reference semantics, dense implementation."""
    b, n = scores.shape
    idx_topk = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    rows = np.arange(b)[:, None]
    hits = y_true[rows, idx_topk]
    npos = y_true.sum(1)

    recall = hits.sum(1) / npos
    recall[np.isnan(recall)] = 0.0
    precision = hits.sum(1) / k
    disc = 1.0 / np.log2(np.arange(2, k + 2))
    dcg = (hits * disc).sum(1)
    ideal = -np.sort(-y_true, axis=1)[:, :k]
    idcg = (ideal * disc).sum(1)
    ndcg = dcg / idcg
    ndcg[np.isnan(ndcg)] = 0.0
    ndcg = np.clip(ndcg, None, 1.0)
    hitrate = (hits.sum(1) > 0).astype(float)
    prec_at_i = hits.cumsum(1) / np.arange(1, k + 1)
    ap = (prec_at_i * hits).sum(1) / np.maximum(np.minimum(npos, k), 1)
    ap[npos == 0] = 0.0
    f = np.where(precision + recall > 0, 2 * precision * recall / (precision + recall), 0.0)
    return dict(recall=recall, precision=precision, ndcg=ndcg, hitrate=hitrate,
                ap=ap, f_score=f)


def hits_and_npos(scores, y_true, k_max):
    idx_topk = np.argsort(-scores, axis=1, kind="stable")[:, :k_max]
    rows = np.arange(scores.shape[0])[:, None]
    return y_true[rows, idx_topk].astype(np.float32), y_true.sum(1).astype(np.int32)


def test_metrics_match_reference_formulas(rng):
    b, n, ks = 64, 50, (1, 3, 5, 10)
    scores = rng.normal(size=(b, n)).astype(np.float32)
    y_true = (rng.random((b, n)) < 0.08).astype(np.float32)
    y_true[:5] = 0.0  # users with no positives: all metrics must be 0
    k_max = max(ks)
    hits, npos = hits_and_npos(scores, y_true, k_max)
    got = user_metrics_from_hits(jnp.asarray(hits), jnp.asarray(npos), ks)
    for k in ks:
        exp = ref_metrics(scores, y_true, k)
        for m in ("recall", "precision", "ndcg", "hitrate", "ap", "f_score"):
            np.testing.assert_allclose(
                np.asarray(got[f"{m}@{k}"]), exp[m], rtol=2e-4, atol=1e-5,
                err_msg=f"{m}@{k}")
    # no-positive users are exactly zero
    for k in ks:
        assert np.all(np.asarray(got[f"ndcg@{k}"])[:5] == 0.0)
        assert np.all(np.asarray(got[f"recall@{k}"])[:5] == 0.0)


def test_metrics_match_torch_reference_impl(rng):
    """Cross-check ndcg/recall/precision against the actual torch formulas
    from the reference metrics module, re-expressed here."""
    import torch

    b, n, k = 32, 40, 10
    scores = rng.normal(size=(b, n)).astype(np.float32)
    y_true = (rng.random((b, n)) < 0.1).astype(np.float32)
    logits = torch.tensor(scores)
    yt = torch.tensor(y_true)
    idx_topk = logits.topk(k=k).indices
    col = torch.arange(b).unsqueeze(-1)
    disc = 1.0 / torch.log2(torch.arange(2, k + 2).float())
    dcg = (yt[col, idx_topk] * disc).sum(-1)
    idcg = (yt.topk(k).values * disc).sum(-1)
    ndcg_t = dcg / idcg
    ndcg_t[torch.isnan(ndcg_t)] = 0.0
    ndcg_t = ndcg_t.clamp(max=1.0)
    recall_t = yt[col, idx_topk].sum(-1) / yt.sum(-1)
    recall_t[torch.isnan(recall_t)] = 0.0

    hits, npos = hits_and_npos(scores, y_true, k)
    got = user_metrics_from_hits(jnp.asarray(hits), jnp.asarray(npos), (k,))
    np.testing.assert_allclose(np.asarray(got[f"ndcg@{k}"]), ndcg_t.numpy(),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[f"recall@{k}"]), recall_t.numpy(),
                               rtol=2e-4, atol=1e-5)


def test_coverage_flags():
    topk = jnp.asarray(np.array([[0, 1, 2], [2, 3, 4], [0, 1, 2]]))
    flags = coverage_flags(topk, (2, 3), 10)
    assert float(np.asarray(flags["coverage@3"]).mean()) == 0.5  # items 0..4
    assert float(np.asarray(flags["coverage@2"]).mean()) == 0.4  # items 0,1,2,3


def test_golden_values_hand_computed():
    """Hand-computed golden case following the reference formulas exactly
    (eval/metrics.py:4-128): hits at ranks 1 and 3 of 5, n_pos = 4."""
    import jax.numpy as jnp
    from sibrar_tpu.eval.metrics import user_metrics_from_hits

    hits = jnp.asarray([[1.0, 0.0, 1.0, 0.0, 0.0]])
    n_pos = jnp.asarray([4])
    m = user_metrics_from_hits(hits, n_pos, (3, 5))
    d = [1 / np.log2(r + 2) for r in range(5)]
    # ndcg@3: DCG = d0 + d2; IDCG = d0+d1+d2 (min(4,3)=3 ideal hits)
    np.testing.assert_allclose(
        float(m["ndcg@3"][0]), (d[0] + d[2]) / (d[0] + d[1] + d[2]), rtol=1e-6)
    # ndcg@5: IDCG over min(4,5)=4 ideal hits
    np.testing.assert_allclose(
        float(m["ndcg@5"][0]), (d[0] + d[2]) / sum(d[:4]), rtol=1e-6)
    np.testing.assert_allclose(float(m["recall@3"][0]), 2 / 4)
    np.testing.assert_allclose(float(m["precision@3"][0]), 2 / 3)
    p, r = 2 / 3, 2 / 4
    np.testing.assert_allclose(float(m["f_score@3"][0]), 2 * p * r / (p + r),
                               rtol=1e-6)
    assert float(m["hitrate@3"][0]) == 1.0
    # ap@3: (prec@1·1 + prec@3·1)/min(n_pos,3) = (1 + 2/3)/3
    np.testing.assert_allclose(float(m["ap@3"][0]), (1 + 2 / 3) / 3, rtol=1e-6)


def test_no_positives_user_all_zero():
    """NaN→0 rule (reference eval/metrics.py:30,96): users without positives
    score 0 everywhere, never NaN."""
    import jax.numpy as jnp
    from sibrar_tpu.eval.metrics import user_metrics_from_hits

    hits = jnp.zeros((1, 4))
    m = user_metrics_from_hits(hits, jnp.asarray([0]), (4,))
    for key, v in m.items():
        assert float(v[0]) == 0.0, key
        assert not np.isnan(float(v[0])), key


def test_weight_ndcg_matches_reference_formula():
    """Hand-check vs eval/metrics.py:108-128: w = disc / disc[:n_pos].sum()."""
    from sibrar_tpu.eval.metrics import weight_ndcg_at_k

    w = weight_ndcg_at_k(n_pos=3, k=10)
    disc = 1.0 / np.log2(np.arange(2, 12))
    np.testing.assert_allclose(w, disc / disc[:3].sum(), rtol=1e-6)
    assert w.shape == (10,)


def test_wndcg_golden_vs_reference_weights():
    """wndcg@k must equal the sum of the reference eq.9 rank weights over the
    hit ranks (reference eval/metrics.py:108-128: metric = Σ_hit w(pos, K))."""
    import jax.numpy as jnp
    from sibrar_tpu.eval.metrics import user_metrics_from_hits, weight_ndcg_at_k

    hits = np.array([[1.0, 0.0, 1.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0],
                     [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
                     [0.0] * 10])
    n_pos = np.array([4, 15, 0])
    m = user_metrics_from_hits(jnp.asarray(hits), jnp.asarray(n_pos), (10,))
    for row in range(3):
        w = weight_ndcg_at_k(n_pos=int(n_pos[row]), k=10) if n_pos[row] else \
            np.zeros(10, np.float32)
        expected = float((w * hits[row]).sum())
        np.testing.assert_allclose(float(m["wndcg@10"][row]), expected,
                                   rtol=1e-5, err_msg=f"user {row}")


def test_wndcg_selectable_in_evaluator_config():
    from sibrar_tpu.eval.metrics import USER_METRICS

    assert "wndcg" in USER_METRICS


def test_plot_crawler_cache_and_title_split(tmp_path):
    from sibrar_tpu.preprocessing.text_features import (
        crawl_wikipedia_plots, extract_title_and_year)

    assert extract_title_and_year("Heat (1995)") == ("Heat", 1995)
    assert extract_title_and_year("No Year Title") == ("No Year Title", None)
    cache = tmp_path / "plots.csv"
    pd.DataFrame({"title": ["A", "B"], "plot": ["p1", None]}).to_csv(
        cache, index=False)
    assert crawl_wikipedia_plots(["A", "B"], cache_csv=str(cache)) == ["p1", ""]
    with pytest.raises(RuntimeError):
        crawl_wikipedia_plots(["A"])  # no wikipedia package, no cache
