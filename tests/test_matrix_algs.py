"""Numerical parity tests for the from-scratch solver replacements
(VERDICT r2 #2): the device-native SLIM/ALS/maxvol/similarity implementations
replace third-party libraries the reference relies on
(`/root/reference/algorithms/linear_algs.py:15-127` sklearn ElasticNet,
`mf_algs.py:69-142` the `implicit` library, maxvolpy,
`utilities/similarities.py:18-139`) — each is validated here against its
reference objective/solution on toy problems, so silent quality drift in the
rebuilt solvers cannot pass CI.
"""
import numpy as np
import pytest
import scipy.sparse as sp

from sibrar_tpu.models.matrix_algs import (
    SLIM,
    AlternatingLeastSquare,
    compute_similarity_top_k,
    maxvol,
)


def _toy_interactions(n_users, n_items, density=0.15, seed=0):
    rng = np.random.default_rng(seed)
    m = (rng.random((n_users, n_items)) < density).astype(np.float32)
    # every row/column nonempty so degree-based similarities are well-defined
    m[np.arange(n_users), rng.integers(0, n_items, n_users)] = 1.0
    m[rng.integers(0, n_users, n_items), np.arange(n_items)] = 1.0
    return m


# ---------------------------------------------------------------------- SLIM
def _elasticnet_objective(a, w_col, y, alpha, l1_ratio):
    """The sklearn ElasticNet objective the reference SLIM minimizes per item
    column (linear_algs.py:70-79): 1/(2n)·||y − Aw||² + α·l1·||w||₁
    + ½·α·(1−l1)·||w||²."""
    n = a.shape[0]
    resid = y - a @ w_col
    return (0.5 / n * float(resid @ resid)
            + alpha * l1_ratio * float(np.abs(w_col).sum())
            + 0.5 * alpha * (1.0 - l1_ratio) * float(w_col @ w_col))


def test_slim_fista_matches_sklearn_elasticnet():
    from sklearn.linear_model import ElasticNet

    alpha, l1_ratio = 0.002, 0.5
    a = _toy_interactions(50, 80, seed=1)
    model = SLIM(alpha=alpha, l1_ratio=l1_ratio, max_iter=800)
    model.fit(sp.csr_matrix(a))
    w_ours = model.weights
    assert w_ours.shape == (80, 80)
    assert np.all(np.diag(w_ours) == 0.0)  # SLIM constraint
    assert np.all(w_ours >= 0.0)  # positivity constraint

    # per-column objective must match the sklearn solution's (the reference
    # zeroes column j in the predictors, which is equivalent to our forced
    # w_jj = 0 — that predictor then never contributes)
    ours, ref = [], []
    for j in range(0, 80, 7):
        a_j = a.copy()
        a_j[:, j] = 0.0
        en = ElasticNet(alpha=alpha, l1_ratio=l1_ratio, fit_intercept=False,
                        positive=True, max_iter=4000, tol=1e-6)
        en.fit(a_j, a[:, j])
        ours.append(_elasticnet_objective(a, w_ours[:, j], a[:, j],
                                          alpha, l1_ratio))
        ref.append(_elasticnet_objective(a_j, en.coef_, a[:, j],
                                         alpha, l1_ratio))
    ours, ref = np.asarray(ours), np.asarray(ref)
    # FISTA must reach the sklearn optimum within a small relative slack
    np.testing.assert_array_less(ours, ref * 1.01 + 1e-6)
    # and sklearn must not be dramatically better anywhere (same optimum)
    assert float(np.max(ours - ref)) < 1e-3


# ----------------------------------------------------------------------- ALS
def test_als_satisfies_normal_equations():
    """After fit, the item factors solve the Hu-et-al ridge normal equations
    given the final user factors (the last half-step): (YᵀY + Xᵀ(Cᵢ−I)X +
    λI)·y_i = Xᵀ·Cᵢ·p_i — the closed form the `implicit` library iterates."""
    p = _toy_interactions(30, 24, seed=2)
    als = AlternatingLeastSquare(alpha=2.0, factors=6, regularization=0.5,
                                 n_iterations=3)
    als.fit(sp.csr_matrix(p))
    x, y = als.users_factors, als.items_factors  # [30, 6], [24, 6]
    xtx = x.T @ x
    for i in range(24):
        p_i = p[:, i]
        cu_minus = als.alpha * p_i  # C_i − I on the positives
        m = xtx + (x * cu_minus[:, None]).T @ x + als.regularization * np.eye(6)
        b = x.T @ ((1.0 + cu_minus) * p_i)
        np.testing.assert_allclose(m @ y[i], b, rtol=2e-3, atol=2e-4)


def test_als_improves_weighted_objective():
    """Each ALS iteration must not increase the Hu-et-al weighted loss."""
    p = _toy_interactions(30, 24, seed=3)
    conf_w = 1.0 + 2.0 * p

    def loss(x, y):
        pred = x @ y.T
        return float((conf_w * (p - pred) ** 2).sum()
                     + 0.5 * ((x ** 2).sum() + (y ** 2).sum()))

    prev = np.inf
    for iters in (1, 2, 4):
        als = AlternatingLeastSquare(alpha=2.0, factors=6, regularization=0.5,
                                     n_iterations=iters)
        als.fit(sp.csr_matrix(p))
        cur = loss(als.users_factors, als.items_factors)
        assert cur <= prev + 1e-6, (iters, cur, prev)
        prev = cur


# -------------------------------------------------------------------- maxvol
def test_maxvol_dominates_random_subsets():
    rng = np.random.default_rng(4)
    a = rng.normal(size=(60, 5))
    idx = maxvol(a)
    assert len(set(idx.tolist())) == 5  # distinct rows
    vol = abs(np.linalg.det(a[idx]))
    rand_best = max(
        abs(np.linalg.det(a[rng.choice(60, 5, replace=False)]))
        for _ in range(500))
    assert vol >= 0.5 * rand_best  # greedy maxvol beats / rivals random search
    # local dominance: no single-row swap improves the volume past tol
    b = a @ np.linalg.pinv(a[idx])
    assert np.abs(b).max() <= 1.05 + 1e-6


# -------------------------------------------------------------- similarities
def _hand_similarity(m, kind, shrinkage=0.0, alpha=0.5, beta=1.0):
    """Direct per-pair loops implementing the reference formulas
    (utilities/similarities.py:64-131), zero self-similarity."""
    n = m.shape[0]
    out = np.zeros((n, n))
    counts = m.sum(axis=1)
    norms = np.linalg.norm(m, axis=1)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            co = float(m[i] @ m[j])
            if kind == "cosine":
                d = norms[i] * norms[j]
            elif kind == "jaccard":
                d = counts[i] + counts[j] - co
            elif kind == "sorensen_dice":
                d = (counts[i] + counts[j]) / 2.0
            elif kind == "asymmetric_cosine":
                d = counts[i] ** alpha * counts[j] ** (1 - alpha)
            elif kind == "tversky":
                d = co + alpha * (counts[i] - co) + beta * (counts[j] - co)
            else:
                raise ValueError(kind)
            s = co / d if d > 0 else 0.0
            if shrinkage > 0 and co + shrinkage > 0:
                s *= co / (co + shrinkage)
            out[i, j] = s
    return out


@pytest.mark.parametrize("kind,shrinkage", [
    ("cosine", 0.0), ("cosine", 2.5), ("jaccard", 0.0),
    ("sorensen_dice", 0.0), ("asymmetric_cosine", 0.0), ("tversky", 0.0),
    ("tversky", 1.5),
])
def test_similarity_kernels_match_hand_computed(kind, shrinkage):
    m = _toy_interactions(7, 12, density=0.4, seed=5)
    kwargs = {}
    if kind == "asymmetric_cosine":
        kwargs["alpha"] = 0.3
    if kind == "tversky":
        kwargs.update(alpha=0.7, beta=1.2)
    got = compute_similarity_top_k(sp.csr_matrix(m), kind, k=7,
                                   shrinkage=shrinkage, **kwargs)
    ref = _hand_similarity(m, kind, shrinkage=shrinkage, **kwargs)
    np.testing.assert_allclose(got.toarray(), ref, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------ ifknn over TAG
def test_ifknn_over_tag_feature_hand_checked():
    """ItemFeatureKNN over a TAG genre feature: similarity must be computed
    over the densified multi-hot matrix, not the padded integer codes
    (reference algorithms/knn_algs.py:129-140)."""
    from sibrar_tpu.config.schema import FeatureDefinition, FeatureType
    from sibrar_tpu.data.feature import Feature
    from sibrar_tpu.models.matrix_algs import ItemFeatureKNN

    # items: 0 {a}, 1 {a,b}, 2 {b}, 3 {c}
    feat = Feature.build(
        FeatureDefinition("genres", FeatureType.TAG),
        ["a", "a|b", "b", "c"], n_entities=4)
    fm = feat.dense_table()
    # cosine similarities: s(0,1)=1/sqrt2, s(1,2)=1/sqrt2, s(0,2)=0, item 3
    # shares nothing
    alg = ItemFeatureKNN(k=4, feature_name="genres")
    train = sp.csr_matrix(np.array([
        [1, 0, 0, 0],   # user 0 interacted with item 0 only
        [0, 0, 0, 1],   # user 1 with item 3 only
    ], dtype=np.float32))
    alg.fit(matrix=train, feature_matrix=fm)
    pred = alg.pred_mtx
    s = 1.0 / np.sqrt(2.0)
    # self-similarity is excluded; user 0's scores are item 0's sim row
    np.testing.assert_allclose(pred[0], [0.0, s, 0.0, 0.0], atol=1e-5)
    # item 3 shares no genre with anything
    np.testing.assert_allclose(pred[1], [0.0, 0.0, 0.0, 0.0], atol=1e-5)
    # the broken pre-fix behavior (similarity over integer code values)
    # would have made item 3 (code row [2,pad]) similar to items 0-2
    assert pred[1, 0] == 0.0 and pred[1, 1] == 0.0
