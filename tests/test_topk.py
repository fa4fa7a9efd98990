"""Exactness tests for the windowed top-k fast paths (ops/topk.py) against the
naive scatter + lax.top_k reference, across exclusion regimes and edge shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from sibrar_tpu.ops.sparse import DeviceCSR, csr_row_gather, scatter_fill_rows
from sibrar_tpu.ops.topk import masked_topk, windowed_topk, windowed_topk_excluded


def _setup(b=16, c=1000, excl_per_row=20, seed=0):
    rng = np.random.default_rng(seed)
    scores = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32))
    rows, cols = [], []
    for r in range(b):
        cs = rng.choice(c, size=excl_per_row, replace=False)
        rows += [r] * excl_per_row
        cols += list(cs)
    csr = DeviceCSR.from_scipy(sp.csr_matrix(
        (np.ones(len(rows)), (rows, cols)), shape=(b, c)))
    u = jnp.arange(b, dtype=jnp.int32)
    return scores, csr, u


def _reference(scores, csr, u, k):
    cols, mask = csr_row_gather(csr, u)
    s = scatter_fill_rows(scores, cols, mask, n_cols=scores.shape[1], fill=-1e30)
    return jax.lax.top_k(s, k)


@pytest.mark.parametrize("window", [16, 64, 128, 100])  # incl. non-divisor
def test_windowed_topk_exact(window):
    rng = np.random.default_rng(1)
    s = jnp.asarray(rng.normal(size=(8, 777)).astype(np.float32))
    v0, i0 = jax.lax.top_k(s, 50)
    v1, i1 = windowed_topk(s, 50, window=window)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0))
    # indices may differ only on exact value ties
    same = np.asarray(i1) == np.asarray(i0)
    tied = ~same
    if tied.any():
        np.testing.assert_allclose(np.asarray(v1)[tied], np.asarray(v0)[tied])


def test_windowed_topk_adversarial_clustered():
    """All top-k items packed into one window (worst case for the covering)."""
    s = np.zeros((2, 512), np.float32)
    s[:, 100:120] = np.arange(20, 0, -1, dtype=np.float32)  # all in one window
    v1, i1 = windowed_topk(jnp.asarray(s), 10, window=64)
    assert set(np.asarray(i1[0]).tolist()) == set(range(100, 110))


@pytest.mark.parametrize("method", ["full", "scatter", "noscatter"])
def test_masked_topk_methods_match(method):
    scores, csr, u = _setup()
    k = 30
    v0, i0 = _reference(scores, csr, u, k)
    v1, i1 = masked_topk(scores, csr, u, k, method=method)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=1e-6, atol=1e-4)
    # excluded columns never appear
    excl_sets = [set(np.asarray(csr.indices[csr.indptr[r]:csr.indptr[r + 1]]).tolist())
                 for r in range(scores.shape[0])]
    for r in range(scores.shape[0]):
        assert not (set(np.asarray(i1[r]).tolist()) & excl_sets[r])


def test_masked_topk_auto_heavy_exclusion():
    """Heavy exclusion (half the catalog) must still be exact via scatter path."""
    scores, csr, u = _setup(b=4, c=600, excl_per_row=300, seed=3)
    v0, i0 = _reference(scores, csr, u, 25)
    v1, i1 = masked_topk(scores, csr, u, 25, method="auto")
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=1e-6, atol=1e-4)


def test_masked_topk_empty_exclusion():
    rng = np.random.default_rng(5)
    scores = jnp.asarray(rng.normal(size=(4, 500)).astype(np.float32))
    csr = DeviceCSR.from_scipy(sp.csr_matrix((4, 500)))
    u = jnp.arange(4, dtype=jnp.int32)
    v0, i0 = jax.lax.top_k(scores, 10)
    v1, i1 = masked_topk(scores, csr, u, 10, method="auto")
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0))


def test_masked_topk_k_exceeds_catalog():
    scores, csr, u = _setup(b=3, c=20, excl_per_row=4)
    v1, i1 = masked_topk(scores, csr, u, 50, method="auto")
    assert v1.shape == (3, 20)


def test_windowed_topk_excluded_margin_guarantee():
    """Adversarial: excluded items hold the top `n_excl` raw scores, each in a
    different window — the margin must recover the true (masked) top-k."""
    b, c, n_excl, k = 2, 2048, 16, 8
    rng = np.random.default_rng(7)
    s = rng.normal(size=(b, c)).astype(np.float32)
    excl = np.arange(n_excl) * 64  # one per window
    for r in range(b):
        s[r, excl] = 100.0 + np.arange(n_excl)  # dominate raw ranking
    rows = np.repeat(np.arange(b), n_excl)
    csr = DeviceCSR.from_scipy(sp.csr_matrix(
        (np.ones(b * n_excl), (rows, np.tile(excl, b))), shape=(b, c)))
    u = jnp.arange(b, dtype=jnp.int32)
    v1, i1 = windowed_topk_excluded(jnp.asarray(s), csr, u, k, window=64)
    s_masked = s.copy()
    s_masked[:, excl] = -1e30
    v0, i0 = jax.lax.top_k(jnp.asarray(s_masked), k)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0))
