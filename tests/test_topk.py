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


def test_cols_pad_row_gather_parity():
    """`with_cols_pad` materialization must return bit-identical
    (cols, mask) to the span-walk path, for 1-D and n-D row batches,
    including empty rows."""
    import numpy as np

    from sibrar_tpu.ops.sparse import build_cols_pad

    rng = np.random.default_rng(7)
    n_rows, n_cols = 37, 500
    lens = rng.integers(0, 9, size=n_rows)
    lens[5] = 0  # explicit empty row
    indptr = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    indices = np.concatenate(
        [np.sort(rng.choice(n_cols, size=l, replace=False)) for l in lens]
        or [np.zeros(0)]).astype(np.int32)
    csr = DeviceCSR(indptr=jnp.asarray(indptr), indices=jnp.asarray(indices),
                    n_rows=n_rows, n_cols=n_cols,
                    max_row_len=int(lens.max()))
    padded = csr.replace(cols_pad=build_cols_pad(
        csr.indptr, csr.indices, n_rows, csr.max_row_len))
    assert padded.cols_pad.shape == (n_rows, 128)

    for rows in (jnp.asarray([0, 5, 12, 36], jnp.int32),
                 jnp.asarray([[1, 2], [5, 30]], jnp.int32)):
        c0, m0 = csr_row_gather(csr, rows)
        c1, m1 = csr_row_gather(padded, rows)
        np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))


def test_cols_pad_viability_gate():
    from sibrar_tpu.ops.sparse import (
        _SEG_GATHER_MAX_BYTES,
        padded_cols_viable,
    )

    small_nnz = _SEG_GATHER_MAX_BYTES // 4  # seg kernel still covers it
    assert not padded_cols_viable(1000, 64, small_nnz)
    assert padded_cols_viable(100_000, 64, small_nnz * 3)
    # over the HBM budget: a million rows x 2048-padded histories
    assert not padded_cols_viable(1_000_000, 2000, small_nnz * 3)
    assert not padded_cols_viable(1000, 0, small_nnz * 3)


def test_cols_pad_end_to_end_gated(monkeypatch):
    """With the seg-gather cap forced to 0, `to_device` materializes padded
    cols on every CSR and a train step + eval run bit-identical to the
    span-walk configuration."""
    import numpy as np

    import sibrar_tpu.ops.sparse as sparse_mod
    from sibrar_tpu.config.schema import (
        DatasetConfig,
        EvalConfig,
        LearningConfig,
    )
    from sibrar_tpu.data.synthetic import make_synthetic_splits
    from sibrar_tpu.eval.evaluator import FullEvaluator
    from sibrar_tpu.models.mf import SGDMatrixFactorization
    from sibrar_tpu.train.trainer import Trainer

    splits = make_synthetic_splits(n_users=30, n_items=50,
                                   n_interactions=600, seed=8)

    def run(patched: bool):
        if patched:
            monkeypatch.setattr(sparse_mod, "_SEG_GATHER_MAX_BYTES", 0)
        else:
            monkeypatch.undo()
        train, val = splits["train"], splits["val"]
        data = train.to_device()
        if patched:
            assert data.pos_csr.cols_pad is not None
            assert data.user_inter_csr.cols_pad is not None
        else:
            assert data.pos_csr.cols_pad is None
        model = SGDMatrixFactorization(n_users=train.n_users,
                                       n_items=train.n_items,
                                       embedding_dim=8)
        learn = LearningConfig(n_epochs=1, lr=1e-2, rec_loss="bpr",
                               optimizing_metric="ndcg@10")
        ev = FullEvaluator(EvalConfig(top_k=[10], metrics=["ndcg"]), val,
                           device_data=data)
        tr = Trainer(model, train, ev, learn,
                     DatasetConfig(n_negative_samples=4), batch_size=32,
                     seed=3, device_data=data)
        loss = tr.train_epoch()["train/loss"]
        return loss, tr.validate()["ndcg@10"]

    base = run(False)
    padded = run(True)
    np.testing.assert_allclose(padded, base, rtol=0, atol=0)
