"""On-device sampler tests: exclusion correctness + distribution properties."""
import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

from sibrar_tpu.data.sampling import (
    sample_k_modalities, sample_negatives, sample_negatives_uniform,
)
from sibrar_tpu.ops.sparse import DeviceCSR, csr_contains, csr_rows_to_dense


def _toy_csr(n_users=30, n_items=100, density=0.2, seed=0):
    rng = np.random.default_rng(seed)
    mat = sp.random(n_users, n_items, density=density, random_state=rng,
                    data_rvs=lambda n: np.ones(n)).tocsr()
    return mat, DeviceCSR.from_scipy(mat)


def test_csr_ops_match_scipy():
    mat, csr = _toy_csr()
    rows = jnp.asarray(np.arange(10), dtype=jnp.int32)
    dense = np.asarray(csr_rows_to_dense(csr, rows))
    np.testing.assert_array_equal(dense, mat[:10].toarray())
    # the wide-matrix MXU one-hot path must agree with the compare path
    from sibrar_tpu.ops import sparse as sp_ops

    orig = sp_ops._CMP_DENSIFY_MAX_COLS
    try:
        sp_ops._CMP_DENSIFY_MAX_COLS = 0  # force the MXU one-hot branch
        dense2 = np.asarray(csr_rows_to_dense(csr, rows))
    finally:
        sp_ops._CMP_DENSIFY_MAX_COLS = orig
    np.testing.assert_array_equal(dense2, dense)
    # membership over every cell of a few rows
    cols = jnp.arange(mat.shape[1], dtype=jnp.int32)
    got = np.asarray(csr_contains(csr, rows[:, None], cols[None, :]))
    np.testing.assert_array_equal(got, mat[:10].toarray().astype(bool))


def test_uniform_negatives_exclude_positives():
    mat, csr = _toy_csr(density=0.3)
    users = jnp.asarray(np.arange(30).repeat(4), dtype=jnp.int32)
    negs = sample_negatives_uniform(
        jax.random.PRNGKey(0), users, csr, n_catalog=100, n_neg=8)
    coll = np.asarray(csr_contains(csr, users[:, None], negs))
    assert coll.mean() < 1e-3  # residual collisions are geometrically unlikely
    # distinct within row
    n = np.asarray(negs)
    for row in n:
        assert len(set(row.tolist())) == len(row)


def test_uniform_negatives_cover_catalog_uniformly():
    mat, csr = _toy_csr(n_users=4, n_items=50, density=0.05)
    users = jnp.zeros(2000, dtype=jnp.int32)
    negs = np.asarray(sample_negatives_uniform(
        jax.random.PRNGKey(1), users, csr, n_catalog=50, n_neg=4)).ravel()
    counts = np.bincount(negs, minlength=50).astype(float)
    pos = set(mat[0].indices.tolist())
    nonpos = [i for i in range(50) if i not in pos]
    # roughly uniform over non-positives (chi-square-ish loose bound)
    p = counts[nonpos] / counts[nonpos].sum()
    assert np.all(np.abs(p - 1 / len(nonpos)) < 3 / len(nonpos))


def test_popular_negatives_follow_popularity():
    mat, csr = _toy_csr(n_users=4, n_items=20, density=0.01, seed=3)
    pop = np.arange(1, 21, dtype=np.float32)
    pop = pop / pop.sum()
    users = jnp.zeros(4000, dtype=jnp.int32)
    negs = np.asarray(sample_negatives(
        jax.random.PRNGKey(2), users, csr, jnp.asarray(pop),
        strategy="popular", n_catalog=20, n_neg=2)).ravel()
    counts = np.bincount(negs, minlength=20).astype(float)
    # higher-popularity items must be sampled more
    assert counts[15:].mean() > 3 * counts[:5].mean()


def test_modality_sampling_shapes_and_semantics():
    key = jax.random.PRNGKey(0)
    m1 = sample_k_modalities(key, (100,), 4, 1)
    assert m1.shape == (100, 1)
    assert set(np.asarray(m1).ravel()) <= set(range(4))
    m2 = sample_k_modalities(key, (100, 3), 4, 2)
    assert m2.shape == (100, 3, 2)
    assert np.all(np.asarray(m2[..., 0]) != np.asarray(m2[..., 1]))
    mc = sample_k_modalities(key, (500,), 4, 2, central=2)
    mc = np.asarray(mc)
    assert np.all((mc == 2).sum(-1) == 1)  # central appears exactly once
    other = mc[mc != 2]
    assert set(other.tolist()) == {0, 1, 3}
    # order randomized: central should appear in both slots
    assert 0.3 < (mc[:, 0] == 2).mean() < 0.7


def test_sample_user_positives_replacement_semantics():
    """Users with history >= n_pos sample without needing replacement; all
    returned items are true positives (reference dataset.py:486-507)."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    from sibrar_tpu.ops.sparse import DeviceCSR
    from sibrar_tpu.data.sampling import sample_user_positives

    rows = [0, 0, 0, 0, 1, 2]
    cols = [3, 5, 7, 9, 2, 4]
    csr = DeviceCSR.from_scipy(sp.csr_matrix(
        (np.ones(6), (rows, cols)), shape=(3, 12)))
    users = jnp.asarray([0, 1, 2], dtype=jnp.int32)
    out = np.asarray(sample_user_positives(jax.random.PRNGKey(0), users, csr, 3))
    assert out.shape == (3, 3)
    assert set(out[0]) <= {3, 5, 7, 9}
    assert set(out[1]) == {2}  # short history -> sampled with replacement
    assert set(out[2]) == {4}


def test_segment_gather_matches_element_gather():
    """The Pallas segment-gather (aligned block + dynamic roll) must agree
    with the XLA element-gather path for ragged rows incl. empty ones."""
    from sibrar_tpu.ops import sparse as sp_ops

    rng = np.random.default_rng(5)
    n_rows, n_cols = 40, 700
    mat = sp.random(n_rows, n_cols, density=0.15, random_state=3, format="csr")
    mat.data[:] = 1
    mat[7] = 0  # an empty row
    mat.eliminate_zeros()
    csr = sp_ops.DeviceCSR.from_scipy(mat)
    rows = jnp.asarray(rng.integers(0, n_rows, size=24), jnp.int32)

    # element-gather reference (force by exceeding the seg gate)
    orig = sp_ops._SEG_GATHER_MAX_BYTES
    try:
        sp_ops._SEG_GATHER_MAX_BYTES = 0
        ref_cols, ref_mask = sp_ops.csr_row_gather(csr, rows)
    finally:
        sp_ops._SEG_GATHER_MAX_BYTES = orig
    seg_cols, seg_mask = sp_ops.csr_row_gather(csr, rows, interpret=True)
    np.testing.assert_array_equal(np.asarray(seg_cols), np.asarray(ref_cols))
    np.testing.assert_array_equal(np.asarray(seg_mask), np.asarray(ref_mask))

    # n-D row batches (routed interaction tower) flatten onto the same kernel
    rows2 = rows.reshape(4, 6)
    seg2_cols, seg2_mask = sp_ops.csr_row_gather(csr, rows2, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(seg2_cols), np.asarray(ref_cols).reshape(4, 6, -1))
    np.testing.assert_array_equal(
        np.asarray(seg2_mask), np.asarray(ref_mask).reshape(4, 6, -1))


def test_segment_gather_dma_matches_element_gather():
    """r5: CSRs whose flat indices exceed the in-VMEM cap ride the HBM-DMA
    segment gather (per-row aligned async copy + lane roll). Must agree
    with the XLA element gather for ragged rows incl. empty ones and rows
    longer than one 128-lane window."""
    from sibrar_tpu.ops import sparse as sp_ops

    rng = np.random.default_rng(6)
    n_rows, n_cols = 30, 900
    mat = sp.random(n_rows, n_cols, density=0.4, random_state=4, format="csr")
    mat.data[:] = 1
    mat[11] = 0
    mat.eliminate_zeros()
    csr = sp_ops.DeviceCSR.from_scipy(mat)
    rows = jnp.asarray(rng.integers(0, n_rows, size=17), jnp.int32)

    ref_cols, ref_mask = sp_ops.csr_row_gather(csr, rows)  # CPU element path
    orig = sp_ops._SEG_GATHER_MAX_BYTES
    try:
        # force PAST the in-VMEM gate so interpret takes the DMA kernel
        sp_ops._SEG_GATHER_MAX_BYTES = 0
        dma_cols, dma_mask = sp_ops.csr_row_gather(csr, rows, interpret=True)
    finally:
        sp_ops._SEG_GATHER_MAX_BYTES = orig
    np.testing.assert_array_equal(np.asarray(dma_cols), np.asarray(ref_cols))
    np.testing.assert_array_equal(np.asarray(dma_mask), np.asarray(ref_mask))
