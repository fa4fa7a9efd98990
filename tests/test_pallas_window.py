"""Parity tests for ops/pallas_window (interpret mode on the CPU mesh).

Oracle: scatter −∞ + `lax.top_k` over the same scores — the baseline
semantics of `ops/topk.masked_topk(method="full")`.
"""
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from sibrar_tpu.ops.pallas_window import (
    pallas_masked_topk,
    pallas_masked_topk_scores,
    window_scores_from,
    window_topk_phase2,
)

_NEG = -1e30


def _oracle(scores, cols, mask, k):
    s = np.asarray(scores).copy()
    cols, mask = np.asarray(cols), np.asarray(mask)
    for b in range(s.shape[0]):
        s[b, cols[b][mask[b]]] = _NEG
    v, i = lax.top_k(jnp.asarray(s), k)
    return np.asarray(v), np.asarray(i)


def _mk(b, c, d, e, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.normal(size=(b, d)).astype(np.float32)
    it = rng.normal(size=(c, d)).astype(np.float32)
    cols = np.stack([rng.choice(c, size=e, replace=False) for _ in range(b)]
                    ).astype(np.int32)
    mask = rng.random((b, e)) < 0.8
    return u, it, cols, mask


@pytest.mark.parametrize("b,c,d,e,k", [
    (8, 2048, 128, 16, 10),        # aligned
    (5, 1000, 48, 7, 10),          # everything needs padding
    (16, 5120, 128, 33, 100),      # k + e margin > windows touched
])
def test_fused_dot_topk_matches_oracle(b, c, d, e, k):
    u, it, cols, mask = _mk(b, c, d, e)
    scores = jnp.asarray(u) @ jnp.asarray(it).T
    ov, oi = _oracle(scores, cols, mask, k)
    v, i = pallas_masked_topk(jnp.asarray(u), jnp.asarray(it),
                              jnp.asarray(cols), jnp.asarray(mask), k,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(v), ov, rtol=1e-5, atol=1e-5)
    # indices may differ only on exact score ties
    np.testing.assert_allclose(
        np.take_along_axis(np.asarray(scores), np.asarray(i), 1), ov,
        rtol=1e-5, atol=1e-5)


def test_precomputed_scores_path_and_no_exclusion():
    rng = np.random.default_rng(1)
    s = rng.normal(size=(12, 3000)).astype(np.float32)
    ov, oi = lax.top_k(jnp.asarray(s), 50)
    v, i = pallas_masked_topk_scores(jnp.asarray(s), None, None, 50,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(v), np.asarray(ov), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(oi))


def test_exclusion_hits_whole_topk_window():
    # adversarial: one window holds ALL the best scores and they are all
    # excluded — the k+e margin must still recover the true winners.
    b, c, k = 4, 2048, 8
    s = np.zeros((b, c), np.float32)
    s[:, 256:384] = 100.0  # window 2 dominates
    s[:, 5] = 1.0          # the true post-exclusion winner
    cols = np.tile(np.arange(256, 384, dtype=np.int32), (b, 1))[:, :64]
    s[:, 256:320] = 100.0
    mask = np.ones_like(cols, bool)
    ov, _ = _oracle(jnp.asarray(s), cols, mask, k)
    v, i = pallas_masked_topk_scores(jnp.asarray(s), jnp.asarray(cols),
                                     jnp.asarray(mask), k, interpret=True)
    np.testing.assert_allclose(np.asarray(v), ov, rtol=1e-6)


def test_window_retile_matches_reshape():
    rng = np.random.default_rng(2)
    s = rng.normal(size=(8, 2048)).astype(np.float32)
    sw_t, wmax = window_scores_from(jnp.asarray(s), tb=8, bc=1024,
                                    interpret=True)
    ref = s.reshape(8, 16, 128)
    np.testing.assert_array_equal(np.asarray(sw_t), ref.transpose(1, 0, 2))
    np.testing.assert_array_equal(np.asarray(wmax), ref.max(-1))


def test_phase2_duplicate_window_exclusions():
    # several excluded columns inside the same selected window
    sw = np.arange(1 * 16 * 128, dtype=np.float32).reshape(1, 16, 128)
    sw_t = jnp.asarray(sw.transpose(1, 0, 2))
    wmax = jnp.asarray(sw.max(-1))
    cols = jnp.asarray([[2047, 2046, 2040]], jnp.int32)  # all in last window
    mask = jnp.ones((1, 3), bool)
    v, i = window_topk_phase2(sw_t, wmax, cols, mask, 5, 2048, interpret=True)
    assert i[0, 0] == 2045 and i[0, 1] == 2044
    assert 2047 not in np.asarray(i) and 2046 not in np.asarray(i)


def test_masked_topk_pallas_method_cpu_raises_or_matches():
    # method="pallas" requires TPU Mosaic; on CPU the jit build must fail
    # loudly (auto never selects it off-TPU).
    import jax

    from sibrar_tpu.ops.sparse import DeviceCSR
    from sibrar_tpu.ops.topk import masked_topk

    rng = np.random.default_rng(3)
    s = jnp.asarray(rng.normal(size=(4, 8192)).astype(np.float32))
    csr = DeviceCSR(indptr=jnp.asarray([0, 1, 2, 3, 4], jnp.int32),
                    indices=jnp.asarray([1, 2, 3, 4], jnp.int32),
                    n_rows=4, n_cols=8192, max_row_len=1)
    if jax.default_backend() == "tpu":
        v, i = masked_topk(s, csr, jnp.arange(4), 10, method="pallas")
        vf, _ = masked_topk(s, csr, jnp.arange(4), 10, method="full")
        np.testing.assert_allclose(np.asarray(v), np.asarray(vf), rtol=1e-6)
    else:
        v, i = masked_topk(s, csr, jnp.arange(4), 10, method="scatter")
        vf, _ = masked_topk(s, csr, jnp.arange(4), 10, method="full")
        np.testing.assert_allclose(np.asarray(v), np.asarray(vf), rtol=1e-6)


def test_exact_topk_matches_lax_topk():
    from sibrar_tpu.ops.pallas_topk import exact_topk

    rng = np.random.default_rng(7)
    x = rng.normal(size=(5, 9000)).astype(np.float32)
    x[:, 200:210] = x[:, :10]  # exact cross-position ties
    xv = jnp.asarray(x)
    rv, ri = lax.top_k(xv, 164)
    v, i = exact_topk(xv, 164, min_n=1024, interpret=True)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
    # fallback path (small n) must also be exact
    v2, i2 = exact_topk(xv[:, :500], 50)
    rv2, ri2 = lax.top_k(xv[:, :500], 50)
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(rv2))


def test_pallas_topk_negative_scores_small_catalog_pad_windows():
    """When m exceeds the LIVE window count (small catalog, zero-padded to
    the GEMM block), fully-padded windows get selected and their 0.0 pad
    lanes would beat all-negative real scores — phase 2 must dead-mask pad
    lanes BEFORE the finalist top-k or every finalist is garbage."""
    from sibrar_tpu.ops.pallas_window import pallas_masked_topk

    rng = np.random.default_rng(5)
    b, d, c, k = 4, 129, 300, 10
    u = -np.abs(rng.normal(size=(b, d))).astype(np.float32)
    items = np.abs(rng.normal(size=(c, d))).astype(np.float32)
    scores = u @ items.T  # strictly negative: pad zeros beat every item
    ov, oi = lax.top_k(jnp.asarray(scores), k)
    v, i = pallas_masked_topk(jnp.asarray(u), jnp.asarray(items), None, None,
                              k, interpret=True)
    np.testing.assert_allclose(np.asarray(v), np.asarray(ov), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(oi))
