"""Fused Pallas score/mask/window-max kernel tests (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from sibrar_tpu.ops.pallas_score import fused_masked_topk, fused_score_wmax


def _data(b=256, c=1024, d=128, L=16, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    it = jnp.asarray(rng.normal(size=(c, d)).astype(np.float32))
    excl = np.sort(rng.integers(0, c, size=(b, L)), axis=1).astype(np.int32)
    return u, it, jnp.asarray(excl)


def _reference(u, it, excl, k):
    scores = np.asarray(u) @ np.asarray(it).T
    for r in range(scores.shape[0]):
        scores[r, np.asarray(excl[r])] = -1e30
    s = jnp.asarray(scores)
    return jax.lax.top_k(s, k), s


def test_fused_kernel_matches_reference():
    u, it, _ = _data()
    s_ref = np.asarray(u) @ np.asarray(it).T  # [B, C]
    scores_t, wmax_t = fused_score_wmax(u, it, window=64, tb=128, bc=512,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(scores_t), s_ref.T, rtol=1e-5,
                               atol=1e-4)
    ref_wmax = s_ref.reshape(256, -1, 64).max(-1)  # [B, n_win]
    np.testing.assert_allclose(np.asarray(wmax_t), ref_wmax.T, rtol=1e-5,
                               atol=1e-4)


def test_fused_masked_topk_exact():
    u, it, excl = _data(seed=1)
    (v0, i0), _ = _reference(u, it, excl, 25)
    v1, i1 = fused_masked_topk(u, it, excl, 25, window=128, tb=128, bc=512,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=1e-5,
                               atol=1e-4)


def test_fused_masked_topk_unaligned_shapes():
    """B/C/D not multiples of the tile sizes → padding path stays exact."""
    u, it, excl = _data(b=100, c=900, d=100, L=7, seed=2)
    (v0, i0), _ = _reference(u, it, excl, 15)
    v1, i1 = fused_masked_topk(u, it, excl, 15, window=128, tb=128, bc=512,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=1e-5,
                               atol=1e-4)
    # no padded catalog index can appear
    assert int(jnp.max(i1)) < 900
