"""Exactness tests for the fused 0/1-CSR × dense matmul (ops/pallas_spmm,
interpret mode). Oracle: densify + matmul (the InteractionTower dense path)."""
import jax
import jax.numpy as jnp
import numpy as np

from sibrar_tpu.ops.pallas_spmm import spmm_onehot


def _mk(b=11, l=7, n_cols=300, h=16, seed=0):
    rng = np.random.default_rng(seed)
    cols = rng.integers(0, n_cols, size=(b, l)).astype(np.int32)
    # distinct cols within each row (0/1 semantics: no repeats)
    for r in range(b):
        cols[r] = rng.choice(n_cols, size=l, replace=False)
    mask = rng.random((b, l)) < 0.7
    mask[3] = False  # an empty row
    kernel = rng.standard_normal((n_cols, h)).astype(np.float32)
    return (jnp.asarray(cols), jnp.asarray(mask), jnp.asarray(kernel))


def _dense_oracle(cols, mask, kernel):
    b, l = cols.shape
    n_cols = kernel.shape[0]
    vec = np.zeros((b, n_cols), np.float32)
    c, m = np.asarray(cols), np.asarray(mask)
    for r in range(b):
        vec[r, c[r][m[r]]] = 1.0
    return vec, vec @ np.asarray(kernel)


def test_spmm_forward_matches_dense():
    cols, mask, kernel = _mk()
    _, ref = _dense_oracle(cols, mask, kernel)
    out = spmm_onehot(cols, mask, kernel, True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_spmm_forward_multiple_weight_tiles():
    cols, mask, kernel = _mk(b=9, l=5, n_cols=5000, h=8, seed=1)
    _, ref = _dense_oracle(cols, mask, kernel)
    out = spmm_onehot(cols, mask, kernel, True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_spmm_gradient_matches_dense():
    cols, mask, kernel = _mk(b=10, l=6, n_cols=250, h=12, seed=2)
    vec, _ = _dense_oracle(cols, mask, kernel)
    g_out = np.asarray(
        np.random.default_rng(3).standard_normal((10, 12)), np.float32)

    def loss(k):
        return jnp.sum(spmm_onehot(cols, mask, k, True) * g_out)

    dk = jax.grad(loss)(kernel)
    ref_dk = vec.T @ g_out
    np.testing.assert_allclose(np.asarray(dk), ref_dk, rtol=1e-5, atol=1e-5)


def test_spmm_jit_and_value_grad():
    cols, mask, kernel = _mk(b=8, l=4, n_cols=260, h=8, seed=4)

    @jax.jit
    def f(k):
        return jnp.sum(spmm_onehot(cols, mask, k, True) ** 2)

    v, dk = jax.value_and_grad(f)(kernel)
    assert np.isfinite(float(v))
    assert np.asarray(dk).shape == kernel.shape
