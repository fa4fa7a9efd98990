"""Parity tests for the transpose-free dW GEMM (ops/pallas_dw) and its
custom-vjp wiring into the InteractionTower dense path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sibrar_tpu.ops.pallas_dw import dw_matmul, dw_viable


@pytest.mark.parametrize("r,c,h", [(64, 256, 128), (37, 300, 130),
                                   (8, 128, 128), (513, 1111, 65)])
def test_dw_matmul_matches_xla(r, c, h):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    vec = (jax.random.uniform(k1, (r, c)) < 0.1).astype(jnp.float32)
    g = jax.random.normal(k2, (r, h), jnp.float32)
    got = dw_matmul(vec, g, interpret=True)
    want = vec.T @ g
    assert got.shape == want.shape == (c, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dw_matmul_bf16_vec():
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    vec = (jax.random.uniform(k1, (40, 200)) < 0.2).astype(jnp.bfloat16)
    g = jax.random.normal(k2, (40, 96), jnp.float32)
    got = dw_matmul(vec, g, interpret=True)
    want = vec.astype(jnp.float32).T @ g
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dw_viable_gates_block_budget():
    assert dw_viable(5632, 50048, 512)
    assert not dw_viable(5632, 50048, 4096)  # h beyond the tile cap


def test_tower_grads_identical_through_dw_kernel():
    """InteractionTower dense-path kernel grads: interpret-mode pallas dW
    vs the plain XLA backward must agree (both ride f32 dots on CPU)."""
    import scipy.sparse as sp

    from sibrar_tpu.models import layers
    from sibrar_tpu.ops.sparse import DeviceCSR

    rng = np.random.default_rng(0)
    n_rows, n_cols, L = 24, 300, 9
    rows = np.repeat(np.arange(n_rows), L)
    cols = np.concatenate([rng.choice(n_cols, L, replace=False)
                           for _ in range(n_rows)])
    csr = DeviceCSR.from_scipy(sp.csr_matrix(
        (np.ones(len(rows)), (rows, cols)), shape=(n_rows, n_cols)))
    tower = layers.InteractionTower(
        entity="user", n_rows=n_rows, n_cols=n_cols, max_row_len=L,
        nnz=csr.nnz, layer_sizes=(16,), normalize=True)
    idxs = jnp.arange(n_rows, dtype=jnp.int32)
    variables = tower.init(jax.random.PRNGKey(0), idxs)
    tables = {"user__inter_indptr": csr.indptr,
              "user__inter_indices": csr.indices}

    params = variables["params"]

    def loss(p):
        out = tower.apply({"params": p, "tables": tables}, idxs)
        return (out ** 2).sum()

    # force the dense path regardless of break-even
    old_factor = layers.BAG_BREAK_EVEN_FACTOR
    layers.BAG_BREAK_EVEN_FACTOR = 10 ** 9
    try:
        layers.DW_KERNEL = False
        g_xla = jax.grad(loss)(params)
        layers.DW_KERNEL = "interpret"
        g_pl = jax.grad(loss)(params)
    finally:
        layers.DW_KERNEL = "auto"
        layers.BAG_BREAK_EVEN_FACTOR = old_factor
    flat_x, _ = jax.tree_util.tree_flatten(g_xla)
    flat_p, _ = jax.tree_util.tree_flatten(g_pl)
    for a, b in zip(flat_x, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
