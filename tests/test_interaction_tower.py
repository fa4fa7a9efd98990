"""InteractionTower: sparse (embedding-bag) vs dense first layer must be
numerically identical; the static gate picks the path by sparsity regime."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from sibrar_tpu.models.layers import InteractionTower
from sibrar_tpu.ops.sparse import DeviceCSR


def _tower_and_tables(n_rows, n_cols, nnz_per_row, seed=0, **kw):
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n_rows), nnz_per_row)
    cols = np.concatenate([rng.choice(n_cols, nnz_per_row, replace=False)
                           for _ in range(n_rows)])
    csr = DeviceCSR.from_scipy(sp.csr_matrix(
        (np.ones(len(rows)), (rows, cols)), shape=(n_rows, n_cols)))
    tower = InteractionTower(
        entity="user", n_rows=n_rows, n_cols=n_cols,
        max_row_len=csr.max_row_len, nnz=csr.nnz, **kw)
    tables = {"user__inter_indptr": csr.indptr, "user__inter_indices": csr.indices}
    return tower, tables, csr


def _dense_reference(csr, idxs, kernel, bias, normalize=False, scale=None):
    dense = np.zeros((len(idxs), csr.n_cols), np.float32)
    for r, u in enumerate(np.asarray(idxs)):
        dense[r, np.asarray(csr.indices[csr.indptr[u]:csr.indptr[u + 1]])] = 1.0
    if normalize:
        norms = np.linalg.norm(dense, axis=1, keepdims=True)
        dense = dense / np.maximum(norms, 1e-8)
    pre = dense @ np.asarray(kernel)
    if scale is not None:
        pre = pre * np.asarray(scale)
    return np.maximum(pre + np.asarray(bias), 0.0)  # relu output_fn


@pytest.mark.parametrize("normalize", [False, True])
def test_bag_path_matches_dense_math(normalize):
    # n_cols huge relative to row length → bag path selected
    tower, tables, csr = _tower_and_tables(
        12, 8192, nnz_per_row=4, layer_sizes=(16,), normalize=normalize)
    idxs = jnp.asarray([0, 3, 7, 11], jnp.int32)
    variables = tower.init(jax.random.PRNGKey(0), idxs)
    variables = {"params": variables["params"], "tables": tables}
    out = tower.apply(variables, idxs)
    ref = _dense_reference(csr, idxs, variables["params"]["kernel"],
                           variables["params"]["bias"], normalize=normalize)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_dense_path_matches_dense_math():
    # short catalog → dense path selected; same math
    tower, tables, csr = _tower_and_tables(
        12, 64, nnz_per_row=10, layer_sizes=(16,))
    idxs = jnp.asarray([1, 2], jnp.int32)
    variables = tower.init(jax.random.PRNGKey(0), idxs)
    variables = {"params": variables["params"], "tables": tables}
    out = tower.apply(variables, idxs)
    ref = _dense_reference(csr, idxs, variables["params"]["kernel"],
                           variables["params"]["bias"])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_scale_hook_zeroes_to_bias():
    """scale=0 (DropoutNet preference dropout) leaves exactly the bias."""
    tower, tables, _ = _tower_and_tables(
        6, 8192, nnz_per_row=4, layer_sizes=(8,), output_fn=None)
    idxs = jnp.asarray([0, 1], jnp.int32)
    variables = tower.init(jax.random.PRNGKey(0), idxs)
    variables = {"params": variables["params"], "tables": tables}
    out = tower.apply(variables, idxs, scale=jnp.zeros((2, 1)))
    np.testing.assert_allclose(
        np.asarray(out), np.broadcast_to(
            np.asarray(variables["params"]["bias"]), (2, 8)), rtol=1e-6)


def test_multi_layer_tower():
    tower, tables, _ = _tower_and_tables(
        6, 8192, nnz_per_row=4, layer_sizes=(16, 8), output_fn="relu")
    idxs = jnp.asarray([0, 5], jnp.int32)
    variables = tower.init(jax.random.PRNGKey(0), idxs)
    variables = {"params": variables["params"], "tables": tables}
    out = tower.apply(variables, idxs)
    assert out.shape == (2, 8)
    assert np.all(np.asarray(out) >= 0)


def test_interaction_tower_spmm_path_matches_dense():
    """The fused spmm path must reproduce the densify+matmul path (values and
    kernel gradients), incl. normalize and multi-dim idxs."""
    from sibrar_tpu.models import layers as L

    tower, tables, csr = _tower_and_tables(
        12, 64, nnz_per_row=10, layer_sizes=(16,), normalize=True)
    idxs = jnp.asarray([[1, 2], [0, 5]], jnp.int32)  # [B, 1+n] train layout
    variables = tower.init(jax.random.PRNGKey(0), idxs)
    variables = {"params": variables["params"], "tables": tables}

    def run():
        out = tower.apply(variables, idxs)
        grad = jax.grad(lambda p: jnp.sum(tower.apply(
            {"params": p, "tables": tables}, idxs) ** 2))(variables["params"])
        return out, grad

    ref_out, ref_grad = run()
    orig = L.INTERACTION_SPMM
    try:
        L.INTERACTION_SPMM = "interpret"
        got_out, got_grad = run()
    finally:
        L.INTERACTION_SPMM = orig
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ref_grad),
                    jax.tree_util.tree_leaves(got_grad)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_tower_cols_pad_table_end_to_end(monkeypatch):
    """With the seg-gather cap forced to 0, the towers declare the
    `{entity}__inter_cols_pad` table, `populate_tables` splices the matching
    array from DeviceData, and a DMF train epoch + validation run
    bit-identical to the span-walk configuration."""
    import sibrar_tpu.ops.sparse as sparse_mod
    from sibrar_tpu.config.schema import (
        DatasetConfig,
        EvalConfig,
        LearningConfig,
    )
    from sibrar_tpu.data.synthetic import make_synthetic_splits
    from sibrar_tpu.eval.evaluator import FullEvaluator
    from sibrar_tpu.models.dmf import DeepMatrixFactorization
    from sibrar_tpu.train.trainer import Trainer

    splits = make_synthetic_splits(n_users=30, n_items=40,
                                   n_interactions=500, seed=6)

    def run(patched: bool, mesh=None):
        if patched:
            monkeypatch.setattr(sparse_mod, "_SEG_GATHER_MAX_BYTES", 0)
        else:
            monkeypatch.undo()
        train, val = splits["train"], splits["val"]
        data = train.to_device()
        model = DeepMatrixFactorization.build_from_conf(
            {"u_mid_layers": [16], "i_mid_layers": [16], "final_dimension": 8},
            train, data)
        learn = LearningConfig(n_epochs=1, lr=1e-3, rec_loss="bpr",
                               optimizing_metric="ndcg@10")
        ev = FullEvaluator(EvalConfig(top_k=[10], metrics=["ndcg"]), val,
                           device_data=data)
        tr = Trainer(model, train, ev, learn,
                     DatasetConfig(n_negative_samples=4), batch_size=32,
                     seed=3, device_data=data, mesh=mesh)
        from flax import traverse_util

        flat = {k[-1]: v for k, v in
                traverse_util.flatten_dict(tr.state.tables).items()}
        if patched:
            assert "user__inter_cols_pad" in flat
            assert "item__inter_cols_pad" in flat
            # the spliced array is the real materialization, not init zeros
            assert np.asarray(flat["user__inter_cols_pad"]).max() > 0
        else:
            assert "user__inter_cols_pad" not in flat
        loss = tr.train_epoch()["train/loss"]
        return loss, tr.validate()["ndcg@10"]

    base = run(False)
    padded = run(True)
    np.testing.assert_allclose(padded, base, rtol=0, atol=0)

    # the padded tables also ride the (data, item) mesh (replicated like
    # every other table; the batch shards over data)
    from sibrar_tpu.parallel.mesh import make_mesh

    meshed = run(True, mesh=make_mesh(8))
    np.testing.assert_allclose(meshed, base, rtol=1e-5, atol=1e-6)
