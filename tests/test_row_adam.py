"""Row-sparse table optimizer (train/row_adam.py + Embedding row injection).

Semantics under test (torch.optim.SparseAdam parity):
- injected-rows autodiff produces exactly the dense table grad restricted
  to touched rows (duplicates coalesce like dense scatter-add);
- one row_adam step equals dense optax adam on the touched rows (zero-init
  moments make untouched rows a no-op for BOTH on step 1);
- the documented divergence: dense adam coasts previously-touched rows on
  momentum, sparse freezes them;
- Trainer integration: masked dense chain (no moment buffers for tables),
  learning progresses, untouched rows keep their init values, checkpoints
  round-trip.
"""
import os

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from sibrar_tpu.train.row_adam import (
    coalesce_rows,
    find_sparse_tables,
    row_adam_init,
    row_adam_update,
)


def test_coalesce_rows_matches_numpy_sums():
    rng = np.random.default_rng(0)
    idx = np.array([3, 1, 3, 3, 0, 1], np.int32)
    g = rng.normal(size=(6, 4)).astype(np.float32)
    s_idx, g_c = coalesce_rows(jnp.asarray(idx), jnp.asarray(g))
    s_idx, g_c = np.asarray(s_idx), np.asarray(g_c)
    assert list(s_idx) == sorted(idx)
    for p, i in enumerate(s_idx):
        np.testing.assert_allclose(g_c[p], g[idx == i].sum(0), rtol=1e-6)


def test_rows_grad_equals_dense_table_grad():
    """Injected-rows backward == dense scatter-add grad on touched rows
    (with duplicate indices in the batch)."""
    from sibrar_tpu.models.layers import Embedding

    n, d = 12, 8
    emb = Embedding(num_embeddings=n, features=d)
    idxs = jnp.asarray([2, 5, 2, 7], jnp.int32)
    v = emb.init(jax.random.PRNGKey(0), idxs)
    table = v["params"]["embedding"]

    def loss_dense(tbl):
        out = emb.apply({"params": {"embedding": tbl}}, idxs)
        return jnp.sum(jnp.sin(out) * jnp.arange(1.0, d + 1.0))

    def loss_rows(rows):
        out = emb.apply({"params": {"embedding": table},
                         "rows": {"rows": rows}}, idxs)
        return jnp.sum(jnp.sin(out) * jnp.arange(1.0, d + 1.0))

    g_dense = jax.grad(loss_dense)(table)
    g_rows = jax.grad(loss_rows)(table[idxs])
    # coalesced row grads must equal the dense grad at the touched rows...
    s_idx, g_c = coalesce_rows(idxs, g_rows)
    for p, i in enumerate(np.asarray(s_idx)):
        np.testing.assert_allclose(np.asarray(g_c)[p],
                                   np.asarray(g_dense)[i], rtol=1e-6)
    # ...and the dense grad is zero elsewhere
    untouched = np.setdiff1d(np.arange(n), np.asarray(idxs))
    assert np.all(np.asarray(g_dense)[untouched] == 0.0)


def test_row_adam_step_matches_dense_adam_on_touched_rows():
    rng = np.random.default_rng(1)
    n, d, lr = 10, 8, 0.01
    table = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    idx = jnp.asarray([4, 1, 4], jnp.int32)
    g_rows = jnp.asarray(rng.normal(size=(3, d)).astype(np.float32))

    new_table, opt = row_adam_update(
        table, row_adam_init(table), idx, g_rows,
        jnp.asarray(1, jnp.int32), lr=lr)

    # dense oracle: optax adam on the scatter-added grad
    dense_g = jnp.zeros_like(table).at[idx].add(g_rows)
    tx = optax.chain(optax.scale_by_adam(), optax.scale(-lr))
    upd, _ = tx.update(dense_g, tx.init(table), table)
    oracle = optax.apply_updates(table, upd)
    np.testing.assert_allclose(np.asarray(new_table), np.asarray(oracle),
                               rtol=1e-5, atol=1e-7)
    # moments live only on touched rows
    untouched = np.setdiff1d(np.arange(n), np.asarray(idx))
    assert np.all(np.asarray(opt["mu"])[untouched] == 0.0)


def test_sparse_freezes_untouched_rows_where_dense_coasts():
    """Step 2 with a row absent from the batch: dense adam still moves it
    (momentum coasting); SparseAdam leaves it frozen — the documented
    semantic difference."""
    rng = np.random.default_rng(2)
    n, d, lr = 6, 8, 0.05
    table = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    g1 = jnp.asarray(rng.normal(size=(1, d)).astype(np.float32))

    # sparse: touch row 3 at t=1, nothing at t=2 (row 0 touched instead)
    t1, o1 = row_adam_update(table, row_adam_init(table),
                             jnp.asarray([3]), g1, jnp.asarray(1), lr=lr)
    t2, _ = row_adam_update(t1, o1, jnp.asarray([0]), 0.1 * g1,
                            jnp.asarray(2), lr=lr)
    np.testing.assert_array_equal(np.asarray(t2)[3], np.asarray(t1)[3])

    # dense: same grads as full-table arrays — row 3 coasts at t=2
    tx = optax.chain(optax.scale_by_adam(), optax.scale(-lr))
    st = tx.init(table)
    dg1 = jnp.zeros_like(table).at[jnp.asarray([3])].add(g1)
    upd, st = tx.update(dg1, st, table)
    d1 = optax.apply_updates(table, upd)
    dg2 = jnp.zeros_like(table).at[jnp.asarray([0])].add(0.1 * g1)
    upd, st = tx.update(dg2, st, d1)
    d2 = optax.apply_updates(d1, upd)
    assert not np.allclose(np.asarray(d2)[3], np.asarray(d1)[3])


def _tiny_trainer(sparse: bool, seed: int = 0, n_epochs: int = 2):
    from sibrar_tpu.config.schema import (
        DatasetConfig,
        EvalConfig,
        LearningConfig,
    )
    from sibrar_tpu.data.synthetic import make_synthetic_splits
    from sibrar_tpu.eval.evaluator import FullEvaluator
    from sibrar_tpu.models.mf import SGDMatrixFactorization
    from sibrar_tpu.train.trainer import Trainer

    sp = make_synthetic_splits(n_users=40, n_items=60, n_interactions=800,
                               seed=1)
    train = sp["train"]
    model = SGDMatrixFactorization(n_users=train.n_users,
                                   n_items=train.n_items, embedding_dim=16)
    learn = LearningConfig(n_epochs=n_epochs, lr=5e-3, rec_loss="bpr",
                           optimizing_metric="ndcg@10",
                           sparse_tables=sparse, sparse_table_min_rows=1)
    ev = FullEvaluator(EvalConfig(top_k=[10], metrics=["ndcg"]), sp["val"])
    return Trainer(model, train, ev, learn,
                   DatasetConfig(n_negative_samples=4),
                   batch_size=32, seed=seed), sp


def test_trainer_sparse_tables_learns_and_freezes_cold_rows():
    tr, sp = _tiny_trainer(sparse=True)
    assert set(tr._sparse_spec) == {"user_embeddings", "item_embeddings"}
    # masked dense chain: no moment buffers for the tables
    dense_state = tr.state.opt_state["dense"]
    leaves = jax.tree_util.tree_leaves(dense_state)
    table_bytes = 40 * 16 * 4
    assert all(x.size * x.dtype.itemsize < table_bytes for x in leaves
               if hasattr(x, "size"))

    init_user = np.asarray(tr.state.params["user_embeddings"]["embedding"])
    m0 = tr.train_epoch()
    m1 = tr.train_epoch()
    assert m1["train/loss"] < m0["train/loss"]
    v = tr.validate()
    assert np.isfinite(v["ndcg@10"])

    # users with no train interactions are never in a batch: rows frozen
    touched = set(np.asarray(tr.data.train_users).tolist())
    cold = [u for u in range(40) if u not in touched]
    after = np.asarray(tr.state.params["user_embeddings"]["embedding"])
    if cold:
        np.testing.assert_array_equal(after[cold], init_user[cold])
    # and trained rows moved
    hot = sorted(touched)
    assert not np.allclose(after[hot], init_user[hot])


def test_trainer_sparse_checkpoint_roundtrip(tmp_path):
    tr, _ = _tiny_trainer(sparse=True)
    tr.train_epoch()
    tr.save_checkpoint(str(tmp_path))

    tr2, _ = _tiny_trainer(sparse=True, seed=3)
    tr2.load_checkpoint(str(tmp_path))
    for name in ("user_embeddings", "item_embeddings"):
        np.testing.assert_array_equal(
            np.asarray(tr.state.params[name]["embedding"]),
            np.asarray(tr2.state.params[name]["embedding"]))
        np.testing.assert_array_equal(
            np.asarray(tr.state.opt_state["rows"][name]["mu"]),
            np.asarray(tr2.state.opt_state["rows"][name]["mu"]))
    # continuation stays deterministic: same next epoch from both
    m1 = tr.train_epoch()
    m2 = tr2.train_epoch()
    assert m1["train/loss"] == pytest.approx(m2["train/loss"], rel=1e-6)


def test_find_sparse_tables_gates():
    from sibrar_tpu.models.mf import SGDMatrixFactorization

    model = SGDMatrixFactorization(n_users=100, n_items=100,
                                   embedding_dim=16, use_user_bias=True)
    params = {
        "user_embeddings": {"embedding": jnp.zeros((100, 16))},
        "item_embeddings": {"embedding": jnp.zeros((100, 16))},
        "user_bias": {"embedding": jnp.zeros((100, 1))},  # d<8: stays dense
    }
    spec = find_sparse_tables(model, params, min_rows=50)
    assert spec == {"user_embeddings": "user", "item_embeddings": "item"}
    assert find_sparse_tables(model, params, min_rows=101) == {}


def test_sparse_tables_on_mesh_matches_single_device():
    """Row-sparse updates compose with data-parallel mesh training: the
    sharded batch gathers/scatters through GSPMD collectives and the loss
    trajectory matches the single-device run exactly."""
    from sibrar_tpu.config.schema import (
        DatasetConfig,
        EvalConfig,
        LearningConfig,
    )
    from sibrar_tpu.data.synthetic import make_synthetic_splits
    from sibrar_tpu.eval.evaluator import FullEvaluator
    from sibrar_tpu.models.mf import SGDMatrixFactorization
    from sibrar_tpu.parallel.mesh import make_mesh
    from sibrar_tpu.train.trainer import Trainer

    sp = make_synthetic_splits(n_users=40, n_items=60, n_interactions=800,
                               seed=1)
    train = sp["train"]

    def run(mesh):
        model = SGDMatrixFactorization(n_users=train.n_users,
                                       n_items=train.n_items,
                                       embedding_dim=16)
        learn = LearningConfig(n_epochs=2, lr=5e-3, rec_loss="bpr",
                               optimizing_metric="ndcg@10",
                               sparse_tables=True, sparse_table_min_rows=1)
        ev = FullEvaluator(EvalConfig(top_k=[10], metrics=["ndcg"]),
                           sp["val"])
        tr = Trainer(model, train, ev, learn,
                     DatasetConfig(n_negative_samples=4),
                     batch_size=32, seed=0, mesh=mesh)
        losses = [tr.train_epoch()["train/loss"] for _ in range(2)]
        return losses, np.asarray(
            tr.state.params["item_embeddings"]["embedding"])

    l_plain, t_plain = run(None)
    l_mesh, t_mesh = run(make_mesh(8))
    np.testing.assert_allclose(l_plain, l_mesh, rtol=1e-5)
    np.testing.assert_allclose(t_plain, t_mesh, rtol=1e-5, atol=1e-7)


def test_sparse_tables_through_cli(tmp_path):
    """learn.sparse_tables plumbs from YAML through run_experiment to the
    trainer: the run completes with finite metrics and the conf round-trips."""
    import yaml

    import run_experiment
    from sibrar_tpu.data.synthetic import (
        make_synthetic_splits,
        write_reference_artifacts,
    )

    splits = make_synthetic_splits(n_users=30, n_items=40,
                                   n_interactions=600, seed=15)
    art = str(tmp_path / "data")
    write_reference_artifacts(art, splits)
    res = str(tmp_path / "run")
    conf_path = str(tmp_path / "conf.yml")
    with open(conf_path, "w") as fh:
        yaml.safe_dump({
            "learn": {"n_epochs": 1, "lr": 0.005, "rec_loss": "bpr",
                      "optimizing_metric": "ndcg@5",
                      "sparse_tables": True, "sparse_table_min_rows": 1},
            "eval": {"top_k": [5], "metrics": ["ndcg"]},
            "loader": {"batch_size": 32, "eval_batch_size": 32},
            "dataset": {"n_negative_samples": 2},
            "model": {"embedding_dim": 8},
            "results_path": res,
        }, fh)
    run_experiment.main(["-a", "mf", "-d", art, "-t", "train_val",
                         "-c", conf_path])
    import glob

    mv = glob.glob(os.path.join(res, "**", "metrics_val.yml"),
                   recursive=True)
    assert mv, os.listdir(res)
    metrics = yaml.safe_load(open(mv[0]))
    assert np.isfinite(metrics["val/ndcg@5"])
    cy = glob.glob(os.path.join(res, "**", "conf.yml"), recursive=True)
    saved = yaml.safe_load(open(cy[0]))
    assert saved["learn"]["sparse_tables"] is True


def test_sparse_tables_protomf_learns():
    """A reg-loss model (UProtoMF: prototype/batch losses flow through the
    user rows) trains under sparse_tables and improves its loss."""
    from sibrar_tpu.config.schema import (
        DatasetConfig,
        EvalConfig,
        LearningConfig,
    )
    from sibrar_tpu.data.synthetic import make_synthetic_splits
    from sibrar_tpu.eval.evaluator import FullEvaluator
    from sibrar_tpu.models.protomf import UProtoMF
    from sibrar_tpu.train.trainer import Trainer

    sp = make_synthetic_splits(n_users=40, n_items=60, n_interactions=800,
                               seed=2)
    train = sp["train"]
    # n_prototypes >= 8: item_embed is [n_items, n_prototypes] and the
    # features>=8 sparse gate must admit it
    model = UProtoMF(n_users=train.n_users, n_items=train.n_items,
                     embedding_dim=16, n_prototypes=8)
    learn = LearningConfig(n_epochs=3, lr=5e-3, rec_loss="bpr",
                           optimizing_metric="ndcg@10",
                           sparse_tables=True, sparse_table_min_rows=1)
    ev = FullEvaluator(EvalConfig(top_k=[10], metrics=["ndcg"]), sp["val"])
    tr = Trainer(model, train, ev, learn,
                 DatasetConfig(n_negative_samples=4), batch_size=32, seed=0)
    assert set(tr._sparse_spec) == {"user_embed", "item_embed"}
    losses = [tr.train_epoch()["train/loss"] for _ in range(3)]
    assert losses[-1] < losses[0]
    assert np.isfinite(tr.validate()["ndcg@10"])


def test_sparse_tables_acf_learns():
    """ACF declares its id tables (anchors stay on the dense chain; the
    exclusiveness/inclusiveness sown losses flow through the item rows)."""
    from sibrar_tpu.config.schema import (
        DatasetConfig,
        EvalConfig,
        LearningConfig,
    )
    from sibrar_tpu.data.synthetic import make_synthetic_splits
    from sibrar_tpu.eval.evaluator import FullEvaluator
    from sibrar_tpu.models.mf import ACF
    from sibrar_tpu.train.trainer import Trainer

    sp = make_synthetic_splits(n_users=40, n_items=60, n_interactions=800,
                               seed=3)
    train = sp["train"]
    model = ACF(n_users=train.n_users, n_items=train.n_items,
                embedding_dim=16, n_anchors=4)
    learn = LearningConfig(n_epochs=3, lr=5e-3, rec_loss="bpr",
                           optimizing_metric="ndcg@10",
                           sparse_tables=True, sparse_table_min_rows=1)
    ev = FullEvaluator(EvalConfig(top_k=[10], metrics=["ndcg"]), sp["val"])
    tr = Trainer(model, train, ev, learn,
                 DatasetConfig(n_negative_samples=4), batch_size=32, seed=0)
    assert set(tr._sparse_spec) == {"user_embed", "item_embed"}
    p0 = np.asarray(tr.state.params["anchors"]).copy()
    losses = [tr.train_epoch()["train/loss"] for _ in range(3)]
    assert losses[-1] < losses[0]
    # the dense chain still trains the anchors
    assert np.abs(np.asarray(tr.state.params["anchors"]) - p0).max() > 0
    assert np.isfinite(tr.validate()["ndcg@10"])


def test_sparse_tables_requires_adam():
    from sibrar_tpu.config.schema import LearningConfig

    with pytest.raises(ValueError, match="sparse_tables"):
        LearningConfig(optimizer="adagrad", sparse_tables=True).validate()
