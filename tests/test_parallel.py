"""Multi-device sharding tests on the 8-device virtual CPU mesh (conftest.py).

The reference has nothing distributed (SURVEY.md §2.9); these tests validate the
TPU-native mapping: DP train step over the `data` axis and catalog-sharded
full-catalog top-k over the `item` axis.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sibrar_tpu.parallel.mesh import make_mesh, sharded_topk


def test_mesh_axes():
    mesh = make_mesh(8)
    assert mesh.shape["data"] * mesh.shape["item"] == 8
    assert mesh.shape["item"] == 2  # largest pow2 with item^2 <= 8
    mesh1 = make_mesh(1)
    assert mesh1.shape["data"] == 1 and mesh1.shape["item"] == 1


def test_sharded_topk_matches_dense():
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=(6, 64)).astype(np.float32))
    vals, idxs = sharded_topk(scores, 5, mesh)
    ref_v, ref_i = jax.lax.top_k(scores, 5)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_v), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idxs), np.asarray(ref_i))


def test_sharded_topk_k_larger_than_shard():
    mesh = make_mesh(8, item_parallelism=8)
    rng = np.random.default_rng(1)
    scores = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
    # local shards hold 4 columns < k=6 → padding path
    vals, idxs = sharded_topk(scores, 6, mesh)
    ref_v, ref_i = jax.lax.top_k(scores, 6)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_v), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idxs), np.asarray(ref_i))


def test_dp_training_step_runs_sharded():
    from sibrar_tpu.config.schema import DatasetConfig, EvalConfig, LearningConfig
    from sibrar_tpu.data.synthetic import make_synthetic_splits
    from sibrar_tpu.eval.evaluator import FullEvaluator
    from sibrar_tpu.models.mf import SGDMatrixFactorization
    from sibrar_tpu.train.trainer import Trainer

    mesh = make_mesh(8)
    splits = make_synthetic_splits(n_users=48, n_items=64, n_interactions=900, seed=1)
    model = SGDMatrixFactorization(
        n_users=48, n_items=64, embedding_dim=8)
    learn = LearningConfig(n_epochs=1, lr=1e-2, rec_loss="bpr",
                           max_batches_per_epoch=2)
    ev = FullEvaluator(EvalConfig(top_k=[5]), splits["val"], evaluator_name="val")
    trainer = Trainer(model, splits["train"], ev, learn, DatasetConfig(),
                      batch_size=16 * mesh.shape["data"], seed=0, mesh=mesh)
    before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), trainer.state.params)
    losses = trainer.train_epoch()
    assert np.isfinite(losses["train/loss"])
    before_leaves = jax.tree_util.tree_leaves(before)
    after_leaves = jax.tree_util.tree_leaves(trainer.state.params)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(before_leaves, after_leaves))
    # catalog-sharded eval works end to end
    res = trainer.validate()
    assert np.isfinite(res["val/ndcg@5"])


def test_batch_size_must_divide_mesh():
    from sibrar_tpu.config.schema import DatasetConfig, EvalConfig, LearningConfig
    from sibrar_tpu.data.synthetic import make_synthetic_splits
    from sibrar_tpu.eval.evaluator import FullEvaluator
    from sibrar_tpu.models.mf import SGDMatrixFactorization
    from sibrar_tpu.train.trainer import Trainer

    mesh = make_mesh(8)
    splits = make_synthetic_splits(n_users=30, n_items=40, n_interactions=400, seed=2)
    model = SGDMatrixFactorization(n_users=30, n_items=40, embedding_dim=4)
    ev = FullEvaluator(EvalConfig(top_k=[5]), splits["val"])
    with pytest.raises(ValueError, match="divide over the mesh"):
        Trainer(model, splits["train"], ev, LearningConfig(), DatasetConfig(),
                batch_size=17, seed=0, mesh=mesh)


def test_graft_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_mesh_evaluator_matches_single_device():
    """FullEvaluator(mesh=...) computes identical metrics via per-shard top-k
    + candidate merge over the item axis."""
    from sibrar_tpu.config.schema import DatasetConfig, EvalConfig, LearningConfig
    from sibrar_tpu.data.synthetic import make_synthetic_splits
    from sibrar_tpu.eval.evaluator import FullEvaluator, evaluate_model
    from sibrar_tpu.models.mf import SGDMatrixFactorization
    from sibrar_tpu.train.trainer import Trainer

    mesh = make_mesh(8)
    splits = make_synthetic_splits(n_users=48, n_items=64, n_interactions=900,
                                   seed=1, with_features=False)
    model = SGDMatrixFactorization(n_users=48, n_items=64, embedding_dim=8)
    learn = LearningConfig(n_epochs=1, rec_loss="bpr")

    def run(mesh_arg):
        ev = FullEvaluator(EvalConfig(top_k=[5, 10]), splits["val"],
                           evaluator_name="val", mesh=mesh_arg)
        t = Trainer(model, splits["train"], ev, learn, DatasetConfig(),
                    batch_size=16, seed=0, mesh=mesh_arg)
        t.train_epoch()
        return evaluate_model(t.make_score_fn(), ev, 16)

    plain = run(None)
    sharded = run(mesh)
    assert plain.keys() == sharded.keys()
    for k in plain:
        assert abs(plain[k] - sharded[k]) < 1e-5, (k, plain[k], sharded[k])


def test_sharded_masked_topk_matches_dense_oracle():
    """Per-shard exclusion (no full [B, C] scatter) + per-shard selection +
    candidate merge == dense scatter + top-k (VERDICT r2 #4)."""
    from sibrar_tpu.parallel.mesh import sharded_masked_topk

    mesh = make_mesh(8)  # item axis = 2
    rng = np.random.default_rng(7)
    b, c, k, e = 6, 512, 10, 9
    scores = rng.normal(size=(b, c)).astype(np.float32)
    cols = np.stack([rng.choice(c, size=e, replace=False)
                     for _ in range(b)]).astype(np.int32)
    mask = rng.random((b, e)) < 0.8

    dense = scores.copy()
    for i in range(b):
        dense[i, cols[i][mask[i]]] = -1e30
    ref_v, ref_i = jax.lax.top_k(jnp.asarray(dense), k)

    for kwargs in ({"use_peel": False},
                   {"use_peel": True, "interpret": True}):
        v, i, ok = sharded_masked_topk(
            jnp.asarray(scores), jnp.asarray(cols), jnp.asarray(mask), k,
            mesh, return_ok=True, **kwargs)
        assert np.asarray(ok).all(), kwargs
        np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v),
                                   rtol=1e-6, err_msg=str(kwargs))
        # indices may differ from the oracle only on exact ties
        np.testing.assert_allclose(
            np.take_along_axis(dense, np.asarray(i), 1), np.asarray(ref_v),
            rtol=1e-6, err_msg=str(kwargs))


def test_sharded_masked_topk_k_larger_than_shard():
    from sibrar_tpu.parallel.mesh import sharded_masked_topk

    mesh = make_mesh(8, item_parallelism=8)  # local_c = 16 < k = 20
    rng = np.random.default_rng(8)
    scores = rng.normal(size=(4, 128)).astype(np.float32)
    cols = np.zeros((4, 0), np.int32)
    mask = np.zeros((4, 0), bool)
    v, i = sharded_masked_topk(jnp.asarray(scores), jnp.asarray(cols),
                               jnp.asarray(mask), 20, mesh)
    ref_v, _ = jax.lax.top_k(jnp.asarray(scores), 20)
    np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v), rtol=1e-6)


def test_tower_tensor_parallel_matches_single_device():
    """Interaction-tower first-layer kernels ([n_entities, h] — the zoo's only
    large weights, SURVEY.md §5.8) are row-sharded over the item axis when a
    mesh is active: the params/opt-state leaves carry P('item', None), the
    epoch still trains, and metrics match the single-device run (the sharded
    contraction changes only partial-sum order)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from sibrar_tpu.config.schema import DatasetConfig, EvalConfig, LearningConfig
    from sibrar_tpu.data.synthetic import make_synthetic_splits
    from sibrar_tpu.eval.evaluator import FullEvaluator, evaluate_model
    from sibrar_tpu.models.dmf import DeepMatrixFactorization
    from sibrar_tpu.train.trainer import Trainer

    mesh = make_mesh(8)  # (data=4, item=2)
    # n_users/n_items divisible by the 2-sized item axis
    splits = make_synthetic_splits(n_users=48, n_items=64, n_interactions=900,
                                   seed=3, with_features=False)
    learn = LearningConfig(n_epochs=1, rec_loss="bpr", optimizing_metric="ndcg@5")

    def run(mesh_arg):
        dd = splits["train"].to_device()
        model = DeepMatrixFactorization.build_from_conf(
            {"u_mid_layers": [16], "i_mid_layers": [16], "final_dimension": 8},
            splits["train"], dd)
        ev = FullEvaluator(EvalConfig(top_k=[5]), splits["val"],
                           evaluator_name="val", mesh=mesh_arg)
        t = Trainer(model, splits["train"], ev, learn, DatasetConfig(),
                    batch_size=16, seed=0, mesh=mesh_arg, device_data=dd,
                    tower_min_rows=48)  # both towers qualify at toy scale
        t.train_epoch()
        return t, evaluate_model(t.make_score_fn(), ev, 16)

    t_sh, sharded = run(mesh)

    def row_sharded(x):  # spec may normalize P('item', None) -> P('item')
        return x.sharding.is_equivalent_to(
            NamedSharding(mesh, P("item", None)), x.ndim)

    # the tower kernels (and their adam moments) actually carry the TP spec
    kernels = [t_sh.state.params["user_nn"]["kernel"],
               t_sh.state.params["item_nn"]["kernel"]]
    assert all(row_sharded(k) for k in kernels)
    mus = jax.tree_util.tree_leaves(t_sh.state.opt_state)
    assert any(getattr(m, "ndim", 0) == 2 and m.shape[0] == 64
               and row_sharded(m) for m in mus)
    # hidden-layer kernels stay replicated
    rep = NamedSharding(mesh, P())
    for leaf in jax.tree_util.tree_leaves(t_sh.state.params["user_nn"]["rest"]):
        assert leaf.sharding.is_equivalent_to(rep, leaf.ndim)

    _, plain = run(None)
    assert plain.keys() == sharded.keys()
    for k in plain:
        np.testing.assert_allclose(plain[k], sharded[k], rtol=2e-4, atol=2e-4)


def test_tower_tp_checkpoint_roundtrip(tmp_path):
    """Checkpoint save/restore under tower TP: restored kernels are re-sharded
    and training continues."""
    from sibrar_tpu.config.schema import DatasetConfig, EvalConfig, LearningConfig
    from sibrar_tpu.data.synthetic import make_synthetic_splits
    from sibrar_tpu.eval.evaluator import FullEvaluator
    from sibrar_tpu.models.dmf import DeepMatrixFactorization
    from sibrar_tpu.train.trainer import Trainer

    mesh = make_mesh(8)
    splits = make_synthetic_splits(n_users=48, n_items=64, n_interactions=900,
                                   seed=3, with_features=False)
    learn = LearningConfig(n_epochs=1, rec_loss="bpr", optimizing_metric="ndcg@5")

    def trainer():
        dd = splits["train"].to_device()
        model = DeepMatrixFactorization.build_from_conf(
            {"u_mid_layers": [16], "i_mid_layers": [16], "final_dimension": 8},
            splits["train"], dd)
        ev = FullEvaluator(EvalConfig(top_k=[5]), splits["val"],
                           evaluator_name="val", mesh=mesh)
        return Trainer(model, splits["train"], ev, learn, DatasetConfig(),
                       batch_size=16, seed=0, mesh=mesh, device_data=dd,
                       tower_min_rows=48)

    a = trainer()
    a.train_epoch()
    a.save_checkpoint(str(tmp_path / "ckpt"))
    b = trainer()
    b.load_checkpoint(str(tmp_path / "ckpt"))
    from jax.sharding import NamedSharding, PartitionSpec as P
    k = b.state.params["item_nn"]["kernel"]
    assert k.sharding.is_equivalent_to(NamedSharding(mesh, P("item", None)),
                                       k.ndim)
    losses = b.train_epoch()
    assert np.isfinite(losses["train/loss"])


def test_tower_tp_bag_path_matches_single_device(monkeypatch):
    """TP also holds on the embedding-bag first layer (gather from the
    row-sharded kernel): GSPMD turns the take into masked partial gathers +
    a psum; results must match the unsharded run."""
    from sibrar_tpu.config.schema import DatasetConfig, EvalConfig, LearningConfig
    from sibrar_tpu.data.synthetic import make_synthetic_splits
    from sibrar_tpu.eval.evaluator import FullEvaluator, evaluate_model
    from sibrar_tpu.models import layers as layers_mod
    from sibrar_tpu.models.dmf import DeepMatrixFactorization
    from sibrar_tpu.train.trainer import Trainer

    monkeypatch.setattr(layers_mod, "BAG_BREAK_EVEN_FACTOR", 0)  # force bag
    mesh = make_mesh(8)
    splits = make_synthetic_splits(n_users=48, n_items=64, n_interactions=900,
                                   seed=5, with_features=False)
    learn = LearningConfig(n_epochs=1, rec_loss="bpr", optimizing_metric="ndcg@5")

    def run(mesh_arg):
        dd = splits["train"].to_device()
        model = DeepMatrixFactorization.build_from_conf(
            {"u_mid_layers": [16], "i_mid_layers": [16], "final_dimension": 8},
            splits["train"], dd)
        ev = FullEvaluator(EvalConfig(top_k=[5]), splits["val"],
                           evaluator_name="val", mesh=mesh_arg)
        t = Trainer(model, splits["train"], ev, learn, DatasetConfig(),
                    batch_size=16, seed=0, mesh=mesh_arg, device_data=dd,
                    tower_min_rows=48)
        t.train_epoch()
        return evaluate_model(t.make_score_fn(), ev, 16)

    sharded = run(mesh)
    plain = run(None)
    for k in plain:
        np.testing.assert_allclose(plain[k], sharded[k], rtol=2e-4, atol=2e-4)


def test_sharded_masked_topk_full_mesh_odd_batch():
    """The user batch shards over the data axis (padded to its multiple and
    sliced back): results identical to the dense oracle for a B that divides
    neither the data axis nor the batch evenly."""
    from sibrar_tpu.parallel.mesh import sharded_masked_topk

    mesh = make_mesh(8)  # data=4, item=2
    rng = np.random.default_rng(7)
    b, c, e, k = 21, 64, 5, 6  # 21 % 4 != 0
    scores = jnp.asarray(rng.standard_normal((b, c)).astype(np.float32))
    cols = jnp.asarray(rng.integers(0, c, size=(b, e)).astype(np.int32))
    mask = jnp.asarray(rng.random((b, e)) < 0.8)
    v, i = sharded_masked_topk(scores, cols, mask, k, mesh)
    dense = np.asarray(scores).copy()
    for r in range(b):
        dense[r, np.asarray(cols)[r][np.asarray(mask)[r]]] = -1e30
    ref_v, ref_i = jax.lax.top_k(jnp.asarray(dense), k)
    np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))


def test_sharded_masked_topk_dot_matches_oracle():
    """Per-shard fused GEMM→peel chain (interpret mode) == dense oracle,
    including an odd catalog (pad positions excluded via the exclusion
    channel) and a batch that doesn't divide the data axis."""
    from sibrar_tpu.parallel.mesh import (
        sharded_dot_viable,
        sharded_masked_topk_dot,
    )

    mesh = make_mesh(8)  # data=4, item=2
    rng = np.random.default_rng(11)
    # c odd vs 2 shards -> one pad column; big enough per shard that the
    # peel margins hold (local nw >= 2m)
    b, c, d, e, k = 10, 5201, 16, 7, 9
    u = rng.standard_normal((b, d)).astype(np.float32)
    it = rng.standard_normal((c, d)).astype(np.float32)
    cols = np.sort(rng.integers(0, c, size=(b, e)), axis=1).astype(np.int32)
    mask = rng.random((b, e)) < 0.8
    assert sharded_dot_viable(c, k, e, mesh, interpret=True)

    v, i, ok = sharded_masked_topk_dot(
        jnp.asarray(u), jnp.asarray(it), jnp.asarray(cols), jnp.asarray(mask),
        k, mesh, interpret=True)
    assert np.asarray(ok).all()
    dense = u @ it.T
    for r in range(b):
        dense[r, cols[r][mask[r]]] = -np.inf
    ref_v, _ = jax.lax.top_k(jnp.asarray(dense), k)
    # same XLA matmul? no — the Pallas GEMM is bitwise-identical to the XLA
    # matmul per its contract, but compare values with tolerance anyway
    np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.take_along_axis(u @ it.T, np.asarray(i), 1), np.asarray(v),
        rtol=1e-5, atol=1e-5)
    assert int(np.asarray(i).max()) < c


def test_sharded_dot_eval_batch_matches_scores_path():
    """FullEvaluator's sharded dot fast path == its generic scores path on
    the same users (metrics and coverage identical)."""
    from sibrar_tpu.config.schema import EvalConfig
    from sibrar_tpu.data.synthetic import make_synthetic_splits
    from sibrar_tpu.eval.evaluator import FullEvaluator

    mesh = make_mesh(8)
    splits = make_synthetic_splits(n_users=32, n_items=6001,  # odd vs 2 shards
                                   n_interactions=700, seed=9,
                                   with_features=False)
    val = splits["val"]
    c = val.n_items_in_split
    rng = np.random.default_rng(3)
    u_mat = jnp.asarray(rng.standard_normal((val.n_users, 8)).astype(np.float32))
    items = jnp.asarray(rng.standard_normal((c, 8)).astype(np.float32))
    ev = FullEvaluator(EvalConfig(top_k=[5, 10]), val, evaluator_name="val",
                       mesh=mesh)
    eb = ev.make_dot_eval_batch(lambda u: u_mat[u], items, interpret=True)
    assert eb is not None
    users = jnp.asarray(np.asarray(val.users_in_split)[:16], jnp.int32)
    m_dot, cov_dot, ok = eb(users)
    assert np.asarray(ok).all()
    m_ref, cov_ref, _ = ev._eval_batch_raw(u_mat[users] @ items.T, users)
    for k in m_ref:
        np.testing.assert_allclose(np.asarray(m_dot[k]), np.asarray(m_ref[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    for k in cov_ref:
        np.testing.assert_array_equal(np.asarray(cov_dot[k]),
                                      np.asarray(cov_ref[k]))


def test_chunked_item_repr_sharded_matches_default():
    """The chunked catalog encode with mesh sharding constraints returns the
    same metrics as the unchunked path."""
    from sibrar_tpu.config.schema import DatasetConfig, EvalConfig, LearningConfig
    from sibrar_tpu.data.synthetic import make_synthetic_splits
    from sibrar_tpu.eval.evaluator import FullEvaluator, evaluate_model
    from sibrar_tpu.models.mf import SGDMatrixFactorization
    from sibrar_tpu.train.trainer import Trainer

    mesh = make_mesh(8)
    splits = make_synthetic_splits(n_users=48, n_items=64, n_interactions=900,
                                   seed=1, with_features=False)
    model = SGDMatrixFactorization(n_users=48, n_items=64, embedding_dim=8)
    ev = FullEvaluator(EvalConfig(top_k=[5]), splits["val"],
                       evaluator_name="val", mesh=mesh)
    t = Trainer(model, splits["train"], ev,
                LearningConfig(n_epochs=1, rec_loss="bpr",
                               optimizing_metric="ndcg@5"),
                DatasetConfig(), batch_size=16, seed=0, mesh=mesh)
    t.train_epoch()
    whole = evaluate_model(t.make_score_fn(), ev, 16)
    chunked = evaluate_model(t.make_score_fn(item_chunk=16), ev, 16)
    for k in whole:
        np.testing.assert_allclose(whole[k], chunked[k], rtol=1e-5,
                                   atol=1e-6, err_msg=k)


def test_evaluate_model_sharded_dot_driver_end_to_end():
    """The FULL fused whole-eval driver (lax.map over batches) running the
    sharded dot chain (shard_map + Pallas peel per tile, interpret mode):
    metrics equal the single-device run. This is the production codepath a
    v5e-8 takes for dot models — without this test its first execution
    would be on real hardware."""
    from sibrar_tpu.config.schema import EvalConfig
    from sibrar_tpu.data.synthetic import make_synthetic_splits
    from sibrar_tpu.eval.evaluator import FullEvaluator, evaluate_model

    mesh = make_mesh(8)
    splits = make_synthetic_splits(n_users=32, n_items=6001,
                                   n_interactions=700, seed=9,
                                   with_features=False)
    val = splits["val"]
    c = val.n_items_in_split
    rng = np.random.default_rng(5)
    u_mat = jnp.asarray(rng.standard_normal((val.n_users, 8)).astype(np.float32))
    items = jnp.asarray(rng.standard_normal((c, 8)).astype(np.float32))

    def score_fn(u):
        return u_mat[u] @ items.T

    score_fn.dot_parts = (lambda u: u_mat[u], items)

    def run(mesh_arg, interp):
        ev = FullEvaluator(EvalConfig(top_k=[5, 10]), val,
                           evaluator_name="val", mesh=mesh_arg)
        ev.dot_interpret = interp
        return evaluate_model(score_fn, ev, batch_size=16)

    sharded = run(mesh, True)
    plain = run(None, False)  # CPU single-device: generic scores path
    assert plain.keys() == sharded.keys()
    for k in plain:
        np.testing.assert_allclose(plain[k], sharded[k], rtol=1e-5,
                                   atol=1e-6, err_msg=k)


def test_sharded_masked_topk_fuzz_panel():
    """Seeded fuzz over the 2-D-sharded selection: random B (incl. not
    dividing the data axis), odd catalogs, exclusion widths, tie-heavy and
    clustered score distributions — both the scatter chain and the
    interpret-mode per-shard peel must match the dense oracle."""
    from sibrar_tpu.parallel.mesh import sharded_masked_topk

    mesh = make_mesh(8)  # data=4, item=2
    rng = np.random.default_rng(123)
    for trial in range(6):
        b = int(rng.integers(2, 14))
        c = int(rng.integers(700, 3000))
        k = int(rng.integers(1, 30))
        e = int(rng.integers(1, 40))
        if c % 2:
            c += 1  # catalog must divide the item axis for this API
        dist = trial % 3
        if dist == 0:
            s = rng.standard_normal((b, c))
        elif dist == 1:
            s = rng.integers(-4, 4, size=(b, c)).astype(float)  # ties
        else:
            s = rng.standard_normal((b, c))
            s[:, : c // 3] += 8.0  # clustered winners on one shard
        s = s.astype(np.float32)
        cols = np.stack([np.sort(rng.choice(c, size=e, replace=False))
                         for _ in range(b)]).astype(np.int32)
        mask = rng.random((b, e)) < 0.9
        dense = s.copy()
        for r in range(b):
            dense[r, cols[r][mask[r]]] = -1e30
        ref_v, _ = jax.lax.top_k(jnp.asarray(dense), k)
        msg = f"trial {trial}: b={b} c={c} k={k} e={e} dist={dist}"
        for kwargs in ({"use_peel": False, "return_ok": True},
                       {"use_peel": True, "return_ok": True,
                        "interpret": True}):
            v, i, ok = sharded_masked_topk(
                jnp.asarray(s), jnp.asarray(cols), jnp.asarray(mask), k,
                mesh, **kwargs)
            if kwargs["use_peel"] and not np.asarray(ok).all():
                continue  # legitimate redo signal on degenerate ties
            np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v),
                                       rtol=1e-6, err_msg=msg + str(kwargs))
            np.testing.assert_allclose(
                np.take_along_axis(dense, np.asarray(i), 1),
                np.asarray(ref_v), rtol=1e-6, err_msg=msg + str(kwargs))


def test_explicit_non_peel_method_forces_scatter_per_shard(monkeypatch):
    """An explicit non-peel topk_method ('full') on an item-sharded mesh must
    pin the fallback-free per-shard scatter (use_peel=False): those methods
    disable the eager driver's ok sync/redo, so an auto-gated per-shard peel
    could silently accept tripped exactness flags."""
    import sibrar_tpu.parallel.mesh as pmesh
    from sibrar_tpu.config.schema import EvalConfig
    from sibrar_tpu.data.synthetic import make_synthetic_splits
    from sibrar_tpu.eval.evaluator import FullEvaluator

    seen = {}
    real = pmesh.sharded_masked_topk

    def spy(*a, **kw):
        seen["use_peel"] = kw.get("use_peel", "missing")
        return real(*a, **kw)

    monkeypatch.setattr(pmesh, "sharded_masked_topk", spy)
    mesh = make_mesh(8)
    splits = make_synthetic_splits(n_users=48, n_items=64, n_interactions=900,
                                   seed=3, with_features=False)
    ev = FullEvaluator(EvalConfig(top_k=[5], topk_method="full"),
                       splits["val"], evaluator_name="val", mesh=mesh)
    assert not ev._peel_possible  # no ok sync/redo on this config...
    rng = np.random.default_rng(0)
    u = jnp.arange(16, dtype=jnp.int32)
    scores = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))
    ev.eval_batch(u, scores)
    # ...so the per-shard selection must be the fallback-free scatter
    assert seen["use_peel"] is False


# ------------------------------------------------- hierarchical (DCN) merge
def test_hierarchical_merge_matches_flat():
    """The two-stage ICI→DCN candidate merge (explicit host groups) must be
    BITWISE identical to the flat one-stage merge — for plain top-k, the
    masked scatter path, and the masked peel path (VERDICT r3 #2)."""
    from sibrar_tpu.parallel.mesh import sharded_masked_topk, sharded_topk

    mesh = make_mesh(8, item_parallelism=8)
    groups = ((0, 1, 2, 3), (4, 5, 6, 7))
    rng = np.random.default_rng(11)
    b, c, k, e = 16, 1024, 12, 7
    scores = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32))
    cols = jnp.asarray(rng.integers(0, c, (b, e)).astype(np.int32))
    mask = jnp.asarray(rng.random((b, e)) < 0.8)

    vf, i_f = sharded_topk(scores, k, mesh, item_groups=None)
    vh, i_h = sharded_topk(scores, k, mesh, item_groups=groups)
    np.testing.assert_array_equal(np.asarray(vf), np.asarray(vh))
    np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_h))

    for kwargs in ({"use_peel": False},
                   {"use_peel": True, "interpret": True}):
        vf, if_, okf = sharded_masked_topk(
            scores, cols, mask, k, mesh, return_ok=True, item_groups=None,
            **kwargs)
        vh, ih, okh = sharded_masked_topk(
            scores, cols, mask, k, mesh, return_ok=True, item_groups=groups,
            **kwargs)
        np.testing.assert_array_equal(np.asarray(vf), np.asarray(vh))
        np.testing.assert_array_equal(np.asarray(if_), np.asarray(ih))
        np.testing.assert_array_equal(np.asarray(okf), np.asarray(okh))
    # uneven groups are rejected as a flat merge, not silently misgrouped
    from sibrar_tpu.parallel.mesh import hierarchical_item_groups

    assert hierarchical_item_groups(mesh) is None  # single host -> flat


def test_multihost_distributed_2proc():
    """SURVEY §5.8: two REAL processes joined via jax.distributed (CPU
    backend), item axis spanning the process boundary; each worker checks
    the hierarchical merge against the flat merge and a dense oracle.
    Exercises parallel/distributed.initialize_distributed for real."""
    import __graft_entry__ as ge

    ge.dryrun_multihost(n_processes=2, devices_per_process=2)


def test_sharded_peel_redo_restores_exactness():
    """Adversarial mesh eval (VERDICT r3 weak #1): scores engineered so one
    shard's peel completeness check trips on the 8-device mesh; the fused
    evaluate_model driver must AND-reduce the per-shard flags, catch the
    tripped batch, and redo it with the fallback-free per-shard scatter —
    restoring exact metrics through FullEvaluator(mesh=...)."""
    from sibrar_tpu.config.schema import EvalConfig
    from sibrar_tpu.data.synthetic import make_synthetic_splits
    from sibrar_tpu.eval.evaluator import FullEvaluator, evaluate_model

    splits = make_synthetic_splits(n_users=32, n_items=65536,
                                   n_interactions=2000, seed=11,
                                   with_features=False)
    val = splits["val"]
    mesh = make_mesh(8)  # (data=4, item=2)
    rng = np.random.default_rng(4)
    d = 8
    u_mat = jnp.asarray(np.abs(rng.standard_normal(
        (val.n_users, d))).astype(np.float32))
    items = np.zeros((val.n_items_in_split, d), np.float32)
    # all k=100 winners inside ONE 128-lane window of shard 0 -> that
    # shard's per-window peel budget cannot cover them
    items[256:384] = np.abs(rng.standard_normal((128, d))) + 5.0
    items = jnp.asarray(items)
    user_repr_fn = lambda u: u_mat[u]  # noqa: E731

    # exact single-device reference
    ev_ref = FullEvaluator(EvalConfig(top_k=[100]), val, evaluator_name="val")
    ref = evaluate_model(lambda u: user_repr_fn(u) @ items.T, ev_ref, 16)

    ev = FullEvaluator(EvalConfig(top_k=[100]), val, evaluator_name="val",
                       mesh=mesh)
    ev.make_dot_eval_batch = (
        lambda fn, it, interpret=False: FullEvaluator.make_dot_eval_batch(
            ev, fn, it, interpret=True))
    batch_fn = ev.make_dot_eval_batch(user_repr_fn, items)
    assert batch_fn is not None, "sharded dot fast path did not engage"
    u0 = jnp.asarray(np.asarray(ev.data.users_in_split)[:16], jnp.int32)
    _, _, ok = batch_fn(u0)
    assert not bool(jnp.all(ok)), "adversarial batch did not trip the check"

    fast_fn = lambda u: user_repr_fn(u) @ items.T  # noqa: E731
    fast_fn.dot_parts = (user_repr_fn, items)
    got = evaluate_model(fast_fn, ev, batch_size=16)
    for key, v in ref.items():
        np.testing.assert_allclose(got[key], v, atol=1e-6, err_msg=key)


def test_hierarchical_merge_fuzz_group_shapes():
    """Hierarchical merge across group shapes (2x4, 4x2) and k spanning
    shard boundaries — bitwise equal to the flat merge every time."""
    from sibrar_tpu.parallel.mesh import sharded_masked_topk

    mesh = make_mesh(8, item_parallelism=8)
    rng = np.random.default_rng(23)
    for groups, k, c in [(((0, 1, 2, 3), (4, 5, 6, 7)), 20, 512),
                         (((0, 1), (2, 3), (4, 5), (6, 7)), 9, 768),
                         (((0, 1, 2, 3), (4, 5, 6, 7)), 130, 1024)]:
        b, e = 8, 5
        scores = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32))
        cols = jnp.asarray(rng.integers(0, c, (b, e)).astype(np.int32))
        mask = jnp.asarray(rng.random((b, e)) < 0.8)
        vf, if_, okf = sharded_masked_topk(
            scores, cols, mask, k, mesh, return_ok=True, item_groups=None,
            use_peel=False)
        vh, ih, okh = sharded_masked_topk(
            scores, cols, mask, k, mesh, return_ok=True, item_groups=groups,
            use_peel=False)
        np.testing.assert_array_equal(np.asarray(vf), np.asarray(vh),
                                      err_msg=str((groups, k, c)))
        np.testing.assert_array_equal(np.asarray(if_), np.asarray(ih),
                                      err_msg=str((groups, k, c)))


def test_hierarchical_groups_reject_mismatched_rows():
    """ADVICE r4: grouping is inferred from the first data-axis row; if any
    other row maps item positions to processes differently the function must
    fall back to the flat merge (None), not ship a DCN-suboptimal grouping
    claimed as optimal."""
    from types import SimpleNamespace

    from sibrar_tpu.parallel.mesh import hierarchical_item_groups

    def fake_mesh(proc_rows):
        devs = np.array(
            [[SimpleNamespace(process_index=p) for p in row]
             for row in proc_rows], dtype=object)
        return SimpleNamespace(
            shape={"data": devs.shape[0], "item": devs.shape[1]},
            axis_names=("data", "item"), devices=devs)

    uniform = fake_mesh([[0, 0, 1, 1], [0, 0, 1, 1]])
    assert hierarchical_item_groups(uniform) == ((0, 1), (2, 3))
    mismatched = fake_mesh([[0, 0, 1, 1], [0, 1, 0, 1]])
    assert hierarchical_item_groups(mismatched) is None
