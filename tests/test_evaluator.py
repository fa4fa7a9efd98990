"""Evaluator driver behavior: fused-path fallback semantics and error
propagation (VERDICT r1 item 7 — a genuine bug in a model's score path must
not silently degrade every eval to the eager loop)."""
import jax.numpy as jnp
import numpy as np
import pytest

from sibrar_tpu.config.schema import EvalConfig
from sibrar_tpu.data.synthetic import make_synthetic_splits
from sibrar_tpu.eval.evaluator import FullEvaluator, evaluate_model


@pytest.fixture(scope="module")
def val_ds():
    return make_synthetic_splits(n_users=24, n_items=40,
                                 n_interactions=500, seed=3)["val"]


def _evaluator(val_ds):
    return FullEvaluator(EvalConfig(top_k=[5]), val_ds, evaluator_name="val")


def test_score_fn_value_error_propagates(val_ds):
    ev = _evaluator(val_ds)

    def bad_score_fn(u):
        raise ValueError("genuine bug in the score path")

    with pytest.raises(ValueError, match="genuine bug"):
        evaluate_model(bad_score_fn, ev, batch_size=8)


def test_untraceable_score_fn_falls_back_to_eager(val_ds, caplog):
    """A score_fn that isn't jittable (host numpy on a tracer) still evaluates
    via the eager per-batch loop, with a logged warning."""
    ev = _evaluator(val_ds)
    n_cat = val_ds.n_items_in_split
    rng = np.random.default_rng(0)
    table = rng.standard_normal((val_ds.n_users, n_cat)).astype(np.float32)

    def host_score_fn(u):
        return jnp.asarray(table[np.asarray(u)])  # TracerArrayConversionError

    import logging

    with caplog.at_level(logging.WARNING):
        metrics = evaluate_model(host_score_fn, ev, batch_size=8)
    assert np.isfinite(metrics["val/ndcg@5"])
    assert any("falling back" in r.message for r in caplog.records)


def test_dot_fast_path_matches_scores_path():
    """make_dot_eval_batch (fused matmul→peel top-k, interpret mode) must
    produce identical metrics to the generic scores path, and the gate must
    refuse off-TPU / sharded / unviable-margin setups."""
    import jax

    splits = make_synthetic_splits(n_users=48, n_items=65536,
                                   n_interactions=3000, seed=9,
                                   with_features=False)
    val = splits["val"]
    ev = FullEvaluator(EvalConfig(top_k=[3, 10]), val, evaluator_name="val")
    rng = np.random.default_rng(1)
    d = 16
    u_mat = jnp.asarray(rng.standard_normal((val.n_users, d)).astype(np.float32))
    items = jnp.asarray(
        rng.standard_normal((val.n_items_in_split, d)).astype(np.float32))
    user_repr_fn = lambda u: u_mat[u]  # noqa: E731

    # off-TPU without interpret: gate refuses
    if jax.default_backend() != "tpu":
        assert ev.make_dot_eval_batch(user_repr_fn, items) is None
    batch_fn = ev.make_dot_eval_batch(user_repr_fn, items, interpret=True)
    assert batch_fn is not None

    score_fn = lambda u: user_repr_fn(u) @ items.T  # noqa: E731
    ref = evaluate_model(score_fn, ev, batch_size=16)

    users = np.asarray(ev.data.users_in_split)
    bs = 16
    for start in range(0, len(users) - len(users) % bs, bs):
        u = jnp.asarray(users[start:start + bs], jnp.int32)
        metrics, cov, ok = batch_fn(u)
        assert bool(jnp.all(ok))  # random scores: no peel redo needed
        for k, v in metrics.items():
            ev._per_user.setdefault(k, []).append(v)
        ev._per_user_users.append(u)
        ev._valid.append(np.ones(bs, bool))
        for k, flags in cov.items():
            ev._cov_flags[k] = (ev._cov_flags[k] | flags
                                if k in ev._cov_flags else flags)
    got = ev.get_results()
    for key in ("val/ndcg@10", "val/recall@10", "val/precision@3",
                "val/coverage@10"):
        np.testing.assert_allclose(got[key], ref[key], atol=1e-6,
                                   err_msg=key)


def test_trainer_attaches_dot_parts():
    """Plain MF exposes an exact dot; biased MF and DMF expose
    rank-equivalent decompositions (bias column / normalized cosine)."""
    from sibrar_tpu.config.schema import DatasetConfig, LearningConfig
    from sibrar_tpu.models.mf import SGDMatrixFactorization
    from sibrar_tpu.train.trainer import Trainer

    splits = make_synthetic_splits(n_users=30, n_items=40,
                                   n_interactions=600, seed=2)
    tr, va = splits["train"], splits["val"]
    learn = LearningConfig(n_epochs=1, lr=1e-3, optimizing_metric="ndcg@10")

    def mk(model):
        ev = FullEvaluator(EvalConfig(top_k=[5]), va, evaluator_name="val")
        t = Trainer(model, tr, ev, learn, DatasetConfig(), batch_size=16,
                    seed=0)
        return t.make_score_fn()

    plain = mk(SGDMatrixFactorization(n_users=30, n_items=40,
                                      embedding_dim=8))
    assert hasattr(plain, "dot_parts")
    u_fn, items = plain.dot_parts
    u = jnp.arange(4, dtype=jnp.int32)
    np.testing.assert_allclose(np.asarray(u_fn(u) @ items.T),
                               np.asarray(plain(u)), rtol=1e-5, atol=1e-5)

    # all-biases MF: the decomposed dot must RANK like the real scores
    biased = mk(SGDMatrixFactorization(
        n_users=30, n_items=40, embedding_dim=8, use_item_bias=True,
        use_user_bias=True, use_global_bias=True))
    assert hasattr(biased, "dot_parts")
    bu_fn, bitems = biased.dot_parts
    dot_rank = np.argsort(-np.asarray(bu_fn(u) @ bitems.T), axis=1)
    true_rank = np.argsort(-np.asarray(biased(u)), axis=1)
    np.testing.assert_array_equal(dot_rank, true_rank)

    # DMF: normalized dot ranks like the clamped cosine (above the clamp)
    from sibrar_tpu.models.dmf import DeepMatrixFactorization
    from sibrar_tpu.models.layers import interaction_tower_from

    dd = tr.to_device()
    dmf = DeepMatrixFactorization(
        n_users=30, n_items=40,
        u_tower=interaction_tower_from(dd, "user", [16]),
        i_tower=interaction_tower_from(dd, "item", [16]),
        final_dimension=16, mu=-2.0)  # mu below every cosine: no tie region
    ev = FullEvaluator(EvalConfig(top_k=[5]), va, evaluator_name="val")
    t = Trainer(dmf, tr, ev, learn, DatasetConfig(), batch_size=16, seed=0,
                device_data=dd)
    fn = t.make_score_fn()
    assert hasattr(fn, "dot_parts")
    du_fn, ditems = fn.dot_parts
    dot_rank = np.argsort(-np.asarray(du_fn(u) @ ditems.T), axis=1)
    true_rank = np.argsort(-np.asarray(fn(u)), axis=1)
    np.testing.assert_array_equal(dot_rank, true_rank)


def test_dot_fast_path_driver_redo_on_exactness_trip():
    """Adversarial scores (all winners in one window) trip the peel's
    completeness check; the fused driver must redo with the scatter top-k
    and still return exact metrics (the in-graph cond fallback is useless
    inside lax.map — XLA predicates loop-body conditionals)."""
    from sibrar_tpu.eval.evaluator import FullEvaluator as FE

    splits = make_synthetic_splits(n_users=32, n_items=65536,
                                   n_interactions=2000, seed=11,
                                   with_features=False)
    val = splits["val"]
    # k=100 with t=12: the single boosted window holds all 100 winners, so
    # the per-window peel budget cannot cover them -> completeness trips
    ev = FE(EvalConfig(top_k=[100]), val, evaluator_name="val")
    rng = np.random.default_rng(4)
    d = 8
    u_mat = jnp.asarray(np.abs(rng.standard_normal(
        (val.n_users, d))).astype(np.float32))
    items = np.zeros((val.n_items_in_split, d), np.float32)
    items[256:384] = np.abs(rng.standard_normal((128, d))) + 5.0  # one window
    items = jnp.asarray(items)
    user_repr_fn = lambda u: u_mat[u]  # noqa: E731

    score_fn = lambda u: user_repr_fn(u) @ items.T  # noqa: E731
    ref = evaluate_model(score_fn, ev, batch_size=16)

    ev2 = FE(EvalConfig(top_k=[100]), val, evaluator_name="val")
    ev2.make_dot_eval_batch = (
        lambda fn, it, interpret=False: FE.make_dot_eval_batch(
            ev2, fn, it, interpret=True))
    # the adversarial batch must actually trip the completeness check
    batch_fn = ev2.make_dot_eval_batch(user_repr_fn, items)
    u0 = jnp.asarray(np.asarray(ev2.data.users_in_split)[:16], jnp.int32)
    _, _, ok = batch_fn(u0)
    assert not bool(jnp.all(ok))

    fast_fn = lambda u: user_repr_fn(u) @ items.T  # noqa: E731
    fast_fn.dot_parts = (user_repr_fn, items)
    got = evaluate_model(fast_fn, ev2, batch_size=16)
    for key, v in ref.items():
        np.testing.assert_allclose(got[key], v, atol=1e-6, err_msg=key)


def test_uiprotomf_dot_parts_exact():
    """UIProtoMF's combine is exactly a dot of concatenated parts."""
    from sibrar_tpu.config.schema import DatasetConfig, LearningConfig
    from sibrar_tpu.models.protomf import UIProtoMF
    from sibrar_tpu.train.trainer import Trainer

    splits = make_synthetic_splits(n_users=30, n_items=40,
                                   n_interactions=600, seed=6)
    tr, va = splits["train"], splits["val"]
    model = UIProtoMF(n_users=30, n_items=40, embedding_dim=8,
                      u_n_prototypes=4, i_n_prototypes=5)
    ev = FullEvaluator(EvalConfig(top_k=[5]), va, evaluator_name="val")
    t = Trainer(model, tr, ev,
                LearningConfig(n_epochs=1, lr=1e-3,
                               optimizing_metric="ndcg@10"),
                DatasetConfig(), batch_size=16, seed=0)
    fn = t.make_score_fn()
    assert hasattr(fn, "dot_parts")
    u_fn, items = fn.dot_parts
    u = jnp.arange(6, dtype=jnp.int32)
    np.testing.assert_allclose(np.asarray(u_fn(u) @ items.T),
                               np.asarray(fn(u)), rtol=1e-4, atol=1e-5)


def test_feat_mf_and_ecf_dot_parts_rank_equal():
    """ifeatmf and ecf decompositions must rank like their real combines."""
    from sibrar_tpu.config.schema import DatasetConfig, LearningConfig
    from sibrar_tpu.models.registry import get_algorithm
    from sibrar_tpu.train.trainer import Trainer

    splits = make_synthetic_splits(n_users=30, n_items=40,
                                   n_interactions=600, seed=8)
    tr, va = splits["train"], splits["val"]
    dd = tr.to_device()
    learn = LearningConfig(n_epochs=1, lr=1e-3, optimizing_metric="ndcg@10")
    confs = {
        "ifeatmf": {"embedding_dim": 8, "feature_name": "audio",
                    "feature_hidden_layers": [8], "use_item_bias": True},
        "ecf": {"n_clusters": 6, "top_n": 3, "tag_feature": "genres"},
    }
    u = jnp.arange(5, dtype=jnp.int32)
    for name, conf in confs.items():
        spec = get_algorithm(name)
        model = spec.build(conf, tr, dd)
        ev = FullEvaluator(EvalConfig(top_k=[5]), va, evaluator_name="val")
        t = Trainer(model, tr, ev, learn, DatasetConfig(), batch_size=16,
                    seed=0, device_data=dd)
        fn = t.make_score_fn()
        assert hasattr(fn, "dot_parts"), name
        u_fn, items = fn.dot_parts
        dot_rank = np.argsort(-np.asarray(u_fn(u) @ items.T), axis=1)
        true_rank = np.argsort(-np.asarray(fn(u)), axis=1)
        np.testing.assert_array_equal(dot_rank, true_rank, err_msg=name)


def test_dot_fast_path_scores_variant_past_fused_gate(monkeypatch):
    """Catalogs past the fused kernel's VMEM gate must still get the dot
    fast path (scores-path peel variant) with metrics identical to the
    generic path."""
    import jax.numpy as jnp

    import sibrar_tpu.ops.pallas_peel as pp

    splits = make_synthetic_splits(n_users=32, n_items=65536,
                                   n_interactions=2000, seed=11,
                                   with_features=False)
    val = splits["val"]
    ev = FullEvaluator(EvalConfig(top_k=[10]), val, evaluator_name="val")
    rng = np.random.default_rng(3)
    d = 16
    u_mat = jnp.asarray(rng.standard_normal((val.n_users, d)).astype(np.float32))
    items = jnp.asarray(
        rng.standard_normal((val.n_items_in_split, d)).astype(np.float32))
    user_repr_fn = lambda u: u_mat[u]  # noqa: E731

    # shrink the fused VMEM gate below this catalog: fused_ok must be False
    monkeypatch.setattr(pp, "_PEEL_MAX_ROW_BYTES", 1024)
    assert not pp.peel_viable(val.n_items_in_split, 10,
                              ev.data.exclude_csr.max_row_len, fused=True)
    assert pp.peel_viable(val.n_items_in_split, 10,
                          ev.data.exclude_csr.max_row_len)
    batch_fn = ev.make_dot_eval_batch(user_repr_fn, items, interpret=True)
    assert batch_fn is not None

    score_fn = lambda u: user_repr_fn(u) @ items.T  # noqa: E731
    ref = evaluate_model(score_fn, ev, batch_size=16)

    ev2 = FullEvaluator(EvalConfig(top_k=[10]), val, evaluator_name="val")
    batch_fn = ev2.make_dot_eval_batch(user_repr_fn, items, interpret=True)
    users = np.asarray(ev2.data.users_in_split)
    bs = 16
    for start in range(0, len(users) - len(users) % bs, bs):
        u = jnp.asarray(users[start:start + bs], jnp.int32)
        metrics, cov, ok = batch_fn(u)
        assert bool(jnp.all(ok))
        for k, v in metrics.items():
            ev2._per_user.setdefault(k, []).append(v)
        ev2._per_user_users.append(u)
        ev2._valid.append(np.ones(bs, bool))
        for k, flags in cov.items():
            ev2._cov_flags[k] = (ev2._cov_flags[k] | flags
                                 if k in ev2._cov_flags else flags)
    got = ev2.get_results()
    for key in ("val/ndcg@10", "val/recall@10", "val/coverage@10"):
        np.testing.assert_allclose(got[key], ref[key], atol=1e-6, err_msg=key)


def test_explicit_topk_method_pins_scores_path():
    """An explicit non-peel topk_method must disable the peel-based dot fast
    paths (single-chip and sharded) so the operator's kernel selection wins."""
    from sibrar_tpu.config.schema import EvalConfig
    from sibrar_tpu.data.synthetic import make_synthetic_splits
    from sibrar_tpu.eval.evaluator import FullEvaluator

    splits = make_synthetic_splits(n_users=20, n_items=40, n_interactions=300,
                                   seed=3, with_features=False)
    val = splits["val"]
    items = jnp.zeros((val.n_items_in_split, 8), jnp.float32)
    ev = FullEvaluator(EvalConfig(top_k=[5], topk_method="scatter"), val)
    assert ev.make_dot_eval_batch(lambda u: None, items,
                                  interpret=True) is None


def test_score_dtype_bf16_matches_f32_on_separated_scores():
    """EvalConfig.score_dtype='bfloat16' casts the dot parts once; with
    integer score gaps (exactly representable in bf16) the metrics match
    the full-f32 run bit-for-bit. A non-dot score_fn warns and evaluates in
    its native precision."""
    import logging

    splits = make_synthetic_splits(n_users=24, n_items=60,
                                   n_interactions=500, seed=4,
                                   with_features=False)
    val = splits["val"]
    # d=1 dot model with integer item scores: |values| < 256 are exact bf16
    items = jnp.asarray(
        np.arange(val.n_items_in_split, dtype=np.float32)[:, None] % 97)
    u_mat = jnp.ones((val.n_users, 1), jnp.float32)

    def score_fn(u):
        return u_mat[u] @ items.T

    score_fn.dot_parts = (lambda u: u_mat[u], items)

    ev = FullEvaluator(EvalConfig(top_k=[5, 10]), val, evaluator_name="val")
    ref = evaluate_model(score_fn, ev, batch_size=16)

    ev_bf = FullEvaluator(EvalConfig(top_k=[5, 10], score_dtype="bfloat16"),
                          val, evaluator_name="val")
    got = evaluate_model(score_fn, ev_bf, batch_size=16)
    for key, v in ref.items():
        np.testing.assert_allclose(got[key], v, atol=1e-6, err_msg=key)

    # non-dot score_fn: warn, evaluate anyway
    def plain_fn(u):
        return u_mat[u] @ items.T

    ev_w = FullEvaluator(EvalConfig(top_k=[5], score_dtype="bfloat16"), val,
                         evaluator_name="val")
    with np.errstate(all="ignore"):
        logger = logging.getLogger("sibrar_tpu.eval.evaluator")
        records = []
        h = logging.Handler()
        h.emit = lambda r: records.append(r.getMessage())
        logger.addHandler(h)
        try:
            out = evaluate_model(plain_fn, ev_w, batch_size=16)
        finally:
            logger.removeHandler(h)
    assert any("score_dtype" in m for m in records)
    assert np.isfinite(out["val/ndcg@5"])


def test_score_dtype_validation():
    with pytest.raises(ValueError, match="score_dtype"):
        EvalConfig(score_dtype="float16").validate()
    EvalConfig(score_dtype="bfloat16").validate()
