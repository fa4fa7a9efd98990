"""End-to-end training slice: MF on synthetic data must learn signal and beat
the popularity baseline (the reference's smoke-run verification strategy,
SURVEY.md §4, done properly as an automated test)."""
import numpy as np
import jax.numpy as jnp
import pytest

from sibrar_tpu.config.schema import DatasetConfig, EvalConfig, LearningConfig
from sibrar_tpu.data.synthetic import make_synthetic_splits
from sibrar_tpu.eval.evaluator import FullEvaluator, evaluate_model
from sibrar_tpu.models.mf import ACF, SGDBaseline, SGDMatrixFactorization
from sibrar_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def splits():
    return make_synthetic_splits(n_users=100, n_items=120, n_interactions=3000, seed=3)


def _fit(model, splits, loss="bce", epochs=12, **learn_kw):
    tr, va = splits["train"], splits["val"]
    learn = LearningConfig(n_epochs=epochs, lr=5e-3, rec_loss=loss,
                           max_patience=40, optimizing_metric="ndcg@10", **learn_kw)
    dsc = DatasetConfig(n_negative_samples=4)
    ev = FullEvaluator(EvalConfig(top_k=[10]), va, evaluator_name="val")
    trainer = Trainer(model, tr, ev, learn, dsc, batch_size=128, seed=0)
    return trainer, trainer.fit()


def _pop_baseline(splits):
    tr, va = splits["train"], splits["val"]
    pop = np.asarray(tr.pop_distribution)[va.items_in_split]
    ev = FullEvaluator(EvalConfig(top_k=[10]), va, evaluator_name="val")
    pop_j = jnp.asarray(pop)
    return evaluate_model(
        lambda u: jnp.broadcast_to(pop_j, (u.shape[0], len(pop))), ev, 64)


def test_mf_beats_popularity(splits):
    model = SGDMatrixFactorization(
        n_users=splits["train"].n_users, n_items=splits["train"].n_items,
        embedding_dim=32)
    trainer, best = _fit(model, splits, epochs=25)
    pop = _pop_baseline(splits)
    assert best["val/ndcg@10"] > pop["val/ndcg@10"] * 1.3
    assert trainer.best_epoch >= 0


def test_mf_bpr_and_ssm_losses_train(splits):
    tr = splits["train"]
    for loss in ("bpr", "sampled_softmax"):
        model = SGDMatrixFactorization(n_users=tr.n_users, n_items=tr.n_items,
                                       embedding_dim=16)
        trainer, best = _fit(model, splits, loss=loss, epochs=6)
        assert np.isfinite(best["val/ndcg@10"])
        assert best["val/ndcg@10"] > 0.01


def test_bf16_moment_dtype_trains(splits):
    """Opt-in `moment_dtype: bfloat16` must store the adam first moment in
    bf16 (optax mu_dtype) and still learn signal."""
    import jax

    tr = splits["train"]
    model = SGDMatrixFactorization(n_users=tr.n_users, n_items=tr.n_items,
                                   embedding_dim=16)
    trainer, best = _fit(model, splits, epochs=6, moment_dtype="bfloat16")
    mus = [x.dtype for x in jax.tree_util.tree_leaves(trainer.state.opt_state)
           if hasattr(x, "dtype") and x.dtype == jnp.bfloat16]
    assert mus, "no bf16 moment buffers found in opt_state"
    assert np.isfinite(best["val/ndcg@10"]) and best["val/ndcg@10"] > 0.01

    with pytest.raises(ValueError, match="moment_dtype"):
        LearningConfig(moment_dtype="float16").validate()


def test_mf_with_biases(splits):
    tr = splits["train"]
    model = SGDMatrixFactorization(
        n_users=tr.n_users, n_items=tr.n_items, embedding_dim=16,
        use_user_bias=True, use_item_bias=True, use_global_bias=True)
    trainer, best = _fit(model, splits, epochs=4)
    assert np.isfinite(best["val/ndcg@10"])


def test_sgd_baseline_trains(splits):
    tr = splits["train"]
    model = SGDBaseline(n_users=tr.n_users, n_items=tr.n_items)
    trainer, best = _fit(model, splits, epochs=4)
    assert np.isfinite(best["val/ndcg@10"])


def test_acf_trains_with_reg_losses(splits):
    tr = splits["train"]
    model = ACF(n_users=tr.n_users, n_items=tr.n_items, embedding_dim=16,
                n_anchors=8)
    trainer, _ = _fit(model, splits, epochs=3)
    m = trainer.train_epoch()
    assert m["train/reg_loss"] != 0.0  # exclusiveness/inclusiveness active
    assert np.isfinite(m["train/loss"])


def test_checkpoint_save_load(tmp_path, splits):
    tr = splits["train"]
    model = SGDMatrixFactorization(n_users=tr.n_users, n_items=tr.n_items,
                                   embedding_dim=8)
    trainer, best = _fit(model, splits, epochs=3)
    trainer.save(str(tmp_path))
    score_before = trainer.make_score_fn()(jnp.arange(4, dtype=jnp.int32))
    trainer2, _ = _fit(
        SGDMatrixFactorization(n_users=tr.n_users, n_items=tr.n_items,
                               embedding_dim=8), splits, epochs=0)
    trainer2.load(str(tmp_path))
    score_after = trainer2.make_score_fn()(jnp.arange(4, dtype=jnp.int32))
    np.testing.assert_allclose(np.asarray(score_before), np.asarray(score_after),
                               rtol=1e-6)


def test_group_metrics_reported(splits):
    tr, va = splits["train"], splits["val"]
    model = SGDMatrixFactorization(n_users=tr.n_users, n_items=tr.n_items,
                                   embedding_dim=8)
    learn = LearningConfig(n_epochs=1, lr=1e-3, optimizing_metric="ndcg@10")
    ev = FullEvaluator(EvalConfig(top_k=[10], group_metrics=["gender"]),
                       va, evaluator_name="val")
    trainer = Trainer(model, tr, ev, learn, DatasetConfig(), batch_size=64, seed=0)
    res = trainer.validate()
    group_keys = [k for k in res if "gender/" in k]
    assert any("gender/m/ndcg@10" in k for k in group_keys)
    # coverage metric present
    assert "val/coverage@10" in res


def test_exclusion_masks_training_items(splits):
    """Items seen in training must never appear in a user's eval top-k."""
    tr, va = splits["train"], splits["val"]
    model = SGDMatrixFactorization(n_users=tr.n_users, n_items=tr.n_items,
                                   embedding_dim=8)
    trainer, _ = _fit(model, splits, epochs=2)
    score_fn = trainer.make_score_fn()
    ev = trainer.val_evaluator
    users = np.asarray(ev.data.users_in_split)[:32]
    u = jnp.asarray(users, dtype=jnp.int32)
    scores = np.asarray(score_fn(u))
    # manually apply exclusion then verify -inf positions cover train items
    from sibrar_tpu.ops.sparse import csr_row_gather, scatter_fill_rows
    cols, mask = csr_row_gather(ev.data.exclude_csr, u)
    excl = np.asarray(scatter_fill_rows(
        jnp.asarray(scores), cols, mask, n_cols=tr.n_items_in_split, fill=-1e30))
    ex_mat = va.exclude_matrix()[users][:, va.items_in_split].toarray()
    assert np.all(excl[ex_mat.astype(bool)] < -1e29)


def test_chunked_catalog_encode_matches(splits):
    """make_score_fn(item_chunk=...) chunks the catalog encode without
    changing scores (pads with edge ids, trims back)."""
    model = SGDMatrixFactorization(n_users=100, n_items=120, embedding_dim=8)
    learn = LearningConfig(n_epochs=1, lr=5e-3, rec_loss="bpr")
    from sibrar_tpu.config.schema import DatasetConfig, EvalConfig
    ev = FullEvaluator(EvalConfig(top_k=[10]), splits["val"], evaluator_name="val")
    tr = Trainer(model, splits["train"], ev, learn, DatasetConfig(),
                 batch_size=64, seed=0)
    tr.train_epoch()
    u = jnp.arange(16, dtype=jnp.int32)
    full = tr.make_score_fn(item_chunk=10**9)(u)
    chunked = tr.make_score_fn(item_chunk=32)(u)  # 120 items → 4 chunks, pad 8
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-6, atol=1e-6)


def test_epoch_trains_tail_partial_batch(splits):
    """VERDICT r2 #8: the reference iterates ALL interactions each epoch
    (`/root/reference/train/trainer.py:204`); the tail partial batch must not
    be dropped. Observable: the batch plan covers every interaction and the
    step counter advances n_batches+1 times when bs does not divide nnz."""
    tr = splits["train"]
    n_inter = len(tr.interactions)
    bs = 128
    n_batches, tail = Trainer.epoch_batch_plan(n_inter, bs, None)
    assert n_batches * bs + tail == n_inter  # every interaction in the plan
    assert tail > 0, "fixture should produce a partial tail (adjust bs)"

    model = SGDMatrixFactorization(n_users=tr.n_users, n_items=tr.n_items,
                                   embedding_dim=8)
    learn = LearningConfig(n_epochs=1, lr=5e-3, rec_loss="bpr")
    ev = FullEvaluator(EvalConfig(top_k=[10]), splits["val"],
                       evaluator_name="val")
    trainer = Trainer(model, tr, ev, learn, DatasetConfig(), batch_size=bs,
                      seed=0)
    losses = trainer.train_epoch()
    assert np.isfinite(losses["train/loss"])
    assert int(trainer.state.step) == n_batches + 1  # tail step executed

    # max_batches_per_epoch still caps (and then there is no tail step)
    learn2 = LearningConfig(n_epochs=1, lr=5e-3, rec_loss="bpr",
                            max_batches_per_epoch=3)
    trainer2 = Trainer(model, tr, ev, learn2, DatasetConfig(), batch_size=bs,
                       seed=0)
    trainer2.train_epoch()
    assert int(trainer2.state.step) == 3


def test_small_dataset_single_partial_batch():
    """Fewer interactions than one batch: train on the single smaller batch
    (the reference DataLoader just yields one partial batch)."""
    small = make_synthetic_splits(n_users=12, n_items=16, n_interactions=80,
                                  seed=9)
    tr = small["train"]
    model = SGDMatrixFactorization(n_users=tr.n_users, n_items=tr.n_items,
                                   embedding_dim=4)
    learn = LearningConfig(n_epochs=1, lr=5e-3, rec_loss="bpr")
    ev = FullEvaluator(EvalConfig(top_k=[5]), small["val"],
                       evaluator_name="val")
    trainer = Trainer(model, tr, ev, learn, DatasetConfig(),
                      batch_size=4096, seed=0)
    losses = trainer.train_epoch()
    assert np.isfinite(losses["train/loss"])
    assert int(trainer.state.step) == 1


def test_chunked_epoch_matches_single_program(splits):
    """r5: long epochs run as a sequence of bounded scan programs
    (`learn.epoch_scan_chunk`). Chunked execution must be step-for-step
    equivalent to the single-program epoch: same final params, same step
    count, same weighted loss mean — the chunk boundary only changes where
    programs end, never what they compute."""
    import jax

    tr = splits["train"]
    n_inter = len(tr.interactions)
    bs = 128
    n_batches, tail = Trainer.epoch_batch_plan(n_inter, bs, None)
    assert n_batches >= 5 and tail > 0  # exercise full chunks + rem + tail

    def run(chunk):
        model = SGDMatrixFactorization(n_users=tr.n_users, n_items=tr.n_items,
                                       embedding_dim=8)
        learn = LearningConfig(n_epochs=1, lr=5e-3, rec_loss="bpr",
                               epoch_scan_chunk=chunk)
        ev = FullEvaluator(EvalConfig(top_k=[10]), splits["val"],
                           evaluator_name="val")
        t = Trainer(model, tr, ev, learn, DatasetConfig(), batch_size=bs,
                    seed=0)
        losses = t.train_epoch()
        return losses, t

    losses_one, t_one = run(None)
    losses_chunk, t_chunk = run(2)  # pieces: (2,0)*k + (rem, tail)
    assert len(t_chunk._epoch_fns) >= 2  # chunk fn + remainder fn compiled
    assert int(t_chunk.state.step) == int(t_one.state.step)
    np.testing.assert_allclose(losses_chunk["train/loss"],
                               losses_one["train/loss"], rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-6),
        t_one.state.params, t_chunk.state.params)
