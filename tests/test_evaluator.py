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
