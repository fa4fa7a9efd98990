"""EXECUTED-reference parity harness (VERDICT r1 item 2).

These tests import the actual reference code at /root/reference (via the
dependency shims in tests/_reference_shims.py), run it on the same synthetic
artifact directory as sibrar_tpu, and assert agreement:

(a) metric parity — identical score/label tensors through the reference's
    `eval/metrics.py` (torch) and `sibrar_tpu.eval.metrics` (jax);
(b) model forward parity — reference `SGDMatrixFactorization`
    (`/root/reference/algorithms/sgd_alg.py:126-200`) state_dict transplanted
    into the flax params, `predict()` agreement;
(c) end-to-end — the reference's SGD eval chain (items-once representations,
    per-batch combine, exclusion mask to -inf: eval/eval.py:207-222, metrics
    via the reference's own metric functions) vs `evaluate_model`, every
    `{metric}@{k}` within 1e-4.

The reference's `rmet`/`wandb` pip deps don't exist in this zero-egress image,
so `eval/eval.py` itself is not importable; (c) re-drives the documented eval
loop with the reference MODEL + reference METRIC code executing for real.
"""
import logging
import warnings

import numpy as np
import pytest
import torch

from _reference_shims import install_reference_shims

install_reference_shims()
logging.disable(logging.INFO)
warnings.filterwarnings("ignore", category=SyntaxWarning)

import jax.numpy as jnp  # noqa: E402

from sibrar_tpu.data.dataset import RecDataset  # noqa: E402
from sibrar_tpu.data.synthetic import (  # noqa: E402
    make_synthetic_splits,
    write_reference_artifacts,
)
from sibrar_tpu.config.schema import EvalConfig  # noqa: E402
from sibrar_tpu.eval.evaluator import FullEvaluator, evaluate_model  # noqa: E402
from sibrar_tpu.eval.metrics import user_metrics_from_hits  # noqa: E402

# reference imports — these execute /root/reference code
from eval import metrics as ref_metrics  # noqa: E402
from algorithms.sgd_alg import SGDMatrixFactorization as RefMF  # noqa: E402
from data.config_classes import (  # noqa: E402
    InteractionDatasetConfig,
    TrainDatasetConfig,
)
from data.dataset import FullEvalDataset as RefFullEvalDataset  # noqa: E402
from data.dataset import TrainRecDataset as RefTrainRecDataset  # noqa: E402

KS = (3, 10)


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("parity_artifacts")
    splits = make_synthetic_splits(n_users=40, n_items=55,
                                   n_interactions=900, seed=17)
    write_reference_artifacts(str(out), splits)
    return str(out)


@pytest.fixture(scope="module")
def ref_train(artifact_dir):
    return RefTrainRecDataset(TrainDatasetConfig(
        dataset_path=artifact_dir, split_set="train", n_negative_samples=2))


@pytest.fixture(scope="module")
def ref_val(artifact_dir):
    return RefFullEvalDataset(InteractionDatasetConfig(
        dataset_path=artifact_dir, split_set="val"))


@pytest.fixture(scope="module")
def our_val(artifact_dir):
    return RecDataset.load(artifact_dir, "val")


# --------------------------------------------------------------- (a) metrics
def test_metric_parity_executed_reference():
    """Same scores/labels through reference torch metrics and ours."""
    rng = np.random.default_rng(0)
    b, n = 64, 200
    logits = rng.standard_normal((b, n)).astype(np.float32)
    y_true = (rng.random((b, n)) < 0.05).astype(np.float32)
    y_true[0] = 0.0  # a user with no positives: NaN→0 rule

    t_logits = torch.tensor(logits)
    t_true = torch.tensor(y_true)
    for k in KS:
        idx_topk = t_logits.topk(k=k).indices
        ref_ndcg = ref_metrics.ndcg_at_k_batch(
            t_logits, t_true, k=k, aggr_sum=False, idx_topk=idx_topk).numpy()
        ref_recall = ref_metrics.recall_at_k_batch(
            t_logits, t_true, k=k, aggr_sum=False, idx_topk=idx_topk).numpy()
        ref_prec = ref_metrics.precision_at_k_batch(
            t_logits, t_true, k=k, aggr_sum=False, idx_topk=idx_topk).numpy()

        # ours derives everything from hit vectors at the SAME ranking
        hits = np.take_along_axis(y_true, idx_topk.numpy(), axis=1)[:, :k]
        n_pos = y_true.sum(axis=1).astype(np.int32)
        ours = user_metrics_from_hits(
            jnp.asarray(hits), jnp.asarray(n_pos), (k,))
        np.testing.assert_allclose(ours[f"ndcg@{k}"], ref_ndcg, atol=1e-6)
        np.testing.assert_allclose(ours[f"recall@{k}"], ref_recall, atol=1e-6)
        np.testing.assert_allclose(ours[f"precision@{k}"], ref_prec, atol=1e-6)


# ---------------------------------------------------------- (b) MF transplant
def _transplant_mf(ref_mf: "RefMF", our_model, variables):
    """Copy the reference torch state_dict into the flax params pytree."""
    sd = {k: v.detach().numpy() for k, v in ref_mf.state_dict().items()}
    params = dict(variables["params"])
    params["user_embeddings"] = {"embedding": jnp.asarray(sd["user_embeddings.weight"])}
    params["item_embeddings"] = {"embedding": jnp.asarray(sd["item_embeddings.weight"])}
    if ref_mf.use_user_bias:
        params["user_bias"] = {"embedding": jnp.asarray(sd["user_bias.weight"])}
    if ref_mf.use_item_bias:
        params["item_bias"] = {"embedding": jnp.asarray(sd["item_bias.weight"])}
    if ref_mf.use_global_bias:
        params["global_bias"] = jnp.asarray(sd["global_bias"])
    return {**variables, "params": params}


def _build_mf_pair(ref_train, seed=0, **flags):
    from sibrar_tpu.models.mf import SGDMatrixFactorization as OurMF

    torch.manual_seed(seed)
    ref_mf = RefMF(ref_train.n_users, ref_train.n_items, embedding_dim=16, **flags)
    ref_mf.eval()
    our_mf = OurMF(n_users=ref_train.n_users, n_items=ref_train.n_items,
                   embedding_dim=16,
                   use_user_bias=flags.get("use_user_bias", False),
                   use_item_bias=flags.get("use_item_bias", False),
                   use_global_bias=flags.get("use_global_bias", False))
    import jax

    u = jnp.zeros((2,), jnp.int32)
    i = jnp.zeros((2, 3), jnp.int32)
    variables = our_mf.init(jax.random.PRNGKey(0), u, i, train=False)
    variables = _transplant_mf(ref_mf, our_mf, variables)
    return ref_mf, our_mf, variables


# NOTE: use_user_bias=True is NOT parametrized — the reference's own combine
# crashes on it (`out += u_bias[:, None]` broadcasts [B,1,1] into [B,n]:
# /root/reference/algorithms/sgd_alg.py:190, RuntimeError), so there is no
# executable reference behavior to match. Our MF implements the intended
# per-user bias; its math is covered by tests/test_model_zoo.py.
@pytest.mark.parametrize("flags", [
    {},
    {"use_item_bias": True, "use_global_bias": True},
])
def test_mf_forward_parity(ref_train, flags):
    ref_mf, our_mf, variables = _build_mf_pair(ref_train, **flags)
    rng = np.random.default_rng(1)
    u = rng.integers(0, ref_train.n_users, size=32)
    i = rng.integers(0, ref_train.n_items, size=(32, 5))
    with torch.no_grad():
        ref_out = ref_mf.predict(torch.tensor(u), torch.tensor(i))
    ref_out = np.asarray(ref_out)
    our_out = np.asarray(our_mf.apply(
        variables, jnp.asarray(u, jnp.int32), jnp.asarray(i, jnp.int32),
        train=False))
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-5, atol=1e-5)


# ------------------------------------------------------- (c) end-to-end eval
def _reference_eval(ref_mf, ref_eval_ds, ks=KS, batch_size=16):
    """The reference SGD eval chain (eval/eval.py:207-227) with metrics from
    the reference's own metric functions (executed code, not re-derivations)."""
    device = "cpu"
    ref_mf.eval()
    acc = {f"{m}@{k}": [] for m in ("ndcg", "recall", "precision") for k in ks}
    with torch.no_grad():
        i_idxs = torch.tensor(ref_eval_ds.items_in_split)
        i_repr = ref_mf.get_item_representations(i_idxs)
        n = len(ref_eval_ds)
        for start in range(0, n, batch_size):
            rows = range(start, min(start + batch_size, n))
            batch = [ref_eval_ds[r] for r in rows]
            u_idxs = torch.tensor(np.array([b[0] for b in batch]))
            labels = torch.tensor(np.stack([b[2] for b in batch]))
            u_repr = ref_mf.get_user_representations(u_idxs)
            out = ref_mf.combine_user_item_representations(u_repr, i_repr)
            mask = torch.tensor(
                ref_eval_ds.exclude_data[u_idxs.numpy()].toarray(),
                dtype=torch.bool)
            out[mask] = -torch.inf
            for k in ks:
                idx_topk = out.topk(k=k).indices
                acc[f"ndcg@{k}"].append(ref_metrics.ndcg_at_k_batch(
                    out, labels, k=k, aggr_sum=False, idx_topk=idx_topk).numpy())
                acc[f"recall@{k}"].append(ref_metrics.recall_at_k_batch(
                    out, labels, k=k, aggr_sum=False, idx_topk=idx_topk).numpy())
                acc[f"precision@{k}"].append(ref_metrics.precision_at_k_batch(
                    out, labels, k=k, aggr_sum=False, idx_topk=idx_topk).numpy())
    return {key: float(np.concatenate(v).mean()) for key, v in acc.items()}


def test_mf_end_to_end_eval_parity(ref_train, ref_val, our_val):
    """North-star gate: every {metric}@{k} within 1e-4 of the executed
    reference chain on shared artifacts + shared (transplanted) weights."""
    ref_mf, our_mf, variables = _build_mf_pair(
        ref_train, use_item_bias=True, use_global_bias=True)

    ref_out = _reference_eval(ref_mf, ref_val, ks=KS)

    evaluator = FullEvaluator(
        EvalConfig(top_k=list(KS), metrics=["ndcg", "recall", "precision"],
                   compute_std=False),
        our_val, evaluator_name=None)
    catalog = evaluator.data.catalog
    i_repr = our_mf.apply(variables, catalog, train=False,
                          method=our_mf.item_repr)

    def score_fn(u_idxs):
        u_repr = our_mf.apply(variables, u_idxs, train=False,
                              method=our_mf.user_repr)
        return our_mf.apply(variables, u_repr, i_repr, method=our_mf.combine)

    ours = evaluate_model(score_fn, evaluator, batch_size=16)
    assert set(ref_out) <= set(ours)
    for key, ref_v in ref_out.items():
        assert abs(ours[key] - ref_v) < 1e-4, (key, ours[key], ref_v)
