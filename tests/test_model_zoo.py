"""End-to-end training smoke + learning tests for the tier-1 SGD model family
(DMF, CLCRec-style feature MF, DropoutNet, SBNet), the reference's de-facto
verification strategy (SURVEY.md §4.1) as automated tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from sibrar_tpu.config.schema import (
    DatasetConfig,
    DatasetSplitType,
    EvalConfig,
    LearningConfig,
)
from sibrar_tpu.data.synthetic import make_synthetic_splits
from sibrar_tpu.eval.evaluator import FullEvaluator
from sibrar_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def splits():
    return make_synthetic_splits(n_users=80, n_items=100, n_interactions=2400, seed=5)


@pytest.fixture(scope="module")
def cold_item_splits():
    return make_synthetic_splits(
        n_users=80, n_items=100, n_interactions=2400, seed=6,
        split_type=DatasetSplitType.COLD_START_ITEM)


def _fit(model, splits, epochs=3, device_data=None, lr=5e-3, **learn_kw):
    learn = LearningConfig(n_epochs=epochs, lr=lr, rec_loss="bpr",
                           max_patience=50, optimizing_metric="ndcg@10", **learn_kw)
    ev = FullEvaluator(EvalConfig(top_k=[10]), splits["val"], evaluator_name="val")
    trainer = Trainer(model, splits["train"], ev, learn, DatasetConfig(),
                      batch_size=64, seed=0, device_data=device_data)
    res = trainer.fit()
    assert np.isfinite(res["val/ndcg@10"])
    return trainer, res


def test_dmf_trains(splits):
    from sibrar_tpu.models.dmf import DeepMatrixFactorization

    dd = splits["train"].to_device()
    model = DeepMatrixFactorization.build_from_conf(
        {"u_mid_layers": [32], "i_mid_layers": [32], "final_dimension": 16},
        splits["train"], dd)
    _, res = _fit(model, splits, device_data=dd)
    assert res["val/ndcg@10"] > 0


def test_item_feature_mf_trains_with_infonce(splits):
    from sibrar_tpu.models.feat_mf import ItemFeatureMatrixFactorization

    model = ItemFeatureMatrixFactorization.build_from_conf(
        {"feature_name": "audio", "embedding_dim": 16,
         "intermediate_layers": [32], "lambda_content": 0.05},
        splits["train"])
    trainer, res = _fit(model, splits)
    # the InfoNCE content loss must actually flow (reg_loss > 0 during training)
    m = trainer.train_epoch()
    assert m["train/reg_loss"] > 0


def test_user_feature_mf_trains(splits):
    from sibrar_tpu.models.feat_mf import UserFeatureMatrixFactorization

    model = UserFeatureMatrixFactorization.build_from_conf(
        {"feature_name": "profile_vec", "embedding_dim": 16}, splits["train"])
    _fit(model, splits)


def test_dropoutnet_trains(splits):
    from sibrar_tpu.models.dropoutnet import DropoutNet

    dd = splits["train"].to_device()
    conf = {
        "shared_common_dim": 16,
        "user": {"features": [{"feature_name": "profile_vec", "embedding_dim": 16}],
                 "preference_layers": [16], "common_hidden_layers": [16]},
        "item": {"features": [{"feature_name": "audio", "embedding_dim": 16}],
                 "preference_layers": [16], "common_hidden_layers": [16]},
    }
    model = DropoutNet.build_from_conf(conf, splits["train"], dd)
    _fit(model, splits, device_data=dd)


def _sbnet_conf(reg="pairwise_single", item_mods=None, eval_mods=None, central=None):
    item = {
        "features": [
            {"feature_name": "audio", "feature_hidden_layers": [16]},
            {"feature_name": "text", "feature_hidden_layers": [16]},
            {"feature_name": "interactions", "feature_hidden_layers": [16]},
            {"feature_name": "item_embedding"},
        ],
        "single_branch_hidden_layers": [32],
        "common_modality_dim": 16,
        "embedding_regularization_type": reg,
        "regularization_weight": 0.1,
    }
    if item_mods:
        item["train_modalities"] = item_mods
    if eval_mods:
        item["eval_modalities"] = eval_mods
    if central:
        item["central_modality"] = central
    return {
        "shared_common_dim": 16,
        "user": {"feature_name": "user_embedding", "embedding_dim": 16},
        "item": item,
    }


def test_sbnet_trains_pairwise_reg(splits):
    from sibrar_tpu.models.sbnet import SingleBranchNet

    dd = splits["train"].to_device()
    model = SingleBranchNet.build_from_conf(_sbnet_conf(), splits["train"], dd)
    trainer, res = _fit(model, splits, device_data=dd)
    m = trainer.train_epoch()
    assert m["train/reg_loss"] > 0  # cross-modal InfoNCE flowed


def test_sbnet_central_modality(splits):
    from sibrar_tpu.models.sbnet import SingleBranchNet

    dd = splits["train"].to_device()
    model = SingleBranchNet.build_from_conf(
        _sbnet_conf(reg="central_modality", central="audio"), splits["train"], dd)
    _fit(model, splits, device_data=dd)


def test_sbnet_cold_start_item_drops_interactions(cold_item_splits):
    """Cold-start entities must not see the 'interactions' modality at eval
    (reference sgd_alg.py:1896-1897)."""
    from sibrar_tpu.models.sbnet import SingleBranchNet

    tr = cold_item_splits["train"]
    dd = tr.to_device()
    model = SingleBranchNet.build_from_conf(_sbnet_conf(), tr, dd)
    inter_id = model.item_module.modality_names.index("interactions")
    assert inter_id not in model.item_module.eval_modality_ids
    _fit(model, cold_item_splits, device_data=dd)


def test_sbnet_eval_modality_subset_validation(splits):
    from sibrar_tpu.models.sbnet import SingleBranchNet

    dd = splits["train"].to_device()
    with pytest.raises(ValueError, match="Cannot use modality"):
        SingleBranchNet.build_from_conf(
            _sbnet_conf(item_mods=["audio"], eval_mods=["text"]), splits["train"], dd)


def test_sbnet_missing_modality_eval(splits):
    """Missing-modality scenario: train on all modalities, evaluate with only
    one available (the paper's headline capability)."""
    from sibrar_tpu.models.sbnet import SingleBranchNet

    dd = splits["train"].to_device()
    model = SingleBranchNet.build_from_conf(
        _sbnet_conf(eval_mods=["text"]), splits["train"], dd)
    assert len(model.item_module.eval_modality_ids) == 1
    _fit(model, splits, epochs=2, device_data=dd)


def test_sbnet_beats_mf_on_cold_start_items():
    """The paper's core claim in miniature: on cold-start items, id-embedding
    MF cannot rank unseen items (its cold embeddings are random) while the
    single-branch content model transfers (reference paper tables, SURVEY.md
    §6: MF precision collapses cold). Uses a catalog large enough that chance
    ranking cannot score well."""
    import jax
    import jax.numpy as jnp

    from sibrar_tpu.eval.evaluator import evaluate_model
    from sibrar_tpu.models.mf import SGDMatrixFactorization
    from sibrar_tpu.models.sbnet import SingleBranchNet

    splits = make_synthetic_splits(
        n_users=100, n_items=400, n_interactions=9000, seed=12,
        split_type=DatasetSplitType.COLD_START_ITEM)
    tr, va = splits["train"], splits["val"]
    dd = tr.to_device()

    # chance-level reference on this catalog
    ev = FullEvaluator(EvalConfig(top_k=[10]), va, evaluator_name="val")
    n_cat = va.n_items_in_split
    rand_res = evaluate_model(
        lambda u: jax.random.uniform(
            jax.random.fold_in(jax.random.PRNGKey(0), int(u[0])),
            (u.shape[0], n_cat)), ev, 64)

    mf = SGDMatrixFactorization(n_users=tr.n_users, n_items=tr.n_items,
                                embedding_dim=16)
    _, mf_res = _fit(mf, splits, epochs=6, device_data=dd)

    conf = {
        "shared_common_dim": 32,
        "user": {"feature_name": "user_embedding", "embedding_dim": 32},
        "item": {"features": [
            {"feature_name": "audio", "feature_hidden_layers": [32]},
            {"feature_name": "text", "feature_hidden_layers": [32]}],
            "single_branch_hidden_layers": [64], "common_modality_dim": 32,
            "embedding_regularization_type": "pairwise_single",
            "regularization_weight": 0.1},
    }
    sb = SingleBranchNet.build_from_conf(conf, tr, dd)
    _, sb_res = _fit(sb, splits, epochs=20, device_data=dd, lr=3e-3)

    # MF ≈ chance on unseen items (its cold embeddings are untrained noise);
    # SBNet clears both — margins sized to the synthetic generator's intrinsic
    # cold-start ceiling (measured: rand 0.226, mf 0.243, sbnet 0.285)
    assert abs(mf_res["val/ndcg@10"] - rand_res["val/ndcg@10"]) < 0.06
    assert sb_res["val/ndcg@10"] > mf_res["val/ndcg@10"] + 0.03, (
        sb_res["val/ndcg@10"], mf_res["val/ndcg@10"])
    assert sb_res["val/ndcg@10"] > rand_res["val/ndcg@10"] + 0.04, (
        sb_res["val/ndcg@10"], rand_res["val/ndcg@10"])


def test_routed_projections_match_per_row_modality_outputs(splits):
    """Mechanical correctness of balanced modality routing
    (`SingleBranchNetEntity._routed_projections`): every assembled [row, slot]
    vector must equal that SAME row's projection under exactly one modality
    (routing may never mix rows), the two slots of a row must come from
    distinct modalities, and per-modality row counts must be exactly
    balanced."""
    import jax
    import jax.numpy as jnp

    from sibrar_tpu.models.base import populate_tables
    from sibrar_tpu.models.sbnet import SingleBranchNet

    dd = splits["train"].to_device()
    model = SingleBranchNet.build_from_conf(_sbnet_conf(), splits["train"], dd)
    rng = np.random.default_rng(3)
    # 7 x 5 rows: T=35 is not a multiple of the n=4,k=2 period P=12 → also
    # exercises the pad-and-drop path
    i_idxs = jnp.asarray(rng.integers(0, 100, size=(7, 5)).astype(np.int32))
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        i_idxs, method=model.item_repr)
    # init leaves the feature `tables` collection zeroed (the trainer injects
    # the real device tables) — without this every MLP modality projects to
    # exactly 0 and the match-exactly-one assertion below is vacuous
    variables = populate_tables(dict(variables), dd)

    def routed(mdl, idxs, key):
        return mdl.item_module._routed_projections(idxs, key, 2, None)

    def all_proj(mdl, idxs):
        ent = mdl.item_module
        return jnp.stack(
            [ent._modality_projection(m, idxs, True) for m in ent._mods],
            axis=-2)

    full = np.asarray(model.apply(variables, i_idxs, method=all_proj))
    n_mod = full.shape[-2]
    counts = np.zeros(n_mod, int)
    for key_i in (3, 4):
        picked = np.asarray(model.apply(
            variables, i_idxs, jax.random.key(key_i), method=routed))
        assert picked.shape == (*i_idxs.shape, 2, full.shape[-1])
        for t in np.ndindex(i_idxs.shape):
            row_mods = []
            for j in range(2):
                match = [m for m in range(n_mod)
                         if np.allclose(picked[t][j], full[t][m], atol=1e-5)]
                assert len(match) == 1, (t, j, match)
                row_mods.append(match[0])
            assert row_mods[0] != row_mods[1], (t, row_mods)
            if key_i == 3:
                counts[row_mods[0]] += 1
                counts[row_mods[1]] += 1
    # exact balance up to the <P padded tail rows
    assert counts.max() - counts.min() <= 12, counts


def test_routed_sbnet_loss_matches_compute_all_distribution(splits):
    """The routed path must train as well as compute-all: same model, same
    seeds, 3 epochs each — losses finite and within a loose band (the
    sampling distributions differ by design, trajectories must not)."""
    import sibrar_tpu.models.sbnet as sbnet_mod
    from sibrar_tpu.models.sbnet import SingleBranchNet

    results = {}
    for routed in (True, False):
        # fresh device tables per run: the trainer's donated epoch fn
        # consumes the previous DeviceData's arrays
        dd = splits["train"].to_device()
        old = sbnet_mod.ROUTED_TRAIN_MODALITIES
        sbnet_mod.ROUTED_TRAIN_MODALITIES = routed
        try:
            model = SingleBranchNet.build_from_conf(
                _sbnet_conf(), splits["train"], dd)
            trainer, res = _fit(model, splits, epochs=3, device_data=dd)
            results[routed] = trainer.train_epoch()["train/loss"]
        finally:
            sbnet_mod.ROUTED_TRAIN_MODALITIES = old
    assert np.isfinite(results[True]) and np.isfinite(results[False])
    assert abs(results[True] - results[False]) < 0.35, results


def test_sbnet_routed_sampling_config_knob(splits):
    """`routed_modality_sampling` in the model conf overrides the module
    default (False restores the reference's iid compute-all sampling)."""
    from sibrar_tpu.models.sbnet import SingleBranchNet

    dd = splits["train"].to_device()
    conf = _sbnet_conf()
    conf["item"]["routed_modality_sampling"] = False
    model = SingleBranchNet.build_from_conf(conf, splits["train"], dd)
    assert model.item_module.routed_modality_sampling is False
    _fit(model, splits, epochs=1, device_data=dd)


def test_sbnet_plain_id_tower_embeds_distinct_users(splits):
    """Regression for the r4 trained-parity find: the plain
    '{entity}_embedding' tower must embed ids DIRECTLY — routed through the
    device-table machinery it read a zero table and every user collapsed
    onto embedding row 0."""
    import jax

    from sibrar_tpu.models.base import init_model
    from sibrar_tpu.models.sbnet import SingleBranchNet

    dd = splits["train"].to_device()
    conf = {
        "shared_common_dim": 8,
        "user": {"feature_name": "user_embedding", "embedding_dim": 8},
        "item": {"features": [{"feature_name": "audio"}],
                 "single_branch_hidden_layers": [8],
                 "common_modality_dim": 8,
                 "embedding_regularization_type": "no_regularization"},
    }
    model = SingleBranchNet.build_from_conf(conf, splits["train"], dd)
    variables = init_model(model, jax.random.PRNGKey(0), dd)
    u = jnp.arange(8, dtype=jnp.int32)
    reprs = np.asarray(model.apply(variables, u, train=False,
                                   method=model.user_repr))
    # distinct users -> distinct embeddings (all-equal rows = the bug)
    assert np.unique(reprs, axis=0).shape[0] == 8


def test_populate_tables_rejects_unmatched_declarations(splits):
    """A declared table leaf with no device table must fail LOUDLY (it
    would silently stay zero otherwise)."""
    import pytest as _pytest

    from sibrar_tpu.models.base import populate_tables

    dd = splits["train"].to_device()
    variables = {"tables": {"item__nonexistent_feature": jnp.zeros((4, 2))}}
    with _pytest.raises(ValueError, match="no matching device table"):
        populate_tables(variables, dd)
