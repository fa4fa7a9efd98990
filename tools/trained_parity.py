"""Trained-quality parity harness (VERDICT r3 #1).

Trains the EXECUTED reference (torch, /root/reference) and sibrar_tpu
end-to-end on the same synthetic artifact directory with the same
hyperparameters, and compares the CONVERGED best-validation ndcg@10. This is
the piece weight-transplant parity cannot cover: it demonstrates that our
training loop (on-device negative sampling, scanned donated epochs, loss
aggregation, optimizer semantics) reaches the same quality as the
reference's torch loop (/root/reference/train/trainer.py:98-228,
algorithms/sgd_alg.py:126-200).

Seeds necessarily differ between frameworks (different RNGs), so the gate is
statistical: converged metrics agree within a tolerance, not trajectories.

Used by tests/test_trained_parity.py and bench.py (trained_parity_* extras).
"""
from __future__ import annotations

import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_ROOT, os.path.join(_ROOT, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)

from _reference_shims import install_reference_shims  # noqa: E402

install_reference_shims()

import torch  # noqa: E402

MF_HPARAMS = dict(embedding_dim=16, epochs=25, lr=5e-3, wd=0.0, n_neg=4,
                  batch_size=128, loss="bpr")


def make_artifacts(out_dir: str, n_users: int = 100, n_items: int = 120,
                   n_interactions: int = 3000, seed: int = 3,
                   split_type=None, popularity_alpha: float = 0.0) -> str:
    from sibrar_tpu.data.synthetic import (
        make_synthetic_splits,
        write_reference_artifacts,
    )

    kw = {} if split_type is None else {"split_type": split_type}
    splits = make_synthetic_splits(
        n_users=n_users, n_items=n_items, n_interactions=n_interactions,
        seed=seed, popularity_alpha=popularity_alpha, **kw)
    write_reference_artifacts(out_dir, splits)
    return out_dir


# ------------------------------------------------------------- reference side
def _reference_val_ndcg(model, ref_val, k: int = 10, batch_size: int = 64):
    """The reference SGD eval chain (eval/eval.py:207-227) with the
    reference's own metric code (rmet itself isn't installable here)."""
    from eval import metrics as ref_metrics

    model.eval()
    vals = []
    with torch.no_grad():
        i_idxs = torch.tensor(ref_val.items_in_split)
        i_repr = model.get_item_representations(i_idxs)
        n = len(ref_val)
        for start in range(0, n, batch_size):
            batch = [ref_val[r] for r in range(start, min(start + batch_size, n))]
            u_idxs = torch.tensor(np.array([b[0] for b in batch]))
            labels = torch.tensor(np.stack([b[2] for b in batch]))
            u_repr = model.get_user_representations(u_idxs)
            out = model.combine_user_item_representations(u_repr, i_repr)
            mask = torch.tensor(
                ref_val.exclude_data[u_idxs.numpy()].toarray(), dtype=torch.bool)
            out[mask] = -torch.inf
            idx_topk = out.topk(k=k).indices
            vals.append(ref_metrics.ndcg_at_k_batch(
                out, labels, k=k, aggr_sum=False, idx_topk=idx_topk).numpy())
    return float(np.concatenate(vals).mean())


def train_reference_mf(artifact_dir: str, seed: int = 0,
                       hparams: dict = MF_HPARAMS) -> float:
    """Train the reference SGDMatrixFactorization with the reference's own
    dataset (in-__getitem__ negative sampling), loss, and Adam loop; returns
    the best validation ndcg@10 over training (trainer.py:125-170 protocol:
    initial validation, per-epoch validation, best retained)."""
    from algorithms.sgd_alg import SGDMatrixFactorization as RefMF
    from data.config_classes import (
        InteractionDatasetConfig,
        TrainDatasetConfig,
    )
    from data.dataset import FullEvalDataset as RefFullEvalDataset
    from data.dataset import TrainRecDataset as RefTrainRecDataset
    from train.rec_losses import (
        RecBayesianPersonalizedRankingLoss,
        RecBinaryCrossEntropy,
    )

    h = dict(MF_HPARAMS, **hparams)
    torch.manual_seed(seed)
    np.random.seed(seed)
    ref_train = RefTrainRecDataset(TrainDatasetConfig(
        dataset_path=artifact_dir, split_set="train",
        n_negative_samples=h["n_neg"]))
    ref_val = RefFullEvalDataset(InteractionDatasetConfig(
        dataset_path=artifact_dir, split_set="val"))
    model = RefMF(ref_train.n_users, ref_train.n_items,
                  embedding_dim=h["embedding_dim"])
    return _torch_sgd_train(model, ref_train, ref_val, h)


# ------------------------------------------------------------------ our side
def train_ours_mf(artifact_dir: str, seed: int = 0,
                  hparams: dict = MF_HPARAMS) -> float:
    from sibrar_tpu.config.schema import (
        DatasetConfig,
        EvalConfig,
        LearningConfig,
    )
    from sibrar_tpu.data.dataset import RecDataset
    from sibrar_tpu.eval.evaluator import FullEvaluator
    from sibrar_tpu.models.mf import SGDMatrixFactorization
    from sibrar_tpu.train.trainer import Trainer

    h = dict(MF_HPARAMS, **hparams)
    tr = RecDataset.load(artifact_dir, "train")
    va = RecDataset.load(artifact_dir, "val")
    model = SGDMatrixFactorization(
        n_users=tr.n_users, n_items=tr.n_items,
        embedding_dim=h["embedding_dim"])
    learn = LearningConfig(
        n_epochs=h["epochs"], lr=h["lr"], wd=h["wd"], rec_loss=h["loss"],
        max_patience=h["epochs"] + 1, optimizing_metric="ndcg@10")
    ev = FullEvaluator(EvalConfig(top_k=[10], metrics=["ndcg"]), va,
                       evaluator_name="val")
    trainer = Trainer(model, tr, ev, learn,
                      DatasetConfig(n_negative_samples=h["n_neg"]),
                      batch_size=h["batch_size"], seed=seed)
    return float(trainer.fit()["val/ndcg@10"])


# -------------------------------------------------------------------- sbnet
SBNET_HPARAMS = dict(epochs=12, lr=1e-3, wd=0.0, n_neg=4, batch_size=64,
                     loss="bpr", shared_common_dim=16, common_modality_dim=16,
                     hidden=(32,), reg_weight=0.1)

# the 2-modality cell: item side single-branches {interactions, audio} with
# pairwise cross-modal InfoNCE; user side is a plain id embedding (the
# paper's no-user configuration)
_SBNET_ITEM_FEATURES = ("interactions", "audio")


def _our_sbnet_conf(h: dict) -> dict:
    return {
        "shared_common_dim": h["shared_common_dim"],
        "user": {"feature_name": "user_embedding",
                 "embedding_dim": h["shared_common_dim"]},
        "item": {
            "features": [{"feature_name": f, "feature_hidden_layers": [16]}
                         for f in _SBNET_ITEM_FEATURES],
            "single_branch_hidden_layers": list(h["hidden"]),
            "common_modality_dim": h["common_modality_dim"],
            "embedding_regularization_type": "pairwise_single",
            "regularization_weight": h["reg_weight"],
        },
    }


def train_reference_sbnet(artifact_dir: str, seed: int = 0,
                          hparams: dict = SBNET_HPARAMS) -> float:
    """Train the reference SingleBranchNet (sgd_alg.py:2009-2143) with the
    reference's own entity/feature/InfoNCE machinery executing for real."""
    from algorithms.sgd_alg import SingleBranchNet as RefSBNet
    from data.config_classes import (
        FeatureDefinition,
        FeatureType,
        InteractionDatasetConfig,
        TrainDatasetConfig,
    )
    from data.dataset import FullEvalDataset as RefFullEvalDataset
    from data.dataset import TrainRecDataset as RefTrainRecDataset
    from data.module_config_classes import (
        FeatureModuleConfig,
        SingleBranchFeatureConfig,
        SingleBranchNetConfig,
        SingleBranchNetEntityConfig,
    )
    from train.rec_losses import RecBayesianPersonalizedRankingLoss

    h = dict(SBNET_HPARAMS, **hparams)
    torch.manual_seed(seed)
    np.random.seed(seed)
    feat_defs = [FeatureDefinition(name="audio", type=FeatureType.VECTOR)]
    ref_train = RefTrainRecDataset(TrainDatasetConfig(
        dataset_path=artifact_dir, split_set="train",
        n_negative_samples=h["n_neg"], item_feature_definitions=feat_defs,
        model_requires_train_interactions=True,
        model_requires_item_interactions=True))
    ref_val = RefFullEvalDataset(InteractionDatasetConfig(
        dataset_path=artifact_dir, split_set="val",
        item_feature_definitions=feat_defs,
        model_requires_train_interactions=True,
        model_requires_item_interactions=True))
    item_cfg = SingleBranchNetEntityConfig(
        features=[SingleBranchFeatureConfig(feature_name=f,
                                            feature_hidden_layers=[16])
                  for f in _SBNET_ITEM_FEATURES],
        single_branch_hidden_layers=list(h["hidden"]),
        preference_hidden_layers=list(h["hidden"]),
        common_modality_dim=h["common_modality_dim"],
        embedding_regularization_type="pairwise_single",
        regularization_weight=h["reg_weight"],
        sampling_seed=seed)
    # enum coercion happens in from_dict normally; do it by hand here
    from data.module_config_classes import EmbeddingRegularizationType

    item_cfg.embedding_regularization_type = (
        EmbeddingRegularizationType.PairwiseSingle)
    conf = SingleBranchNetConfig(
        user=FeatureModuleConfig(feature_name="user_embedding",
                                 embedding_dim=h["shared_common_dim"]),
        item=item_cfg, shared_common_dim=h["shared_common_dim"])
    model = RefSBNet(conf, ref_train)
    loader = torch.utils.data.DataLoader(
        ref_train, batch_size=h["batch_size"], shuffle=True, num_workers=0)
    rec_loss = RecBayesianPersonalizedRankingLoss(
        n_items=ref_train.n_items, train_neg_strategy="uniform",
        neg_train=h["n_neg"])
    opt = torch.optim.Adam(model.parameters(), lr=h["lr"],
                           weight_decay=h["wd"])

    best = _reference_val_ndcg(model, ref_val)
    for _epoch in range(h["epochs"]):
        model.train()
        for u_idxs, i_idxs, labels in loader:
            out = model(u_idxs, i_idxs)
            loss = rec_loss.compute_loss(out, labels)
            loss = loss + model.get_and_reset_other_loss()["reg_loss"]
            loss.backward()
            opt.step()
            opt.zero_grad()
        best = max(best, _reference_val_ndcg(model, ref_val))
    return best


def train_ours_sbnet(artifact_dir: str, seed: int = 0,
                     hparams: dict = SBNET_HPARAMS) -> float:
    from sibrar_tpu.config.schema import (
        DatasetConfig,
        EvalConfig,
        FeatureDefinition,
        FeatureType,
        LearningConfig,
    )
    from sibrar_tpu.data.dataset import RecDataset
    from sibrar_tpu.eval.evaluator import FullEvaluator
    from sibrar_tpu.models.sbnet import SingleBranchNet
    from sibrar_tpu.train.trainer import Trainer

    h = dict(SBNET_HPARAMS, **hparams)
    feat_defs = [FeatureDefinition("audio", FeatureType.VECTOR)]
    tr = RecDataset.load(artifact_dir, "train",
                         item_feature_definitions=feat_defs)
    va = RecDataset.load(artifact_dir, "val",
                         item_feature_definitions=feat_defs)
    dd = tr.to_device()
    model = SingleBranchNet.build_from_conf(_our_sbnet_conf(h), tr, dd)
    learn = LearningConfig(
        n_epochs=h["epochs"], lr=h["lr"], wd=h["wd"], rec_loss=h["loss"],
        max_patience=h["epochs"] + 1, optimizing_metric="ndcg@10")
    ev = FullEvaluator(EvalConfig(top_k=[10], metrics=["ndcg"]), va,
                       evaluator_name="val")
    trainer = Trainer(model, tr, ev, learn,
                      DatasetConfig(n_negative_samples=h["n_neg"]),
                      batch_size=h["batch_size"], seed=seed, device_data=dd)
    return float(trainer.fit()["val/ndcg@10"])






# --------------------------------------------------------------- dropoutnet
DN_HPARAMS = dict(epochs=12, lr=1e-3, wd=0.0, n_neg=4, batch_size=64,
                  loss="bpr", shared_common_dim=16)


def _dn_entity_conf_ours(feature):
    return {"features": [{"feature_name": feature, "embedding_dim": 16}],
            "preference_layers": [32], "common_hidden_layers": [16]}


def train_reference_dropoutnet(artifact_dir: str, seed: int = 0,
                               hparams: dict = DN_HPARAMS) -> float:
    """Train the reference DropoutNet (sgd_alg.py:1664-1762) — its
    preference-dropout sampling strategies execute for real."""
    from algorithms.sgd_alg import DropoutNet as RefDropoutNet
    from data.config_classes import (
        FeatureDefinition,
        FeatureType,
        InteractionDatasetConfig,
        TrainDatasetConfig,
    )
    from data.dataset import FullEvalDataset as RefFullEvalDataset
    from data.dataset import TrainRecDataset as RefTrainRecDataset
    from data.module_config_classes import (
        DropoutNetConfig,
        DropoutNetEntityConfig,
        FeatureModuleConfig,
    )
    from train.rec_losses import RecBayesianPersonalizedRankingLoss

    h = dict(DN_HPARAMS, **hparams)
    torch.manual_seed(seed)
    np.random.seed(seed)
    ufeat = [FeatureDefinition(name="profile_vec", type=FeatureType.VECTOR)]
    ifeat = [FeatureDefinition(name="audio", type=FeatureType.VECTOR)]
    kw = dict(user_feature_definitions=ufeat, item_feature_definitions=ifeat,
              model_requires_train_interactions=True,
              model_requires_item_interactions=True)
    ref_train = RefTrainRecDataset(TrainDatasetConfig(
        dataset_path=artifact_dir, split_set="train",
        n_negative_samples=h["n_neg"], **kw))
    ref_val = RefFullEvalDataset(InteractionDatasetConfig(
        dataset_path=artifact_dir, split_set="val", **kw))
    conf = DropoutNetConfig(
        user=DropoutNetEntityConfig(
            features=[FeatureModuleConfig(feature_name="profile_vec",
                                          embedding_dim=16)],
            preference_layers=[32], common_hidden_layers=[16]),
        item=DropoutNetEntityConfig(
            features=[FeatureModuleConfig(feature_name="audio",
                                          embedding_dim=16)],
            preference_layers=[32], common_hidden_layers=[16]),
        shared_common_dim=h["shared_common_dim"], sampling_seed=seed)
    model = RefDropoutNet(conf, ref_train)
    return _torch_sgd_train(model, ref_train, ref_val, h)


def train_ours_dropoutnet(artifact_dir: str, seed: int = 0,
                          hparams: dict = DN_HPARAMS) -> float:
    from sibrar_tpu.config.schema import (
        DatasetConfig,
        EvalConfig,
        FeatureDefinition,
        FeatureType,
        LearningConfig,
    )
    from sibrar_tpu.data.dataset import RecDataset
    from sibrar_tpu.eval.evaluator import FullEvaluator
    from sibrar_tpu.models.dropoutnet import DropoutNet
    from sibrar_tpu.train.trainer import Trainer

    h = dict(DN_HPARAMS, **hparams)
    ufeat = [FeatureDefinition("profile_vec", FeatureType.VECTOR)]
    ifeat = [FeatureDefinition("audio", FeatureType.VECTOR)]
    tr = RecDataset.load(artifact_dir, "train",
                         user_feature_definitions=ufeat,
                         item_feature_definitions=ifeat)
    va = RecDataset.load(artifact_dir, "val",
                         user_feature_definitions=ufeat,
                         item_feature_definitions=ifeat)
    dd = tr.to_device()
    conf = {"shared_common_dim": h["shared_common_dim"],
            "user": _dn_entity_conf_ours("profile_vec"),
            "item": _dn_entity_conf_ours("audio")}
    model = DropoutNet.build_from_conf(conf, tr, dd)
    learn = LearningConfig(
        n_epochs=h["epochs"], lr=h["lr"], wd=h["wd"], rec_loss=h["loss"],
        max_patience=h["epochs"] + 1, optimizing_metric="ndcg@10")
    ev = FullEvaluator(EvalConfig(top_k=[10], metrics=["ndcg"]), va,
                       evaluator_name="val")
    trainer = Trainer(model, tr, ev, learn,
                      DatasetConfig(n_negative_samples=h["n_neg"]),
                      batch_size=h["batch_size"], seed=seed, device_data=dd)
    return float(trainer.fit()["val/ndcg@10"])




# ---------------------------------------------------------------------- dmf
DMF_HPARAMS = dict(epochs=12, lr=1e-3, wd=0.0, n_neg=4, batch_size=64,
                   loss="bpr", u_mid=(32,), i_mid=(32,), final_dimension=16)


def train_reference_dmf(artifact_dir: str, seed: int = 0,
                        hparams: dict = DMF_HPARAMS) -> float:
    """Train the reference DeepMatrixFactorization (sgd_alg.py:1146-1263):
    interaction-vector towers + cosine combine with the mu floor."""
    from algorithms.sgd_alg import DeepMatrixFactorization as RefDMF
    from data.config_classes import (
        InteractionDatasetConfig,
        TrainDatasetConfig,
    )
    from data.dataset import FullEvalDataset as RefFullEvalDataset
    from data.dataset import TrainRecDataset as RefTrainRecDataset
    from train.rec_losses import RecBayesianPersonalizedRankingLoss

    h = dict(DMF_HPARAMS, **hparams)
    torch.manual_seed(seed)
    np.random.seed(seed)
    kw = dict(model_requires_train_interactions=True,
              model_requires_item_interactions=True)
    ref_train = RefTrainRecDataset(TrainDatasetConfig(
        dataset_path=artifact_dir, split_set="train",
        n_negative_samples=h["n_neg"], **kw))
    ref_val = RefFullEvalDataset(InteractionDatasetConfig(
        dataset_path=artifact_dir, split_set="val", **kw))
    model = RefDMF(ref_train, u_mid_layers=list(h["u_mid"]),
                   i_mid_layers=list(h["i_mid"]),
                   final_dimension=h["final_dimension"])
    return _torch_sgd_train(model, ref_train, ref_val, h)


def train_ours_dmf(artifact_dir: str, seed: int = 0,
                   hparams: dict = DMF_HPARAMS) -> float:
    from sibrar_tpu.config.schema import (
        DatasetConfig,
        EvalConfig,
        LearningConfig,
    )
    from sibrar_tpu.data.dataset import RecDataset
    from sibrar_tpu.eval.evaluator import FullEvaluator
    from sibrar_tpu.models.dmf import DeepMatrixFactorization
    from sibrar_tpu.train.trainer import Trainer

    h = dict(DMF_HPARAMS, **hparams)
    tr = RecDataset.load(artifact_dir, "train")
    va = RecDataset.load(artifact_dir, "val")
    dd = tr.to_device()
    model = DeepMatrixFactorization.build_from_conf(
        {"u_mid_layers": list(h["u_mid"]), "i_mid_layers": list(h["i_mid"]),
         "final_dimension": h["final_dimension"]}, tr, dd)
    learn = LearningConfig(
        n_epochs=h["epochs"], lr=h["lr"], wd=h["wd"], rec_loss=h["loss"],
        max_patience=h["epochs"] + 1, optimizing_metric="ndcg@10")
    ev = FullEvaluator(EvalConfig(top_k=[10], metrics=["ndcg"]), va,
                       evaluator_name="val")
    trainer = Trainer(model, tr, ev, learn,
                      DatasetConfig(n_negative_samples=h["n_neg"]),
                      batch_size=h["batch_size"], seed=seed, device_data=dd)
    return float(trainer.fit()["val/ndcg@10"])




# ------------------------------------------------------- ifeatmf + uprotomf
IFMF_HPARAMS = dict(epochs=15, lr=2e-3, wd=0.0, n_neg=4, batch_size=64,
                    loss="bpr", embedding_dim=16, lambda_content=1e-4,
                    temperature=0.1)
PROTO_HPARAMS = dict(epochs=15, lr=2e-3, wd=0.0, n_neg=4, batch_size=64,
                     loss="bpr", embedding_dim=16, n_prototypes=8)


def _torch_sgd_train(model, ref_train, ref_val, h) -> float:
    """Shared torch loop (trainer.py:125-170 protocol)."""
    from train.rec_losses import (
        RecBayesianPersonalizedRankingLoss,
        RecBinaryCrossEntropy,
    )

    loader = torch.utils.data.DataLoader(
        ref_train, batch_size=h["batch_size"], shuffle=True, num_workers=0)
    loss_cls = {"bpr": RecBayesianPersonalizedRankingLoss,
                "bce": RecBinaryCrossEntropy}[h.get("loss", "bpr")]
    rec_loss = loss_cls(n_items=ref_train.n_items,
                        train_neg_strategy="uniform", neg_train=h["n_neg"])
    opt = torch.optim.Adam(model.parameters(), lr=h["lr"],
                           weight_decay=h["wd"])
    best = _reference_val_ndcg(model, ref_val)
    for _epoch in range(h["epochs"]):
        model.train()
        for u_idxs, i_idxs, labels in loader:
            out = model(u_idxs, i_idxs)
            loss = rec_loss.compute_loss(out, labels)
            loss = loss + model.get_and_reset_other_loss()["reg_loss"]
            loss.backward()
            opt.step()
            opt.zero_grad()
        best = max(best, _reference_val_ndcg(model, ref_val))
    return best


def train_reference_ifeatmf(artifact_dir: str, seed: int = 0,
                            hparams: dict = IFMF_HPARAMS) -> float:
    """Reference ItemFeatureMatrixFactorization (CLCRec InfoNCE content
    alignment, sgd_alg.py:1405-1511)."""
    from algorithms.sgd_alg import ItemFeatureMatrixFactorization as RefIFMF
    from data.config_classes import (
        FeatureDefinition,
        FeatureType,
        InteractionDatasetConfig,
        TrainDatasetConfig,
    )
    from data.dataset import FullEvalDataset as RefFullEvalDataset
    from data.dataset import TrainRecDataset as RefTrainRecDataset

    h = dict(IFMF_HPARAMS, **hparams)
    torch.manual_seed(seed)
    np.random.seed(seed)
    feat = [FeatureDefinition(name="audio", type=FeatureType.VECTOR)]
    ref_train = RefTrainRecDataset(TrainDatasetConfig(
        dataset_path=artifact_dir, split_set="train",
        n_negative_samples=h["n_neg"], item_feature_definitions=feat))
    ref_val = RefFullEvalDataset(InteractionDatasetConfig(
        dataset_path=artifact_dir, split_set="val",
        item_feature_definitions=feat))
    model = RefIFMF(ref_train, feature_name="audio",
                    embedding_dim=h["embedding_dim"],
                    lambda_content=h["lambda_content"],
                    temperature=h["temperature"])
    return _torch_sgd_train(model, ref_train, ref_val, h)


def train_ours_ifeatmf(artifact_dir: str, seed: int = 0,
                       hparams: dict = IFMF_HPARAMS) -> float:
    from sibrar_tpu.config.schema import (
        DatasetConfig,
        EvalConfig,
        FeatureDefinition,
        FeatureType,
        LearningConfig,
    )
    from sibrar_tpu.data.dataset import RecDataset
    from sibrar_tpu.eval.evaluator import FullEvaluator
    from sibrar_tpu.models.feat_mf import ItemFeatureMatrixFactorization
    from sibrar_tpu.train.trainer import Trainer

    h = dict(IFMF_HPARAMS, **hparams)
    feat = [FeatureDefinition("audio", FeatureType.VECTOR)]
    tr = RecDataset.load(artifact_dir, "train",
                         item_feature_definitions=feat)
    va = RecDataset.load(artifact_dir, "val", item_feature_definitions=feat)
    dd = tr.to_device()
    model = ItemFeatureMatrixFactorization.build_from_conf(
        {"feature_name": "audio", "embedding_dim": h["embedding_dim"],
         "lambda_content": h["lambda_content"],
         "temperature": h["temperature"]}, tr)
    learn = LearningConfig(
        n_epochs=h["epochs"], lr=h["lr"], wd=h["wd"], rec_loss=h["loss"],
        max_patience=h["epochs"] + 1, optimizing_metric="ndcg@10")
    ev = FullEvaluator(EvalConfig(top_k=[10], metrics=["ndcg"]), va,
                       evaluator_name="val")
    trainer = Trainer(model, tr, ev, learn,
                      DatasetConfig(n_negative_samples=h["n_neg"]),
                      batch_size=h["batch_size"], seed=seed, device_data=dd)
    return float(trainer.fit()["val/ndcg@10"])


def train_reference_uprotomf(artifact_dir: str, seed: int = 0,
                             hparams: dict = PROTO_HPARAMS) -> float:
    """Reference UProtoMF (shifted-cosine prototypes + proto/batch
    regularizers, sgd_alg.py:337-433)."""
    from algorithms.sgd_alg import UProtoMF as RefUProtoMF
    from data.config_classes import (
        InteractionDatasetConfig,
        TrainDatasetConfig,
    )
    from data.dataset import FullEvalDataset as RefFullEvalDataset
    from data.dataset import TrainRecDataset as RefTrainRecDataset

    h = dict(PROTO_HPARAMS, **hparams)
    torch.manual_seed(seed)
    np.random.seed(seed)
    ref_train = RefTrainRecDataset(TrainDatasetConfig(
        dataset_path=artifact_dir, split_set="train",
        n_negative_samples=h["n_neg"]))
    ref_val = RefFullEvalDataset(InteractionDatasetConfig(
        dataset_path=artifact_dir, split_set="val"))
    model = RefUProtoMF(ref_train.n_users, ref_train.n_items,
                        embedding_dim=h["embedding_dim"],
                        n_prototypes=h["n_prototypes"])
    return _torch_sgd_train(model, ref_train, ref_val, h)


def train_ours_uprotomf(artifact_dir: str, seed: int = 0,
                        hparams: dict = PROTO_HPARAMS) -> float:
    from sibrar_tpu.config.schema import (
        DatasetConfig,
        EvalConfig,
        LearningConfig,
    )
    from sibrar_tpu.data.dataset import RecDataset
    from sibrar_tpu.eval.evaluator import FullEvaluator
    from sibrar_tpu.models.protomf import UProtoMF
    from sibrar_tpu.train.trainer import Trainer

    h = dict(PROTO_HPARAMS, **hparams)
    tr = RecDataset.load(artifact_dir, "train")
    va = RecDataset.load(artifact_dir, "val")
    model = UProtoMF(n_users=tr.n_users, n_items=tr.n_items,
                     embedding_dim=h["embedding_dim"],
                     n_prototypes=h["n_prototypes"])
    learn = LearningConfig(
        n_epochs=h["epochs"], lr=h["lr"], wd=h["wd"], rec_loss=h["loss"],
        max_patience=h["epochs"] + 1, optimizing_metric="ndcg@10")
    ev = FullEvaluator(EvalConfig(top_k=[10], metrics=["ndcg"]), va,
                       evaluator_name="val")
    trainer = Trainer(model, tr, ev, learn,
                      DatasetConfig(n_negative_samples=h["n_neg"]),
                      batch_size=h["batch_size"], seed=seed)
    return float(trainer.fit()["val/ndcg@10"])


# ---------------------------------------------------------------------- ecf
ECF_HPARAMS = dict(epochs=15, lr=2e-3, wd=0.0, n_neg=4, batch_size=64,
                   loss="bpr", embedding_dim=16, n_clusters=8, top_n=4,
                   top_m=4, top_p=2)


def train_reference_ecf(artifact_dir: str, seed: int = 0,
                        hparams: dict = ECF_HPARAMS) -> float:
    """Reference ECF (sgd_alg.py:896-1113): straight-through top-k cluster
    masks + tag/independence/BPR-aux losses. The weighted tag matrix is
    built exactly as ECFTrainRecDataset._prepare_tag_data (dataset.py:
    469-483) from the artifacts' genres TAG feature."""
    import scipy.sparse as sp

    from algorithms.sgd_alg import ECF as RefECF
    from data.config_classes import (
        FeatureDefinition,
        FeatureType,
        InteractionDatasetConfig,
        TrainDatasetConfig,
    )
    from data.dataset import FullEvalDataset as RefFullEvalDataset
    from data.dataset import TrainRecDataset as RefTrainRecDataset

    h = dict(ECF_HPARAMS, **hparams)
    torch.manual_seed(seed)
    np.random.seed(seed)
    feat = [FeatureDefinition(name="genres", type=FeatureType.TAG,
                          tag_split_sep="|")]
    ref_train = RefTrainRecDataset(TrainDatasetConfig(
        dataset_path=artifact_dir, split_set="train",
        n_negative_samples=h["n_neg"], item_feature_definitions=feat))
    ref_val = RefFullEvalDataset(InteractionDatasetConfig(
        dataset_path=artifact_dir, split_set="val"))
    genres = ref_train.item_features["genres"]
    table = np.asarray(genres.values)  # padded tag codes
    n_tags = len(genres.unique_values)
    pad = n_tags  # create_padded_array pads with len(unique_values)
    rows = np.repeat(np.arange(ref_train.n_items), table.shape[1])
    cols = table.ravel()
    valid = cols != pad
    tag_mtx = sp.csr_matrix(
        (np.ones(valid.sum(), dtype=np.int16),
         (rows[valid], cols[valid])),
        shape=(ref_train.n_items, n_tags))
    tag_frequency = np.array(tag_mtx.sum(axis=0)).flatten()
    tag_weight = np.log(ref_train.n_items / (tag_frequency + 1e-6))
    tag_mtx = tag_mtx @ sp.diags(tag_weight)
    # the reference uses the scipy `.A` dense attribute (removed in the
    # in-image scipy>=1.14); feed shim objects exposing exactly that
    from types import SimpleNamespace

    tag_arg = SimpleNamespace(A=tag_mtx.toarray())
    inter_arg = SimpleNamespace(A=ref_train.user_sampling_matrix.toarray())
    model = RefECF(ref_train.n_users, ref_train.n_items, tag_arg,
                   inter_arg,
                   embedding_dim=h["embedding_dim"],
                   n_clusters=h["n_clusters"], top_n=h["top_n"],
                   top_m=h["top_m"], top_p=h["top_p"])
    return _torch_sgd_train(model, ref_train, ref_val, h)


def train_ours_ecf(artifact_dir: str, seed: int = 0,
                   hparams: dict = ECF_HPARAMS) -> float:
    from sibrar_tpu.config.schema import (
        DatasetConfig,
        EvalConfig,
        FeatureDefinition,
        FeatureType,
        LearningConfig,
    )
    from sibrar_tpu.data.dataset import RecDataset
    from sibrar_tpu.eval.evaluator import FullEvaluator
    from sibrar_tpu.models.ecf import ECF as OurECF
    from sibrar_tpu.train.trainer import Trainer

    h = dict(ECF_HPARAMS, **hparams)
    feat = [FeatureDefinition("genres", FeatureType.TAG)]
    tr = RecDataset.load(artifact_dir, "train",
                         item_feature_definitions=feat)
    va = RecDataset.load(artifact_dir, "val")
    dd = tr.to_device()
    model = OurECF.build_from_conf(
        {"embedding_dim": h["embedding_dim"], "n_clusters": h["n_clusters"],
         "top_n": h["top_n"], "top_m": h["top_m"], "top_p": h["top_p"],
         "tag_feature": "genres"}, tr, dd)
    learn = LearningConfig(
        n_epochs=h["epochs"], lr=h["lr"], wd=h["wd"], rec_loss=h["loss"],
        max_patience=h["epochs"] + 1, optimizing_metric="ndcg@10")
    ev = FullEvaluator(EvalConfig(top_k=[10], metrics=["ndcg"]), va,
                       evaluator_name="val")
    trainer = Trainer(model, tr, ev, learn,
                      DatasetConfig(n_negative_samples=h["n_neg"]),
                      batch_size=h["batch_size"], seed=seed, device_data=dd)
    return float(trainer.fit()["val/ndcg@10"])


def train_reference_ufeatmf(artifact_dir: str, seed: int = 0,
                            hparams: dict = IFMF_HPARAMS) -> float:
    """Reference UserFeatureMatrixFactorization (sgd_alg.py:1508-1611):
    the user-side CLCRec contrastive alignment."""
    from algorithms.sgd_alg import UserFeatureMatrixFactorization as RefUFMF
    from data.config_classes import (
        FeatureDefinition,
        FeatureType,
        InteractionDatasetConfig,
        TrainDatasetConfig,
    )
    from data.dataset import FullEvalDataset as RefFullEvalDataset
    from data.dataset import TrainRecDataset as RefTrainRecDataset

    h = dict(IFMF_HPARAMS, **hparams)
    torch.manual_seed(seed)
    np.random.seed(seed)
    feat = [FeatureDefinition(name="profile_vec", type=FeatureType.VECTOR)]
    ref_train = RefTrainRecDataset(TrainDatasetConfig(
        dataset_path=artifact_dir, split_set="train",
        n_negative_samples=h["n_neg"], user_feature_definitions=feat))
    ref_val = RefFullEvalDataset(InteractionDatasetConfig(
        dataset_path=artifact_dir, split_set="val",
        user_feature_definitions=feat))
    model = RefUFMF(ref_train, feature_name="profile_vec",
                    embedding_dim=h["embedding_dim"],
                    lambda_content=h["lambda_content"],
                    temperature=h["temperature"])
    return _torch_sgd_train(model, ref_train, ref_val, h)


def train_ours_ufeatmf(artifact_dir: str, seed: int = 0,
                       hparams: dict = IFMF_HPARAMS) -> float:
    from sibrar_tpu.config.schema import (
        DatasetConfig,
        EvalConfig,
        FeatureDefinition,
        FeatureType,
        LearningConfig,
    )
    from sibrar_tpu.data.dataset import RecDataset
    from sibrar_tpu.eval.evaluator import FullEvaluator
    from sibrar_tpu.models.feat_mf import UserFeatureMatrixFactorization
    from sibrar_tpu.train.trainer import Trainer

    h = dict(IFMF_HPARAMS, **hparams)
    feat = [FeatureDefinition("profile_vec", FeatureType.VECTOR)]
    tr = RecDataset.load(artifact_dir, "train",
                         user_feature_definitions=feat)
    va = RecDataset.load(artifact_dir, "val", user_feature_definitions=feat)
    model = UserFeatureMatrixFactorization.build_from_conf(
        {"feature_name": "profile_vec", "embedding_dim": h["embedding_dim"],
         "lambda_content": h["lambda_content"],
         "temperature": h["temperature"]}, tr)
    learn = LearningConfig(
        n_epochs=h["epochs"], lr=h["lr"], wd=h["wd"], rec_loss=h["loss"],
        max_patience=h["epochs"] + 1, optimizing_metric="ndcg@10")
    ev = FullEvaluator(EvalConfig(top_k=[10], metrics=["ndcg"]), va,
                       evaluator_name="val")
    trainer = Trainer(model, tr, ev, learn,
                      DatasetConfig(n_negative_samples=h["n_neg"]),
                      batch_size=h["batch_size"], seed=seed)
    return float(trainer.fit()["val/ndcg@10"])


def train_reference_sbnet_huge(artifact_dir: str, seed: int = 0) -> float:
    """The huge-family architecture cell: deeper shared branch, batch-norm
    every 2 layers, output activation, input normalization (reference
    sbnet_*_huge_conf.yml settings)."""
    from algorithms.sgd_alg import SingleBranchNet as RefSBNet
    from data.config_classes import (
        FeatureDefinition,
        FeatureType,
        InteractionDatasetConfig,
        TrainDatasetConfig,
    )
    from data.dataset import FullEvalDataset as RefFullEvalDataset
    from data.dataset import TrainRecDataset as RefTrainRecDataset
    from data.module_config_classes import (
        EmbeddingRegularizationType,
        FeatureModuleConfig,
        SingleBranchFeatureConfig,
        SingleBranchNetConfig,
        SingleBranchNetEntityConfig,
    )

    torch.manual_seed(seed)
    np.random.seed(seed)
    feat_defs = [FeatureDefinition(name="audio", type=FeatureType.VECTOR)]
    kw = dict(item_feature_definitions=feat_defs,
              model_requires_train_interactions=True,
              model_requires_item_interactions=True)
    ref_train = RefTrainRecDataset(TrainDatasetConfig(
        dataset_path=artifact_dir, split_set="train", n_negative_samples=4,
        **kw))
    ref_val = RefFullEvalDataset(InteractionDatasetConfig(
        dataset_path=artifact_dir, split_set="val", **kw))
    icfg = SingleBranchNetEntityConfig(
        features=[SingleBranchFeatureConfig(feature_name=f,
                                            feature_hidden_layers=[16])
                  for f in _SBNET_ITEM_FEATURES],
        single_branch_hidden_layers=[64, 64, 32],
        preference_hidden_layers=[32], common_modality_dim=16,
        embedding_regularization_type=(
            EmbeddingRegularizationType.PairwiseSingle),
        regularization_weight=0.1, apply_batch_norm_every=2,
        apply_output_activation=True, normalize_single_branch_input=True,
        sampling_seed=seed)
    conf = SingleBranchNetConfig(
        user=FeatureModuleConfig(feature_name="user_embedding",
                                 embedding_dim=16),
        item=icfg, shared_common_dim=16)
    model = RefSBNet(conf, ref_train)
    return _torch_sgd_train(model, ref_train, ref_val, dict(SBNET_HPARAMS))


def train_ours_sbnet_huge(artifact_dir: str, seed: int = 0) -> float:
    h = dict(SBNET_HPARAMS, hidden=(64, 64, 32))
    conf = _our_sbnet_conf(h)
    conf["item"].update({"apply_batch_norm_every": 2,
                         "apply_output_activation": True,
                         "normalize_single_branch_input": True})
    return _train_ours_sbnet_conf(artifact_dir, conf, h, seed)


def _train_ours_sbnet_conf(artifact_dir: str, conf: dict, h: dict,
                           seed: int) -> float:
    from sibrar_tpu.config.schema import (
        DatasetConfig,
        EvalConfig,
        FeatureDefinition,
        FeatureType,
        LearningConfig,
    )
    from sibrar_tpu.data.dataset import RecDataset
    from sibrar_tpu.eval.evaluator import FullEvaluator
    from sibrar_tpu.models.sbnet import SingleBranchNet
    from sibrar_tpu.train.trainer import Trainer

    feat_defs = [FeatureDefinition("audio", FeatureType.VECTOR)]
    tr = RecDataset.load(artifact_dir, "train",
                         item_feature_definitions=feat_defs)
    va = RecDataset.load(artifact_dir, "val",
                         item_feature_definitions=feat_defs)
    dd = tr.to_device()
    model = SingleBranchNet.build_from_conf(conf, tr, dd)
    learn = LearningConfig(
        n_epochs=h["epochs"], lr=h["lr"], wd=h["wd"], rec_loss=h["loss"],
        max_patience=h["epochs"] + 1, optimizing_metric="ndcg@10")
    ev = FullEvaluator(EvalConfig(top_k=[10], metrics=["ndcg"]), va,
                       evaluator_name="val")
    trainer = Trainer(model, tr, ev, learn,
                      DatasetConfig(n_negative_samples=h["n_neg"]),
                      batch_size=h["batch_size"], seed=seed, device_data=dd)
    return float(trainer.fit()["val/ndcg@10"])


# ---------------------------------------------------- mid-scale multi-seed
# VERDICT r4 #1: the 100-user toy artifacts carry ±0.015 seed noise — a
# systematic ~0.02 quality deficit would pass the old one-sided gates. At
# this scale (held at the verdict's floor: >=1000 users x >=1500 items x
# >=50k interactions, planted Zipf popularity tail) the per-seed spread
# collapses to ~±0.001-0.003, so a 0.01 mean-delta tolerance is decisive.
MIDSCALE_DATASET = dict(n_users=1000, n_items=1500, n_interactions=50_000,
                        popularity_alpha=0.8)
# measured per-seed-pair cost on the 1-core CI box (ref torch + ours JAX-CPU):
# mf ~105 s (20 epochs), sbnet ~135 s, dropoutnet ~105 s, dmf ~90 s (10 each)
MIDSCALE_HPARAMS = {
    "mf": dict(epochs=20, embedding_dim=32, batch_size=256, lr=5e-3),
    "sbnet": dict(epochs=10, batch_size=256),
    "dropoutnet": dict(epochs=10, batch_size=256),
    "dmf": dict(epochs=10, batch_size=256),
    "ifeatmf": dict(epochs=10, batch_size=256, embedding_dim=32),
    "ufeatmf": dict(epochs=10, batch_size=256, embedding_dim=32),
    "uprotomf": dict(epochs=10, batch_size=256, embedding_dim=32,
                     n_prototypes=16),
    "ecf": dict(epochs=10, batch_size=256, embedding_dim=32),
}


def make_midscale_artifacts(out_dir: str, seed: int = 3) -> str:
    return make_artifacts(out_dir, seed=seed, **MIDSCALE_DATASET)


def _families() -> dict:
    return {
        "mf": (train_reference_mf, train_ours_mf, MF_HPARAMS),
        "sbnet": (train_reference_sbnet, train_ours_sbnet, SBNET_HPARAMS),
        "dropoutnet": (train_reference_dropoutnet, train_ours_dropoutnet,
                       DN_HPARAMS),
        "dmf": (train_reference_dmf, train_ours_dmf, DMF_HPARAMS),
        "ifeatmf": (train_reference_ifeatmf, train_ours_ifeatmf,
                    IFMF_HPARAMS),
        "ufeatmf": (train_reference_ufeatmf, train_ours_ufeatmf,
                    IFMF_HPARAMS),
        "uprotomf": (train_reference_uprotomf, train_ours_uprotomf,
                     PROTO_HPARAMS),
        "ecf": (train_reference_ecf, train_ours_ecf, ECF_HPARAMS),
    }


def trained_parity_stats(family: str, artifact_dir: str,
                         seeds=(0, 1, 2, 3, 4), hparams: dict | None = None,
                         midscale: bool = True) -> dict:
    """Paired multi-seed trained parity for one family: train both
    frameworks once per seed, report mean/std each side plus the per-seed
    delta mean, std, and standard error (seeds index both frameworks, so
    deltas pair per seed even though the RNG streams differ). The decisive
    gate is |delta_mean| against max(tolerance, delta_sem) — see
    tests/test_trained_parity.py."""
    ref_fn, ours_fn, base = _families()[family]
    h = dict(base)
    if midscale:
        h.update(MIDSCALE_HPARAMS.get(family, {}))
    h.update(hparams or {})
    ref = [float(ref_fn(artifact_dir, seed=s, hparams=h)) for s in seeds]
    ours = [float(ours_fn(artifact_dir, seed=s, hparams=h)) for s in seeds]
    deltas = np.asarray(ours) - np.asarray(ref)
    n = len(seeds)
    return {
        "family": family, "n_seeds": n,
        "ref_runs": ref, "ours_runs": ours,
        "ref_mean": float(np.mean(ref)), "ref_std": float(np.std(ref)),
        "ours_mean": float(np.mean(ours)), "ours_std": float(np.std(ours)),
        "delta_mean": float(np.mean(deltas)),
        "delta_std": float(np.std(deltas, ddof=1)) if n > 1 else 0.0,
        "delta_sem": (float(np.std(deltas, ddof=1) / np.sqrt(n))
                      if n > 1 else 0.0),
    }


def popularity_ndcg(artifact_dir: str, k: int = 10) -> float:
    """Oracle-free floor: ndcg@10 of ranking every user by train-set item
    popularity (train items of the user excluded). A trained model must
    clear this to have learned anything beyond the planted long tail."""
    import pandas as pd

    tr = pd.read_csv(os.path.join(artifact_dir,
                                  "listening_history_train.csv"))
    va = pd.read_csv(os.path.join(artifact_dir, "listening_history_val.csv"))
    n_items = int(max(tr.item_idx.max(), va.item_idx.max())) + 1
    pop = np.bincount(tr.item_idx, minlength=n_items).astype(np.float64)
    seen = tr.groupby("user_idx").item_idx.apply(set).to_dict()
    idcg_table = np.cumsum(1.0 / np.log2(np.arange(2, k + 2)))
    vals = []
    for u, items in va.groupby("user_idx").item_idx.apply(set).items():
        p = pop.copy()
        p[list(seen.get(u, ()))] = -1.0
        top = np.argsort(-p)[:k]
        gains = np.array([1.0 if i in items else 0.0 for i in top])
        dcg = float((gains / np.log2(np.arange(2, k + 2))).sum())
        idcg = idcg_table[min(len(items), k) - 1]
        vals.append(dcg / idcg if idcg > 0 else 0.0)
    return float(np.mean(vals))


def train_reference_sbnet_missing_modality(artifact_dir: str,
                                           seed: int = 0) -> float:
    """Missing-modality scenario: train on {interactions, audio}, evaluate
    with eval_modalities=['audio'] only (reference SingleBranchNetEntity
    _get_modalities, sgd_alg.py:1879-1900)."""
    from algorithms.sgd_alg import SingleBranchNet as RefSBNet
    from data.config_classes import (
        FeatureDefinition,
        FeatureType,
        InteractionDatasetConfig,
        TrainDatasetConfig,
    )
    from data.dataset import FullEvalDataset as RefFullEvalDataset
    from data.dataset import TrainRecDataset as RefTrainRecDataset
    from data.module_config_classes import (
        EmbeddingRegularizationType,
        FeatureModuleConfig,
        SingleBranchFeatureConfig,
        SingleBranchNetConfig,
        SingleBranchNetEntityConfig,
    )

    torch.manual_seed(seed)
    np.random.seed(seed)
    feat_defs = [FeatureDefinition(name="audio", type=FeatureType.VECTOR)]
    kw = dict(item_feature_definitions=feat_defs,
              model_requires_train_interactions=True,
              model_requires_item_interactions=True)
    ref_train = RefTrainRecDataset(TrainDatasetConfig(
        dataset_path=artifact_dir, split_set="train", n_negative_samples=4,
        **kw))
    ref_val = RefFullEvalDataset(InteractionDatasetConfig(
        dataset_path=artifact_dir, split_set="val", **kw))
    icfg = SingleBranchNetEntityConfig(
        features=[SingleBranchFeatureConfig(feature_name=f,
                                            feature_hidden_layers=[16])
                  for f in _SBNET_ITEM_FEATURES],
        single_branch_hidden_layers=[32], preference_hidden_layers=[32],
        common_modality_dim=16,
        embedding_regularization_type=(
            EmbeddingRegularizationType.PairwiseSingle),
        regularization_weight=0.1,
        eval_modalities={"audio"}, sampling_seed=seed)
    conf = SingleBranchNetConfig(
        user=FeatureModuleConfig(feature_name="user_embedding",
                                 embedding_dim=16),
        item=icfg, shared_common_dim=16)
    model = RefSBNet(conf, ref_train)
    return _torch_sgd_train(model, ref_train, ref_val, dict(SBNET_HPARAMS))


def train_ours_sbnet_missing_modality(artifact_dir: str,
                                      seed: int = 0) -> float:
    h = dict(SBNET_HPARAMS)
    conf = _our_sbnet_conf(h)
    conf["item"]["eval_modalities"] = ["audio"]
    return _train_ours_sbnet_conf(artifact_dir, conf, h, seed)
