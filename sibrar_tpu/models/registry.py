"""Algorithm registry: name → builder, mirroring the reference's 26-entry
enum→class map (`/root/reference/algorithms/algorithms_utils.py:11-42`).

Two families (the reference's three collapse to two here because naive
algorithms are expressed as fit-once matrix recommenders):

- ``sgd``    — flax RecModels trained by `sibrar_tpu.train.trainer.Trainer`;
  builders take ``(conf, dataset, device_data)``.
- ``matrix`` — fit-once algorithms over the train CSR (KNN/EASE/SLIM/SVD/ALS/
  RBMF/P3alpha/Random/Popular); builders take ``(conf, dataset)``.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from sibrar_tpu.models import matrix_algs
from sibrar_tpu.models.dmf import DeepMatrixFactorization
from sibrar_tpu.models.dropoutnet import DropoutNet
from sibrar_tpu.models.ecf import ECF
from sibrar_tpu.models.feat_mf import (
    ItemFeatureMatrixFactorization,
    UserFeatureMatrixFactorization,
)
from sibrar_tpu.models.mf import ACF, SGDBaseline, SGDMatrixFactorization
from sibrar_tpu.models.protomf import (
    IProtoMF,
    IProtoMFs,
    UIProtoMF,
    UIProtoMFs,
    UProtoMF,
    UProtoMFs,
)
from sibrar_tpu.models.sbnet import SingleBranchNet


@dataclass(frozen=True)
class AlgorithmSpec:
    name: str
    kind: str  # 'sgd' | 'matrix'
    build: Callable


def _sgd(name, fn):
    return AlgorithmSpec(name, "sgd", fn)


def _mtx(name, fn):
    return AlgorithmSpec(name, "matrix", fn)


def _knn(alg):
    return lambda conf, dataset: matrix_algs.KNNAlgorithm.build_from_conf(
        {**conf, "alg": alg}, dataset)


ALGORITHMS: dict[str, AlgorithmSpec] = {
    # ------------------------------------------------------------- SGD family
    "sgdbias": _sgd("sgdbias", lambda c, d, dd: SGDBaseline(
        n_users=d.n_users, n_items=d.n_items)),
    "mf": _sgd("mf", lambda c, d, dd: SGDMatrixFactorization.build_from_conf(c, d)),
    "acf": _sgd("acf", lambda c, d, dd: ACF(
        n_users=d.n_users, n_items=d.n_items,
        embedding_dim=c.get("embedding_dim", 100),
        n_anchors=c.get("n_anchors", 20),
        delta_exc=c.get("delta_exc", 1e-1),
        delta_inc=c.get("delta_inc", 1e-2))),
    "uprotomf": _sgd("uprotomf", lambda c, d, dd: UProtoMF.build_from_conf(c, d)),
    "iprotomf": _sgd("iprotomf", lambda c, d, dd: IProtoMF.build_from_conf(c, d)),
    "uiprotomf": _sgd("uiprotomf", lambda c, d, dd: UIProtoMF.build_from_conf(c, d)),
    "uprotomfs": _sgd("uprotomfs", lambda c, d, dd: UProtoMFs.build_from_conf(c, d)),
    "iprotomfs": _sgd("iprotomfs", lambda c, d, dd: IProtoMFs.build_from_conf(c, d)),
    "uiprotomfs": _sgd("uiprotomfs", lambda c, d, dd: UIProtoMFs.build_from_conf(c, d)),
    "ecf": _sgd("ecf", lambda c, d, dd: ECF.build_from_conf(c, d, dd)),
    "dmf": _sgd("dmf", lambda c, d, dd: DeepMatrixFactorization.build_from_conf(c, d, dd)),
    "ifeatmf": _sgd("ifeatmf",
                    lambda c, d, dd: ItemFeatureMatrixFactorization.build_from_conf(c, d)),
    "ufeatmf": _sgd("ufeatmf",
                    lambda c, d, dd: UserFeatureMatrixFactorization.build_from_conf(c, d)),
    "dropoutnet": _sgd("dropoutnet", lambda c, d, dd: DropoutNet.build_from_conf(c, d, dd)),
    "sbnet": _sgd("sbnet", lambda c, d, dd: SingleBranchNet.build_from_conf(c, d, dd)),
    # --------------------------------------------------------- matrix family
    "uknn": _mtx("uknn", _knn("uknn")),
    "iknn": _mtx("iknn", _knn("iknn")),
    "ifknn": _mtx("ifknn", _knn("ifknn")),
    "svd": _mtx("svd", matrix_algs.SVDAlgorithm.build_from_conf),
    "als": _mtx("als", matrix_algs.AlternatingLeastSquare.build_from_conf),
    "rbmf": _mtx("rbmf", matrix_algs.RBMF.build_from_conf),
    "slim": _mtx("slim", matrix_algs.SLIM.build_from_conf),
    "ease": _mtx("ease", matrix_algs.EASE.build_from_conf),
    "p3alpha": _mtx("p3alpha", matrix_algs.P3alpha.build_from_conf),
    "rand": _mtx("rand", matrix_algs.RandomItems.build_from_conf),
    "pop": _mtx("pop", matrix_algs.PopularItems.build_from_conf),
}
# `uiprotomfs_combine` (reference sgd_alg.py:1088-1115 enum entry) is a
# predict-time composition of two fitted models — see
# `sibrar_tpu.models.protomf.UIProtoMFsCombine`; it is constructed by the
# experiment layer from two saved runs, not from a single conf.


def get_algorithm(name: str) -> AlgorithmSpec:
    if name not in ALGORITHMS:
        raise ValueError(
            f"unknown algorithm {name!r}; choose from {sorted(ALGORITHMS)}")
    return ALGORITHMS[name]
