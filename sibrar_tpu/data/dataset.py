"""Runtime dataset: reference-format artifact loading + device-resident bundles.

Host side (numpy/scipy/pandas) mirrors the reference `RecDataset` family
(`/root/reference/data/dataset.py:35-507`): it reads `user_idxs.csv` /
`item_idxs.csv` / `listening_history_{split}.csv`, per-split tabular feature CSVs
and `.npz` vector features, consults the preprocessing `used_config.yaml` for the
cold-start type, and computes `users_in_split` / `items_in_split` (restricted for
cold-start splits, full otherwise).

TPU-first difference: everything the train/eval loops touch is packed once into
immutable `DeviceData` (all-jnp, catalog-space CSR + dense feature tables), so the
hot loops run fully on device with no per-batch host work — replacing the
reference's scipy row-slicing + `.toarray()` per batch (SURVEY.md §3.2-3.3).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, NamedTuple, Optional

import numpy as np
import scipy.sparse as sp
import yaml

from sibrar_tpu.config.schema import DatasetSplitType, FeatureDefinition, FeatureType
from sibrar_tpu.data.feature import Feature
from sibrar_tpu.ops.sparse import DeviceCSR, with_cols_pad


class DeviceData(NamedTuple):
    """Device-resident view of one split, in catalog space where noted."""

    n_users: int
    n_items: int
    catalog: "object"  # jax.Array [n_catalog] int32 — global ids of items_in_split
    users_in_split: "object"  # jax.Array [n_users_in_split] int32
    # training interactions of THIS split (global user id, catalog item position)
    train_users: "object"  # [n_interactions] int32
    train_items_cat: "object"  # [n_interactions] int32 (catalog positions)
    # per-user positives of this split in catalog space (sampling exclusion + labels)
    pos_csr: DeviceCSR
    # per-user exclusion set for full-catalog eval, catalog space
    exclude_csr: DeviceCSR
    # train-split interactions in GLOBAL item space (interaction-vector models)
    user_inter_csr: DeviceCSR  # user -> global item ids (train split)
    item_inter_csr: DeviceCSR  # item -> global user ids (train split)
    popularity: "object"  # [n_catalog] float32, train-split popularity over catalog
    user_features: Dict[str, "object"]  # name -> dense table on device
    item_features: Dict[str, "object"]


def _load_preproc_split_type(data_path: str) -> DatasetSplitType:
    cfg_file = os.path.join(data_path, "used_config.yaml")
    if not os.path.exists(cfg_file):
        return DatasetSplitType.RANDOM
    with open(cfg_file) as fh:
        cfg = yaml.safe_load(fh) or {}
    split = (cfg.get("split") or {})
    split_type = split.get("split_type", "random")
    if split_type == "coldstart":
        cold = split.get("cold_start_type", "user")
        return DatasetSplitType(f"cold_start_{cold}")
    return DatasetSplitType(split_type)


@dataclass
class RecDataset:
    """One split of a preprocessed dataset, host-side."""

    split_set: str  # 'train' | 'val' | 'test'
    n_users: int
    n_items: int
    interactions: np.ndarray  # [n_interactions, 2] int64 (user_idx, item_idx)
    train_interactions: np.ndarray  # train-split interactions (same layout)
    val_interactions: Optional[np.ndarray] = None  # needed for test-time exclusion
    split_type: DatasetSplitType = DatasetSplitType.RANDOM
    user_features: Dict[str, Feature] = field(default_factory=dict)
    item_features: Dict[str, Feature] = field(default_factory=dict)
    n_negative_samples: int = 4
    negative_sampling_strategy: str = "uniform"
    popularity_squashing_factor: float = 1.0

    # ------------------------------------------------------------------ lifecycle
    def __post_init__(self):
        assert self.split_set in ("train", "val", "test")
        self.is_cold_start = self.split_type.is_cold_start
        self.is_cold_start_user = self.split_type in (
            DatasetSplitType.COLD_START_USER, DatasetSplitType.COLD_START_BOTH)
        self.is_cold_start_item = self.split_type in (
            DatasetSplitType.COLD_START_ITEM, DatasetSplitType.COLD_START_BOTH)

        inter = self.interactions
        if self.is_cold_start:
            self.users_in_split = np.unique(inter[:, 0]).astype(np.int64)
            self.items_in_split = np.unique(inter[:, 1]).astype(np.int64)
        else:
            self.users_in_split = np.arange(self.n_users, dtype=np.int64)
            self.items_in_split = np.arange(self.n_items, dtype=np.int64)
        self.n_interactions = len(inter)
        self.n_users_in_split = len(self.users_in_split)
        self.n_items_in_split = len(self.items_in_split)

        # global item id -> catalog position (-1 if absent)
        self.item_to_catalog = np.full(self.n_items, -1, dtype=np.int64)
        self.item_to_catalog[self.items_in_split] = np.arange(self.n_items_in_split)

        self.interaction_matrix = self._matrix(inter)
        self.interaction_matrix_train = (
            self.interaction_matrix if self.split_set == "train"
            else self._matrix(self.train_interactions)
        )

        self._pop = None

    def _matrix(self, inter: np.ndarray, dtype=np.int8) -> sp.csr_matrix:
        data = np.ones(len(inter), dtype=dtype)
        return sp.csr_matrix(
            (data, (inter[:, 0], inter[:, 1])), shape=(self.n_users, self.n_items)
        )

    # ------------------------------------------------------------------ properties
    @property
    def user_sampling_matrix(self) -> sp.csr_matrix:
        return self.interaction_matrix

    @property
    def user_sampling_matrix_train(self) -> sp.csr_matrix:
        return self.interaction_matrix_train

    @property
    def item_sampling_matrix_train(self) -> sp.csr_matrix:
        return sp.csr_matrix(self.interaction_matrix_train.T)

    @property
    def pop_distribution(self) -> np.ndarray:
        if self._pop is None:
            counts = np.asarray(self.interaction_matrix.sum(axis=0)).ravel()
            self._pop = counts / max(counts.sum(), 1)
        return self._pop

    def exclude_matrix(self) -> sp.csr_matrix:
        """Interactions to remove from ranking: train for val; train+val for test
        (reference `/root/reference/data/dataset.py:416-438`)."""
        mask = sp.csr_matrix((self.n_users, self.n_items), dtype=np.int8)
        if self.split_set != "train":
            mask = mask + self.interaction_matrix_train
        if self.split_set == "test":
            if self.val_interactions is None:
                raise ValueError("test split requires val interactions for exclusion")
            mask = mask + self._matrix(self.val_interactions)
        return mask.tocsr()

    # -------------------------------------------------------------------- to device
    def to_device(self) -> DeviceData:
        import jax.numpy as jnp

        cat = self.items_in_split
        # split positives in catalog space
        inter_cat = np.stack(
            [self.interactions[:, 0], self.item_to_catalog[self.interactions[:, 1]]],
            axis=1,
        )
        pos_csr_sp = sp.csr_matrix(
            (np.ones(len(inter_cat), np.int8), (inter_cat[:, 0], inter_cat[:, 1])),
            shape=(self.n_users, self.n_items_in_split),
        )
        excl_sp = self.exclude_matrix()[:, cat].tocsr()

        pop_global = np.asarray(self.interaction_matrix_train.sum(axis=0)).ravel()
        pop_cat = pop_global[cat].astype(np.float32)
        pop_cat = pop_cat / max(pop_cat.sum(), 1.0)

        return DeviceData(
            n_users=self.n_users,
            n_items=self.n_items,
            catalog=jnp.asarray(cat, dtype=jnp.int32),
            users_in_split=jnp.asarray(self.users_in_split, dtype=jnp.int32),
            train_users=jnp.asarray(inter_cat[:, 0], dtype=jnp.int32),
            train_items_cat=jnp.asarray(inter_cat[:, 1], dtype=jnp.int32),
            pos_csr=with_cols_pad(DeviceCSR.from_scipy(pos_csr_sp)),
            exclude_csr=with_cols_pad(DeviceCSR.from_scipy(excl_sp)),
            user_inter_csr=with_cols_pad(
                DeviceCSR.from_scipy(self.interaction_matrix_train)),
            item_inter_csr=with_cols_pad(
                DeviceCSR.from_scipy(self.interaction_matrix_train.T)),
            popularity=jnp.asarray(pop_cat),
            user_features={k: jnp.asarray(f.table) for k, f in self.user_features.items()},
            item_features={k: jnp.asarray(f.table) for k, f in self.item_features.items()},
        )

    # ------------------------------------------------------------------- artifacts
    @staticmethod
    def load(
        data_path: str,
        split_set: str,
        user_feature_definitions: Optional[list[FeatureDefinition]] = None,
        item_feature_definitions: Optional[list[FeatureDefinition]] = None,
        **kwargs,
    ) -> "RecDataset":
        """Load a split from a reference-format artifact directory
        (`/root/reference/data/data_preprocessing_utils.py:391-462` layout)."""
        import pandas as pd

        user_idxs = pd.read_csv(os.path.join(data_path, "user_idxs.csv"))
        item_idxs = pd.read_csv(os.path.join(data_path, "item_idxs.csv"))
        n_users, n_items = len(user_idxs), len(item_idxs)

        def lhs(split):
            df = pd.read_csv(os.path.join(data_path, f"listening_history_{split}.csv"))
            return df[["user_idx", "item_idx"]].to_numpy(dtype=np.int64)

        inter = lhs(split_set)
        train_inter = inter if split_set == "train" else lhs("train")
        val_inter = lhs("val") if split_set == "test" else None
        split_type = _load_preproc_split_type(data_path)

        def load_features(entity: str, defs, n_entities: int) -> Dict[str, Feature]:
            feats: Dict[str, Feature] = {}
            if not defs:
                return feats
            # which splits feed the feature values: train also sees val features
            # (reference /root/reference/data/dataset.py:212-214)
            splits = (split_set, "val") if split_set == "train" else (split_set,)
            all_splits = ("train", "val", "test")
            for fd in defs:
                if fd.type in (FeatureType.VECTOR, FeatureType.MATRIX):
                    vals, idxs = [], []
                    for s in splits:
                        f = os.path.join(data_path, f"{entity}_{fd.name}_{s}.npz")
                        if os.path.exists(f):
                            loaded = np.load(f, allow_pickle=True)
                            vals.append(loaded["values"])
                            idxs.append(loaded["indices"])
                    if not vals:
                        raise FileNotFoundError(
                            f"no npz found for {entity} feature {fd.name!r} in {data_path}")
                    values = np.concatenate(vals, axis=0)
                    indices = np.concatenate(idxs, axis=0)
                    indices, uniq_pos = np.unique(indices, return_index=True)
                    values = values[uniq_pos]
                    feats[fd.name] = Feature.build(fd, values, n_entities, indices)
                else:
                    frames, ref_frames = [], []
                    for s in splits:
                        f = os.path.join(data_path, f"{entity}_features_{s}.csv")
                        if os.path.exists(f):
                            frames.append(pd.read_csv(f))
                    for s in all_splits:
                        f = os.path.join(data_path, f"{entity}_features_{s}.csv")
                        if os.path.exists(f):
                            ref_frames.append(pd.read_csv(f))
                    if not frames:
                        raise FileNotFoundError(
                            f"no feature csv for {entity} in {data_path}")
                    df = pd.concat(frames).drop_duplicates(subset=f"{entity}_idx")
                    ref = pd.concat(ref_frames) if ref_frames else df
                    feats[fd.name] = Feature.build(
                        fd, df[fd.name].tolist(), n_entities,
                        indices=df[f"{entity}_idx"].to_numpy(),
                        reference_values=ref[fd.name].tolist(),
                    )
            return feats

        return RecDataset(
            split_set=split_set,
            n_users=n_users,
            n_items=n_items,
            interactions=inter,
            train_interactions=train_inter,
            val_interactions=val_inter,
            split_type=split_type,
            user_features=load_features("user", user_feature_definitions, n_users),
            item_features=load_features("item", item_feature_definitions, n_items),
            **kwargs,
        )
