"""End-to-end preprocessing pipeline.

Parity target: the script body of `/root/reference/data/preprocess_dataset.py:18-101`:
load → cross-filter history↔features → tabular feature filters → interaction
filters (min-count, dedup, k-core) → reindex → split (random/temporal/
cold-start) → normalize (train-fit-only iff cold-start) → store in the
reference artifact layout.
"""
from __future__ import annotations

import logging
import os

import pandas as pd

from sibrar_tpu.preprocessing.filtering import (
    apply_tabular_filters,
    create_index,
    filter_features_by_ids,
    filter_history_by_features,
    filter_k_core,
    filter_min_interactions,
    filter_unique,
    reindex_features,
)
from sibrar_tpu.preprocessing.normalization import normalize_features
from sibrar_tpu.preprocessing.ppconfig import PreprocessingConfig
from sibrar_tpu.preprocessing.records import AllSplitsData, EntityFeatures, RawData
from sibrar_tpu.preprocessing.splitting import split_ratio_based
from sibrar_tpu.preprocessing.store import split_dir_name, store_splits

log = logging.getLogger(__name__)


def load_raw(data_dir: str, config: PreprocessingConfig) -> RawData:
    """Read `listening_history.csv` + feature files from a raw dataset dir
    (reference load_data, data_preprocessing_utils.py:519-528)."""
    import numpy as np

    lhs = pd.read_csv(os.path.join(data_dir, "listening_history.csv"))
    if "timestamp" not in lhs.columns:
        lhs = lhs.assign(timestamp=np.arange(len(lhs)))

    def load_entity(entity: str, feature_configs) -> EntityFeatures:
        from sibrar_tpu.config.schema import FeatureType
        from sibrar_tpu.preprocessing.records import MultiDFeature

        tabular = None
        csv = os.path.join(data_dir, f"{entity}_features.csv")
        tab_names = [fc.name for fc in feature_configs
                     if fc.type not in (FeatureType.VECTOR, FeatureType.MATRIX)]
        if tab_names:
            if not os.path.exists(csv):
                raise FileNotFoundError(f"feature file {csv!r} does not exist")
            tabular = pd.read_csv(csv)
            missing = set(tab_names) - set(tabular.columns)
            if missing:
                raise ValueError(f"columns for {entity} feature(s) {sorted(missing)} "
                                 f"are missing in {csv}")
            tabular = tabular[[entity, *tab_names]]
        multi = {}
        for fc in feature_configs:
            if fc.type in (FeatureType.VECTOR, FeatureType.MATRIX):
                f = os.path.join(data_dir, f"{entity}_{fc.name}.npz")
                if not os.path.exists(f):
                    raise FileNotFoundError(f"data file for {entity} feature "
                                            f"{fc.name!r} does not exist")
                loaded = np.load(f, allow_pickle=True)
                multi[fc.name] = MultiDFeature(loaded["indices"], loaded["values"])
        return EntityFeatures(tabular=tabular, multidimensional=multi)

    return RawData(
        interactions=lhs,
        user_features=load_entity("user", config.user_features),
        item_features=load_entity("item", config.item_features),
    )


def preprocess(data: RawData, config: PreprocessingConfig,
               out_base: str | None = None) -> AllSplitsData:
    """Run the full pipeline; writes artifacts iff `out_base` is given
    (into `{out_base}/{split_dir_name}`)."""
    lhs = data.interactions
    # 1. tabular feature filters, then cross-filter history ↔ features
    user_features = apply_tabular_filters("user", data.user_features,
                                          config.user_features)
    item_features = apply_tabular_filters("item", data.item_features,
                                          config.item_features)
    if config.require_all_features:
        lhs = filter_history_by_features(lhs, "user", user_features)
        lhs = filter_history_by_features(lhs, "item", item_features)

    # 2. interaction filters
    lhs = filter_min_interactions(lhs, config.interactions.min_interactions)
    if config.interactions.deduplicate:
        lhs = filter_unique(lhs)
    lhs = filter_k_core(lhs, config.interactions.k_core)
    if len(lhs) == 0:
        raise ValueError("no interactions left after filtering")

    # 3. restrict features to surviving entities, reindex everything
    user_features = filter_features_by_ids("user", user_features,
                                           set(lhs["user"]))
    item_features = filter_features_by_ids("item", item_features,
                                           set(lhs["item"]))
    lhs, user_idxs, item_idxs = create_index(lhs)
    user_features = reindex_features("user", user_features, user_idxs)
    item_features = reindex_features("item", item_features, item_idxs)
    indexed = RawData(interactions=lhs, user_features=user_features,
                      item_features=item_features)

    # 4. split + 5. normalize (fit basis rule inside)
    splits = split_ratio_based(indexed, config.split)
    splits = normalize_features(splits, config)

    # 6. store
    if out_base:
        out_dir = os.path.join(out_base, split_dir_name(config))
        store_splits(out_dir, splits, config, user_idxs, item_idxs)
        log.info("stored splits to %s", out_dir)
    return splits
