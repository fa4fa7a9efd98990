"""Interaction and feature filtering (offline, host-side).

Parity target: `/root/reference/data/filtering.py:62-275` — min-occurrence
interaction filtering, timestamp-ordered dedup, k-core, tabular feature filters
(values/range/missing/top), entity↔feature cross-filtering, and index
remapping. Implemented with vectorized pandas (the reference loops per filter
step too; k-core is inherently iterative).
"""
from __future__ import annotations

import logging
from typing import Iterable

import numpy as np
import pandas as pd

from sibrar_tpu.preprocessing.ppconfig import PPFeatureConfig
from sibrar_tpu.preprocessing.records import EntityFeatures, MultiDFeature

log = logging.getLogger(__name__)


# ------------------------------------------------------------------ interactions
def filter_min_interactions(lhs: pd.DataFrame, min_interactions: int) -> pd.DataFrame:
    """Keep (user, item) pairs that occur at least `min_interactions` times."""
    if min_interactions <= 1:
        return lhs
    counts = lhs.groupby(["user", "item"])["user"].transform("size")
    out = lhs[counts >= min_interactions]
    log.info("min-interaction filter (%d): %d -> %d rows",
             min_interactions, len(lhs), len(out))
    return out


def filter_unique(lhs: pd.DataFrame) -> pd.DataFrame:
    """Deduplicate (user, item), keeping the earliest interaction by timestamp."""
    out = lhs.sort_values("timestamp").drop_duplicates(subset=["user", "item"])
    log.info("dedup: %d -> %d rows", len(lhs), len(out))
    return out


def filter_k_core(lhs: pd.DataFrame, k: int) -> pd.DataFrame:
    """Iterated k-core: drop items then users with < k interactions until stable."""
    if k <= 0:
        return lhs
    while True:
        before = len(lhs)
        item_counts = lhs["item"].value_counts()
        lhs = lhs[lhs["item"].isin(item_counts.index[item_counts >= k])]
        user_counts = lhs["user"].value_counts()
        lhs = lhs[lhs["user"].isin(user_counts.index[user_counts >= k])]
        if len(lhs) == before:
            return lhs


# --------------------------------------------------------------- tabular features
def filter_values(df: pd.DataFrame, column: str, values: Iterable) -> pd.DataFrame:
    return df[df[column].isin(set(values))]


def filter_range(df: pd.DataFrame, column: str, low=None, high=None) -> pd.DataFrame:
    mask = pd.Series(True, index=df.index)
    if low is not None:
        mask &= df[column] >= low
    if high is not None:
        mask &= df[column] <= high
    return df[mask]


def filter_missing(df: pd.DataFrame, column: str) -> pd.DataFrame:
    return df[df[column].notna()]


def filter_top_categories(df: pd.DataFrame, column: str, n: int) -> pd.DataFrame:
    top = df[column].value_counts().index[:n]
    return df[df[column].isin(set(top))]


_TABULAR_FILTERS = {
    "filter_values": filter_values,
    "filter_range": filter_range,
    "filter_missing": filter_missing,
    "filter_top": filter_top_categories,
}


def apply_tabular_filters(entity: str, features: EntityFeatures,
                          configs: list[PPFeatureConfig]) -> EntityFeatures:
    """Run each feature's preprocessing step list over the tabular frame
    (reference filtering.py:62-96)."""
    df = features.tabular
    if df is None:
        return features
    for fc in configs:
        for step in fc.preprocessing:
            if step.kind not in _TABULAR_FILTERS:
                raise ValueError(
                    f"preprocessing kind {step.kind!r} not supported; choose from "
                    f"{sorted(_TABULAR_FILTERS)}")
            before = len(df)
            df = _TABULAR_FILTERS[step.kind](df, fc.name, **step.parameters)
            log.info("%s %s on %r: %d -> %d", entity, step.kind, fc.name,
                     before, len(df))
    return EntityFeatures(tabular=df, multidimensional=features.multidimensional)


# ---------------------------------------------------------------- cross-filtering
def entity_ids_with_all_features(features: EntityFeatures) -> set | None:
    """Ids present in the tabular frame AND every nd feature (None = no features)."""
    sets = []
    if features.tabular is not None:
        id_col = features.tabular.columns[0]  # '{entity}' id column
        sets.append(set(features.tabular[id_col]))
    for f in features.multidimensional.values():
        sets.append(set(np.asarray(f.indices).tolist()))
    if not sets:
        return None
    out = sets[0]
    for s in sets[1:]:
        out &= s
    return out


def filter_history_by_features(lhs: pd.DataFrame, entity: str,
                               features: EntityFeatures) -> pd.DataFrame:
    """Drop interactions of entities lacking any configured feature
    (reference filter_history, filtering.py:157-167)."""
    ids = entity_ids_with_all_features(features)
    if ids is None:
        return lhs
    return lhs[lhs[entity].isin(ids)]


def filter_features_by_ids(entity: str, features: EntityFeatures,
                           ids: Iterable, id_col: str | None = None
                           ) -> EntityFeatures:
    """Restrict features to the given entity ids (reference filter_based_on_indices).

    `id_col` names the tabular column holding the ids (default: the raw
    '{entity}' column; pass '{entity}_idx' after reindexing)."""
    ids = set(ids)
    id_col = id_col or entity
    tabular = None
    if features.tabular is not None:
        tabular = features.tabular[features.tabular[id_col].isin(ids)]
    multi = {}
    for name, f in features.multidimensional.items():
        mask = np.isin(np.asarray(f.indices), list(ids))
        multi[name] = MultiDFeature(f.indices[mask], f.values[mask])
    return EntityFeatures(tabular=tabular, multidimensional=multi)


# --------------------------------------------------------------------- reindexing
def create_index(lhs: pd.DataFrame) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Assign dense 0..N indices, ordering by (timestamp, user, item) for
    determinism (reference data_preprocessing_utils.py:63-84)."""
    lhs = lhs.sort_values(["timestamp", "user", "item"])
    user_idxs = lhs["user"].drop_duplicates().reset_index(drop=True)
    item_idxs = lhs["item"].drop_duplicates().reset_index(drop=True)
    user_idxs = user_idxs.rename_axis("user_idx").reset_index()[["user", "user_idx"]]
    item_idxs = item_idxs.rename_axis("item_idx").reset_index()[["item", "item_idx"]]
    lhs = lhs.merge(user_idxs, on="user").merge(item_idxs, on="item")
    return lhs, user_idxs, item_idxs


def reindex_features(entity: str, features: EntityFeatures,
                     id_map: pd.DataFrame) -> EntityFeatures:
    """Attach '{entity}_idx' to tabular features and remap nd feature indices to
    the dense index space; entities absent from the map are dropped."""
    idx_col = f"{entity}_idx"
    tabular = None
    if features.tabular is not None:
        tabular = features.tabular.merge(id_map, on=entity)
    mapping = dict(zip(id_map[entity], id_map[idx_col]))
    multi = {}
    for name, f in features.multidimensional.items():
        keep = np.array([i in mapping for i in np.asarray(f.indices)], dtype=bool)
        new_idx = np.array([mapping[i] for i in np.asarray(f.indices)[keep]],
                           dtype=np.int64)
        order = np.argsort(new_idx)
        multi[name] = MultiDFeature(new_idx[order], f.values[keep][order])
    return EntityFeatures(tabular=tabular, multidimensional=multi)
