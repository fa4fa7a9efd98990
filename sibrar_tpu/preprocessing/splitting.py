"""Train/val/test splitting: per-user ratio (temporal | random) and cold-start.

Parity target: `/root/reference/data/data_preprocessing_utils.py:177-379`:

- temporal: per user, earliest interactions → train, then val, last → test;
- random: same ratios over a seeded shuffle;
- cold-start: disjoint entity groups; val/test entities are unseen in train
  (user: row bands; item: column bands; both: diagonal blocks — the ASCII
  diagram at reference :283-296). Features are restricted per split.

Per-user ratio sizing matches the reference exactly: n_test = ceil(n·r_test),
n_val = ceil(n·r_val), n_train = n − n_val − n_test; implemented vectorized
with groupby-cumcount instead of the reference's per-user Python loop.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from sibrar_tpu.preprocessing.filtering import filter_features_by_ids
from sibrar_tpu.preprocessing.ppconfig import ColdStartType, SplitConfig, SplitType
from sibrar_tpu.preprocessing.records import AllSplitsData, RawData, SplitData


def _per_user_ratio_assign(lhs: pd.DataFrame, ratios) -> pd.Series:
    """Vectorized per-user position bucketing: 0=train, 1=val, 2=test."""
    grp = lhs.groupby("user_idx")
    n = grp["user_idx"].transform("size")
    pos = grp.cumcount()
    n_test = np.ceil(n * ratios[2]).astype(int)
    n_val = np.ceil(n * ratios[1]).astype(int)
    n_train = n - n_val - n_test
    bucket = np.where(pos < n_train, 0, np.where(pos < n_train + n_val, 1, 2))
    return pd.Series(bucket, index=lhs.index)


def _ratio_split_sizes(n: int, ratios) -> tuple[int, int, int]:
    n_test = int(np.ceil(n * ratios[2]))
    n_val = int(np.ceil(n * ratios[1]))
    return n - n_val - n_test, n_val, n_test


def split_per_user_ratio(data: RawData, config: SplitConfig,
                         temporal: bool) -> AllSplitsData:
    lhs = data.interactions
    if temporal:
        lhs = lhs.sort_values(["timestamp", "user_idx", "item_idx"])
    else:
        lhs = lhs.sample(frac=1.0, random_state=config.seed)
    bucket = _per_user_ratio_assign(lhs, config.ratios)

    user_indices = np.sort(lhs["user_idx"].unique())
    item_indices = np.sort(lhs["item_idx"].unique())
    splits = []
    for b in (0, 1, 2):
        splits.append(SplitData(
            interactions=lhs[bucket == b],
            user_indices=user_indices,
            item_indices=item_indices,
            # warm splits share all users/items → features are shared
            user_features=data.user_features,
            item_features=data.item_features,
        ))
    return AllSplitsData(*splits)


def split_cold_start(data: RawData, config: SplitConfig) -> AllSplitsData:
    rng = np.random.default_rng(config.seed)
    lhs = data.interactions
    cold = config.cold_start_type

    def entity_bands(col: str, is_cold: bool):
        uniq = np.sort(lhs[col].unique())
        if not is_cold:
            return uniq, uniq, uniq
        shuffled = uniq.copy()
        rng.shuffle(shuffled)
        n_train, n_val, n_test = _ratio_split_sizes(len(shuffled), config.ratios)
        return (shuffled[:n_train], shuffled[n_train:n_train + n_val],
                shuffled[n_train + n_val:])

    cold_user = cold in (ColdStartType.USER, ColdStartType.BOTH)
    cold_item = cold in (ColdStartType.ITEM, ColdStartType.BOTH)
    user_bands = entity_bands("user_idx", cold_user)
    item_bands = entity_bands("item_idx", cold_item)

    splits = []
    for users, items in zip(user_bands, item_bands):
        u_set, i_set = set(users.tolist()), set(items.tolist())
        inter = lhs[lhs["user_idx"].isin(u_set) & lhs["item_idx"].isin(i_set)]
        # features are already reindexed to the dense idx space at split time
        # (reference passes 'user_idx' too, data_preprocessing_utils.py:341-343)
        splits.append(SplitData(
            interactions=inter,
            user_indices=np.sort(users),
            item_indices=np.sort(items),
            user_features=filter_features_by_ids(
                "user", data.user_features, u_set, id_col="user_idx"),
            item_features=filter_features_by_ids(
                "item", data.item_features, i_set, id_col="item_idx"),
        ))
    return AllSplitsData(*splits)


def split_ratio_based(data: RawData, config: SplitConfig) -> AllSplitsData:
    """Dispatcher (reference data_preprocessing_utils.py:364-379)."""
    config.validate()
    if config.split_type == SplitType.TEMPORAL:
        return split_per_user_ratio(data, config, temporal=True)
    if config.split_type == SplitType.RANDOM:
        return split_per_user_ratio(data, config, temporal=False)
    if config.split_type == SplitType.COLDSTART:
        return split_cold_start(data, config)
    raise ValueError(f"split type {config.split_type!r} is not supported")
