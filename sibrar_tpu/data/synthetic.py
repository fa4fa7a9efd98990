"""Synthetic mini-datasets for tests and benchmarks.

The reference verifies installs by running real models on ML-1M
(`/root/reference/README.md:122-138`); since no datasets ship with either repo,
tests here run on synthetic data that exercises the same artifact format —
including cold-start splits and multi-modal features — and can optionally be
written to disk in the reference's CSV/npz layout to test the artifact reader.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from sibrar_tpu.config.schema import DatasetSplitType, FeatureDefinition, FeatureType
from sibrar_tpu.data.dataset import RecDataset
from sibrar_tpu.data.feature import Feature


def make_synthetic_splits(
    n_users: int = 60,
    n_items: int = 80,
    n_interactions: int = 1500,
    split_type: DatasetSplitType = DatasetSplitType.RANDOM,
    seed: int = 0,
    with_features: bool = True,
    feature_dim: int = 12,
    latent_dim: int = 6,
    popularity_alpha: float = 0.0,
) -> dict[str, RecDataset]:
    """Generate train/val/test `RecDataset`s with planted low-rank structure.

    Interactions are sampled from a ground-truth low-rank preference model so
    that learned models can meaningfully beat random ranking in tests.

    ``popularity_alpha`` > 0 plants a Zipf-like item popularity long tail on
    top of the low-rank preferences: a random item-rank permutation r with a
    per-item score bias chosen so the marginal item draw probability scales
    ~ (r+1)^-alpha — matching the skew real interaction logs exhibit, which
    the tiny uniform fixtures lack (mid-scale trained-parity regime)."""
    rng = np.random.default_rng(seed)
    u_lat = rng.normal(size=(n_users, latent_dim)).astype(np.float32)
    i_lat = rng.normal(size=(n_items, latent_dim)).astype(np.float32)
    scores = u_lat @ i_lat.T + 0.5 * rng.normal(size=(n_users, n_items))
    if popularity_alpha > 0.0:
        ranks = rng.permutation(n_items).astype(np.float32)
        # flat_p uses exp(scores/2): bias of -2*alpha*ln(r+1) makes the item
        # factor (r+1)^-alpha in the sampling distribution
        scores = scores - 2.0 * popularity_alpha * np.log1p(ranks)[None, :]

    # draw unique (user, item) pairs biased toward high ground-truth score
    flat_p = np.exp(scores.ravel() / 2.0)
    flat_p /= flat_p.sum()
    n_pairs = min(n_interactions, n_users * n_items // 2)
    chosen = rng.choice(n_users * n_items, size=n_pairs, replace=False, p=flat_p)
    users, items = np.divmod(chosen, n_items)
    order = rng.permutation(n_pairs)
    users, items = users[order], items[order]
    inter = np.stack([users, items], axis=1).astype(np.int64)

    if split_type == DatasetSplitType.RANDOM or split_type == DatasetSplitType.TEMPORAL:
        # per-user ratio split like the reference's random/temporal splitters
        tr, va, te = [], [], []
        for u in range(n_users):
            rows = inter[inter[:, 0] == u]
            if len(rows) == 0:
                continue
            n = len(rows)
            n_tr = max(int(n * 0.6), 1)
            n_va = max(int(n * 0.2), 1) if n - n_tr >= 2 else max(n - n_tr - 1, 0)
            tr.append(rows[:n_tr])
            if n_va:
                va.append(rows[n_tr:n_tr + n_va])
            if n - n_tr - n_va > 0:
                te.append(rows[n_tr + n_va:])
        tr_i = np.concatenate(tr) if tr else np.zeros((0, 2), np.int64)
        va_i = np.concatenate(va) if va else np.zeros((0, 2), np.int64)
        te_i = np.concatenate(te) if te else np.zeros((0, 2), np.int64)
    else:
        # cold-start: split disjoint entity groups (reference
        # data_preprocessing_utils.py:278-361 semantics — val/test entities unseen)
        def cold_groups(n_entities):
            perm = rng.permutation(n_entities)
            n_tr = int(n_entities * 0.7)
            n_va = int(n_entities * 0.15)
            return (set(perm[:n_tr]), set(perm[n_tr:n_tr + n_va]),
                    set(perm[n_tr + n_va:]))

        cold_user = split_type in (DatasetSplitType.COLD_START_USER,
                                   DatasetSplitType.COLD_START_BOTH)
        cold_item = split_type in (DatasetSplitType.COLD_START_ITEM,
                                   DatasetSplitType.COLD_START_BOTH)
        u_tr, u_va, u_te = cold_groups(n_users) if cold_user else (None,) * 3
        i_tr, i_va, i_te = cold_groups(n_items) if cold_item else (None,) * 3

        def bucket(row):
            u, i = row
            if cold_user and cold_item:
                if u in u_tr and i in i_tr:
                    return "train"
                if u in u_va and i in i_va:
                    return "val"
                if u in u_te and i in i_te:
                    return "test"
                return None
            if cold_user:
                return "train" if u in u_tr else ("val" if u in u_va else "test")
            return "train" if i in i_tr else ("val" if i in i_va else "test")

        buckets = {"train": [], "val": [], "test": []}
        for row in inter:
            b = bucket(row)
            if b:
                buckets[b].append(row)
        tr_i = np.array(buckets["train"], np.int64).reshape(-1, 2)
        va_i = np.array(buckets["val"], np.int64).reshape(-1, 2)
        te_i = np.array(buckets["test"], np.int64).reshape(-1, 2)

    user_features, item_features = {}, {}
    if with_features:
        # multi-modal item features correlated with the planted latents
        proj_a = rng.normal(size=(latent_dim, feature_dim)).astype(np.float32)
        proj_b = rng.normal(size=(latent_dim, feature_dim * 2)).astype(np.float32)
        item_features["audio"] = Feature.build(
            FeatureDefinition("audio", FeatureType.VECTOR),
            (i_lat @ proj_a + 0.1 * rng.normal(size=(n_items, feature_dim))).astype(np.float32),
            n_items,
        )
        item_features["text"] = Feature.build(
            FeatureDefinition("text", FeatureType.VECTOR),
            (i_lat @ proj_b + 0.1 * rng.normal(size=(n_items, feature_dim * 2))).astype(np.float32),
            n_items,
        )
        genres = ["action", "comedy", "drama", "horror", "scifi"]
        item_features["genres"] = Feature.build(
            FeatureDefinition("genres", FeatureType.TAG),
            ["|".join(rng.choice(genres, size=rng.integers(1, 4), replace=False))
             for _ in range(n_items)],
            n_items,
        )
        user_features["gender"] = Feature.build(
            FeatureDefinition("gender", FeatureType.CATEGORICAL),
            list(rng.choice(["m", "f", "x"], size=n_users)),
            n_users,
        )
        uproj = rng.normal(size=(latent_dim, feature_dim)).astype(np.float32)
        user_features["profile_vec"] = Feature.build(
            FeatureDefinition("profile_vec", FeatureType.VECTOR),
            (u_lat @ uproj).astype(np.float32),
            n_users,
        )

    def mk(split, inter_s):
        return RecDataset(
            split_set=split,
            n_users=n_users,
            n_items=n_items,
            interactions=inter_s,
            train_interactions=tr_i,
            val_interactions=va_i if split == "test" else None,
            split_type=split_type,
            user_features=dict(user_features),
            item_features=dict(item_features),
        )

    return {"train": mk("train", tr_i), "val": mk("val", va_i), "test": mk("test", te_i)}


def write_reference_artifacts(
    out_dir: str,
    splits: dict[str, RecDataset],
    seed: int = 0,
    split_type: Optional[DatasetSplitType] = None,
) -> str:
    """Write splits to disk in the reference's artifact layout
    (`listening_history_{split}.csv`, `{entity}_features_{split}.csv`,
    `{entity}_{feat}_{split}.npz`, `user_idxs.csv`, `item_idxs.csv`,
    `used_config.yaml`) so the artifact reader can be tested end-to-end."""
    import pandas as pd
    import yaml

    os.makedirs(out_dir, exist_ok=True)
    any_split = next(iter(splits.values()))
    pd.DataFrame({
        "user": np.arange(any_split.n_users),
        "user_idx": np.arange(any_split.n_users),
    }).to_csv(os.path.join(out_dir, "user_idxs.csv"), index=False)
    pd.DataFrame({
        "item": np.arange(any_split.n_items),
        "item_idx": np.arange(any_split.n_items),
    }).to_csv(os.path.join(out_dir, "item_idxs.csv"), index=False)

    st = split_type or any_split.split_type
    # full DataPreprocessingConfig shape (the reference parses this file with
    # mashumaro: /root/reference/data/dataset.py:187-190 +
    # data/preprocessing_config_classes.py:55-71 — `ratios` and `interactions`
    # are required fields there)
    if st.is_cold_start:
        cold = st.value.replace("cold_start_", "")
        split_cfg = {"ratios": [0.7, 0.15, 0.15], "split_type": "coldstart",
                     "cold_start_type": cold, "seed": seed}
    else:
        split_cfg = {"ratios": [0.6, 0.2, 0.2], "split_type": st.value,
                     "seed": seed}
    used = {"split": split_cfg,
            "interactions": {"k_core": 0, "min_n_interactions": 0},
            "user_features": [], "item_features": []}
    with open(os.path.join(out_dir, "used_config.yaml"), "w") as fh:
        yaml.safe_dump(used, fh)

    for split, ds in splits.items():
        pd.DataFrame(ds.interactions, columns=["user_idx", "item_idx"]).to_csv(
            os.path.join(out_dir, f"listening_history_{split}.csv"), index=False)
        for entity, feats, in_split, n_ent in (
            ("user", ds.user_features, ds.users_in_split, ds.n_users),
            ("item", ds.item_features, ds.items_in_split, ds.n_items),
        ):
            tab_cols = {}
            for name, feat in feats.items():
                if feat.type in (FeatureType.VECTOR, FeatureType.MATRIX):
                    np.savez(
                        os.path.join(out_dir, f"{entity}_{name}_{split}.npz"),
                        indices=in_split,
                        values=feat.table[in_split],
                    )
                elif feat.type == FeatureType.CATEGORICAL:
                    inv = {v: k for k, v in feat.value_map.items()}
                    tab_cols[name] = [inv[int(c)] for c in feat.table[in_split]]
                elif feat.type == FeatureType.TAG:
                    inv = {v: k for k, v in feat.value_map.items()}
                    tab_cols[name] = [
                        "|".join(inv[int(t)] for t in row if t != feat.padding_idx)
                        for row in feat.table[in_split]
                    ]
                else:
                    tab_cols[name] = feat.table[in_split].tolist()
            if tab_cols:
                df = pd.DataFrame({f"{entity}_idx": in_split, **tab_cols})
                df.to_csv(
                    os.path.join(out_dir, f"{entity}_features_{split}.csv"), index=False)
    return out_dir


def make_onion_scale_splits(
    n_users: int = 50_000,
    n_items: int = 100_352,
    n_interactions: int = 2_000_000,
    n_clusters: int = 64,
    seed: int = 7,
    feature_dims: Optional[dict] = None,
) -> dict[str, RecDataset]:
    """North-star-scale synthetic splits (the paper's onion18 regime:
    `/root/reference/conf/single/dataset_onion18_conf.yml` + README ML-1M
    smoke-run scale) WITHOUT materializing the [n_users, n_items] score
    matrix `make_synthetic_splits` uses (20 GB here).

    Structure: items carry a Zipf popularity tail plus a cluster assignment;
    each user draws half their items from global popularity and half from
    their own cluster — so popularity models, id-embedding models, AND
    content models (cluster-correlated vector/tag features) all have signal
    to learn. Splits are per-user 0.6/0.2/0.2 like the reference's random
    splitter."""
    rng = np.random.default_rng(seed)
    feature_dims = feature_dims or {"ivec256": 256, "bert": 384,
                                    "musicnn": 128}
    item_cluster = rng.integers(0, n_clusters, n_items)
    user_cluster = rng.integers(0, n_clusters, n_users)
    ranks = rng.permutation(n_items).astype(np.float64)
    pop = 1.0 / (ranks + 10.0) ** 0.8
    pop /= pop.sum()

    draws = int(n_interactions * 1.6)
    users = rng.integers(0, n_users, draws)
    from_pop = rng.random(draws) < 0.5
    items = np.empty(draws, np.int64)
    items[from_pop] = rng.choice(n_items, size=int(from_pop.sum()), p=pop)
    # cluster draws: uniform member of the user's own cluster, via the
    # concatenated per-cluster item list (no per-row python)
    items_by_cluster = [np.where(item_cluster == c)[0]
                        for c in range(n_clusters)]
    sizes = np.array([len(x) for x in items_by_cluster])
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    flat_items = np.concatenate(items_by_cluster)
    cl = user_cluster[users[~from_pop]]
    within = (rng.random(int((~from_pop).sum())) * sizes[cl]).astype(np.int64)
    items[~from_pop] = flat_items[offsets[cl] + within]

    pairs = np.unique(np.stack([users, items], axis=1), axis=0)
    rng.shuffle(pairs)
    pairs = pairs[:n_interactions]
    # per-user 0.6/0.2/0.2: order each user's rows randomly, then split by
    # within-user position (all vectorized)
    order = np.lexsort((rng.random(len(pairs)), pairs[:, 0]))
    pairs = pairs[order]
    _u, starts, counts = np.unique(pairs[:, 0], return_index=True,
                                   return_counts=True)
    pos = np.arange(len(pairs)) - np.repeat(starts, counts)
    cnt = np.repeat(counts, counts)
    frac = pos / cnt
    # users with <3 interactions stay train-only
    bucket = np.where(cnt < 3, 0,
                      np.where(frac < 0.6, 0, np.where(frac < 0.8, 1, 2)))
    tr_i = pairs[bucket == 0]
    va_i = pairs[bucket == 1]
    te_i = pairs[bucket == 2]

    centers = {name: rng.normal(size=(n_clusters, d)).astype(np.float32)
               for name, d in feature_dims.items()}
    item_features = {}
    for name, d in feature_dims.items():
        table = (centers[name][item_cluster]
                 + 0.6 * rng.normal(size=(n_items, d))).astype(np.float32)
        item_features[name] = Feature.build(
            FeatureDefinition(name, FeatureType.VECTOR), table, n_items)
    # genres: the item's cluster tag plus two random tags — content signal
    # a tag tower can exploit
    tagv = [f"g{t}" for t in range(n_clusters)]
    extra = rng.integers(0, n_clusters, (n_items, 2))
    genre_strings = [
        "|".join({tagv[item_cluster[i]], tagv[extra[i, 0]], tagv[extra[i, 1]]})
        for i in range(n_items)]
    item_features["genres"] = Feature.build(
        FeatureDefinition("genres", FeatureType.TAG), genre_strings, n_items)

    def mk(split, inter_s):
        return RecDataset(
            split_set=split, n_users=n_users, n_items=n_items,
            interactions=inter_s, train_interactions=tr_i,
            val_interactions=va_i if split == "test" else None,
            split_type=DatasetSplitType.RANDOM,
            user_features={}, item_features=dict(item_features))

    return {"train": mk("train", tr_i), "val": mk("val", va_i),
            "test": mk("test", te_i)}
