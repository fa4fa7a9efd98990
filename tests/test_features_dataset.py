"""Feature encoding + dataset/artifact round-trip tests."""
import numpy as np
import pytest

from sibrar_tpu.config.schema import DatasetSplitType, FeatureDefinition, FeatureType
from sibrar_tpu.data.dataset import RecDataset
from sibrar_tpu.data.feature import Feature
from sibrar_tpu.data.synthetic import make_synthetic_splits, write_reference_artifacts


def test_categorical_feature_sorted_codes():
    f = Feature.build(
        FeatureDefinition("color", FeatureType.CATEGORICAL),
        ["red", "blue", "red", "green"], n_entities=5,
        indices=np.array([0, 1, 2, 4]),
    )
    # sorted unique values for reproducibility (reference Feature.py:210-211)
    assert f.unique_values == ["blue", "green", "red"]
    assert f.table[0] == 2 and f.table[1] == 0 and f.table[4] == 1
    assert not f.present[3]
    assert f.n_unique_categories == 3
    assert set(f.value_indices_groups["red"]) == {0, 2}


def test_categorical_reference_values_extend_categories():
    f = Feature.build(
        FeatureDefinition("c", FeatureType.CATEGORICAL),
        ["a", "b"], n_entities=2, reference_values=["a", "b", "z"],
    )
    assert f.unique_values == ["a", "b", "z"]


def test_tag_feature_padding():
    f = Feature.build(
        FeatureDefinition("genres", FeatureType.TAG),
        ["action|comedy", "drama", "action|drama|scifi"], n_entities=3,
    )
    assert f.unique_values == ["action", "comedy", "drama", "scifi"]
    assert f.padding_idx == 4
    assert f.table.shape == (3, 3)
    row0 = set(f.table[0]) - {4}
    assert row0 == {f.value_map["action"], f.value_map["comedy"]}
    assert (f.table[1] == [f.value_map["drama"], 4, 4]).all()


def test_vector_feature_fill_missing():
    vals = np.arange(6, dtype=np.float32).reshape(2, 3)
    f = Feature.build(
        FeatureDefinition("v", FeatureType.VECTOR), vals, n_entities=4,
        indices=np.array([1, 3]))
    assert f.table.shape == (4, 3)
    assert (f.table[0] == 0).all() and (f.table[1] == vals[0]).all()
    assert f.input_dim == 3


def test_mismatched_indices_raise():
    with pytest.raises(ValueError):
        Feature.build(FeatureDefinition("v", FeatureType.VECTOR),
                      np.zeros((3, 2)), n_entities=5, indices=np.array([0, 1]))


def test_artifact_round_trip(tmp_path):
    splits = make_synthetic_splits(seed=7)
    out = write_reference_artifacts(str(tmp_path / "art"), splits)
    ds = RecDataset.load(
        out, "train",
        user_feature_definitions=[
            FeatureDefinition("gender", FeatureType.CATEGORICAL),
            FeatureDefinition("profile_vec", FeatureType.VECTOR)],
        item_feature_definitions=[
            FeatureDefinition("audio", FeatureType.VECTOR),
            FeatureDefinition("genres", FeatureType.TAG)],
    )
    tr = splits["train"]
    assert ds.n_interactions == tr.n_interactions
    assert ds.n_users == tr.n_users and ds.n_items == tr.n_items
    np.testing.assert_allclose(
        ds.item_features["audio"].table[tr.items_in_split],
        tr.item_features["audio"].table[tr.items_in_split], rtol=1e-6)
    # interaction matrices identical
    assert (ds.interaction_matrix != tr.interaction_matrix).nnz == 0


def test_cold_start_splits_disjoint():
    for st, attr in [
        (DatasetSplitType.COLD_START_ITEM, "items_in_split"),
        (DatasetSplitType.COLD_START_USER, "users_in_split"),
    ]:
        splits = make_synthetic_splits(split_type=st, seed=11)
        tr, va, te = splits["train"], splits["val"], splits["test"]
        assert set(getattr(tr, attr)).isdisjoint(getattr(va, attr))
        assert set(getattr(tr, attr)).isdisjoint(getattr(te, attr))
        assert tr.split_type.is_cold_start


def test_exclude_matrix_semantics():
    """val excludes train; test excludes train+val (reference dataset.py:416-438)."""
    splits = make_synthetic_splits(seed=5)
    tr, va, te = splits["train"], splits["val"], splits["test"]
    assert tr.exclude_matrix().nnz == 0
    ex_val = va.exclude_matrix()
    assert (ex_val != tr.interaction_matrix).nnz == 0
    ex_test = te.exclude_matrix()
    expected = (tr.interaction_matrix + va._matrix(va.interactions)).tocsr()
    assert (ex_test != expected).nnz == 0


def test_cold_start_artifact_round_trip(tmp_path):
    splits = make_synthetic_splits(split_type=DatasetSplitType.COLD_START_ITEM, seed=2)
    out = write_reference_artifacts(str(tmp_path / "cs"), splits)
    ds = RecDataset.load(out, "test")
    assert ds.split_type == DatasetSplitType.COLD_START_ITEM
    assert ds.n_items_in_split == splits["test"].n_items_in_split


def test_tag_dense_table_multi_hot():
    # padded-int TAG tables must densify to multi-hot before similarity
    # (reference knn_algs.py:129-140 consumes a float matrix)
    f = Feature.build(
        FeatureDefinition("genres", FeatureType.TAG),
        ["action|comedy", "drama", "action|drama|scifi"], n_entities=4,
        indices=np.array([0, 1, 3]),
    )
    dt = f.dense_table()
    assert dt.shape == (4, 4) and dt.dtype == np.float32
    vm = f.value_map
    expect = np.zeros((4, 4), dtype=np.float32)
    expect[0, [vm["action"], vm["comedy"]]] = 1.0
    expect[1, vm["drama"]] = 1.0
    expect[3, [vm["action"], vm["drama"], vm["scifi"]]] = 1.0
    np.testing.assert_array_equal(dt, expect)
    # multi_hot tables pass through identically
    f2 = Feature.build(
        FeatureDefinition("genres", FeatureType.TAG),
        ["action|comedy", "drama", "action|drama|scifi"], n_entities=4,
        indices=np.array([0, 1, 3]), multi_hot=True,
    )
    np.testing.assert_array_equal(f2.dense_table(), expect)


def test_categorical_dense_table_one_hot():
    f = Feature.build(
        FeatureDefinition("color", FeatureType.CATEGORICAL),
        ["red", "blue", "red"], n_entities=4, indices=np.array([0, 1, 3]),
    )
    dt = f.dense_table()
    assert dt.shape == (4, 2)
    vm = f.value_map
    expect = np.zeros((4, 2), dtype=np.float32)
    expect[0, vm["red"]] = 1.0
    expect[1, vm["blue"]] = 1.0
    expect[3, vm["red"]] = 1.0
    np.testing.assert_array_equal(dt, expect)


def test_numeric_dense_table_column():
    f = Feature.build(
        FeatureDefinition("year", FeatureType.CONTINUOUS),
        np.array([1.0, 2.0, 3.0]), n_entities=3)
    dt = f.dense_table()
    assert dt.shape == (3, 1)
    np.testing.assert_allclose(dt[:, 0], [1.0, 2.0, 3.0])


def test_dense_table_byte_budget(monkeypatch):
    """ADVICE r4: oversized TAG/CATEGORICAL densifications raise a clear
    error instead of host-OOMing the ifknn fit path."""
    import pytest

    import sibrar_tpu.data.feature as feature_mod
    from sibrar_tpu.config.schema import FeatureDefinition, FeatureType
    from sibrar_tpu.data.feature import Feature

    f = Feature.build(FeatureDefinition("genres", FeatureType.TAG),
                      ["a|b", "b|c", "c"], 3)
    assert f.dense_table().shape == (3, 3)
    monkeypatch.setattr(feature_mod, "DENSE_TABLE_MAX_BYTES", 8)
    with pytest.raises(ValueError, match="budget"):
        f.dense_table()
