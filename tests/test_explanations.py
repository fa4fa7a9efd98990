"""Explanation-hook tests for the ProtoMF family."""
import os

import numpy as np
import pytest

from sibrar_tpu.eval.explanations import (
    prototype_statistics,
    protomf_post_val,
    tsne_prototype_plot,
)


def test_prototype_statistics_keys_and_ranges():
    rng = np.random.default_rng(0)
    protos = rng.normal(size=(8, 16)).astype(np.float32)
    ents = rng.normal(size=(100, 16)).astype(np.float32)
    stats = prototype_statistics(
        protos, ents, lambda a, b: a @ b.T, prefix="user_")
    assert set(stats) == {"user_proto_sim_mean", "user_proto_sim_max_mean",
                          "user_proto_sim_min_mean",
                          "user_proto_utilization_entropy",
                          "user_proto_dead_fraction"}
    assert 0.0 <= stats["user_proto_dead_fraction"] <= 1.0
    assert stats["user_proto_sim_max_mean"] >= stats["user_proto_sim_mean"]


def test_tsne_plot_written(tmp_path):
    rng = np.random.default_rng(1)
    out = tsne_prototype_plot(
        rng.normal(size=(6, 8)).astype(np.float32),
        rng.normal(size=(40, 8)).astype(np.float32),
        str(tmp_path / "tsne.png"))
    assert out is not None and (tmp_path / "tsne.png").exists()


def test_protomf_post_val_from_trained_params(tmp_path):
    """Hook runs on a real fitted UProtoMF params pytree."""
    import jax

    from sibrar_tpu.data.synthetic import make_synthetic_splits
    from sibrar_tpu.models.base import init_model
    from sibrar_tpu.models.protomf import UProtoMF

    splits = make_synthetic_splits(n_users=30, n_items=40, n_interactions=400,
                                   with_features=False)
    dd = splits["train"].to_device()
    model = UProtoMF(n_users=30, n_items=40, embedding_dim=8, n_prototypes=4)
    variables = init_model(model, jax.random.PRNGKey(0), dd)
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    out = protomf_post_val(params, "user", epoch=0, results_dir=str(tmp_path))
    assert "user_proto_sim_mean" in out
    assert "user_tsne_plot" in out


def test_prototype_top_items_hand_checked():
    """Reference get_top_k_items semantics (utils.py:60-83): rank by the
    prototype's column, invert=True flips to farthest."""
    import pandas as pd

    from sibrar_tpu.eval.explanations import prototype_top_items

    w = np.array([[0.1, 0.9],
                  [0.8, 0.2],
                  [0.5, 0.5],
                  [0.3, 0.7]], dtype=np.float32)
    info = pd.DataFrame({"item_idx": [0, 1, 2, 3],
                         "title": ["a", "b", "c", "d"]})
    top = prototype_top_items(w, proto_idx=0, top_k=2, item_info=info)
    assert top["item_idx"] == [1, 2]
    assert top["title"] == ["b", "c"]
    np.testing.assert_allclose(top["weight"], [0.8, 0.5])
    far = prototype_top_items(w, proto_idx=0, top_k=2, invert=True)
    assert far["item_idx"] == [0, 3]
    with pytest.raises(ValueError):
        prototype_top_items(w, proto_idx=2)


def test_prototype_top_items_report_csv(tmp_path):
    import csv

    from sibrar_tpu.eval.explanations import prototype_top_items_report

    rng = np.random.default_rng(0)
    w = rng.random((20, 3)).astype(np.float32)
    out = str(tmp_path / "report.csv")
    rows = prototype_top_items_report(w, top_k=5, out_path=out)
    assert len(rows) == 15  # 3 prototypes x 5 items
    with open(out) as fh:
        parsed = list(csv.DictReader(fh))
    assert len(parsed) == 15
    # rank 0 of each prototype is its argmax column entry
    for p in range(3):
        first = next(r for r in parsed
                     if r["prototype"] == str(p) and r["rank"] == "0")
        assert int(first["item_idx"]) == int(w[:, p].argmax())


def test_weight_contribution_figure(tmp_path):
    from sibrar_tpu.eval.explanations import weight_contribution_figure

    rng = np.random.default_rng(1)
    png = weight_contribution_figure(
        rng.random(6), rng.random(6), rng.random(4), rng.random(4),
        str(tmp_path / "w.png"))
    if png is not None:  # matplotlib present in this image
        import os

        assert os.path.getsize(png) > 0


def test_protomf_post_val_emits_item_report(tmp_path):
    from sibrar_tpu.eval.explanations import protomf_post_val

    rng = np.random.default_rng(2)
    params = {
        "prototypes": rng.normal(size=(4, 8)).astype(np.float32),
        "item_embed": {"embedding": rng.normal(size=(30, 8)).astype(np.float32)},
    }
    out = protomf_post_val(params, "item", epoch=1, results_dir=str(tmp_path))
    assert "item_proto_top_items" in out
    import os

    assert os.path.exists(out["item_proto_top_items"])


def test_prototype_top_items_report_empty_and_zero_k(tmp_path):
    """ADVICE r4: zero prototypes or top_k=0 must still write a header-only
    CSV, not IndexError on rows[0]."""
    import csv

    from sibrar_tpu.eval.explanations import prototype_top_items_report

    out = str(tmp_path / "empty.csv")
    rows = prototype_top_items_report(np.zeros((5, 0), np.float32),
                                      top_k=10, out_path=out)
    assert rows == []
    with open(out) as fh:
        parsed = list(csv.DictReader(fh))
    assert parsed == []

    out2 = str(tmp_path / "zerok.csv")
    rows2 = prototype_top_items_report(np.zeros((5, 2), np.float32),
                                       top_k=0, out_path=out2)
    assert rows2 == []
    assert os.path.exists(out2)


def test_prototype_top_items_missing_and_duplicate_info():
    """ADVICE r4: item_info join must tolerate missing item_idx rows (NaN
    fill) and deduplicate repeated ids so columns stay k-aligned."""
    import pandas as pd

    from sibrar_tpu.eval.explanations import prototype_top_items

    w = np.array([[0.1], [0.8], [0.5], [0.3]], dtype=np.float32)
    # id 1 duplicated, id 2 missing entirely
    info = pd.DataFrame({"item_idx": [0, 1, 1, 3],
                         "title": ["a", "b", "b2", "d"]})
    top = prototype_top_items(w, proto_idx=0, top_k=3, item_info=info)
    assert top["item_idx"] == [1, 2, 3]
    assert len(top["title"]) == 3
    assert top["title"][0] == "b" and top["title"][2] == "d"
    assert top["title"][1] != top["title"][1]  # NaN for the missing id
