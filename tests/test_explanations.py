"""Explanation-hook tests for the ProtoMF family."""
import numpy as np

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
