"""Serving layer (`sibrar_tpu.serve.Recommender`): exact top-k lists with
on-device exclusion, fixed-batch jitted step, run-dir reload."""
import os

import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from sibrar_tpu.data.synthetic import make_synthetic_splits
from sibrar_tpu.serve import Recommender


@pytest.fixture(scope="module")
def splits():
    return make_synthetic_splits(n_users=40, n_items=70, n_interactions=900,
                                 seed=13)


def _dot_score_fn(n_users, n_items, d=8, seed=0):
    rng = np.random.default_rng(seed)
    u_mat = jnp.asarray(rng.standard_normal((n_users, d)).astype(np.float32))
    items = jnp.asarray(rng.standard_normal((n_items, d)).astype(np.float32))

    def score_fn(u):
        return u_mat[u] @ items.T

    score_fn.dot_parts = (lambda u: u_mat[u], items)
    return score_fn, np.asarray(u_mat), np.asarray(items)


def test_recommend_matches_oracle_and_excludes_seen(splits):
    val = splits["val"]
    score_fn, u_np, i_np = _dot_score_fn(val.n_users, val.n_items_in_split)
    rec = Recommender(score_fn, val, k=10, batch_size=16)
    users = np.asarray(val.users_in_split)[:25]  # pads 25 -> 32
    ids, scores = rec.recommend(users, return_scores=True)
    assert ids.shape == (25, 10) and scores.shape == (25, 10)
    assert np.all(np.diff(scores, axis=1) <= 1e-6)  # descending

    # oracle: full scores with the split's exclusions set to -inf
    full = u_np[users] @ i_np.T
    excl = val.exclusion_lists if hasattr(val, "exclusion_lists") else None
    csr = rec.data.exclude_csr
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices)
    for r, u in enumerate(users):
        banned = indices[indptr[u]:indptr[u + 1]]
        assert not set(ids[r]) & set(np.asarray(val.items_in_split)[banned])
        row = full[r].copy()
        row[banned] = -np.inf
        oracle_ids = np.asarray(val.items_in_split)[
            np.argsort(-row, kind="stable")[:10]]
        np.testing.assert_array_equal(np.sort(scores[r])[::-1],
                                      np.sort(row[oracle_ids])[::-1])


def test_recommend_without_exclusion(splits):
    val = splits["val"]
    score_fn, u_np, i_np = _dot_score_fn(val.n_users, val.n_items_in_split,
                                         seed=2)
    rec = Recommender(score_fn, val, k=5, batch_size=8, exclude_seen=False)
    users = np.asarray(val.users_in_split)[:8]
    ids, scores = rec.recommend(users, return_scores=True)
    full = u_np[users] @ i_np.T
    np.testing.assert_allclose(scores, -np.sort(-full, axis=1)[:, :5],
                               atol=1e-6)


def test_from_run_dir_roundtrip(tmp_path):
    """Fit MF through the experiment CLI, reload it for serving, and check
    the lists against the model's own score_fn."""
    import run_experiment
    from sibrar_tpu.data.synthetic import write_reference_artifacts

    splits = make_synthetic_splits(n_users=30, n_items=40,
                                   n_interactions=600, seed=5)
    art = str(tmp_path / "data")
    write_reference_artifacts(art, splits)
    res = str(tmp_path / "run")
    conf_path = str(tmp_path / "conf.yml")
    with open(conf_path, "w") as fh:
        yaml.safe_dump({
            "learn": {"n_epochs": 2, "lr": 0.005, "rec_loss": "bpr",
                      "optimizing_metric": "ndcg@5"},
            "eval": {"top_k": [5], "metrics": ["ndcg"]},
            "loader": {"batch_size": 32, "eval_batch_size": 32},
            "dataset": {"n_negative_samples": 2},
            "model": {"embedding_dim": 8},
            "results_path": res,
        }, fh)
    run_experiment.main(["-a", "mf", "-d", art, "-t", "train_val",
                         "-c", conf_path])

    rec = Recommender.from_run_dir(res, split="val", batch_size=16)
    users = np.arange(10)
    ids = rec.recommend(users, k=5)
    assert ids.shape == (10, 5)
    assert set(ids.ravel()) <= set(np.asarray(rec.dataset.items_in_split))
    # lists must agree with the reloaded model's own masked scores
    scores = np.asarray(rec.score_fn(jnp.asarray(users, jnp.int32)))
    indptr = np.asarray(rec.data.exclude_csr.indptr)
    indices = np.asarray(rec.data.exclude_csr.indices)
    for r, u in enumerate(users):
        row = scores[r].copy()
        row[indices[indptr[u]:indptr[u + 1]]] = -np.inf
        top = np.asarray(rec.dataset.items_in_split)[
            np.argsort(-row, kind="stable")[:5]]
        assert set(ids[r]) == set(top), (r, ids[r], top)


def test_from_run_dir_matrix_algorithm(tmp_path):
    """Closed-form algorithms reload for serving through the same entry."""
    import run_experiment
    from sibrar_tpu.data.synthetic import write_reference_artifacts

    splits = make_synthetic_splits(n_users=30, n_items=40,
                                   n_interactions=600, seed=6)
    art = str(tmp_path / "data")
    write_reference_artifacts(art, splits)
    res = str(tmp_path / "run")
    conf_path = str(tmp_path / "conf.yml")
    with open(conf_path, "w") as fh:
        yaml.safe_dump({
            "eval": {"top_k": [5], "metrics": ["ndcg"]},
            "loader": {"batch_size": 32, "eval_batch_size": 32},
            "model": {"lam": 5.0},
            "results_path": res,
        }, fh)
    run_experiment.main(["-a", "ease", "-d", art, "-t", "train_val",
                         "-c", conf_path])
    rec = Recommender.from_run_dir(res, split="val", batch_size=8)
    ids = rec.recommend(np.arange(6), k=5)
    assert ids.shape == (6, 5)
    assert set(ids.ravel()) <= set(np.asarray(rec.dataset.items_in_split))


def test_recommend_empty_request(splits):
    val = splits["val"]
    score_fn, _, _ = _dot_score_fn(val.n_users, val.n_items_in_split)
    rec = Recommender(score_fn, val, k=10, batch_size=16)
    ids = rec.recommend(np.array([], dtype=np.int64))
    assert ids.shape == (0, 10)
    ids, scores = rec.recommend([], k=5, return_scores=True)
    assert ids.shape == (0, 5) and scores.shape == (0, 5)


def test_recommend_mesh_matches_single_device(splits):
    """Catalog-sharded serving (mesh item axis) returns the same lists as
    the single-device recommender."""
    from sibrar_tpu.parallel.mesh import make_mesh

    val = splits["val"]
    score_fn, _, _ = _dot_score_fn(val.n_users, val.n_items_in_split)
    users = np.asarray(val.users_in_split)[:20]
    plain = Recommender(score_fn, val, k=10, batch_size=16)
    mesh = make_mesh(8, item_parallelism=2)
    sharded = Recommender(score_fn, val, k=10, batch_size=16, mesh=mesh)
    ids_p, sc_p = plain.recommend(users, return_scores=True)
    ids_s, sc_s = sharded.recommend(users, return_scores=True)
    np.testing.assert_allclose(sc_p, sc_s, rtol=1e-6)
    np.testing.assert_array_equal(ids_p, ids_s)


def test_recommend_mesh_odd_catalog_exhausted_rows():
    """Catalog not divisible by the item shards (pad columns) plus a k that
    exceeds some users' unseen-item count: returned ids must stay inside the
    catalog (pad positions are clamped, never leak to the host gather)."""
    from sibrar_tpu.parallel.mesh import make_mesh

    sp = make_synthetic_splits(n_users=12, n_items=65, n_interactions=500,
                               seed=21)
    val = sp["val"]
    c = val.n_items_in_split
    assert c % 2, "fixture should give an odd catalog"
    score_fn, _, _ = _dot_score_fn(val.n_users, c, seed=2)
    mesh = make_mesh(8, item_parallelism=2)
    rec = Recommender(score_fn, val, k=c, batch_size=8, mesh=mesh)
    users = np.asarray(val.users_in_split)
    ids = rec.recommend(users)  # k == full catalog > any unseen count
    assert ids.shape == (len(users), rec.k)
    assert set(ids.ravel()) <= set(np.asarray(val.items_in_split))


def test_recommend_mesh_dot_path_matches_single_device():
    """Mesh serving for dot models rides the per-shard fused GEMM→peel chain
    (interpret mode in CI): lists identical to the single-device recommender,
    ok-flag redo machinery in place."""
    from sibrar_tpu.parallel.mesh import make_mesh

    sp = make_synthetic_splits(n_users=16, n_items=6001, n_interactions=500,
                               seed=8)
    val = sp["val"]
    c = val.n_items_in_split
    score_fn, _, _ = _dot_score_fn(val.n_users, c, seed=4)
    mesh = make_mesh(8, item_parallelism=2)
    sharded = Recommender(score_fn, val, k=10, batch_size=8, mesh=mesh,
                          dot_interpret=True)
    # the dot step (3-tuple with ok flags) was actually selected
    assert hasattr(sharded, "_redo_step")
    plain = Recommender(score_fn, val, k=10, batch_size=8)
    users = np.asarray(val.users_in_split)[:12]
    ids_s, sc_s = sharded.recommend(users, return_scores=True)
    ids_p, sc_p = plain.recommend(users, return_scores=True)
    np.testing.assert_allclose(sc_p, sc_s, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(ids_p, ids_s)


def test_recommend_bf16_matches_bf16_oracle(splits):
    """dtype="bfloat16" serving: selection is exact for the bf16-input
    scores (oracle computed with the same casts, f32 accumulation)."""
    val = splits["val"]
    score_fn, u_np, i_np = _dot_score_fn(val.n_users, val.n_items_in_split,
                                         seed=7)
    rec = Recommender(score_fn, val, k=10, batch_size=16, dtype="bfloat16")
    users = np.asarray(val.users_in_split)[:20]
    ids, scores = rec.recommend(users, return_scores=True)

    full = np.asarray(jnp.dot(jnp.asarray(u_np[users], jnp.bfloat16),
                              jnp.asarray(i_np, jnp.bfloat16).T,
                              preferred_element_type=jnp.float32))
    csr = rec.data.exclude_csr
    indptr, indices = np.asarray(csr.indptr), np.asarray(csr.indices)
    cat = np.asarray(val.items_in_split)
    for r, u in enumerate(users):
        banned = indices[indptr[u]:indptr[u + 1]]
        assert not set(ids[r]) & set(cat[banned])
        row = full[r].copy()
        row[banned] = -np.inf
        # values must match the bf16-input oracle exactly (selection is
        # exact; only the scores are low-precision)
        np.testing.assert_array_equal(np.sort(scores[r])[::-1],
                                      np.sort(row, kind="stable")[::-1][:10])


def test_recommend_bf16_mesh_dot_matches_single_device():
    """dtype + mesh compose: the per-shard fused dot chain consumes the cast
    parts and matches the single-device bf16 recommender."""
    from sibrar_tpu.parallel.mesh import make_mesh

    sp = make_synthetic_splits(n_users=16, n_items=6001, n_interactions=500,
                               seed=9)
    val = sp["val"]
    score_fn, _, _ = _dot_score_fn(val.n_users, val.n_items_in_split, seed=5)
    mesh = make_mesh(8, item_parallelism=2)
    sharded = Recommender(score_fn, val, k=10, batch_size=8, mesh=mesh,
                          dot_interpret=True, dtype="bfloat16")
    plain = Recommender(score_fn, val, k=10, batch_size=8, dtype="bfloat16")
    users = np.asarray(val.users_in_split)[:12]
    ids_s, sc_s = sharded.recommend(users, return_scores=True)
    ids_p, sc_p = plain.recommend(users, return_scores=True)
    np.testing.assert_allclose(sc_p, sc_s, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(ids_p, ids_s)


def test_recommend_dtype_without_dot_parts_warns_and_serves(splits, caplog):
    """dtype on a non-dot score_fn: warn once, serve in native precision."""
    import logging

    val = splits["val"]
    _, u_np, i_np = _dot_score_fn(val.n_users, val.n_items_in_split, seed=3)
    full = jnp.asarray(u_np @ i_np.T)

    def score_fn(u):  # no dot_parts attribute
        return full[u]

    with caplog.at_level(logging.WARNING, logger="sibrar_tpu.serve"):
        rec = Recommender(score_fn, val, k=5, batch_size=8, dtype="bfloat16")
    assert any("dot_parts" in m for m in caplog.messages)
    ids = rec.recommend(np.asarray(val.users_in_split)[:4])
    assert ids.shape == (4, 5)


def test_serve_recs_cli(tmp_path):
    """serve_recs.py end-to-end: fit through the experiment CLI, serve lists
    to CSV and JSONL, ids stay inside the catalog and shapes line up."""
    import run_experiment
    import serve_recs
    from sibrar_tpu.data.synthetic import write_reference_artifacts

    splits = make_synthetic_splits(n_users=30, n_items=40,
                                   n_interactions=600, seed=15)
    art = str(tmp_path / "data")
    write_reference_artifacts(art, splits)
    res = str(tmp_path / "run")
    conf_path = str(tmp_path / "conf.yml")
    with open(conf_path, "w") as fh:
        yaml.safe_dump({
            "learn": {"n_epochs": 1, "lr": 0.005, "rec_loss": "bpr",
                      "optimizing_metric": "ndcg@5"},
            "eval": {"top_k": [5], "metrics": ["ndcg"]},
            "loader": {"batch_size": 32, "eval_batch_size": 32},
            "dataset": {"n_negative_samples": 2},
            "model": {"embedding_dim": 8},
            "results_path": res,
        }, fh)
    run_experiment.main(["-a", "mf", "-d", art, "-t", "train_val",
                         "-c", conf_path])

    csv_out = str(tmp_path / "recs.csv")
    assert serve_recs.main(["-r", res, "-s", "val", "-k", "5", "-u", "0,3,7",
                            "--scores", "-o", csv_out]) == 0
    lines = open(csv_out).read().strip().splitlines()
    assert lines[0].split(",")[:2] == ["user", "item_0"]
    assert len(lines) == 4 and len(lines[1].split(",")) == 11

    jsonl_out = str(tmp_path / "recs.jsonl")
    users_file = str(tmp_path / "users.txt")
    open(users_file, "w").write("1\n2\n")
    assert serve_recs.main(["-r", res, "-s", "val", "-k", "5",
                            "-u", users_file, "-o", jsonl_out]) == 0
    import json as _json

    rows = [_json.loads(line) for line in open(jsonl_out)]
    assert [r["user"] for r in rows] == [1, 2]
    cat = set(int(i) for i in
              np.asarray(make_synthetic_splits(
                  n_users=30, n_items=40, n_interactions=600,
                  seed=15)["val"].items_in_split))
    assert all(set(r["items"]) <= cat for r in rows)


def test_quantize_rows_int8_roundtrip():
    """Per-row symmetric quantization: zero rows stay zero, reconstruction
    error is bounded by half a quantization step per element."""
    from sibrar_tpu.serve import quantize_rows_int8

    rng = np.random.default_rng(3)
    x = rng.standard_normal((9, 33)).astype(np.float32) * 5.0
    x[4] = 0.0
    q, s = quantize_rows_int8(jnp.asarray(x))
    q, s = np.asarray(q), np.asarray(s)
    assert q.dtype == np.int8 and s.dtype == np.float32
    assert np.all(q[4] == 0)
    recon = q.astype(np.float32) * s[:, None]
    assert np.max(np.abs(recon - x)) <= 0.5 * s.max() + 1e-6
    # scales hit the full int8 range on the row max
    assert np.all(np.abs(q).max(axis=1)[np.arange(9) != 4] == 127)


def test_recommend_int8_matches_int8_oracle(splits):
    """dtype="int8" serving: selection is exact for the quantized scores
    (oracle = same per-row quantization, integer matmul, same dequant
    order), and exclusion stays exact."""
    from sibrar_tpu.serve import quantize_rows_int8

    val = splits["val"]
    score_fn, u_np, i_np = _dot_score_fn(val.n_users, val.n_items_in_split,
                                         seed=11)
    rec = Recommender(score_fn, val, k=10, batch_size=16, dtype="int8")
    users = np.asarray(val.users_in_split)[:20]
    ids, scores = rec.recommend(users, return_scores=True)

    q_i, s_i = map(np.asarray, quantize_rows_int8(jnp.asarray(i_np)))
    q_u, s_u = map(np.asarray, quantize_rows_int8(jnp.asarray(u_np[users])))
    acc = q_u.astype(np.int32) @ q_i.astype(np.int32).T  # exact integers
    full = (acc.astype(np.float32) * s_u[:, None]) * s_i[None, :]
    csr = rec.data.exclude_csr
    indptr, indices = np.asarray(csr.indptr), np.asarray(csr.indices)
    cat = np.asarray(val.items_in_split)
    for r, u in enumerate(users):
        banned = indices[indptr[u]:indptr[u + 1]]
        assert not set(ids[r]) & set(cat[banned])
        row = full[r].copy()
        row[banned] = -np.inf
        np.testing.assert_allclose(
            np.sort(scores[r])[::-1],
            np.sort(row, kind="stable")[::-1][:10], rtol=1e-6)
    # quantization is mild: the int8 lists overlap the f32 lists heavily
    exact = Recommender(score_fn, val, k=10, batch_size=16)
    ids_f32 = exact.recommend(users)
    overlap = np.mean([len(set(a) & set(b)) for a, b in zip(ids, ids_f32)])
    assert overlap >= 7.0, overlap


def test_recommend_approx_selection(splits):
    """selection="approx": exclusions are exact; on CPU approx_max_k lowers
    to the exact fallback, so lists match the exact recommender."""
    val = splits["val"]
    score_fn, u_np, i_np = _dot_score_fn(val.n_users, val.n_items_in_split,
                                         seed=4)
    approx = Recommender(score_fn, val, k=10, batch_size=16,
                         selection="approx", recall_target=0.9)
    exact = Recommender(score_fn, val, k=10, batch_size=16)
    users = np.asarray(val.users_in_split)[:20]
    ids_a, sc_a = approx.recommend(users, return_scores=True)
    ids_e, sc_e = exact.recommend(users, return_scores=True)
    csr = exact.data.exclude_csr
    indptr, indices = np.asarray(csr.indptr), np.asarray(csr.indices)
    cat = np.asarray(val.items_in_split)
    for r, u in enumerate(users):
        banned = indices[indptr[u]:indptr[u + 1]]
        assert not set(ids_a[r]) & set(cat[banned])
    np.testing.assert_allclose(sc_a, sc_e, rtol=1e-6)
    np.testing.assert_array_equal(ids_a, ids_e)


def test_recommend_int8_approx_compose(splits):
    """int8 quantization + approx selection compose (the latency-serving
    stack): valid ids, exclusions exact."""
    val = splits["val"]
    score_fn, _, _ = _dot_score_fn(val.n_users, val.n_items_in_split, seed=6)
    rec = Recommender(score_fn, val, k=5, batch_size=8, dtype="int8",
                      selection="approx")
    users = np.asarray(val.users_in_split)[:10]
    ids = rec.recommend(users)
    cat = set(int(i) for i in np.asarray(val.items_in_split))
    assert all(set(map(int, row)) <= cat for row in ids)
    csr = rec.data.exclude_csr
    indptr, indices = np.asarray(csr.indptr), np.asarray(csr.indices)
    catalog = np.asarray(val.items_in_split)
    for r, u in enumerate(users):
        banned = indices[indptr[u]:indptr[u + 1]]
        assert not set(map(int, ids[r])) & set(map(int, catalog[banned]))


def test_recommend_selection_validation(splits):
    val = splits["val"]
    score_fn, _, _ = _dot_score_fn(val.n_users, val.n_items_in_split)
    with pytest.raises(ValueError, match="selection"):
        Recommender(score_fn, val, selection="fastest")
    with pytest.raises(ValueError, match="recall_target"):
        Recommender(score_fn, val, selection="approx", recall_target=0.0)


def test_recommend_int8_mesh_scores_path():
    """int8 + mesh: the quantized score_fn rides the per-shard scatter chain
    (the fused dot path is f32/bf16-only) and matches single-device int8."""
    from sibrar_tpu.parallel.mesh import make_mesh

    sp = make_synthetic_splits(n_users=16, n_items=600, n_interactions=500,
                               seed=9)
    val = sp["val"]
    score_fn, _, _ = _dot_score_fn(val.n_users, val.n_items_in_split, seed=5)
    mesh = make_mesh(8, item_parallelism=2)
    sharded = Recommender(score_fn, val, k=10, batch_size=8, mesh=mesh,
                          dtype="int8")
    plain = Recommender(score_fn, val, k=10, batch_size=8, dtype="int8")
    users = np.asarray(val.users_in_split)[:12]
    ids_s, sc_s = sharded.recommend(users, return_scores=True)
    ids_p, sc_p = plain.recommend(users, return_scores=True)
    np.testing.assert_allclose(sc_p, sc_s, rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(ids_p, ids_s)
