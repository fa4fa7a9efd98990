"""Exactness tests for the peel selection kernel (ops/pallas_peel, interpret
mode on the CPU mesh). Oracle: scatter −∞ + `lax.top_k` — the baseline
semantics of `ops/topk.masked_topk(method="full")`."""
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from sibrar_tpu.ops.pallas_peel import (
    gather_windows_rows,
    peel_masked_topk,
    peel_masked_topk_scores,
    peel_topk_windows,
    peel_values,
    peel_viable,
)
from sibrar_tpu.ops.pallas_window import window_scores_from

_NEG = -1e30


def _oracle(scores, cols, mask, k):
    s = np.asarray(scores).copy()
    if cols is not None:
        cols, mask = np.asarray(cols), np.asarray(mask)
        for b in range(s.shape[0]):
            s[b, cols[b][mask[b]]] = _NEG
    v, i = lax.top_k(jnp.asarray(s), k)
    return np.asarray(v), np.asarray(i)


def _check(v, i, scores, ov, cols=None, mask=None):
    """Values exact; indices valid (may differ from oracle only on ties) and
    never excluded."""
    v, i = np.asarray(v), np.asarray(i)
    np.testing.assert_allclose(v, ov, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.take_along_axis(np.asarray(scores), i, 1), ov, rtol=1e-6, atol=1e-6)
    for b in range(i.shape[0]):  # distinct indices per row
        assert len(set(i[b].tolist())) == i.shape[1]
    if cols is not None:
        excl = [set(np.asarray(cols)[b][np.asarray(mask)[b]].tolist())
                for b in range(i.shape[0])]
        for b in range(i.shape[0]):
            live = ov[b] > _NEG / 2  # only live slots must avoid exclusion
            assert not (set(i[b][live].tolist()) & excl[b])


# ---------------------------------------------------------------- peel_values
def test_peel_values_matches_lax_topk_when_unique():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(37, 128)).astype(np.float32)  # a.s. all-distinct
    v = peel_values(jnp.asarray(x), 16, rows_per_block=16, interpret=True)
    rv, _ = lax.top_k(jnp.asarray(x), 16)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))


def test_peel_values_collapses_ties_to_distinct():
    x = np.zeros((2, 128), np.float32)
    x[0, 10:20] = 5.0   # ten copies of 5
    x[0, 50] = 3.0
    v = np.asarray(peel_values(jnp.asarray(x), 4, rows_per_block=8,
                               interpret=True))
    np.testing.assert_array_equal(v[0], [5.0, 3.0, 0.0, -np.inf])


def test_peel_values_wide_window_and_short_t():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(9, 256)).astype(np.float32)
    v = peel_values(jnp.asarray(x), 4, rows_per_block=8, interpret=True)
    rv, _ = lax.top_k(jnp.asarray(x), 4)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))


def test_gather_windows_rows_layout():
    rng = np.random.default_rng(2)
    sw_t = rng.normal(size=(16, 8, 128)).astype(np.float32)
    widx = rng.integers(0, 16, size=(8, 5)).astype(np.int32)
    out = gather_windows_rows(jnp.asarray(sw_t), jnp.asarray(widx),
                              interpret=True)
    ref = np.stack([sw_t[widx[b, j], b] for b in range(8) for j in range(5)]
                   ).reshape(8, 5, 128)
    np.testing.assert_array_equal(np.asarray(out), ref)


# --------------------------------------------------------------- end-to-end
@pytest.mark.parametrize("b,c,d,e,k,t", [
    (8, 2048, 128, 16, 10, 8),     # aligned
    (5, 1000, 48, 7, 10, 4),       # everything needs padding
    (16, 5120, 128, 33, 100, 16),  # margin > windows touched
])
def test_peel_fused_dot_topk_matches_oracle(b, c, d, e, k, t):
    rng = np.random.default_rng(3)
    u = rng.normal(size=(b, d)).astype(np.float32)
    it = rng.normal(size=(c, d)).astype(np.float32)
    cols = np.stack([rng.choice(c, size=e, replace=False) for _ in range(b)]
                    ).astype(np.int32)
    mask = rng.random((b, e)) < 0.8
    scores = jnp.asarray(u) @ jnp.asarray(it).T
    ov, _ = _oracle(scores, cols, mask, k)
    v, i = peel_masked_topk(jnp.asarray(u), jnp.asarray(it),
                            jnp.asarray(cols), jnp.asarray(mask), k, t=t,
                            interpret=True)
    _check(v, i, scores, ov, cols, mask)


def test_peel_scores_path_no_exclusion():
    rng = np.random.default_rng(4)
    s = rng.normal(size=(12, 3000)).astype(np.float32)
    ov, oi = lax.top_k(jnp.asarray(s), 50)
    v, i = peel_masked_topk_scores(jnp.asarray(s), None, None, 50, t=16,
                                   interpret=True)
    _check(v, i, s, np.asarray(ov))


def test_peel_exclusion_clustered_history():
    """A user's excluded items cluster inside the top-scoring window (the
    popularity-ordered-id case). Pre-peel masking must keep the peel budget
    for live items — no fallback needed, result exact."""
    b, c, k = 4, 2048, 8
    s = np.zeros((b, c), np.float32) - 5.0
    s[:, 256:384] = 100.0          # window 2 dominates...
    cols = np.tile(np.arange(256, 384, dtype=np.int32), (b, 1))[:, :120]
    mask = np.ones_like(cols, bool)  # ...and 120 of its 128 items are history
    ov, _ = _oracle(jnp.asarray(s), cols, mask, k)
    v, i = peel_masked_topk_scores(jnp.asarray(s), jnp.asarray(cols),
                                   jnp.asarray(mask), k, t=8, interpret=True)
    _check(v, i, s, ov, cols, mask)


def test_peel_fallback_when_occupancy_exceeds_t():
    """All top-k items live in ONE window with t < k: the completeness check
    must trip and the dense fallback must still return the exact answer."""
    b, c, k = 2, 2048, 12
    rng = np.random.default_rng(5)
    s = rng.normal(size=(b, c)).astype(np.float32)
    s[:, 512:512 + 64] += 1000.0  # one window holds all winners
    ov, oi = lax.top_k(jnp.asarray(s), k)
    v, i = peel_masked_topk_scores(jnp.asarray(s), None, None, k, t=4,
                                   interpret=True)
    _check(v, i, s, np.asarray(ov))


def test_peel_ties_across_windows():
    s = np.zeros((3, 1024), np.float32)
    s[:, 100] = 7.0
    s[:, 300] = 7.0
    s[:, 700] = 7.0
    s[:, 50] = 9.0
    ov, _ = _oracle(jnp.asarray(s), None, None, 4)
    v, i = peel_masked_topk_scores(jnp.asarray(s), None, None, 4, t=4,
                                   interpret=True)
    _check(v, i, s, ov)
    assert np.asarray(i)[0, 0] == 50
    assert set(np.asarray(i)[0, 1:4].tolist()) == {100, 300, 700}


def test_peel_topk_windows_padded_tail_negative_scores():
    """Partial catalog window: zero-score pad elements must not shadow real
    negative scores (the pallas_score r1 margin bug class, ADVICE.md)."""
    b, c = 4, 1000  # pads to 1024: last window is 104 real + 24 pad
    rng = np.random.default_rng(6)
    s = -np.abs(rng.normal(size=(b, c)).astype(np.float32)) - 1.0  # all < 0
    sp = np.pad(s, ((0, 0), (0, 24)))  # pad with zeros, as a fused scorer would
    sw, wmax = window_scores_from(jnp.asarray(np.pad(sp, ((0, 4), (0, 0)))),
                                  tb=8, bc=1024, interpret=True)
    cols = jnp.zeros((8, 0), jnp.int32)
    mask = jnp.zeros((8, 0), bool)
    v, i = peel_topk_windows(sw, wmax, cols, mask, 10, c, t=8, interpret=True)
    ov, _ = _oracle(jnp.asarray(s), None, None, 10)
    _check(v[:b], i[:b], s, ov)
    assert np.asarray(i).max() < c  # pad ids never returned


def test_peel_duplicate_winner_value_in_window():
    """An in-window duplicate of a winner value means the distinct-value
    merge under-counted — the uniqueness check must force the fallback."""
    rng = np.random.default_rng(8)
    s = rng.normal(size=(2, 2048)).astype(np.float32)
    s[0, 700] = s[0, 650] = 50.0  # two copies in window 5, both true top-k
    s[1, 100] = 60.0
    ov, _ = _oracle(jnp.asarray(s), None, None, 6)
    v, i = peel_masked_topk_scores(jnp.asarray(s), None, None, 6, t=8,
                                   interpret=True)
    _check(v, i, s, ov)
    assert {650, 700} <= set(np.asarray(i)[0].tolist())


def test_peel_degenerate_constant_scores():
    """All-equal scores: every window has ONE distinct value, so the peel
    cannot fill k slots — the all-live check must force the dense fallback."""
    s = np.full((3, 2048), 2.5, np.float32)
    ov, _ = _oracle(jnp.asarray(s), None, None, 20)
    v, i = peel_masked_topk_scores(jnp.asarray(s), None, None, 20, t=4,
                                   interpret=True)
    _check(v, i, s, ov)


def test_peel_corrected_wmax_heavy_exclusion_padded():
    """E ≫ k with a padded catalog: the corrected-wmax pass (m = k+1, no +E
    margin) must stay exact — exclusion-displaced windows are re-maxed
    exactly, fully-excluded windows drop out, pad lanes never win."""
    rng = np.random.default_rng(12)
    b, c, k, e = 4, 2000, 10, 300
    s = rng.normal(size=(b, c)).astype(np.float32)
    cols = np.stack([np.sort(rng.choice(c, size=e, replace=False))
                     for _ in range(b)]).astype(np.int32)
    cols[0, :128] = np.arange(128)  # user 0: window 0 fully excluded
    mask = np.ones((b, e), bool)
    ov, _ = _oracle(jnp.asarray(s), cols, mask, k)
    v, i = peel_masked_topk_scores(jnp.asarray(s), jnp.asarray(cols),
                                   jnp.asarray(mask), k, t=8, interpret=True)
    _check(v, i, s, ov, cols, mask)


def test_peel_viable_dispatch_bounds():
    assert peel_viable(100_352, 100, 0)
    assert peel_viable(100_352, 100, 64)
    # corrected wmax: viability no longer depends on E up to _CORR_MAX_E
    assert peel_viable(100_352, 100, 400)
    assert peel_viable(8192, 30, 30)
    assert not peel_viable(4096, 100, 5000)   # margin swallows the catalog
    assert not peel_viable(8192, 100, 5000)   # beyond _CORR_MAX_E: +E margin
    assert not peel_viable(2048, 100, 0)      # 2*(k+1) > 16 windows


def test_masked_topk_peel_method_matches_full():
    """The production dispatch surface: method='peel' through masked_topk
    (interpret-incapable on CPU — only run the wiring when on TPU)."""
    import jax

    from sibrar_tpu.ops.sparse import DeviceCSR
    from sibrar_tpu.ops.topk import masked_topk

    rng = np.random.default_rng(7)
    s = jnp.asarray(rng.normal(size=(4, 8192)).astype(np.float32))
    csr = DeviceCSR(indptr=jnp.asarray([0, 1, 2, 3, 4], jnp.int32),
                    indices=jnp.asarray([1, 2, 3, 4], jnp.int32),
                    n_rows=4, n_cols=8192, max_row_len=1)
    if jax.default_backend() == "tpu":
        v, _ = masked_topk(s, csr, jnp.arange(4), 10, method="peel")
        vf, _ = masked_topk(s, csr, jnp.arange(4), 10, method="full")
        np.testing.assert_allclose(np.asarray(v), np.asarray(vf), rtol=1e-6)
    else:  # auto must not pick peel off-TPU
        v, _ = masked_topk(s, csr, jnp.arange(4), 10, method="auto")
        vf, _ = masked_topk(s, csr, jnp.arange(4), 10, method="full")
        np.testing.assert_allclose(np.asarray(v), np.asarray(vf), rtol=1e-6)


def test_peel_fuzz_panel_against_oracle():
    """Seeded fuzz: random shapes, paddings, exclusion widths and score
    distributions (normal / heavy-tailed / discrete / clustered) — values
    must match the scatter+lax.top_k oracle everywhere."""
    rng = np.random.default_rng(99)
    for trial in range(12):
        b = int(rng.integers(2, 10))
        c = int(rng.integers(600, 4500))
        k = int(rng.integers(1, 40))
        e = int(rng.integers(0, 60))
        t = int(rng.choice([2, 4, 8, 12]))
        dist = trial % 4
        if dist == 0:
            s = rng.standard_normal((b, c))
        elif dist == 1:
            s = rng.standard_cauchy((b, c))  # heavy tails
        elif dist == 2:
            s = rng.integers(-5, 5, size=(b, c)).astype(float)  # many ties
        else:
            s = rng.standard_normal((b, c))
            w0 = int(rng.integers(0, max(c // 128, 1))) * 128
            s[:, w0:w0 + 128] += 10.0  # clustered winners
        s = s.astype(np.float32)
        if e:
            cols = np.stack([np.sort(rng.choice(c, size=e, replace=False))
                             for _ in range(b)]).astype(np.int32)
            mask = rng.random((b, e)) < 0.9
        else:
            cols = mask = None
        ov, _ = _oracle(jnp.asarray(s), cols, mask, min(k, c))
        v, i = peel_masked_topk_scores(
            jnp.asarray(s), None if cols is None else jnp.asarray(cols),
            None if mask is None else jnp.asarray(mask), min(k, c), t=t,
            interpret=True)
        msg = f"trial {trial}: b={b} c={c} k={k} e={e} t={t} dist={dist}"
        np.testing.assert_allclose(np.asarray(v), ov, rtol=1e-6, atol=1e-6,
                                   err_msg=msg)
        np.testing.assert_allclose(
            np.take_along_axis(s, np.asarray(i), 1), ov, rtol=1e-6,
            atol=1e-6, err_msg=msg)


def test_padded_batch_exactness_ok_stays_true():
    """ADVICE r2 (medium): batch-padding rows (B % tb != 0) have constant
    scores, so every winner value ties across its window — the exactness
    checks must mask them out or `ok` is identically False and the peel
    path is permanently defeated for padded batches."""
    rng = np.random.default_rng(11)
    b, c, k = 5, 2048, 10  # tb pads 5 → 8+ rows
    s = rng.normal(size=(b, c)).astype(np.float32)  # a.s. well-separated
    v, i, ok = peel_masked_topk_scores(jnp.asarray(s), None, None, k, t=8,
                                       interpret=True, with_fallback=False)
    ok = np.asarray(ok)
    assert ok.shape == (b,)
    assert ok.all(), "padding rows leaked into the exactness checks"
    ov, _ = _oracle(jnp.asarray(s), None, None, k)
    np.testing.assert_allclose(np.asarray(v), ov, rtol=1e-6, atol=1e-6)


def test_padded_batch_fused_dot_ok_stays_true():
    rng = np.random.default_rng(12)
    b, c, d, k = 5, 2048, 64, 10
    u = rng.normal(size=(b, d)).astype(np.float32)
    it = rng.normal(size=(c, d)).astype(np.float32)
    v, i, ok = peel_masked_topk(jnp.asarray(u), jnp.asarray(it), None, None,
                                k, t=8, interpret=True, with_fallback=False)
    ok = np.asarray(ok)
    assert ok.shape == (b,)
    assert ok.all()


def test_explicit_peel_method_degrades_off_tpu():
    """ADVICE r2 (low): method='peel' requested explicitly must not crash on
    CPU (Pallas TPU kernels) nor with non-viable geometry — it degrades to
    scatter with identical results."""
    import jax

    import scipy.sparse as sp

    from sibrar_tpu.ops.sparse import DeviceCSR
    from sibrar_tpu.ops.topk import masked_topk

    rng = np.random.default_rng(13)
    s = jnp.asarray(rng.normal(size=(4, 6000)).astype(np.float32))
    rows = np.repeat(np.arange(4), 3)
    cols = rng.integers(0, 6000, size=12)
    csr = DeviceCSR.from_scipy(
        sp.coo_matrix((np.ones(12), (rows, cols)), shape=(4, 6000)))
    v, i = masked_topk(s, csr, jnp.arange(4), 10, method="peel")
    vf, _ = masked_topk(s, csr, jnp.arange(4), 10, method="full")
    np.testing.assert_allclose(np.asarray(v), np.asarray(vf), rtol=1e-6)
    if jax.default_backend() != "tpu":
        # non-viable geometry: k close to c so 2*m > nw
        v2, _ = masked_topk(s[:, :512], csr, jnp.arange(4), 100,
                            method="peel")
        assert np.asarray(v2).shape == (4, 100)


def test_chunked_catalog_gather_matches_oracle(monkeypatch):
    """Catalogs too wide for a resident [gb, C] block use the chunked gather
    (grid over C, predicated copies). Forced here by shrinking the VMEM
    budget; results must stay exact."""
    import sibrar_tpu.ops.pallas_peel as pp

    monkeypatch.setattr(pp, "_GATHER_VMEM_BYTES", 1 << 14)  # force chunking
    rng = np.random.default_rng(21)
    b, c, k, e = 8, 4096, 12, 10
    s = rng.normal(size=(b, c)).astype(np.float32)
    cols = np.stack([np.sort(rng.choice(c, size=e, replace=False))
                     for _ in range(b)]).astype(np.int32)
    mask = rng.random((b, e)) < 0.8
    ov, _ = _oracle(jnp.asarray(s), cols, mask, k)
    v, i = peel_masked_topk_scores(jnp.asarray(s), jnp.asarray(cols),
                                   jnp.asarray(mask), k, t=8, interpret=True)
    _check(v, i, s, ov, cols, mask)

    # direct kernel check: chunked vs plain gather bit-identical
    widx = jnp.asarray(rng.integers(0, c // 128, size=(b, 5)), jnp.int32)
    from sibrar_tpu.ops.pallas_peel import gather_score_windows

    g_chunked = gather_score_windows(jnp.asarray(s), widx, interpret=True)
    monkeypatch.setattr(pp, "_GATHER_VMEM_BYTES", 12 << 20)
    g_plain = gather_score_windows(jnp.asarray(s), widx, interpret=True)
    np.testing.assert_array_equal(np.asarray(g_chunked), np.asarray(g_plain))


def test_margin_path_large_catalog_gate(monkeypatch):
    """Beyond _CORR_MAX_ROW_BYTES the corrected-wmax pass (an extra full
    [B, C] read) is skipped in favor of the +E window margin; results must
    stay exact."""
    import sibrar_tpu.ops.pallas_peel as pp

    monkeypatch.setattr(pp, "_CORR_MAX_ROW_BYTES", 256)  # force margin path
    rng = np.random.default_rng(23)
    b, c, k, e = 6, 8192, 15, 12
    s = rng.normal(size=(b, c)).astype(np.float32)
    cols = np.stack([np.sort(rng.choice(c, size=e, replace=False))
                     for _ in range(b)]).astype(np.int32)
    mask = rng.random((b, e)) < 0.85
    assert not pp._use_corrected_wmax(c, e)
    assert pp.peel_viable(c, k, e)  # margin path still viable here
    ov, _ = _oracle(jnp.asarray(s), cols, mask, k)
    v, i = peel_masked_topk_scores(jnp.asarray(s), jnp.asarray(cols),
                                   jnp.asarray(mask), k, t=8, interpret=True)
    _check(v, i, s, ov, cols, mask)


def test_window_max_matches_reshape_max_including_tail():
    """`window_max` (native-layout Pallas lane-group max) must equal the
    XLA reshape+max spelling bit-exactly, including when NW is not a
    multiple of the 128-window out tile (the tail path) and when B is not
    a multiple of the 8-row group."""
    from sibrar_tpu.ops.pallas_peel import window_max

    rng = np.random.default_rng(29)
    for b, nw in [(16, 130), (16, 128), (16, 127), (12, 256 + 17), (8, 1)]:
        c = nw * 128
        s = rng.normal(size=(b, c)).astype(np.float32)
        ref = s.reshape(b, nw, 128).max(-1)
        got = window_max(jnp.asarray(s), 128, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), ref)


def test_sorted_runs_chunked_gather_matches_plain(monkeypatch):
    """The sorted-rows chunked gather (per-chunk contiguous runs with
    dynamic loop bounds) must be bit-identical to the resident-block
    gather for ascending window rows."""
    import sibrar_tpu.ops.pallas_peel as pp
    from sibrar_tpu.ops.pallas_peel import gather_score_windows

    rng = np.random.default_rng(31)
    b, c, m = 8, 4096, 9
    s = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32))
    widx = jnp.sort(jnp.asarray(
        rng.integers(0, c // 128, size=(b, m)), jnp.int32), axis=1)
    g_plain = gather_score_windows(s, widx, interpret=True)
    monkeypatch.setattr(pp, "_GATHER_VMEM_BYTES", 1 << 14)  # force chunking
    g_runs = gather_score_windows(s, widx, sorted_rows=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(g_runs), np.asarray(g_plain))


def test_approx_window_selection_path_exact(monkeypatch):
    """Catalogs with NW >= _APPROX_SEL_MIN_NW select windows through
    lax.approx_max_k + the counting guard. On CPU approx lowers to exact
    top-k, so this validates the wiring (guard arithmetic, thresh ties,
    downstream sort/merge) end-to-end against the oracle."""
    import sibrar_tpu.ops.pallas_peel as pp

    monkeypatch.setattr(pp, "_APPROX_SEL_MIN_NW", 8)  # force the approx path
    rng = np.random.default_rng(23)
    b, c, k, e = 5, 4096, 12, 9
    s = rng.normal(size=(b, c)).astype(np.float32)
    cols = np.stack([np.sort(rng.choice(c, size=e, replace=False))
                     for _ in range(b)]).astype(np.int32)
    mask = rng.random((b, e)) < 0.7
    ov, _ = _oracle(jnp.asarray(s), cols, mask, k)
    v, i, ok = peel_masked_topk_scores(
        jnp.asarray(s), jnp.asarray(cols), jnp.asarray(mask), k, t=8,
        interpret=True, with_fallback=False)
    assert np.asarray(ok).all()
    _check(v, i, s, ov, cols, mask)


def test_approx_selection_recall_miss_trips_guard(monkeypatch):
    """A recall miss in approx_max_k (simulated: the TRUE BEST window is
    dropped from every row's selection) must be caught by the counting
    guard — per-row ok goes False, and the with_fallback=True driver
    returns the exact dense result anyway. Without the guard this miss
    would silently corrupt the top-k."""
    import jax

    import sibrar_tpu.ops.pallas_peel as pp

    def lossy_approx_max_k(x, kk, recall_target=0.95):
        v, i = lax.top_k(x, kk + 1)
        return v[:, 1:], i[:, 1:]  # drop the best window everywhere

    monkeypatch.setattr(pp, "_APPROX_SEL_MIN_NW", 8)
    monkeypatch.setattr(jax.lax, "approx_max_k", lossy_approx_max_k)
    rng = np.random.default_rng(29)
    b, c, k = 6, 3968, 11  # unique shapes: defeat the jit cache (the fake
    s = rng.normal(size=(b, c)).astype(np.float32)  # must get traced)
    ov, _ = _oracle(jnp.asarray(s), None, None, k)
    v, i, ok = peel_masked_topk_scores(
        jnp.asarray(s), None, None, k, t=8,
        interpret=True, with_fallback=False)
    assert not np.asarray(ok).any()
    v, i = peel_masked_topk_scores(jnp.asarray(s), None, None, k, t=8,
                                   interpret=True, with_fallback=True)
    _check(v, i, s, ov)


def test_corrected_wmax_chunked_gather_interleaved_pads(monkeypatch):
    """The corrected-wmax correction gather rides the sorted-run CHUNKED
    kernel. Shard-local exclusion masks interleave pads among the real
    entries (parallel/mesh._local_exclusions puts zeros both before and
    after the in-shard columns), so the correction must sort its window
    keys itself — a trailing-pad assumption would mis-copy runs and
    silently corrupt the spliced maxima."""
    import sibrar_tpu.ops.pallas_peel as pp

    monkeypatch.setattr(pp, "_GATHER_VMEM_BYTES", 1 << 14)  # force chunking
    rng = np.random.default_rng(41)
    b, c, k, e = 6, 4096, 12, 10
    assert pp._use_corrected_wmax(c, e)
    s = rng.normal(size=(b, c)).astype(np.float32)
    cols = np.stack([np.sort(rng.choice(c, size=e, replace=False))
                     for _ in range(b)]).astype(np.int32)
    # interleaved invalidity, masked slots zeroed like mesh._local_exclusions
    mask = rng.random((b, e)) < 0.6
    mask[:, 0] = False  # guarantee a leading pad
    cols = np.where(mask, cols, 0).astype(np.int32)
    ov, _ = _oracle(jnp.asarray(s), cols, mask, k)
    v, i = peel_masked_topk_scores(jnp.asarray(s), jnp.asarray(cols),
                                   jnp.asarray(mask), k, t=8, interpret=True)
    _check(v, i, s, ov, cols, mask)


@pytest.mark.parametrize("b,c,d,e,k,t", [
    (8, 2048, 128, 16, 10, 8),     # aligned
    (5, 1000, 48, 7, 10, 4),       # everything needs padding
    (16, 5120, 128, 33, 100, 16),  # margin > windows touched
])
def test_peel_native_dot_topk_matches_oracle(b, c, d, e, k, t):
    """`peel_masked_topk_dot` (fused native-layout scores+wmax epilogue)
    must match the oracle on the same shapes as the windowed fused path."""
    from sibrar_tpu.ops.pallas_peel import peel_masked_topk_dot

    rng = np.random.default_rng(3)
    u = rng.normal(size=(b, d)).astype(np.float32)
    it = rng.normal(size=(c, d)).astype(np.float32)
    cols = np.stack([rng.choice(c, size=e, replace=False) for _ in range(b)]
                    ).astype(np.int32)
    mask = rng.random((b, e)) < 0.8
    scores = jnp.asarray(u) @ jnp.asarray(it).T
    ov, _ = _oracle(scores, cols, mask, k)
    v, i = peel_masked_topk_dot(jnp.asarray(u), jnp.asarray(it),
                                jnp.asarray(cols), jnp.asarray(mask), k, t=t,
                                interpret=True)
    _check(v, i, scores, ov, cols, mask)


def test_peel_native_dot_prepadded_catalog_matches():
    """`c_real=` with a caller-pre-padded item table (the fused whole-eval
    driver pads ONCE instead of paying an in-graph jnp.pad per batch) must
    bit-match the unpadded call, and reject tables that aren't actually
    padded to the chunk multiple."""
    from sibrar_tpu.ops.pallas_peel import peel_masked_topk_dot

    rng = np.random.default_rng(9)
    b, c, d, e, k, bc = 16, 3000, 64, 12, 10, 1024
    u = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    it = rng.normal(size=(c, d)).astype(np.float32)
    cols = jnp.asarray(np.stack(
        [rng.choice(c, size=e, replace=False) for _ in range(b)]
    ).astype(np.int32))
    mask = jnp.asarray(rng.random((b, e)) < 0.8)
    cp = -(-c // bc) * bc
    it_p = jnp.asarray(np.pad(it, ((0, cp - c), (0, 0))))
    v0, i0 = peel_masked_topk_dot(u, jnp.asarray(it), cols, mask, k,
                                  interpret=True)
    v1, i1 = peel_masked_topk_dot(u, it_p, cols, mask, k, interpret=True,
                                  c_real=c)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    with pytest.raises(ValueError, match="pre-padded"):
        peel_masked_topk_dot(u, jnp.asarray(it), cols, mask, k,
                             interpret=True, c_real=c - 8)


def test_score_native_wmax_matches_xla(monkeypatch):
    """The fused epilogue's scores and window maxima must equal the XLA
    matmul + reshape-max spelling (interpret mode: exact)."""
    from sibrar_tpu.ops.pallas_window import score_native_wmax

    rng = np.random.default_rng(17)
    b, c, d = 16, 4096, 128
    u = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    it = jnp.asarray(rng.normal(size=(c, d)).astype(np.float32))
    scores, wmax = score_native_wmax(u, it, tb=8, interpret=True)
    ref = np.asarray(u) @ np.asarray(it).T
    np.testing.assert_allclose(np.asarray(scores), ref, rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(wmax), np.asarray(scores).reshape(b, c // 128, 128).max(-1))


def test_peel_native_dot_batch_not_multiple_of_gemm_block():
    """Regression: a padded batch of 1536 rows (multiple of the peel tb=256
    but not of the GEMM's preferred 1024 block) must run, not trip the
    score_native_wmax alignment check."""
    from sibrar_tpu.ops.pallas_peel import peel_masked_topk_dot

    rng = np.random.default_rng(41)
    b, c, d, k = 1536, 4096, 64, 10
    u = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    it = jnp.asarray(rng.normal(size=(c, d)).astype(np.float32))
    scores = u @ it.T
    ov, oi = lax.top_k(scores, k)
    v, i = peel_masked_topk_dot(u, it, None, None, k, interpret=True)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(ov))


def test_peel_viable_rejects_gather_vmem_blowout():
    """The margin path's gather out block is [gb, k+E+1, W]; configs where it
    cannot fit scoped VMEM even with one-window input chunks must be rejected
    (they used to pass the margin checks and hard-fail at Mosaic compile)."""
    from sibrar_tpu.ops.pallas_peel import peel_viable

    assert peel_viable(501_760, 100, 64)          # the bench config
    assert peel_viable(501_760, 100, 450)         # large-E but fits
    assert not peel_viable(501_760, 100, 1500)    # m=1601: out block > budget


def test_pick_chunk_budgets_out_block():
    """_pick_chunk must leave room for the [gb, m, W] out block."""
    from sibrar_tpu.ops.pallas_peel import (
        _GATHER_VMEM_BYTES,
        _gather_out_bytes,
        _pick_chunk,
    )

    for m in (101, 165, 614, 1024):
        cb = _pick_chunk(501_760, 8, 128, m)
        assert cb % 128 == 0
        assert 8 * cb * 4 * 2 + _gather_out_bytes(8, m, 128) \
            <= _GATHER_VMEM_BYTES, m


def test_gather_score_windows_dead_mask_on_copy():
    """The gather's dead input masks lanes to -inf ON COPY — parity with
    gathering then applying the where-pass (all three kernel variants)."""
    from sibrar_tpu.ops.pallas_peel import gather_score_windows

    rng = np.random.default_rng(11)
    b, c, m, w = 16, 1024, 8, 128
    scores = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32))
    widx = jnp.sort(jnp.asarray(
        rng.integers(0, c // w, size=(b, m)).astype(np.int32)), axis=1)
    dead = jnp.asarray(rng.random((b, m, w)) < 0.2)
    plain = gather_score_windows(scores, widx, w=w, sorted_rows=True,
                                 interpret=True)
    want = jnp.where(dead, float("-inf"), plain)
    got = gather_score_windows(scores, widx, w=w, sorted_rows=True,
                               dead=dead, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_recover_winners_matches_xla_recovery():
    """Fused recovery kernel == the XLA hit/lane/one-hot cluster it replaces,
    including tie counting (n_hit > 1) and widx_sel lookups."""
    from sibrar_tpu.ops.pallas_peel import recover_winners

    rng = np.random.default_rng(12)
    b, m, w, kk = 16, 24, 128, 10
    g = rng.normal(size=(b, m, w)).astype(np.float32)
    # plant duplicates of some winner values inside their window
    g[0, 3, 7] = g[0, 3, 99]
    g[5, 0, 0] = g[5, 0, 1] = g[5, 0, 2]
    slots = rng.integers(0, m, size=(b, kk)).astype(np.int32)
    lanes = rng.integers(0, w, size=(b, kk)).astype(np.int32)
    slots[0, 0], lanes[0, 0] = 3, 7    # points at a planted duplicate pair
    slots[5, 1], lanes[5, 1] = 0, 1    # and at the planted triple
    v = np.take_along_axis(g.reshape(b, m * w), slots * w + lanes, 1)
    widx = np.sort(rng.integers(0, 999, size=(b, m)).astype(np.int32), 1)
    lane, n_hit, widx_sel = recover_winners(
        jnp.asarray(g), jnp.asarray(widx), jnp.asarray(slots),
        jnp.asarray(v), interpret=True)
    rows = np.take_along_axis(g, slots[:, :, None], axis=1)
    hit = rows == v[:, :, None]
    np.testing.assert_array_equal(
        np.asarray(lane), np.where(hit, np.arange(w), w).min(-1))
    np.testing.assert_array_equal(np.asarray(n_hit), hit.sum(-1))
    np.testing.assert_array_equal(
        np.asarray(widx_sel), np.take_along_axis(widx, slots, 1))
    assert int(jnp.max(n_hit)) > 1  # the planted ties are really counted


def test_recover_kernel_flag_branch_matches_default(monkeypatch):
    """The SIBRAR_PEEL_RECOVER_KERNEL=1 branch of _peel_select (the
    measured-negative fused recovery kernel) must stay bit-identical to the
    default XLA recovery cluster, exclusion included."""
    import sibrar_tpu.ops.pallas_peel as pp

    rng = np.random.default_rng(21)
    b, c, k = 8, 2048, 16
    s = rng.normal(size=(b, c)).astype(np.float32)
    cols = np.sort(rng.integers(0, c, size=(b, 40)), axis=1).astype(np.int32)
    mask = rng.random((b, 40)) < 0.8
    v0, i0 = peel_masked_topk_scores(jnp.asarray(s), jnp.asarray(cols),
                                     jnp.asarray(mask), k, t=8,
                                     interpret=True)
    monkeypatch.setattr(pp, "_RECOVER_KERNEL", True)
    # the entry is jitted and the flag is read at trace time: drop the
    # cached trace so the second call really takes the kernel branch
    import jax

    jax.clear_caches()
    v1, i1 = peel_masked_topk_scores(jnp.asarray(s), jnp.asarray(cols),
                                     jnp.asarray(mask), k, t=8,
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_peel_viable_fused_rejects_gather_vmem_blowout():
    """fused=True must account the gather_windows_rows out block on top of
    the [NW, gb, W] row set: large-E margins (and wide corrected gathers)
    blow Mosaic's 16 MB scoped window even when the row cap passes."""
    from sibrar_tpu.ops.pallas_peel import peel_viable

    # C=196608 passes the row cap (nw=1536 → 12.6 MB double-buffered input);
    # E=600 rides the margin path (> _CORR_MAX_E) → m=704 → +5.8 MB out
    assert not peel_viable(196608, 100, 600, fused=True)
    # E=512 rides the corrected path → the E-wide correction gather
    # (+4.2 MB) still blows the window
    assert not peel_viable(196608, 100, 512, fused=True)
    # small margins at the same catalog stay viable (13.4 MB total)
    assert peel_viable(196608, 100, 64, fused=True)
    # the bench geometry must remain viable
    assert peel_viable(100352, 100, 64, fused=True)


def test_explicit_pallas_method_degrades_off_tpu():
    """Explicit method='pallas' off-TPU must degrade to scatter with a
    warning (same rule as explicit 'peel') instead of crashing at lowering."""
    from sibrar_tpu.ops.sparse import DeviceCSR
    from sibrar_tpu.ops.topk import masked_topk

    rng = np.random.default_rng(6)
    b, c, k, e = 8, 6000, 10, 5
    scores = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32))
    cols = np.sort(rng.integers(0, c, size=(b, e)), axis=1).astype(np.int32)
    csr = DeviceCSR(indptr=jnp.arange(b + 1, dtype=jnp.int32) * e,
                    indices=jnp.asarray(cols.ravel()), n_rows=b, n_cols=c,
                    max_row_len=e)
    rows = jnp.arange(b, dtype=jnp.int32)
    v_p, i_p = masked_topk(scores, csr, rows, k, method="pallas")
    v_s, i_s = masked_topk(scores, csr, rows, k, method="scatter")
    np.testing.assert_array_equal(np.asarray(v_p), np.asarray(v_s))
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_s))
