"""Streaming-scale queries: values identical to the single-chip forms
(and the oracle) while only two superblock slices are ever on device."""

import numpy as np
import pytest

from conftest import random_bitmatrix
from stormtpu.config import EngineConfig
from stormtpu.oracle import oracle_count_matrix
from stormtpu.stream_query import stream_pairs_above, stream_topk_neighbors


def _small_cfg():
    return EngineConfig(
        k1_tile_rows=8, k1_tile_words=128, k2_tile_rows=8, k2_tile_words=8
    )


def _oracle_topk_vals(bm, k):
    c = oracle_count_matrix(bm.packed).astype(np.int64)
    np.fill_diagonal(c, -1)
    vals = -np.sort(-c, axis=1)[:, :k]
    return np.maximum(vals, 0)


@pytest.mark.parametrize("kernel", ["mxu", "dense", "xla_int8"])
def test_stream_topk_values_match_oracle(tmp_path, kernel):
    bm = random_bitmatrix(52, 600, 0.3, seed=71)
    vals, idx = stream_topk_neighbors(
        bm, 5, superblock_rows=16, kernel=kernel, config=_small_cfg(),
        interpret=True,
    )
    np.testing.assert_array_equal(vals, _oracle_topk_vals(bm, 5),
                                  err_msg=kernel)
    # indices must actually realize the claimed counts
    c = oracle_count_matrix(bm.packed)
    for r in range(bm.n):
        for t in range(5):
            if vals[r, t] > 0:
                assert c[r, idx[r, t]] == vals[r, t]
                assert idx[r, t] != r


def test_stream_topk_matches_single_chip_values():
    from stormtpu.query import topk_neighbors

    bm = random_bitmatrix(40, 512, 0.4, seed=72)
    v_s, _ = stream_topk_neighbors(
        bm, 3, superblock_rows=16, config=_small_cfg(), interpret=True,
    )
    v_1, _ = topk_neighbors(bm, 3)
    np.testing.assert_array_equal(v_s, v_1)


def test_stream_topk_k_bounds():
    bm = random_bitmatrix(20, 256, 0.5, seed=73)
    with pytest.raises(ValueError):
        stream_topk_neighbors(bm, 0, config=_small_cfg(), interpret=True)
    with pytest.raises(ValueError):
        stream_topk_neighbors(bm, 20, config=_small_cfg(), interpret=True)
    with pytest.raises(ValueError):
        stream_topk_neighbors(bm, 10, superblock_rows=8,
                              config=_small_cfg(), interpret=True)


@pytest.mark.parametrize("measure,threshold", [
    ("count", 30), ("jaccard", 0.22), ("r2", 0.05),
])
def test_stream_pairs_above_matches_single_chip(measure, threshold):
    from stormtpu.query import pairs_above

    bm = random_bitmatrix(52, 600, 0.3, seed=74)
    ii_s, jj_s, v_s = stream_pairs_above(
        bm, threshold, measure=measure, superblock_rows=16,
        config=_small_cfg(), interpret=True,
    )
    ii_1, jj_1, v_1 = pairs_above(bm, threshold, measure=measure)
    np.testing.assert_array_equal(ii_s, ii_1, err_msg=measure)
    np.testing.assert_array_equal(jj_s, jj_1, err_msg=measure)
    if measure == "count":
        np.testing.assert_array_equal(v_s, v_1)
    else:
        np.testing.assert_allclose(v_s, v_1, rtol=0, atol=0)
    assert np.all(ii_s < jj_s)


def test_stream_pairs_above_no_hits():
    bm = random_bitmatrix(24, 300, 0.1, seed=75)
    ii, jj, v = stream_pairs_above(
        bm, 299, superblock_rows=8, config=_small_cfg(), interpret=True,
    )
    assert ii.size == jj.size == v.size == 0


def test_stream_queries_clustered_summary_skip():
    """Block-diagonal input: summary-zero stripes are skipped (count and
    jaccard screens; top-k) without changing any value; r2 — which
    scores zero-intersection pairs — skips them too, recovering their
    hits from the host staircase, and must match the single-chip screen
    exactly."""
    from stormtpu.query import pairs_above, topk_neighbors
    from test_clustered import block_diagonal_bitmatrix

    bm = block_diagonal_bitmatrix(64, 12800, 4, 0.35, seed=77)
    cfg = _small_cfg()

    v_s, _ = stream_topk_neighbors(bm, 4, superblock_rows=16, config=cfg,
                                   interpret=True)
    v_1, _ = topk_neighbors(bm, 4)
    np.testing.assert_array_equal(v_s, v_1)

    for measure, thr in (("count", 20), ("jaccard", 0.2), ("r2", 0.3)):
        ii_s, jj_s, w_s = stream_pairs_above(
            bm, thr, measure=measure, superblock_rows=16, config=cfg,
            interpret=True,
        )
        ii_1, jj_1, w_1 = pairs_above(bm, thr, measure=measure)
        np.testing.assert_array_equal(ii_s, ii_1, err_msg=measure)
        np.testing.assert_array_equal(jj_s, jj_1, err_msg=measure)
        np.testing.assert_allclose(w_s, w_1, rtol=0, atol=0, err_msg=measure)


def test_stream_queries_phi_r2_summary_skip_staircase(monkeypatch):
    """Co-empty stripes are skipped for phi/r2 too: a skipped stripe is
    PURE zero-intersection, so its exact contribution is the host
    staircase. Adversarial content: two dense blocks on disjoint bit
    halves, so every cross-block pair is anti-correlated with r2 ≈ 0.67
    — ABOVE the screen threshold; a stripe that were merely dropped
    (the count-style skip) would lose real hits, and a stripe that
    walked the device would show in the upload count."""
    import stormtpu.stream_query as sq
    from stormtpu.query import pairs_above, topk_neighbors
    from test_clustered import block_diagonal_bitmatrix

    # bit split at 8192 aligns with the 4096-bit summary groups, so the
    # cross stripe is summary-zero (a 12800/2 split would straddle one);
    # N=64 with superblock_rows=32 because the screens' hit-bitmap
    # packing resolves sb to >= 32 — smaller would fold everything into
    # ONE stripe and the skip would never fire
    bm = block_diagonal_bitmatrix(64, 16384, 2, 0.9, seed=179)
    cfg = _small_cfg()
    uploads = []
    orig = sq._host_superblock
    monkeypatch.setattr(
        sq, "_host_superblock",
        lambda *a: uploads.append(a[4]) or orig(*a))

    for measure in ("phi", "r2"):
        uploads.clear()
        v_s, _ = stream_topk_neighbors(bm, 4, superblock_rows=32,
                                       config=cfg, interpret=True,
                                       measure=measure)
        v_1, _ = topk_neighbors(bm, 4, measure=measure)
        np.testing.assert_array_equal(v_s, v_1, err_msg=measure)
        assert uploads == [0, 1], (measure, uploads)  # diagonal only
        # at density 0.9 the cross-block r2 (g² ≈ 0.67) lands within
        # jitter of the in-block r2, so the staircase candidates
        # genuinely compete with the device candidates at equal scale

    uploads.clear()
    ii_s, jj_s, w_s = stream_pairs_above(
        bm, 0.3, measure="r2", superblock_rows=32, config=cfg,
        interpret=True)
    ii_1, jj_1, w_1 = pairs_above(bm, 0.3, measure="r2")
    np.testing.assert_array_equal(ii_s, ii_1)
    np.testing.assert_array_equal(jj_s, jj_1)
    np.testing.assert_allclose(w_s, w_1, rtol=0, atol=0)
    assert uploads == [0, 1], uploads
    # the adversarial content is real: cross-block hits from the
    # SKIPPED stripe are present
    assert ((ii_s < 32) & (jj_s >= 32)).any()

    # phi: zero-intersection scores are <= 0 < threshold, so the skipped
    # stripe emits nothing — and must still match the single-chip screen
    uploads.clear()
    ii_p, jj_p, w_p = stream_pairs_above(
        bm, 0.2, measure="phi", superblock_rows=32, config=cfg,
        interpret=True)
    ii_q, jj_q, w_q = pairs_above(bm, 0.2, measure="phi")
    np.testing.assert_array_equal(ii_p, ii_q)
    np.testing.assert_array_equal(jj_p, jj_q)
    np.testing.assert_allclose(w_p, w_q, rtol=0, atol=0)
    assert uploads == [0, 1], uploads


def test_stream_pairs_above_oracle_cross_check():
    bm = random_bitmatrix(44, 480, 0.45, seed=76)
    c = oracle_count_matrix(bm.packed)
    thr = int(np.percentile(c[np.triu_indices(bm.n, 1)], 90))
    ii, jj, v = stream_pairs_above(
        bm, thr, superblock_rows=16, config=_small_cfg(), interpret=True,
    )
    want_i, want_j = np.nonzero(np.triu(c, 1) >= thr)
    np.testing.assert_array_equal(ii, want_i)
    np.testing.assert_array_equal(jj, want_j)
    np.testing.assert_array_equal(v, c[want_i, want_j])


def test_over_budget_routes_to_streaming(monkeypatch):
    """Past the device budget the resident-form APIs refuse with a
    pointer to the streaming surface — while the streaming forms keep
    working (flipping to operand streaming under the same budget)."""
    from stormtpu import intersect_count_matrix, pairs_above, topk_neighbors
    from stormtpu.stream import stream_count_matrix

    # operand budget flips the streaming driver; the refusal ceiling is
    # its own (higher) knob on the single-shot device routes
    monkeypatch.setenv("STORMTPU_DEVICE_OPERAND_BUDGET_BYTES", "1000")
    monkeypatch.setenv("STORMTPU_DEVICE_REFUSE_BUDGET_BYTES", "1000")
    bm = random_bitmatrix(40, 512, 0.4, seed=79)
    with pytest.raises(ValueError, match="stream_count_matrix"):
        intersect_count_matrix(bm, strategy="pallas_mxu")
    with pytest.raises(ValueError, match="stream_topk_neighbors"):
        topk_neighbors(bm, 3)
    with pytest.raises(ValueError, match="stream_pairs_above"):
        pairs_above(bm, 10)
    vals, idx = stream_topk_neighbors(
        bm, 3, superblock_rows=16, config=_small_cfg(), interpret=True,
    )
    c = oracle_count_matrix(bm.packed).astype(np.int64)
    np.fill_diagonal(c, -1)
    np.testing.assert_array_equal(
        vals, np.maximum(-np.sort(-c, axis=1)[:, :3], 0)
    )


def test_stream_queries_reject_unknown_kernel():
    bm = random_bitmatrix(20, 256, 0.3, seed=5)
    with pytest.raises(ValueError, match="unknown kernel"):
        stream_topk_neighbors(bm, 3, kernel="clustered")
    with pytest.raises(ValueError, match="unknown kernel"):
        stream_pairs_above(bm, 5, kernel="mxU")


def test_stream_pairs_above_odd_tile_rows():
    """superblock rounding must satisfy both ti | SB and 32 | SB
    (regression: ti=24 rounded to max(ti, 32)=32 crashed the tile walk;
    ti=48 crashed the hit-bitmap pack)."""
    from stormtpu.query import pairs_above

    bm = random_bitmatrix(70, 500, 0.3, seed=41)
    want = pairs_above(bm, 12)
    for ti in (24, 48):
        cfg = EngineConfig(
            k1_tile_rows=ti, k1_tile_words=128,
            k2_tile_rows=8, k2_tile_words=8,
        )
        ii, jj, vv = stream_pairs_above(
            bm, 12, superblock_rows=40, kernel="dense", config=cfg,
            interpret=True,
        )
        np.testing.assert_array_equal(ii, want[0], err_msg=f"ti={ti}")
        np.testing.assert_array_equal(jj, want[1], err_msg=f"ti={ti}")
        np.testing.assert_array_equal(vv, want[2], err_msg=f"ti={ti}")
        vals, _ = stream_topk_neighbors(
            bm, 4, superblock_rows=40, kernel="dense", config=cfg,
            interpret=True,
        )
        np.testing.assert_array_equal(vals, _oracle_topk_vals(bm, 4),
                                      err_msg=f"ti={ti}")


def test_budget_guard_covers_clustered_and_spares_host_routes(monkeypatch):
    """The refusal guard must fire on the clustered strategy too (its
    early-return bypassed the r2 guard), must size it by the K5 plan's
    actual footprint (operand + visited tiles), and must NOT fire on the
    host sparse routes, which allocate no device memory."""
    from test_clustered import block_diagonal_bitmatrix

    from stormtpu import intersect_count_matrix, pairs_above
    from stormtpu.oracle import oracle_count_matrix

    bm = block_diagonal_bitmatrix(64, 12800, 4, 0.35, seed=13)
    monkeypatch.setenv("STORMTPU_DEVICE_REFUSE_BUDGET_BYTES", "1000")
    with pytest.raises(ValueError, match="stream_count_matrix"):
        intersect_count_matrix(bm, strategy="clustered")
    # the K5 plan's footprint, not the dense N² formula: a budget that
    # admits operand + visited tiles but not the dense form must pass
    ok = 4 * 128 * bm.n_words * 4 + 4 * 64 * 64 * 16  # generous plan bound
    monkeypatch.setenv("STORMTPU_DEVICE_REFUSE_BUDGET_BYTES", str(ok))
    out = intersect_count_matrix(bm, strategy="clustered")
    np.testing.assert_array_equal(out, oracle_count_matrix(bm.packed))

    # host sparse screen: unaffected by a tiny device budget
    monkeypatch.setenv("STORMTPU_DEVICE_REFUSE_BUDGET_BYTES", "1000")
    sparse = random_bitmatrix(40, 65536, 0.0005, seed=29)
    ii, jj, vv = pairs_above(sparse, 1, measure="count")
    c = oracle_count_matrix(sparse.packed)
    wi, wj = np.nonzero(np.triu(c, 1) >= 1)
    np.testing.assert_array_equal(ii, wi)
    np.testing.assert_array_equal(jj, wj)
    np.testing.assert_array_equal(vv, c[wi, wj])


def test_stream_topk_checkpoint_resume(tmp_path, monkeypatch):
    """An interrupted stream_topk_neighbors(out_dir=...) resumes from
    its per-row checkpoint: the crashed row is recomputed, finished rows
    are not, and the result equals the uncheckpointed run exactly."""
    import stormtpu.stream_query as sq

    bm = random_bitmatrix(52, 600, 0.3, seed=91)
    want_vals, want_idx = stream_topk_neighbors(
        bm, 5, superblock_rows=16, kernel="dense", config=_small_cfg(),
        interpret=True,
    )

    real = sq._stripe_topk
    calls = {"n": 0, "fail_at": 5}

    def counting(*a, **kw):
        calls["n"] += 1
        if calls["n"] == calls["fail_at"]:
            raise RuntimeError("simulated crash")
        return real(*a, **kw)

    monkeypatch.setattr(sq, "_stripe_topk", counting)
    with pytest.raises(RuntimeError, match="simulated crash"):
        stream_topk_neighbors(
            bm, 5, superblock_rows=16, kernel="dense", config=_small_cfg(),
            interpret=True, out_dir=str(tmp_path),
        )
    crashed_calls = calls["n"]
    calls["fail_at"] = 10**9
    vals, idx = stream_topk_neighbors(
        bm, 5, superblock_rows=16, kernel="dense", config=_small_cfg(),
        interpret=True, out_dir=str(tmp_path),
    )
    np.testing.assert_array_equal(vals, want_vals)
    c = oracle_count_matrix(bm.packed)
    for r in range(bm.n):
        for t in range(5):
            if vals[r, t] > 0:
                assert c[r, idx[r, t]] == vals[r, t]
    # the resume skipped the checkpointed rows: total stripes computed
    # across both runs stays below 2x a full walk
    n_super = 4  # 52 rows / 16 -> 64 padded
    full = n_super * (n_super + 1) // 2
    assert calls["n"] - crashed_calls < full

    # a different-parameter resume must refuse
    with pytest.raises(ValueError, match="checkpoint"):
        stream_topk_neighbors(
            bm, 4, superblock_rows=16, kernel="dense", config=_small_cfg(),
            interpret=True, out_dir=str(tmp_path),
        )


def test_stream_pairs_stripe_files_resume(tmp_path, monkeypatch):
    """stream_pairs_above(out_dir=...) persists per-stripe hits and
    skips existing stripes on re-run; deleting one file recomputes
    exactly that stripe; values match the plain run."""
    import os

    import stormtpu.stream_query as sq

    bm = random_bitmatrix(52, 600, 0.3, seed=92)
    want = stream_pairs_above(
        bm, 30, superblock_rows=16, kernel="dense", config=_small_cfg(),
        interpret=True,
    )
    real = sq._stripe_screen
    calls = {"n": 0}

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(sq, "_stripe_screen", counting)
    got = stream_pairs_above(
        bm, 30, superblock_rows=16, kernel="dense", config=_small_cfg(),
        interpret=True, out_dir=str(tmp_path),
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    first = calls["n"]
    assert first > 0

    # full re-run: every stripe reloaded from disk, zero recompute
    calls["n"] = 0
    got = stream_pairs_above(
        bm, 30, superblock_rows=16, kernel="dense", config=_small_cfg(),
        interpret=True, out_dir=str(tmp_path),
    )
    assert calls["n"] == 0
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)

    # delete one stripe -> exactly one recompute, same values
    # (sb=16 rounds to lcm(ti=8, 32)=32 here: n_super=2, 3 stripes)
    os.remove(os.path.join(str(tmp_path), "hits_00000_00001.npz"))
    calls["n"] = 0
    got = stream_pairs_above(
        bm, 30, superblock_rows=16, kernel="dense", config=_small_cfg(),
        interpret=True, out_dir=str(tmp_path),
    )
    assert calls["n"] == 1
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)

    # parameter mismatch refuses
    with pytest.raises(ValueError, match="manifest"):
        stream_pairs_above(
            bm, 31, superblock_rows=16, kernel="dense", config=_small_cfg(),
            interpret=True, out_dir=str(tmp_path),
        )


def test_resume_rejects_different_content_and_resume_false(tmp_path):
    """Same-shape but different-content matrices must NOT silently reuse
    a checkpoint (content fingerprint); resume=False overwrites."""
    bm1 = random_bitmatrix(40, 512, 0.4, seed=95)
    bm2 = random_bitmatrix(40, 512, 0.4, seed=96)
    d1, d2 = str(tmp_path / "t"), str(tmp_path / "s")

    stream_topk_neighbors(bm1, 3, superblock_rows=16, kernel="dense",
                          config=_small_cfg(), interpret=True, out_dir=d1)
    with pytest.raises(ValueError, match="checkpoint"):
        stream_topk_neighbors(bm2, 3, superblock_rows=16, kernel="dense",
                              config=_small_cfg(), interpret=True,
                              out_dir=d1)
    v2, _ = stream_topk_neighbors(bm2, 3, superblock_rows=16, kernel="dense",
                                  config=_small_cfg(), interpret=True,
                                  out_dir=d1, resume=False)
    np.testing.assert_array_equal(v2, _oracle_topk_vals(bm2, 3))

    stream_pairs_above(bm1, 30, superblock_rows=16, kernel="dense",
                       config=_small_cfg(), interpret=True, out_dir=d2)
    with pytest.raises(ValueError, match="manifest"):
        stream_pairs_above(bm2, 30, superblock_rows=16, kernel="dense",
                           config=_small_cfg(), interpret=True, out_dir=d2)
    ii, jj, vv = stream_pairs_above(bm2, 30, superblock_rows=16,
                                    kernel="dense", config=_small_cfg(),
                                    interpret=True, out_dir=d2, resume=False)
    c = oracle_count_matrix(bm2.packed)
    wi, wj = np.nonzero(np.triu(c, 1) >= 30)
    np.testing.assert_array_equal(ii, wi)
    np.testing.assert_array_equal(jj, wj)
    np.testing.assert_array_equal(vv, c[wi, wj])


def test_stream_pairs_above_complete_matches_resident_form():
    """The streaming pairwise-complete screen equals thresholding the
    matrix form's upper triangle across stripe boundaries, for r2
    (walks everything) and jaccard (data-summary skip legal)."""
    from stormtpu import similarity_matrix_complete
    from stormtpu.layout import BitMatrix
    from stormtpu.stream_query import stream_pairs_above_complete

    rng = np.random.default_rng(97)
    n, m = 52, 800
    observed = rng.random((n, m)) > 0.12
    values = (rng.random((n, m)) < 0.4) & observed
    values[9] = values[2] & observed[9]  # planted high-r2 pair
    bm_d = BitMatrix.from_dense(values.astype(np.uint8))
    bm_m = BitMatrix.from_dense(observed.astype(np.uint8))

    for measure, thr in (("r2", 0.05), ("jaccard", 0.25)):
        full = similarity_matrix_complete(bm_d, bm_m, measure)
        wi, wj = np.nonzero(np.triu(full, 1) >= thr)
        ii, jj, vv = stream_pairs_above_complete(
            bm_d, bm_m, thr, measure=measure, superblock_rows=16,
            kernel="dense", config=_small_cfg(), interpret=True,
        )
        np.testing.assert_array_equal(ii, wi, err_msg=measure)
        np.testing.assert_array_equal(jj, wj, err_msg=measure)
        np.testing.assert_allclose(vv, full[wi, wj], rtol=0, atol=0,
                                   err_msg=measure)

    import pytest

    with pytest.raises(ValueError, match="use stream_pairs_above"):
        stream_pairs_above_complete(bm_d, bm_m, 1, measure="count")


def test_stream_complete_summary_skip_on_clustered_data():
    """Block-diagonal DATA with a full mask: the data-summary skip must
    not drop any jaccard or phi hit (inter=0 stripes are provably below
    any positive threshold for both), and r2 — which scores
    anti-correlated zero-intersection pairs and is the one measure that
    still walks every stripe here — must match the matrix form
    exactly."""
    from stormtpu import similarity_matrix_complete
    from stormtpu.layout import BitMatrix
    from stormtpu.stream_query import stream_pairs_above_complete
    from test_clustered import block_diagonal_bitmatrix

    bm_d = block_diagonal_bitmatrix(64, 12800, 4, 0.35, seed=98)
    rng = np.random.default_rng(99)
    observed = (rng.random((64, 12800)) > 0.1) | (
        np.asarray(bm_d.to_dense(), dtype=bool)
    )
    bm_m = BitMatrix.from_dense(observed.astype(np.uint8))
    cfg = _small_cfg()
    for measure, thr in (("jaccard", 0.2), ("phi", 0.2), ("r2", 0.3)):
        full = similarity_matrix_complete(bm_d, bm_m, measure)
        wi, wj = np.nonzero(np.triu(full, 1) >= thr)
        ii, jj, vv = stream_pairs_above_complete(
            bm_d, bm_m, thr, measure=measure, superblock_rows=16,
            kernel="dense", config=cfg, interpret=True,
        )
        np.testing.assert_array_equal(ii, wi, err_msg=measure)
        np.testing.assert_array_equal(jj, wj, err_msg=measure)


def test_stream_complete_r2_mask_summary_skip(monkeypatch):
    """Block-diagonal MASK aligned to the 4096-bit summary groups: a
    stripe whose data×mask cross summaries are co-empty has ca′ = 0 (or
    cb′ = 0, or m = 0) for every pair — r2's denominator is zero and the
    score is 0 by convention — so the complete-r2 screen may now skip it
    (VERDICT r3 #5: the mask-summary skip). Hits must match the matrix
    form exactly AND the skip must actually fire (call counting)."""
    import stormtpu.stream_query as sq
    from stormtpu import similarity_matrix_complete
    from stormtpu.layout import BitMatrix

    rng = np.random.default_rng(101)
    # 4 summary groups of 128 words; superblock_rows=16 resolves to 32
    # (geometry minimum), so n=128 gives 4 superblocks = 4 row bands
    n, m = 128, 4 * 4096
    observed = np.zeros((n, m), dtype=bool)
    band_r, band_c = n // 4, m // 4
    for b in range(4):
        observed[b * band_r:(b + 1) * band_r,
                 b * band_c:(b + 1) * band_c] = (
            rng.random((band_r, band_c)) > 0.1
        )
    values = (rng.random((n, m)) < 0.5) & observed
    values[1] = values[0] & observed[1]  # planted high-r2 pair in band 0
    bm_d = BitMatrix.from_dense(values.astype(np.uint8))
    bm_m = BitMatrix.from_dense(observed.astype(np.uint8))

    real = sq._stripe_screen_complete
    calls = []

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(sq, "_stripe_screen_complete", counting)

    thr = 0.3
    full = similarity_matrix_complete(bm_d, bm_m, "r2")
    wi, wj = np.nonzero(np.triu(full, 1) >= thr)
    ii, jj, vv = sq.stream_pairs_above_complete(
        bm_d, bm_m, thr, measure="r2", superblock_rows=16,
        kernel="dense", config=_small_cfg(), interpret=True,
    )
    np.testing.assert_array_equal(ii, wi)
    np.testing.assert_array_equal(jj, wj)
    np.testing.assert_allclose(vv, full[wi, wj], rtol=0, atol=0)
    # 4 row bands × 4 aligned bit groups: of the 10 triangular stripes
    # only the 4 diagonal ones co-occupy any group — the rest skip
    assert len(calls) == 4, f"expected 4 walked stripes, got {len(calls)}"
    assert wi.size > 0  # the walked stripes really carry hits


def test_stream_complete_resume(tmp_path, monkeypatch):
    """stream_pairs_above_complete(out_dir=...): per-stripe candidate
    files skip recompute on re-run; a different mask refuses the stale
    directory (content fingerprints cover BOTH matrices)."""
    import stormtpu.stream_query as sq
    from stormtpu.layout import BitMatrix

    rng = np.random.default_rng(103)
    obs = rng.random((52, 700)) > 0.12
    val = (rng.random((52, 700)) < 0.4) & obs
    bm_d = BitMatrix.from_dense(val.astype(np.uint8))
    bm_m = BitMatrix.from_dense(obs.astype(np.uint8))
    want = sq.stream_pairs_above_complete(
        bm_d, bm_m, 0.05, measure="r2", superblock_rows=16,
        kernel="dense", config=_small_cfg(), interpret=True,
    )
    real = sq._stripe_screen_complete
    calls = {"n": 0}

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(sq, "_stripe_screen_complete", counting)
    got = sq.stream_pairs_above_complete(
        bm_d, bm_m, 0.05, measure="r2", superblock_rows=16,
        kernel="dense", config=_small_cfg(), interpret=True,
        out_dir=str(tmp_path),
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    assert calls["n"] > 0
    calls["n"] = 0
    got = sq.stream_pairs_above_complete(
        bm_d, bm_m, 0.05, measure="r2", superblock_rows=16,
        kernel="dense", config=_small_cfg(), interpret=True,
        out_dir=str(tmp_path),
    )
    assert calls["n"] == 0
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    # a regenerated mask must refuse the stale directory
    obs2 = rng.random((52, 700)) > 0.12
    bm_m2 = BitMatrix.from_dense((obs2 | val.astype(bool)).astype(np.uint8))
    with pytest.raises(ValueError, match="manifest"):
        sq.stream_pairs_above_complete(
            bm_d, bm_m2, 0.05, measure="r2", superblock_rows=16,
            kernel="dense", config=_small_cfg(), interpret=True,
            out_dir=str(tmp_path),
        )


@pytest.mark.parametrize("measure", ["jaccard", "r2"])
def test_stream_topk_measure_dense_walk(measure):
    """Dense stripe walk measure ranking: values must equal the exact
    float64 similarity top-k (set + values; tie ORDER among equal scores
    is merge-order-dependent, like the count route)."""
    from stormtpu.setops import derive_similarity
    from stormtpu.oracle import oracle_count_matrix

    bm = random_bitmatrix(70, 1024, 0.3, seed=95)
    vals, idx = stream_topk_neighbors(bm, 6, superblock_rows=16,
                                      measure=measure)
    inter = oracle_count_matrix(bm.packed)
    sim = derive_similarity(inter, bm.row_nnz[:, None],
                            bm.row_nnz[None, :], bm.m_bits, measure)
    np.fill_diagonal(sim, -np.inf)
    for r in range(bm.n):
        want = -np.sort(-sim[r])[:6]
        np.testing.assert_array_equal(np.sort(vals[r])[::-1],
                                      np.sort(want)[::-1])
        np.testing.assert_array_equal(vals[r], sim[r][idx[r]])
    assert vals.dtype == np.float64

def test_stream_topk_measure_r2_zero_stripes_score():
    """phi/r2 disable the summary skip: a row pair with NO co-occupied
    superblock still gets its (anti-correlation) score."""
    from stormtpu.setops import derive_similarity
    from stormtpu.oracle import oracle_count_matrix

    rng = np.random.default_rng(98)
    dense = np.zeros((32, 4096), dtype=np.uint8)
    dense[:16, :2000] = (rng.random((16, 2000)) < 0.5).astype(np.uint8)
    dense[16:, 2100:] = (rng.random((16, 1996)) < 0.5).astype(np.uint8)
    from stormtpu.layout import BitMatrix

    bm = BitMatrix.from_dense(dense)
    vals, idx = stream_topk_neighbors(bm, 3, superblock_rows=16,
                                      measure="r2")
    inter = oracle_count_matrix(bm.packed)
    sim = derive_similarity(inter, bm.row_nnz[:, None],
                            bm.row_nnz[None, :], bm.m_bits, "r2")
    np.fill_diagonal(sim, -np.inf)
    for r in range(bm.n):
        want = -np.sort(-sim[r])[:3]
        np.testing.assert_array_equal(np.sort(vals[r])[::-1],
                                      np.sort(want)[::-1])
        np.testing.assert_array_equal(vals[r], sim[r][idx[r]])


def test_stream_topk_measure_escalation(monkeypatch):
    """Force certification failure (huge slack) at kk < sb: the stripe
    escalates to full enumeration and stays exact."""
    import stormtpu.cross as cross
    from stormtpu.oracle import oracle_count_matrix
    from stormtpu.setops import derive_similarity

    monkeypatch.setattr(cross, "_MEASURE_TOPK_SLACK", 1.0)
    import stormtpu.stream_query as sq

    kks = []
    orig = sq._stripe_topk_measure

    def spy(*a, **kw):
        kks.append(kw["kk"])
        return orig(*a, **kw)

    monkeypatch.setattr(sq, "_stripe_topk_measure", spy)
    bm = random_bitmatrix(130, 1024, 0.3, seed=99)
    vals, idx = stream_topk_neighbors(bm, 2, superblock_rows=64,
                                      measure="jaccard")
    # superblock_rows rounds up to the tile size, so the walk is one
    # stripe; the huge slack forces kk to double from 16 all the way to
    # the full stripe width (enumeration)
    assert min(kks) < max(kks), kks
    inter = oracle_count_matrix(bm.packed)
    sim = derive_similarity(inter, bm.row_nnz[:, None],
                            bm.row_nnz[None, :], bm.m_bits, "jaccard")
    np.fill_diagonal(sim, -np.inf)
    for r in range(bm.n):
        want = -np.sort(-sim[r])[:2]
        np.testing.assert_array_equal(np.sort(vals[r])[::-1],
                                      np.sort(want)[::-1])
        np.testing.assert_array_equal(vals[r], sim[r][idx[r]])
