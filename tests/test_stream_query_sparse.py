"""Extreme-sparsity streaming QUERIES (round 3): stream_topk_neighbors /
stream_pairs_above over per-superblock K4 host emission — the reference's
sparse regime (C12) reaching the streaming query layer above the
single-shot N=32768 ceiling. Values must be identical to the dense walks
and the single-chip forms, including r2's zero-intersection pairs (which
the K4 emission never sees — the cardinality staircase must find them).
"""

import json

import numpy as np
import pytest

from conftest import random_bitmatrix
from stormtpu.config import EngineConfig
from stormtpu.native import HAVE_NATIVE
from stormtpu.oracle import oracle_count_matrix
from stormtpu.stream_query import stream_pairs_above, stream_topk_neighbors
from stormtpu import tuning

pytestmark = pytest.mark.skipif(
    not HAVE_NATIVE, reason="K4 streaming needs the native tier")


def _small_cfg():
    return EngineConfig(
        k1_tile_rows=8, k1_tile_words=128, k2_tile_rows=8, k2_tile_words=8
    )


@pytest.fixture
def k4_cache(tmp_path, monkeypatch):
    path = tmp_path / "tuning.json"
    monkeypatch.setenv(tuning.CACHE_ENV, str(path))

    def write(**consts):
        import jax

        path.write_text(json.dumps({
            "device": str(jax.devices()[0]),
            "k4_cost_model": consts,
        }))

    return write


def _force_k4(write):
    write(c_sort_s_per_nnz=0.0, c_n2_s_per_elem=0.0,
          c_emit_s_per_emission=0.0, k2_int8_ops_per_s=1.0,
          dispatch_floor_s=100.0)


def _force_dense(write):
    write(c_sort_s_per_nnz=1.0, c_n2_s_per_elem=1.0,
          c_emit_s_per_emission=1.0, k2_int8_ops_per_s=1e30,
          dispatch_floor_s=0.0)


def _oracle_topk_vals(bm, k):
    c = oracle_count_matrix(bm.packed).astype(np.int64)
    np.fill_diagonal(c, -1)
    vals = -np.sort(-c, axis=1)[:, :k]
    return np.maximum(vals, 0)


@pytest.mark.parametrize("force", ["k4", "dense"])
def test_stream_topk_sparse_outer_matches_oracle(k4_cache, force):
    (_force_k4 if force == "k4" else _force_dense)(k4_cache)
    bm = random_bitmatrix(60, 2048, 0.003, seed=81)  # ragged: 60 → 64 pad
    vals, idx = stream_topk_neighbors(
        bm, 5, superblock_rows=16, kernel="sparse_outer",
        config=_small_cfg(), interpret=True,
    )
    np.testing.assert_array_equal(vals, _oracle_topk_vals(bm, 5),
                                  err_msg=force)
    c = oracle_count_matrix(bm.packed)
    for r in range(bm.n):
        for t in range(5):
            if vals[r, t] > 0:
                assert c[r, idx[r, t]] == vals[r, t]
                assert idx[r, t] != r


def test_stream_topk_sparse_mixed_stripes(k4_cache):
    # one dense superblock inside an ultra-sparse panel: its stripes take
    # the device walk, the sparse-sparse stripes stay on host K4 — values
    # must be seamless across the boundary (same constants as the counts
    # walker's mixed test: K4 wins iff E < ~362)
    k4_cache(c_sort_s_per_nnz=0.0, c_n2_s_per_elem=0.0,
             c_emit_s_per_emission=1e-6, k2_int8_ops_per_s=1e12,
             dispatch_floor_s=1e-4)
    rng = np.random.default_rng(82)
    dense01 = (rng.random((48, 1024)) < 0.002).astype(np.uint8)
    dense01[:16] = (rng.random((16, 1024)) < 0.4).astype(np.uint8)
    from stormtpu.layout import BitMatrix

    bm = BitMatrix.from_dense(dense01)
    vals, _ = stream_topk_neighbors(
        bm, 4, superblock_rows=16, kernel="sparse_outer",
        config=_small_cfg(), interpret=True,
    )
    np.testing.assert_array_equal(vals, _oracle_topk_vals(bm, 4))


@pytest.mark.parametrize("measure,threshold", [
    ("count", 3), ("jaccard", 0.15), ("phi", 0.2),
])
def test_stream_screen_sparse_outer_matches_single_chip(
    k4_cache, measure, threshold
):
    from stormtpu.query import pairs_above

    _force_k4(k4_cache)
    bm = random_bitmatrix(52, 2048, 0.004, seed=83)
    ii_s, jj_s, v_s = stream_pairs_above(
        bm, threshold, measure=measure, superblock_rows=16,
        kernel="sparse_outer", config=_small_cfg(), interpret=True,
    )
    ii_1, jj_1, v_1 = pairs_above(bm, threshold, measure=measure)
    np.testing.assert_array_equal(ii_s, ii_1, err_msg=measure)
    np.testing.assert_array_equal(jj_s, jj_1, err_msg=measure)
    np.testing.assert_allclose(v_s, v_1, rtol=0, atol=0, err_msg=measure)
    assert np.all(ii_s < jj_s)


def test_stream_screen_sparse_r2_zero_intersection_pairs(k4_cache):
    """r2 scores anti-correlated (zero-intersection) pairs the K4
    emission never emits; the staircase must surface them exactly."""
    from stormtpu.query import pairs_above

    _force_k4(k4_cache)
    rng = np.random.default_rng(84)
    m = 512
    dense01 = np.zeros((40, m), dtype=np.uint8)
    dense01[0, :256] = 1          # complementary halves: inter = 0,
    dense01[1, 256:] = 1          # r2 = (256·256)/(256·256) = 1.0
    for r in range(2, 40):        # sparse rows; identical ones score 1
        dense01[r, rng.integers(0, 64, 2)] = 1
    from stormtpu.layout import BitMatrix

    bm = BitMatrix.from_dense(dense01)
    ii_s, jj_s, v_s = stream_pairs_above(
        bm, 0.5, measure="r2", superblock_rows=16,
        kernel="sparse_outer", config=_small_cfg(), interpret=True,
    )
    # the anti-correlated pair must be present
    hit = (ii_s == 0) & (jj_s == 1)
    assert hit.any() and np.isclose(v_s[hit][0], 1.0)
    ii_1, jj_1, v_1 = pairs_above(bm, 0.5, measure="r2")
    np.testing.assert_array_equal(ii_s, ii_1)
    np.testing.assert_array_equal(jj_s, jj_1)
    np.testing.assert_allclose(v_s, v_1, rtol=0, atol=0)


def test_stream_screen_sparse_auto_routes_and_resumes(tmp_path, k4_cache):
    """Auto kernel takes the sparse route below the density threshold
    (observable in the checkpoint manifest) and resumes from the stripe
    store without recomputing."""
    _force_k4(k4_cache)
    bm = random_bitmatrix(48, 4096, 0.0005, seed=85)
    assert bm.density < 0.001
    out = tmp_path / "screen"
    args = dict(measure="count", superblock_rows=16, config=_small_cfg(),
                interpret=True, out_dir=str(out))
    ii_a, jj_a, v_a = stream_pairs_above(bm, 1, **args)
    man = json.loads((out / "screen_manifest.json").read_text())
    assert man["kernel"].startswith("sparse_outer+")
    ii_b, jj_b, v_b = stream_pairs_above(bm, 1, **args)
    np.testing.assert_array_equal(ii_a, ii_b)
    np.testing.assert_array_equal(jj_a, jj_b)
    np.testing.assert_array_equal(v_a, v_b)

    from stormtpu.query import pairs_above

    ii_1, jj_1, v_1 = pairs_above(bm, 1)
    np.testing.assert_array_equal(ii_a, ii_1)
    np.testing.assert_array_equal(v_a, v_1)


def test_stream_topk_sparse_checkpoint_resume(tmp_path, k4_cache):
    _force_k4(k4_cache)
    bm = random_bitmatrix(60, 2048, 0.003, seed=86)
    out = tmp_path / "topk"
    args = dict(superblock_rows=16, kernel="sparse_outer",
                config=_small_cfg(), interpret=True, out_dir=str(out))
    v_a, i_a = stream_topk_neighbors(bm, 4, **args)
    v_b, i_b = stream_topk_neighbors(bm, 4, **args)
    np.testing.assert_array_equal(v_a, v_b)
    np.testing.assert_array_equal(i_a, i_b)
    np.testing.assert_array_equal(v_a, _oracle_topk_vals(bm, 4))


def test_stream_topk_measure_sparse_route(k4_cache):
    """Sparse K4 stripes rank exact COO scores; zero-intersection pairs
    score 0 for jaccard (the no-partner convention)."""
    _force_k4(k4_cache)
    from stormtpu.setops import derive_similarity
    from stormtpu.oracle import oracle_count_matrix

    bm = random_bitmatrix(60, 2048, 0.004, seed=96)
    vals, idx = stream_topk_neighbors(bm, 4, superblock_rows=16,
                                      kernel="sparse_outer",
                                      measure="jaccard")
    inter = oracle_count_matrix(bm.packed)
    sim = derive_similarity(inter, bm.row_nnz[:, None],
                            bm.row_nnz[None, :], bm.m_bits, "jaccard")
    np.fill_diagonal(sim, -np.inf)
    for r in range(bm.n):
        want = np.maximum(-np.sort(-sim[r])[:4], 0.0)
        np.testing.assert_array_equal(np.sort(vals[r])[::-1],
                                      np.sort(want)[::-1])


def _oracle_measure_topk(bm, k, measure):
    from stormtpu.setops import derive_similarity

    inter = oracle_count_matrix(bm.packed)
    sim = derive_similarity(inter, bm.row_nnz[:, None],
                            bm.row_nnz[None, :], bm.m_bits, measure)
    np.fill_diagonal(sim, -np.inf)
    want = -np.sort(-sim, axis=1)[:, :k]
    # the route's no-partner convention: -inf slots surface as 0.0
    return np.where(np.isfinite(want), want, 0.0)


@pytest.mark.parametrize("measure", ["phi", "r2"])
def test_stream_topk_measure_phi_r2_sparse_route(k4_cache, measure):
    """phi/r2 rank zero-intersection pairs the K4 emission never sees —
    the staircase candidates (_k4_zero_topk) must recover them exactly.
    Adversarial rows: complementary halves (inter=0, r2=1.0 — the top
    partner is invisible to the COO pass), an all-zero row, a full row,
    and for phi a panel where most partners score NEGATIVE (so a padded
    row leaking a 0.0 score would corrupt the ranking)."""
    _force_k4(k4_cache)
    rng = np.random.default_rng(97)
    m = 512
    dense01 = (rng.random((45, m)) < 0.01).astype(np.uint8)
    dense01[0, :] = 0
    dense01[0, :256] = 1          # complementary halves: inter=0,
    dense01[1, :] = 0             # r2 = 1.0, phi = -1.0
    dense01[1, 256:] = 1
    dense01[2, :] = 0             # empty row: every score 0
    dense01[3, :] = 1             # full row: zero denominator, score 0
    from stormtpu.layout import BitMatrix

    bm = BitMatrix.from_dense(dense01)  # ragged: 45 rows, sb=16 → pad
    vals, idx = stream_topk_neighbors(
        bm, 3, superblock_rows=16, kernel="sparse_outer",
        config=_small_cfg(), interpret=True, measure=measure,
    )
    np.testing.assert_array_equal(vals, _oracle_measure_topk(bm, 3, measure))
    assert np.all(idx < bm.n) and np.all(idx >= 0)
    # values must also agree with the single-chip route (tie indices may
    # differ; exact float64 scores may not)
    from stormtpu.query import topk_neighbors

    v1, _ = topk_neighbors(bm, 3, measure=measure)
    np.testing.assert_array_equal(vals, v1)


def test_emission_path_coostripe_with_r2_staircase(monkeypatch):
    """phi/r2 on emission-eligible sparse stripes: the zero-intersection
    staircase consumes a _CooStripe (is_zero membership + per-row nonzero
    counts) instead of a dense stripe — results must match the resident
    oracle exactly, and the spy proves stripe_coo actually served."""
    import numpy as np

    import stormtpu.stream as stream_mod
    from stormtpu.layout import BitMatrix
    from stormtpu.native import HAVE_NATIVE
    from stormtpu.setops import derive_similarity
    from stormtpu.oracle import oracle_count_matrix
    from stormtpu.stream_query import (
        stream_pairs_above,
        stream_topk_neighbors,
    )

    if not HAVE_NATIVE:
        pytest.skip("needs the native K4 tier")

    rng = np.random.default_rng(53)
    n, m = 300, 16384
    dense = np.zeros((n, m), dtype=np.uint8)
    # ~1.5 nnz/row: stripe emissions stay far under sb^2/8 -> eligible
    dense[rng.integers(0, n, 450), rng.integers(0, m, 450)] = 1
    bm = BitMatrix.from_dense(dense)

    coo_calls = []
    real_coo = stream_mod._SparseStripePlan.stripe_coo
    dense_calls = []
    real_dense = stream_mod._SparseStripePlan.stripe_counts

    def spy_coo(self, i, j):
        coo_calls.append((i, j))
        return real_coo(self, i, j)

    def spy_dense(self, i, j):
        dense_calls.append((i, j))
        return real_dense(self, i, j)

    monkeypatch.setattr(stream_mod._SparseStripePlan, "stripe_coo", spy_coo)
    monkeypatch.setattr(stream_mod._SparseStripePlan, "stripe_counts",
                        spy_dense)

    C = oracle_count_matrix(bm.packed).astype(np.int64)
    nnz = bm.row_nnz.astype(np.int64)
    for measure in ("r2", "phi"):
        sim = derive_similarity(C, nnz[:, None], nnz[None, :], m, measure)
        np.fill_diagonal(sim, -np.inf)
        mv, mi = stream_topk_neighbors(bm, 3, measure=measure,
                                       superblock_rows=32,
                                       kernel="sparse_outer")
        np.testing.assert_array_equal(mv, -np.sort(-sim, axis=1)[:, :3],
                                      err_msg=measure)
    # ~3.7e-9 is the smallest zero-intersection r2 here (ca=cb=1), so
    # this threshold forces the staircase's z_mat to filter through
    # _CooStripe.is_zero and emit real hits
    thr = 1e-9
    ii, jj, vv = stream_pairs_above(bm, thr, measure="r2",
                                    superblock_rows=32,
                                    kernel="sparse_outer")
    sim = derive_similarity(C, nnz[:, None], nnz[None, :], m, "r2")
    wi, wj = np.nonzero(np.triu(sim, 1) >= thr)
    np.testing.assert_array_equal(ii, wi)
    np.testing.assert_array_equal(jj, wj)
    np.testing.assert_array_equal(vv, sim[wi, wj])
    assert wi.size > 100, "staircase produced no zero-intersection hits"
    assert len(coo_calls) > 0, "emission path never served a stripe"
    assert not dense_calls, (
        f"dense sb^2 buffers were built for {len(dense_calls)} stripes "
        "despite eligibility"
    )
