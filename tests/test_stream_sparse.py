"""Per-superblock K4 streaming (the sparse regime above the single-shot
N=32768 ceiling — VERDICT r2 missing #3): stripe-local inverted-index
emission, per-stripe K4-vs-dense cost dispatch, COO stripe format, resume.
"""

import json
import os

import numpy as np
import pytest

from conftest import random_bitmatrix
from stormtpu.config import EngineConfig
from stormtpu.native import HAVE_NATIVE
from stormtpu.oracle import oracle_count_matrix
from stormtpu.stream import (
    load_streamed_matrix,
    stream_count_matrix,
    stripe_path,
)
from stormtpu import tuning

pytestmark = pytest.mark.skipif(
    not HAVE_NATIVE, reason="K4 streaming needs the native tier")


def _small_cfg():
    return EngineConfig(
        k1_tile_rows=8, k1_tile_words=128, k2_tile_rows=8, k2_tile_words=8
    )


@pytest.fixture
def k4_cache(tmp_path, monkeypatch):
    """Writable tuning cache; tests pin the K4 cost model to force stripe
    decisions deterministically."""
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
    # K4 free, dense absurdly slow: every stripe takes the emission path
    write(c_sort_s_per_nnz=0.0, c_n2_s_per_elem=0.0,
          c_emit_s_per_emission=0.0, k2_int8_ops_per_s=1.0,
          dispatch_floor_s=100.0)


def _force_dense(write):
    # K4 absurdly slow: every stripe takes the device walk
    write(c_sort_s_per_nnz=1.0, c_n2_s_per_elem=1.0,
          c_emit_s_per_emission=1.0, k2_int8_ops_per_s=1e30,
          dispatch_floor_s=0.0)


def test_sparse_outer_stream_exact_all_k4(tmp_path, k4_cache):
    _force_k4(k4_cache)
    bm = random_bitmatrix(60, 2048, 0.003, seed=71)  # ragged: 60 -> 64 pad
    out = tmp_path / "s"
    man = stream_count_matrix(
        bm, str(out), superblock_rows=16, kernel="sparse_outer",
        config=_small_cfg(), interpret=True,
    )
    assert man["kernel"] == "sparse_outer"
    assert man["stripe_kernels"]["k4"] == man["n_super"] * (man["n_super"] + 1) // 2
    assert man["stripe_kernels"]["dense"] == 0
    got = load_streamed_matrix(str(out))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_sparse_outer_stream_exact_all_dense(tmp_path, k4_cache):
    _force_dense(k4_cache)
    bm = random_bitmatrix(40, 1024, 0.005, seed=72)
    out = tmp_path / "s"
    man = stream_count_matrix(
        bm, str(out), superblock_rows=16, kernel="sparse_outer",
        config=_small_cfg(), interpret=True,
    )
    assert man["stripe_kernels"]["k4"] == 0
    assert man["stripe_kernels"]["dense"] > 0
    got = load_streamed_matrix(str(out))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_sparse_outer_mixed_stripe_decisions(tmp_path, k4_cache):
    # one dense superblock inside an ultra-sparse panel: its stripes must
    # flip to the device walk while the sparse-sparse stripes stay on K4.
    # E-threshold via pinned constants: est_dense = sb2*m/tops + floor
    # = 256*1024/1e12 + 1e-4 ≈ 3.6e-4; c_emit=1e-6 → K4 wins iff E < 362.
    k4_cache(c_sort_s_per_nnz=0.0, c_n2_s_per_elem=0.0,
             c_emit_s_per_emission=1e-6, k2_int8_ops_per_s=1e12,
             dispatch_floor_s=1e-4)
    rng = np.random.default_rng(73)
    dense01 = (rng.random((48, 1024)) < 0.002).astype(np.uint8)
    dense01[:16] = (rng.random((16, 1024)) < 0.4).astype(np.uint8)
    from stormtpu.layout import BitMatrix

    bm = BitMatrix.from_dense(dense01)
    out = tmp_path / "s"
    man = stream_count_matrix(
        bm, str(out), superblock_rows=16, kernel="sparse_outer",
        config=_small_cfg(), interpret=True,
    )
    assert man["stripe_kernels"]["k4"] > 0
    assert man["stripe_kernels"]["dense"] > 0
    got = load_streamed_matrix(str(out))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_auto_routes_extreme_sparsity_to_sparse_outer(tmp_path, k4_cache):
    _force_k4(k4_cache)
    bm = random_bitmatrix(48, 4096, 0.0005, seed=74)
    assert bm.density < 0.001
    out = tmp_path / "s"
    man = stream_count_matrix(
        bm, str(out), superblock_rows=16, kernel="auto",
        config=_small_cfg(), interpret=True,
    )
    assert man["kernel"] == "sparse_outer"
    got = load_streamed_matrix(str(out))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_sparse_outer_resume(tmp_path, k4_cache):
    _force_k4(k4_cache)
    bm = random_bitmatrix(40, 2048, 0.004, seed=75)
    out = tmp_path / "s"
    stream_count_matrix(
        bm, str(out), superblock_rows=16, kernel="sparse_outer",
        config=_small_cfg(), interpret=True,
    )
    os.remove(stripe_path(str(out), 0, 1))
    calls = []
    man = stream_count_matrix(
        bm, str(out), superblock_rows=16, kernel="sparse_outer",
        config=_small_cfg(), interpret=True,
        progress=lambda d, t: calls.append((d, t)),
    )
    got = load_streamed_matrix(str(out))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))
    # resumed stripes are accounted from what is on disk: the kernel
    # split must cover every completed stripe, not just the re-run one
    total = man["n_super"] * (man["n_super"] + 1) // 2
    assert len(man["completed"]) == total
    assert (man["stripe_kernels"]["k4"]
            + man["stripe_kernels"]["dense"]) == total


def test_sparse_outer_forced_without_native_refuses(tmp_path, monkeypatch):
    import stormtpu.native as native

    monkeypatch.setattr(native, "HAVE_NATIVE", False)
    bm = random_bitmatrix(24, 512, 0.01, seed=77)
    with pytest.raises(RuntimeError, match="native C\\+\\+ tier"):
        stream_count_matrix(
            bm, str(tmp_path / "s"), superblock_rows=16,
            kernel="sparse_outer", config=_small_cfg(), interpret=True,
        )


@pytest.mark.skipif(
    not os.environ.get("STORMTPU_SLOW_TESTS"),
    reason="full-spec sparse scale rehearsal (minutes, ~5 GB host RAM); "
    "STORMTPU_SLOW_TESTS=1",
)
def test_sparse_outer_scale_n131072(tmp_path):
    # VERDICT r2 #3 done-criterion: N=131,072 × M=1M at d=1e-5 through
    # the streaming driver, oracle-exact (sampled — the full N² is 64 GB).
    # Shipped cost constants route every stripe to K4 at this density.
    from stormtpu.layout import BitMatrix

    n, m_bits, nnz = 131_072, 1 << 20, 1_300_000
    rng = np.random.default_rng(76)
    rows = rng.integers(0, n, nnz)
    poss = rng.integers(0, m_bits, nnz)
    bm = BitMatrix.from_positions(rows, poss, n, m_bits)
    out = tmp_path / "s"
    man = stream_count_matrix(
        bm, str(out), superblock_rows=4096, kernel="auto", interpret=True,
    )
    assert man["kernel"] == "sparse_outer"
    assert man["stripe_kernels"]["dense"] == 0  # d=1e-5 is all-K4 terrain
    # sampled exactness: nonzero pairs (both rows of some position) and
    # random pairs, straight against packed-row popcounts
    sb = man["superblock_rows"]
    order = np.argsort(poss, kind="stable")
    ps, rs = poss[order], rows[order]
    same = ps[1:] == ps[:-1]
    ii = rs[:-1][same][:64].astype(np.int64)
    jj = rs[1:][same][:64].astype(np.int64)
    ii2 = rng.integers(0, n, 64)
    jj2 = rng.integers(0, n, 64)
    ii, jj = np.r_[ii, ii2], np.r_[jj, jj2]
    want = np.bitwise_count(bm.packed[ii] & bm.packed[jj]).sum(
        axis=1, dtype=np.int64)
    got = np.empty_like(want)
    for k, (a, b) in enumerate(zip(ii, jj)):
        i_sb, j_sb = a // sb, b // sb
        li, lj = a % sb, b % sb
        if i_sb > j_sb:
            i_sb, j_sb, li, lj = j_sb, i_sb, lj, li
        with np.load(stripe_path(str(out), int(i_sb), int(j_sb))) as z:
            hit = (z["coo_i"] == li) & (z["coo_j"] == lj)
            got[k] = int(z["coo_v"][hit][0]) if hit.any() else 0
    np.testing.assert_array_equal(got, want)


def test_sparse_outer_empty_and_duplicate_rows(tmp_path, k4_cache):
    _force_k4(k4_cache)
    from stormtpu.layout import BitMatrix

    # empty rows, an all-zero superblock, duplicate positions at ingest
    rows = np.array([0, 0, 0, 5, 5, 37, 37, 37], dtype=np.int64)
    poss = np.array([3, 3, 900, 3, 901, 3, 3, 902], dtype=np.int64)
    bm = BitMatrix.from_positions(rows, poss, 40, 1024)
    out = tmp_path / "s"
    stream_count_matrix(
        bm, str(out), superblock_rows=16, kernel="sparse_outer",
        config=_small_cfg(), interpret=True,
    )
    got = load_streamed_matrix(str(out))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


@pytest.mark.skipif(not HAVE_NATIVE, reason="needs the native K4 tier")
def test_stripe_coo_matches_dense_run_walk():
    """The buffer-free COO emission path (stripe_coo, added for the
    N=1M rehearsal where the sb² fill+scan dominates) must equal the
    native dense run walk's nonzeros on every stripe — diagonal
    (mirrored full square incl. self counts) and cross."""
    from stormtpu.stream import _SparseStripePlan

    for n, m, d, sb, seed in [(300, 2048, 0.004, 64, 81),
                              (140, 512, 0.02, 32, 82),
                              (96, 4096, 0.0008, 32, 83)]:
        bm = random_bitmatrix(n, m, d, seed=seed)
        n_super = -(-n // sb)
        plan = _SparseStripePlan(bm, sb, n_super)
        for i in range(n_super):
            for j in range(i, n_super):
                dense = plan.stripe_counts(i, j)
                ci, cj, cv = plan.stripe_coo(i, j)
                wi, wj = np.nonzero(dense)
                np.testing.assert_array_equal(ci, wi, err_msg=f"{i},{j}")
                np.testing.assert_array_equal(cj, wj, err_msg=f"{i},{j}")
                np.testing.assert_array_equal(cv, dense[wi, wj],
                                              err_msg=f"{i},{j}")
                assert plan.emissions_square(i, j) >= int(
                    (dense > 0).sum()
                )


@pytest.mark.skipif(not HAVE_NATIVE, reason="needs the native K4 tier")
def test_sparse_outer_stream_emission_path_end_to_end(tmp_path, k4_cache):
    """End-to-end sparse walk where EVERY K4 stripe takes the
    buffer-free emission path (tiny emissions ≪ sb²/8), vs oracle."""
    from stormtpu.stream import load_streamed_matrix, stream_count_matrix

    bm = random_bitmatrix(90, 8192, 0.0006, seed=84)
    man = stream_count_matrix(
        bm, str(tmp_path / "coo"), superblock_rows=32,
        kernel="sparse_outer", compress=False,
    )
    assert man["stripe_kernels"]["k4"] > 0
    got = load_streamed_matrix(str(tmp_path / "coo"))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))
