"""Density-adaptive histogram routes (r5 — VERDICT r4 #1/#5): the K4
COO-stripe binning, the K5 work-list binning, the operand-streaming
dense walk, and the stats.count_histogram router that picks between
them with the streaming count walk's own policy."""

import json

import numpy as np
import pytest

from conftest import random_bitmatrix
from stormtpu import tuning
from stormtpu.config import EngineConfig
from stormtpu.stats import count_histogram


def _small_cfg():
    return EngineConfig(
        k1_tile_rows=8, k1_tile_words=128, k2_tile_rows=8, k2_tile_words=8
    )


def hist_oracle(packed_dense, n_bins, bin_width):
    C = packed_dense.astype(np.int64) @ packed_dense.T
    iu = np.triu_indices(packed_dense.shape[0], 1)
    b = np.minimum(C[iu] // bin_width, n_bins - 1)
    return np.bincount(b, minlength=n_bins)


def check_manifest(man, dense, n_bins):
    want = hist_oracle(dense, n_bins, man["bin_width"])
    np.testing.assert_array_equal(man["hist"], want)
    n = dense.shape[0]
    assert man["pairs"] == n * (n - 1) // 2


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


# ---------------------------------------------------------------- sparse

needs_native = pytest.mark.skipif(
    not __import__("stormtpu.native", fromlist=["HAVE_NATIVE"]).HAVE_NATIVE,
    reason="K4 histogram needs the native tier")


@needs_native
def test_hist_sparse_all_k4_exact(tmp_path, k4_cache):
    """Every stripe takes the COO emission path: binned host-side with
    the zero-pair mass credited to bin 0 — exact vs the oracle."""
    _force_k4(k4_cache)
    bm = random_bitmatrix(60, 2048, 0.003, seed=91)
    man = count_histogram(bm, n_bins=8, superblock_rows=16,
                          config=_small_cfg(), method="sparse")
    assert man["kernel"] == "sparse_outer"
    total = man["n_super"] * (man["n_super"] + 1) // 2
    assert man["stripe_kernels"] == {"k4": total, "dense": 0}
    check_manifest(man, bm.to_dense(), 8)


@needs_native
def test_hist_sparse_all_dense_exact(tmp_path, k4_cache):
    """Cost model rejects K4 everywhere: the sparse walk's per-stripe
    dense fallback (two-slice device binning) covers the whole panel."""
    _force_dense(k4_cache)
    bm = random_bitmatrix(60, 2048, 0.02, seed=92)
    man = count_histogram(bm, n_bins=8, superblock_rows=16,
                          config=_small_cfg(), method="sparse",
                          interpret=True)
    assert man["stripe_kernels"]["dense"] > 0
    assert man["stripe_kernels"]["k4"] == 0
    check_manifest(man, bm.to_dense(), 8)


@needs_native
@pytest.mark.parametrize("n,m,density,seed", [
    (40, 1024, 0.005, 93), (70, 4096, 0.001, 94), (33, 2048, 0.05, 95),
])
def test_hist_sparse_live_cost_model_exact(n, m, density, seed):
    """Whatever the fitted model decides per stripe (mixed K4/dense),
    the result is exact — route invariance at histogram granularity."""
    bm = random_bitmatrix(n, m, density, seed=seed)
    man = count_histogram(bm, n_bins=16, superblock_rows=16,
                          config=_small_cfg(), method="sparse",
                          interpret=True)
    check_manifest(man, bm.to_dense(), 16)


@needs_native
def test_hist_auto_routes_sparse(k4_cache):
    """An ultra-sparse panel auto-routes to the K4 histogram (the
    resolver's own density threshold — same policy as the counts walk)."""
    _force_k4(k4_cache)
    bm = random_bitmatrix(64, 8192, 0.0005, seed=96)
    cfg = _small_cfg()
    assert bm.density < cfg.sparse_density_threshold
    man = count_histogram(bm, n_bins=8, superblock_rows=16, config=cfg,
                          method="auto")
    assert man["kernel"] == "sparse_outer"
    check_manifest(man, bm.to_dense(), 8)


# -------------------------------------------------------------- streamed

def test_hist_streamed_matches_dense():
    """Operand streaming (two resident slices) is value-identical to the
    single-shot resident walk and the oracle, ragged shapes included."""
    for n, m, d, seed in [(60, 600, 0.3, 97), (48, 2048, 0.1, 98)]:
        bm = random_bitmatrix(n, m, d, seed=seed)
        man_s = count_histogram(bm, n_bins=8, superblock_rows=16,
                                config=_small_cfg(), method="streamed",
                                interpret=True)
        man_d = count_histogram(bm, n_bins=8, superblock_rows=16,
                                config=_small_cfg(), method="dense",
                                interpret=True)
        assert man_s["operand_streaming"] is True
        np.testing.assert_array_equal(man_s["hist"], man_d["hist"])
        check_manifest(man_s, bm.to_dense(), 8)


def test_hist_auto_streams_above_operand_budget(monkeypatch):
    """Above the device operand budget the dense route flips to operand
    streaming instead of materializing the padded matrix on device."""
    monkeypatch.setenv("STORMTPU_DEVICE_OPERAND_BUDGET_BYTES", "1024")
    bm = random_bitmatrix(60, 600, 0.3, seed=99)
    man = count_histogram(bm, n_bins=8, superblock_rows=16,
                          config=_small_cfg(), method="dense",
                          interpret=True)
    assert man.get("operand_streaming") is True
    check_manifest(man, bm.to_dense(), 8)


def test_hist_refuse_guard(monkeypatch):
    """A single-shot route that somehow exceeds the refusal ceiling is
    refused with the budget message (defense in depth behind the
    auto-streaming flip)."""
    monkeypatch.setenv("STORMTPU_DEVICE_OPERAND_BUDGET_BYTES",
                       str(1 << 40))
    monkeypatch.setenv("STORMTPU_DEVICE_REFUSE_BUDGET_BYTES", "1024")
    bm = random_bitmatrix(60, 600, 0.3, seed=100)
    with pytest.raises(ValueError, match="device budget"):
        count_histogram(bm, n_bins=8, superblock_rows=16,
                        config=_small_cfg(), method="dense",
                        interpret=True)


def test_hist_bad_method():
    bm = random_bitmatrix(8, 64, 0.5, seed=101)
    with pytest.raises(ValueError, match="method"):
        count_histogram(bm, method="bogus")


# ------------------------------------------------------------- clustered

def test_hist_clustered_exact_and_skips():
    """Block-diagonal panel: the K5 histogram bins only visited tiles;
    co-empty stripes and unvisited tiles land in bin 0 arithmetically —
    exact, with real skip evidence in the manifest."""
    from test_clustered import CFG, block_diagonal_bitmatrix

    bm = block_diagonal_bitmatrix(128, 16384, 4, 0.3, seed=102)
    man = count_histogram(bm, n_bins=16, superblock_rows=32, config=CFG,
                          method="clustered", interpret=True)
    assert man["kernel"] == "clustered"
    assert man["work_items"] > 0
    # 4 blocks × sb=32 ⇒ 4 superblocks; only the 4 diagonal stripes of
    # the 10 co-occupy anything
    assert man["stripes_skipped"] == 6
    check_manifest(man, bm.to_dense(), 16)


def test_hist_clustered_operand_streaming_exact():
    from stormtpu.stream_hist import stream_hist_clustered
    from test_clustered import CFG, block_diagonal_bitmatrix

    bm = block_diagonal_bitmatrix(128, 16384, 4, 0.3, seed=103)
    man = stream_hist_clustered(bm, n_bins=16, superblock_rows=32,
                                config=CFG, interpret=True,
                                operand_streaming=True)
    assert man["operand_streaming"] is True
    check_manifest(man, bm.to_dense(), 16)


def test_hist_clustered_single_group_falls_back():
    """ng < 2 degenerates the summary — the router falls through to the
    dense route instead of failing."""
    bm = random_bitmatrix(40, 256, 0.3, seed=104)  # one K-group
    man = count_histogram(bm, n_bins=8, superblock_rows=16,
                          config=_small_cfg(), method="clustered",
                          interpret=True)
    assert man["kernel"] == "mxu"
    check_manifest(man, bm.to_dense(), 8)


def test_hist_auto_routes_clustered():
    from stormtpu.kernels.clustered import clustered_work_fraction
    from test_clustered import CFG, block_diagonal_bitmatrix

    bm = block_diagonal_bitmatrix(128, 16384, 4, 0.3, seed=105)
    wf = clustered_work_fraction(bm, CFG)
    assert wf is not None and wf < CFG.clustered_work_fraction_threshold
    man = count_histogram(bm, n_bins=16, superblock_rows=32, config=CFG,
                          method="auto", interpret=True)
    assert man["kernel"] == "clustered"
    check_manifest(man, bm.to_dense(), 16)


def test_hist_route_agreement():
    """All applicable routes agree bin-for-bin on one moderate panel."""
    bm = random_bitmatrix(50, 2048, 0.04, seed=106)
    mans = {}
    for method in ("dense", "streamed", "sparse"):
        if method == "sparse":
            from stormtpu.native import HAVE_NATIVE

            if not HAVE_NATIVE:
                continue
        mans[method] = count_histogram(
            bm, n_bins=12, superblock_rows=16, config=_small_cfg(),
            method=method, interpret=True)
    base = mans["dense"]["hist"]
    for method, man in mans.items():
        np.testing.assert_array_equal(man["hist"], base), method
    check_manifest(mans["dense"], bm.to_dense(), 12)


def test_hist_validation_all_routes():
    """n_bins/bin_width validation applies on EVERY route (r5 review:
    the sparse route used to floor-divide by zero, and bin_width=0
    buries every pair in bin 0 without tripping mass conservation)."""
    bm = random_bitmatrix(20, 256, 0.3, seed=107)
    for method in ("dense", "streamed", "sparse", "clustered"):
        with pytest.raises(ValueError, match="n_bins"):
            count_histogram(bm, n_bins=0, method=method, interpret=True)
        with pytest.raises(ValueError, match="bin_width"):
            count_histogram(bm, n_bins=4, bin_width=0, method=method,
                            interpret=True)


def test_hist_streamed_occupancy_shape_guard():
    from stormtpu.stream_hist import stream_hist_streamed

    bm = random_bitmatrix(60, 600, 0.3, seed=108)
    with pytest.raises(ValueError, match="occupancy"):
        stream_hist_streamed(bm, n_bins=8, superblock_rows=16,
                             config=_small_cfg(), interpret=True,
                             occupancy=np.ones((99, 2), dtype=bool))
