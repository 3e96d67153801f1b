"""K3 sparse-path exactness (SURVEY.md §5 item 2): <1% density config,
adversarial cases — empty rows, all bits in one block, duplicates at
ingest, dispatch-to-sparse invariance."""

import numpy as np

from conftest import random_bitmatrix
from stormtpu import BitMatrix, intersect_count_matrix
from stormtpu.kernels.sparse import (
    count_block_sparse,
    count_matrix_sparse,
    padded_position_lists,
)
from stormtpu.oracle import oracle_count_block, oracle_count_matrix


def test_sparse_exact_low_density():
    bm = random_bitmatrix(31, 8000, 0.005, seed=31)
    got = count_matrix_sparse(bm)
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_sparse_empty_rows_and_single_block():
    lists = [
        np.array([], dtype=np.int64),          # empty row
        np.array([0, 1, 2, 3]),                # clustered in block 0
        np.array([7, 9]),                      # overlap with row 1? no
        np.array([1, 3, 9, 4095]),
        np.array([], dtype=np.int64),
    ]
    bm = BitMatrix.from_position_lists(lists, m_bits=4096)
    got = count_matrix_sparse(bm)
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))
    assert got[1, 3] == 2 and got[0].sum() == 0 and got[2, 3] == 1


def test_sparse_rectangular_block():
    a = random_bitmatrix(9, 5000, 0.01, seed=32)
    b = random_bitmatrix(17, 5000, 0.002, seed=33)
    pa = padded_position_lists(a)
    pb = padded_position_lists(b)
    got = np.asarray(count_block_sparse(pa, pb, sentinel=5000))
    np.testing.assert_array_equal(got, oracle_count_block(a.packed, b.packed))


def test_sparse_ragged_list_lengths():
    # rows with wildly different nnz exercise the sentinel padding
    lists = [np.arange(0, 3000, 3), np.array([2999]), np.arange(1000)]
    bm = BitMatrix.from_position_lists(lists, m_bits=3000)
    got = count_matrix_sparse(bm)
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_dispatch_routes_sparse_and_is_exact(monkeypatch):
    import stormtpu.utils as u

    monkeypatch.setattr(u, "is_tpu_backend", lambda: False)  # CPU semantics
    from stormtpu.dispatch import choose_strategy

    bm = random_bitmatrix(64, 20000, 0.0005, seed=34)
    assert choose_strategy(bm.n, bm.m_bits, bm.density) == "sparse"
    got = intersect_count_matrix(bm)  # auto → sparse
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))
    got_dense = intersect_count_matrix(bm, strategy="popcount")
    np.testing.assert_array_equal(got_dense, got)


class TestSparseOuter:
    """K4 inverted-index outer-product path."""

    def test_exact_across_densities(self):
        from stormtpu.kernels.sparse import count_matrix_sparse_outer
        from stormtpu.oracle import oracle_count_matrix

        for density in (0.0005, 0.005, 0.02):
            bm = random_bitmatrix(40, 3000, density, seed=91)
            got = count_matrix_sparse_outer(bm)
            np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))

    def test_empty_and_single_row(self):
        from stormtpu import BitMatrix
        from stormtpu.kernels.sparse import count_matrix_sparse_outer

        bm = BitMatrix.from_dense(np.zeros((5, 64), dtype=np.uint8))
        np.testing.assert_array_equal(
            count_matrix_sparse_outer(bm), np.zeros((5, 5), np.int32))
        one = np.zeros((1, 64), dtype=np.uint8); one[0, :7] = 1
        bm1 = BitMatrix.from_dense(one)
        assert count_matrix_sparse_outer(bm1)[0, 0] == 7

    def _clustered_bm(self):
        # one column set in EVERY row, the rest ultra sparse ->
        # rmax (64) far above the mean column occupancy (~1.2)
        from stormtpu import BitMatrix

        rng = np.random.default_rng(5)
        dense = np.zeros((64, 4096), dtype=np.uint8)
        dense[:, 0] = 1
        for r in range(64):
            dense[r, rng.integers(1, 4096, 4)] = 1
        return BitMatrix.from_dense(dense)

    def test_clustered_columns_native_exact(self):
        """The native K4 path has no clustering restriction."""
        from stormtpu.kernels.sparse import count_matrix_sparse_outer
        from stormtpu.native import HAVE_NATIVE
        from stormtpu.oracle import oracle_count_matrix
        import pytest

        if not HAVE_NATIVE:
            pytest.skip("native library unbuilt")
        bm = self._clustered_bm()
        got = count_matrix_sparse_outer(bm)
        np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))

    def test_clustered_column_fallback_guard_and_api(self, monkeypatch):
        """Without the native tier, the padded NumPy fallback refuses
        pathological clustering; the API strategy then falls back to the
        dense kernel and stays exact."""
        import stormtpu.kernels.sparse as sp
        from stormtpu import intersect_count_matrix
        from stormtpu.kernels.sparse import count_matrix_sparse_outer
        from stormtpu.oracle import oracle_count_matrix
        import stormtpu.native as native
        import pytest

        monkeypatch.setattr(native, "sparse_outer_from_packed_native",
                            lambda *a, **k: None)
        bm = self._clustered_bm()
        with pytest.raises(ValueError):
            count_matrix_sparse_outer(bm)
        got = intersect_count_matrix(bm, strategy="sparse_outer")
        np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))

    def test_strategy_exact_via_api(self):
        from stormtpu import intersect_count_matrix
        from stormtpu.oracle import oracle_count_matrix

        bm = random_bitmatrix(30, 5000, 0.001, seed=92)
        got = intersect_count_matrix(bm, strategy="sparse_outer")
        np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_dispatch_cost_model_tpu(monkeypatch):
    """On TPU backends the sparse branch picks K4 vs dense from the
    measured cost model (BASELINE.md 'Sparse-path crossover')."""
    import stormtpu.utils as u
    from stormtpu.dispatch import choose_strategy

    monkeypatch.setattr(u, "is_tpu_backend", lambda: True)
    # big M + ultra sparse: K4 wins (measured 11x at N=2048, M=10M, 1e-5)
    assert choose_strategy(2048, 10_000_000, 1e-5) == "sparse_outer"
    assert choose_strategy(2048, 1_000_000, 1e-4) == "sparse_outer"
    # the N^2 host passes lose to the MXU at these shapes (measured)
    assert choose_strategy(8192, 1_000_000, 1e-5) == "pallas_mxu"
    # huge N: K4's count buffer is impractical
    assert choose_strategy(100_000, 1_000_000, 1e-5) == "pallas_mxu"
