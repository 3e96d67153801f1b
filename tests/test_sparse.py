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


def test_dispatch_routes_sparse_and_is_exact():
    from stormtpu.dispatch import choose_strategy

    bm = random_bitmatrix(64, 20000, 0.0005, seed=34)
    assert choose_strategy(bm.n, bm.m_bits, bm.density) == "sparse"
    got = intersect_count_matrix(bm)  # auto → sparse
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))
    got_dense = intersect_count_matrix(bm, strategy="popcount")
    np.testing.assert_array_equal(got_dense, got)
