"""Exact aggregate statistics over C (stats.py) vs brute-force oracle."""

import numpy as np
import pytest

from conftest import random_bitmatrix
from stormtpu.oracle import oracle_count_matrix
from stormtpu.stats import count_histogram, count_row_sums


@pytest.mark.parametrize(
    "n,m,density,seed",
    [
        (25, 700, 0.3, 11),
        (64, 64, 0.9, 12),      # exact word boundary
        (37, 8193, 0.01, 13),   # crosses a K2 tile-words boundary
        (300, 1000, 0.5, 14),   # crosses the tile_rows boundary
    ],
)
def test_count_row_sums_exact(n, m, density, seed):
    bm = random_bitmatrix(n, m, density, seed=seed)
    c = oracle_count_matrix(bm.packed).astype(np.int64)
    got = count_row_sums(bm)
    np.testing.assert_array_equal(got, c.sum(axis=1))
    got_noself = count_row_sums(bm, include_self=False)
    np.testing.assert_array_equal(got_noself, c.sum(axis=1) - np.diag(c))


def test_count_row_sums_empty_rows():
    dense = np.zeros((5, 100), dtype=np.uint8)
    dense[1, :7] = 1
    dense[3, 5:9] = 1
    from stormtpu.layout import BitMatrix

    bm = BitMatrix.from_dense(dense)
    c = oracle_count_matrix(bm.packed).astype(np.int64)
    np.testing.assert_array_equal(count_row_sums(bm), c.sum(axis=1))


@pytest.mark.parametrize(
    "n,m,density,n_bins,seed",
    [
        (25, 700, 0.3, 8, 21),
        (64, 64, 0.9, 64, 22),     # more bins than distinct counts
        (300, 1000, 0.5, 16, 23),  # crosses tile_rows; multi-tile stripes
        (40, 8193, 0.01, 4, 24),   # sparse, ragged words
    ],
)
def test_count_histogram_exact(n, m, density, n_bins, seed):
    bm = random_bitmatrix(n, m, density, seed=seed)
    man = count_histogram(bm, n_bins=n_bins)
    c = oracle_count_matrix(bm.packed)
    iu = np.triu_indices(n, k=1)
    vals = c[iu].astype(np.int64)
    w = man["bin_width"]
    want = np.zeros(n_bins, dtype=np.int64)
    np.add.at(want, np.minimum(vals // w, n_bins - 1), 1)
    np.testing.assert_array_equal(man["hist"], want)
    assert man["pairs"] == n * (n - 1) // 2
    assert man["hist"].sum() == man["pairs"]
    assert man["bin_edges"].shape == (n_bins + 1,)


def test_count_histogram_explicit_width_and_small_n():
    bm = random_bitmatrix(3, 96, 0.7, seed=31)
    man = count_histogram(bm, n_bins=97, bin_width=1)
    c = oracle_count_matrix(bm.packed)
    iu = np.triu_indices(3, k=1)
    want = np.bincount(c[iu].astype(np.int64), minlength=97)
    np.testing.assert_array_equal(man["hist"], want)


def test_count_histogram_multi_superblock():
    # force several superblock stripes (diag + off-diag walks): tile
    # geometry pins tile_rows to min(k2_tile_rows, round_up(n, 32)), so
    # the smallest multi-stripe n is one past k2_tile_rows
    bm = random_bitmatrix(300, 256, 0.4, seed=41)
    man = count_histogram(bm, n_bins=8, superblock_rows=32)
    assert man["n_super"] >= 2
    c = oracle_count_matrix(bm.packed)
    iu = np.triu_indices(300, k=1)
    vals = c[iu].astype(np.int64)
    w = man["bin_width"]
    want = np.zeros(8, dtype=np.int64)
    np.add.at(want, np.minimum(vals // w, 7), 1)
    np.testing.assert_array_equal(man["hist"], want)
