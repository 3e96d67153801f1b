"""Public API + dispatch invariance (D1 must be semantics-free —
SURVEY.md §5 item 3)."""

import numpy as np
import pytest

from conftest import random_bitmatrix
from stormtpu import BitMatrix, intersect_count_matrix, pair_count
from stormtpu.api import count_block
from stormtpu.dispatch import choose_strategy
from stormtpu.oracle import oracle_count_block, oracle_count_matrix


def test_pair_count_api(rng):
    a = (rng.random(512) < 0.4).astype(np.uint8)
    b = (rng.random(512) < 0.4).astype(np.uint8)
    assert pair_count(a, b) == int((a & b).sum())


def test_intersect_count_matrix_auto(rng):
    bm = random_bitmatrix(20, 300, 0.2, seed=5)
    got = intersect_count_matrix(bm)
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


@pytest.mark.parametrize("strategy", ["popcount", "mxu"])
def test_dispatch_invariance_xla(strategy):
    bm = random_bitmatrix(33, 500, 0.15, seed=6)
    got = intersect_count_matrix(bm, strategy=strategy)
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_choose_strategy_shapes():
    assert choose_strategy(10_000, 1_000_000, 0.5) == "pallas_mxu"
    assert choose_strategy(10_000, 1_000_000, 0.00001) == "sparse"
    assert choose_strategy(2, 1_000_000, 0.5) == "popcount"  # single pair
    assert choose_strategy(10, 4096, 0.5) == "popcount"   # tiny N
    assert choose_strategy(1000, 65536, 0.5) == "mxu"


def test_count_block_api(rng):
    a = random_bitmatrix(9, 200, 0.3, seed=11)
    b = random_bitmatrix(14, 200, 0.6, seed=12)
    np.testing.assert_array_equal(
        count_block(a, b), oracle_count_block(a.packed, b.packed)
    )


def test_rejects_mismatched_universe():
    a = BitMatrix.from_dense(np.ones((1, 64), dtype=np.uint8))
    b = BitMatrix.from_dense(np.ones((1, 128), dtype=np.uint8))
    with pytest.raises(ValueError):
        pair_count(a, b)


def test_rejects_raw_uint32():
    with pytest.raises(TypeError):
        intersect_count_matrix(np.zeros((2, 2), dtype=np.uint32))


def test_clustered_compaction_exact(rng):
    # all set bits live in 2 of 64 word-columns -> compaction kicks in
    from stormtpu.oracle import oracle_count_matrix

    n, m = 30, 2048
    dense = np.zeros((n, m), dtype=np.uint8)
    dense[:, 40:60] = (rng.random((n, 20)) < 0.5).astype(np.uint8)
    dense[:, 1990:2000] = (rng.random((n, 10)) < 0.5).astype(np.uint8)
    bm = BitMatrix.from_dense(dense)
    for strategy in ("popcount", "mxu", "pallas_mxu"):
        got = intersect_count_matrix(bm, strategy=strategy)
        np.testing.assert_array_equal(
            got, oracle_count_matrix(bm.packed), err_msg=strategy
        )


def test_all_empty_matrix_compaction():
    bm = BitMatrix.from_dense(np.zeros((5, 640), dtype=np.uint8))
    got = intersect_count_matrix(bm, strategy="mxu")
    assert got.shape == (5, 5) and got.sum() == 0


def test_io_roundtrip_preserves_coo(tmp_path):
    """save/load keeps the ingest COO cache so K4 stays O(nnz)."""
    from stormtpu import BitMatrix
    from stormtpu.io import load_bitmatrix, save_bitmatrix
    from stormtpu.kernels.sparse import count_matrix_sparse_outer
    from stormtpu.oracle import oracle_count_matrix

    rows = np.array([0, 0, 2, 3], dtype=np.int64)
    cols = np.array([5, 99, 5, 7], dtype=np.int64)
    bm = BitMatrix.from_positions(rows, cols, 4, 128)
    p = str(tmp_path / "bm.npz")
    save_bitmatrix(bm, p)
    bm2 = load_bitmatrix(p)
    assert bm2.coo is not None
    np.testing.assert_array_equal(bm2.packed, bm.packed)
    np.testing.assert_array_equal(
        count_matrix_sparse_outer(bm2), oracle_count_matrix(bm.packed)
    )
