"""Layout/container exactness: pack/unpack round-trips, position ingest,
padding invariants, summaries (reference container layer C7–C10 analog)."""

import numpy as np
import pytest

from stormtpu.layout import (
    BitMatrix,
    pack_bits,
    pack_positions,
    pad_rows,
    pad_words,
    unpack_bits,
    words_for_bits,
)


def test_pack_unpack_roundtrip(rng):
    for m in (1, 31, 32, 33, 64, 100, 4096, 5000):
        dense = (rng.random((7, m)) < 0.3).astype(np.uint8)
        packed = pack_bits(dense)
        assert packed.shape == (7, words_for_bits(m))
        assert packed.dtype == np.uint32
        np.testing.assert_array_equal(unpack_bits(packed, m), dense)


def test_bit_order_lsb_first():
    dense = np.zeros((1, 64), dtype=np.uint8)
    dense[0, 0] = 1   # bit 0 → word 0 LSB
    dense[0, 33] = 1  # bit 33 → word 1, bit 1
    packed = pack_bits(dense)
    assert packed[0, 0] == 1
    assert packed[0, 1] == 2


def test_pack_positions_matches_dense(rng):
    n, m = 13, 500
    dense = (rng.random((n, m)) < 0.05).astype(np.uint8)
    rows, cols = np.nonzero(dense)
    packed = pack_positions(rows, cols, n, m)
    np.testing.assert_array_equal(packed, pack_bits(dense))


def test_pack_positions_duplicates_idempotent():
    packed = pack_positions([0, 0, 0], [5, 5, 5], n=1, m_bits=32)
    assert packed[0, 0] == 1 << 5


def test_pack_positions_bounds():
    with pytest.raises(ValueError):
        pack_positions([0], [64], n=1, m_bits=64)
    with pytest.raises(ValueError):
        pack_positions([2], [0], n=1, m_bits=64)


def test_bitmatrix_from_position_lists():
    lists = [np.array([0, 5, 99]), np.array([], dtype=np.int64), np.array([99])]
    bm = BitMatrix.from_position_lists(lists, m_bits=100)
    assert bm.n == 3
    assert bm.row_nnz.tolist() == [3, 0, 1]
    dense = bm.to_dense()
    assert dense[0, 99] == 1 and dense[2, 99] == 1 and dense[1].sum() == 0


def test_bitmatrix_rejects_overflow_bits():
    packed = np.array([[0xFFFFFFFF]], dtype=np.uint32)
    with pytest.raises(ValueError):
        BitMatrix.from_packed(packed, m_bits=16)


def test_positions_csr_roundtrip(rng):
    n, m = 9, 300
    dense = (rng.random((n, m)) < 0.1).astype(np.uint8)
    bm = BitMatrix.from_dense(dense)
    indptr, indices = bm.positions_csr()
    assert indptr[-1] == dense.sum()
    for i in range(n):
        row = indices[indptr[i] : indptr[i + 1]]
        np.testing.assert_array_equal(row, np.nonzero(dense[i])[0])
        assert np.all(np.diff(row) > 0)  # sorted, unique


def test_padding_preserves_counts(rng):
    from stormtpu.oracle import oracle_count_matrix

    dense = (rng.random((5, 70)) < 0.4).astype(np.uint8)
    packed = pack_bits(dense)
    base = oracle_count_matrix(packed)
    padded = pad_words(pad_rows(packed, 8), 128)
    full = oracle_count_matrix(padded)
    np.testing.assert_array_equal(full[:5, :5], base)
    assert full[5:].sum() == 0 and full[:, 5:].sum() == 0


def test_block_summary():
    n, m = 2, 65536 * 2 + 100
    dense = np.zeros((n, m), dtype=np.uint8)
    dense[0, 0] = 1
    dense[0, 65536 * 2 + 50] = 1
    dense[1, 65536] = 1
    bm = BitMatrix.from_dense(dense)
    s = bm.block_summary()
    np.testing.assert_array_equal(s, [[1, 0, 1], [0, 1, 0]])


def test_density_stats(rng):
    dense = (rng.random((10, 128)) < 0.5).astype(np.uint8)
    bm = BitMatrix.from_dense(dense)
    assert bm.nnz == int(dense.sum())
    np.testing.assert_array_equal(bm.row_nnz, dense.sum(axis=1))
    assert abs(bm.density - dense.mean()) < 1e-12


def test_bitmatrix_save_load_roundtrip(tmp_path, rng):
    from stormtpu.io import load_bitmatrix, save_bitmatrix

    dense = (rng.random((9, 321)) < 0.2).astype(np.uint8)
    bm = BitMatrix.from_dense(dense)
    p = str(tmp_path / "bm.npz")
    save_bitmatrix(bm, p)
    bm2 = load_bitmatrix(p)
    assert bm2.n == bm.n and bm2.m_bits == bm.m_bits
    np.testing.assert_array_equal(bm2.packed, bm.packed)
    np.testing.assert_array_equal(bm2.row_nnz, bm.row_nnz)


def test_bitmatrix_load_rejects_future_format(tmp_path):
    p = str(tmp_path / "future.npz")
    np.savez(p, format_version=99, packed=np.zeros((1, 1), np.uint32), m_bits=32)
    from stormtpu.io import load_bitmatrix

    with pytest.raises(ValueError):
        load_bitmatrix(p)


def test_bitmatrix_builder_matches_batch_ingest():
    """BitMatrixBuilder (STORM_add analog) == batch from_positions."""
    from stormtpu import BitMatrixBuilder

    rng = np.random.default_rng(17)
    m = 5000
    b = BitMatrixBuilder(m)
    lists = []
    for i in range(20):
        pos = rng.integers(0, m, rng.integers(0, 200))
        rid = b.add_row(pos[: len(pos) // 2])
        assert rid == i
        b.add(rid, pos[len(pos) // 2 :])   # incremental adds
        b.add(rid, pos[: 5])               # duplicates are idempotent
        lists.append(pos)
    bm = b.finalize()
    assert bm.n == 20 and bm.m_bits == m
    dense = np.zeros((20, m), dtype=np.uint8)
    for i, pos in enumerate(lists):
        dense[i, pos] = 1
    np.testing.assert_array_equal(bm.to_dense(), dense)
    # builder stays usable: more rows then re-finalize
    b.add_row([0, 1, m - 1])
    bm2 = b.finalize()
    assert bm2.n == 21 and bm2.row_nnz[-1] == 3


def test_bitmatrix_builder_validation():
    from stormtpu import BitMatrixBuilder
    import pytest as _pytest

    b = BitMatrixBuilder(100)
    with _pytest.raises(ValueError):
        b.add_row([100])
    with _pytest.raises(ValueError):
        b.add(0, [1])          # no rows yet
    rid = b.add_row([])
    with _pytest.raises(ValueError):
        b.add(rid, [-1])
    assert b.finalize().nnz == 0


def test_device_cache_reuse_and_clear():
    from conftest import random_bitmatrix

    bm = random_bitmatrix(50, 1024, 0.3, seed=9)
    big = bm.device_padded(64)
    # a gather-style caller must reuse the larger cached buffer instead
    # of pinning a second full copy (HBM-OOM guard)
    assert bm.device_padded(50, reuse_larger=True) is big
    cache = bm.__dict__["_device_cache"]
    assert len([k for k in cache if k[0] == "padded"]) == 1
    # without reuse_larger an exact-size buffer is its own entry
    exact = bm.device_padded(50)
    assert exact is not big
    import numpy as np

    np.testing.assert_array_equal(np.asarray(exact)[:50], bm.packed)
    np.testing.assert_array_equal(np.asarray(big)[50:], 0)
    bm.clear_device_cache()
    assert "_device_cache" not in bm.__dict__
