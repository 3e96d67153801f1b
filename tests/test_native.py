"""Native C++ ingest library: built availability, exact agreement with the
NumPy fallback on every entry point (the fallback is itself oracle-tested
via test_layout.py)."""

import numpy as np
import pytest

import stormtpu.native as native
from stormtpu import layout


pytestmark = pytest.mark.skipif(
    not native.have_native(), reason="native library not built"
)


def _numpy_pack_bits(dense):
    """Pure-NumPy packing, bypassing the native fast path."""
    n, m = dense.shape
    w = layout.words_for_bits(m)
    padded = -(-m // 32) * 32
    buf = np.zeros((n, padded), dtype=np.uint8)
    buf[:, :m] = dense
    return np.packbits(buf, axis=1, bitorder="little").reshape(n, w, 4).view("<u4").reshape(n, w)


def test_pack_bits_matches_numpy(rng):
    for m in (1, 31, 32, 33, 100, 1000):
        dense = (rng.random((5, m)) < 0.4).astype(np.uint8)
        got = native.pack_bits_native(dense, layout.words_for_bits(m))
        np.testing.assert_array_equal(got, _numpy_pack_bits(dense))


def test_pack_positions_matches_numpy(rng):
    n, m = 11, 999
    dense = (rng.random((n, m)) < 0.05).astype(np.uint8)
    rows, cols = np.nonzero(dense)
    w = layout.words_for_bits(m)
    got = native.pack_positions_native(
        rows.astype(np.int64), cols.astype(np.int64), n, m, w
    )
    np.testing.assert_array_equal(got, _numpy_pack_bits(dense))


def test_pack_positions_native_bounds():
    with pytest.raises(ValueError):
        native.pack_positions_native(
            np.array([0], np.int64), np.array([99], np.int64), 1, 64, 2
        )


def test_unpack_roundtrip(rng):
    dense = (rng.random((7, 333)) < 0.5).astype(np.uint8)
    packed = _numpy_pack_bits(dense)
    got = native.unpack_bits_native(packed, 333)
    np.testing.assert_array_equal(got, dense)


def test_row_popcounts(rng):
    dense = (rng.random((9, 500)) < 0.3).astype(np.uint8)
    packed = _numpy_pack_bits(dense)
    got = native.row_popcounts_native(packed)
    np.testing.assert_array_equal(got, dense.sum(axis=1))


def test_positions_csr(rng):
    dense = (rng.random((6, 200)) < 0.2).astype(np.uint8)
    packed = _numpy_pack_bits(dense)
    indptr, indices = native.positions_csr_native(packed, 200)
    assert indptr[-1] == dense.sum()
    for i in range(6):
        np.testing.assert_array_equal(
            indices[indptr[i] : indptr[i + 1]], np.nonzero(dense[i])[0]
        )


def test_native_pair_count(rng):
    a = rng.integers(0, 2**32, 1000, dtype=np.uint32)
    b = rng.integers(0, 2**32, 1000, dtype=np.uint32)
    got = native.pair_count_native(a, b)
    assert got == int(np.bitwise_count(a & b).sum())
