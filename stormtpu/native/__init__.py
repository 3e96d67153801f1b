"""ctypes bindings for the native host-ingest library.

Loads ``libstormtpu_native.so`` (built with ``make -C stormtpu/native`` or
automatically on first import when a compiler is available). Every entry
point has a NumPy fallback with identical semantics, so the package works
unbuilt; ``HAVE_NATIVE`` reports which tier is active. The layout layer
(stormtpu.layout) routes through here.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libstormtpu_native.so")

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _try_build() -> None:
    try:
        subprocess.run(
            ["make", "-C", _DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        pass


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    i64 = ctypes.c_int64
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    p_u32 = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    lib.stpu_pack_positions.restype = ctypes.c_int
    lib.stpu_pack_positions.argtypes = [p_i64, p_i64, i64, p_u32, i64, i64, i64]
    lib.stpu_pack_bits.restype = None
    lib.stpu_pack_bits.argtypes = [p_u8, i64, i64, p_u32, i64]
    lib.stpu_unpack_bits.restype = None
    lib.stpu_unpack_bits.argtypes = [p_u32, i64, i64, p_u8, i64]
    lib.stpu_row_popcounts.restype = None
    lib.stpu_row_popcounts.argtypes = [p_u32, i64, i64, p_i64]
    lib.stpu_positions_csr.restype = None
    lib.stpu_positions_csr.argtypes = [p_u32, i64, i64, i64, p_i64, ctypes.c_void_p]
    lib.stpu_pair_count.restype = i64
    lib.stpu_pair_count.argtypes = [p_u32, p_u32, i64]
    lib.stpu_sparse_outer_from_packed.restype = ctypes.c_int
    lib.stpu_sparse_outer_from_packed.argtypes = [p_u32, i64, i64, i64, p_i32]
    lib.stpu_mirror_upper.restype = None
    lib.stpu_mirror_upper.argtypes = [p_i32, i64]
    lib.stpu_sparse_outer_runs.restype = None
    lib.stpu_sparse_outer_runs.argtypes = [p_i64, p_i32, i64, i64, p_i32]
    lib.stpu_sparse_outer_runs_cross.restype = None
    lib.stpu_sparse_outer_runs_cross.argtypes = [
        p_i64, p_i32, i64, p_i64, p_i32, i64, i64, p_i32,
    ]
    return lib


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    if not os.path.exists(_SO):
        _try_build()
    if not os.path.exists(_SO):
        _load_failed = True
        return None
    for attempt in (0, 1):
        try:
            _lib = _bind(ctypes.CDLL(_SO))
            return _lib
        except OSError:
            break
        except AttributeError:
            # stale .so from an older checkout is missing new symbols —
            # rebuild once, then give up (permanently: the failure is
            # cached so callers don't re-run delete+make per call)
            if attempt == 0:
                try:
                    os.remove(_SO)
                except OSError:
                    break
                _try_build()
                if not os.path.exists(_SO):
                    break
            else:
                break
    _load_failed = True
    return None


def have_native() -> bool:
    return _load() is not None


# --------------------------------------------------------------------- ops
def pack_positions_native(
    rows: np.ndarray, pos: np.ndarray, n: int, m_bits: int, w: int
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    pos = np.ascontiguousarray(pos, dtype=np.int64)
    out = np.zeros((n, w), dtype=np.uint32)
    rc = lib.stpu_pack_positions(rows, pos, rows.size, out, n, m_bits, w)
    if rc != 0:
        raise ValueError("position or row id out of range")
    return out


def pack_bits_native(dense: np.ndarray, w: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    dense = np.ascontiguousarray(dense, dtype=np.uint8)
    n, m = dense.shape
    out = np.zeros((n, w), dtype=np.uint32)
    lib.stpu_pack_bits(dense, n, m, out, w)
    return out


def unpack_bits_native(packed: np.ndarray, m_bits: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed, dtype=np.uint32)
    n, w = packed.shape
    out = np.empty((n, m_bits), dtype=np.uint8)
    lib.stpu_unpack_bits(packed, n, w, out, m_bits)
    return out


def row_popcounts_native(packed: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed, dtype=np.uint32)
    n, w = packed.shape
    out = np.empty(n, dtype=np.int64)
    lib.stpu_row_popcounts(packed, n, w, out)
    return out


def positions_csr_native(
    packed: np.ndarray, m_bits: int
) -> Optional[tuple[np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed, dtype=np.uint32)
    n, w = packed.shape
    indptr = np.zeros(n + 1, dtype=np.int64)
    lib.stpu_positions_csr(packed, n, w, m_bits, indptr, None)
    indices = np.empty(int(indptr[-1]), dtype=np.int32)
    lib.stpu_positions_csr(
        packed, n, w, m_bits, indptr,
        indices.ctypes.data_as(ctypes.c_void_p),
    )
    return indptr, indices


def sparse_outer_from_packed_native(
    packed: np.ndarray, m_bits: int
) -> Optional[np.ndarray]:
    """K4 straight from packed words (no CSR materialization)."""
    lib = _load()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed, dtype=np.uint32)
    n, w = packed.shape
    out = np.zeros((n, n), dtype=np.int32)
    rc = lib.stpu_sparse_outer_from_packed(packed, n, w, m_bits, out)
    if rc != 0:
        raise ValueError("set bits beyond m_bits")
    return out


def sparse_outer_runs_native(
    col_ids: np.ndarray, rows: np.ndarray, n: int
) -> Optional[np.ndarray]:
    """K4 from column-sorted deduplicated COO (run-walk; O(nnz + E))."""
    lib = _load()
    if lib is None:
        return None
    col_ids = np.ascontiguousarray(col_ids, dtype=np.int64)
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    out = np.zeros((n, n), dtype=np.int32)
    lib.stpu_sparse_outer_runs(col_ids, rows, col_ids.size, n, out)
    return out


def sparse_outer_runs_cross_native(
    cols_a: np.ndarray, rows_a: np.ndarray,
    cols_b: np.ndarray, rows_b: np.ndarray,
    na: int, nb: int,
) -> Optional[np.ndarray]:
    """K4 cross-stripe counts [na, nb] from two column-sorted local-row
    COO lists (the per-superblock streaming form; stripe-local buffers)."""
    lib = _load()
    if lib is None:
        return None
    cols_a = np.ascontiguousarray(cols_a, dtype=np.int64)
    rows_a = np.ascontiguousarray(rows_a, dtype=np.int32)
    cols_b = np.ascontiguousarray(cols_b, dtype=np.int64)
    rows_b = np.ascontiguousarray(rows_b, dtype=np.int32)
    out = np.zeros((na, nb), dtype=np.int32)
    lib.stpu_sparse_outer_runs_cross(
        cols_a, rows_a, cols_a.size, cols_b, rows_b, cols_b.size, nb, out,
    )
    return out


def mirror_upper_native(c: np.ndarray) -> bool:
    """In-place blocked mirror of the strict upper triangle; False when
    the library is unbuilt (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return False
    assert c.dtype == np.int32 and c.flags.c_contiguous
    lib.stpu_mirror_upper(c, c.shape[0])
    return True


def pair_count_native(a: np.ndarray, b: np.ndarray) -> Optional[int]:
    lib = _load()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, dtype=np.uint32)
    b = np.ascontiguousarray(b, dtype=np.uint32)
    return int(lib.stpu_pair_count(a, b, a.size))


HAVE_NATIVE = have_native()
