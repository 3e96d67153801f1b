"""Bit-matrix layout: packing, containers, density statistics.

TPU-native redesign of the reference container layer (SURVEY.md §3
C7–C10: ``STORM_bitmap_t`` / ``STORM_bitmap_cont_t`` / ``STORM_t`` /
``STORM_contiguous_t``). The reference keeps per-2¹⁶-bit-block hybrid
containers (bitmap OR sorted uint16 position list) chosen by a cardinality
threshold at build time; per-tile representation polymorphism is hostile to
XLA, so here the **primary representation is the contiguous packed matrix**
``uint32[N, W]`` (the analog of ``STORM_contiguous_t``, the reference's own
fast path), with:

- a *global* density statistic per matrix (and per-row nnz) computed at
  ingest — the dispatch signal D1 uses instead of per-block thresholds;
- an optional CSR positions view for the sparse path K3 (analog of the
  uint16 position-list representation, widened to uint32 over the full
  universe because TPU kernels prefer one flat index space);
- a per-row block-occupancy summary bitmap (analog of the reference's
  non-empty-block summary in ``STORM_bitmap_cont_t`` C8) for tile-skip
  statistics.

Bit order: bit ``p`` of row ``i`` lives at ``packed[i, p >> 5]`` bit
``(p & 31)`` (LSB-first within a uint32 word).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

import stormtpu.native as _native
from stormtpu.config import WORD_BITS

# from_positions keeps its COO (for the K4 sparse path) only up to this
# many entries (≈512 MB of int64 pairs) — above it the cache would pin
# more host memory than it saves.
_COO_CACHE_MAX_NNZ = 1 << 25

__all__ = [
    "BitMatrixBuilder",
    "BitMatrix",
    "pack_bits",
    "unpack_bits",
    "pack_positions",
    "pad_rows",
    "pad_words",
    "words_for_bits",
]


def words_for_bits(m_bits: int) -> int:
    return -(-m_bits // WORD_BITS)


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def pack_bits(dense01: np.ndarray) -> np.ndarray:
    """Pack a {0,1} matrix [N, M] into uint32 words [N, ceil(M/32)].

    LSB-first within each word (bit p → word p>>5, bit p&31). Uses the
    native C++ ingest library when built (stormtpu/native), else NumPy.
    """
    dense01 = np.asarray(dense01)
    if dense01.ndim != 2:
        raise ValueError(f"expected 2-D {{0,1}} matrix, got shape {dense01.shape}")
    n, m = dense01.shape
    w = words_for_bits(m)
    out = _native.pack_bits_native(dense01, w)
    if out is not None:
        return out
    # np.packbits packs MSB-first per byte; request little bit order then
    # view 4 bytes as one little-endian uint32 → LSB-first per word.
    padded_bits = _round_up(m, WORD_BITS)
    buf = np.zeros((n, padded_bits), dtype=np.uint8)
    buf[:, :m] = dense01.astype(np.uint8)
    bytes_ = np.packbits(buf, axis=1, bitorder="little")
    return bytes_.reshape(n, w, 4).view("<u4").reshape(n, w)


def unpack_bits(packed: np.ndarray, m_bits: int) -> np.ndarray:
    """Inverse of :func:`pack_bits` → uint8 {0,1} matrix [N, m_bits]."""
    packed = np.ascontiguousarray(np.asarray(packed, dtype=np.uint32))
    out = _native.unpack_bits_native(packed, m_bits)
    if out is not None:
        return out
    n, w = packed.shape
    bytes_ = packed.reshape(n, w, 1).view("<u1").reshape(n, w * 4)
    bits = np.unpackbits(bytes_, axis=1, bitorder="little")
    return bits[:, :m_bits]


def pack_positions(
    row_ids: np.ndarray, positions: np.ndarray, n: int, m_bits: int
) -> np.ndarray:
    """Pack COO set-bit coordinates into uint32 words [N, ceil(M/32)].

    Ingest analog of the reference's ``STORM_add`` position path (SURVEY.md
    §4.1): O(total set bits). Duplicate positions are idempotent (bitwise OR).
    """
    row_ids = np.asarray(row_ids, dtype=np.int64)
    positions = np.asarray(positions, dtype=np.int64)
    if row_ids.shape != positions.shape:
        raise ValueError("row_ids and positions must have the same shape")
    if positions.size and (positions.min() < 0 or positions.max() >= m_bits):
        raise ValueError("position out of range")
    if row_ids.size and (row_ids.min() < 0 or row_ids.max() >= n):
        raise ValueError("row id out of range")
    w = words_for_bits(m_bits)
    out = _native.pack_positions_native(row_ids, positions, n, m_bits, w)
    if out is not None:
        return out
    packed = np.zeros((n, w), dtype=np.uint32)
    np.bitwise_or.at(
        packed,
        (row_ids, positions >> 5),
        (np.uint32(1) << (positions & 31).astype(np.uint32)),
    )
    return packed


def pad_rows(packed: np.ndarray, row_mult: int) -> np.ndarray:
    """Zero-pad rows to a multiple of ``row_mult`` (zero rows ⇒ zero counts)."""
    n = packed.shape[0]
    n_pad = _round_up(max(n, 1), row_mult)
    if n_pad == n:
        return packed
    out = np.zeros((n_pad,) + packed.shape[1:], dtype=packed.dtype)
    out[:n] = packed
    return out


def pad_words(packed: np.ndarray, word_mult: int) -> np.ndarray:
    """Zero-pad the word axis to a multiple of ``word_mult`` (exactness-safe)."""
    w = packed.shape[1]
    w_pad = _round_up(max(w, 1), word_mult)
    if w_pad == w:
        return packed
    out = np.zeros(packed.shape[:1] + (w_pad,) + packed.shape[2:], dtype=packed.dtype)
    out[:, :w] = packed
    return out


@dataclasses.dataclass
class BitMatrix:
    """N bitmaps over an M-bit universe, bit-packed row-major.

    The top-level set container (analog of ``STORM_t`` + ``STORM_contiguous_t``,
    SURVEY.md §3 C9–C10) carrying the ingest-time statistics D1 dispatches on.
    """

    packed: np.ndarray        # uint32 [N, W], W = ceil(m_bits / 32)
    n: int
    m_bits: int
    row_nnz: np.ndarray       # int64 [N] set-bit count per row
    # Optional ingest-time COO cache (row_ids, positions; may contain
    # duplicates) kept by from_positions: the ultra-sparse K4 path uses it
    # to skip the O(N·W) packed scan entirely.
    coo: "Optional[tuple[np.ndarray, np.ndarray]]" = None

    # ------------------------------------------------------------------ build
    @classmethod
    def from_dense(cls, dense01: np.ndarray) -> "BitMatrix":
        dense01 = np.asarray(dense01)
        packed = pack_bits(dense01)
        return cls.from_packed(packed, m_bits=dense01.shape[1])

    @classmethod
    def from_packed(cls, packed: np.ndarray, m_bits: int) -> "BitMatrix":
        packed = np.ascontiguousarray(np.asarray(packed, dtype=np.uint32))
        n, w = packed.shape
        if w != words_for_bits(m_bits):
            raise ValueError(
                f"packed has {w} words but m_bits={m_bits} needs "
                f"{words_for_bits(m_bits)}"
            )
        tail = m_bits % WORD_BITS
        if tail and n and np.any(packed[:, -1] >> tail):
            raise ValueError("set bits beyond m_bits in final word")
        row_nnz = _native.row_popcounts_native(packed)
        if row_nnz is None:
            row_nnz = np.bitwise_count(packed).sum(axis=1, dtype=np.int64)
        return cls(packed=packed, n=n, m_bits=m_bits, row_nnz=row_nnz)

    @classmethod
    def from_positions(
        cls, row_ids: np.ndarray, positions: np.ndarray, n: int, m_bits: int
    ) -> "BitMatrix":
        bm = cls.from_packed(
            pack_positions(row_ids, positions, n, m_bits), m_bits=m_bits
        )
        # COPIES, not views: the caller may mutate its buffers afterwards
        # and the K4 path must see exactly what was packed. Capped so a
        # giant ingest doesn't pin host memory for the matrix's lifetime
        # (K4 falls back to its packed-scan form without the cache).
        if np.size(positions) <= _COO_CACHE_MAX_NNZ:
            bm.coo = (
                np.array(row_ids, dtype=np.int64, copy=True),
                np.array(positions, dtype=np.int64, copy=True),
            )
        return bm

    @classmethod
    def from_position_lists(
        cls, lists: Sequence[np.ndarray], m_bits: int
    ) -> "BitMatrix":
        n = len(lists)
        if n:
            row_ids = np.concatenate(
                [np.full(len(np.atleast_1d(l)), i, dtype=np.int64)
                 for i, l in enumerate(lists)]
            )
            positions = np.concatenate(
                [np.atleast_1d(np.asarray(l, dtype=np.int64)) for l in lists]
            ) if row_ids.size else np.zeros(0, dtype=np.int64)
        else:
            row_ids = positions = np.zeros(0, dtype=np.int64)
        return cls.from_positions(row_ids, positions, n, m_bits)

    # ------------------------------------------------------------------ views
    def to_dense(self) -> np.ndarray:
        return unpack_bits(self.packed, self.m_bits)

    def device_cached(self, key: tuple, build):
        """Cache a device buffer on this matrix under ``key`` (the
        single cache-policy point shared by :meth:`device_padded`,
        :meth:`device_nnz`, and the mesh-sharded operands in
        parallel/query.py). ``jax.default_backend()`` is appended so a
        matrix used on CPU then TPU in one process cannot serve a stale
        buffer. Cache lives outside the dataclass fields (not part of
        equality or serialization).

        Contract: a BitMatrix is treated as IMMUTABLE once built — every
        builder returns a fresh instance. If you mutate ``packed`` /
        ``row_nnz`` in place anyway, call :meth:`clear_device_cache`
        afterwards or device-path results will reflect the old data."""
        import jax

        cache = self.__dict__.setdefault("_device_cache", {})
        full_key = key + (jax.default_backend(),)
        buf = cache.get(full_key)
        if buf is None:
            buf = build()
            cache[full_key] = buf
        return buf

    def device_padded(self, n_pad: int, *, reuse_larger: bool = False):
        """Device-resident ``packed`` zero-padded to ``n_pad`` rows,
        cached per ``n_pad``. Repeated queries on one matrix re-dispatch
        on the same device buffer instead of re-uploading O(N·W) bytes
        per call — measured on the relay: a 138 MB re-upload dominated a
        0.15 s screen kernel.

        ``reuse_larger``: return any already-cached padded buffer with
        ≥ ``n_pad`` rows instead of materializing a new exact-size copy —
        for callers whose row indices are < N anyway (gathers), so a
        second full HBM copy is never pinned next to the screen's."""
        import jax
        import jax.numpy as jnp

        if n_pad < self.n:
            raise ValueError(f"n_pad={n_pad} < N={self.n}")
        if reuse_larger:
            # any row-padded buffer works for gathers (indices < N), and
            # the tile walk's word-padded "padded2d" buffers too — extra
            # zero words add 0 to every popcount
            cache = self.__dict__.get("_device_cache", {})
            backend = jax.default_backend()
            candidates = [
                k for k in cache
                if k[0] in ("padded", "padded2d") and k[-1] == backend
                and k[1] >= n_pad
            ]
            if candidates:
                return cache[min(candidates, key=lambda k: k[1])]

        def build():
            xp = np.zeros((n_pad, self.packed.shape[1]), dtype=np.uint32)
            xp[: self.n] = self.packed
            return jnp.asarray(xp)

        return self.device_cached(("padded", int(n_pad)), build)

    def device_nnz(self, n_pad: int):
        """Device-resident int32 ``row_nnz`` zero-padded to ``n_pad``
        rows, cached per ``n_pad`` (see :meth:`device_padded`)."""
        import jax.numpy as jnp

        if n_pad < self.n:
            raise ValueError(f"n_pad={n_pad} < N={self.n}")

        def build():
            nz = np.zeros(n_pad, dtype=np.int32)
            nz[: self.n] = self.row_nnz.astype(np.int32)
            return jnp.asarray(nz)

        return self.device_cached(("nnz", int(n_pad)), build)

    def clear_device_cache(self) -> None:
        """Drop cached device buffers (frees device memory; REQUIRED
        after any in-place mutation of ``packed``/``row_nnz``)."""
        self.__dict__.pop("_device_cache", None)

    def positions_csr(self) -> tuple[np.ndarray, np.ndarray]:
        """(indptr int64 [N+1], indices int32 [nnz]) sorted per row.

        The sparse-path view (analog of the reference's sorted uint16
        position lists, C7/C12 — widened to int32 over the full universe).
        """
        res = _native.positions_csr_native(self.packed, self.m_bits)
        if res is not None:
            return res
        dense = self.to_dense()
        rows, cols = np.nonzero(dense)
        indptr = np.zeros(self.n + 1, dtype=np.int64)
        np.add.at(indptr, rows + 1, 1)
        np.cumsum(indptr, out=indptr)
        return indptr, cols.astype(np.int32)

    def block_summary(self, block_bits: int = 65536) -> np.ndarray:
        """Per-row non-empty-block summary, uint8 [N, ceil(M/block_bits)].

        Analog of ``STORM_bitmap_cont_t``'s summary bitmap (C8): entry
        [i, b] is 1 iff row i has any set bit in block b. THE clustered-
        sparsity signal: dispatch derives the co-occupied work fraction
        from it (dispatch.clustered_stats) and the K5 work-list kernel
        (kernels/clustered.py) executes only summary-AND co-occupied
        (tile pair, K-group) items — the reference's per-2¹⁶-block
        summary-AND skip, lifted to MXU tile granularity.
        """
        wpb = max(1, block_bits // WORD_BITS)
        w = self.packed.shape[1]
        if w == 0:
            return np.zeros((self.n, 0), dtype=np.uint8)
        # reduceat ORs each wpb-word group in one pass (ragged tail
        # included) — no padded copy of the O(N·W) matrix
        starts = np.arange(0, w, wpb)
        grouped = np.bitwise_or.reduceat(self.packed, starts, axis=1)
        return (grouped != 0).astype(np.uint8)

    # ------------------------------------------------------------------ stats
    @property
    def nnz(self) -> int:
        return int(self.row_nnz.sum())

    @property
    def density(self) -> float:
        if self.n == 0 or self.m_bits == 0:
            return 0.0
        return self.nnz / (self.n * self.m_bits)

    @property
    def n_words(self) -> int:
        return self.packed.shape[1]

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"BitMatrix(n={self.n}, m_bits={self.m_bits}, "
            f"density={self.density:.4g})"
        )


class BitMatrixBuilder:
    """Incremental ingest — the direct analog of the reference's
    ``STORM_add`` loop (SURVEY.md §4.1): create a builder, ``add`` set-bit
    positions row by row (or append whole rows), then ``finalize()`` into
    an immutable :class:`BitMatrix`.

    Where the reference converts each 2^16-bit block between list and
    bitmap representations *during* ingest (C7), here ingest only
    accumulates coordinates; the packed layout and the global density
    statistics (which drive D1 dispatch) are produced once at finalize —
    per-block polymorphism never pays on TPU (SURVEY.md §7).

    Positions may arrive unsorted and with duplicates (idempotent OR,
    same as repeated ``STORM_add`` of one value).
    """

    def __init__(self, m_bits: int):
        if m_bits <= 0:
            raise ValueError("m_bits must be positive")
        self.m_bits = int(m_bits)
        self._rows: list[np.ndarray] = []
        self._chunks_row: list[np.ndarray] = []
        self._chunks_pos: list[np.ndarray] = []

    @property
    def n(self) -> int:
        return len(self._rows)

    def add_row(self, positions=()) -> int:
        """Append a new bitmap with the given set-bit positions; returns
        its row id (``STORM_add`` of one whole set)."""
        pos = np.atleast_1d(np.asarray(positions, dtype=np.int64)).ravel()
        if pos.size and (pos.min() < 0 or pos.max() >= self.m_bits):
            raise ValueError("position out of range")
        self._rows.append(pos)
        return len(self._rows) - 1

    def add(self, row_id: int, positions) -> None:
        """Add set-bit positions to an existing row (incremental
        ``STORM_bitmap_cont_add``)."""
        if not 0 <= row_id < len(self._rows):
            raise ValueError(f"row {row_id} does not exist (n={self.n})")
        pos = np.atleast_1d(np.asarray(positions, dtype=np.int64)).ravel()
        if pos.size and (pos.min() < 0 or pos.max() >= self.m_bits):
            raise ValueError("position out of range")
        self._chunks_row.append(np.full(pos.size, row_id, dtype=np.int64))
        self._chunks_pos.append(pos)

    def finalize(self) -> BitMatrix:
        """Pack everything accumulated so far into a BitMatrix (the
        builder stays usable — finalize again after more adds)."""
        n = len(self._rows)
        parts_r = [
            np.full(r.size, i, dtype=np.int64) for i, r in enumerate(self._rows)
        ] + self._chunks_row
        parts_p = list(self._rows) + self._chunks_pos
        if parts_p:
            row_ids = np.concatenate(parts_r) if parts_r else np.zeros(0, np.int64)
            positions = np.concatenate(parts_p)
        else:
            row_ids = positions = np.zeros(0, dtype=np.int64)
        return BitMatrix.from_positions(row_ids, positions, n, self.m_bits)
