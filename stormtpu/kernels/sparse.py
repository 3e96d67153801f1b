"""K3 — scattered-position (sparse) path.

Replaces the reference's sorted-uint16 SIMD list-intersection kernels
(SURVEY.md §3 C12 ``STORM_intersect_vector16_cardinality`` — the
``pcmpestrm``-style all-vs-all compare — and C13's list×bitmap bit-test
loop). TPU redesign: scattered per-element compares fight the hardware, so
the pair primitive is a **vectorized sorted-membership test** — for each
position in row i's sorted list, binary-search row j's sorted list
(``searchsorted``) — batched over row-pair blocks with ``vmap`` and swept
with ``lax.map``. Cost per pair is O(L·log L) with L = max row nnz, vs
O(M/32) words for the dense paths.

Honest crossovers (SURVEY.md §7 "Sparse on TPU", measured on v5e —
BASELINE.md "Sparse-path crossover"): K3 below loses to the MXU dense
path at EVERY density on TPU (it remains the CPU auto-choice and the
capability-parity form of the reference's list kernels); the sparse path
that wins at extreme sparsity is K4 (``count_matrix_sparse_outer``), an
inverted-index outer-product SpGEMM on the HOST NATIVE tier — pair
emission is scatter-shaped and the TPU cannot scatter. All paths are
exact; D1's dispatch picks by a fitted cost model.

Layout: position lists are padded to a common length L (multiple of 128)
with sentinel ``m_bits`` (no valid position equals it); rows stay sorted so
padding sits at the tail.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stormtpu.config import EngineConfig
from stormtpu.layout import BitMatrix
from stormtpu.utils import round_up

__all__ = [
    "padded_position_lists",
    "count_block_sparse",
    "count_matrix_sparse",
    "count_matrix_sparse_outer",
]


def padded_position_lists(bm: BitMatrix, pad_mult: int = 128) -> np.ndarray:
    """int32 [N, L] sorted positions per row, tail-padded with m_bits."""
    indptr, indices = bm.positions_csr()
    lmax = int((indptr[1:] - indptr[:-1]).max(initial=0))
    l_pad = round_up(max(lmax, 1), pad_mult)
    out = np.full((bm.n, l_pad), bm.m_bits, dtype=np.int32)
    for i in range(bm.n):
        row = indices[indptr[i] : indptr[i + 1]]
        out[i, : row.size] = row
    return out


def _pair_intersect_sorted(pa: jax.Array, pb: jax.Array, sentinel: int) -> jax.Array:
    """|pa ∩ pb| for sorted padded int32 lists (sentinel-tailed).

    ``method="sort"`` is deliberate: the default binary-search ("scan")
    lowering faults the TPU runtime at vmapped batch × list sizes the
    sparse config actually uses (verified on v5e: worker crash at
    [256, 8064] all-pairs), while the sort-based lowering is a plain
    vectorized sort+gather that runs everywhere and is exactness-tested.
    """
    idx = jnp.searchsorted(pb, pa, method="sort")
    idx = jnp.clip(idx, 0, pb.shape[0] - 1)
    hit = (pb[idx] == pa) & (pa != sentinel)
    return jnp.sum(hit.astype(jnp.int32), dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("sentinel", "block_rows"))
def count_block_sparse(
    pos_a: jax.Array,
    pos_b: jax.Array,
    *,
    sentinel: int,
    block_rows: int = 8,
) -> jax.Array:
    """Cross counts int32 [Na, Nb] from padded sorted position lists.

    Blocks rows of A through ``lax.map`` to bound the [block, Nb, L]
    membership intermediate.
    """
    na, l = pos_a.shape
    na_pad = round_up(na, block_rows)
    pa = jnp.full((na_pad, l), sentinel, dtype=pos_a.dtype).at[:na].set(pos_a)
    blocks = pa.reshape(na_pad // block_rows, block_rows, l)

    pair = functools.partial(_pair_intersect_sorted, sentinel=sentinel)
    one_vs_all = jax.vmap(pair, in_axes=(None, 0))      # row a × all b
    block_vs_all = jax.vmap(one_vs_all, in_axes=(0, None))  # block × all b

    out = jax.lax.map(lambda blk: block_vs_all(blk, pos_b), blocks)
    return out.reshape(na_pad, -1)[:na]


def count_matrix_sparse(
    bm: BitMatrix,
    *,
    config: Optional[EngineConfig] = None,
) -> np.ndarray:
    """Full N×N exact counts via the positions path (config BASELINE.json:9)."""
    del config  # block size is shape-derived; kept for dispatch symmetry
    pos = jnp.asarray(padded_position_lists(bm))
    out = count_block_sparse(pos, pos, sentinel=bm.m_bits)
    return np.asarray(out)


# ---------------------------------------------------------------------------
# K4 — inverted-index "outer product" sparse all-pairs (SpGEMM shape)
# ---------------------------------------------------------------------------

def count_matrix_sparse_outer(
    bm: BitMatrix,
    *,
    config: Optional[EngineConfig] = None,
    max_col_occupancy_factor: float = 8.0,
) -> np.ndarray:
    """Full N×N exact counts via the inverted index (K4).

    The column-wise/outer-product SpGEMM formulation (cf. SpArch /
    FlashSparse, PAPERS.md): counting-sort positions by column, then for
    each occupied column emit every ordered row pair — work is
    O(nnz + M + E) with E = Σ_c occupancy² ≈ N²·M·density², versus the
    dense path's density-independent N²·M MACs.

    This is HOST-tier compute by design: pair emission is scatter-shaped,
    and the TPU cannot scatter (measured ~2·10⁵ scatter-adds/s on v5e vs
    ~10⁹/s for the C++ loop) — the chip keeps the MXU work, the native
    tier keeps the pointer-chasing, exactly the split the reference's
    all-C design never had to make. Falls back to a vectorized NumPy
    emission when the native library is unbuilt (that fallback pads
    per-column row lists and refuses pathologically clustered columns;
    the native path has no such restriction).
    """
    del config
    n = bm.n
    if n > 32768:
        raise ValueError(
            f"K4's N²-int32 count buffer is impractical at n={n} "
            f"(> 4 GB); use a dense or streaming strategy"
        )
    if n < 2:
        out = np.zeros((n, n), dtype=np.int32)
        if n == 1:
            out[0, 0] = int(bm.row_nnz[0])
        return out

    from stormtpu.native import sparse_outer_from_packed_native

    def _mirror(upper: np.ndarray) -> np.ndarray:
        # native fills diagonal (= row nnz) + strict upper; mirror lower.
        # Only reachable right after a successful native call, so the
        # library is loaded by construction.
        from stormtpu.native import mirror_upper_native

        if not mirror_upper_native(upper):  # pragma: no cover
            raise RuntimeError("native mirror unavailable after native counts")
        return upper

    if bm.coo is not None:
        # Ingest-time COO available: one np.unique over col-major keys
        # deduplicates (packing ORs duplicates), sorts by column, AND
        # orders rows ascending within each column — exactly what the
        # native run-walk needs. O(nnz log nnz + E); no O(N·W) packed
        # scan and no O(M) column arrays (at ultra-sparsity those scans
        # ARE the cost).
        from stormtpu.native import sparse_outer_runs_native

        rows_c, cols_c = bm.coo
        keys = cols_c * np.int64(n) + rows_c  # col-major, rows ascend
        keys_u = np.unique(keys)
        col_ids = keys_u // n
        rows_u = (keys_u % n).astype(np.int32)
        upper = sparse_outer_runs_native(col_ids, rows_u, n)
        if upper is not None:
            return _mirror(upper)

    upper = sparse_outer_from_packed_native(bm.packed, bm.m_bits)
    if upper is not None:
        return _mirror(upper)

    # NumPy fallback (library unbuilt): pad per-column row lists, emit,
    # np.add.at. Prefer the COO cache — positions_csr's own NumPy
    # fallback densifies the matrix (O(N·M) bytes, hopeless at large M).
    if bm.coo is not None:
        rows_c, cols_c = bm.coo
        keys_u = np.unique(cols_c * np.int64(n) + rows_c)
        cols_s = (keys_u // n).astype(np.int64)
        rows_s = (keys_u % n).astype(np.int32)
        nnz = keys_u.size
    else:
        if bm.m_bits > 1 << 22:
            raise ValueError(
                "K4 NumPy fallback without a COO cache would densify the "
                f"matrix to extract positions (N×{bm.m_bits} bytes) — "
                "build stormtpu/native or use a dense strategy"
            )
        indptr, indices = bm.positions_csr()
        nnz = int(indptr[-1])
        rows = np.repeat(np.arange(n, dtype=np.int32), np.diff(indptr))
        order = np.argsort(indices, kind="stable")
        cols_s = indices[order]
        rows_s = rows[order]
    if nnz == 0:
        return np.zeros((n, n), dtype=np.int32)
    col_starts = np.flatnonzero(np.r_[True, cols_s[1:] != cols_s[:-1]])
    col_counts = np.diff(np.r_[col_starts, nnz])
    rmax = int(col_counts.max())
    mean_occ = nnz / len(col_starts)
    if rmax > max(8.0, max_col_occupancy_factor * mean_occ):
        raise ValueError(
            f"clustered column occupancy (max {rmax} vs mean {mean_occ:.1f}) "
            f"would pad the fallback emission matrix {rmax / mean_occ:.0f}× "
            f"— build stormtpu/native or use a dense strategy"
        )
    if len(col_starts) * rmax * rmax > 1 << 28:
        raise ValueError(
            f"fallback emission matrix would be "
            f"{len(col_starts) * rmax * rmax * 8 / 2**30:.1f} GiB — build "
            f"stormtpu/native or use a dense strategy"
        )
    colrows = np.full((len(col_starts), rmax), n, dtype=np.int32)
    offsets = np.arange(nnz) - np.repeat(col_starts, col_counts)
    colrows[np.repeat(np.arange(len(col_starts)), col_counts), offsets] = rows_s
    ii = colrows[:, :, None]
    jj = colrows[:, None, :]
    valid = (ii < jj) & (jj < n)
    keys = np.where(valid, ii.astype(np.int64) * n + jj, n * n).ravel()
    buf = np.zeros(n * n + 1, dtype=np.int32)
    np.add.at(buf, keys, 1)
    upper = buf[: n * n].reshape(n, n)
    out = upper + upper.T
    out[np.arange(n), np.arange(n)] = bm.row_nnz.astype(np.int32)
    return out
