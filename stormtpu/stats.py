"""Exact aggregate statistics over the pair-count matrix WITHOUT
materializing it.

The reference's workloads (LD / co-occurrence scans, SURVEY.md §1) often
want marginals and distributions of C = XXᵀ rather than C itself — and at
the scales this engine targets (N ≥ 10⁵, C is 40 GB–4 TB) the matrix can
never be fetched over the ~0.15 GB/s relay D2H anyway. Two exact
aggregates:

- :func:`count_row_sums` — row marginals of C via the identity
  ``Σ_j popcount(xᵢ ∧ xⱼ) = Σ_k x[i,k] · colcount_k`` (C·1 = X·(Xᵀ·1)):
  O(N·M) work instead of the pairwise O(N²·M), evaluated as an O(nnz)
  int64 segment-sum over the CSR positions view — no device pass beyond
  the existing :func:`stormtpu.setops.column_counts` reduction. Exact.
- :func:`count_histogram` — the distribution of off-diagonal pair counts,
  delegating to :func:`stormtpu.stream.stream_count_histogram`'s stripe
  walk (per-stripe masked bin reduce on device; D2H is n_bins ints per
  stripe). Exact integer binning with asserted mass conservation.

Both are supersets of the reference surface (its bench prints per-run
count tables; it has no marginal/distribution API) — SURVEY §3's
"bit-algebra siblings" row is the nearest lineage.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from stormtpu.api import MatrixLike, _as_bitmatrix
from stormtpu.config import EngineConfig, default_config
from stormtpu.setops import column_counts
from stormtpu.utils import round_up

__all__ = ["count_row_sums", "count_histogram"]


def count_row_sums(
    x: MatrixLike,
    *,
    include_self: bool = True,
) -> np.ndarray:
    """Exact row sums of the pair-count matrix, int64 [N]:
    ``out[i] = Σ_j popcount(x_i ∧ x_j)`` over all j (``include_self=False``
    drops the j=i term, i.e. row i's own cardinality).

    Identity: since x ∈ {0,1}, ``Σ_j popcount(x_i ∧ x_j)
    = Σ_k x[i,k] · colcount_k`` where ``colcount = column_counts(x)`` —
    the row marginal of C costs one positional-popcount pass plus an
    O(nnz) gather, never a pairwise walk. Values bounded by N·M < 2⁶³.
    """
    bm = _as_bitmatrix(x)
    cc = column_counts(bm).astype(np.int64)
    indptr, indices = bm.positions_csr()
    csum = np.zeros(indices.size + 1, dtype=np.int64)
    np.cumsum(cc[indices], out=csum[1:])
    sums = csum[indptr[1:]] - csum[indptr[:-1]]
    if not include_self:
        sums = sums - bm.row_nnz.astype(np.int64)
    return sums


def count_histogram(
    x: MatrixLike,
    *,
    n_bins: int = 64,
    bin_width: Optional[int] = None,
    superblock_rows: int = 4096,
    config: Optional[EngineConfig] = None,
    interpret: Optional[bool] = None,
    progress: Optional[Callable[[int, int], None]] = None,
) -> dict:
    """Exact histogram of the off-diagonal pair counts C[i<j] for a
    matrix that fits on device — pads the packed matrix once (cached on
    the BitMatrix like the query layer's ``padded2d`` operands) and runs
    :func:`stormtpu.stream.stream_count_histogram`'s stripe walk.

    Returns its manifest: ``hist`` int64 [n_bins], ``bin_edges`` (bin b
    counts pairs with ``edges[b] <= C[ij] < edges[b+1]``; the last bin
    absorbs the tail up to m_bits), plus shape/walk metadata. Mass
    conservation (``hist.sum() == n*(n-1)/2``) is asserted inside.
    """
    import jax.numpy as jnp

    from stormtpu.stream import stream_count_histogram

    bm = _as_bitmatrix(x)
    if bm.n < 2:
        raise ValueError("count_histogram needs N >= 2 rows")
    cfg = config or default_config()
    tile_rows = min(cfg.k2_tile_rows, round_up(max(bm.n, 32), 32))
    sb = round_up(min(superblock_rows, round_up(bm.n, tile_rows)), tile_rows)
    n_pad = round_up(bm.n, sb)
    w_pad = round_up(bm.n_words, cfg.k2_tile_words)

    def build():
        xp = np.zeros((n_pad, w_pad), dtype=np.uint32)
        xp[: bm.n, : bm.n_words] = bm.packed
        return jnp.asarray(xp)

    xd = bm.device_cached(("padded2d", n_pad, w_pad), build)
    return stream_count_histogram(
        xd,
        bm.n,
        bm.m_bits,
        n_bins=n_bins,
        bin_width=bin_width,
        superblock_rows=sb,
        config=cfg,
        interpret=interpret,
        progress=progress,
    )
