"""Exact aggregate statistics over the pair-count matrix WITHOUT
materializing it.

The reference's workloads (LD / co-occurrence scans, SURVEY.md §1) often
want marginals and distributions of C = XXᵀ rather than C itself — and at
the scales this engine targets (N ≥ 10⁵, C is 40 GB–4 TB) the matrix can
never be fetched over the ~0.15 GB/s relay D2H anyway. Two exact
aggregates:

- :func:`count_row_sums` — row marginals of C via the identity
  ``Σ_j popcount(xᵢ ∧ xⱼ) = Σ_k x[i,k] · colcount_k`` (C·1 = X·(Xᵀ·1)):
  O(N·M) work instead of the pairwise O(N²·M). Density-aware evaluation:
  at genotype sparsity an O(nnz) int64 segment-sum over the CSR
  positions view; above a positions-memory budget a chunked bit-plane
  walk over the PACKED words (never materializes positions or the dense
  matrix — peak extra RSS is one row chunk plus ⌈log₂ range(colcount)⌉
  packed plane masks, so the primary 100k×1M d≈0.5 shape runs in a few
  hundred MB instead of the ~600 GB the CSR view would need). Exact in
  both regimes.
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
from stormtpu.layout import pack_bits
from stormtpu.setops import column_counts
from stormtpu.utils import round_up

__all__ = ["count_row_sums", "count_histogram"]


#: CSR positions cost ≈12 bytes/nnz (int32 indices + int64 cumsum); above
#: this budget the packed bit-plane route takes over. 256 MB ⇒ crossover at
#: ~21 M set bits — every genotype-sparsity config stays on the O(nnz) path,
#: dense panels never allocate positions.
_POSITIONS_BUDGET_BYTES = 256 << 20


def _column_counts_host(bm, chunk_rows: int = 2048) -> np.ndarray:
    """Host column counts via chunked unpack+sum — used when shipping
    the packed panel to the device costs more than reducing it here
    (through the measured ~39 MB/s relay H2D, the 12.5 GB spec panel is
    ~5 min of upload for an O(M) result; this host pass is ~2 min and
    keeps count_row_sums' host route genuinely device-free)."""
    acc = np.zeros(bm.n_words * 32, dtype=np.int64)
    for r0 in range(0, bm.n, chunk_rows):
        chunk = np.unpackbits(
            np.ascontiguousarray(bm.packed[r0 : r0 + chunk_rows])
            .view(np.uint8),
            axis=1, bitorder="little",
        )
        acc += chunk.sum(axis=0, dtype=np.int64)
    return acc[: bm.m_bits].astype(np.int32)


def _column_counts_route(bm) -> np.ndarray:
    """Device column counts while the upload is cheap; host reduction
    when the fitted H2D rate says shipping the operand would dominate
    (relay-tunneled chips). Both exact; tested identical."""
    from stormtpu.utils.backend import is_tpu_backend

    if is_tpu_backend() and bm.packed.nbytes > (1 << 30):
        from stormtpu.tuning import k4_constants

        h2d = k4_constants().get("h2d_bytes_per_s") or 39e6
        if h2d < 200e6:
            return _column_counts_host(bm)
    return column_counts(bm)


def _row_sums_positions(bm, cc: np.ndarray) -> np.ndarray:
    """O(nnz) segment-sum over the CSR positions view (sparse regime)."""
    indptr, indices = bm.positions_csr()
    csum = np.zeros(indices.size + 1, dtype=np.int64)
    np.cumsum(cc[indices], out=csum[1:])
    return csum[indptr[1:]] - csum[indptr[:-1]]


def _row_sums_bitplanes(bm, cc: np.ndarray, chunk_bytes: int) -> np.ndarray:
    """Dense-regime row marginals straight off the PACKED words.

    Decompose the colcount weights bit-wise: with ``delta = cc − min(cc)``,

        Σ_k x[i,k]·cc_k  =  min(cc)·|x_i|  +  Σ_t 2ᵗ · popcount(x_i ∧ m_t)

    where ``m_t`` is the packed bitmask of bit t of ``delta`` across
    columns — a weighted reduction becomes T = bit_length(max delta)
    plain AND+popcount passes (the engine's native operation, C4/C8
    lineage per SURVEY §3). For uniform-density panels the min-offset
    keeps T near log₂ of the colcount *spread* (≈11 at 100k rows d=0.5),
    not log₂ N. Row-chunked so peak extra memory is ~2·chunk_bytes + the
    T×W planes; never touches positions or a dense unpack.
    """
    n, w = bm.packed.shape
    sums = bm.row_nnz.astype(np.int64)  # copies; becomes base·|x_i| below
    if w == 0 or n == 0 or cc.size == 0:
        return np.zeros(n, dtype=np.int64)
    base = int(cc.min())
    delta = cc - base
    t_planes = int(delta.max()).bit_length()
    sums *= base
    if t_planes == 0:
        return sums
    shifts = np.arange(t_planes, dtype=np.int64)[:, None]
    planes = pack_bits(((delta[None, :] >> shifts) & 1).astype(np.uint8))
    rows_per_chunk = max(1, chunk_bytes // max(4 * w, 1))
    for r0 in range(0, n, rows_per_chunk):
        chunk = bm.packed[r0 : r0 + rows_per_chunk]
        acc = np.zeros(chunk.shape[0], dtype=np.int64)
        for t in range(t_planes):
            acc += (
                np.bitwise_count(chunk & planes[t]).sum(axis=1, dtype=np.int64)
                << t
            )
        sums[r0 : r0 + chunk.shape[0]] += acc
    return sums


def count_row_sums(
    x: MatrixLike,
    *,
    include_self: bool = True,
    positions_budget_bytes: int = _POSITIONS_BUDGET_BYTES,
    chunk_bytes: int = 128 << 20,
) -> np.ndarray:
    """Exact row sums of the pair-count matrix, int64 [N]:
    ``out[i] = Σ_j popcount(x_i ∧ x_j)`` over all j (``include_self=False``
    drops the j=i term, i.e. row i's own cardinality).

    Identity: since x ∈ {0,1}, ``Σ_j popcount(x_i ∧ x_j)
    = Σ_k x[i,k] · colcount_k`` where ``colcount = column_counts(x)`` —
    the row marginal of C never needs a pairwise walk. Route by density:
    while the CSR positions view fits ``positions_budget_bytes``
    (≈12 bytes/nnz) it is an O(nnz) gather+cumsum; denser panels use the
    chunked packed bit-plane walk (:func:`_row_sums_bitplanes`), whose
    extra RSS is bounded by ``chunk_bytes``-sized temporaries regardless
    of nnz. Values bounded by N·M < 2⁶³. Exact in both regimes (tested
    identical in tests/test_stats.py).
    """
    bm = _as_bitmatrix(x)
    cc = _column_counts_route(bm).astype(np.int64)
    nnz = int(bm.row_nnz.astype(np.int64).sum())
    if 12 * nnz <= positions_budget_bytes:
        sums = _row_sums_positions(bm, cc)
    else:
        sums = _row_sums_bitplanes(bm, cc, chunk_bytes)
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
    method: str = "auto",
    progress: Optional[Callable[[int, int], None]] = None,
) -> dict:
    """Exact histogram of the off-diagonal pair counts C[i<j], routed by
    density through the SAME kernel-resolution policy as the streaming
    count walk (r5 — VERDICT r4 #1/#5; the sink used to be dense-only):

    - ultra-sparse (K4 regime): host COO-stripe binning with zero-pair
      mass credited to bin 0 (:func:`stream_hist_sparse`) — tens of
      seconds instead of the dense walk's hours at the 131k×1M shape;
    - block-clustered (K5 regime): per-stripe summary-AND work lists
      bin only visited tiles (:func:`stream_hist_clustered`);
    - dense, operand above the device budget: operand-streaming stripe
      walk, two superblock slices resident (:func:`stream_hist_streamed`)
      — never OOMs HBM, host RAM is the bound like the count driver;
    - dense, fits on device: the single-shot stripe walk on the cached
      padded operand (``stream.stream_count_histogram``), guarded by
      ``require_device_budget``.

    ``method``: "auto" (density dispatch), or force "dense" /
    "streamed" / "sparse" / "clustered".

    Returns the manifest: ``hist`` int64 [n_bins], ``bin_edges`` (bin b
    counts pairs with ``edges[b] <= C[ij] < edges[b+1]``; the last bin
    absorbs the tail up to m_bits), plus shape/route metadata. Mass
    conservation (``hist.sum() == n*(n-1)/2``) is asserted inside.
    """
    import jax.numpy as jnp

    from stormtpu import stream_hist
    from stormtpu.stream import (
        _device_operand_budget,
        _resolve_stream_kernel,
        cap_hist_superblock,
        require_device_budget,
        stream_count_histogram,
    )
    from stormtpu.utils import pallas_interpret_default

    bm = _as_bitmatrix(x)
    if bm.n < 2:
        raise ValueError("count_histogram needs N >= 2 rows")
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    if bin_width is not None and bin_width < 1:
        # a zero width would floor-divide to bin 0 for every pair, which
        # mass conservation cannot catch — reject up front on EVERY route
        raise ValueError("bin_width must be >= 1")
    if method not in ("auto", "dense", "streamed", "sparse", "clustered"):
        raise ValueError(
            f"method must be one of 'auto', 'dense', 'streamed', "
            f"'sparse', 'clustered'; got {method!r}"
        )
    cfg = config or default_config()
    if interpret is None:
        interpret = pallas_interpret_default()

    route = method
    if method == "auto":
        kern = _resolve_stream_kernel(bm, "auto", cfg)
        route = {"sparse_outer": "sparse", "clustered": "clustered"}.get(
            kern, "dense"
        )
    if route == "sparse":
        return stream_hist.stream_hist_sparse(
            bm, n_bins=n_bins, bin_width=bin_width,
            superblock_rows=superblock_rows, config=cfg,
            interpret=bool(interpret), progress=progress,
        )
    if route == "clustered":
        man = stream_hist.stream_hist_clustered(
            bm, n_bins=n_bins, bin_width=bin_width,
            superblock_rows=superblock_rows, config=cfg,
            interpret=bool(interpret), progress=progress,
        )
        if man is not None:
            return man
        route = "dense"  # single K-group: nothing to skip

    tile_rows = min(cfg.k2_tile_rows, round_up(max(bm.n, 32), 32))
    # same int32 cap the walk applies — occupancy must be computed at
    # the walk's post-cap superblock size or the shapes disagree
    sb = cap_hist_superblock(
        round_up(min(superblock_rows, round_up(bm.n, tile_rows)),
                 tile_rows),
        tile_rows,
    )
    n_pad = round_up(bm.n, sb)
    w_pad = round_up(bm.n_words, cfg.k2_tile_words)
    need = n_pad * w_pad * 4
    if route == "streamed" or need > _device_operand_budget():
        return stream_hist.stream_hist_streamed(
            bm, n_bins=n_bins, bin_width=bin_width, superblock_rows=sb,
            config=cfg, interpret=bool(interpret), progress=progress,
        )
    require_device_budget(
        need, "count_histogram device operand",
        "this should have auto-routed to the operand-streaming walk — "
        "lower STORMTPU_DEVICE_OPERAND_BUDGET_BYTES or pass "
        "method='streamed'",
    )

    def build():
        xp = np.zeros((n_pad, w_pad), dtype=np.uint32)
        xp[: bm.n, : bm.n_words] = bm.packed
        return jnp.asarray(xp)

    xd = bm.device_cached(("padded2d", n_pad, w_pad), build)
    # C8 skip for the histogram sink (r4): co-empty stripes bin to 0
    # host-side with zero device work (see stream_count_histogram)
    from stormtpu.stream_query import _superblock_occupancy

    occ = _superblock_occupancy(bm, n_pad, sb)
    return stream_count_histogram(
        xd,
        bm.n,
        bm.m_bits,
        n_bins=n_bins,
        bin_width=bin_width,
        superblock_rows=sb,
        config=cfg,
        interpret=interpret,
        occupancy=occ,
        progress=progress,
    )
