"""Derived pairwise set-operation cardinalities and similarity measures.

The reference's kernel family (shared with the author's ``libalgebra.h``
lineage, SURVEY.md §1) exposes AND/OR/XOR/diff population counts; for
*pairwise* matrices every one of them is derivable from the intersection
engine plus per-row cardinalities — no extra device passes:

    |A ∪ B| = |A| + |B| − |A ∩ B|
    |A ⊕ B| = |A| + |B| − 2·|A ∩ B|
    |A \\ B| = |A| − |A ∩ B|

and the similarity coefficients used on genotype bitmaps (LD/co-occurrence
screens): Jaccard, Dice–Sørensen, Ochiai/cosine, overlap, plus the phi
coefficient and the LD r² statistic (phi² — the linkage-disequilibrium
measure the reference's genomics workloads feed these counts into).

So the TPU engine computes the one hard matrix (XXᵀ) with whichever kernel
D1 dispatches, and everything else is O(N²) elementwise on host/device.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from stormtpu.api import MatrixLike, _as_bitmatrix, intersect_count_matrix
from stormtpu.config import EngineConfig

__all__ = [
    "pairwise_cardinality",
    "similarity_matrix",
    "similarity_matrix_complete",
    "pairs_above_complete",
    "column_counts",
    "CARD_OPS",
    "SIM_OPS",
]

CARD_OPS = ("intersect", "union", "xor", "andnot", "nand")
SIM_OPS = ("jaccard", "dice", "cosine", "overlap", "phi", "r2")


def pairwise_cardinality(
    x: MatrixLike,
    op: str = "intersect",
    *,
    strategy: str = "auto",
    config: Optional[EngineConfig] = None,
) -> np.ndarray:
    """N×N exact pairwise cardinality matrix for a bitwise set operation.

    op: "intersect" |A∩B|, "union" |A∪B|, "xor" |A⊕B|,
        "andnot" |A\\B| (row minus column), "nand" M−|A∩B|.
    Always int64 (unions can exceed int32 only for M ≥ 2³¹, which config
    validation already excludes, but int64 keeps arithmetic headroom).
    """
    if op not in CARD_OPS:
        raise ValueError(f"unknown op {op!r}; want one of {CARD_OPS}")
    bm = _as_bitmatrix(x)
    inter = intersect_count_matrix(bm, strategy=strategy, config=config).astype(
        np.int64
    )
    card = bm.row_nnz.astype(np.int64)
    return derive_cardinality(inter, card[:, None], card[None, :],
                              bm.m_bits, op)


def derive_cardinality(inter, ca, cb, m_bits: int, op: str):
    """Exact set-op cardinality from intersection counts + row
    cardinalities (broadcastable int64 arrays) — the single home of the
    inclusion–exclusion identities, shared by the single-chip and
    distributed (parallel/setops.py) forms."""
    if op == "intersect":
        return inter
    if op == "union":
        return ca + cb - inter
    if op == "xor":
        return ca + cb - 2 * inter
    if op == "andnot":
        return ca - inter
    # nand: popcount(NOT(a AND b)) over the M-bit universe
    return np.int64(m_bits) - inter


def similarity_matrix(
    x: MatrixLike,
    measure: str = "jaccard",
    *,
    strategy: str = "auto",
    config: Optional[EngineConfig] = None,
) -> np.ndarray:
    """N×N float64 similarity from exact integer counts.

    jaccard = ∩/∪ · dice = 2∩/(|A|+|B|) · cosine = ∩/√(|A||B|) (Ochiai)
    · overlap = ∩/min(|A|,|B|) · phi = (M·∩ − |A||B|) /
    √(|A||B|(M−|A|)(M−|B|)) (the 2×2-contingency Pearson correlation over
    the M-bit universe) · r2 = phi² (the genomics LD statistic). Pairs
    where the denominator is 0 (a row empty — or, for phi/r2, full)
    yield 0.0.
    """
    if measure not in SIM_OPS:
        raise ValueError(f"unknown measure {measure!r}; want one of {SIM_OPS}")
    bm = _as_bitmatrix(x)
    inter = intersect_count_matrix(bm, strategy=strategy, config=config)
    card = bm.row_nnz
    return derive_similarity(inter, card[:, None], card[None, :],
                             bm.m_bits, measure)


def similarity_matrix_complete(
    data: MatrixLike,
    mask: MatrixLike,
    measure: str = "r2",
    *,
    strategy: str = "auto",
    config: Optional[EngineConfig] = None,
) -> np.ndarray:
    """N×N float64 similarity over PAIRWISE-COMPLETE observations — the
    missing-data form every real genotype panel needs (no reference
    analog; the reference's bitmaps assume a fully observed universe).

    ``data``: indicator bitmaps with missing positions CLEARED (the
    ``load_plink_bed`` encodings do this). ``mask``: bit set where the
    position is OBSERVED (``encode="missing"`` inverted). For each pair
    the statistic is computed over the co-observed universe only:
    m_ij = |mask_i ∩ mask_j|, ca_ij = |data_i ∩ mask_j|,
    cb_ij = |mask_i ∩ data_j|, ∩_ij = |data_i ∩ data_j| — exact, from
    three integer count matrices on the same kernels as
    :func:`similarity_matrix` (which this equals when masks are full).
    Requires data ⊆ mask rowwise (a set bit at an unobserved position is
    a contradiction) — validated cheaply on host.
    """
    if measure not in SIM_OPS:
        raise ValueError(f"unknown measure {measure!r}; want one of {SIM_OPS}")
    bm_d, bm_m = _complete_operands(data, mask)
    from stormtpu.api import count_block

    inter = intersect_count_matrix(bm_d, strategy=strategy, config=config)
    m_pair = intersect_count_matrix(bm_m, strategy=strategy, config=config)
    dm = count_block(bm_d, bm_m, config=config)  # ca_ij = |data_i ∩ mask_j|
    return derive_similarity(inter, dm, dm.T, m_pair, measure)


def _complete_operands(data: MatrixLike, mask: MatrixLike):
    """Shared validation for the pairwise-complete forms: identical
    shapes, and data ⊆ mask rowwise (a set bit at an unobserved position
    is a contradiction)."""
    bm_d = _as_bitmatrix(data)
    bm_m = _as_bitmatrix(mask)
    if bm_d.n != bm_m.n or bm_d.m_bits != bm_m.m_bits:
        raise ValueError(
            f"data and mask must have identical shape; got "
            f"{bm_d.n}×{bm_d.m_bits} vs {bm_m.n}×{bm_m.m_bits}"
        )
    if np.any(bm_d.packed & ~bm_m.packed):
        raise ValueError(
            "data has set bits at unobserved (mask=0) positions; clear "
            "missing positions in data or fix the mask"
        )
    return bm_d, bm_m


def _complete_refine(bm_d, bm_m, ii, jj, measure: str, threshold: float):
    """Exact host re-derivation + float64 refine of pairwise-complete
    screen candidates (one home — shared by the resident and streaming
    screens): the four per-pair counts from the packed rows
    (O(hits · W)), then ``derive_similarity`` with the per-pair
    co-observed universe, keeping values ≥ threshold."""
    pd, pm = bm_d.packed, bm_m.packed
    blk_h = max(1, (1 << 24) // max(bm_d.n_words, 1))
    inter_h = np.zeros(ii.size, dtype=np.int64)
    ca_h = np.zeros(ii.size, dtype=np.int64)
    cb_h = np.zeros(ii.size, dtype=np.int64)
    m_h = np.zeros(ii.size, dtype=np.int64)
    for o in range(0, ii.size, blk_h):
        s = slice(o, o + blk_h)
        di, dj = pd[ii[s]], pd[jj[s]]
        mi, mj = pm[ii[s]], pm[jj[s]]
        inter_h[s] = np.bitwise_count(di & dj).sum(axis=1, dtype=np.int64)
        ca_h[s] = np.bitwise_count(di & mj).sum(axis=1, dtype=np.int64)
        cb_h[s] = np.bitwise_count(mi & dj).sum(axis=1, dtype=np.int64)
        m_h[s] = np.bitwise_count(mi & mj).sum(axis=1, dtype=np.int64)
    vals = derive_similarity(inter_h, ca_h, cb_h, m_h, measure)
    keep = vals >= threshold
    return (ii[keep].astype(np.int32), jj[keep].astype(np.int32),
            vals[keep])


def pairs_above_complete(
    data: MatrixLike,
    mask: MatrixLike,
    threshold: float,
    *,
    measure: str = "r2",
    block_rows: Optional[int] = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All unordered pairs (i < j) with the PAIRWISE-COMPLETE measure ≥
    threshold — the missing-data LD screen at scale (the matrix form is
    :func:`similarity_matrix_complete`, which materializes N²·float64 on
    host; this screens on device and fetches only hit bitmaps).

    Per pair the statistic runs over the co-observed universe
    (m_ij = |mask_i ∩ mask_j|, ca_ij = |data_i ∩ mask_j|, …): four count
    blocks per row block instead of one, screened in float32 with the
    same over-admission slack as ``query.pairs_above``; hits are
    re-derived exactly on host (float64) from the packed rows, so
    rounding can only add candidates, never drop true hits. ``measure``
    is a similarity ("jaccard", "dice", "cosine", "overlap", "phi",
    "r2") — "count" does not depend on the mask, use ``pairs_above``.
    """
    import jax.numpy as jnp

    from stormtpu.query import (
        _complete_screen_block,
        _expand_word_coords,
        _expand_words,
        _gather_hit_words,
        _validate_screen,
    )
    from stormtpu.stream import require_device_budget
    from stormtpu.utils import next_pow2, round_up

    if measure not in SIM_OPS:
        raise ValueError(
            f"unknown measure {measure!r}; want one of {SIM_OPS} "
            f"('count' does not depend on the mask — use pairs_above)"
        )
    dev_thresh = _validate_screen(measure, threshold)
    bm_d, bm_m = _complete_operands(data, mask)
    n, w = bm_d.n, bm_d.n_words
    if n < 2:
        return (np.zeros(0, np.int32), np.zeros(0, np.int32),
                np.zeros(0, np.float64))
    if block_rows is None:
        bl = min(4096, next_pow2(n))
    else:
        if block_rows < 1 or block_rows & (block_rows - 1):
            raise ValueError("block_rows must be a power of two")
        bl = block_rows
    n_pad = round_up(max(n, 32), max(bl, 32))
    need = 8 * n_pad * w           # two resident packed operands
    need += 20 * bl * n_pad        # 4 int32 count blocks + float32 vals
    need += bl * n_pad // 8 * 2    # hit bitmap + its word summary
    from stormtpu.kernels import MXU_XLA_MAX_BITS

    if bm_d.m_bits <= MXU_XLA_MAX_BITS:
        # the small-M XLA int8 rectangle materializes int8 unpacks of
        # both full operands (and both row blocks) inside the jit —
        # the dominant allocation at this route's shapes
        need += 2 * (n_pad + bl) * bm_d.m_bits
    require_device_budget(
        need,
        f"N={n}: two resident operands (data+mask), four count blocks, "
        f"unpack buffers and the hit bitmap",
        "reduce the bit universe or screen via similarity_matrix_complete "
        "in row chunks",
    )

    d_dev = bm_d.device_padded(n_pad)
    m_dev = bm_m.device_padded(n_pad)
    wout = n_pad // 32
    out_i: list[np.ndarray] = []
    out_j: list[np.ndarray] = []
    for r0 in range(0, n_pad, bl):
        if r0 >= n:  # padded tail blocks have no real rows
            break
        hits_d, wsum_d = _complete_screen_block(
            d_dev, m_dev, jnp.int32(r0), jnp.int32(n), dev_thresh,
            measure=measure, bl=bl,
        )
        # two-phase fetch (the rule: D2H ∝ hits, not N² — the one-phase
        # bitmap fetch measurably dominates screens through this relay):
        # 1-bit-per-word summary first, then gather only nonzero words
        wi_r, wi_w = _expand_words(np.asarray(wsum_d), np.int32(wout))
        if wi_r.size > bl * wout // 8:
            # dense screen: the straight bitmap fetch is cheaper
            li, lj = _expand_words(np.asarray(hits_d), np.int32(n))
        elif wi_r.size:
            p = wi_r.size
            chunk = int(min(max(next_pow2(p), 4096), 1 << 16))
            p_pad = round_up(p, chunk)
            ri_p = np.zeros(p_pad, dtype=np.int32)
            wi_p = np.zeros(p_pad, dtype=np.int32)
            ri_p[:p] = wi_r
            wi_p[:p] = wi_w
            words = np.concatenate([
                np.asarray(_gather_hit_words(
                    hits_d, jnp.asarray(ri_p[o : o + chunk]),
                    jnp.asarray(wi_p[o : o + chunk]),
                ))
                for o in range(0, p_pad, chunk)
            ])[:p]
            li, lj = _expand_word_coords(wi_r, wi_w, words, n)
        else:
            continue
        keep = (li + r0) < n
        out_i.append((li[keep] + r0).astype(np.int64))
        out_j.append(lj[keep].astype(np.int64))
    ii = np.concatenate(out_i) if out_i else np.zeros(0, np.int64)
    jj = np.concatenate(out_j) if out_j else np.zeros(0, np.int64)
    if not ii.size:
        return (np.zeros(0, np.int32), np.zeros(0, np.int32),
                np.zeros(0, np.float64))
    return _complete_refine(bm_d, bm_m, ii, jj, measure, threshold)


def derive_similarity(inter, ca, cb, m_bits, measure: str):
    """float64 similarity from exact integer counts (broadcastable
    arrays) — the single home of the similarity formulas, shared by
    ``similarity_matrix``, the query refine (query.py), and the
    distributed forms (parallel/setops.py). Zero denominators yield 0.
    ``m_bits`` may be a scalar or a broadcastable array (the per-pair
    co-observed universe of :func:`similarity_matrix_complete`)."""
    inter = np.asarray(inter).astype(np.float64)
    ca = np.asarray(ca).astype(np.float64)
    cb = np.asarray(cb).astype(np.float64)
    if measure == "jaccard":
        denom = ca + cb - inter
    elif measure == "dice":
        inter = 2.0 * inter
        denom = ca + cb
    elif measure == "cosine":
        denom = np.sqrt(ca * cb)
    elif measure in ("phi", "r2"):
        m = np.asarray(m_bits).astype(np.float64)
        inter = m * inter - ca * cb
        denom = np.sqrt(ca * cb * (m - ca) * (m - cb))
        if measure == "r2":
            inter = inter * inter
            denom = denom * denom
    else:  # overlap
        denom = np.minimum(ca, cb)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(denom > 0, inter / np.where(denom > 0, denom, 1.0), 0.0)


def _column_partial(words):
    """uint32 [N, C] → int32 [C·32] per-position counts in position order
    (bit b of word c is position 32·c + b, so stack as [C, 32] then
    flatten). Shared by the single-chip and mesh (parallel/columns.py)
    forms so the reduction can never diverge between them."""
    import jax.numpy as jnp

    cols = [
        jnp.sum(((words >> jnp.uint32(b)) & jnp.uint32(1))
                .astype(jnp.int32), axis=0)
        for b in range(32)
    ]
    return jnp.stack(cols, axis=1).reshape(-1)


def column_counts(
    x: MatrixLike,
    *,
    chunk_words: int = 4096,
) -> np.ndarray:
    """Per-position set-bit counts across rows, int32 [m_bits] — the
    positional-popcount operation of the reference's sibling project
    (Klarqvist–Muła–Lemire ``pospopcnt``, SURVEY.md §1 lineage; in the
    genomics domain these are the allele counts / column marginals that
    pair with the LD screens).

    TPU form: stream word chunks, unpack each to {0,1} int8 in VMEM-sized
    pieces, and reduce over rows on device; exact int32 (counts ≤ N < 2³¹).
    """
    import jax
    import jax.numpy as jnp

    bm = _as_bitmatrix(x)
    w = bm.n_words
    out = np.empty(w * 32, dtype=np.int32)

    chunk_counts = jax.jit(_column_partial)

    packed = bm.packed
    for c0 in range(0, w, chunk_words):
        chunk = jnp.asarray(packed[:, c0 : c0 + chunk_words])
        out[c0 * 32 : (c0 + chunk.shape[1]) * 32] = np.asarray(
            chunk_counts(chunk)
        )
    return out[: bm.m_bits]
