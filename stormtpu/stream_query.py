"""Streaming-scale reduced queries: top-k and threshold screens for
matrices whose operands exceed HBM.

The single-chip queries (``stormtpu.query``) keep the padded packed
matrix device-resident, so they are HBM-bounded (~100k × 1M bits on a
16 GB chip). These twins walk the same superblock stripes as
``stream.stream_count_matrix`` in operand-streaming form — two
superblock slices device-resident at a time, HBM a cache over host RAM
(the reference's single-node driver is host-RAM-bounded the same way;
SURVEY.md §3 C11) — while the stripe counts never leave the device:

- ``stream_topk_neighbors``: per stripe, both blocks' per-row top-k
  candidates are reduced in-jit (D2H is O(superblock · k) per stripe);
  the host merges candidates across the stripe row.
- ``stream_pairs_above``: per stripe, the screen + triangular mask run
  in-jit and a packed 1-bit hit bitmap is fetched (superblock²/8 bytes);
  hit values are gathered from the still-device-resident counts, so
  value D2H is O(hits). Similarity screens run in float32 with the same
  under-admission slack as the single-chip screen and the host
  re-filters hits exactly in float64 — rounding can only add
  candidates, never lose them.

Semantics match ``query.topk_neighbors`` / ``query.pairs_above``
exactly on values; top-k tie ORDER among equal counts depends on the
route (documented there too).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stormtpu.config import EngineConfig, default_config
from stormtpu.layout import BitMatrix
from stormtpu.stream import (
    _auto_stream_kernel,
    _content_fingerprint,
    _host_superblock,
)
from stormtpu.utils import pallas_interpret_default, round_up

__all__ = [
    "stream_topk_neighbors",
    "stream_pairs_above",
    "stream_pairs_above_complete",
    "extend_stream_topk_neighbors",
    "extend_stream_pairs_above",
    "extend_stream_pairs_above_complete",
]

# stripe kernels these queries accept (resolved from "auto" by
# stream._auto_stream_kernel); anything else must be rejected — an
# unknown string would otherwise silently fall through the dispatch
# chain onto the dense-kernel branch with k1 tiles
_STRIPE_KERNELS = ("mxu", "dense", "xla_int8", "xla_popcount")


def _check_stripe_kernel(kernel: str) -> None:
    if kernel not in _STRIPE_KERNELS:
        raise ValueError(
            f"unknown kernel {kernel!r}; want 'auto' or one of "
            f"{_STRIPE_KERNELS}"
        )


def _resolve_stripe_config(
    bm: BitMatrix,
    superblock_rows: int,
    kernel: str,
    config: Optional[EngineConfig],
    interpret: Optional[bool],
    *,
    bitmap: bool,
):
    """Shared stripe-walk setup (one home — three hand-rolled copies of
    this block were a review finding): resolve kernel/tiles/variant and
    the superblock/padding geometry. ``bitmap`` rounds the superblock to
    lcm(ti, 32) (hit bitmaps pack 32 columns per word; ti=24/48 crashed
    the max(ti, 32) form)."""
    from stormtpu.tuning import tuned_variant

    cfg = config or default_config()
    cfg.validate(bm.m_bits)
    if interpret is None:
        interpret = pallas_interpret_default()
    if kernel == "auto":
        kernel = _auto_stream_kernel(bm.m_bits, bm.n)
    _check_stripe_kernel(kernel)
    ti = cfg.k2_tile_rows if kernel in ("mxu", "xla_int8") else cfg.k1_tile_rows
    wk = cfg.k2_tile_words if kernel in ("mxu", "xla_int8") else cfg.k1_tile_words
    sb = round_up(superblock_rows, math.lcm(ti, 32) if bitmap else ti)
    variant = tuned_variant("k2" if kernel == "mxu" else "k1",
                            cfg.k2_variant if kernel == "mxu" else cfg.k1_variant)
    w_pad = round_up(bm.n_words, wk)
    n_pad = round_up(bm.n, sb)
    return (cfg, kernel, bool(interpret), ti, wk, sb, variant, w_pad,
            n_pad, n_pad // sb)


def _walk_resolution(bm, superblock_rows, kernel, config, interpret, *,
                     bitmap):
    """Resolution + sparse-mode + the store-params kernel name, in ONE
    home so the extend wrappers (r5) predict the resumed walk's geometry
    and manifest exactly. Returns (resolution tuple, sparse?, name)."""
    requested = kernel
    res = _resolve_stripe_config(
        bm, superblock_rows,
        "auto" if kernel == "sparse_outer" else kernel,
        config, interpret, bitmap=bitmap)
    cfg, resolved = res[0], res[1]
    sparse = _sparse_mode_for(bm, requested, cfg)
    name = f"sparse_outer+{resolved}" if sparse else resolved
    return res, sparse, name


class _StripeStore:
    """Per-stripe checkpoint store shared by the screens — ONE home for
    the manifest/purge/atomic-write/resume machinery (two hand-rolled
    copies were a review finding). A fresh manifest (no prior one, or
    ``resume=False``) purges this store's stripe files first: a crash
    mid-rewrite must not leave stale-content stripes a later resume
    would silently reload. All writes are tmp+rename atomic."""

    def __init__(self, out_dir: Optional[str], manifest_name: str,
                 prefix: str, params: dict, resume: bool):
        import json
        import os

        self.out_dir = out_dir
        self.prefix = prefix
        self.resume = resume
        if not out_dir:
            return
        os.makedirs(out_dir, exist_ok=True)
        manifest = os.path.join(out_dir, manifest_name)
        if resume and os.path.exists(manifest):
            with open(manifest) as f:
                got = json.load(f)
            if got != params:
                raise ValueError(
                    f"{manifest} was written for {got}, not {params} "
                    f"(pass resume=False to overwrite)"
                )
        else:
            for name in os.listdir(out_dir):
                if name.startswith(prefix) and name.endswith(".npz"):
                    os.remove(os.path.join(out_dir, name))
            tmp = manifest + ".tmp"
            with open(tmp, "w") as f:
                json.dump(params, f)
            os.replace(tmp, manifest)

    def _path(self, i: int, j: int) -> str:
        import os

        return os.path.join(self.out_dir, f"{self.prefix}{i:05d}_{j:05d}.npz")

    def load(self, i: int, j: int) -> Optional[dict]:
        """The completed stripe's arrays, or None if it must be
        (re)computed."""
        import os

        if not (self.out_dir and self.resume
                and os.path.exists(self._path(i, j))):
            return None
        with np.load(self._path(i, j)) as z:
            return {k: z[k] for k in z.files}

    def save(self, i: int, j: int, **arrays) -> None:
        import os

        if not self.out_dir:
            return
        tmp = self._path(i, j) + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, self._path(i, j))


def _superblock_occupancy(bm: BitMatrix, n_pad: int, sb: int) -> Optional[np.ndarray]:
    """Per-superblock K-group occupancy bool [n_super, G] (the C8 summary
    OR-reduced per superblock, wk=128-word groups — same statistic as the
    clustered streaming driver). None for degenerate (empty) shapes.
    A single-group summary (small M) is still load-bearing: it skips
    stripes between entirely EMPTY superblocks — at N=262,144 × 512 bits
    with two occupied bands, 2077 of 2080 stripes (measured: the old
    ``G < 2`` guard silently walked them all)."""
    if not (bm.n and bm.n_words):
        return None
    occ_rows = bm.block_summary(block_bits=128 * 32).astype(bool)
    occ = np.zeros((n_pad, occ_rows.shape[1]), dtype=bool)
    occ[: bm.n] = occ_rows
    return occ.reshape(n_pad // sb, sb, -1).any(axis=1)


def _stripe_square_counts(
    xi: jax.Array,
    xj: jax.Array,
    tps: int,
    ti: int,
    wk: int,
    interpret: bool,
    kernel: str,
    variant: str,
) -> jax.Array:
    """Traced helper: int32 [SB, SB] counts of xi's rows × xj's rows.

    Tile kernels run on the on-device concatenation [xi; xj] over the
    full square local tile grid (row-major), so assembly is a
    transpose-reshape — no scatter (TPU scatter is ~2e5 adds/s)."""
    if kernel in ("xla_int8", "xla_popcount"):
        from stormtpu.kernels import xla as kx

        if kernel == "xla_int8":
            return kx.count_block_int8_xla(xi, xj)
        return kx.count_block_popcount_xla(xi, xj)
    if kernel == "mxu":
        from stormtpu.kernels.mxu import count_tiles_pallas_mxu as count_tiles
    else:
        from stormtpu.kernels.dense import count_tiles_pallas_dense as count_tiles

    loc_i, loc_j = np.meshgrid(
        np.arange(tps, dtype=np.int32),
        np.arange(tps, dtype=np.int32),
        indexing="ij",
    )
    x = jnp.concatenate([xi, xj], axis=0)
    kwargs = {"variant": variant} if kernel in ("mxu", "dense") else {}
    tiles = count_tiles(
        x,
        jnp.asarray(loc_i.ravel()),
        jnp.asarray(loc_j.ravel() + tps),
        tile_rows=ti,
        tile_words=wk,
        interpret=interpret,
        **kwargs,
    )
    sb = tps * ti
    return tiles.reshape(tps, tps, ti, ti).transpose(0, 2, 1, 3).reshape(sb, sb)


@functools.lru_cache(maxsize=None)
def _diag_tile_maps(tps: int):
    """Static maps for assembling a diagonal stripe's [tps, tps] tile
    grid from its triangular tile list: upper-triangle pair ids, a
    square-cell → triangular-index gather map, and the upper mask (lower
    cells take the transposed tile)."""
    from stormtpu.utils import triangular_tile_ids

    loc_i, loc_j = triangular_tile_ids(tps)
    tri_map = np.zeros((tps, tps), dtype=np.int32)
    t = np.arange(loc_i.size, dtype=np.int32)
    tri_map[loc_i, loc_j] = t
    tri_map[loc_j, loc_i] = t
    upper = np.arange(tps)[:, None] <= np.arange(tps)[None, :]
    return loc_i, loc_j, tri_map.ravel(), upper.ravel()


def _stripe_diag_counts(
    xi: jax.Array,
    tps: int,
    ti: int,
    wk: int,
    interpret: bool,
    kernel: str,
    variant: str,
) -> jax.Array:
    """Traced helper: int32 [SB, SB] counts of a DIAGONAL stripe from
    triangular tiles plus an in-jit gather-mirror — half the square
    grid's MXU work, no [xi; xi] concat (stream.py's host-assembled twin
    is _assemble_stripe). The XLA whole-stripe forms have no per-tile
    saving to take."""
    if kernel in ("xla_int8", "xla_popcount"):
        return _stripe_square_counts(
            xi, xi, tps, ti, wk, interpret, kernel, variant
        )
    if kernel == "mxu":
        from stormtpu.kernels.mxu import count_tiles_pallas_mxu as count_tiles
    else:
        from stormtpu.kernels.dense import count_tiles_pallas_dense as count_tiles

    loc_i, loc_j, tri_map, upper = _diag_tile_maps(tps)
    tiles = count_tiles(
        xi,
        jnp.asarray(loc_i),
        jnp.asarray(loc_j),
        tile_rows=ti,
        tile_words=wk,
        interpret=interpret,
        variant=variant,
    )
    g = tiles[jnp.asarray(tri_map)]
    g = jnp.where(jnp.asarray(upper)[:, None, None], g, jnp.swapaxes(g, 1, 2))
    sb = tps * ti
    return g.reshape(tps, tps, ti, ti).transpose(0, 2, 1, 3).reshape(sb, sb)


@functools.partial(
    jax.jit,
    static_argnames=("k", "tps", "ti", "wk", "interpret", "kernel", "variant",
                     "diagonal"),
)
def _stripe_topk(
    xi: jax.Array,
    xj: jax.Array,
    row0_i: jax.Array,
    row0_j: jax.Array,
    n: jax.Array,
    *,
    k: int,
    tps: int,
    ti: int,
    wk: int,
    interpret: bool,
    kernel: str,
    variant: str,
    diagonal: bool,
):
    """Per-row top-k candidates of one stripe, both orientations: rows of
    block i against block j's columns, and (for the host to use on
    off-diagonal stripes) rows of block j against block i's. Invalid
    cells (self pairs, padded rows/cols) rank as -1. Diagonal stripes
    (static flag) run triangular tiles and skip the transposed top-k —
    its candidates would duplicate the forward ones."""
    counts = (
        _stripe_diag_counts(xi, tps, ti, wk, interpret, kernel, variant)
        if diagonal
        else _stripe_square_counts(xi, xj, tps, ti, wk, interpret, kernel,
                                   variant)
    )
    row_g = (
        jax.lax.broadcasted_iota(jnp.int32, counts.shape, 0) + row0_i
    )
    col_g = (
        jax.lax.broadcasted_iota(jnp.int32, counts.shape, 1) + row0_j
    )
    valid = (row_g < n) & (col_g < n) & (row_g != col_g)
    masked = jnp.where(valid, counts, jnp.int32(-1))
    vals_i, idx_i = jax.lax.top_k(masked, k)
    if diagonal:
        return vals_i, idx_i.astype(jnp.int32), None, None
    vals_j, idx_j = jax.lax.top_k(masked.T, k)
    return vals_i, idx_i.astype(jnp.int32), vals_j, idx_j.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("measure", "kk", "tps", "ti", "wk", "interpret",
                     "kernel", "variant", "diagonal"),
)
def _stripe_topk_measure(
    xi: jax.Array,
    xj: jax.Array,
    nnz_i: jax.Array,
    nnz_j: jax.Array,
    row0_i: jax.Array,
    row0_j: jax.Array,
    n: jax.Array,
    m_f: jax.Array,
    *,
    measure: str,
    kk: int,
    tps: int,
    ti: int,
    wk: int,
    interpret: bool,
    kernel: str,
    variant: str,
    diagonal: bool,
):
    """Per-row top-``kk`` similarity CANDIDATES of one stripe (both
    orientations off the diagonal), each with its exact integer count for
    the host's float64 rescore — the streaming twin of cross.py's
    certified measure extraction. Invalid cells (self pairs, padding)
    rank as −inf."""
    from stormtpu.query import _screen_vals

    counts = (
        _stripe_diag_counts(xi, tps, ti, wk, interpret, kernel, variant)
        if diagonal
        else _stripe_square_counts(xi, xj, tps, ti, wk, interpret, kernel,
                                   variant)
    )
    scores = _screen_vals(counts, nnz_i, nnz_j, m_f, measure)
    row_g = (
        jax.lax.broadcasted_iota(jnp.int32, counts.shape, 0) + row0_i
    )
    col_g = (
        jax.lax.broadcasted_iota(jnp.int32, counts.shape, 1) + row0_j
    )
    valid = (row_g < n) & (col_g < n) & (row_g != col_g)
    masked = jnp.where(valid, scores, -jnp.inf)
    sv_i, ix_i = jax.lax.top_k(masked, kk)
    cv_i = jnp.take_along_axis(counts, ix_i, axis=1)
    if diagonal:
        return sv_i, ix_i.astype(jnp.int32), cv_i, None, None, None
    sv_j, ix_j = jax.lax.top_k(masked.T, kk)
    cv_j = jnp.take_along_axis(counts.T, ix_j, axis=1)
    return (sv_i, ix_i.astype(jnp.int32), cv_i,
            sv_j, ix_j.astype(jnp.int32), cv_j)


def _merge_topk(
    best_v: np.ndarray,
    best_i: np.ndarray,
    sl: slice,
    cand_v: np.ndarray,
    cand_i: np.ndarray,
    k: int,
) -> None:
    """Keep the k best of (current best ∪ candidates) per row, in place.

    Deduplicates by PARTNER index (keeping the best-valued copy), which
    makes the merge idempotent: re-merging a stripe's candidates cannot
    seat the same partner twice in a row's top-k. Normal walks never
    produce duplicates (stripes rank disjoint partner ranges), but the
    extend path (r5) re-merges stripes touching the old partial
    superblock whose real-row candidates already sit in the running
    best. Fill entries (−1 counts / −inf measures) never collapse —
    each gets a unique surrogate key."""
    cv = np.concatenate([best_v[sl], cand_v], axis=1)
    ci = np.concatenate([best_i[sl], cand_i], axis=1)
    # value-desc first (stable) so the best copy of each partner leads
    order = np.argsort(-cv, axis=1, kind="stable")
    cv = np.take_along_axis(cv, order, axis=1)
    ci = np.take_along_axis(ci, order, axis=1)
    fill = (cv < 0) if cv.dtype.kind == "i" else np.isneginf(cv)
    w = cv.shape[1]
    key = np.where(fill, -(np.arange(w, dtype=np.int64)[None, :] + 1),
                   ci.astype(np.int64))
    korder = np.argsort(key, axis=1, kind="stable")
    ks = np.take_along_axis(key, korder, axis=1)
    dup_sorted = np.zeros_like(fill)
    dup_sorted[:, 1:] = ks[:, 1:] == ks[:, :-1]
    dup = np.zeros_like(fill)
    np.put_along_axis(dup, korder, dup_sorted, axis=1)
    if dup.any():
        cv = np.where(dup, cv.dtype.type(-1) if cv.dtype.kind == "i"
                      else -np.inf, cv)
        ci = np.where(dup, 0, ci)
        order2 = np.argsort(-cv, axis=1, kind="stable")
        cv = np.take_along_axis(cv, order2, axis=1)
        ci = np.take_along_axis(ci, order2, axis=1)
    best_v[sl] = cv[:, :k]
    best_i[sl] = ci[:, :k]


def _sparse_mode_for(bm: BitMatrix, requested: str, cfg) -> bool:
    """Streaming-query analog of stream.py's auto sparse routing: at
    extreme sparsity (and with the native tier present) the stripe walk
    runs per-superblock K4 emission on the host instead of dense device
    stripes — the reference's sparse regime (C12) reaching the streaming
    QUERIES, above the single-shot N=32768 ceiling. ``requested`` is the
    caller's kernel string BEFORE resolution: 'sparse_outer' forces the
    route (raises without the native tier); 'auto' decides from the
    measured density threshold, mirroring stream.stream_count_matrix.
    Sparse mode keeps a resolved dense stripe kernel alongside — the
    per-stripe cost model can still pick the device walk for locally
    dense stripes (the reference C7 dispatch at superblock granularity)."""
    from stormtpu.native import HAVE_NATIVE

    if requested == "sparse_outer":
        if not HAVE_NATIVE:
            raise RuntimeError(
                "kernel='sparse_outer' needs the native C++ tier "
                "(stormtpu/native build failed or was disabled)"
            )
        return True
    return (
        requested == "auto"
        and HAVE_NATIVE
        and bm.n >= 2
        and bm.density < cfg.sparse_density_threshold
    )


class _CooStripe:
    """COO view of a K4 stripe (local li/lj/vv over the full mirrored
    square, like the dense stripe's nonzeros) plus the two membership
    queries the zero-intersection staircases need — the query walks'
    twin of the counts walk's buffer-free emission path (r4): at the
    1M-row decade the dense sb² buffer (268 MB at sb=8192) per stripe
    dominated every sparse query walk. ``.T`` swaps orientation (square
    stripes only, which K4 stripes are)."""

    def __init__(self, li: np.ndarray, lj: np.ndarray, vv: np.ndarray,
                 sb: int):
        self.li, self.lj, self.vv, self.sb = li, lj, vv, sb
        self._keys = np.sort(li.astype(np.int64) * sb + lj)

    @property
    def T(self) -> "_CooStripe":
        return _CooStripe(self.lj, self.li, self.vv, self.sb)

    def is_zero(self, rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
        """bool [Q]: stripe[rows, cols] == 0 (sorted-key membership)."""
        if not self._keys.size:
            return np.ones(rows.size, dtype=bool)
        q = rows.astype(np.int64) * self.sb + cols
        pos = np.minimum(np.searchsorted(self._keys, q),
                         self._keys.size - 1)
        return self._keys[pos] != q

    def row_nonzero_counts(self, valid_a: int, valid_b: int) -> np.ndarray:
        """int64 [valid_a]: per-row nonzero count within the valid box."""
        sel = (self.li < valid_a) & (self.lj < valid_b)
        return np.bincount(self.li[sel], minlength=valid_a)[:valid_a]


def _stripe_nz(stripe) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(li, lj, vv) nonzeros of a K4 stripe in either representation."""
    if isinstance(stripe, _CooStripe):
        return stripe.li, stripe.lj, stripe.vv
    li, lj = np.nonzero(stripe)
    return li, lj, stripe[li, lj]


def _r2_zero_plan(nnz_i: np.ndarray, nnz_j: np.ndarray, m_bits: int,
                  threshold: float):
    """r2 scores ZERO-intersection (anti-correlated) pairs — at zero
    intersection r2 = ca·cb/((m−ca)(m−cb)) = g(ca)·g(cb) with
    g(c) = c/(m−c), monotone in c — so the candidates above a threshold
    form a staircase enumerable from sorted row cardinalities, without
    touching any pair the K4 emission never saw. Returns (total count,
    materialize(stripe, diagonal) → (rows, cols)): the count phase is
    O(sb log sb) and feeds the per-stripe cost model; materialization
    filters to pairs whose stripe count is actually zero (nonzero pairs
    are the COO pass's job). The staircase threshold carries a few ulps
    of slack so float rounding can only ADD candidates — the exact
    float64 refilter at the end of the walk trims them (the same
    slack-screen contract as the device path)."""
    m = float(m_bits)
    ca = nnz_i.astype(np.float64)
    cb = nnz_j.astype(np.float64)
    # rows with c ∈ {0, m} cannot form zero-intersection scoring pairs:
    # c=0 → r2=0; c=m → intersection = partner's cardinality, which is 0
    # only when the partner scores 0 too
    ga = np.where((nnz_i > 0) & (nnz_i < m_bits), ca / (m - ca), 0.0)
    gb = np.where((nnz_j > 0) & (nnz_j < m_bits), cb / (m - cb), 0.0)
    order_b = np.argsort(-gb)
    gbs = gb[order_b]
    t_eff = threshold * (1.0 - 1e-9)
    with np.errstate(divide="ignore"):
        lim = np.where(ga > 0, t_eff / ga, np.inf)
    cnt = np.searchsorted(-gbs, -lim, side="right")
    total = int(cnt.sum())

    def materialize(stripe: Optional[np.ndarray], diagonal: bool):
        offs = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        rows = np.repeat(np.arange(cnt.size), cnt)
        cols = order_b[offs]
        # stripe=None: a summary-zero stripe — every pair's count is
        # exactly zero, so no filter is needed (the C8 skip's r2 form)
        if stripe is None:
            keep = np.ones(rows.size, dtype=bool)
        elif isinstance(stripe, _CooStripe):
            keep = stripe.is_zero(rows, cols)
        else:
            keep = stripe[rows, cols] == 0
        if diagonal:
            keep &= rows < cols
        return rows[keep], cols[keep]

    return total, materialize


def _k4_zero_topk(
    stripe: Optional[np.ndarray],
    nnz_a: np.ndarray,
    nnz_b: np.ndarray,
    m_bits: int,
    measure: str,
    k: int,
    *,
    diagonal: bool,
    valid_a: int,
    valid_b: int,
    sb_rows: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row top-k ZERO-intersection candidates of one K4 stripe for
    the measures that score them (phi/r2) — the top-k twin of the
    screens' ``_r2_zero_plan`` staircase. At zero intersection the score
    is a function of cardinalities alone: r2 = g(ca)·g(cb) and
    phi = −√(g(ca)·g(cb)) with g(c) = c/(m−c) monotone on (0, m) and
    c ∈ {0, m} scoring exactly 0 (``derive_similarity`` maps zero
    denominators to 0) — so for a fixed row the zero-intersection
    partners rank by g(cb) alone: descending for r2, ascending for phi
    (whose zero-intersection scores are ≤ 0, best at g = 0). Walking the
    first k + P_a + 1 partners of that order per row — P_a the row's
    nonzero-partner count, the only entries the stripe-count filter can
    drop, +1 for the diagonal self — provably contains the row's true
    zero-intersection top-k; every kept candidate is then scored by the
    same ``derive_similarity`` float64 the nonzero COO pass uses, so the
    merge is exact, not heuristic. Padded rows (beyond ``valid_b``) are
    excluded up front: their cb = 0 would score 0, which for phi would
    outrank true negative partners. ``stripe=None`` means a summary-zero
    (co-empty) stripe — every pair is zero-intersection, so P = 0 and no
    count filter is needed; pass ``sb_rows``. This is how the C8 summary
    skip stays sound for phi/r2, whose co-empty stripes still score but
    never need the device. Returns ([sb, k] float64 scores
    filled −inf, [sb, k] int32 local partner indices)."""
    from stormtpu.setops import derive_similarity

    if stripe is None:
        sb_a = sb_rows
    elif isinstance(stripe, _CooStripe):
        sb_a = stripe.sb
    else:
        sb_a = stripe.shape[0]
    cand_v = np.full((sb_a, k), -np.inf, dtype=np.float64)
    cand_i = np.zeros((sb_a, k), dtype=np.int32)
    if valid_a <= 0 or valid_b <= 0:
        return cand_v, cand_i
    m = float(m_bits)
    cb = nnz_b[:valid_b].astype(np.float64)
    gb = np.where((cb > 0) & (cb < m), cb / np.maximum(m - cb, 1.0), 0.0)
    order = np.argsort(gb if measure == "phi" else -gb, kind="stable")
    if stripe is None:
        p = np.zeros(valid_a, dtype=np.int64)
    elif isinstance(stripe, _CooStripe):
        p = stripe.row_nonzero_counts(valid_a, valid_b)
    else:
        p = np.count_nonzero(stripe[:valid_a, :valid_b], axis=1)
    t = np.minimum(k + p + (1 if diagonal else 0), valid_b)
    rows = np.repeat(np.arange(valid_a), t)
    offs = np.arange(rows.size) - np.repeat(np.cumsum(t) - t, t)
    cols = order[offs]
    if stripe is None:
        keep = np.ones(rows.size, dtype=bool)
    elif isinstance(stripe, _CooStripe):
        keep = stripe.is_zero(rows, cols)
    else:
        keep = stripe[rows, cols] == 0
    if diagonal:
        keep &= rows != cols
    rows, cols = rows[keep], cols[keep]
    scores = derive_similarity(0, nnz_a[rows], nnz_b[cols], m_bits, measure)
    return _coo_rank_topk(rows, cols.astype(np.int64), scores, sb_a, k,
                          fill=-np.inf)


def _coo_rank_topk(
    ii: np.ndarray, jj: np.ndarray, vv: np.ndarray, sb: int, k: int,
    fill: float = -1,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row top-k of COO candidates via rank-within-row: lexsort by
    (row, -value), subtract each row's start offset, keep rank < k.
    O(E log E) in the stripe's NONZERO count — at the densities that
    choose K4 that is ~100× fewer cells than the dense [sb, sb] buffer
    (measured at 131k × 1M d=1e-5: the dense argpartition form spent
    0.46 s/stripe ranking 16.7M cells of which ~163k were nonzero).
    Rows with fewer than k candidates pad with ``fill`` (no partner);
    float ``vv`` (measure scores) ranks in float64, integer counts in
    int64."""
    order = np.lexsort((-vv, ii))
    i_s, j_s, v_s = ii[order], jj[order], vv[order]
    starts = np.flatnonzero(np.r_[True, i_s[1:] != i_s[:-1]])
    counts = np.diff(np.r_[starts, i_s.size])
    rank = np.arange(i_s.size) - np.repeat(starts, counts)
    keep = rank < k
    dtype = (np.float64 if np.issubdtype(np.asarray(vv).dtype, np.floating)
             else np.int64)
    cand_v = np.full((sb, k), fill, dtype=dtype)
    cand_i = np.zeros((sb, k), dtype=np.int32)
    cand_v[i_s[keep], rank[keep]] = v_s[keep]
    cand_i[i_s[keep], rank[keep]] = j_s[keep]
    return cand_v, cand_i


def _stripe_topk_candidates_k4(
    stripe, k: int, *, diagonal: bool
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host top-k of one K4 stripe's counts, both orientations, from the
    stripe's COO (zero cells can never beat the -1/no-partner padding's
    final ``max(vals, 0)`` contract, so only nonzeros rank). Self pairs
    are dropped on diagonal stripes, matching the device stripe's mask;
    padded rows/cols carry zero counts and never appear in the COO.
    ``stripe``: dense [sb, sb] or a :class:`_CooStripe`."""
    sb = stripe.sb if isinstance(stripe, _CooStripe) else stripe.shape[0]
    li, lj, vv = _stripe_nz(stripe)
    if diagonal:
        nz = li != lj
        li, lj, vv = li[nz], lj[nz], vv[nz]
    vi, ii = _coo_rank_topk(li, lj, vv, sb, k)
    if diagonal:
        return vi, ii, None, None
    vj, ij = _coo_rank_topk(lj, li, vv, sb, k)
    return vi, ii, vj, ij


def _topk_ckpt_params(bm: BitMatrix, k: int, sb: int, kernel: str) -> dict:
    return {"n": bm.n, "m_bits": bm.m_bits, "k": k,
            "superblock_rows": sb, "kernel": kernel,
            "content": _content_fingerprint(bm)}


def _screen_store_params(bm: BitMatrix, sb: int, kernel_name: str,
                         measure: str, threshold: float) -> dict:
    return {"n": bm.n, "m_bits": bm.m_bits, "superblock_rows": sb,
            "kernel": kernel_name, "measure": measure,
            "threshold": float(threshold),
            "content": _content_fingerprint(bm)}


def _check_extend_head(bm: BitMatrix, old_n: int, old_fp: str,
                       what: str) -> None:
    """Shared extend safety net (stream.extend_streamed_matrix's rule):
    the grown panel's first old_n rows must fingerprint-match the panel
    the directory was computed from, or reuse splices two matrices."""
    if bm.n < old_n:
        raise ValueError(
            f"{what}: N={bm.n} < directory's n={old_n} (rows can only "
            f"be appended; shrinking needs a fresh directory)"
        )
    head = BitMatrix.from_packed(
        np.ascontiguousarray(bm.packed[:old_n]), bm.m_bits
    )
    if _content_fingerprint(head) != old_fp:
        raise ValueError(
            f"{what}: the first rows differ from the panel this "
            f"directory was computed from (content fingerprint "
            f"mismatch) — reusing its results would splice two "
            f"different matrices"
        )


def extend_stream_topk_neighbors(
    bm: BitMatrix,
    out_dir: str,
    *,
    kernel: str = "auto",
    config: Optional[EngineConfig] = None,
    interpret: Optional[bool] = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Grow a COMPLETED ``stream_topk_neighbors(out_dir=...)`` run to
    ``bm``'s larger row count without redoing the old quadratic work
    (r5 — VERDICT r4 #4; the counts-walk ``extend_streamed_matrix``
    argument applied to the query users actually run at scale).

    The checkpoint's running best is exact for every pair wholly inside
    the old COMPLETE superblocks, so the extended walk merges only the
    stripes with a new-region (or old-partial) side: old rows rescore
    only against new partners; pair work ≈ old·new + new²/2 instead of
    (old+new)²/2. Stale candidates whose partner index was zero padding
    in the old run are reset first, and ``_merge_topk``'s dedup-by-
    partner makes the partial-superblock re-merge idempotent.

    ``k``, ``measure`` and the superblock geometry come from the
    checkpoint; the resolved walk must round to the same superblock or
    the reuse is refused. An interrupted EXTEND resumes by calling this
    again with the same panel (the checkpoint's ``extend_from`` key
    pins it — a plain resume would re-merge old stripes). Returns the
    same (values, indices) as ``stream_topk_neighbors``.
    """
    import json
    import os

    ckpt = os.path.join(out_dir, "topk_ckpt.npz")
    with np.load(ckpt, allow_pickle=False) as z:
        old = json.loads(str(z["params"]))
        best_v = np.array(z["best_v"])
        best_i = np.array(z["best_i"])
        next_i = int(z["next_i"])
    old_n = int(old["n"])
    k = int(old["k"])
    sb_old = int(old["superblock_rows"])
    measure = old.get("measure", "count")
    if bm.m_bits != old["m_bits"]:
        raise ValueError(
            f"extend: m_bits {bm.m_bits} != checkpoint's "
            f"{old['m_bits']} — a changed universe invalidates the best"
        )
    if (old.get("extend_from") is not None and old_n == bm.n
            and old["content"] == _content_fingerprint(bm)):
        # the checkpoint IS an interrupted extend of this very panel:
        # resume it (sanitization already happened when it started)
        return stream_topk_neighbors(
            bm, k, superblock_rows=sb_old, kernel=kernel, measure=measure,
            config=config, interpret=interpret, out_dir=out_dir,
            resume=True, _extend_from=int(old["extend_from"]))
    _check_extend_head(bm, old_n, old["content"], "extend")
    n_super_old = round_up(old_n, sb_old) // sb_old
    if next_i < n_super_old:
        raise ValueError(
            f"extend: the checkpoint is an INCOMPLETE run "
            f"(next_i={next_i} of {n_super_old} rows) — resume it to "
            f"completion first (stream_topk_neighbors(out_dir=...))"
        )
    (res, _sparse, kernel_name) = _walk_resolution(
        bm, sb_old, kernel, config, interpret, bitmap=False)
    sb, n_pad_new = res[5], res[8]
    if sb != sb_old:
        raise ValueError(
            f"extend: the resumed walk rounds superblock_rows to {sb}, "
            f"not the checkpoint's {sb_old} — the running best would "
            f"misalign; match the config/kernel"
        )
    fill = best_v.dtype.type(-1) if best_v.dtype.kind == "i" else -np.inf
    # partners at index >= old_n were zero padding when the best was
    # computed — their recorded values are stale now that those rows
    # hold data
    stale = best_i >= old_n
    best_v = np.where(stale, fill, best_v)
    best_i = np.where(stale, 0, best_i)
    # rows at/above old_n were padding themselves: full reset
    best_v[old_n:] = fill
    best_i[old_n:] = 0
    if n_pad_new > best_v.shape[0]:
        grow = n_pad_new - best_v.shape[0]
        best_v = np.concatenate(
            [best_v, np.full((grow, k), fill, dtype=best_v.dtype)])
        best_i = np.concatenate(
            [best_i, np.zeros((grow, k), dtype=best_i.dtype)])
    params = _topk_ckpt_params(bm, k, sb, kernel_name)
    if measure != "count":
        params["measure"] = measure
    params["extend_from"] = old_n
    tmp = ckpt + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, params=json.dumps(params), best_v=best_v,
                 best_i=best_i, next_i=0)
    os.replace(tmp, ckpt)
    return stream_topk_neighbors(
        bm, k, superblock_rows=sb, kernel=kernel, measure=measure,
        config=config, interpret=interpret, out_dir=out_dir, resume=True,
        _extend_from=old_n)


def extend_stream_pairs_above(
    bm: BitMatrix,
    out_dir: str,
    *,
    kernel: str = "auto",
    config: Optional[EngineConfig] = None,
    interpret: Optional[bool] = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Grow a COMPLETED ``stream_pairs_above(out_dir=...)`` directory to
    ``bm``'s larger row count, reusing every per-stripe hit file wholly
    inside the old complete superblocks (r5 — VERDICT r4 #4).

    A hit file's content depends only on its two row superblocks (hits
    are exact integer counts plus positions — kernel-independent), so
    appending rows invalidates nothing in the unchanged range: stripes
    touching the old PARTIAL last superblock are deleted and recomputed
    (their zero-padded rows now hold data); stripes with a new-region
    side are computed fresh. ``measure``/``threshold``/superblock come
    from the manifest; the resolved walk must round to the same
    superblock. Returns the same (ii, jj, values) as
    ``stream_pairs_above``.
    """
    import json
    import os

    man_path = os.path.join(out_dir, "screen_manifest.json")
    with open(man_path) as f:
        old = json.load(f)
    old_n = int(old["n"])
    sb_old = int(old["superblock_rows"])
    measure = old["measure"]
    threshold = old["threshold"]
    if bm.m_bits != old["m_bits"]:
        raise ValueError(
            f"extend: m_bits {bm.m_bits} != directory's {old['m_bits']}"
            f" — a changed universe invalidates every stripe"
        )
    extending = not (old_n == bm.n
                     and old["content"] == _content_fingerprint(bm))
    if extending:
        _check_extend_head(bm, old_n, old["content"], "extend")
    (res, _sparse, kernel_name) = _walk_resolution(
        bm, sb_old, kernel, config, interpret, bitmap=True)
    sb = res[5]
    if sb != sb_old:
        raise ValueError(
            f"extend: the resumed walk rounds superblock_rows to {sb}, "
            f"not the directory's {sb_old} — reused hit files would "
            f"misalign; match the config/kernel"
        )
    if extending:
        n_super_old = round_up(old_n, sb) // sb
        missing = [
            (i, j)
            for i in range(n_super_old)
            for j in range(i, n_super_old)
            if not os.path.exists(
                os.path.join(out_dir, f"hits_{i:05d}_{j:05d}.npz"))
        ]
        if missing:
            raise ValueError(
                f"extend: the directory is an INCOMPLETE run "
                f"({len(missing)} stripe files missing, e.g. "
                f"{missing[0]}) — resume it to completion first "
                f"(stream_pairs_above(out_dir=...))"
            )
        if old_n % sb:
            # the old last superblock was partial: its zero-padded rows
            # now hold data, so every hit file touching it is stale
            last = old_n // sb
            for i in range(n_super_old):
                for j in range(i, n_super_old):
                    if i == last or j == last:
                        p = os.path.join(out_dir,
                                         f"hits_{i:05d}_{j:05d}.npz")
                        if os.path.exists(p):
                            os.remove(p)
        params = _screen_store_params(bm, sb, kernel_name, measure,
                                      threshold)
        tmp = man_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(params, f)
        os.replace(tmp, man_path)
    return stream_pairs_above(
        bm, threshold, measure=measure, superblock_rows=sb, kernel=kernel,
        config=config, interpret=interpret, out_dir=out_dir, resume=True)


def stream_topk_neighbors(
    bm: BitMatrix,
    k: int,
    *,
    superblock_rows: int = 4096,
    kernel: str = "auto",
    measure: str = "count",
    config: Optional[EngineConfig] = None,
    interpret: Optional[bool] = None,
    out_dir: Optional[str] = None,
    resume: bool = True,
    _extend_from: Optional[int] = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row top-k partners by exact intersection count at streaming
    scale (N bounded by host RAM, not HBM). Returns (counts int32 [N, k],
    indices int32 [N, k]) sorted descending — same values as
    ``query.topk_neighbors``; tie order among equal counts is
    route-dependent there too, and zero-count entries may carry the
    (0, 0) "no partner" convention where the summary skip proved a whole
    stripe zero.

    ``measure``: "count" (default) or a similarity ("jaccard", "dice",
    "cosine", "overlap", "phi", "r2") — then the return is (values
    float64 [N, k], indices int32 [N, k]), exact: dense stripes extract
    float32-ranked candidates with their integer counts and the host
    rescores in float64 with per-stripe certification + escalation
    (cross.py's contract); sparse K4 stripes rank their exact COO scores
    directly (zero-intersection pairs score 0 for these measures, like
    the count route's no-partner convention — tie order among equal
    scores is merge-order-dependent). phi/r2 — which score
    zero-intersection pairs the K4 emission never sees — additionally
    merge per-row zero-intersection candidates from the cardinality
    staircase (``_k4_zero_topk``, the top-k twin of the screens'
    ``_r2_zero_plan``), scored by the same float64 formula, so the
    sparse route stays exact for every measure; summary-skipped
    (co-empty) stripes — which phi/r2 still score — contribute the same
    staircase candidates host-side, so the C8 skip holds for every
    measure without device work.

    ``kernel="auto"`` routes extreme-sparsity inputs to per-superblock
    K4 host emission (no device round-trip per sparse stripe; the
    per-stripe cost model still sends locally dense stripes to the
    device walk) — the reference's sparse regime (C12) at streaming
    query scale. ``kernel="sparse_outer"`` forces that route.

    ``out_dir``: checkpoint the running best after every completed
    stripe ROW (atomic write+rename, like stream.py's stripes) and
    resume from it — an interrupted multi-hour walk restarts at the
    first unfinished superblock row, not from scratch. The checkpoint is
    keyed on (n, m_bits, k, superblock, kernel) PLUS a cheap content
    fingerprint of the matrix; a mismatch raises (``resume=False``
    ignores and overwrites any existing checkpoint)."""
    import json
    import os

    if not 1 <= k < max(bm.n, 2):
        raise ValueError(f"k must be in [1, N-1], got k={k}, N={bm.n}")
    ((cfg, kernel, interpret, ti, wk, sb, variant, w_pad, n_pad,
      n_super), sparse_mode, kernel_name) = _walk_resolution(
        bm, superblock_rows, kernel, config, interpret, bitmap=False)
    plan = None
    if sparse_mode:
        from stormtpu.stream import _SparseStripePlan

        plan = _SparseStripePlan(bm, sb, n_super)
    if k > sb:
        raise ValueError(
            f"k={k} exceeds superblock_rows={sb}: each stripe "
            f"ranks only one superblock of partners; raise superblock_rows"
        )
    if measure != "count":
        from stormtpu.query import _validate_screen

        _validate_screen(measure, 1.0)  # validates the measure name
    tps = sb // ti

    if measure == "count":
        best_v = np.full((n_pad, k), -1, dtype=np.int64)
    else:
        best_v = np.full((n_pad, k), -np.inf, dtype=np.float64)
    best_i = np.zeros((n_pad, k), dtype=np.int32)
    start_i = 0
    ckpt = os.path.join(out_dir, "topk_ckpt.npz") if out_dir else None
    params = _topk_ckpt_params(bm, k, sb, kernel_name)
    if measure != "count":
        params["measure"] = measure
    # an extending walk skips stripes wholly inside the old COMPLETE
    # superblocks (their candidates already sit in the running best);
    # the key rides in params so an interrupted extend can only be
    # resumed as an extend — a plain resume would re-merge old stripes
    j_skip = 0
    if _extend_from is not None:
        params["extend_from"] = int(_extend_from)
        j_skip = int(_extend_from) // sb
    if ckpt and resume and os.path.exists(ckpt):
        with np.load(ckpt, allow_pickle=False) as z:
            got = json.loads(str(z["params"]))
            if got != params:
                raise ValueError(
                    f"checkpoint {ckpt} was written for {got}, not {params}"
                )
            best_v = z["best_v"]
            best_i = z["best_i"]
            start_i = int(z["next_i"])
    elif out_dir:
        os.makedirs(out_dir, exist_ok=True)
    n_dev = jnp.int32(bm.n)
    # the C8 summary skip holds for every measure: a co-empty stripe's
    # counts are all exactly zero, so count/jaccard-family stripes
    # contribute nothing, and phi/r2 stripes (zero intersection ≠ zero
    # score) are pure zero-intersection — their exact contribution is
    # the host-side staircase (_k4_zero_topk with stripe=None), still
    # never touching the device
    occ_sb = _superblock_occupancy(bm, n_pad, sb)
    nnz_pad = np.zeros(n_pad, dtype=np.int64)
    nnz_pad[: bm.n] = bm.row_nnz
    m_f = jnp.float32(bm.m_bits)
    if measure != "count":
        from stormtpu.cross import _MEASURE_TOPK_SLACK
        from stormtpu.setops import derive_similarity
        from stormtpu.utils import next_pow2 as _np2

        kk0 = int(min(_np2(max(2 * k, k + 8)), sb))

    def _measure_stripe_device(i, j, xi_d, xj_d):
        """Certified per-stripe measure candidates: float64 rescore of
        the device's float32 top-kk; escalate kk until the stripe's own
        top-k provably sits inside (at kk=sb the stripe is enumerated)."""
        ni_d = jnp.asarray(nnz_pad[i * sb:(i + 1) * sb].astype(np.int32))
        nj_d = jnp.asarray(nnz_pad[j * sb:(j + 1) * sb].astype(np.int32))
        n_valid_j = max(0, min(bm.n - j * sb, sb)) - (1 if i == j else 0)
        n_valid_i = max(0, min(bm.n - i * sb, sb)) - (1 if i == j else 0)
        kk = kk0
        while True:
            out = _stripe_topk_measure(
                xi_d, xj_d, ni_d, nj_d, jnp.int32(i * sb),
                jnp.int32(j * sb), n_dev, m_f, measure=measure, kk=kk,
                tps=tps, ti=ti, wk=wk, interpret=bool(interpret),
                kernel=kernel, variant=variant, diagonal=i == j,
            )
            sides = []
            certified = True
            for (sv, ix, cv, r0, c0, n_valid) in (
                (out[0], out[1], out[2], i, j, n_valid_j),
                (out[3], out[4], out[5], j, i, n_valid_i),
            ):
                if sv is None:
                    sides.append(None)
                    continue
                sv = np.asarray(sv)
                ix = np.asarray(ix).astype(np.int64)
                cv = np.asarray(cv)
                valid = sv > -np.inf
                f = derive_similarity(
                    cv, nnz_pad[r0 * sb:(r0 + 1) * sb, None],
                    nnz_pad[c0 * sb + ix], bm.m_bits, measure,
                )
                f = np.where(valid, f, -np.inf)
                sides.append((f, (ix + c0 * sb).astype(np.int32)))
                if n_valid > kk:
                    kth = -np.partition(-f, k - 1, axis=1)[:, k - 1]
                    rows_real = (np.arange(sb) + r0 * sb) < bm.n
                    ok = kth > sv[:, -1] + _MEASURE_TOPK_SLACK
                    if not bool(np.all(ok | ~rows_real)):
                        certified = False
            if certified or kk >= sb:
                return sides
            kk = int(min(kk * 2, sb))

    xi_d, xi_idx = None, -1
    for i in range(start_i, n_super):
        dirty = False
        for j in range(i, n_super):
            if j < j_skip:
                continue  # both superblocks inside the old complete range
            if occ_sb is not None and not (occ_sb[i] & occ_sb[j]).any():
                # C8 summary skip: every count in this stripe is exactly
                # zero. For count and the nonnegative measures zero-count
                # partners can only surface as the (0, 0) "no partner"
                # convention, which the final mask emits anyway; phi/r2
                # still score these pure zero-intersection stripes, via
                # the host staircase — either way no device work
                if measure in ("phi", "r2"):
                    va = max(0, min(bm.n - i * sb, sb))
                    vb = max(0, min(bm.n - j * sb, sb))
                    zv, zi = _k4_zero_topk(
                        None, nnz_pad[i * sb:(i + 1) * sb],
                        nnz_pad[j * sb:(j + 1) * sb], bm.m_bits, measure,
                        k, diagonal=i == j, valid_a=va, valid_b=vb,
                        sb_rows=sb)
                    _merge_topk(best_v, best_i,
                                slice(i * sb, (i + 1) * sb),
                                zv, zi + j * sb, k)
                    if i != j:
                        zv, zi = _k4_zero_topk(
                            None, nnz_pad[j * sb:(j + 1) * sb],
                            nnz_pad[i * sb:(i + 1) * sb], bm.m_bits,
                            measure, k, diagonal=False, valid_a=vb,
                            valid_b=va, sb_rows=sb)
                        _merge_topk(best_v, best_i,
                                    slice(j * sb, (j + 1) * sb),
                                    zv, zi + i * sb, k)
                    dirty = True
                continue
            dirty = True
            # phi/r2's zero-intersection staircase is caller-side host
            # work — charge its candidate count to the cost model, like
            # the screens charge _r2_zero_plan's total
            z_extra = 0
            if plan is not None and measure in ("phi", "r2"):
                z_extra = (1 if i == j else 2) * (
                    sb * (k + 1) + plan.emissions(i, j))
            if plan is not None and plan.use_k4(i, j, extra_emissions=z_extra,
                                               emission_path=True):
                # sparse stripe: host K4 emission, no device round-trip.
                # Low-emission stripes come back as a _CooStripe (the r4
                # buffer-free path — no dense sb² buffer anywhere in the
                # query walk either); high-emission ones keep the native
                # dense run walk.
                if plan.emission_eligible(i, j):
                    stripe = _CooStripe(*plan.stripe_coo(i, j), sb)
                else:
                    stripe = plan.stripe_counts(i, j)
                if measure == "count":
                    vi_h, ii_h, vj_h, ij_h = _stripe_topk_candidates_k4(
                        stripe, k, diagonal=i == j)
                    vi_h = vi_h.astype(np.int64)
                    vj_h = None if vj_h is None else vj_h.astype(np.int64)
                else:
                    # exact COO scores (zero-intersection pairs score 0
                    # for jaccard/dice/cosine/overlap; phi/r2 recover
                    # theirs from the staircase candidates below)
                    li, lj, vv = _stripe_nz(stripe)
                    if i == j:
                        nz = li != lj
                        li, lj, vv = li[nz], lj[nz], vv[nz]
                    scores = derive_similarity(
                        vv, nnz_pad[i * sb + li], nnz_pad[j * sb + lj],
                        bm.m_bits, measure,
                    )
                    vi_h, ii_h = _coo_rank_topk(li, lj, scores, sb, k,
                                                fill=-np.inf)
                    vj_h, ij_h = ((None, None) if i == j else
                                  _coo_rank_topk(lj, li, scores, sb, k,
                                                 fill=-np.inf))
                _merge_topk(best_v, best_i, slice(i * sb, (i + 1) * sb),
                            vi_h, ii_h + j * sb, k)
                if i != j:
                    _merge_topk(best_v, best_i,
                                slice(j * sb, (j + 1) * sb),
                                vj_h, ij_h + i * sb, k)
                if measure in ("phi", "r2"):
                    va = max(0, min(bm.n - i * sb, sb))
                    vb = max(0, min(bm.n - j * sb, sb))
                    zv, zi = _k4_zero_topk(
                        stripe, nnz_pad[i * sb:(i + 1) * sb],
                        nnz_pad[j * sb:(j + 1) * sb], bm.m_bits, measure,
                        k, diagonal=i == j, valid_a=va, valid_b=vb)
                    _merge_topk(best_v, best_i,
                                slice(i * sb, (i + 1) * sb),
                                zv, zi + j * sb, k)
                    if i != j:
                        zv, zi = _k4_zero_topk(
                            stripe.T, nnz_pad[j * sb:(j + 1) * sb],
                            nnz_pad[i * sb:(i + 1) * sb], bm.m_bits,
                            measure, k, diagonal=False, valid_a=vb,
                            valid_b=va)
                        _merge_topk(best_v, best_i,
                                    slice(j * sb, (j + 1) * sb),
                                    zv, zi + i * sb, k)
                continue
            if xi_idx != i:
                xi_d = jnp.asarray(
                    _host_superblock(bm.packed, bm.n, sb, w_pad, i)
                )
                xi_idx = i
            xj_d = xi_d if i == j else jnp.asarray(
                _host_superblock(bm.packed, bm.n, sb, w_pad, j)
            )
            if measure != "count":
                side_i, side_j = _measure_stripe_device(i, j, xi_d, xj_d)
                _merge_topk(best_v, best_i, slice(i * sb, (i + 1) * sb),
                            side_i[0], side_i[1], k)
                if side_j is not None:
                    _merge_topk(best_v, best_i,
                                slice(j * sb, (j + 1) * sb),
                                side_j[0], side_j[1], k)
                continue
            vi, ii, vj, ij = _stripe_topk(
                xi_d, xj_d, jnp.int32(i * sb), jnp.int32(j * sb), n_dev,
                k=k, tps=tps, ti=ti, wk=wk, interpret=bool(interpret),
                kernel=kernel, variant=variant, diagonal=i == j,
            )
            _merge_topk(best_v, best_i, slice(i * sb, (i + 1) * sb),
                        np.asarray(vi).astype(np.int64),
                        np.asarray(ii) + j * sb, k)
            if i != j:
                _merge_topk(best_v, best_i, slice(j * sb, (j + 1) * sb),
                            np.asarray(vj).astype(np.int64),
                            np.asarray(ij) + i * sb, k)
        if ckpt and dirty:
            # atomic per-row checkpoint: a crash restarts at the first
            # UNFINISHED row (its partial merges are discarded with the
            # in-memory arrays, so no candidate is ever merged twice).
            # Summary-skipped rows write nothing — re-skipping them on
            # resume is a host-only check, and the full-state write is
            # the expensive part (n_pad·k·12 bytes per row)
            tmp = ckpt + ".tmp"
            with open(tmp, "wb") as f:
                np.savez(f, params=json.dumps(params), best_v=best_v,
                         best_i=best_i, next_i=i + 1)
            os.replace(tmp, ckpt)
    if ckpt and start_i < n_super:
        # completion marker: trailing summary-skipped rows write no
        # per-row checkpoint, so without this a finished walk's ckpt can
        # end with next_i < n_super — the extend wrapper needs an
        # unambiguous "all stripes merged" signal (and a re-run of a
        # finished directory becomes a no-op walk)
        tmp = ckpt + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, params=json.dumps(params), best_v=best_v,
                     best_i=best_i, next_i=n_super)
        os.replace(tmp, ckpt)
    best_v = best_v[: bm.n]
    best_i = best_i[: bm.n]
    order = np.argsort(-best_v, axis=1, kind="stable")
    vals = np.take_along_axis(best_v, order, axis=1)
    idx = np.take_along_axis(best_i, order, axis=1)
    # same post-rule as query.topk_neighbors: only real partners survive
    if measure != "count":
        valid = np.isfinite(vals) & (idx < bm.n)
        return (
            np.where(valid, vals, 0.0),
            np.where(valid, idx, 0).astype(np.int32),
        )
    valid = (vals >= 0) & (idx < bm.n)
    return (
        np.where(valid, vals, 0).astype(np.int32),
        np.where(valid, idx, 0).astype(np.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("measure", "tps", "ti", "wk", "interpret", "kernel",
                     "variant", "diagonal"),
)
def _stripe_screen(
    xi: jax.Array,
    xj: jax.Array,
    nnz_i: jax.Array,
    nnz_j: jax.Array,
    row0_i: jax.Array,
    row0_j: jax.Array,
    n: jax.Array,
    thresh: jax.Array,
    m_f: jax.Array,
    *,
    measure: str,
    tps: int,
    ti: int,
    wk: int,
    interpret: bool,
    kernel: str,
    variant: str,
    diagonal: bool,
):
    """One stripe's screen: packed hit bitmap [SB, SB/32] (global i < j
    triangle only) plus the counts, which stay device-resident for the
    hit-value gather. Diagonal stripes (static flag) run triangular
    tiles — the hit mask only reads the upper triangle anyway."""
    from stormtpu.query import _pack_bit_rows, _screen_vals

    counts = (
        _stripe_diag_counts(xi, tps, ti, wk, interpret, kernel, variant)
        if diagonal
        else _stripe_square_counts(xi, xj, tps, ti, wk, interpret, kernel,
                                   variant)
    )
    vals = _screen_vals(counts, nnz_i, nnz_j, m_f, measure)
    row_g = (
        jax.lax.broadcasted_iota(jnp.int32, counts.shape, 0) + row0_i
    )
    col_g = (
        jax.lax.broadcasted_iota(jnp.int32, counts.shape, 1) + row0_j
    )
    hit = (vals >= thresh) & (col_g > row_g) & (row_g < n) & (col_g < n)
    return _pack_bit_rows(hit), counts


def stream_pairs_above(
    bm: BitMatrix,
    threshold: float,
    *,
    measure: str = "count",
    superblock_rows: int = 4096,
    kernel: str = "auto",
    config: Optional[EngineConfig] = None,
    interpret: Optional[bool] = None,
    out_dir: Optional[str] = None,
    resume: bool = True,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All unordered pairs (i < j) with measure ≥ threshold, at streaming
    scale (operands bounded by host RAM, not HBM). Same contract as
    ``query.pairs_above``: measure "count" or a similarity; returns
    (ii, jj, values) row-major, int32 counts / float64 similarities.

    D2H per stripe is the packed hit bitmap (superblock²/8 bytes) plus
    the hit values gathered from the device-resident stripe counts.

    ``kernel="auto"`` routes extreme-sparsity inputs to per-superblock
    K4 host emission ("sparse_outer" forces it): sparse stripes filter
    their exact COO counts on host with no device round-trip, and for
    r2 — which scores zero-intersection pairs the emission never sees —
    a cardinality staircase enumerates those candidates exactly (see
    ``_r2_zero_plan``); locally dense stripes still take the device
    walk, per the fitted per-stripe cost model.

    ``out_dir``: persist every computed stripe's hits to
    ``hits_{i:05d}_{j:05d}.npz`` (summary-skipped and empty stripes
    write an empty marker) and skip stripes whose file exists — an
    interrupted walk resumes at the first missing stripe, mirroring
    ``stream.stream_count_matrix``. Keyed by a manifest on (n, m_bits,
    superblock, kernel, measure, threshold) plus a cheap content
    fingerprint; a mismatch raises (``resume=False`` overwrites)."""
    import json
    import os

    from stormtpu.query import (
        _expand_words,
        _gather_hit_words,
        _next_pow2,
        _validate_screen,
    )

    dev_thresh = _validate_screen(measure, threshold)
    ((cfg, kernel, interpret, ti, wk, sb, variant, w_pad, n_pad,
      n_super), sparse_mode, kernel_name) = _walk_resolution(
        bm, superblock_rows, kernel, config, interpret, bitmap=True)
    plan = None
    if sparse_mode:
        from stormtpu.stream import _SparseStripePlan

        plan = _SparseStripePlan(bm, sb, n_super)
    tps = sb // ti

    nnz = np.zeros(n_pad, dtype=np.int32)
    nnz[: bm.n] = bm.row_nnz
    n_dev = jnp.int32(bm.n)
    m_f = jnp.float32(bm.m_bits)
    out_i: list[np.ndarray] = []
    out_j: list[np.ndarray] = []
    out_c: list[np.ndarray] = []
    store = _StripeStore(
        out_dir, "screen_manifest.json", "hits_",
        _screen_store_params(bm, sb, kernel_name, measure, threshold),
        resume,
    )

    def _emit(i, j, li, lj, cvals):
        out_i.append(li)
        out_j.append(lj)
        out_c.append(cvals)
        store.save(i, j, ii=li, jj=lj, counts=cvals)

    # C8 summary skip: a summary-zero stripe has all-zero counts, which
    # cannot pass a count screen (threshold >= 1) or a positive
    # jaccard/dice/cosine/overlap threshold — and phi's zero-intersection
    # scores are <= 0 < threshold, so it skips too. r2 DOES score
    # zero-intersection (anti-correlated) pairs: a skipped stripe is PURE
    # zero-intersection, so the staircase emits its hits host-side with
    # no count filter (stripe=None) and no device work.
    occ_sb = _superblock_occupancy(bm, n_pad, sb)
    empty64 = np.zeros(0, dtype=np.int64)
    xi_d, xi_idx = None, -1
    for i in range(n_super):
        for j in range(i, n_super):
            done = store.load(i, j)
            if done is not None:
                if done["ii"].size:
                    out_i.append(done["ii"])
                    out_j.append(done["jj"])
                    out_c.append(done["counts"])
                continue
            if occ_sb is not None and not (occ_sb[i] & occ_sb[j]).any():
                if measure == "r2":
                    z_total, z_mat = _r2_zero_plan(
                        nnz[i * sb : (i + 1) * sb],
                        nnz[j * sb : (j + 1) * sb],
                        bm.m_bits, threshold)
                    if z_total:
                        zr, zc = z_mat(None, i == j)
                        _emit(i, j, zr.astype(np.int64) + i * sb,
                              zc.astype(np.int64) + j * sb,
                              np.zeros(zr.size, dtype=np.int64))
                        continue
                _emit(i, j, empty64, empty64, empty64)
                continue
            if plan is not None:
                # r2's zero-intersection staircase is counted FIRST —
                # its per-candidate host work charges the cost model
                z_total, z_mat = 0, None
                if measure == "r2":
                    z_total, z_mat = _r2_zero_plan(
                        nnz[i * sb : (i + 1) * sb],
                        nnz[j * sb : (j + 1) * sb],
                        bm.m_bits, threshold)
                if plan.use_k4(i, j, extra_emissions=z_total,
                               emission_path=True):
                    if plan.emission_eligible(i, j):
                        stripe = _CooStripe(*plan.stripe_coo(i, j), sb)
                    else:
                        stripe = plan.stripe_counts(i, j)
                    li, lj, vv = _stripe_nz(stripe)
                    if i == j:
                        up = li < lj  # strict upper triangle, no self
                        li, lj, vv = li[up], lj[up], vv[up]
                    gi = li.astype(np.int64) + i * sb
                    gj = lj.astype(np.int64) + j * sb
                    if measure == "count":
                        keep = vv >= threshold
                    else:
                        from stormtpu.setops import derive_similarity

                        keep = derive_similarity(
                            vv, nnz[gi], nnz[gj], bm.m_bits,
                            measure) >= threshold
                    gi, gj, vv = gi[keep], gj[keep], vv[keep]
                    if z_total and z_mat is not None:
                        zr, zc = z_mat(stripe, i == j)
                        gi = np.concatenate([gi, zr + i * sb])
                        gj = np.concatenate([gj, zc + j * sb])
                        vv = np.concatenate(
                            [vv, np.zeros(zr.size, dtype=vv.dtype)])
                    _emit(i, j, gi, gj, vv.astype(np.int64))
                    continue
            if xi_idx != i:
                xi_d = jnp.asarray(
                    _host_superblock(bm.packed, bm.n, sb, w_pad, i)
                )
                xi_idx = i
            xj_d = xi_d if i == j else jnp.asarray(
                _host_superblock(bm.packed, bm.n, sb, w_pad, j)
            )
            hits_d, counts_d = _stripe_screen(
                xi_d, xj_d,
                jnp.asarray(nnz[i * sb : (i + 1) * sb]),
                jnp.asarray(nnz[j * sb : (j + 1) * sb]),
                jnp.int32(i * sb), jnp.int32(j * sb), n_dev,
                dev_thresh, m_f,
                measure=measure, tps=tps, ti=ti, wk=wk,
                interpret=bool(interpret), kernel=kernel, variant=variant,
                diagonal=i == j,
            )
            li, lj = _expand_words(np.asarray(hits_d), np.int32(sb))
            if not li.size:
                _emit(i, j, empty64, empty64, empty64)
                continue
            # gather hit values from the still-device-resident counts
            # (fixed pow2 chunk shapes, same pattern as pair_counts)
            p = li.size
            chunk = int(min(max(_next_pow2(p), 4096), 1 << 16))
            p_pad = round_up(p, chunk)
            ri = np.zeros(p_pad, dtype=np.int32)
            ci = np.zeros(p_pad, dtype=np.int32)
            ri[:p] = li
            ci[:p] = lj
            cvals = np.concatenate([
                np.asarray(_gather_hit_words(
                    counts_d, jnp.asarray(ri[o : o + chunk]),
                    jnp.asarray(ci[o : o + chunk]),
                ))
                for o in range(0, p_pad, chunk)
            ])[:p]
            _emit(i, j, (li + i * sb).astype(np.int64),
                  (lj + j * sb).astype(np.int64), cvals.astype(np.int64))
    if not out_i:
        empty_v = (np.zeros(0, np.int32) if measure == "count"
                   else np.zeros(0, np.float64))
        return np.zeros(0, np.int32), np.zeros(0, np.int32), empty_v
    ii = np.concatenate(out_i)
    jj = np.concatenate(out_j)
    counts = np.concatenate(out_c)
    # stripes emit (superblock pair)-major order; the contract is
    # row-major like the single-chip screen
    order = np.lexsort((jj, ii))
    ii, jj, counts = ii[order], jj[order], counts[order]
    if measure == "count":
        return ii.astype(np.int32), jj.astype(np.int32), counts.astype(np.int32)
    from stormtpu.setops import derive_similarity

    vals = derive_similarity(counts, bm.row_nnz[ii], bm.row_nnz[jj],
                             bm.m_bits, measure)
    keep = vals >= threshold
    return ii[keep].astype(np.int32), jj[keep].astype(np.int32), vals[keep]


@functools.partial(
    jax.jit,
    static_argnames=("measure", "tps", "ti", "wk", "interpret", "kernel",
                     "variant", "diagonal"),
)
def _stripe_screen_complete(
    di: jax.Array,
    dj: jax.Array,
    mi: jax.Array,
    mj: jax.Array,
    row0_i: jax.Array,
    row0_j: jax.Array,
    n: jax.Array,
    thresh: jax.Array,
    *,
    measure: str,
    tps: int,
    ti: int,
    wk: int,
    interpret: bool,
    kernel: str,
    variant: str,
    diagonal: bool,
):
    """One stripe of the PAIRWISE-COMPLETE screen: four count grids
    (data·dataᵀ, data·maskᵀ, mask·dataᵀ, mask·maskᵀ) feed the
    per-pair-universe screen formulas (query._screen_vals_core). On a
    diagonal stripe md = dmᵀ (same row sets) saves one grid, and the
    symmetric grids (inter, mm) take the triangular gather-mirror path.
    Returns the packed hit bitmap; hit values are re-derived exactly on
    host."""
    from stormtpu.query import _pack_bit_rows, _screen_vals_core

    def grid(a, b):
        return _stripe_square_counts(a, b, tps, ti, wk, interpret, kernel,
                                     variant)

    def sym_grid(a, b):
        # diagonal stripes: a IS b and the grid is symmetric
        if diagonal:
            return _stripe_diag_counts(a, tps, ti, wk, interpret, kernel,
                                       variant)
        return grid(a, b)

    inter = sym_grid(di, dj)
    dm = grid(di, mj)
    md = dm.T if diagonal else grid(mi, dj)
    mm = sym_grid(mi, mj)
    vals = _screen_vals_core(
        inter, dm.astype(jnp.float32), md.astype(jnp.float32),
        mm.astype(jnp.float32), measure,
    )
    row_g = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 0) + row0_i
    col_g = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1) + row0_j
    hit = (vals >= thresh) & (col_g > row_g) & (row_g < n) & (col_g < n)
    return _pack_bit_rows(hit)


def extend_stream_pairs_above_complete(
    data: BitMatrix,
    mask: BitMatrix,
    out_dir: str,
    *,
    kernel: str = "auto",
    config: Optional[EngineConfig] = None,
    interpret: Optional[bool] = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Grow a COMPLETED ``stream_pairs_above_complete(out_dir=...)``
    directory to the larger (data, mask) panel (r5): candidate files
    wholly inside the old complete superblocks are reused — candidates
    are over-admitted positions whose values the assembly re-derives
    exactly from the CURRENT packed rows, so unchanged rows reproduce
    identically. BOTH matrices' heads are fingerprint-checked;
    measure/threshold/geometry ride the manifest."""
    import json
    import os

    from stormtpu.setops import _complete_operands

    man_path = os.path.join(out_dir, "complete_screen_manifest.json")
    with open(man_path) as f:
        old = json.load(f)
    old_n = int(old["n"])
    sb_old = int(old["superblock_rows"])
    measure = old["measure"]
    threshold = old["threshold"]
    bm_d, bm_m = _complete_operands(data, mask)
    if bm_d.m_bits != old["m_bits"]:
        raise ValueError(
            f"extend: m_bits {bm_d.m_bits} != directory's "
            f"{old['m_bits']} — a changed universe invalidates every "
            f"stripe"
        )
    extending = not (
        old_n == bm_d.n
        and old["content_data"] == _content_fingerprint(bm_d)
        and old["content_mask"] == _content_fingerprint(bm_m)
    )
    if extending:
        _check_extend_head(bm_d, old_n, old["content_data"],
                           "extend (data)")
        _check_extend_head(bm_m, old_n, old["content_mask"],
                           "extend (mask)")
    res = _resolve_stripe_config(bm_d, sb_old, kernel, config, interpret,
                                 bitmap=True)
    sb = res[5]
    if sb != sb_old:
        raise ValueError(
            f"extend: the resumed walk rounds superblock_rows to {sb}, "
            f"not the directory's {sb_old} — reused candidate files "
            f"would misalign; match the config/kernel"
        )
    if extending:
        n_super_old = round_up(old_n, sb) // sb
        missing = [
            (i, j)
            for i in range(n_super_old)
            for j in range(i, n_super_old)
            if not os.path.exists(
                os.path.join(out_dir, f"chits_{i:05d}_{j:05d}.npz"))
        ]
        if missing:
            raise ValueError(
                f"extend: the directory is an INCOMPLETE run "
                f"({len(missing)} stripe files missing) — resume it to "
                f"completion first (stream_pairs_above_complete"
                f"(out_dir=...))"
            )
        if old_n % sb:
            last = old_n // sb
            for i in range(n_super_old):
                for j in range(i, n_super_old):
                    if i == last or j == last:
                        p = os.path.join(out_dir,
                                         f"chits_{i:05d}_{j:05d}.npz")
                        if os.path.exists(p):
                            os.remove(p)
        params = {
            "n": bm_d.n, "m_bits": bm_d.m_bits, "superblock_rows": sb,
            "kernel": res[1], "measure": measure,
            "threshold": float(threshold),
            "content_data": _content_fingerprint(bm_d),
            "content_mask": _content_fingerprint(bm_m),
        }
        tmp = man_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(params, f)
        os.replace(tmp, man_path)
    return stream_pairs_above_complete(
        data, mask, threshold, measure=measure, superblock_rows=sb,
        kernel=kernel, config=config, interpret=interpret,
        out_dir=out_dir, resume=True)


def stream_pairs_above_complete(
    data: BitMatrix,
    mask: BitMatrix,
    threshold: float,
    *,
    measure: str = "r2",
    superblock_rows: int = 4096,
    kernel: str = "auto",
    config: Optional[EngineConfig] = None,
    interpret: Optional[bool] = None,
    out_dir: Optional[str] = None,
    resume: bool = True,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The PAIRWISE-COMPLETE missing-data screen at streaming scale —
    ``setops.pairs_above_complete`` for N beyond HBM (four superblock
    slices resident per stripe: data and mask of both row blocks; host
    RAM is the bound, like every stream_* form). Same contract: each
    pair is scored over its co-observed universe, float32 slack screen
    on device, hit values re-derived exactly on host from the packed
    rows (float64 refine).

    The data-summary skip applies to jaccard/dice/cosine/overlap (a
    data-co-empty stripe has inter = 0, which zeroes those measures) and
    to phi (its zero-intersection numerator is ≤ 0, below any valid
    threshold). r2 — whose squared numerator can pass a data-co-empty
    stripe — skips on the MASK summaries instead: a stripe whose
    data×mask cross summaries are co-empty in either direction has
    ca′ = 0 (or cb′ = 0) for every pair, zeroing the denominator → score
    0, so the C8 skip holds for every measure here too (the cardinality
    staircase still does not apply — per-pair universes — but it is not
    needed: the skipped stripes contribute no hits at any positive
    threshold).

    ``out_dir``: persist per-stripe candidate pairs and skip completed
    stripes on re-run (the ``stream_pairs_above`` checkpoint contract:
    parameter+content-keyed manifest — fingerprinting BOTH matrices —
    ``resume=False`` purges and overwrites)."""
    import json
    import os

    from stormtpu.query import _expand_words, _validate_screen
    from stormtpu.setops import SIM_OPS, _complete_operands

    if measure not in SIM_OPS:
        raise ValueError(
            f"unknown measure {measure!r}; want one of {SIM_OPS} "
            f"('count' does not depend on the mask — use stream_pairs_above)"
        )
    dev_thresh = _validate_screen(measure, threshold)
    bm_d, bm_m = _complete_operands(data, mask)
    (cfg, kernel, interpret, ti, wk, sb, variant, w_pad, n_pad,
     n_super) = _resolve_stripe_config(
        bm_d, superblock_rows, kernel, config, interpret, bitmap=True)
    tps = sb // ti
    n_dev = jnp.int32(bm_d.n)
    out_i: list[np.ndarray] = []
    out_j: list[np.ndarray] = []
    store = _StripeStore(
        out_dir, "complete_screen_manifest.json", "chits_",
        {"n": bm_d.n, "m_bits": bm_d.m_bits, "superblock_rows": sb,
         "kernel": kernel, "measure": measure,
         "threshold": float(threshold),
         "content_data": _content_fingerprint(bm_d),
         "content_mask": _content_fingerprint(bm_m)},
        resume,
    )

    def _emit(i, j, gi, gj):
        out_i.append(gi)
        out_j.append(gj)
        store.save(i, j, ii=gi, jj=gj)

    empty64 = np.zeros(0, dtype=np.int64)
    # data-summary skip: a data-co-empty stripe has masked inter = 0,
    # which zeroes jaccard/dice/cosine/overlap and makes phi's numerator
    # −ca′·cb′ ≤ 0 < threshold — so phi skips too. r2's squared numerator
    # (ca′·cb′)² can pass a data-co-empty stripe, and the per-pair
    # co-observed universe defeats the simple screen's cardinality
    # staircase (the score is not separable per row) — but the MASK's own
    # summaries close it (VERDICT r3 #5): if the data×mask cross
    # summaries are co-empty in either direction, every pair in the
    # stripe has ca′ = |X_a ∧ O_b| = 0 (or cb′ = 0), which zeroes r2's
    # denominator ca′(m−ca′)·cb′(m−cb′) → score 0 < any valid threshold
    # (strictly positive per _validate_screen). Since data ⊆ mask rowwise
    # (_complete_operands invariant), mask-mask co-emptiness (m = 0)
    # implies both cross conditions, so the cross test subsumes it.
    occ_d = _superblock_occupancy(bm_d, n_pad, sb)
    occ_m = (_superblock_occupancy(bm_m, n_pad, sb)
             if measure == "r2" else None)

    def _stripe_skippable(i: int, j: int) -> bool:
        if occ_d is None:
            return False
        if measure == "r2":
            if occ_m is None:
                return False
            return (not (occ_d[i] & occ_m[j]).any()
                    or not (occ_m[i] & occ_d[j]).any())
        return not (occ_d[i] & occ_d[j]).any()

    di_d = mi_d = None
    xi_idx = -1
    for i in range(n_super):
        for j in range(i, n_super):
            done = store.load(i, j)
            if done is not None:
                if done["ii"].size:
                    out_i.append(done["ii"])
                    out_j.append(done["jj"])
                continue
            if _stripe_skippable(i, j):
                _emit(i, j, empty64, empty64)
                continue
            if xi_idx != i:
                di_d = jnp.asarray(
                    _host_superblock(bm_d.packed, bm_d.n, sb, w_pad, i))
                mi_d = jnp.asarray(
                    _host_superblock(bm_m.packed, bm_m.n, sb, w_pad, i))
                xi_idx = i
            if i == j:
                dj_d, mj_d = di_d, mi_d
            else:
                dj_d = jnp.asarray(
                    _host_superblock(bm_d.packed, bm_d.n, sb, w_pad, j))
                mj_d = jnp.asarray(
                    _host_superblock(bm_m.packed, bm_m.n, sb, w_pad, j))
            hits_d = _stripe_screen_complete(
                di_d, dj_d, mi_d, mj_d,
                jnp.int32(i * sb), jnp.int32(j * sb), n_dev, dev_thresh,
                measure=measure, tps=tps, ti=ti, wk=wk,
                interpret=bool(interpret), kernel=kernel, variant=variant,
                diagonal=i == j,
            )
            li, lj = _expand_words(np.asarray(hits_d), np.int32(sb))
            _emit(i, j, (li + i * sb).astype(np.int64),
                  (lj + j * sb).astype(np.int64))
    if not sum(a.size for a in out_i):
        return (np.zeros(0, np.int32), np.zeros(0, np.int32),
                np.zeros(0, np.float64))
    ii = np.concatenate(out_i)
    jj = np.concatenate(out_j)
    order = np.lexsort((jj, ii))
    ii, jj = ii[order], jj[order]
    from stormtpu.setops import _complete_refine

    return _complete_refine(bm_d, bm_m, ii, jj, measure, threshold)
