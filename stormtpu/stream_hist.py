"""Density-adaptive histogram sinks — the full D1 treatment for the
aggregate-statistics surface (VERDICT r4 #1/#5).

``stats.count_histogram`` routes here by the SAME kernel-resolution
policy as the streaming count walk (``stream._resolve_stream_kernel``),
so the one sink that used to be dense-only now composes with every
regime the engine owns (SURVEY §1):

- regime 2 (ultra-sparse, K4): :func:`stream_hist_sparse` bins each
  stripe's exact nonzero COO from ``_SparseStripePlan.stripe_coo`` and
  puts the zero-pair mass in bin 0 arithmetically — on a uniform
  ultra-sparse panel this replaces the full dense MXU walk (which costs
  ~190× more at the measured 131k×1M shape, BASELINE.md) with host
  work proportional to the emissions. Stripes where the fitted cost
  model prefers the dense kernel fall back per stripe, exactly like the
  counts walk.
- regime 3 (block-clustered, K5): :func:`stream_hist_clustered` runs
  each stripe's summary-AND work list through the K5 executable and
  bins only the VISITED tiles; unvisited tiles' pair mass goes to bin 0
  by the summary argument (their counts are exactly zero). The
  ~1/work_fraction win the counts walk gets from C8 at tile granularity
  now covers the histogram too.
- regime 1 above the device operand budget:
  :func:`stream_hist_streamed` feeds the stripe walk two resident
  superblock slices (HBM as a cache over host RAM, the
  ``stream_count_matrix`` pattern) instead of OOMing a 16 GB v5e on a
  >12 GiB padded operand; the C8 co-empty skip also skips the uploads.

All three share the single-shot sink's manifest contract
(``stream.stream_count_histogram``): uniform bins, last bin absorbs the
tail, mass conservation asserted. D2H per occupied stripe is n_bins
int32 (plus one valid-pair scalar on the clustered route).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stormtpu.config import EngineConfig, default_config
from stormtpu.layout import BitMatrix
from stormtpu.stream import (
    _host_superblock,
    _SparseStripePlan,
    _superblock_pairs,
    cap_hist_superblock,
    default_hist_bin_width as _default_bin_width,
)
from stormtpu.utils import round_up, triangular_tile_ids

__all__ = [
    "stream_hist_sparse",
    "stream_hist_clustered",
    "stream_hist_streamed",
]


def _hist_manifest(n: int, m_bits: int, sb: int, n_super: int, kernel: str,
                   n_bins: int, bin_width: int, hist: np.ndarray,
                   extra: Optional[dict] = None) -> dict:
    expect = n * (n - 1) // 2
    got = int(hist.sum())
    if got != expect:
        raise AssertionError(
            f"histogram mass {got} != n*(n-1)/2 = {expect} — a pair was "
            "double-counted or dropped; this is a bug, not an input error"
        )
    edges = np.minimum(
        np.arange(n_bins + 1, dtype=np.int64) * bin_width, m_bits + 1
    )
    man = {
        "n": n,
        "m_bits": m_bits,
        "superblock_rows": sb,
        "n_super": n_super,
        "kernel": kernel,
        "sink": "histogram",
        "n_bins": n_bins,
        "bin_width": int(bin_width),
        "bin_edges": edges,
        "hist": hist,
        "pairs": got,
    }
    if extra:
        man.update(extra)
    return man


def _valid_rows(n: int, sb: int, i: int) -> int:
    return max(0, min(n - i * sb, sb))


def _stripe_pair_mass(n: int, sb: int, i: int, j: int) -> int:
    """Number of valid global pairs (r < c < n) inside stripe (i, j)."""
    vi, vj = _valid_rows(n, sb, i), _valid_rows(n, sb, j)
    return vi * (vi - 1) // 2 if i == j else vi * vj


def _bin_values(hist: np.ndarray, vals: np.ndarray, bin_width: int,
                n_bins: int) -> None:
    """Accumulate exact integer counts into uniform bins, in place."""
    if vals.size:
        b = np.minimum(vals.astype(np.int64) // bin_width, n_bins - 1)
        hist += np.bincount(b, minlength=n_bins)


@functools.lru_cache(maxsize=32)
def _make_pair_hist_fn(tile_rows: int, tile_words: int, n_bins: int,
                       interpret: bool, variant):
    """Jitted per-stripe histogram over TWO device-resident superblock
    slices (``_compute_stripe_pair``'s layout: diagonal stripes run on
    the i slice alone, off-diagonal on the concatenation with local tile
    ids). Global row/col offsets ride as traced scalars so two
    executables (diagonal / off-diagonal tile-list lengths) serve every
    stripe of a walk."""
    from stormtpu.kernels.mxu import count_tiles_pallas_mxu

    @jax.jit
    def fn(x, ibs, jbs, row0, col0adj, n_real, bw):
        tiles = count_tiles_pallas_mxu(
            x, ibs, jbs, tile_rows=tile_rows, tile_words=tile_words,
            interpret=interpret, variant=variant,
        )
        lane = jnp.arange(tile_rows, dtype=jnp.int32)
        rows_g = row0 + ibs[:, None] * tile_rows + lane[None, :]
        cols_g = col0adj + jbs[:, None] * tile_rows + lane[None, :]
        valid = (rows_g[:, :, None] < cols_g[:, None, :]) & (
            cols_g[:, None, :] < n_real
        )
        bins = jnp.minimum(tiles // bw, jnp.int32(n_bins - 1))

        # per-bin full reductions, not scatter-add (TPU scatter ~2e5/s)
        def one(b, _):
            h = jnp.sum(
                jnp.where(valid & (bins == b), 1, 0), dtype=jnp.int32
            )
            return b + jnp.int32(1), h

        _, hist = jax.lax.scan(one, jnp.int32(0), None, length=n_bins)
        return hist

    return fn


@functools.lru_cache(maxsize=32)
def _make_worklist_hist_fn(ti: int, wk: int, n_bins: int,
                           interpret: bool, variant):
    """Jitted K5 work-list histogram, cached per static geometry —
    rebuilding the closure per walk would retrace/recompile every
    (n_slots, shape) executable on repeated calls (the CLAUDE.md
    cache-compiled-fns rule; 20–60 s per fresh compile on the relay)."""
    from stormtpu.kernels.clustered import count_tiles_worklist

    @functools.partial(jax.jit, static_argnames=("n_slots",))
    def stripe_fn(x, ibs, jbs, gsel, slots, first, vis_ib, vis_jb,
                  slot_ok, n_real, bw, *, n_slots):
        tiles = count_tiles_worklist(
            x, ibs, jbs, gsel, slots, first, n_slots=n_slots,
            tile_rows=ti, tile_words=wk, interpret=interpret,
            variant=variant,
        )
        lane = jnp.arange(ti, dtype=jnp.int32)
        rows_g = vis_ib[:, None] * ti + lane[None, :]
        cols_g = vis_jb[:, None] * ti + lane[None, :]
        valid = (slot_ok[:, None, None] != 0) & (
            rows_g[:, :, None] < cols_g[:, None, :]
        ) & (cols_g[:, None, :] < n_real)
        bins = jnp.minimum(tiles // bw, jnp.int32(n_bins - 1))

        def one(b, _):
            h = jnp.sum(
                jnp.where(valid & (bins == b), 1, 0), dtype=jnp.int32
            )
            return b + jnp.int32(1), h

        _, hist = jax.lax.scan(one, jnp.int32(0), None, length=n_bins)
        # visited valid-pair total ≤ sb² < 2³¹ (cap_hist_superblock)
        return hist, jnp.sum(valid, dtype=jnp.int32)

    return stripe_fn


def stream_hist_streamed(
    bm: BitMatrix,
    *,
    n_bins: int = 64,
    bin_width: Optional[int] = None,
    superblock_rows: int = 4096,
    config: Optional[EngineConfig] = None,
    interpret: bool = False,
    occupancy: Optional[np.ndarray] = None,
    progress: Optional[Callable[[int, int], None]] = None,
) -> dict:
    """Operand-streaming histogram stripe walk: only two superblock
    slices device-resident per stripe (the i slice reused across its
    row), so the padded matrix never needs to fit HBM — the same bound
    the streaming count driver has. Co-empty stripes (C8) bin to 0
    host-side and skip the j upload."""
    from stormtpu.stream_query import _superblock_occupancy
    from stormtpu.tuning import tuned_variant

    cfg = config or default_config()
    cfg.validate(bm.m_bits)
    n = bm.n
    if bin_width is None:
        bin_width = _default_bin_width(bm.m_bits, n_bins)
    tile_rows = min(cfg.k2_tile_rows, round_up(max(n, 32), 32))
    tile_words = cfg.k2_tile_words
    sb = cap_hist_superblock(round_up(superblock_rows, tile_rows), tile_rows)
    n_pad = round_up(n, sb)
    w_pad = round_up(bm.n_words, tile_words)
    tps = sb // tile_rows
    n_super = n_pad // sb
    if occupancy is None:
        occupancy = _superblock_occupancy(bm, n_pad, sb)
    elif occupancy.shape[0] != n_super:
        # a wrong-geometry occupancy is the one error the mass assert
        # cannot catch (skipped stripes credit bin 0 arithmetically) —
        # same guard as stream_count_histogram
        raise ValueError(
            f"occupancy has {occupancy.shape[0]} superblocks, walk has "
            f"{n_super} — compute it with the same superblock_rows "
            f"({sb} after tile rounding and the int32 cap)"
        )
    variant = tuned_variant("k2", cfg.k2_variant)
    fn = _make_pair_hist_fn(tile_rows, tile_words, n_bins,
                            bool(interpret), variant)

    tri_i, tri_j = triangular_tile_ids(tps)
    sq_i, sq_j = np.meshgrid(np.arange(tps, dtype=np.int32),
                             np.arange(tps, dtype=np.int32), indexing="ij")
    sq_i, sq_j = sq_i.ravel(), sq_j.ravel()
    tri_i_d, tri_j_d = jnp.asarray(tri_i), jnp.asarray(tri_j)
    sq_i_d = jnp.asarray(sq_i)
    sq_j_d = jnp.asarray((sq_j + tps).astype(np.int32))

    hist = np.zeros(n_bins, dtype=np.int64)
    total = n_super * (n_super + 1) // 2
    done = 0
    skipped = 0
    xi_d, xi_idx = None, -1
    for i, j in _superblock_pairs(n_super):
        if occupancy is not None and not (occupancy[i] & occupancy[j]).any():
            hist[0] += _stripe_pair_mass(n, sb, i, j)
            skipped += 1
            done += 1
            if progress is not None:
                progress(done, total)
            continue
        if xi_idx != i:
            xi_d = jnp.asarray(
                _host_superblock(bm.packed, n, sb, w_pad, i)
            )
            xi_idx = i
        if i == j:
            x, ibs, jbs = xi_d, tri_i_d, tri_j_d
            col0adj = j * sb
        else:
            xj_d = jnp.asarray(
                _host_superblock(bm.packed, n, sb, w_pad, j)
            )
            x = jnp.concatenate([xi_d, xj_d], axis=0)
            ibs, jbs = sq_i_d, sq_j_d
            col0adj = j * sb - sb  # jbs carry the +tps concat offset
        h = fn(x, ibs, jbs, jnp.int32(i * sb), jnp.int32(col0adj),
               jnp.int32(n), jnp.int32(bin_width))
        hist += np.asarray(h).astype(np.int64)
        done += 1
        if progress is not None:
            progress(done, total)
    return _hist_manifest(
        n, bm.m_bits, sb, n_super, "mxu", n_bins, bin_width, hist,
        extra={"operand_streaming": True, "stripes_skipped": skipped},
    )


def stream_hist_sparse(
    bm: BitMatrix,
    *,
    n_bins: int = 64,
    bin_width: Optional[int] = None,
    superblock_rows: int = 4096,
    config: Optional[EngineConfig] = None,
    interpret: bool = False,
    progress: Optional[Callable[[int, int], None]] = None,
) -> dict:
    """K4-regime histogram: per-superblock inverted-index emission
    (``_SparseStripePlan``), binning each stripe's exact nonzero counts
    and crediting the zero-pair mass to bin 0 arithmetically. Per-stripe
    K4-vs-dense dispatch rides the same fitted cost model as the counts
    walk, so a dense superblock pair inside a sparse panel takes the MXU
    stripe (operand-streaming style) with a device-side bin reduce."""
    from stormtpu.native import HAVE_NATIVE
    from stormtpu.tuning import tuned_variant

    if not HAVE_NATIVE:
        raise RuntimeError(
            "the sparse histogram route needs the native C++ tier "
            "(stormtpu/native build failed or was disabled)"
        )
    cfg = config or default_config()
    cfg.validate(bm.m_bits)
    n = bm.n
    if bin_width is None:
        bin_width = _default_bin_width(bm.m_bits, n_bins)
    tile_rows = cfg.k2_tile_rows
    tile_words = cfg.k2_tile_words
    sb = cap_hist_superblock(round_up(superblock_rows, tile_rows), tile_rows)
    n_pad = round_up(n, sb)
    w_pad = round_up(bm.n_words, tile_words)
    tps = sb // tile_rows
    n_super = n_pad // sb
    plan = _SparseStripePlan(bm, sb, n_super)
    variant = tuned_variant("k2", cfg.k2_variant)

    fn = None  # built lazily: an all-K4 walk never compiles anything
    tri_d = sq_d = None
    hist = np.zeros(n_bins, dtype=np.int64)
    stripe_kernels = {"k4": 0, "dense": 0}
    total = n_super * (n_super + 1) // 2
    done = 0
    xi_d, xi_idx = None, -1
    for i, j in _superblock_pairs(n_super):
        mass = _stripe_pair_mass(n, sb, i, j)
        if plan.use_k4(i, j, emission_path=True):
            if plan.emission_eligible(i, j):
                ci, cj, cv = plan.stripe_coo(i, j)
                if i == j:
                    # the COO mirrors the full square incl. self pairs;
                    # strict upper keeps each unordered pair once
                    cv = cv[ci < cj]
                _bin_values(hist, cv, bin_width, n_bins)
                hist[0] += mass - cv.size
            else:
                stripe = plan.stripe_counts(i, j)
                vi, vj = _valid_rows(n, sb, i), _valid_rows(n, sb, j)
                if i == j:
                    iu = np.triu_indices(vi, k=1)
                    vals = stripe[:vi, :vi][iu]
                else:
                    vals = stripe[:vi, :vj].ravel()
                # vals include the zero pairs — mass lands via bin 0
                _bin_values(hist, vals, bin_width, n_bins)
                if vals.size == 0:
                    hist[0] += mass
            stripe_kernels["k4"] += 1
        else:
            if fn is None:
                fn = _make_pair_hist_fn(tile_rows, tile_words, n_bins,
                                        bool(interpret), variant)
                ti_, tj_ = triangular_tile_ids(tps)
                si_, sj_ = np.meshgrid(
                    np.arange(tps, dtype=np.int32),
                    np.arange(tps, dtype=np.int32), indexing="ij")
                tri_d = (jnp.asarray(ti_), jnp.asarray(tj_))
                sq_d = (jnp.asarray(si_.ravel()),
                        jnp.asarray((sj_.ravel() + tps).astype(np.int32)))
            if xi_idx != i:
                xi_d = jnp.asarray(
                    _host_superblock(bm.packed, n, sb, w_pad, i)
                )
                xi_idx = i
            if i == j:
                x, (ibs, jbs) = xi_d, tri_d
                col0adj = j * sb
            else:
                xj_d = jnp.asarray(
                    _host_superblock(bm.packed, n, sb, w_pad, j)
                )
                x = jnp.concatenate([xi_d, xj_d], axis=0)
                ibs, jbs = sq_d
                col0adj = j * sb - sb
            h = fn(x, ibs, jbs, jnp.int32(i * sb), jnp.int32(col0adj),
                   jnp.int32(n), jnp.int32(bin_width))
            hist += np.asarray(h).astype(np.int64)
            stripe_kernels["dense"] += 1
        done += 1
        if progress is not None:
            progress(done, total)
    return _hist_manifest(
        n, bm.m_bits, sb, n_super, "sparse_outer", n_bins, bin_width, hist,
        extra={"stripe_kernels": stripe_kernels},
    )


def stream_hist_clustered(
    bm: BitMatrix,
    *,
    n_bins: int = 64,
    bin_width: Optional[int] = None,
    superblock_rows: int = 4096,
    config: Optional[EngineConfig] = None,
    interpret: bool = False,
    operand_streaming: Optional[bool] = None,
    progress: Optional[Callable[[int, int], None]] = None,
) -> Optional[dict]:
    """K5-regime histogram: per-stripe summary-AND work lists — only the
    co-occupied (tile pair, K-group) items run; the unvisited tiles'
    pair mass goes to bin 0 by the summary argument (their counts are
    exactly zero). The device returns the visited tiles' bin partials
    PLUS their valid-pair total, so the bin-0 remainder is one
    subtraction per stripe. Returns None when the geometry degenerates
    (single K-group) — the caller falls back to the dense route."""
    from stormtpu.kernels.clustered import (
        _block_occupancy,
        build_stripe_worklist,
    )
    from stormtpu.stream import _device_operand_budget
    from stormtpu.tuning import tuned_variant

    cfg = config or default_config()
    cfg.validate(bm.m_bits)
    geo = _block_occupancy(bm, cfg)
    if geo is None:
        return None
    occ, ti, wk, _, nb, ng = geo
    n = bm.n
    if bin_width is None:
        bin_width = _default_bin_width(bm.m_bits, n_bins)
    sb = cap_hist_superblock(round_up(superblock_rows, ti), ti)
    tps = sb // ti
    n_sb_pad = round_up(n, sb)
    nb_sb = n_sb_pad // ti
    if nb_sb > nb:
        occ = np.concatenate(
            [occ, np.zeros((nb_sb - nb, ng), dtype=bool)], axis=0
        )
    n_super = n_sb_pad // sb
    variant = tuned_variant("k2", cfg.k2_variant)
    w_pad = (ng + 1) * wk  # trailing zero pad K-group serves the fillers

    if operand_streaming is None:
        operand_streaming = n_sb_pad * w_pad * 4 > _device_operand_budget()
    if operand_streaming:
        packed_d = None
    else:
        def build():
            xp = np.zeros((n_sb_pad, w_pad), dtype=np.uint32)
            xp[: n, : bm.n_words] = bm.packed
            return jnp.asarray(xp)

        packed_d = bm.device_cached(("padded2dz", n_sb_pad, w_pad), build)

    stripe_fn = _make_worklist_hist_fn(ti, wk, n_bins, bool(interpret),
                                       variant)
    hist = np.zeros(n_bins, dtype=np.int64)
    work_items = 0
    total = n_super * (n_super + 1) // 2
    done = 0
    skipped = 0
    xi_d, xi_idx = None, -1
    for i, j in _superblock_pairs(n_super):
        mass = _stripe_pair_mass(n, sb, i, j)
        wl = build_stripe_worklist(occ, i * tps, j * tps, tps, i == j)
        if wl is None:
            hist[0] += mass
            skipped += 1
            done += 1
            if progress is not None:
                progress(done, total)
            continue
        # global tile coords of each output slot; padding slots masked
        vis_ib = np.zeros(wl.n_slots, dtype=np.int32)
        vis_jb = np.zeros(wl.n_slots, dtype=np.int32)
        slot_ok = np.zeros(wl.n_slots, dtype=np.int32)
        vis_ib[: wl.n_vis] = wl.vis_loc_i + i * tps
        vis_jb[: wl.n_vis] = wl.vis_loc_j + j * tps
        slot_ok[: wl.n_vis] = 1
        if operand_streaming:
            if xi_idx != i:
                xi_d = jnp.asarray(
                    _host_superblock(bm.packed, n, sb, w_pad, i)
                )
                xi_idx = i
            if i == j:
                x = xi_d
                ibs_l = wl.ibs - i * tps
                jbs_l = wl.jbs - i * tps
            else:
                xj_d = jnp.asarray(
                    _host_superblock(bm.packed, n, sb, w_pad, j)
                )
                x = jnp.concatenate([xi_d, xj_d], axis=0)
                ibs_l = wl.ibs - i * tps
                jbs_l = (wl.jbs - j * tps) + tps
        else:
            x = packed_d
            ibs_l, jbs_l = wl.ibs, wl.jbs
        h, n_valid = stripe_fn(
            x,
            jnp.asarray(ibs_l), jnp.asarray(jbs_l),
            jnp.asarray(wl.gsel), jnp.asarray(wl.slots),
            jnp.asarray(wl.first),
            jnp.asarray(vis_ib), jnp.asarray(vis_jb),
            jnp.asarray(slot_ok),
            jnp.int32(n), jnp.int32(bin_width),
            n_slots=wl.n_slots,
        )
        hist += np.asarray(h).astype(np.int64)
        # unvisited tiles hold exactly-zero counts (summary argument):
        # their share of the stripe's valid mass is pure bin-0
        hist[0] += mass - int(np.asarray(n_valid))
        work_items += wl.n_work
        done += 1
        if progress is not None:
            progress(done, total)
    return _hist_manifest(
        n, bm.m_bits, sb, n_super, "clustered", n_bins, bin_width, hist,
        extra={"work_items": work_items, "stripes_skipped": skipped,
               "operand_streaming": bool(operand_streaming),
               "tile_rows": ti},
    )
