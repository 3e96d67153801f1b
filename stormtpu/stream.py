"""Streaming all-pairs driver with checkpoint/resume.

For large N the N×N count matrix cannot be materialized (100k rows → 40 GB
int32; 1M rows → 4 TB), so results are produced as **superblock stripes**
written incrementally to disk, keyed by (row-superblock, col-superblock)
pair id — the checkpoint/resume design SURVEY.md §6 prescribes (the
reference has none: its calls are seconds-long, C library). A re-run
resumes at superblock-pair granularity by skipping completed shards.

Output format: one ``stripe_{I:05d}_{J:05d}.npz`` per superblock pair
(upper triangle only; mirror at read time) plus ``manifest.json`` with the
matrix shape, superblock size, and completion record.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Iterator, Optional

import jax.numpy as jnp
import numpy as np

from stormtpu.config import EngineConfig, default_config
from stormtpu.layout import BitMatrix
from stormtpu.utils import pallas_interpret_default, round_up, triangular_tile_ids

__all__ = [
    "stream_count_matrix",
    "stream_count_checksums",
    "stream_count_checksums_clustered",
    "stream_count_histogram",
    "extend_streamed_matrix",
    "load_streamed_matrix",
    "stripe_path",
]


def stripe_path(out_dir: str, i: int, j: int) -> str:
    return os.path.join(out_dir, f"stripe_{i:05d}_{j:05d}.npz")


def _content_fingerprint(bm: BitMatrix) -> str:
    """Cheap content key for resume/extend directories: shape alone is
    not identity (a regenerated same-shape matrix must NOT silently
    reuse stale stripes). Row popcounts catch any bit-count change; the
    boundary-row CRCs catch same-popcount edits at the ends. Not
    cryptographic — a safety net, not a proof. (Moved here from
    stream_query in r4 so the counts manifests can carry it too.)"""
    import zlib

    h = zlib.crc32(np.ascontiguousarray(bm.row_nnz).tobytes())
    if bm.n:
        h = zlib.crc32(np.ascontiguousarray(bm.packed[0]).tobytes(), h)
        h = zlib.crc32(np.ascontiguousarray(bm.packed[-1]).tobytes(), h)
    return f"{int(bm.nnz)}-{h:08x}"


def _device_operand_budget() -> int:
    """HBM budget for keeping the whole padded matrix device-resident.
    Above it the driver flips to operand streaming (HBM as a cache over
    host RAM: two superblock slices resident at a time). Default leaves
    ~4 GB of a v5e's 16 GB for count tiles, unpack buffers and XLA
    scratch; override via STORMTPU_DEVICE_OPERAND_BUDGET_BYTES."""
    env = os.environ.get("STORMTPU_DEVICE_OPERAND_BUDGET_BYTES")
    if env:
        return int(env)
    return 12 << 30


def _device_refuse_budget() -> int:
    """Hard HBM ceiling for the refusal guards on single-shot device
    routes (``require_device_budget``) — distinct from the softer
    ``_device_operand_budget``, which flips the streaming driver into
    operand-streaming mode instead of refusing. Anchor: the measured
    100k × 1M-bit screen (operand 12.5 GB + hit bitmap 1.25 GB =
    12.8 GiB) runs on a 16 GB v5e (BASELINE.md), so refusal must start
    above that; 13.5 GiB leaves ~1.5 GB for unpack buffers and XLA
    scratch. Override via STORMTPU_DEVICE_REFUSE_BUDGET_BYTES."""
    env = os.environ.get("STORMTPU_DEVICE_REFUSE_BUDGET_BYTES")
    if env:
        return int(env)
    return 27 << 29


def require_device_budget(need_bytes: int, what: str, hint: str) -> None:
    """Refuse a device route whose HBM footprint cannot fit, pointing at
    the streaming alternative — the single home for this policy (three
    hand-rolled copies diverged in round 2: one strategy branch bypassed
    its guard entirely and another over-refused a measured-working
    shape)."""
    if need_bytes > _device_refuse_budget():
        raise ValueError(
            f"{what} (~{need_bytes / (1 << 30):.1f} GiB) exceeds the "
            f"device budget ({_device_refuse_budget() / (1 << 30):.1f} "
            f"GiB); {hint}"
        )


def default_hist_bin_width(m_bits: int, n_bins: int) -> int:
    """Uniform bin width covering [0, m_bits] in ``n_bins`` (a pair
    count can equal m_bits) — ONE home for the formula; the four
    histogram routes had grown three copies (r5 review)."""
    return max(1, -(-(m_bits + 1) // n_bins))


def cap_hist_superblock(sb: int, unit: int) -> int:
    """Largest multiple of ``unit`` ≤ ``sb`` whose square stays below
    2³¹ — the histogram sinks accumulate per-stripe bin partials in
    int32 and a stripe holds up to sb² pairs, so a user-chosen
    superblock_rows > 46340 would overflow (the ring route halves its
    block_rows for the same reason; advisor r4). Raises when ``unit``
    itself is too large to satisfy the bound."""
    cap = (46340 // unit) * unit  # floor(sqrt(2^31 − 1)) = 46340
    if cap <= 0:
        raise ValueError(
            f"histogram stripe unit {unit} already exceeds the int32 "
            f"pair-count bound (unit² ≥ 2³¹) — use fewer row shards or "
            f"the ring route"
        )
    return min(max(sb, unit), cap)


def _host_superblock(
    packed: np.ndarray, n: int, superblock_rows: int, w_pad: int, i: int
) -> np.ndarray:
    """Zero-padded host slice [superblock_rows, w_pad] of row-superblock
    ``i`` of a packed uint32 [n, W] matrix."""
    out = np.zeros((superblock_rows, w_pad), dtype=np.uint32)
    r0 = i * superblock_rows
    r1 = min(n, r0 + superblock_rows)
    if r1 > r0:
        out[: r1 - r0, : packed.shape[1]] = packed[r0:r1]
    return out


def _auto_stream_kernel(m_bits: int, n: Optional[int] = None) -> str:
    """Map the tuned dense winner (or heuristics) onto a stripe kernel.

    XLA forms materialize 8× unpacked operands / full-stripe broadcasts,
    so they are only eligible at small M.
    """
    from stormtpu.kernels import MXU_XLA_MAX_BITS
    from stormtpu.tuning import measured_dense_winner

    winner = measured_dense_winner(n, m_bits)
    small_m = m_bits <= MXU_XLA_MAX_BITS
    if winner in ("mxu", "pallas_mxu"):
        return "xla_int8" if (winner == "mxu" and small_m) else "mxu"
    if winner in ("popcount", "pallas_dense"):
        return "xla_popcount" if (winner == "popcount" and small_m) else "dense"
    return "xla_int8" if small_m else "mxu"


def _superblock_pairs(n_super: int) -> Iterator[tuple[int, int]]:
    for i in range(n_super):
        for j in range(i, n_super):
            yield i, j


def _resolve_stream_kernel(bm: BitMatrix, kernel: str,
                           cfg: EngineConfig) -> str:
    """The streaming walk's kernel-resolution policy, factored out so
    callers that must PREDICT the geometry (``extend_streamed_matrix``)
    resolve identically to the walk itself."""
    if kernel == "auto":
        kernel = _auto_stream_kernel(bm.m_bits, bm.n)
        # C12 at streaming scale (the reference's sparse regime has no
        # size ceiling; K4's single-shot form is capped at N=32768 by its
        # N² host buffer): at extreme sparsity route to the per-superblock
        # inverted-index walk — buffers are superblock², and each stripe
        # pair re-decides K4-vs-dense with the fitted cost model. This
        # check runs BEFORE the clustered one, mirroring dispatch.py's
        # priority: below the density threshold K4 beats the K5 skip at
        # every measured shape (K5 still pays work_fraction × the dense
        # device cost; K4's work scales with nnz², not N²·M), and a
        # stripe where K4 loses falls back to the dense MXU walk anyway.
        from stormtpu.native import HAVE_NATIVE

        if (
            HAVE_NATIVE
            and bm.n >= 2
            and bm.density < cfg.sparse_density_threshold
        ):
            kernel = "sparse_outer"
        else:
            # C8 skip at streaming scale: when the summary-AND
            # co-occupancy says most (tile pair, K-group) cells are
            # co-empty, the work-list stripes win by ≈ 1/fraction over
            # ANY dense stripe walk — same statistic as the
            # single-matrix dispatch
            from stormtpu.kernels.clustered import clustered_work_fraction

            wf = clustered_work_fraction(bm, cfg)
            if wf is not None and wf < cfg.clustered_work_fraction_threshold:
                kernel = "clustered"
    if kernel not in ("mxu", "dense", "xla_int8", "xla_popcount",
                      "clustered", "sparse_outer"):
        # an unknown string would silently run the k1-dense branch
        raise ValueError(
            f"unknown kernel {kernel!r}; want 'auto' or one of "
            f"('mxu', 'dense', 'xla_int8', 'xla_popcount', 'clustered', "
            f"'sparse_outer')"
        )
    return kernel


def _stream_tile_modulus(kernel: str, cfg: EngineConfig) -> int:
    """The row modulus a resolved stream kernel rounds superblock_rows
    to (mxu/clustered/sparse_outer tile by k2 rows; dense and the xla_*
    whole-stripe forms by k1 rows)."""
    if kernel in ("mxu", "clustered", "sparse_outer"):
        return cfg.k2_tile_rows
    return cfg.k1_tile_rows


def _compute_stripe(
    xp: jnp.ndarray,
    sb_i: int,
    sb_j: int,
    tiles_per_super: int,
    tile_rows: int,
    tile_words: int,
    interpret: bool,
    kernel: str,
) -> np.ndarray:
    """Counts int32 [SB, SB] for superblock pair (sb_i, sb_j) of the padded
    packed matrix, using the tile kernels' scalar-prefetch pair lists (or a
    whole-stripe XLA kernel for the xla_* choices)."""
    if kernel in ("xla_int8", "xla_popcount"):
        from stormtpu.kernels import xla as kx

        sb = tiles_per_super * tile_rows
        xi = xp[sb_i * sb : (sb_i + 1) * sb]
        xj = xp[sb_j * sb : (sb_j + 1) * sb]
        if kernel == "xla_int8":
            out = kx.count_block_int8_xla(xi, xj)
        else:
            out = kx.count_block_popcount_xla(xi, xj)
        return np.asarray(out)
    if kernel == "mxu":
        from stormtpu.kernels.mxu import count_tiles_pallas_mxu as count_tiles
    else:
        from stormtpu.kernels.dense import count_tiles_pallas_dense as count_tiles

    base_i = sb_i * tiles_per_super
    base_j = sb_j * tiles_per_super
    if sb_i == sb_j:
        loc_i, loc_j = triangular_tile_ids(tiles_per_super)
    else:
        loc_i, loc_j = np.meshgrid(
            np.arange(tiles_per_super, dtype=np.int32),
            np.arange(tiles_per_super, dtype=np.int32),
            indexing="ij",
        )
        loc_i, loc_j = loc_i.ravel(), loc_j.ravel()
    ibs = (loc_i + base_i).astype(np.int32)
    jbs = (loc_j + base_j).astype(np.int32)
    tiles = np.asarray(
        count_tiles(
            xp,
            jnp.asarray(ibs),
            jnp.asarray(jbs),
            tile_rows=tile_rows,
            tile_words=tile_words,
            interpret=interpret,
        )
    )
    return _assemble_stripe(
        tiles, loc_i, loc_j, tiles_per_super, tile_rows, sb_i == sb_j
    )


def _compute_stripe_pair(
    xi: jnp.ndarray,
    xj: Optional[jnp.ndarray],
    tiles_per_super: int,
    tile_rows: int,
    tile_words: int,
    interpret: bool,
    kernel: str,
) -> np.ndarray:
    """Operand-streaming twin of ``_compute_stripe``: the stripe for two
    device-resident superblock slices (``xj=None`` ⇒ ``xi``'s diagonal
    stripe) — nothing else of the matrix is on the device. Off-diagonal
    tile walks run on the on-device concatenation [xi; xj] with local
    tile-block ids (the tile kernels are index-map-steered, so the same
    executable serves every stripe of a run)."""
    if kernel in ("xla_int8", "xla_popcount"):
        from stormtpu.kernels import xla as kx

        xb = xi if xj is None else xj
        if kernel == "xla_int8":
            out = kx.count_block_int8_xla(xi, xb)
        else:
            out = kx.count_block_popcount_xla(xi, xb)
        return np.asarray(out)
    if kernel == "mxu":
        from stormtpu.kernels.mxu import count_tiles_pallas_mxu as count_tiles
    else:
        from stormtpu.kernels.dense import count_tiles_pallas_dense as count_tiles

    tps = tiles_per_super
    if xj is None:
        loc_i, loc_j = triangular_tile_ids(tps)
        x = xi
        jb = loc_j
    else:
        loc_i, loc_j = np.meshgrid(
            np.arange(tps, dtype=np.int32),
            np.arange(tps, dtype=np.int32),
            indexing="ij",
        )
        loc_i, loc_j = loc_i.ravel(), loc_j.ravel()
        x = jnp.concatenate([xi, xj], axis=0)
        jb = loc_j + tps
    tiles = np.asarray(
        count_tiles(
            x,
            jnp.asarray(loc_i.astype(np.int32)),
            jnp.asarray(jb.astype(np.int32)),
            tile_rows=tile_rows,
            tile_words=tile_words,
            interpret=interpret,
        )
    )
    return _assemble_stripe(
        tiles, loc_i, loc_j, tps, tile_rows, xj is None
    )


def _assemble_stripe(
    tiles: np.ndarray,
    loc_i: np.ndarray,
    loc_j: np.ndarray,
    tps: int,
    tile_rows: int,
    diagonal: bool,
) -> np.ndarray:
    """Dense [SB, SB] stripe from per-tile counts at local tile coords.
    Vectorized scatter-assembly (a Python per-tile loop here cost 256
    host copies per stripe at superblock 4096 / ti 256 — real wall time
    across config 4's 325 stripes on a 1-core host). ``diagonal`` mirrors
    the strictly-upper local tiles transposed (triangular tile lists).
    Unlisted tiles are zero — the clustered stripes rely on this."""
    grid = np.zeros((tps, tps, tile_rows, tile_rows), dtype=np.int32)
    if tiles.size:
        grid[loc_i, loc_j] = tiles
        if diagonal:
            off = loc_i != loc_j
            grid[loc_j[off], loc_i[off]] = tiles[off].transpose(0, 2, 1)
    sb = tps * tile_rows
    return grid.transpose(0, 2, 1, 3).reshape(sb, sb)


def stream_count_matrix(
    bm: BitMatrix,
    out_dir: str,
    *,
    superblock_rows: int = 4096,
    kernel: str = "mxu",
    config: Optional[EngineConfig] = None,
    resume: bool = True,
    compress: bool = True,
    interpret: Optional[bool] = None,
    operand_streaming: Optional[bool] = None,
    progress: Optional[Callable[[int, int], None]] = None,
) -> dict:
    """Compute all upper-triangular superblock stripes of the count matrix,
    writing each to ``out_dir`` as it completes. Returns the manifest.

    ``resume=True`` skips stripes whose shard file already exists (resume
    at block-pair granularity after interruption).

    ``operand_streaming`` (default auto): when the padded packed matrix
    exceeds the device budget (``_device_operand_budget``), keep only two
    superblock slices device-resident per stripe — HBM becomes a cache
    over host RAM, so single-chip N is bounded by host memory like the
    reference's single-node driver (SURVEY.md §3 C11), not by HBM.
    H2D volume is one row-superblock per stripe (the i slice is reused
    across its row of stripes): total ≈ N²·W·4 / (2·superblock_rows)
    bytes — pick large superblocks to amortize.
    """
    cfg = config or default_config()
    cfg.validate(bm.m_bits)
    if interpret is None:
        interpret = pallas_interpret_default()
    kernel = _resolve_stream_kernel(bm, kernel, cfg)
    if kernel == "sparse_outer":
        # forced request (auto only picks this when HAVE_NATIVE): without
        # the native tier the walk dies mid-run on an opaque np.nonzero —
        # refuse up front like stream_query._sparse_mode_for does
        from stormtpu.native import HAVE_NATIVE

        if not HAVE_NATIVE:
            raise RuntimeError(
                "kernel='sparse_outer' needs the native C++ tier "
                "(stormtpu/native build failed or was disabled)"
            )
        return _stream_sparse_outer(
            bm, out_dir, superblock_rows=superblock_rows, config=cfg,
            resume=resume, compress=compress, interpret=bool(interpret),
            progress=progress,
        )
    if kernel == "clustered":
        return _stream_clustered(
            bm, out_dir, superblock_rows=superblock_rows, config=cfg,
            resume=resume, compress=compress, interpret=bool(interpret),
            operand_streaming=operand_streaming, progress=progress,
        )
    tile_rows = cfg.k2_tile_rows if kernel == "mxu" else cfg.k1_tile_rows
    tile_words = cfg.k2_tile_words if kernel == "mxu" else cfg.k1_tile_words
    superblock_rows = round_up(superblock_rows, tile_rows)
    tiles_per_super = superblock_rows // tile_rows

    n_pad = round_up(bm.n, superblock_rows)
    w_pad = round_up(bm.n_words, tile_words)
    if operand_streaming is None:
        operand_streaming = n_pad * w_pad * 4 > _device_operand_budget()
    if operand_streaming:
        xp = None
    else:
        xp = jnp.zeros((n_pad, w_pad), dtype=jnp.uint32)
        xp = xp.at[: bm.n, : bm.n_words].set(jnp.asarray(bm.packed))
    n_super = n_pad // superblock_rows

    os.makedirs(out_dir, exist_ok=True)
    manifest = {
        "n": bm.n,
        "content": _content_fingerprint(bm),
        "m_bits": bm.m_bits,
        "superblock_rows": superblock_rows,
        "n_super": n_super,
        "kernel": kernel,
        "operand_streaming": bool(operand_streaming),
        "completed": [],
    }
    total = n_super * (n_super + 1) // 2
    done = 0
    xi_d, xi_idx = None, -1
    for i, j in _superblock_pairs(n_super):
        path = stripe_path(out_dir, i, j)
        if resume and os.path.exists(path):
            manifest["completed"].append([i, j])
            done += 1
            continue
        if operand_streaming:
            # the i slice is uploaded lazily (a fully-resumed stripe row
            # costs no H2D at all) and reused across its row of stripes
            if xi_idx != i:
                xi_d = jnp.asarray(
                    _host_superblock(bm.packed, bm.n, superblock_rows,
                                     w_pad, i)
                )
                xi_idx = i
            xj_d = None if i == j else jnp.asarray(
                _host_superblock(bm.packed, bm.n, superblock_rows, w_pad, j)
            )
            stripe = _compute_stripe_pair(
                xi_d, xj_d, tiles_per_super, tile_rows, tile_words,
                bool(interpret), kernel,
            )
        else:
            stripe = _compute_stripe(
                xp, i, j, tiles_per_super, tile_rows, tile_words,
                bool(interpret), kernel,
            )
        tmp = path + ".tmp.npz"
        # compress=False writes at disk speed — zlib at ~50 MB/s on a
        # 1-core host becomes the wall once stripes outpace compute
        save = np.savez_compressed if compress else np.savez
        save(tmp, counts=stripe, i=i, j=j)
        os.replace(tmp, path)
        manifest["completed"].append([i, j])
        done += 1
        if progress is not None:
            progress(done, total)
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def _stream_clustered(
    bm: BitMatrix,
    out_dir: str,
    *,
    superblock_rows: int,
    config: EngineConfig,
    resume: bool,
    compress: bool,
    interpret: bool,
    operand_streaming: Optional[bool],
    progress: Optional[Callable[[int, int], None]],
) -> dict:
    """K5 at streaming scale: per-stripe summary-AND work lists over the
    global per-tile-block K-group occupancy. Stripes whose summaries
    co-occupy nothing never touch the device; the rest run only their
    co-occupied (tile pair, K-group) items, so a clustered input's whole
    run costs ≈ work_fraction of the dense stripe walk — and its stripe
    files store only the visited tiles (disk shrinks by the same factor).

    Stripe format: ``tiles`` int32 [n_vis, ti, ti] + local tile coords
    (``loc_i``/``loc_j``); ``load_streamed_matrix`` scatter-assembles.
    Zero stripes write an n_vis=0 file, keeping the resume-by-file
    contract of the dense path.

    ``operand_streaming`` works as in the dense walk (two superblock
    slices device-resident; work-list tile-block ids shift to the local
    frame), with one extra win: summary-zero stripes skip the upload too.
    """
    from stormtpu.kernels.clustered import (
        _block_occupancy,
        build_stripe_worklist,
        count_tiles_worklist,
    )
    from stormtpu.tuning import tuned_variant

    cfg = config
    geo = _block_occupancy(bm, cfg)
    if geo is None:
        # single K-group: nothing to skip — dense stripe walk is exact
        return stream_count_matrix(
            bm, out_dir, superblock_rows=superblock_rows, kernel="mxu",
            config=cfg, resume=resume, compress=compress,
            interpret=interpret, operand_streaming=operand_streaming,
            progress=progress,
        )
    occ, ti, wk, n_pad, nb, ng = geo
    superblock_rows = round_up(superblock_rows, ti)
    tps = superblock_rows // ti
    n_sb_pad = round_up(bm.n, superblock_rows)
    nb_sb = n_sb_pad // ti
    if nb_sb > nb:
        # superblock padding rows: zero occupancy → never listed, tiles
        # exactly zero
        occ = np.concatenate(
            [occ, np.zeros((nb_sb - nb, ng), dtype=bool)], axis=0
        )
    n_super = n_sb_pad // superblock_rows
    variant = tuned_variant("k2", cfg.k2_variant)
    w_pad = (ng + 1) * wk  # trailing all-zero pad K-group for fillers

    if operand_streaming is None:
        operand_streaming = n_sb_pad * w_pad * 4 > _device_operand_budget()
    if operand_streaming:
        packed_d = None
    else:
        def build():
            xp = np.zeros((n_sb_pad, w_pad), dtype=np.uint32)
            xp[: bm.n, : bm.n_words] = bm.packed
            return jnp.asarray(xp)

        packed_d = bm.device_cached(("padded2dz", n_sb_pad, w_pad), build)

    os.makedirs(out_dir, exist_ok=True)
    manifest = {
        "n": bm.n,
        "content": _content_fingerprint(bm),
        "m_bits": bm.m_bits,
        "superblock_rows": superblock_rows,
        "n_super": n_super,
        "kernel": "clustered",
        "tile_rows": ti,
        "operand_streaming": bool(operand_streaming),
        "work_items": 0,
        "completed": [],
    }
    total = n_super * (n_super + 1) // 2
    done = 0
    xi_d, xi_idx = None, -1
    for i, j in _superblock_pairs(n_super):
        path = stripe_path(out_dir, i, j)
        if resume and os.path.exists(path):
            manifest["completed"].append([i, j])
            done += 1
            continue
        wl = build_stripe_worklist(occ, i * tps, j * tps, tps, i == j)
        if wl is None:
            tiles = np.zeros((0, ti, ti), dtype=np.int32)
            loc_i = loc_j = np.zeros(0, dtype=np.int32)
        else:
            if operand_streaming:
                # summary-zero stripes never reach this branch, so they
                # cost no H2D either; the i slice persists across its row
                if xi_idx != i:
                    xi_d = jnp.asarray(
                        _host_superblock(bm.packed, bm.n, superblock_rows,
                                         w_pad, i)
                    )
                    xi_idx = i
                if i == j:
                    x = xi_d
                    ibs_l = wl.ibs - i * tps
                    jbs_l = wl.jbs - i * tps
                else:
                    xj_d = jnp.asarray(
                        _host_superblock(bm.packed, bm.n, superblock_rows,
                                         w_pad, j)
                    )
                    x = jnp.concatenate([xi_d, xj_d], axis=0)
                    ibs_l = wl.ibs - i * tps
                    jbs_l = (wl.jbs - j * tps) + tps
            else:
                x = packed_d
                ibs_l, jbs_l = wl.ibs, wl.jbs
            out = count_tiles_worklist(
                x,
                jnp.asarray(ibs_l), jnp.asarray(jbs_l),
                jnp.asarray(wl.gsel), jnp.asarray(wl.slots),
                jnp.asarray(wl.first),
                n_slots=wl.n_slots, tile_rows=ti, tile_words=wk,
                interpret=interpret, variant=variant,
            )
            tiles = np.asarray(out)[: wl.n_vis]
            loc_i, loc_j = wl.vis_loc_i, wl.vis_loc_j
            manifest["work_items"] += wl.n_work
        tmp = path + ".tmp.npz"
        save = np.savez_compressed if compress else np.savez
        save(tmp, tiles=tiles, loc_i=loc_i, loc_j=loc_j, i=i, j=j)
        os.replace(tmp, path)
        manifest["completed"].append([i, j])
        done += 1
        if progress is not None:
            progress(done, total)
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def _superblock_coo(
    bm: BitMatrix, superblock_rows: int, n_super: int
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Per-superblock column-sorted local-row COO: for each row
    superblock I, (cols int64, local_rows int32) sorted by (col, row) —
    the order the native K4 run-walks need. Deduplicated (packing ORs
    duplicate positions, so counts must too)."""
    if bm.coo is not None:
        rows_c, cols_c = bm.coo
        keys = cols_c.astype(np.int64) * bm.n + rows_c
        keys_u = np.unique(keys)
        cols_s = keys_u // bm.n
        rows_s = keys_u % bm.n
    else:
        # CSR extraction is duplicate-free by construction
        indptr, indices = bm.positions_csr()
        rows_s = np.repeat(
            np.arange(bm.n, dtype=np.int64), np.diff(indptr)
        )
        cols_s = indices.astype(np.int64)
        order = np.lexsort((rows_s, cols_s))
        cols_s, rows_s = cols_s[order], rows_s[order]
    # one stable pass instead of a full boolean mask per superblock
    # (O(n_super · nnz) host work bit at 262k-row panels): bucketing by
    # superblock with a stable argsort preserves the (col, row) order
    # within each bucket
    sup = rows_s // superblock_rows
    order_b = np.argsort(sup, kind="stable")
    cols_b, rows_b = cols_s[order_b], rows_s[order_b]
    bounds = np.zeros(n_super + 1, dtype=np.int64)
    np.cumsum(np.bincount(sup, minlength=n_super), out=bounds[1:])
    subs = []
    for i in range(n_super):
        lo, hi = bounds[i], bounds[i + 1]
        subs.append((cols_b[lo:hi],
                     (rows_b[lo:hi] - i * superblock_rows).astype(np.int32)))
    return subs


class _SparseStripePlan:
    """Per-superblock K4 machinery shared by the streaming count walker
    and the streaming queries (stream_query.py): column-sorted sub-COO
    lists, per-superblock column histograms (exact emission counts
    E(I,J)), the fitted per-stripe K4-vs-dense decision, and the native
    stripe evaluation. One home so the counts walk and the query walks
    can never disagree on which stripe the sparse regime owns."""

    def __init__(self, bm: BitMatrix, superblock_rows: int, n_super: int):
        from stormtpu.tuning import k4_constants

        self.bm = bm
        self.sb = superblock_rows
        self.subs = _superblock_coo(bm, superblock_rows, n_super)
        self.hists = [np.unique(cols, return_counts=True)
                      for cols, _ in self.subs]
        fit = k4_constants()
        self._c_n2 = fit["c_n2_s_per_elem"]
        self._c_emit = fit["c_emit_s_per_emission"]
        self._sb2 = superblock_rows * superblock_rows
        self._est_dense_s = (
            self._sb2 * bm.m_bits / fit["k2_int8_ops_per_s"]
            + fit["dispatch_floor_s"]
        )
        # a dense OFF-diagonal stripe also uploads its j-superblock slice
        # (the i slice amortizes across its stripe row; diagonal stripes
        # reuse it) — through the relay that upload dominates the MXU
        # compute (measured 2026-08-19: 512 MB slice in 13.2 s ≈ 39 MB/s,
        # scripts/measure_k4_stream_131k.py), so omitting it biased the
        # per-stripe dispatch toward the device walk by orders of
        # magnitude at exactly the shapes this plan exists for. The rate
        # comes from the tune cache when fitted; the CPU backend's
        # "upload" is a local copy and keeps the old model.
        from stormtpu.utils.backend import is_tpu_backend

        h2d = fit.get("h2d_bytes_per_s") or (
            39e6 if is_tpu_backend() else 4e9
        )
        self._est_upload_s = superblock_rows * bm.n_words * 4 / h2d

    def emissions(self, i: int, j: int) -> int:
        """Exact K4 emission count for stripe (i, j), from the column
        histograms (one intersect1d per stripe)."""
        cu_i, cnt_i = self.hists[i]
        if i == j:
            # diag run-walk touches cnt·(cnt+1)/2 cells per column
            return int((cnt_i.astype(np.int64) * (cnt_i + 1) // 2).sum())
        cu_j, cnt_j = self.hists[j]
        _, ia, ja = np.intersect1d(cu_i, cu_j, return_indices=True,
                                   assume_unique=True)
        return int(cnt_i[ia].astype(np.int64) @ cnt_j[ja])

    def emission_eligible(self, i: int, j: int) -> bool:
        """True when stripe (i, j) may take the buffer-free COO emission
        path (:meth:`stripe_coo`): emissions far below the sb² buffer."""
        return self.emissions_square(i, j) * 8 <= self._sb2

    def use_k4(self, i: int, j: int, extra_emissions: int = 0,
               emission_path: bool = False) -> bool:
        """Fitted cost model: K4 emission vs the dense MXU stripe (whose
        cost includes the j-slice H2D upload off the diagonal).
        ``extra_emissions`` charges caller-side per-candidate host work
        (e.g. the r2 zero-intersection staircase) at the emission rate.

        ``emission_path``: the caller consumes :meth:`stripe_coo` for
        eligible stripes (the counts walk does; the query walks still
        materialize the dense stripe), so K4's sb² buffer term vanishes —
        without this the model routed ultra-sparse sb=8192 stripes to the
        dense kernel at N=1M (c_n2·sb² ≈ 1.5 s estimated vs ~0.1 s dense)
        and the whole point of the emission path was lost."""
        if emission_path and self.emission_eligible(i, j):
            # stripe_coo materializes the FULL-SQUARE emissions (diagonal
            # stripes ~2× the triangular count the model was fitted on) —
            # charge what actually runs, not the triangular walk
            cost = self._c_emit * (
                self.emissions_square(i, j) + extra_emissions
            )
        else:
            cost = self._c_n2 * self._sb2 + self._c_emit * (
                self.emissions(i, j) + extra_emissions
            )
        dense = self._est_dense_s + (self._est_upload_s if i != j else 0.0)
        return cost < dense

    def _segments(self, i: int, j: int):
        """Shared-column segment descriptors for stripe (i, j):
        (off_a, p, off_b, q) — start offset and length of each shared
        column's row run in the two sub-COO lists (i == j: every occupied
        column, both sides the same run)."""
        cols_i, _ = self.subs[i]
        cu_i, cnt_i = self.hists[i]
        off_i = np.searchsorted(cols_i, cu_i).astype(np.int64)
        if i == j:
            return off_i, cnt_i.astype(np.int64), off_i, cnt_i.astype(np.int64)
        cols_j, _ = self.subs[j]
        cu_j, cnt_j = self.hists[j]
        off_j = np.searchsorted(cols_j, cu_j).astype(np.int64)
        _, ia, ja = np.intersect1d(cu_i, cu_j, return_indices=True,
                                   assume_unique=True)
        return (off_i[ia], cnt_i[ia].astype(np.int64),
                off_j[ja], cnt_j[ja].astype(np.int64))

    def emissions_square(self, i: int, j: int) -> int:
        """Full-square emission count of stripe (i, j) — Σ_c p_c·q_c with
        the diagonal NOT halved (what :meth:`stripe_coo` materializes;
        :meth:`emissions` keeps the triangular count the cost model was
        fitted on)."""
        _, p, _, q = self._segments(i, j)
        return int(p @ q)

    def stripe_coo(self, i: int, j: int):
        """(coo_i, coo_j, coo_v) int32 of stripe (i, j) WITHOUT the dense
        sb² buffer: vectorized pair emission over shared-column row runs +
        one ``np.unique`` aggregation — O(E log E) for E emissions.

        At the 1M-row decade the dense path's sb² fill+scan (268 MB at
        sb = 8192) dominates the whole ultra-sparse walk (~8.3k stripes ×
        ~0.2 s of buffer traffic for a handful of emissions each), so
        low-emission stripes take this path (discovered building the r4
        N=1,048,576 rehearsal). Value-identical to the dense walk
        (diagonal stripes emit the full square including self pairs,
        matching the mirrored native stripe; property-tested)."""
        oa, p, ob, q = self._segments(i, j)
        _, rows_i = self.subs[i]
        rows_j = rows_i if i == j else self.subs[j][1]
        pq = p * q
        e_tot = int(pq.sum())
        if e_tot == 0:
            z = np.zeros(0, dtype=np.int32)
            return z, z, z
        estart = np.zeros(pq.size + 1, dtype=np.int64)
        np.cumsum(pq, out=estart[1:])
        cid = np.repeat(np.arange(pq.size), pq)
        e = np.arange(e_tot, dtype=np.int64) - estart[cid]
        qq = q[cid]
        a = rows_i[oa[cid] + e // qq].astype(np.int64)
        b = rows_j[ob[cid] + e % qq].astype(np.int64)
        key, counts = np.unique(a * self.sb + b, return_counts=True)
        return ((key // self.sb).astype(np.int32),
                (key % self.sb).astype(np.int32),
                counts.astype(np.int32))

    def stripe_counts(self, i: int, j: int) -> np.ndarray:
        """Dense [sb, sb] int32 local counts of stripe (i, j) via the
        native inverted-index run walk (diagonal stripes mirrored to
        full square, self-counts on the diagonal)."""
        from stormtpu.native import (
            mirror_upper_native,
            sparse_outer_runs_cross_native,
            sparse_outer_runs_native,
        )

        cols_i, rows_i = self.subs[i]
        if i == j:
            stripe = sparse_outer_runs_native(cols_i, rows_i, self.sb)
            mirror_upper_native(stripe)
            return stripe
        cols_j, rows_j = self.subs[j]
        return sparse_outer_runs_cross_native(
            cols_i, rows_i, cols_j, rows_j, self.sb, self.sb)


def _stream_sparse_outer(
    bm: BitMatrix,
    out_dir: str,
    *,
    superblock_rows: int,
    config: EngineConfig,
    resume: bool,
    compress: bool,
    interpret: bool,
    progress: Optional[Callable[[int, int], None]],
) -> dict:
    """K4 at streaming scale: per-superblock inverted-index emission.

    The single-shot K4 (``count_matrix_sparse_outer``) is capped at
    N=32768 by its N²-int32 host buffer; here every stripe pair (I, J)
    runs the same merge-walk emission on **stripe-local** buffers
    (superblock², 64 MB at the default 4096) over the two superblocks'
    column-sorted sub-COO lists — so the reference's sparse regime (C12)
    reaches the streaming driver's scale (C11) with host RAM as the only
    bound, like everything else in this driver.

    Per-stripe dispatch: the EXACT emission count E(I,J) = Σ_c occ_I(c)
    · occ_J(c) is computed from the per-superblock column histograms
    (cheap: one intersect1d per stripe), and the fitted K4 cost model
    (tuning.k4_constants) decides K4-vs-dense **per stripe pair** — a
    dense superblock pair inside an otherwise sparse panel takes the MXU
    walk, exactly the reference's per-block representation dispatch (C7)
    at superblock granularity.

    Stripe formats: K4 stripes store only their nonzero counts
    (``coo_i``/``coo_j``/``coo_v`` — at the densities that choose K4 the
    stripe is overwhelmingly zero, and npz-compressing 64 MB of zeros at
    ~50 MB/s on this 1-core host would dominate the whole run); dense
    stripes keep the ``counts`` format. ``load_streamed_matrix`` handles
    both; resume-by-file works unchanged.
    """
    cfg = config
    tile_rows = cfg.k2_tile_rows
    tile_words = cfg.k2_tile_words
    superblock_rows = round_up(superblock_rows, tile_rows)
    tiles_per_super = superblock_rows // tile_rows
    n_pad = round_up(bm.n, superblock_rows)
    w_pad = round_up(bm.n_words, tile_words)
    n_super = n_pad // superblock_rows
    dense_kernel = _auto_stream_kernel(bm.m_bits, bm.n)
    if dense_kernel == "dense":
        # dense-stripe fallbacks share this walk's K2 tile geometry (the
        # superblock is rounded to k2 tiles above); the K1 form only wins
        # in small-shape buckets this driver never sees
        dense_kernel = "mxu"

    plan = _SparseStripePlan(bm, superblock_rows, n_super)

    os.makedirs(out_dir, exist_ok=True)
    manifest = {
        "n": bm.n,
        "content": _content_fingerprint(bm),
        "m_bits": bm.m_bits,
        "superblock_rows": superblock_rows,
        "n_super": n_super,
        "kernel": "sparse_outer",
        "stripe_kernels": {"k4": 0, "dense": 0},
        "completed": [],
    }
    total = n_super * (n_super + 1) // 2
    done = 0
    xi_d, xi_idx = None, -1
    for i, j in _superblock_pairs(n_super):
        path = stripe_path(out_dir, i, j)
        if resume and os.path.exists(path):
            # account the resumed stripe by what is ON DISK (the member
            # list distinguishes the formats without decompressing), so
            # a resumed run's k4/dense split stays truthful
            import zipfile

            with zipfile.ZipFile(path) as zf:
                kind = "k4" if "coo_i.npy" in zf.namelist() else "dense"
            manifest["stripe_kernels"][kind] += 1
            manifest["completed"].append([i, j])
            done += 1
            continue
        tmp = path + ".tmp.npz"
        save = np.savez_compressed if compress else np.savez
        if plan.use_k4(i, j, emission_path=True):
            if plan.emission_eligible(i, j):
                # low-emission stripe: buffer-free COO emission — the
                # dense sb² fill+scan would dominate the whole walk at
                # N ≥ 10⁶ row counts (see stripe_coo)
                nz_i, nz_j, nz_v = plan.stripe_coo(i, j)
            else:
                stripe = plan.stripe_counts(i, j)
                nz_i, nz_j = np.nonzero(stripe)
                nz_i = nz_i.astype(np.int32)
                nz_j = nz_j.astype(np.int32)
                nz_v = stripe[nz_i, nz_j]
            save(tmp, coo_i=nz_i, coo_j=nz_j, coo_v=nz_v, i=i, j=j)
            manifest["stripe_kernels"]["k4"] += 1
        else:
            # dense device stripe (operand-streaming style: only the two
            # superblock slices resident; the i slice reuses across its
            # row of stripes)
            if xi_idx != i:
                xi_d = jnp.asarray(
                    _host_superblock(bm.packed, bm.n, superblock_rows,
                                     w_pad, i)
                )
                xi_idx = i
            xj_d = None if i == j else jnp.asarray(
                _host_superblock(bm.packed, bm.n, superblock_rows, w_pad, j)
            )
            stripe = _compute_stripe_pair(
                xi_d, xj_d, tiles_per_super, tile_rows, tile_words,
                interpret, dense_kernel,
            )
            save(tmp, counts=stripe, i=i, j=j)
            manifest["stripe_kernels"]["dense"] += 1
        os.replace(tmp, path)
        manifest["completed"].append([i, j])
        done += 1
        if progress is not None:
            progress(done, total)
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def stream_count_checksums(
    xd,
    n: int,
    m_bits: int,
    *,
    superblock_rows: int = 4096,
    config: Optional[EngineConfig] = None,
    interpret: Optional[bool] = None,
    samples_per_stripe: int = 8,
    sample_seed: int = 0,
    progress: Optional[Callable[[int, int], None]] = None,
) -> dict:
    """Drive EVERY superblock stripe of the count matrix through the real
    K2 tile-walk executable on a DEVICE-RESIDENT padded packed matrix,
    fetching only a per-stripe nonlinear checksum plus sampled entries —
    never the stripes themselves.

    This is the D2H-minimizing full-scale validation mode for
    tunnel-bound environments (device→host here runs at ~5 MB/s, so
    config 4's 40 GB of stripes would bury its ~28 s of compute under
    hours of fetch). The compute path is byte-identical to
    ``stream_count_matrix(kernel="mxu")``'s stripes; only the sink
    differs. Returns a manifest with per-stripe checksums and the
    sampled (i, j, count) triples for cross-path verification.

    ``xd``: device uint32 [n_pad, w_pad], rows ≥ n zero, words beyond
    ceil(m_bits/32) zero, n_pad a multiple of ``superblock_rows`` and
    w_pad a multiple of the K2 tile_words.
    """
    import functools

    import jax

    from stormtpu.kernels.mxu import count_tiles_pallas_mxu
    from stormtpu.tuning import tuned_variant

    cfg = config or default_config()
    cfg.validate(m_bits)
    if interpret is None:
        interpret = pallas_interpret_default()
    # same tile-rows rule as the clustered sink's _block_occupancy
    # (k2_tile_shape): per-stripe checksums are sums over the LISTED
    # tiles, so cross-sink comparability needs identical tile geometry —
    # at n < k2_tile_rows a fixed 256 here double-counted diagonal-tile
    # lower triangles the clustered walk lists once
    tile_rows = min(cfg.k2_tile_rows, round_up(max(n, 32), 32))
    tile_words = cfg.k2_tile_words
    superblock_rows = round_up(superblock_rows, tile_rows)
    n_pad, w_pad = xd.shape
    if w_pad % tile_words:
        raise ValueError("xd must be word-padded to a tile_words multiple")
    if n_pad % superblock_rows:
        # the tile-rows rule above can shrink below k2_tile_rows at
        # n < 256, making the rounded superblock indivisible by the
        # caller's padding — re-pad internally (zero rows are exact)
        # rather than leaking the tile-geometry rule into the contract
        grow = round_up(n_pad, superblock_rows) - n_pad
        xd = jnp.concatenate(
            [xd, jnp.zeros((grow, w_pad), dtype=xd.dtype)], axis=0
        )
        n_pad += grow
    tiles_per_super = superblock_rows // tile_rows
    n_super = n_pad // superblock_rows
    variant = tuned_variant("k2", cfg.k2_variant)

    @jax.jit
    def stripe_fn(x, ibs, jbs, st, sr, sc):
        # two executables total: diagonal stripes (triangular tile list)
        # and off-diagonal (square) — jit re-specializes on list length
        tiles = count_tiles_pallas_mxu(
            x, ibs, jbs, tile_rows=tile_rows, tile_words=tile_words,
            interpret=bool(interpret), variant=variant,
        )
        chk = jnp.sum(tiles % jnp.int32(251))
        return chk, tiles[st, sr, sc]

    rng = np.random.default_rng(sample_seed)
    stripes = []
    sample_ii: list[np.ndarray] = []
    sample_jj: list[np.ndarray] = []
    sample_vals: list[np.ndarray] = []
    total = n_super * (n_super + 1) // 2
    done = 0
    for i, j in _superblock_pairs(n_super):
        base_i, base_j = i * tiles_per_super, j * tiles_per_super
        if i == j:
            loc_i, loc_j = triangular_tile_ids(tiles_per_super)
        else:
            loc_i, loc_j = np.meshgrid(
                np.arange(tiles_per_super, dtype=np.int32),
                np.arange(tiles_per_super, dtype=np.int32),
                indexing="ij",
            )
            loc_i, loc_j = loc_i.ravel(), loc_j.ravel()
        ibs = (loc_i + base_i).astype(np.int32)
        jbs = (loc_j + base_j).astype(np.int32)
        st = rng.integers(0, ibs.size, samples_per_stripe).astype(np.int32)
        sr = rng.integers(0, tile_rows, samples_per_stripe).astype(np.int32)
        sc = rng.integers(0, tile_rows, samples_per_stripe).astype(np.int32)
        chk, vals = stripe_fn(
            xd, jnp.asarray(ibs), jnp.asarray(jbs),
            jnp.asarray(st), jnp.asarray(sr), jnp.asarray(sc),
        )
        vals = np.asarray(vals)  # forces stripe completion (relay drains)
        stripes.append({"i": i, "j": j, "checksum": int(np.asarray(chk))})
        sample_ii.append(ibs[st] * tile_rows + sr)
        sample_jj.append(jbs[st] * tile_rows + sc)
        sample_vals.append(vals)
        done += 1
        if progress is not None:
            progress(done, total)
    return {
        "n": n,
        "m_bits": m_bits,
        "superblock_rows": superblock_rows,
        "n_super": n_super,
        "kernel": "mxu",
        "sink": "checksum",
        "stripes": stripes,
        "sample_ii": np.concatenate(sample_ii),
        "sample_jj": np.concatenate(sample_jj),
        "sample_vals": np.concatenate(sample_vals),
    }


def stream_count_checksums_clustered(
    bm: BitMatrix,
    *,
    superblock_rows: int = 4096,
    config: Optional[EngineConfig] = None,
    interpret: Optional[bool] = None,
    samples_per_stripe: int = 8,
    sample_seed: int = 0,
    progress: Optional[Callable[[int, int], None]] = None,
) -> dict:
    """The D2H-minimizing checksum sink for the CLUSTERED stripe walk:
    every stripe runs its summary-AND work list through the real K5
    executable, fetching only a per-stripe checksum plus sampled
    entries. Checksums are comparable to ``stream_count_checksums``'s on
    the same input and superblock size: skipped (co-empty) tiles are
    exactly zero, so they contribute 0 to ``sum(tiles % 251)`` either
    way. Samples are drawn over the FULL local tile grid — a sample
    landing on a skipped tile reports 0 without touching the device
    (that IS the skip's claim; the caller's oracle check validates it).
    """
    from stormtpu.kernels.clustered import (
        _block_occupancy,
        build_stripe_worklist,
        count_tiles_worklist,
    )
    from stormtpu.tuning import tuned_variant

    import functools

    import jax

    cfg = config or default_config()
    cfg.validate(bm.m_bits)
    if interpret is None:
        interpret = pallas_interpret_default()
    geo = _block_occupancy(bm, cfg)
    if geo is None:
        raise ValueError(
            "clustered checksum sink needs >=2 K-groups; use "
            "stream_count_checksums for single-group shapes"
        )
    occ, ti, wk, n_pad, nb, ng = geo
    superblock_rows = round_up(superblock_rows, ti)
    tps = superblock_rows // ti
    n_sb_pad = round_up(bm.n, superblock_rows)
    nb_sb = n_sb_pad // ti
    if nb_sb > nb:
        occ = np.concatenate(
            [occ, np.zeros((nb_sb - nb, ng), dtype=bool)], axis=0
        )
    n_super = n_sb_pad // superblock_rows
    variant = tuned_variant("k2", cfg.k2_variant)
    w_pad = (ng + 1) * wk

    def build():
        xp = np.zeros((n_sb_pad, w_pad), dtype=np.uint32)
        xp[: bm.n, : bm.n_words] = bm.packed
        return jnp.asarray(xp)

    packed_d = bm.device_cached(("padded2dz", n_sb_pad, w_pad), build)

    @functools.partial(jax.jit, static_argnames=("n_slots",))
    def stripe_fn(x, ibs, jbs, gsel, slots, first, st, sr, sc, *, n_slots):
        tiles = count_tiles_worklist(
            x, ibs, jbs, gsel, slots, first, n_slots=n_slots,
            tile_rows=ti, tile_words=wk, interpret=bool(interpret),
            variant=variant,
        )
        # filler slots are exact zero tiles: they add 0 to the checksum,
        # keeping it equal to the dense walk's sum over the same stripe
        chk = jnp.sum(tiles % jnp.int32(251))
        return chk, tiles[st, sr, sc]

    rng = np.random.default_rng(sample_seed)
    stripes = []
    sample_ii: list[np.ndarray] = []
    sample_jj: list[np.ndarray] = []
    sample_vals: list[np.ndarray] = []
    total = n_super * (n_super + 1) // 2
    done = 0
    work_items = 0
    for i, j in _superblock_pairs(n_super):
        if i == j:
            li, lj = np.triu_indices(tps)
        else:
            li, lj = np.meshgrid(np.arange(tps), np.arange(tps),
                                 indexing="ij")
            li, lj = li.ravel(), lj.ravel()
        # samples over the FULL local tile list (skipped tiles included)
        st = rng.integers(0, li.size, samples_per_stripe)
        sr = rng.integers(0, ti, samples_per_stripe).astype(np.int32)
        sc = rng.integers(0, ti, samples_per_stripe).astype(np.int32)
        sample_ii.append(
            ((li[st] + i * tps) * ti + sr).astype(np.int64)
        )
        sample_jj.append(
            ((lj[st] + j * tps) * ti + sc).astype(np.int64)
        )

        wl = build_stripe_worklist(occ, i * tps, j * tps, tps, i == j)
        if wl is None:
            stripes.append({"i": i, "j": j, "checksum": 0, "skipped": True})
            sample_vals.append(np.zeros(samples_per_stripe, dtype=np.int32))
            done += 1
            if progress is not None:
                progress(done, total)
            continue
        # map each sampled tile to its slot if visited, else it is an
        # exact zero by the summary argument — no device round trip
        vis_key = wl.vis_loc_i.astype(np.int64) * tps + wl.vis_loc_j
        smp_key = li[st].astype(np.int64) * tps + lj[st]
        slot_idx = np.searchsorted(vis_key, smp_key)
        slot_idx = np.clip(slot_idx, 0, wl.n_vis - 1)
        hit = vis_key[slot_idx] == smp_key
        chk, vals = stripe_fn(
            packed_d,
            jnp.asarray(wl.ibs), jnp.asarray(wl.jbs),
            jnp.asarray(wl.gsel), jnp.asarray(wl.slots),
            jnp.asarray(wl.first),
            jnp.asarray(slot_idx.astype(np.int32)),
            jnp.asarray(sr), jnp.asarray(sc),
            n_slots=wl.n_slots,
        )
        vals = np.where(hit, np.asarray(vals), 0).astype(np.int32)
        stripes.append({"i": i, "j": j, "checksum": int(np.asarray(chk)),
                        "skipped": False})
        sample_vals.append(vals)
        work_items += wl.n_work
        done += 1
        if progress is not None:
            progress(done, total)
    return {
        "n": bm.n,
        "m_bits": bm.m_bits,
        "superblock_rows": superblock_rows,
        "n_super": n_super,
        "kernel": "clustered",
        "sink": "checksum",
        "work_items": work_items,
        "stripes": stripes,
        "sample_ii": np.concatenate(sample_ii),
        "sample_jj": np.concatenate(sample_jj),
        "sample_vals": np.concatenate(sample_vals),
    }


def stream_count_histogram(
    xd,
    n: int,
    m_bits: int,
    *,
    n_bins: int = 64,
    bin_width: Optional[int] = None,
    superblock_rows: int = 4096,
    config: Optional[EngineConfig] = None,
    interpret: Optional[bool] = None,
    occupancy: Optional[np.ndarray] = None,
    progress: Optional[Callable[[int, int], None]] = None,
) -> dict:
    """Exact histogram of the off-diagonal pair counts C[i<j] — the
    distribution sink for the K2 stripe walk (the reference's bench
    harness prints per-density count tables, SURVEY §4.5; this is the
    aggregate a user wants at scales where C itself can never be
    materialized or fetched).

    Same stripe walk as :func:`stream_count_checksums` (each unordered
    pair visited exactly once: triangular tile list on diagonal
    superblocks, square off-diagonal), but the per-stripe reduction is a
    masked bin count — device→host traffic is ``n_bins`` int32 per
    stripe. Bins are uniform: bin b counts pairs with
    ``b*bin_width <= C[ij] < (b+1)*bin_width``, with the last bin
    clamped to absorb the tail up to ``m_bits``. Integer binning of
    exact int32 counts — the result is exact, and mass conservation
    (``hist.sum() == n*(n-1)/2``) is asserted before returning.

    ``occupancy``: per-superblock K-group summary bool [n_super, G]
    (``stats.count_histogram`` computes it from the BitMatrix) — the C8
    skip for this sink (r4): a co-empty stripe's counts are all exactly
    zero, so its entire valid-pair mass lands in bin 0 by arithmetic
    (``vi·vj`` pairs, ``vi·(vi−1)/2`` on the diagonal) with zero device
    work. At the banded N=1M rehearsal shape that is 8253 of 8256
    stripes. (The DISTRIBUTED form routes the same way: its ring is one
    compiled fixed-shape shard_map and cannot skip, so
    ``distributed_count_histogram(method="auto")`` switches to a
    host-orchestrated per-stripe walk when ≥ half the stripes are
    co-empty — parallel/stats.py.)

    ``xd`` contract is :func:`stream_count_checksums`'s: device uint32
    [n_pad, w_pad], rows ≥ n zero, words beyond ceil(m_bits/32) zero.
    """
    import jax

    from stormtpu.kernels.mxu import count_tiles_pallas_mxu
    from stormtpu.tuning import tuned_variant

    cfg = config or default_config()
    cfg.validate(m_bits)
    if interpret is None:
        interpret = pallas_interpret_default()
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    if bin_width is None:
        bin_width = default_hist_bin_width(m_bits, n_bins)
    # identical tile geometry rule to stream_count_checksums (cross-sink
    # comparability + the small-n diagonal-tile correctness note there)
    tile_rows = min(cfg.k2_tile_rows, round_up(max(n, 32), 32))
    tile_words = cfg.k2_tile_words
    superblock_rows = cap_hist_superblock(
        round_up(superblock_rows, tile_rows), tile_rows
    )
    n_pad, w_pad = xd.shape
    if w_pad % tile_words:
        raise ValueError("xd must be word-padded to a tile_words multiple")
    if n_pad % superblock_rows:
        grow = round_up(n_pad, superblock_rows) - n_pad
        xd = jnp.concatenate(
            [xd, jnp.zeros((grow, w_pad), dtype=xd.dtype)], axis=0
        )
        n_pad += grow
    tiles_per_super = superblock_rows // tile_rows
    n_super = n_pad // superblock_rows
    variant = tuned_variant("k2", cfg.k2_variant)

    @jax.jit
    def stripe_fn(x, ibs, jbs):
        # two executables total (diagonal / off-diagonal tile-list
        # lengths), like the checksum sink
        tiles = count_tiles_pallas_mxu(
            x, ibs, jbs, tile_rows=tile_rows, tile_words=tile_words,
            interpret=bool(interpret), variant=variant,
        )
        lane = jnp.arange(tile_rows, dtype=jnp.int32)
        rows_g = ibs[:, None] * tile_rows + lane[None, :]
        cols_g = jbs[:, None] * tile_rows + lane[None, :]
        # strict upper triangle within n: gi < gj < n (gi < n follows);
        # zero-padding rows/tiles fail it, diagonal tiles keep r < c once
        valid = (rows_g[:, :, None] < cols_g[:, None, :]) & (
            cols_g[:, None, :] < n
        )
        bins = jnp.minimum(
            tiles // jnp.int32(bin_width), jnp.int32(n_bins - 1)
        )

        # per-bin full reduction instead of scatter-add: TPU scatter runs
        # at ~2e5 adds/s (CLAUDE.md) — n_bins sequential VPU reduces over
        # the stripe's tiles are bandwidth-cheap next to the matmul
        def one(b, _):
            h = jnp.sum(
                jnp.where(valid & (bins == b), 1, 0), dtype=jnp.int32
            )
            return b + jnp.int32(1), h

        _, hist = jax.lax.scan(one, jnp.int32(0), None, length=n_bins)
        return hist

    hist_total = np.zeros(n_bins, dtype=np.int64)
    if occupancy is not None and occupancy.shape[0] != n_super:
        raise ValueError(
            f"occupancy has {occupancy.shape[0]} superblocks, walk has "
            f"{n_super} — compute it with the same superblock_rows "
            f"({superblock_rows} after tile rounding)"
        )
    total = n_super * (n_super + 1) // 2
    done = 0
    sb = superblock_rows
    for i, j in _superblock_pairs(n_super):
        if occupancy is not None and not (occupancy[i] & occupancy[j]).any():
            # C8 skip: every pair in this stripe counts exactly 0 → its
            # valid-pair mass goes to bin 0 arithmetically
            vi = max(0, min(n - i * sb, sb))
            vj = max(0, min(n - j * sb, sb))
            hist_total[0] += vi * (vi - 1) // 2 if i == j else vi * vj
            done += 1
            if progress is not None:
                progress(done, total)
            continue
        base_i, base_j = i * tiles_per_super, j * tiles_per_super
        if i == j:
            loc_i, loc_j = triangular_tile_ids(tiles_per_super)
        else:
            loc_i, loc_j = np.meshgrid(
                np.arange(tiles_per_super, dtype=np.int32),
                np.arange(tiles_per_super, dtype=np.int32),
                indexing="ij",
            )
            loc_i, loc_j = loc_i.ravel(), loc_j.ravel()
        ibs = (loc_i + base_i).astype(np.int32)
        jbs = (loc_j + base_j).astype(np.int32)
        hist = np.asarray(stripe_fn(xd, jnp.asarray(ibs), jnp.asarray(jbs)))
        hist_total += hist.astype(np.int64)
        done += 1
        if progress is not None:
            progress(done, total)
    # shared manifest builder (mass-conservation assert included);
    # imported here: stream_hist imports from this module at top level
    from stormtpu.stream_hist import _hist_manifest

    return _hist_manifest(n, m_bits, superblock_rows, n_super, "mxu",
                          n_bins, bin_width, hist_total)


def load_streamed_matrix(out_dir: str) -> np.ndarray:
    """Reassemble the full symmetric N×N matrix from stripes (moderate N
    only — intended for tests and downstream tooling)."""
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    n = manifest["n"]
    sb = manifest["superblock_rows"]
    n_super = manifest["n_super"]
    full = np.zeros((n_super * sb, n_super * sb), dtype=np.int32)
    for i in range(n_super):
        for j in range(i, n_super):
            with np.load(stripe_path(out_dir, i, j)) as z:
                if "tiles" in z.files:  # clustered sparse-tile stripes
                    ti = manifest["tile_rows"]
                    stripe = _assemble_stripe(
                        z["tiles"], z["loc_i"], z["loc_j"],
                        sb // ti, ti, i == j,
                    )
                elif "coo_i" in z.files:  # sparse_outer nonzero stripes
                    stripe = np.zeros((sb, sb), dtype=np.int32)
                    stripe[z["coo_i"], z["coo_j"]] = z["coo_v"]
                else:
                    stripe = z["counts"]
            full[i * sb : (i + 1) * sb, j * sb : (j + 1) * sb] = stripe
            if i != j:
                full[j * sb : (j + 1) * sb, i * sb : (i + 1) * sb] = stripe.T
    return full[:n, :n]


def extend_streamed_matrix(
    bm: BitMatrix,
    out_dir: str,
    *,
    mesh=None,
    kernel: str = "auto",
    config: Optional[EngineConfig] = None,
    compress: bool = True,
    interpret: Optional[bool] = None,
    progress: Optional[Callable[[int, int], None]] = None,
) -> dict:
    """Grow a completed streamed count-matrix directory to ``bm``'s larger
    row count WITHOUT recomputing the old quadratic work.

    A count stripe's content depends only on its two row superblocks, so
    appending rows (the production panel-growth case: a biobank gains
    samples/variants) invalidates nothing inside the unchanged row range:

    - stripes wholly inside the old COMPLETE superblocks are reused as-is
      (their files are not even opened);
    - stripes touching the old PARTIAL last superblock — whose zero-padded
      rows now hold data — are deleted and recomputed;
    - stripes involving new superblocks are computed fresh.

    Pair-work cost ≈ old·new + new²/2 instead of (old+new)²/2. The
    reference's driver (C11) has no notion of this — a grown panel is a
    from-scratch run there.

    Safety: ``bm``'s first ``old_n`` rows must be byte-identical to the
    original panel. The manifest's content fingerprint (recorded since
    r4) is checked against the head slice; directories written before
    the fingerprint existed are extended on the caller's word. ``m_bits``
    must match exactly; the superblock geometry comes from the manifest
    and must be compatible with the active tile config (else stripes
    from the two runs would misalign under the same file names — refused
    up front).

    ``mesh``: extend through ``distributed_stream_count_matrix`` instead
    of the single-chip walk (same directory format; formats may mix —
    ``load_streamed_matrix`` reads per-file). Returns the new manifest.
    """
    man_path = os.path.join(out_dir, "manifest.json")
    with open(man_path) as f:
        old = json.load(f)
    old_n = int(old["n"])
    sb = int(old["superblock_rows"])
    if bm.m_bits != old["m_bits"]:
        raise ValueError(
            f"extend: m_bits {bm.m_bits} != directory's {old['m_bits']} — "
            f"a changed universe invalidates every stripe"
        )
    if bm.n < old_n:
        raise ValueError(
            f"extend: N={bm.n} < directory's n={old_n} (rows can only be "
            f"appended; shrinking needs a fresh directory)"
        )
    cfg = config or default_config()
    resolved = None
    if mesh is None:
        # predict the walk's kernel with the walk's own policy so the
        # modulus check matches exactly what the resumed run will round by
        resolved = _resolve_stream_kernel(bm, kernel, cfg)
        mod = _stream_tile_modulus(resolved, cfg)
    else:
        # distributed_stream_count_matrix rounds by the ROW axis size
        # only (multihost.py), not the total device count — a 2-D
        # [rows × bits] mesh must not spuriously refuse aligned dirs
        mod = mesh.shape[mesh.axis_names[0]] * 8
    if sb % mod:
        raise ValueError(
            f"extend: superblock_rows={sb} is not a multiple of the "
            f"resumed walk's tile geometry ({mod}) — it would re-round "
            f"and misalign reused stripe files"
        )
    # stripe-FORMAT compatibility: 'tiles'-format stripe files (clustered
    # / distributed walks) assemble under the manifest's tile_rows, so a
    # grown panel that resolves to a different kernel family must not
    # drop (or silently change) that key while old tiles files remain on
    # disk — load_streamed_matrix would KeyError, or worse, misassemble
    # old stripes under a new ti (advisor r4, medium)
    old_ti = old.get("tile_rows")
    if resolved == "clustered":
        from stormtpu.kernels.mxu import k2_tile_shape

        new_ti = k2_tile_shape(cfg, bm.n, bm.n_words)[0]
        # 'distributed' dirs only ever write EMPTY tiles records (nonzero
        # stripes there are 'counts'), and empties assemble identically
        # under any ti — only a genuine clustered→clustered ti change is
        # a real misassembly hazard
        if (old_ti is not None and old_ti != new_ti
                and old.get("kernel") == "clustered"):
            raise ValueError(
                f"extend: the grown panel resolves to a clustered walk "
                f"with tile_rows={new_ti}, but the directory's existing "
                f"tiles-format stripes were written at tile_rows="
                f"{old_ti} — the two assemble differently under one "
                f"manifest; use a fresh directory (or match the config)"
            )
    old_fp = old.get("content")
    if old_fp is not None and old_n:
        head = BitMatrix.from_packed(
            np.ascontiguousarray(bm.packed[:old_n]), bm.m_bits
        )
        if _content_fingerprint(head) != old_fp:
            raise ValueError(
                "extend: the first rows differ from the panel this "
                "directory was computed from (content fingerprint "
                "mismatch) — reusing its stripes would splice two "
                "different matrices"
            )
    if old_n % sb:
        # the old last superblock was partial: its zero-padded rows now
        # hold data, so every stripe touching it is stale
        last = old_n // sb
        n_super_old = int(old["n_super"])
        for i in range(n_super_old):
            for j in range(i, n_super_old):
                if i == last or j == last:
                    p = stripe_path(out_dir, i, j)
                    if os.path.exists(p):
                        os.remove(p)
    if mesh is not None:
        from stormtpu.parallel.multihost import (
            distributed_stream_count_matrix,
        )

        man = distributed_stream_count_matrix(
            bm, out_dir, superblock_rows=sb, mesh=mesh, config=cfg,
            resume=True, compress=compress, progress=progress,
        )
    else:
        man = stream_count_matrix(
            bm, out_dir, superblock_rows=sb, kernel=kernel, config=cfg,
            resume=True, compress=compress, interpret=interpret,
            progress=progress,
        )
    carry = old_ti is not None and man.get("tile_rows") != old_ti and (
        man.get("tile_rows") is None  # new walk dropped the key entirely
        # mesh path over a clustered dir: the new tiles records are
        # empty-only (nonzero distributed stripes are 'counts') and
        # empties assemble identically under any ti dividing sb, so the
        # old NONZERO tiles' ti must win. (clustered→clustered ti drift
        # was refused above; distributed→clustered keeps the NEW ti —
        # the old empties are the ti-agnostic side there.)
        or old.get("kernel") == "clustered"
    )
    if carry:
        man["tile_rows"] = old_ti
        with open(man_path, "w") as f:
            json.dump(man, f, default=int)
    return man
