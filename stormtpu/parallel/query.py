"""Distributed query layer: reduced queries over a row-sharded mesh.

At the 1M×1M scale (BASELINE.json:11) the full count matrix is O(N²·4 B)
and cannot materialize, so the *queries* — per-row top-k partners and
threshold screens — are the forms users actually run at scale. The
reference has no analog (single-thread C, SURVEY.md §2); the single-chip
forms live in stormtpu/query.py. Layout follows the ring driver
(parallel/allpairs.py): X row-sharded over the mesh axis, the partner
shard streamed around the ring with ``lax.ppermute`` while each device
updates per-row state for its local rows only — device output stays
O(N·k) (top-k) or one bit per pair (screens; 32× smaller than counts).

Ring shape per query:

- The **screen** rides the TRIANGULAR ring (the allpairs.py pattern):
  each unordered shard pair's count block is computed once and the
  transposed hit tile — [n_loc, n_loc/32] uint32, 32× smaller than the
  count tile allpairs ships — is ppermuted back to the partner. Half the
  MXU FLOPs of the square form.
- **Top-k** runs the full square ring: per-row top-k state is not
  symmetric-reducible (row i's best-k says nothing about column i's),
  so there is no mirror-tile saving to ship.

Compiled fns are cached per (mesh, shape, static knobs): a fresh
jit(shard_map(...)) wrapper per call would recompile every invocation,
which costs 20–60 s per shape on this TPU stack (CLAUDE.md).

Scope: queries default to the ROW axis (the BASELINE.json:5 layout).
Both queries also offer the bit-axis variant (``shard_axis="bits"``):
psum of triangular K2 count-tile partials, mirroring
``distributed_count_matrix`` — the screen bit-packs the merged tiles,
top-k runs the (non-idempotent) tile-walk merge on the replicated exact
tiles after the psum (two-stage: reduce the K partials first, merge
second).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.7 stable location
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from stormtpu.api import MatrixLike, _as_bitmatrix
from stormtpu.kernels import count_block_auto
from stormtpu.parallel.mesh import bit_axis_of, fetch_global, make_row_mesh
from stormtpu.query import (
    _SCREEN_TILE_CHUNK,
    _default_block_rows,
    _expand_and_refine,
    _next_pow2,
    _pack_bit_rows,
    _screen_tile,
    _screen_vals,
    _validate_screen,
)
from stormtpu.utils import round_up

__all__ = ["distributed_topk_neighbors", "distributed_pairs_above"]


def _sharded_operands(bm, mesh: Mesh, n_pad: int):
    """Mesh-sharded device operands for ``bm``, cached on the BitMatrix
    (same rationale as BitMatrix.device_padded: repeated queries must not
    re-upload O(N·W) per call). Returns (packed row-sharded,
    nnz row-sharded, nnz replicated). On a 2-D [rows × bits] mesh the
    packed words are additionally sharded along the second axis (the
    composed ring+psum query forms)."""
    axis = mesh.axis_names[0]
    bit_axis = bit_axis_of(mesh)

    def build():
        w_pad = bm.n_words
        if bit_axis is not None:
            rb = mesh.shape[bit_axis]
            w_pad = round_up(max(bm.n_words, rb), rb)
        xp = np.zeros((n_pad, w_pad), dtype=np.uint32)
        xp[: bm.n, : bm.n_words] = bm.packed
        nnz_pad = np.zeros(n_pad, dtype=np.int32)
        nnz_pad[: bm.n] = bm.row_nnz.astype(np.int32)
        return (
            jax.device_put(xp, NamedSharding(mesh, P(axis, bit_axis))),
            jax.device_put(nnz_pad, NamedSharding(mesh, P(axis))),
            jax.device_put(nnz_pad, NamedSharding(mesh, P())),
        )

    return bm.device_cached(("sharded", mesh, int(n_pad)), build)


def _kshard_operands(bm, mesh: Mesh, ti: int, wk: int):
    """Word-sharded device operands for the bits-axis (K-shard) query
    paths, cached on the BitMatrix (shared by the K-shard screen and
    top-k — same padding, same cache key). Returns
    (packed word-sharded [n_pad, w_pad], nnz replicated, n_pad, w_pad)."""
    axis = mesh.axis_names[0]
    r = mesh.shape[axis]
    n_pad = round_up(max(bm.n, 1), ti)
    w_pad = round_up(bm.n_words, r * wk)
    rep = NamedSharding(mesh, P())

    def build():
        xp = np.zeros((n_pad, w_pad), dtype=np.uint32)
        xp[: bm.n, : bm.n_words] = bm.packed
        nnz_pad = np.zeros(n_pad, dtype=np.int32)
        nnz_pad[: bm.n] = bm.row_nnz.astype(np.int32)
        return (
            jax.device_put(xp, NamedSharding(mesh, P(None, axis))),
            jax.device_put(nnz_pad, rep),
        )

    x_sharded, nnz_rep = bm.device_cached(
        ("ksharded", mesh, n_pad, w_pad), build
    )
    return x_sharded, nnz_rep, n_pad, w_pad


def _ring_topk_local(axis: str, r: int, n_loc: int, k: int, block_rows: int,
                     psum_axis: Optional[str] = None):
    """Per-device ring loop maintaining running top-k for the local rows.

    Correctness of the streaming merge: a global top-k partner of row i
    is, within its own shard, among that shard's top-min(k, n_loc)
    columns for row i, so keeping min(k, n_loc) candidates per step and
    top-k of (running ∪ new) per step loses nothing. Tie-breaking order
    differs from the single-chip ``lax.top_k`` over the full row (merge
    order is ring order, not global column order) — values are identical,
    indices may differ among equal counts.

    ``psum_axis``: 2-D [rows × bits] mesh — each device holds a word
    slice, the psum completes every count block exactly before the
    (non-idempotent) top-k merge touches it; every device of a row group
    then runs identical merges.
    """
    kk = min(k, n_loc)
    nb = n_loc // block_rows

    def local_fn(x_local: jax.Array):
        my = jax.lax.axis_index(axis)
        buf = x_local
        best_v = jnp.full((n_loc, k), -1, dtype=jnp.int32)
        best_i = jnp.zeros((n_loc, k), dtype=jnp.int32)
        blocks = x_local.reshape(nb, block_rows, x_local.shape[1])
        base = jnp.arange(nb, dtype=jnp.int32) * block_rows
        for s in range(r):
            partner = (my + s) % r
            c0 = partner * n_loc

            def step_block(args):
                blk, b0, bv, bi = args
                counts = count_block_auto(blk, buf).astype(jnp.int32)
                if psum_axis is not None:
                    counts = jax.lax.psum(counts, psum_axis)
                row_g = (
                    jax.lax.broadcasted_iota(jnp.int32, counts.shape, 0)
                    + my * n_loc + b0
                )
                col_g = (
                    jax.lax.broadcasted_iota(jnp.int32, counts.shape, 1) + c0
                )
                counts = jnp.where(row_g == col_g, jnp.int32(-1), counts)
                v, i = jax.lax.top_k(counts, kk)
                gi = i.astype(jnp.int32) + c0
                cand_v = jnp.concatenate([bv, v], axis=1)
                cand_i = jnp.concatenate([bi, gi], axis=1)
                nv, sel = jax.lax.top_k(cand_v, k)
                ni = jnp.take_along_axis(cand_i, sel, axis=1)
                return nv, ni

            bv = best_v.reshape(nb, block_rows, k)
            bi = best_i.reshape(nb, block_rows, k)
            nv, ni = jax.lax.map(step_block, (blocks, base, bv, bi))
            best_v = nv.reshape(n_loc, k)
            best_i = ni.reshape(n_loc, k)
            if s < r - 1:
                buf = jax.lax.ppermute(
                    buf, axis, [(i, (i - 1) % r) for i in range(r)]
                )
        return best_v, best_i

    return local_fn


@functools.lru_cache(maxsize=64)
def _topk_fn(mesh: Mesh, n_loc: int, k: int, block_rows: int):
    axis = mesh.axis_names[0]
    bit_axis = bit_axis_of(mesh)
    r = mesh.shape[axis]
    return jax.jit(
        shard_map(
            _ring_topk_local(axis, r, n_loc, k, block_rows,
                             psum_axis=bit_axis),
            mesh=mesh,
            in_specs=P(axis, bit_axis),
            out_specs=(P(axis, None), P(axis, None)),
            check_vma=False,
        )
    )


def _ring_topk_measure_local(axis: str, r: int, n_loc: int, kk: int,
                             block_rows: int, measure: str,
                             psum_axis: Optional[str] = None):
    """Per-device ring loop maintaining running top-``kk`` CANDIDATES for
    the local rows by float32 similarity, carrying each candidate's exact
    integer count for the host's float64 rescore (the mesh-scale twin of
    cross.py's certified measure top-k). Merge correctness mirrors
    ``_ring_topk_local``: a global top-kk column is within its own
    shard's top-min(kk, n_loc), so per-step top-min(kk, n_loc) into a
    running top-kk merge loses nothing. Self pairs and padding columns
    (global col ≥ n_real) are −inf."""
    from stormtpu.query import _screen_vals

    kk_step = min(kk, n_loc)
    nb = n_loc // block_rows

    def local_fn(x_local, nnz_local, nnz_all, m_f, n_real):
        my = jax.lax.axis_index(axis)
        buf = x_local
        best_s = jnp.full((n_loc, kk), -jnp.inf, dtype=jnp.float32)
        best_c = jnp.zeros((n_loc, kk), dtype=jnp.int32)
        best_i = jnp.zeros((n_loc, kk), dtype=jnp.int32)
        blocks = x_local.reshape(nb, block_rows, x_local.shape[1])
        nnz_blocks = nnz_local.reshape(nb, block_rows)
        base = jnp.arange(nb, dtype=jnp.int32) * block_rows
        for s in range(r):
            partner = (my + s) % r
            c0 = partner * n_loc
            nnz_cols = jax.lax.dynamic_slice(nnz_all, (c0,), (n_loc,))

            def step_block(args):
                blk, b0, nzb, bs, bc, bi = args
                counts = count_block_auto(blk, buf).astype(jnp.int32)
                if psum_axis is not None:
                    counts = jax.lax.psum(counts, psum_axis)
                scores = _screen_vals(counts, nzb, nnz_cols, m_f, measure)
                row_g = (
                    jax.lax.broadcasted_iota(jnp.int32, counts.shape, 0)
                    + my * n_loc + b0
                )
                col_g = (
                    jax.lax.broadcasted_iota(jnp.int32, counts.shape, 1)
                    + c0
                )
                scores = jnp.where(
                    (row_g == col_g) | (col_g >= n_real),
                    -jnp.inf, scores,
                )
                v, i = jax.lax.top_k(scores, kk_step)
                cg = jnp.take_along_axis(counts, i, axis=1)
                gi = i.astype(jnp.int32) + c0
                ns, sel = jax.lax.top_k(
                    jnp.concatenate([bs, v], axis=1), kk)
                nc = jnp.take_along_axis(
                    jnp.concatenate([bc, cg], axis=1), sel, axis=1)
                ni = jnp.take_along_axis(
                    jnp.concatenate([bi, gi], axis=1), sel, axis=1)
                return ns, nc, ni

            bs = best_s.reshape(nb, block_rows, kk)
            bc = best_c.reshape(nb, block_rows, kk)
            bi = best_i.reshape(nb, block_rows, kk)
            ns, nc, ni = jax.lax.map(
                step_block, (blocks, base, nnz_blocks, bs, bc, bi))
            best_s = ns.reshape(n_loc, kk)
            best_c = nc.reshape(n_loc, kk)
            best_i = ni.reshape(n_loc, kk)
            if s < r - 1:
                buf = jax.lax.ppermute(
                    buf, axis, [(i, (i - 1) % r) for i in range(r)]
                )
        return best_s, best_c, best_i

    return local_fn


@functools.lru_cache(maxsize=64)
def _topk_measure_fn(mesh: Mesh, n_loc: int, kk: int, block_rows: int,
                     measure: str):
    axis = mesh.axis_names[0]
    bit_axis = bit_axis_of(mesh)
    r = mesh.shape[axis]
    return jax.jit(
        shard_map(
            _ring_topk_measure_local(axis, r, n_loc, kk, block_rows,
                                     measure, psum_axis=bit_axis),
            mesh=mesh,
            in_specs=(P(axis, bit_axis), P(axis), P(), P(), P()),
            out_specs=(P(axis, None), P(axis, None), P(axis, None)),
            check_vma=False,
        )
    )


def _distributed_topk_measure(bm, k: int, measure: str, mesh: Mesh,
                              block_rows: Optional[int]):
    """Certified-exact similarity top-k over the rows ring (and the 2-D
    rows×bits mesh): float32 candidates + exact counts from the ring,
    float64 rescore on host, escalation doubles the candidate width
    until the k-th value strictly clears the excluded columns' float32
    bound plus slack (cross.py's certification, at mesh scale)."""
    from stormtpu.cross import _MEASURE_TOPK_SLACK
    from stormtpu.query import _validate_screen
    from stormtpu.setops import derive_similarity

    _validate_screen(measure, 1.0)  # validates the measure name
    axis = mesh.axis_names[0]
    r = mesh.shape[axis]
    if block_rows is None:
        block_rows = _default_block_rows(bm.m_bits, -(-bm.n // r))
    n_pad = round_up(max(bm.n, r), r * block_rows)
    n_loc = n_pad // r
    x_sharded, nnz_loc, nnz_all = _sharded_operands(bm, mesh, n_pad)
    m_f = jnp.float32(bm.m_bits)
    n_real = jnp.int32(bm.n)
    nnz_host = np.zeros(n_pad, dtype=np.int64)
    nnz_host[: bm.n] = bm.row_nnz
    real = np.arange(n_pad) < bm.n
    kk = int(_next_pow2(max(2 * k, k + 8)))
    kk_cap = int(min(n_pad, max(4096, 64 * k)))
    while True:
        kk_run = min(kk, n_pad)
        s32_d, cc_d, gi_d = _topk_measure_fn(
            mesh, n_loc, kk_run, block_rows, measure
        )(x_sharded, nnz_loc, nnz_all, m_f, n_real)
        s32 = np.asarray(fetch_global(s32_d))
        cc = np.asarray(fetch_global(cc_d))
        gi = np.asarray(fetch_global(gi_d)).astype(np.int64)
        valid = s32 > -np.inf
        f = derive_similarity(cc, nnz_host[:, None], nnz_host[gi],
                              bm.m_bits, measure)
        f = np.where(valid, f, -np.inf)
        g = np.where(valid, gi, np.int64(2**62))
        order = np.lexsort((g, -f), axis=1)
        f = np.take_along_axis(f, order, axis=1)
        g = np.take_along_axis(g, order, axis=1)
        if kk_run >= bm.n:
            break  # every real column was a candidate
        s_cut = s32[:, -1]
        ok = f[:, k - 1] > s_cut + _MEASURE_TOPK_SLACK
        if bool(np.all(ok | ~real)):
            break
        if kk >= kk_cap:
            raise RuntimeError(
                f"measure top-k certification did not converge by "
                f"kk={kk} (pathologically tie-dense scores) — screen "
                f"with distributed_pairs_above(measure=...) instead"
            )
        kk *= 2
    return f[: bm.n, :k], g[: bm.n, :k].astype(np.int32)


@functools.lru_cache(maxsize=64)
def _kshard_topk_fn(
    mesh: Mesh, ti: int, wk: int, k: int, interpret: bool, variant: str
):
    """Bits-axis (K-dim) top-k: every device holds a WORD slice of all
    rows and runs the triangular K2 tile walk on it; each chunk's count
    tiles are int32 K-partials that ``psum`` merges to the exact tiles
    BEFORE the (non-idempotent) top-k merge touches them — the two-stage
    form of ``_kshard_hits_fn``. After the psum the tiles are replicated,
    so every device runs the identical merge and the (replicated) output
    needs no gather."""
    from stormtpu.query import _topk_tile_walk

    axis = mesh.axis_names[0]

    def local_fn(x_local, ibs, jbs, valid):
        return _topk_tile_walk(
            x_local, ibs, jbs, valid,
            k=k, ti=ti, wk=wk, interpret=interpret, variant=variant,
            psum_axis=axis,
        )

    return jax.jit(
        shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(None, axis), P(None), P(None), P(None)),
            out_specs=(P(None, None), P(None, None)),
            check_vma=False,
        )
    )


def distributed_topk_neighbors(
    x: MatrixLike,
    k: int,
    *,
    mesh: Optional[Mesh] = None,
    block_rows: Optional[int] = None,
    shard_axis: str = "rows",
    measure: str = "count",
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row top-k partners by exact intersection count, computed
    sharded over ``mesh`` (self excluded). Returns (counts int32 [N, k],
    indices int32 [N, k]) like the single-chip form; values are identical
    to it, tie order among equal counts may differ.

    ``measure``: "count" (default) or a similarity ("jaccard", "dice",
    "cosine", "overlap", "phi", "r2") — then the return is (values
    float64 [N, k], indices int32 [N, k]), certified exact like
    ``cross_topk_neighbors(measure=...)``: the ring extracts
    float32-ranked candidates with their exact integer counts, the host
    rescores in float64 and escalates the candidate width until the true
    top-k is provably inside (ties toward the lower index) on the rows
    ring (1-D rows or 2-D rows×bits mesh); ``shard_axis="bits"`` on a
    1-D mesh instead psums the exact count tiles and ranks float64 on
    host (the single-chip contract, same N ≤ 32768 ceiling).

    ``shard_axis="rows"``: row-sharded X, square ring (the default
    layout; scales N). ``shard_axis="bits"``: word-sharded X, psum of
    triangular K2 count-tile partials then the replicated tile-walk merge
    (the K-dim variant for the regime where M is what must shard — a
    single row slice exceeding per-device HBM); needs ≥128 words per
    device — smaller W falls back to the ring."""
    bm = _as_bitmatrix(x)
    if mesh is None:
        mesh = make_row_mesh()
    axis = mesh.axis_names[0]
    r = mesh.shape[axis]
    if shard_axis not in ("rows", "bits"):
        raise ValueError(f"shard_axis must be 'rows' or 'bits', got {shard_axis!r}")
    if not 1 <= k < max(bm.n, 2):
        raise ValueError(f"k must be in [1, N-1], got k={k}, N={bm.n}")
    if measure != "count":
        if shard_axis == "bits" and len(mesh.axis_names) == 1:
            # the K-dim regime: M huge, N modest — psum the exact count
            # tiles over the word shards and rank float64 on host (the
            # single-chip measure contract, same N ceiling)
            from stormtpu.parallel.allpairs import distributed_count_matrix
            from stormtpu.query import _rank_similarity_topk, _validate_screen
            from stormtpu.setops import derive_similarity

            _validate_screen(measure, 1.0)
            if bm.n > 32768:
                raise ValueError(
                    f"measure={measure!r} on shard_axis='bits' ranks the "
                    f"N² score matrix on host (N ≤ 32768; got N={bm.n}) "
                    f"— use a rows/2-D mesh (certified ring ranking) at "
                    f"this N"
                )
            c = distributed_count_matrix(bm.packed, mesh=mesh,
                                         shard_axis="bits")
            sim = derive_similarity(c, bm.row_nnz[:, None],
                                    bm.row_nnz[None, :], bm.m_bits,
                                    measure)
            return _rank_similarity_topk(np.asarray(sim, dtype=np.float64),
                                         k)
        return _distributed_topk_measure(bm, k, measure, mesh, block_rows)
    if (shard_axis == "bits" and len(mesh.axis_names) == 1
            and bm.n_words >= r * 128):
        from stormtpu.config import default_config
        from stormtpu.tuning import tuned_variant
        from stormtpu.utils import (
            pallas_interpret_default,
            triangular_tile_ids,
        )

        cfg = default_config()
        ti = min(cfg.k2_tile_rows, round_up(max(bm.n, 32), 32))
        wk = 128
        x_sharded, _, n_pad, _ = _kshard_operands(bm, mesh, ti, wk)
        nb = n_pad // ti
        ibs, jbs = triangular_tile_ids(nb)
        chunk = int(min(_SCREEN_TILE_CHUNK, _next_pow2(ibs.size)))
        t_pad = round_up(ibs.size, chunk)
        # padded duplicate tiles are NOT idempotent for a top-k merge —
        # carry validity flags (masked to −1 in the walk)
        ibs_p = np.full(t_pad, ibs[-1], dtype=np.int32)
        jbs_p = np.full(t_pad, jbs[-1], dtype=np.int32)
        valid = np.zeros(t_pad, dtype=np.int32)
        ibs_p[: ibs.size] = ibs
        jbs_p[: jbs.size] = jbs
        valid[: ibs.size] = 1
        rep = NamedSharding(mesh, P())
        fn = _kshard_topk_fn(
            mesh, ti, wk, k, bool(pallas_interpret_default()),
            tuned_variant("k2", cfg.k2_variant),
        )
        vals_d, idx_d = fn(
            x_sharded,
            jax.device_put(jnp.asarray(ibs_p), rep),
            jax.device_put(jnp.asarray(jbs_p), rep),
            jax.device_put(jnp.asarray(valid), rep),
        )
        vals = np.asarray(vals_d)[: bm.n]
        idx = np.asarray(idx_d)[: bm.n]
        valid_out = idx < bm.n
        vals = np.where(valid_out, vals, 0)
        idx = np.where(valid_out, idx, 0)
        return vals, idx
    if block_rows is None:
        block_rows = _default_block_rows(bm.m_bits, -(-bm.n // r))
    n_pad = round_up(max(bm.n, r), r * block_rows)
    n_loc = n_pad // r
    x_sharded, _, _ = _sharded_operands(bm, mesh, n_pad)
    vals, idx = _topk_fn(mesh, n_loc, k, block_rows)(x_sharded)
    vals = fetch_global(vals)[: bm.n]
    idx = fetch_global(idx)[: bm.n]
    # padded zero rows can appear among neighbors with count 0; keep them
    # only as "count 0 at a real row" — same post-rule as the single-chip
    # form (query.py)
    valid = idx < bm.n
    vals = np.where(valid, vals, 0)
    idx = np.where(valid, idx, 0)
    return vals, idx


def _ring_hits_local(
    axis: str, r: int, n_loc: int, block_rows: int, measure: str,
    psum_axis: Optional[str] = None,
):
    """Per-device TRIANGULAR ring loop emitting the packed hit bitmap for
    the local rows over all N columns.

    Each unordered shard pair (d, e=d+s) is computed ONCE, by d: the
    count block is screened WITHOUT the triangle mask, then split into
    d's half (global col > row) and e's half (the transpose of the
    complement), and e's half rides the ring back packed — the
    allpairs.py mirror pattern, legal here because the hit tile (unlike
    top-k state) is symmetric-derivable from one block. Step census
    matches _ring_local_fn: s = 0 diagonal (triangle only, no mirror);
    even R has a mutual step s = R/2 where both devices compute their own
    half. Each of the r column blocks of ``out`` is written exactly once.
    """
    nb = n_loc // block_rows
    wloc = n_loc // 32
    wblk = block_rows // 32  # caller rounds block_rows up to a multiple of 32
    s_max = r // 2 if r % 2 == 0 else (r - 1) // 2

    def local_fn(
        x_local: jax.Array,
        nnz_local: jax.Array,
        nnz_all: jax.Array,
        thresh: jax.Array,
        m_f: jax.Array,
    ):
        my = jax.lax.axis_index(axis)
        buf = x_local
        out = jnp.zeros((n_loc, r * wloc), dtype=jnp.uint32)
        blocks = x_local.reshape(nb, block_rows, x_local.shape[1])
        nnz_blocks = nnz_local.reshape(nb, block_rows)
        base = jnp.arange(nb, dtype=jnp.int32) * block_rows
        for s in range(s_max + 1):
            partner = (my + s) % r
            c0 = partner * n_loc
            nnz_cols = jax.lax.dynamic_slice(nnz_all, (c0,), (n_loc,))
            mutual = r % 2 == 0 and s == s_max
            want_mirror = 0 < s and not mutual

            def step_block(args):
                blk, b0, nzb = args
                counts = count_block_auto(blk, buf)
                if psum_axis is not None:
                    # 2-D mesh: complete the word-slice partial exactly
                    # before the screen (float32 slack math is NOT a
                    # homomorphism over partial counts)
                    counts = jax.lax.psum(
                        counts.astype(jnp.int32), psum_axis
                    )
                row_g = (
                    jax.lax.broadcasted_iota(jnp.int32, counts.shape, 0)
                    + my * n_loc + b0
                )
                col_g = (
                    jax.lax.broadcasted_iota(jnp.int32, counts.shape, 1) + c0
                )
                hit = _screen_vals(counts, nzb, nnz_cols, m_f, measure) >= thresh
                mine = _pack_bit_rows(hit & (col_g > row_g))  # [B, wloc]
                if not want_mirror:
                    # diagonal (s=0) and even-R mutual steps discard the
                    # mirror tile — don't trace the transpose+pack at all
                    # (relying on XLA to DCE an unused stacked lax.map
                    # output inside the unrolled ring is not guaranteed)
                    return mine
                # partner's half, transposed to (partner rows × my rows):
                # entry (j, i) hits iff my global row i > partner row j
                theirs = _pack_bit_rows((hit & (row_g > col_g)).T)  # [n_loc, wblk]
                return mine, theirs

            if want_mirror:
                mine, theirs = jax.lax.map(
                    step_block, (blocks, base, nnz_blocks)
                )
            else:
                mine = jax.lax.map(step_block, (blocks, base, nnz_blocks))
            out = jax.lax.dynamic_update_slice(
                out, mine.reshape(n_loc, wloc), (0, partner * wloc)
            )
            if want_mirror:
                # [nb, n_loc, wblk] → [n_loc, nb·wblk = wloc]; block b's
                # words cover my rows [b·B, (b+1)·B) — consecutive blocks
                # are consecutive word ranges, so the transpose-reshape
                # reassembles the global little-endian bit order
                tile = jnp.transpose(theirs, (1, 0, 2)).reshape(n_loc, wloc)
                t_recv = jax.lax.ppermute(
                    tile, axis, [(i, (i + s) % r) for i in range(r)]
                )
                src = (my - s) % r
                out = jax.lax.dynamic_update_slice(
                    out, t_recv, (0, src * wloc)
                )
            if s < s_max:
                buf = jax.lax.ppermute(
                    buf, axis, [(i, (i - 1) % r) for i in range(r)]
                )
        return out

    return local_fn


@functools.lru_cache(maxsize=64)
def _hits_fn(mesh: Mesh, n_loc: int, block_rows: int, measure: str):
    axis = mesh.axis_names[0]
    bit_axis = bit_axis_of(mesh)
    r = mesh.shape[axis]
    return jax.jit(
        shard_map(
            _ring_hits_local(axis, r, n_loc, block_rows, measure,
                             psum_axis=bit_axis),
            mesh=mesh,
            in_specs=(P(axis, bit_axis), P(axis), P(), P(), P()),
            out_specs=P(axis, None),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=64)
def _kshard_hits_fn(
    mesh: Mesh, ti: int, wk: int, chunk: int,
    interpret: bool, variant: str, measure: str,
):
    """Bits-axis (K-dim) screen: every device holds a WORD slice of all
    rows, computes triangular K2 count-tile partials for its slice in
    chunks, ``psum`` merges the exact int32 partials, and the (replicated)
    merged tiles are screened + bit-packed — the query analog of
    ``kshard_count_tiles`` (parallel/allpairs.py). Output bitmap is
    replicated."""
    from stormtpu.kernels.mxu import count_tiles_pallas_mxu

    axis = mesh.axis_names[0]

    def local_fn(x_local, ibs, jbs, nnz, thresh, m_f):
        n_pad = x_local.shape[0]
        wout = n_pad // 32
        wt = ti // 32
        n_chunks = ibs.shape[0] // chunk
        iota0 = jax.lax.broadcasted_iota(jnp.int32, (ti, ti), 0)
        iota1 = jax.lax.broadcasted_iota(jnp.int32, (ti, ti), 1)

        def tile_hit(args):
            tile, ib, jb = args
            return _screen_tile(tile, ib, jb, nnz, thresh, m_f, ti,
                                measure, iota0, iota1)

        def body(c, bitmap):
            ib_c = jax.lax.dynamic_slice(ibs, (c * chunk,), (chunk,))
            jb_c = jax.lax.dynamic_slice(jbs, (c * chunk,), (chunk,))
            partial = count_tiles_pallas_mxu(
                x_local, ib_c, jb_c, tile_rows=ti, tile_words=wk,
                interpret=interpret, variant=variant,
            )
            tiles = jax.lax.psum(partial, axis)
            words = jax.lax.map(tile_hit, (tiles, ib_c, jb_c))

            def place(t, bm_):
                return jax.lax.dynamic_update_slice(
                    bm_, words[t], (ib_c[t] * ti, jb_c[t] * wt)
                )

            return jax.lax.fori_loop(0, chunk, place, bitmap)

        bitmap = jnp.zeros((n_pad, wout), dtype=jnp.uint32)
        return jax.lax.fori_loop(0, n_chunks, body, bitmap)

    return jax.jit(
        shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(None, axis), P(None), P(None), P(None), P(), P()),
            out_specs=P(None, None),
            check_vma=False,
        )
    )


def distributed_pairs_above(
    x: MatrixLike,
    threshold: float,
    *,
    measure: str = "count",
    mesh: Optional[Mesh] = None,
    block_rows: Optional[int] = None,
    shard_axis: str = "rows",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All unordered pairs (i < j) with measure ≥ threshold, screened
    over ``mesh``. Same contract as the single-chip
    ``stormtpu.pairs_above`` (one bit per candidate pair leaves the
    devices; float32 screen with slack, exact host refine — rounding can
    only add candidates, never drop true hits).

    ``shard_axis="rows"``: row-sharded X, triangular ring (the default
    layout). ``shard_axis="bits"``: word-sharded X, psum of exact count
    tiles (the K-dim variant, mirroring ``distributed_count_matrix``);
    needs ≥128 words per device — smaller W falls back to the ring.
    """
    bm = _as_bitmatrix(x)
    if mesh is None:
        mesh = make_row_mesh()
    axis = mesh.axis_names[0]
    r = mesh.shape[axis]
    if shard_axis not in ("rows", "bits"):
        raise ValueError(f"shard_axis must be 'rows' or 'bits', got {shard_axis!r}")
    dev_thresh = _validate_screen(measure, threshold)
    rep = NamedSharding(mesh, P())
    if (shard_axis == "bits" and len(mesh.axis_names) == 1
            and bm.n_words >= r * 128):
        from stormtpu.config import default_config
        from stormtpu.tuning import tuned_variant
        from stormtpu.utils import (
            pallas_interpret_default,
            triangular_tile_ids,
        )

        cfg = default_config()
        ti = min(cfg.k2_tile_rows, round_up(max(bm.n, 32), 32))
        wk = 128  # per-device K-step (Mosaic 128-divisible last dim)
        x_sharded, nnz_rep, n_pad, _ = _kshard_operands(bm, mesh, ti, wk)
        nb = n_pad // ti
        ibs, jbs = triangular_tile_ids(nb)
        chunk = int(min(_SCREEN_TILE_CHUNK, _next_pow2(ibs.size)))
        t_pad = round_up(ibs.size, chunk)
        # duplicate-tile padding is idempotent for the screen
        ibs_p = np.full(t_pad, ibs[-1], dtype=np.int32)
        jbs_p = np.full(t_pad, jbs[-1], dtype=np.int32)
        ibs_p[: ibs.size] = ibs
        jbs_p[: jbs.size] = jbs
        fn = _kshard_hits_fn(
            mesh, ti, wk, chunk, bool(pallas_interpret_default()),
            tuned_variant("k2", cfg.k2_variant), measure,
        )
        hits = np.asarray(fn(
            x_sharded,
            jax.device_put(jnp.asarray(ibs_p), rep),
            jax.device_put(jnp.asarray(jbs_p), rep),
            nnz_rep,
            jax.device_put(dev_thresh, rep),
            jax.device_put(jnp.float32(bm.m_bits), rep),
        ))
        return _expand_and_refine(bm, hits, measure, threshold)
    if block_rows is None:
        block_rows = _default_block_rows(bm.m_bits, -(-bm.n // r))
    # mirror tiles pack bits along the local-row axis per block, so the
    # block size must be word-aligned
    block_rows = int(round_up(block_rows, 32))
    n_pad = round_up(max(bm.n, r), r * block_rows)
    n_loc = n_pad // r
    x_sharded, nnz_sharded, nnz_rep = _sharded_operands(bm, mesh, n_pad)
    hits = fetch_global(
        _hits_fn(mesh, n_loc, block_rows, measure)(
            x_sharded,
            nnz_sharded,
            nnz_rep,
            jax.device_put(dev_thresh, rep),
            jax.device_put(jnp.float32(bm.m_bits), rep),
        )
    )
    return _expand_and_refine(bm, hits, measure, threshold)
