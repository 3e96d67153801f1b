"""Query layer: explicit-pair counts, top-k neighbors, threshold screens.

The reference returns the full N×N result and leaves filtering to the
caller (its callers are single-address-space C, SURVEY.md §3 C11). On an
accelerator the full matrix is the *expensive* part to move — device→host
bandwidth dominates once kernels are fast — so the TPU-native surface
offers the reduced forms directly, computed on device:

- ``pair_counts``      — counts for an explicit (i, j) list (O(P) output)
- ``topk_neighbors``   — per-row k best partners by intersection count
                         (O(N·k) output; self-matches excluded)
- ``pairs_above``      — all pairs with count ≥ threshold, returned as a
                         packed hit bitmap per row-block on device and
                         expanded to COO on host (O(N²/8) bytes moved
                         instead of O(4·N²))

All results are exact integer counts, oracle-tested.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stormtpu.api import MatrixLike, _as_bitmatrix
from stormtpu.config import EngineConfig
from stormtpu.kernels import count_block_auto
from stormtpu.kernels import xla as kx
from stormtpu.utils import round_up

__all__ = ["pair_counts", "topk_neighbors", "pairs_above"]

# Per-operand word budget for the pair_counts gather (~256 MB).
_PAIR_GATHER_MAX_WORDS = 1 << 26


# gather-chunk quantizer (bounds distinct compiled shapes to log₂
# buckets; shared home in utils.tiling — one copy, by review)
from stormtpu.utils import next_pow2 as _next_pow2  # noqa: E402


def _default_block_rows(m_bits: int, n_cols: int = 0) -> int:
    """Row-block size for the blocked query kernels (top-k / screens).

    At large M the block kernel routes to the Pallas MXU rectangle, which
    pads A-blocks up to its k2_tile_rows tile — undersized query blocks
    would be zero-padded 4x (wasted MXU work), so match the tile.

    At small M it routes to the XLA int8 path, which unpacks the FULL
    partner matrix to int8 on EVERY ``lax.map`` step — 64-row blocks at
    N=16384 meant 256 redundant 1 GB unpacks (measured 20 s for a screen
    whose matmuls are ~0.1 s). Size the block by a counts-memory budget
    instead (~512 MB of int32 per block) so a handful of big matmuls
    amortize the unpack, and shave the last block's padding by balancing
    the block count."""
    from stormtpu.config import default_config
    from stormtpu.kernels import MXU_XLA_MAX_BITS

    if m_bits > MXU_XLA_MAX_BITS:
        return default_config().k2_tile_rows
    if n_cols <= 0:
        return 64
    budget = max(64, (1 << 29) // max(4 * n_cols, 1))
    n64 = round_up(n_cols, 64)
    blk = min(budget, n64, 8192)
    nb = -(-n64 // blk)  # ceil: number of blocks at the budget size
    blk = round_up(-(-n64 // nb), 64)  # re-balance so padding ≤ 64·nb rows
    return int(blk)


@jax.jit
def _gather_pair_counts(packed: jax.Array, ii: jax.Array, jj: jax.Array) -> jax.Array:
    # the fused XLA AND+popcount stream measures ~363 GB/s on v5e vs
    # ~233 GB/s for the Pallas K0 form (kernels/dense.py) — XLA's fusion
    # wins the streaming regime at every size, so no routing switch here
    a = jnp.take(packed, ii, axis=0)
    b = jnp.take(packed, jj, axis=0)
    return kx.pair_count_batch_xla(a, b)


def pair_counts(x: MatrixLike, ii, jj) -> np.ndarray:
    """Exact counts int32 [P] for explicit row pairs (ii[p], jj[p])."""
    bm = _as_bitmatrix(x)
    ii = np.asarray(ii, dtype=np.int32)
    jj = np.asarray(jj, dtype=np.int32)
    if ii.shape != jj.shape or ii.ndim != 1:
        raise ValueError("ii and jj must be equal-length 1-D index arrays")
    if ii.size and (
        ii.min() < 0 or jj.min() < 0 or ii.max() >= bm.n or jj.max() >= bm.n
    ):
        raise ValueError("pair index out of range")
    if ii.size == 0:
        return np.zeros(0, dtype=np.int32)
    # reuse any larger cached buffer (e.g. the screen's padded copy):
    # gather indices are < N, so extra zero rows are invisible, and a
    # second full HBM copy is never pinned next to the screen's
    packed_d = bm.device_padded(bm.n, reuse_larger=True)
    # Chunk the gathered stream: the gather materializes two [P, W]
    # operands, so an unchunked huge pair list (e.g. a permissive
    # pairs_above screen) would allocate P·W·8 bytes — 21 GB was observed
    # at P=167k, W=31250. Fixed chunk shape ⇒ one compile.
    budget_rows = max(8, _PAIR_GATHER_MAX_WORDS // max(bm.n_words, 1) // 8 * 8)
    # round UP so an in-budget list is one padded dispatch (rounding down
    # made a 100-pair query take two dispatches on a ~25 ms-latency relay),
    # and quantize to powers of two: every distinct padded length is a
    # fresh 20–60 s compile on this stack, so a screen returning 157 then
    # 397 hits must land in the same bucket, not two new shapes
    chunk = min(_next_pow2(ii.size), budget_rows)
    p_pad = round_up(ii.size, chunk)
    ii_p = np.zeros(p_pad, dtype=np.int32)
    jj_p = np.zeros(p_pad, dtype=np.int32)
    ii_p[: ii.size] = ii
    jj_p[: jj.size] = jj
    parts = [
        np.asarray(
            _gather_pair_counts(
                packed_d,
                jnp.asarray(ii_p[o : o + chunk]),
                jnp.asarray(jj_p[o : o + chunk]),
            )
        )
        for o in range(0, p_pad, chunk)
    ]
    return np.concatenate(parts)[: ii.size]


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_one_block(blk: jax.Array, packed: jax.Array, b0: jax.Array, k: int):
    counts = count_block_auto(blk, packed)  # [B, N]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, counts.shape, 0) + b0
    col_ids = jax.lax.broadcasted_iota(jnp.int32, counts.shape, 1)
    counts = jnp.where(row_ids == col_ids, jnp.int32(-1), counts)  # drop self
    vals, idx = jax.lax.top_k(counts, k)
    return vals, idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "block_rows"))
def _topk_blocks(packed: jax.Array, k: int, block_rows: int):
    n, _ = packed.shape
    nb = n // block_rows
    blocks = packed.reshape(nb, block_rows, packed.shape[1])
    base = jnp.arange(nb, dtype=jnp.int32) * block_rows
    return jax.lax.map(
        lambda args: _topk_one_block(args[0], packed, args[1], k),
        (blocks, base),
    )


#: Host ceiling for routes that materialize the N×N score matrix on host
#: (N² float64 = 8 GB at 32768). Above it, measure-ranked top-k
#: auto-routes to the value-identical streaming walk (VERDICT r3 #7:
#: routing, not refusing — D1's semantics-free dispatch stance).
_MEASURE_HOST_N_CEILING = 32768


def topk_neighbors(
    x: MatrixLike, k: int, *, measure: str = "count",
    block_rows: Optional[int] = None,
    on_host_limit: str = "stream",
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row top-k partners by exact intersection count (self excluded).

    Returns (counts int32 [N, k], indices int32 [N, k]), sorted
    descending. Counts are uniquely determined; tie ORDER among equal
    counts depends on the dispatched route (the block form breaks toward
    lower index via the full-row ``lax.top_k``; the triangular tile form
    used at MXU shapes merges in tile order). ``block_rows`` tunes the
    block route only — the tile route derives its tiling from
    ``EngineConfig`` and ignores it.

    ``measure``: "count" (default, any N the device budget admits) or a
    similarity from :func:`stormtpu.setops.similarity_matrix` ("jaccard",
    "dice", "cosine", "overlap", "phi", "r2") — then the return is
    (values float64 [N, k], indices int32 [N, k]), exact (float64 scores
    derived from exact integer counts; ties break toward lower index).
    Similarity ranking materializes the N×N score matrix on host up to
    N = 32768; above that it auto-routes to
    :func:`stormtpu.stream_query.stream_topk_neighbors` (value-identical
    certified streaming walk; tie order among equal scores is
    route-dependent, like the count routes). ``on_host_limit="raise"``
    restores the old hard error instead of the silent route change.
    """
    bm = _as_bitmatrix(x)
    if not 1 <= k < max(bm.n, 2):
        raise ValueError(f"k must be in [1, N-1], got k={k}, N={bm.n}")
    if on_host_limit not in ("stream", "raise"):
        raise ValueError(
            f"on_host_limit must be 'stream' or 'raise', got {on_host_limit!r}"
        )
    if measure != "count":
        if bm.n > _MEASURE_HOST_N_CEILING:
            if on_host_limit == "raise":
                raise ValueError(
                    f"measure={measure!r} top-k materializes the N² score "
                    f"matrix on host (N ≤ {_MEASURE_HOST_N_CEILING}; got "
                    f"N={bm.n}) and on_host_limit='raise' — use "
                    f"stream_topk_neighbors or on_host_limit='stream'"
                )
            from stormtpu.stream_query import stream_topk_neighbors

            return stream_topk_neighbors(bm, k, measure=measure)
        from stormtpu.setops import similarity_matrix

        if bm.n == 1:
            # k=1 is admitted at N=1 (matching the count path); there is
            # no partner, so return the (0, 0) no-partner convention
            # rather than leaking the -inf diagonal sentinel
            return (np.zeros((1, k), dtype=np.float64),
                    np.zeros((1, k), dtype=np.int32))
        sim = similarity_matrix(bm, measure=measure)
        return _rank_similarity_topk(sim, k)
    from stormtpu.stream import require_device_budget

    if bm.n > 2:
        # every top-k route (tile walk, block form, and the clustered
        # host route's count matrix) uploads the packed operand
        require_device_budget(
            4 * bm.n * bm.n_words,
            f"N={bm.n}: the packed operand",
            "use stormtpu.stream_query.stream_topk_neighbors "
            "(host-RAM-bounded)",
        )
    from stormtpu.dispatch import choose_strategy

    strategy = (
        choose_strategy(bm.n, bm.m_bits, bm.density, bm=bm)
        if bm.n > 1 else "popcount"
    )
    if strategy == "clustered" and bm.n <= 32768:
        # block-clustered input with a host-materializable C: the K5
        # counts skip all co-empty tile work; top-k on host. Tie order
        # among equal counts may differ from the device routes (values
        # are identical, tested).
        from stormtpu.api import intersect_count_matrix

        c = intersect_count_matrix(bm).astype(np.int64)
        np.fill_diagonal(c, -1)
        idx = np.argpartition(-c, min(k, bm.n - 1) - 1, axis=1)[:, :k]
        vals = np.take_along_axis(c, idx, axis=1)
        order = np.argsort(-vals, axis=1, kind="stable")
        vals = np.take_along_axis(vals, order, axis=1).astype(np.int32)
        idx = np.take_along_axis(idx, order, axis=1).astype(np.int32)
        valid = vals >= 0
        vals = np.where(valid, vals, 0)
        idx = np.where(valid, idx, 0)
        return vals, idx
    if bm.n > 1 and strategy in ("pallas_mxu", "clustered"):
        # triangular K2 tile walk (half the FLOPs of the block form);
        # tie order among equal counts may differ from the full-row
        # lax.top_k — values are identical (tested)
        packed_d, ibs_p, jbs_p, valid_p, ti, wk, n_pad = _tile_walk_operands(bm)
        from stormtpu.config import default_config
        from stormtpu.tuning import tuned_variant
        from stormtpu.utils import pallas_interpret_default

        cfg = default_config()
        vals_d, idx_d = _topk_tiles(
            packed_d, ibs_p, jbs_p, valid_p,
            k=k, ti=ti, wk=wk,
            interpret=bool(pallas_interpret_default()),
            variant=tuned_variant("k2", cfg.k2_variant),
        )
        vals = np.asarray(vals_d)[: bm.n]
        idx = np.asarray(idx_d)[: bm.n]
    else:
        if block_rows is None:
            block_rows = _default_block_rows(bm.m_bits, bm.n)
        n_pad = round_up(bm.n, block_rows)
        vals, idx = _topk_blocks(bm.device_padded(n_pad), k, block_rows)
        vals = np.asarray(vals).reshape(n_pad, k)[: bm.n]
        idx = np.asarray(idx).reshape(n_pad, k)[: bm.n]
    # padded zero rows can appear among neighbors with count 0 — they are
    # legitimate "count 0" entries only if they point at real rows
    valid = idx < bm.n
    vals = np.where(valid, vals, 0)
    idx = np.where(valid, idx, 0)
    return vals, idx


def _rank_similarity_topk(sim: np.ndarray, k: int
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Exact per-row top-k of a float64 similarity matrix, ties toward
    the lower index (shared by the single-chip measure route and the
    bits-axis distributed one). Mutates ``sim``'s diagonal to −inf."""
    n = sim.shape[0]
    np.fill_diagonal(sim, -np.inf)
    kk = min(k, n - 1)
    idx = np.argpartition(-sim, kk - 1, axis=1)[:, :k]
    vals = np.take_along_axis(sim, idx, axis=1)
    # argpartition picks arbitrarily among scores TIED at the k-th
    # place (integer-derived similarities tie often); the contract is
    # lower-index-first, so rows whose boundary value occurs beyond
    # the selection are re-resolved over their full candidate set
    vk = vals.min(axis=1)
    tied = np.flatnonzero((sim >= vk[:, None]).sum(axis=1) > kk)
    for r in tied:
        cand = np.flatnonzero(sim[r] >= vk[r])
        cand = cand[np.lexsort((cand, -sim[r, cand]))][:k]
        idx[r] = cand
        vals[r] = sim[r, cand]
    # sort candidates by (-value, index): stable exact order
    order = np.lexsort((idx, -vals), axis=1)
    vals = np.take_along_axis(vals, order, axis=1)
    idx = np.take_along_axis(idx, order, axis=1).astype(np.int32)
    return vals, idx


def _screen_vals(
    counts: jax.Array,
    nnz_rows: jax.Array,
    nnz_cols: jax.Array,
    m_f: jax.Array,
    measure: str,
) -> jax.Array:
    """float32 screen values [B, C] for a counts block (the measure the
    device threshold is compared against). Shared by the single-chip and
    distributed (parallel/query.py) screens.

    Similarity measures are screened in float32 with the caller's slack;
    the host re-filters hits with exact float64 arithmetic, so float32
    rounding can only add candidates, never lose them.
    """
    if measure == "count":
        return counts.astype(jnp.float32)
    return _screen_vals_core(
        counts,
        nnz_rows[:, None].astype(jnp.float32),
        nnz_cols[None, :].astype(jnp.float32),
        m_f,
        measure,
    )


def _screen_vals_core(
    counts: jax.Array,
    ca: jax.Array,
    cb: jax.Array,
    m_f: jax.Array,
    measure: str,
) -> jax.Array:
    """Similarity screen formulas over broadcastable float32 operands —
    ``ca``/``cb``/``m_f`` may be per-pair arrays (the pairwise-complete
    missing-data screen feeds per-pair co-observed universes here)."""
    inter = counts.astype(jnp.float32)
    if measure == "jaccard":
        denom = ca + cb - inter
    elif measure == "dice":
        inter = 2.0 * inter
        denom = ca + cb
    elif measure == "cosine":
        denom = jnp.sqrt(ca * cb)
    elif measure in ("phi", "r2"):
        # num = m·inter − ca·cb suffers catastrophic cancellation in
        # float32 when rows are dense (errors up to ~1e-4 in phi,
        # larger than any fixed slack — verified), so the screen
        # inflates num by a rounding bound: products/ints ≥ 2²⁴ carry
        # relative error ~6e-8 each, and 2e-6·(|terms|) dominates the
        # sum of all of them with ≥30× margin. The host re-filters
        # exactly, so over-admission only costs a few extra checks.
        terms = m_f * inter + ca * cb
        err = 2e-6 * terms + 1e-3
        num = m_f * inter - ca * cb + err
        den = jnp.sqrt(ca * cb * (m_f - ca) * (m_f - cb))
        if measure == "r2":
            num = jnp.abs(m_f * inter - ca * cb) + err
            num = num * num
            den = den * den
        inter = num
        denom = den
    else:  # overlap
        denom = jnp.minimum(ca, cb)
    return jnp.where(denom > 0, inter / jnp.where(denom > 0, denom, 1.0), 0.0)


@functools.partial(jax.jit, static_argnames=("measure", "bl"))
def _complete_screen_block(d_pad, m_pad, r0, n_valid, thresh, *,
                           measure: str, bl: int):
    """One row block of the pairwise-complete screen
    (setops.pairs_above_complete): four rectangle counts — data·dataᵀ,
    data·maskᵀ, mask·dataᵀ, mask·maskᵀ — feed the per-pair-universe
    screen formulas. Returns the packed upper-triangle hit bitmap PLUS
    its 1-bit-per-word summary (1024× smaller), so the host can gather
    only the nonzero words — D2H ∝ hits, not N² (the fetch rule)."""
    d_blk = jax.lax.dynamic_slice_in_dim(d_pad, r0, bl)
    m_blk = jax.lax.dynamic_slice_in_dim(m_pad, r0, bl)
    inter = count_block_auto(d_blk, d_pad)
    ca = count_block_auto(d_blk, m_pad).astype(jnp.float32)
    cb = count_block_auto(m_blk, d_pad).astype(jnp.float32)
    m_pair = count_block_auto(m_blk, m_pad).astype(jnp.float32)
    vals = _screen_vals_core(inter, ca, cb, m_pair, measure)
    row_g = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 0) + r0
    col_g = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
    hit = (vals >= thresh) & (col_g > row_g) & (col_g < n_valid)
    hits = _pack_bit_rows(hit)
    occ = hits != 0
    pad = (-occ.shape[1]) % 32
    if pad:
        occ = jnp.pad(occ, ((0, 0), (0, pad)))
    return hits, _pack_bit_rows(occ)


def _pack_bit_rows(mask: jax.Array) -> jax.Array:
    """bool [X, Y] (Y % 32 == 0) → uint32 [X, Y/32], little bit order
    (bit y of the row lands in word y//32 at weight 1 << (y%32) — the
    layout ``layout.unpack_bits`` inverts)."""
    x, y = mask.shape
    bits = mask.reshape(x, y // 32, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(bits * weights[None, None, :], axis=2, dtype=jnp.uint32)


def _hits_one_block(
    blk: jax.Array,
    packed: jax.Array,
    thresh: jax.Array,
    nnz_rows: jax.Array,
    nnz_cols: jax.Array,
    b0: jax.Array,
    c0: jax.Array,
    m_f: jax.Array,
    measure: str,
):
    """One row-block vs one column shard: packed uint32 hit bitmap
    [B, packed.shape[0]/32] where the measure ≥ thresh, restricted to
    strictly upper-triangular pairs in GLOBAL ids (row b0+i, col c0+j) —
    global bases make this reusable by the distributed ring driver
    (parallel/query.py), where the column shard is a streamed partner.
    """
    counts = count_block_auto(blk, packed)  # [B, N]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, counts.shape, 0) + b0
    col_ids = jax.lax.broadcasted_iota(jnp.int32, counts.shape, 1) + c0
    vals = _screen_vals(counts, nnz_rows, nnz_cols, m_f, measure)
    hit = (vals >= thresh) & (col_ids > row_ids)  # dedup triangle
    return _pack_bit_rows(hit)


def _hits_blocks_body(
    packed: jax.Array,
    thresh: jax.Array,
    nnz: jax.Array,
    block_rows: int,
    measure: str,
    m_f: jax.Array,
):
    n, _ = packed.shape
    nb = n // block_rows
    blocks = packed.reshape(nb, block_rows, packed.shape[1])
    nnz_blocks = nnz.reshape(nb, block_rows)
    base = jnp.arange(nb, dtype=jnp.int32) * block_rows
    zero = jnp.int32(0)
    return jax.lax.map(
        lambda args: _hits_one_block(
            args[0], packed, thresh, args[2], nnz, args[1], zero, m_f, measure
        ),
        (blocks, base, nnz_blocks),
    )


@functools.partial(jax.jit, static_argnames=("block_rows", "measure"))
def _hits_and_summary(
    packed: jax.Array,
    thresh: jax.Array,
    nnz: jax.Array,
    block_rows: int,
    measure: str,
    m_f: jax.Array,
):
    """Screen + word-level summary, both left ON DEVICE.

    The hit bitmap is 32× smaller than counts, but through this relay
    even that dominates (34 MB fetched at ~5 MB/s while the screen
    compute is ~0.15 s — measured). So the device also packs a second
    level: one bit per WORD of the hit bitmap (1024× smaller than
    counts). The host fetches only the summary and then gathers the few
    nonzero words — D2H is O(hits), not O(N²/32)."""
    n = packed.shape[0]
    wout = n // 32
    hits = _hits_blocks_body(packed, thresh, nnz, block_rows, measure, m_f)
    flat = hits.reshape(n, wout)
    return flat, _word_summary(flat)


def _word_summary(flat: jax.Array) -> jax.Array:
    """One bit per WORD of a packed hit bitmap (the phase-1 fetch unit —
    1024× smaller than counts)."""
    wout = flat.shape[1]
    nz = jnp.pad(flat != 0, ((0, 0), (0, round_up(wout, 32) - wout)))
    return _pack_bit_rows(nz)


@jax.jit
def _gather_hit_words(
    flat: jax.Array, ri: jax.Array, wi: jax.Array
) -> jax.Array:
    # 2-D gather (not a flattened index: row·W overflows int32 at the
    # N=1M scale and jax demotes int64 indices)
    return flat[ri, wi]


# Tile pairs processed per device chunk of the tile-walk query paths
# (chunk · ti² · 4 B of count tiles live at once — 16 MB at ti=256).
# The tile list pads to a chunk multiple, so chunk also bounds the
# wasted duplicate tiles at the tail: 64 keeps the worst-case waste
# under 63 tiles (<2% at N=8192) where 256 wasted up to 45%.
_SCREEN_TILE_CHUNK = 64


def _tile_walk_operands(bm):
    """Shared setup for the K2 tile-walk query paths (tile screen, tile
    top-k): the (n_pad, w_pad)-padded device operand (cached on the
    matrix) plus the triangular tile list padded to a chunk multiple by
    repeating the last tile, with validity flags (the screen rewrites
    identical words on a duplicate tile — idempotent — but a top-k merge
    is NOT, so it masks invalid tiles)."""
    from stormtpu.config import default_config
    from stormtpu.kernels.mxu import k2_tile_shape
    from stormtpu.utils import triangular_tile_ids

    cfg = default_config()
    w = bm.n_words
    ti, wk = k2_tile_shape(cfg, bm.n, w)
    n_pad = round_up(bm.n, ti)
    nb = n_pad // ti
    ibs, jbs = triangular_tile_ids(nb)
    t_pad = round_up(ibs.size, min(_SCREEN_TILE_CHUNK, _next_pow2(ibs.size)))
    ibs_p = np.full(t_pad, ibs[-1], dtype=np.int32)
    jbs_p = np.full(t_pad, jbs[-1], dtype=np.int32)
    valid = np.zeros(t_pad, dtype=np.int32)
    ibs_p[: ibs.size] = ibs
    jbs_p[: jbs.size] = jbs
    valid[: ibs.size] = 1
    w_pad = round_up(w, wk)

    def build():
        xp = np.zeros((n_pad, w_pad), dtype=np.uint32)
        xp[: bm.n, :w] = bm.packed
        return jnp.asarray(xp)

    packed_d = bm.device_cached(("padded2d", n_pad, w_pad), build)
    return (packed_d, jnp.asarray(ibs_p), jnp.asarray(jbs_p),
            jnp.asarray(valid), ti, wk, n_pad)


def _topk_tile_walk(
    packed: jax.Array,
    ibs: jax.Array,
    jbs: jax.Array,
    valid: jax.Array,
    *,
    k: int,
    ti: int,
    wk: int,
    interpret: bool,
    variant: str,
    psum_axis: Optional[str] = None,
):
    """TRIANGULAR top-k: the tuned K2 MXU tile walk with a per-row
    running top-k merge — half the FLOPs of the square block form. Each
    upper tile (ib, jb) offers candidates to BOTH row blocks: its rows
    (columns in jb) and, transposed, jb's rows (columns in ib); a pair
    (i, j) lives in exactly one upper tile, so no column is ever offered
    to a row twice — top-k merges are not idempotent (a re-offered
    candidate can displace a distinct equal-valued one), which is also
    why padded duplicate tiles carry ``valid=False`` and are masked to
    value −1 (init value; always displaced by real ≥0 counts), and why
    diagonal tiles merge only one side (their transpose is the same
    candidate set).

    Correctness of the streaming merge is the distributed-topk argument
    (parallel/query.py): a global top-k partner of row i is among the
    top-min(k, ti) of its own tile column block. Tie order among equal
    counts may differ from the single-chip full-row ``lax.top_k``.

    ``psum_axis``: when set, ``packed`` is one device's WORD slice inside
    a ``shard_map`` over that mesh axis — each chunk's count tiles are
    int32 K-partials, ``psum``-merged to the exact tiles before any
    top-k merge touches them (the bits-axis distributed form,
    parallel/query.py). The merge itself then runs on replicated exact
    tiles, so the single-chip correctness argument applies unchanged.
    """
    from stormtpu.kernels.mxu import count_tiles_pallas_mxu

    n_pad = packed.shape[0]
    kk = min(k, ti)
    chunk = min(_SCREEN_TILE_CHUNK, ibs.shape[0])
    n_chunks = ibs.shape[0] // chunk
    iota0 = jax.lax.broadcasted_iota(jnp.int32, (ti, ti), 0)
    iota1 = jax.lax.broadcasted_iota(jnp.int32, (ti, ti), 1)

    def tile_cands(args):
        tile, ib, jb, ok = args
        row_g = ib * ti + iota0
        col_g = jb * ti + iota1
        c = jnp.where((row_g == col_g) | ~ok, jnp.int32(-1),
                      tile.astype(jnp.int32))
        va, ia = jax.lax.top_k(c, kk)
        vb, ib_ = jax.lax.top_k(c.T, kk)
        return (va, ia.astype(jnp.int32) + jb * ti,
                vb, ib_.astype(jnp.int32) + ib * ti)

    def merge(best, row0, v, gi):
        bv = jax.lax.dynamic_slice(best[0], (row0, 0), (ti, k))
        bi = jax.lax.dynamic_slice(best[1], (row0, 0), (ti, k))
        cand_v = jnp.concatenate([bv, v], axis=1)
        cand_i = jnp.concatenate([bi, gi], axis=1)
        nv, sel = jax.lax.top_k(cand_v, k)
        ni = jnp.take_along_axis(cand_i, sel, axis=1)
        return (
            jax.lax.dynamic_update_slice(best[0], nv, (row0, 0)),
            jax.lax.dynamic_update_slice(best[1], ni, (row0, 0)),
        )

    def body(c, best):
        ib_c = jax.lax.dynamic_slice(ibs, (c * chunk,), (chunk,))
        jb_c = jax.lax.dynamic_slice(jbs, (c * chunk,), (chunk,))
        ok_c = jax.lax.dynamic_slice(valid, (c * chunk,), (chunk,))
        tiles = count_tiles_pallas_mxu(
            packed, ib_c, jb_c, tile_rows=ti, tile_words=wk,
            interpret=interpret, variant=variant,
        )
        if psum_axis is not None:
            tiles = jax.lax.psum(tiles, psum_axis)
        va, ia, vb, ib_t = jax.lax.map(
            tile_cands, (tiles, ib_c, jb_c, ok_c.astype(bool))
        )

        def place(t, best_):
            best_ = merge(best_, ib_c[t] * ti, va[t], ia[t])
            # transpose side only for off-diagonal tiles (a diagonal
            # tile's transpose is the same candidate set — re-merging
            # would duplicate indices)
            mirror_v = jnp.where(ib_c[t] == jb_c[t], jnp.int32(-1), vb[t])
            return merge(best_, jb_c[t] * ti, mirror_v, ib_t[t])

        return jax.lax.fori_loop(0, chunk, place, best)

    best = (
        jnp.full((n_pad, k), -1, dtype=jnp.int32),
        jnp.zeros((n_pad, k), dtype=jnp.int32),
    )
    best = jax.lax.fori_loop(0, n_chunks, body, best)
    return best


@functools.partial(
    jax.jit,
    static_argnames=("k", "ti", "wk", "interpret", "variant"),
)
def _topk_tiles(
    packed: jax.Array,
    ibs: jax.Array,
    jbs: jax.Array,
    valid: jax.Array,
    *,
    k: int,
    ti: int,
    wk: int,
    interpret: bool,
    variant: str,
):
    """Single-chip jit wrapper over :func:`_topk_tile_walk`."""
    return _topk_tile_walk(
        packed, ibs, jbs, valid,
        k=k, ti=ti, wk=wk, interpret=interpret, variant=variant,
    )


def _screen_tile(tile, ib, jb, nnz, thresh, m_f, ti, measure, iota0, iota1):
    """Screen one [ti, ti] count tile at global block coords (ib, jb) →
    packed hit words [ti, ti/32] (col > row triangle in global ids).
    Shared by the single-chip tile screen and the K-shard distributed
    screen (parallel/query.py)."""
    row_g = ib * ti + iota0
    col_g = jb * ti + iota1
    nzr = jax.lax.dynamic_slice(nnz, (ib * ti,), (ti,))
    nzc = jax.lax.dynamic_slice(nnz, (jb * ti,), (ti,))
    vals = _screen_vals(tile, nzr, nzc, m_f, measure)
    return _pack_bit_rows((vals >= thresh) & (col_g > row_g))


@functools.partial(
    jax.jit,
    static_argnames=("ti", "wk", "interpret", "variant", "measure"),
)
def _hits_tiles_and_summary(
    packed: jax.Array,
    ibs: jax.Array,
    jbs: jax.Array,
    thresh: jax.Array,
    nnz: jax.Array,
    m_f: jax.Array,
    *,
    ti: int,
    wk: int,
    interpret: bool,
    variant: str,
    measure: str,
):
    """TRIANGULAR screen: the same tuned K2 MXU tile walk the count
    matrix uses (half the FLOPs of the square block screen), with the
    screen + bit-pack fused after each chunk of tiles so the count tiles
    never materialize beyond one chunk. Off-diagonal tiles (ib < jb) are
    entirely upper-triangular in global ids, so only diagonal tiles need
    the col > row mask — which the global-id mask applies uniformly.
    The caller pads the (ibs, jbs) list to a chunk multiple by repeating
    the last tile: re-screening a tile rewrites the same bitmap words
    with the same values (idempotent).

    Returns (hit bitmap [n_pad, n_pad/32], word summary), both ON DEVICE
    — the two-phase fetch of ``_hits_and_summary`` applies unchanged.
    """
    from stormtpu.kernels.mxu import count_tiles_pallas_mxu

    n_pad = packed.shape[0]
    wout = n_pad // 32
    wt = ti // 32
    chunk = min(_SCREEN_TILE_CHUNK, ibs.shape[0])
    n_chunks = ibs.shape[0] // chunk
    iota0 = jax.lax.broadcasted_iota(jnp.int32, (ti, ti), 0)
    iota1 = jax.lax.broadcasted_iota(jnp.int32, (ti, ti), 1)

    def tile_hit(args):
        tile, ib, jb = args
        return _screen_tile(tile, ib, jb, nnz, thresh, m_f, ti, measure,
                            iota0, iota1)

    def body(c, bitmap):
        ib_c = jax.lax.dynamic_slice(ibs, (c * chunk,), (chunk,))
        jb_c = jax.lax.dynamic_slice(jbs, (c * chunk,), (chunk,))
        tiles = count_tiles_pallas_mxu(
            packed, ib_c, jb_c, tile_rows=ti, tile_words=wk,
            interpret=interpret, variant=variant,
        )
        words = jax.lax.map(tile_hit, (tiles, ib_c, jb_c))  # [chunk, ti, wt]

        def place(k, bm_):
            return jax.lax.dynamic_update_slice(
                bm_, words[k], (ib_c[k] * ti, jb_c[k] * wt)
            )

        return jax.lax.fori_loop(0, chunk, place, bitmap)

    bitmap = jnp.zeros((n_pad, wout), dtype=jnp.uint32)
    bitmap = jax.lax.fori_loop(0, n_chunks, body, bitmap)
    return bitmap, _word_summary(bitmap)


def _validate_screen(measure: str, threshold: float) -> jax.Array:
    """Validate (measure, threshold) and return the float32 device-screen
    threshold (with under-admission slack for similarity measures)."""
    from stormtpu.setops import SIM_OPS

    if measure != "count" and measure not in SIM_OPS:
        raise ValueError(f"unknown measure {measure!r}")
    if measure == "count":
        if threshold < 1:
            raise ValueError("count threshold must be >= 1 (0 matches every pair)")
        return jnp.float32(threshold)
    if not 0.0 < threshold <= 1.0:
        raise ValueError("similarity threshold must be in (0, 1]")
    return jnp.float32(threshold) - jnp.float32(1e-4)  # slack


def pairs_above(
    x: MatrixLike,
    threshold: float,
    *,
    measure: str = "count",
    block_rows: Optional[int] = None,
    config: Optional[EngineConfig] = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All unordered pairs (i < j) with measure ≥ threshold.

    measure: "count" (exact integer intersection count) or a similarity —
    "jaccard", "dice", "cosine", "overlap", "phi", "r2" (float; for phi
    the screen keeps positively-correlated pairs, threshold ∈ (0, 1]).
    Returns (ii, jj, values); values are int32 counts for "count",
    float64 similarities otherwise.

    Transfer is two-phase: the host fetches a 1-bit-per-WORD summary of
    the device-resident hit bitmap (1024× less than counts) and then
    gathers only the nonzero words — D2H scales with the number of hits,
    not with N² (measured: the one-phase 34 MB bitmap fetch dominated the
    0.15 s screen compute through this relay). A dense screen falls back
    to the straight bitmap fetch. For similarities the device screen runs
    in float32 with slack and the host re-filters hits exactly in
    float64, so rounding can only add candidates, never drop true hits.
    """
    del config
    bm = _as_bitmatrix(x)
    dev_thresh = _validate_screen(measure, threshold)
    # Screens follow the same density-adaptive dispatch as counts (D1):
    # when the host sparse paths win (extreme sparsity — K4's work is
    # ∝ nnz², not N²·M), compute exact counts there and filter directly;
    # no device screen or refine pass is needed. Block-clustered inputs
    # (K5) take the same count-then-filter route while the count matrix
    # fits on host — the K5 counts skip all co-empty tile work (measured
    # 17× over the tile walk the screen would otherwise ride), and the
    # full matrix makes every measure (incl. phi/r2, which score
    # zero-intersection pairs) filterable exactly.
    from stormtpu.dispatch import choose_strategy

    strategy = (
        choose_strategy(bm.n, bm.m_bits, bm.density, bm=bm)
        if bm.n > 1 else "popcount"
    )
    if strategy == "clustered" and bm.n > 32768:
        # C = N²·int32 no longer fits on host; the triangular tile
        # screen is the exact fallback (full dense walk)
        strategy = "pallas_mxu"
    if strategy in ("sparse", "sparse_outer", "clustered"):
        from stormtpu.api import intersect_count_matrix

        c = intersect_count_matrix(bm)
        # filter block-wise: a full-triangle materialization (np.triu
        # copy, or triu_indices for r2, which needs the WHOLE triangle —
        # anti-correlated zero-overlap pairs score high) would add O(N²)
        # host transients on top of c itself
        blk = max(1, (1 << 27) // max(bm.n, 1))
        parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        cols = np.arange(bm.n)
        for r0 in range(0, bm.n, blk):
            rows = np.arange(r0, min(r0 + blk, bm.n))
            cb = c[r0 : r0 + rows.size]
            if measure == "count":
                vals_b = cb
            else:
                from stormtpu.setops import derive_similarity

                vals_b = derive_similarity(
                    cb, bm.row_nnz[rows][:, None], bm.row_nnz[None, :],
                    bm.m_bits, measure,
                )
            tri = cols[None, :] > rows[:, None]
            si_b, sj_b = np.nonzero(tri & (vals_b >= threshold))
            out_v = (cb[si_b, sj_b].astype(np.int32) if measure == "count"
                     else vals_b[si_b, sj_b])
            parts.append((rows[si_b].astype(np.int32),
                          sj_b.astype(np.int32), out_v))
        ii = np.concatenate([p[0] for p in parts])
        jj = np.concatenate([p[1] for p in parts])
        return ii, jj, np.concatenate([p[2] for p in parts])
    # device screen: operand + device hit bitmap must fit HBM — refuse
    # with the stripe-walking route instead of an opaque mid-call OOM.
    # Placed AFTER dispatch: the host sparse routes above allocate no
    # device memory (the clustered route guards inside
    # intersect_count_matrix), and the ceiling admits the measured
    # 100k×1M screen shape (BASELINE.md).
    from stormtpu.stream import require_device_budget

    if bm.n > 2:
        require_device_budget(
            4 * bm.n * bm.n_words + bm.n * bm.n // 8,
            f"N={bm.n}: the screen operand plus device hit bitmap",
            "use stormtpu.stream_query.stream_pairs_above "
            "(host-RAM-bounded)",
        )
    if strategy == "pallas_mxu":
        # triangular K2 tile screen: same tuned MXU walk as the count
        # matrix — half the FLOPs of the square block screen
        from stormtpu.config import default_config
        from stormtpu.tuning import tuned_variant
        from stormtpu.utils import pallas_interpret_default

        cfg = default_config()
        packed_d, ibs_p, jbs_p, _, ti, wk, n_pad = _tile_walk_operands(bm)
        wout = n_pad // 32
        hits_d, summary_d = _hits_tiles_and_summary(
            packed_d, ibs_p, jbs_p,
            dev_thresh, bm.device_nnz(n_pad), jnp.float32(bm.m_bits),
            ti=ti, wk=wk, interpret=bool(pallas_interpret_default()),
            variant=tuned_variant("k2", cfg.k2_variant), measure=measure,
        )
    else:
        if block_rows is None:
            block_rows = _default_block_rows(bm.m_bits, bm.n)
        lcm = int(np.lcm(block_rows, 32))
        n_pad = round_up(max(bm.n, 1), lcm)
        wout = n_pad // 32
        hits_d, summary_d = _hits_and_summary(
            bm.device_padded(n_pad), dev_thresh, bm.device_nnz(n_pad),
            block_rows, measure, jnp.float32(bm.m_bits),
        )
    # phase 1: fetch the 1-bit-per-word summary; locate candidate words
    summary = np.asarray(summary_d)
    wi_r, wi_w = _expand_words(summary[: bm.n], np.int32(wout))
    if wi_r.size > n_pad * wout // 8:
        # dense screen: gathering word-by-word would cost more than the
        # straight bitmap fetch
        hits = np.asarray(hits_d)
        return _expand_and_refine(bm, hits, measure, threshold)
    # phase 2: gather only the nonzero words (fixed-shape chunked
    # dispatches, same pattern as pair_counts)
    if wi_r.size:
        k = wi_r.size
        chunk = int(min(max(_next_pow2(k), 4096), 1 << 16))
        p_pad = round_up(k, chunk)
        ri_p = np.zeros(p_pad, dtype=np.int32)
        wi_p = np.zeros(p_pad, dtype=np.int32)
        ri_p[:k] = wi_r
        wi_p[:k] = wi_w
        words = np.concatenate([
            np.asarray(_gather_hit_words(
                hits_d, jnp.asarray(ri_p[o : o + chunk]),
                jnp.asarray(wi_p[o : o + chunk]),
            ))
            for o in range(0, p_pad, chunk)
        ])[:k]
    else:
        words = np.zeros(0, np.uint32)
    ii, jj = _expand_bits(bm, wi_r, wi_w, words)
    return _refine(bm, ii, jj, measure, threshold)


# Words expanded per host chunk (~0.5 GB transient of unpacked bits).
_EXPAND_CHUNK_WORDS = 1 << 24


def _expand_word_coords(
    wi_r: np.ndarray, wi_w: np.ndarray, words: np.ndarray, width: int
) -> tuple[np.ndarray, np.ndarray]:
    """Set-bit coordinates from nonzero bitmap words: ``words[k]`` packs
    columns [wi_w[k]·32, +32) of row wi_r[k]; keeps col < ``width``,
    row-major (sorted) order. THE bit-expansion point — every screen/
    summary expansion path goes through here. Chunked so the transient
    unpacked-bit buffer stays bounded (a single pass over ~2e9 nonzero
    words would allocate ~64 B/word of transients and OOM the host)."""
    if not words.size:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    out_r: list[np.ndarray] = []
    out_c: list[np.ndarray] = []
    for o in range(0, words.size, _EXPAND_CHUNK_WORDS):
        w = words[o : o + _EXPAND_CHUNK_WORDS]
        bits = np.unpackbits(
            w.view("<u1").reshape(-1, 4), axis=1, bitorder="little"
        )
        sel, bit = np.nonzero(bits)
        # nonzero orders are row-major, so (row, word, bit) stays sorted
        cols = wi_w[o + sel] * 32 + bit
        keep = cols < width
        out_r.append(wi_r[o + sel][keep])
        out_c.append(cols[keep])
    return np.concatenate(out_r), np.concatenate(out_c)


def _expand_words(rows: np.ndarray, width: int) -> tuple[np.ndarray, np.ndarray]:
    """Set-bit coordinates of a packed uint32 bitmap: [R, W/32] →
    (row, col) with col < ``width``. Only the nonzero words are
    expanded, so cost is O(bitmap scan + set bits)."""
    ri, wi = np.nonzero(rows)
    if not ri.size:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return _expand_word_coords(ri, wi, rows[ri, wi], width)


def _expand_bits(bm, wi_r: np.ndarray, wi_w: np.ndarray, words: np.ndarray):
    """COO pair indices (int32) from nonzero hit-bitmap words."""
    ii, jj = _expand_word_coords(wi_r, wi_w, words, bm.n)
    return ii.astype(np.int32), jj.astype(np.int32)


def _refine(bm, ii: np.ndarray, jj: np.ndarray, measure: str,
            threshold: float):
    """Exact re-filter of screen candidates (int counts via
    ``pair_counts``; float64 for similarities)."""
    counts = pair_counts(bm, ii, jj) if ii.size else np.zeros(0, np.int32)
    if measure == "count":
        return ii, jj, counts
    from stormtpu.setops import derive_similarity

    vals = derive_similarity(counts, bm.row_nnz[ii], bm.row_nnz[jj],
                             bm.m_bits, measure)
    keep = vals >= threshold
    return ii[keep], jj[keep], vals[keep]


def _expand_and_refine(bm, hits: np.ndarray, measure: str,
                       threshold: float):
    """Expand a full packed [n_pad, n_pad/32] hit bitmap to COO and
    refine. Used by the distributed screen (parallel/query.py), whose
    gather already materialized the bitmap, and by the dense-screen
    fallback of ``pairs_above``."""
    ii, jj = _expand_words(hits[: bm.n], bm.n)
    return _refine(bm, ii.astype(np.int32), jj.astype(np.int32),
                   measure, threshold)
