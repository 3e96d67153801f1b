"""K5 — block-clustered work-list kernel: MXU tiles over co-occupied
K-groups only.

TPU-native analog of the reference's hybrid/skip regime (SURVEY.md §1
regime 3, §3 C8 ``STORM_bitmap_cont_t``): the reference keeps a per-bitmap
summary bitmap of non-empty 2¹⁶-bit blocks and ANDs the summaries so
co-empty block pairs cost O(1). Per-pair branching is XLA-hostile, so the
TPU form hoists ALL of the skipping to the host and leaves the device a
flat, branch-free work list:

1. ``BitMatrix.block_summary`` gives per-row K-group occupancy (group =
   one K2 K-step, ``tile_words`` words); OR-reduce over each ``tile_rows``
   row block → per-tile-block occupancy ``occ[nb, ng]``.
2. For every upper-triangular tile pair (ib, jb), the co-occupied groups
   are ``occ[ib] & occ[jb]`` — the summary AND. Emit one work item
   (tile pair, group) per set bit; tile pairs with no co-occupied group
   never reach the device (their count tile is exactly zero).
3. The Pallas kernel runs the K2 MXU tile body (in-VMEM bit-unpack +
   int8 XXᵀ) over the 1-D work-item grid, with scalar-prefetched
   (ibs, jbs, gsel, slot, first) steering the block index maps —
   identical per-item cost to the K2 triangular walk (the tile axis is
   already "arbitrary"-sequenced there; measured ±0.1%, CLAUDE.md), so
   the speedup over K2 is ≈ 1 / work-fraction.

Work items are sorted by output slot; ``first`` flags the first item of
each slot (zero-initialize on arrival, accumulate across its K-groups —
the same revisit pattern as K2's K axis). Padding items point at a
trailing all-zero K-group of the operand and re-target the last slot with
``first=0``: they accumulate exactly zero.

Exactness: same argument as K2 (0/1 products, int32 accumulation,
EngineConfig.validate bounds M < 2³¹); dropped (tile pair, group) items
contribute zero by construction of the summary. Oracle-tested across
densities and layouts in tests/test_clustered.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stormtpu.config import WORD_BITS, EngineConfig, default_config
from stormtpu.kernels.mxu import _unpack_bits_int8, k2_tile_shape
from stormtpu.utils import (
    assemble_triangular,
    pallas_interpret_default,
    round_up,
)

__all__ = [
    "ClusteredPlan",
    "StripeWorklist",
    "build_clustered_plan",
    "build_stripe_worklist",
    "count_tiles_worklist",
    "count_matrix_clustered",
]


def _k5_kernel_concat(ibs_ref, jbs_ref, gs_ref, sl_ref, fi_ref,
                      a_ref, b_ref, o_ref):
    """One work item: accumulate one co-occupied K-group into the slot's
    count tile (concat-unpack variant)."""
    t = pl.program_id(0)

    @pl.when(fi_ref[t] == 1)
    def _zero():
        o_ref[:] = jnp.zeros_like(o_ref)

    ua = _unpack_bits_int8(a_ref[:])
    ub = _unpack_bits_int8(b_ref[:])
    o_ref[0] += jax.lax.dot_general(
        ua,
        ub,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _k5_kernel_planes(ibs_ref, jbs_ref, gs_ref, sl_ref, fi_ref,
                      a_ref, b_ref, o_ref):
    """One work item, "planes" variant: one MXU dot per bit plane."""
    t = pl.program_id(0)

    @pl.when(fi_ref[t] == 1)
    def _zero():
        o_ref[:] = jnp.zeros_like(o_ref)

    a = a_ref[:]
    b = b_ref[:]
    acc = jnp.zeros((a.shape[0], b.shape[0]), dtype=jnp.int32)
    for bit in range(WORD_BITS):
        ua = ((a >> jnp.uint32(bit)) & jnp.uint32(1)).astype(jnp.int8)
        ub = ((b >> jnp.uint32(bit)) & jnp.uint32(1)).astype(jnp.int8)
        acc += jax.lax.dot_general(
            ua,
            ub,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    o_ref[0] += acc


_K5_VARIANTS = {"concat": _k5_kernel_concat, "planes": _k5_kernel_planes}


@functools.partial(
    jax.jit,
    static_argnames=("n_slots", "tile_rows", "tile_words", "interpret",
                     "variant"),
)
def count_tiles_worklist(
    packed: jax.Array,
    ibs: jax.Array,
    jbs: jax.Array,
    gsel: jax.Array,
    slots: jax.Array,
    first: jax.Array,
    *,
    n_slots: int,
    tile_rows: int,
    tile_words: int,
    interpret: bool,
    variant: str = "planes",
) -> jax.Array:
    """``n_slots`` count tiles int32 [n_slots, TI, TI]: work item t
    accumulates the (ibs[t], jbs[t]) row-block pair over K-group gsel[t]
    into output slot slots[t]. Items must arrive sorted by slot with
    ``first`` marking each slot's first item; every slot must be visited
    (unvisited output memory is undefined — the planner guarantees this).
    """
    n_pad, w_pad = packed.shape
    assert n_pad % tile_rows == 0 and w_pad % tile_words == 0
    t_work = ibs.shape[0]
    kdim = tile_words * WORD_BITS

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(t_work,),
        in_specs=[
            pl.BlockSpec(
                (tile_rows, tile_words),
                lambda t, ibs_r, jbs_r, gs_r, sl_r, fi_r: (ibs_r[t], gs_r[t]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_rows, tile_words),
                lambda t, ibs_r, jbs_r, gs_r, sl_r, fi_r: (jbs_r[t], gs_r[t]),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_rows, tile_rows),
            lambda t, ibs_r, jbs_r, gs_r, sl_r, fi_r: (sl_r[t], 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        _K5_VARIANTS[variant],
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_slots, tile_rows, tile_rows),
                                       jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * tile_rows * tile_rows * kdim * t_work,
            bytes_accessed=(2 * tile_rows * tile_words * 4
                            + tile_rows * tile_rows * 4) * t_work,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ibs, jbs, gsel, slots, first, packed, packed)


@dataclasses.dataclass(frozen=True)
class ClusteredPlan:
    """Host-built execution plan for the K5 work-list kernel."""

    ti: int                 # tile rows
    wk: int                 # words per K-group (= K2 K-step)
    n_pad: int
    w_pad: int              # includes one trailing all-zero pad group
    nb: int                 # row blocks
    ng: int                 # real K-groups (pad group excluded)
    slot_ibs: np.ndarray    # int32 [P] visited tile-pair row blocks
    slot_jbs: np.ndarray    # int32 [P]
    ibs_w: np.ndarray       # int32 [T_pad] work-item row block
    jbs_w: np.ndarray       # int32 [T_pad]
    gsel_w: np.ndarray      # int32 [T_pad] work-item K-group
    slots_w: np.ndarray     # int32 [T_pad] output slot
    first_w: np.ndarray     # int32 [T_pad] 1 = first item of its slot
    n_slots: int            # bucket-padded kernel output slots (≥ P; the
                            # pad slots are zero-written by filler items —
                            # an unbucketed slot count was a fresh 20-60 s
                            # remote compile per co-occupancy pattern)
    n_work: int             # real items (before bucket padding)
    work_fraction: float    # n_work / (T_tri · ng): the dispatch statistic


# compile-shape quantizer for work lists and slot counts: padded K5
# items cost real MXU work and padded slots real D2H, so the 1/8-octave
# buckets (≤12.5% waste) beat pow2 (≤2×) — shared home in utils.tiling
from stormtpu.utils import quantize_bucket as _quantize  # noqa: E402


def _block_occupancy(bm, cfg: EngineConfig):
    """Per-tile-block K-group occupancy bool [nb, ng] (+ tile geometry),
    cached on the BitMatrix — the one O(N·W) summary scan, shared by the
    dispatch statistic and the plan builder. None when ng < 2 (a single
    K-group: the summary cannot skip anything)."""
    n, w = bm.n, bm.n_words
    if n == 0 or w == 0:
        return None
    ti, wk = k2_tile_shape(cfg, n, w)
    ng = -(-w // wk)
    if ng < 2:
        return None
    cache = bm.__dict__.setdefault("_occ_cache", {})
    key = (ti, wk)
    hit = cache.get(key)
    if hit is None:
        n_pad = round_up(n, ti)
        nb = n_pad // ti
        # per-row group occupancy via the C8 summary, OR-reduced per
        # tile block of rows
        occ_rows = bm.block_summary(block_bits=wk * WORD_BITS).astype(bool)
        occ = np.zeros((nb * ti, ng), dtype=bool)
        occ[:n] = occ_rows
        occ = occ.reshape(nb, ti, ng).any(axis=1)  # [nb, ng]
        hit = (occ, ti, wk, n_pad, nb, ng)
        cache[key] = hit
    return hit


def clustered_work_fraction(
    bm, config: Optional[EngineConfig] = None
) -> Optional[float]:
    """The D1 dispatch statistic for the clustered regime: fraction of
    (upper-triangular tile pair, K-group) cells whose summaries co-occupy
    — i.e. K5's work relative to the full K2 walk. None for shapes where
    the skip machinery is inapplicable (single K-group)."""
    cfg = config or default_config()
    geo = _block_occupancy(bm, cfg)
    if geo is None:
        return None
    occ, ti, wk, n_pad, nb, ng = geo
    ibs_t, jbs_t = np.triu_indices(nb)
    co = occ[ibs_t] & occ[jbs_t]
    return float(co.sum()) / float(ibs_t.size * ng)


def build_clustered_plan(
    bm, config: Optional[EngineConfig] = None
) -> Optional[ClusteredPlan]:
    """Summary-AND planning: per-tile-block K-group occupancy → sorted
    (tile pair, group) work list. Returns None for degenerate shapes
    (single K-group — nothing to skip) or an all-empty matrix.
    """
    cfg = config or default_config()
    geo = _block_occupancy(bm, cfg)
    if geo is None:
        return None
    occ, ti, wk, n_pad, nb, ng = geo

    ibs_t, jbs_t = np.triu_indices(nb)
    co = occ[ibs_t] & occ[jbs_t]               # [T_tri, ng] summary AND
    pair_idx, group_idx = np.nonzero(co)       # sorted by pair (row-major)
    n_work = pair_idx.size
    t_tri = ibs_t.size
    work_fraction = n_work / float(t_tri * ng)
    if n_work == 0:
        return None

    # visited tile pairs → output slots (order of first appearance = pair
    # order, since np.nonzero is pair-major)
    visited, slot_of_item = np.unique(pair_idx, return_inverse=True)
    slot_ibs = ibs_t[visited].astype(np.int32)
    slot_jbs = jbs_t[visited].astype(np.int32)
    first = np.empty(n_work, dtype=np.int32)
    first[0] = 1
    first[1:] = (slot_of_item[1:] != slot_of_item[:-1]).astype(np.int32)

    # bucket both the slot count and the item count (bounded compile
    # count, ≤12.5% padding): pad slots are zero-written by one filler
    # item each (first=1, zero pad K-group), then tail items are exact
    # no-ops (first=0, zero group) into the last pad slot
    p = visited.size
    n_slots = _quantize(p)
    n_fill = n_slots - p
    t_pad = _quantize(n_work + n_fill)
    ibs_w = np.zeros(t_pad, dtype=np.int32)
    jbs_w = np.zeros(t_pad, dtype=np.int32)
    gsel_w = np.full(t_pad, ng, dtype=np.int32)
    slots_w = np.full(t_pad, n_slots - 1, dtype=np.int32)
    first_w = np.zeros(t_pad, dtype=np.int32)
    ibs_w[:n_work] = ibs_t[pair_idx]
    jbs_w[:n_work] = jbs_t[pair_idx]
    gsel_w[:n_work] = group_idx
    slots_w[:n_work] = slot_of_item
    first_w[:n_work] = first
    if n_fill:
        slots_w[n_work : n_work + n_fill] = np.arange(
            p, n_slots, dtype=np.int32
        )
        first_w[n_work : n_work + n_fill] = 1

    return ClusteredPlan(
        ti=ti, wk=wk, n_pad=n_pad, w_pad=(ng + 1) * wk, nb=nb, ng=ng,
        slot_ibs=slot_ibs, slot_jbs=slot_jbs,
        ibs_w=ibs_w, jbs_w=jbs_w, gsel_w=gsel_w, slots_w=slots_w,
        first_w=first_w, n_slots=n_slots, n_work=n_work,
        work_fraction=work_fraction,
    )


@dataclasses.dataclass(frozen=True)
class StripeWorklist:
    """Work list for ONE superblock stripe of the streaming driver
    (stream.py): the C8 summary-AND skip at streaming scale, where the
    N×N result cannot materialize and the single-matrix ``ClusteredPlan``
    (host-assembled full C) does not apply.

    Both the slot count and the item count are padded to 1/8-octave
    buckets so the jitted kernel compiles a bounded number of executables
    across a whole streaming run (every distinct static shape is a fresh
    20-60 s compile through the remote-compile service) while padding
    waste stays ≤12.5%. Padding slots are zero-written by one filler item
    each (``first=1``, zero pad K-group); tail items are exact no-ops
    into the last slot."""

    ibs: np.ndarray        # int32 [T_pad] GLOBAL row-block ids
    jbs: np.ndarray        # int32 [T_pad]
    gsel: np.ndarray       # int32 [T_pad] K-group (ng = zero pad group)
    slots: np.ndarray      # int32 [T_pad] ascending
    first: np.ndarray      # int32 [T_pad]
    vis_loc_i: np.ndarray  # int32 [n_vis] visited LOCAL tile coords
    vis_loc_j: np.ndarray  # int32 [n_vis]
    n_slots: int           # pow2-padded kernel output slots
    n_vis: int             # real visited pairs (prefix of the slots)
    n_work: int            # real items


def build_stripe_worklist(
    occ: np.ndarray, base_i: int, base_j: int, tps: int, triangular: bool
) -> Optional[StripeWorklist]:
    """Summary-AND work list for the superblock stripe whose row blocks
    are ``[base_i, base_i+tps)`` × ``[base_j, base_j+tps)`` of the global
    per-tile-block occupancy ``occ`` (bool [nb, ng]). ``triangular``
    restricts to local upper-triangular pairs (diagonal stripes — the
    caller mirrors at assembly). None when no (pair, group) co-occupies:
    the stripe is exactly zero and need not touch the device."""
    ng = occ.shape[1]
    if triangular:
        loc_i, loc_j = np.triu_indices(tps)
        loc_i = loc_i.astype(np.int32)
        loc_j = loc_j.astype(np.int32)
    else:
        loc_i, loc_j = np.meshgrid(
            np.arange(tps, dtype=np.int32),
            np.arange(tps, dtype=np.int32),
            indexing="ij",
        )
        loc_i, loc_j = loc_i.ravel(), loc_j.ravel()
    gi = base_i + loc_i
    gj = base_j + loc_j
    co = occ[gi] & occ[gj]                     # [P, ng] summary AND
    pair_idx, group_idx = np.nonzero(co)       # sorted pair-major
    n_work = pair_idx.size
    if n_work == 0:
        return None
    visited, slot_of_item = np.unique(pair_idx, return_inverse=True)
    n_vis = visited.size
    first = np.empty(n_work, dtype=np.int32)
    first[0] = 1
    first[1:] = (slot_of_item[1:] != slot_of_item[:-1]).astype(np.int32)

    n_slots = _quantize(n_vis)
    n_fill = n_slots - n_vis
    t_pad = _quantize(n_work + n_fill)
    ibs = np.full(t_pad, gi[visited[-1]], dtype=np.int32)
    jbs = np.full(t_pad, gj[visited[-1]], dtype=np.int32)
    gsel = np.full(t_pad, ng, dtype=np.int32)
    slots = np.full(t_pad, n_slots - 1, dtype=np.int32)
    first_w = np.zeros(t_pad, dtype=np.int32)
    ibs[:n_work] = gi[pair_idx]
    jbs[:n_work] = gj[pair_idx]
    gsel[:n_work] = group_idx
    slots[:n_work] = slot_of_item
    first_w[:n_work] = first
    if n_fill:
        # one filler per padding slot: first=1 + zero K-group writes an
        # exact zero tile, keeping the "every slot visited" contract
        slots[n_work : n_work + n_fill] = np.arange(
            n_vis, n_slots, dtype=np.int32
        )
        first_w[n_work : n_work + n_fill] = 1
    return StripeWorklist(
        ibs=ibs, jbs=jbs, gsel=gsel, slots=slots, first=first_w,
        vis_loc_i=loc_i[visited], vis_loc_j=loc_j[visited],
        n_slots=n_slots, n_vis=n_vis, n_work=n_work,
    )


@dataclasses.dataclass(frozen=True)
class ShardedClusteredPlan:
    """Per-device work lists for the bits-axis (K-shard) K5 form.

    Every device covers the SAME output slot set (the union of tile
    pairs co-occupied in ANY word slice) so the int32 tile partials can
    ``psum``; a device whose slice never touches a slot gets one filler
    item pointing at its local all-zero K-group with ``first=1`` (writes
    an exact zero tile). The padded operand interleaves one zero K-group
    at the END of every device's word slice to serve the fillers and the
    tail padding."""

    ti: int
    wk: int
    n_pad: int
    w_pad: int              # R · (gpd + 1) · wk, zero group per slice
    nb: int
    gpd: int                # real K-groups per device
    r: int                  # devices
    slot_ibs: np.ndarray    # int32 [P] (real visited pairs)
    slot_jbs: np.ndarray    # int32 [P]
    n_slots: int            # bucket-padded kernel output slots (≥ P)
    ibs_w: np.ndarray       # int32 [R, T_pad]
    jbs_w: np.ndarray      # int32 [R, T_pad]
    gsel_w: np.ndarray      # int32 [R, T_pad] LOCAL group ids
    slots_w: np.ndarray     # int32 [R, T_pad]
    first_w: np.ndarray     # int32 [R, T_pad]
    work_fraction: float


def build_sharded_clustered_plan(
    bm, r: int, config: Optional[EngineConfig] = None
) -> Optional[ShardedClusteredPlan]:
    """Bits-axis K5 planning over ``r`` word shards (wk = 128 words per
    K-group, the Mosaic-minimal step). None when the geometry degenerates
    (fewer than one real group per device, or nothing co-occupies)."""
    cfg = config or default_config()
    n, w = bm.n, bm.n_words
    if n == 0 or w == 0:
        return None
    wk = 128
    ti = min(cfg.k2_tile_rows, round_up(max(n, 32), 32))
    gpd = -(-w // (r * wk))         # real groups per device (ceil)
    if gpd < 1:
        return None
    ng = gpd * r
    n_pad = round_up(n, ti)
    nb = n_pad // ti
    # global group occupancy at wk granularity, OR-reduced per tile block
    occ_rows = bm.block_summary(block_bits=wk * WORD_BITS).astype(bool)
    occ = np.zeros((nb * ti, ng), dtype=bool)
    occ[:n, : occ_rows.shape[1]] = occ_rows
    occ = occ.reshape(nb, ti, ng).any(axis=1)   # [nb, ng]

    ibs_t, jbs_t = np.triu_indices(nb)
    co = occ[ibs_t] & occ[jbs_t]                # [T_tri, ng]
    pair_idx, group_idx = np.nonzero(co)
    if pair_idx.size == 0:
        return None
    work_fraction = pair_idx.size / float(ibs_t.size * ng)
    visited, slot_global = np.unique(pair_idx, return_inverse=True)
    p = visited.size
    # bucket the shared slot count (static output shape): pad slots are
    # zero-written on EVERY device (they land in each device's "missing"
    # filler set below), so the psum'd partials stay exact
    n_slots = _quantize(p)
    slot_ibs = ibs_t[visited].astype(np.int32)
    slot_jbs = jbs_t[visited].astype(np.int32)
    lut_ibs = np.concatenate(
        [slot_ibs, np.zeros(n_slots - p, dtype=np.int32)]
    )
    lut_jbs = np.concatenate(
        [slot_jbs, np.zeros(n_slots - p, dtype=np.int32)]
    )

    dev_of_item = group_idx // gpd
    lists = []
    for d in range(r):
        sel = dev_of_item == d
        sl = slot_global[sel]
        gl = (group_idx[sel] - d * gpd).astype(np.int64)
        # fillers: slots this slice never touches (incl. the bucket pad
        # slots) → local zero group (index gpd), first=1 zero-writes
        missing = np.setdiff1d(np.arange(n_slots), sl, assume_unique=False)
        sl = np.concatenate([sl, missing])
        gl = np.concatenate([gl, np.full(missing.size, gpd, dtype=np.int64)])
        order = np.argsort(sl, kind="stable")
        sl, gl = sl[order], gl[order]
        first = np.empty(sl.size, dtype=np.int32)
        first[0] = 1
        first[1:] = (sl[1:] != sl[:-1]).astype(np.int32)
        lists.append((sl, gl, first))

    t_pad = _quantize(max(sl.size for sl, _, _ in lists))
    ibs_w = np.empty((r, t_pad), dtype=np.int32)
    jbs_w = np.empty((r, t_pad), dtype=np.int32)
    gsel_w = np.empty((r, t_pad), dtype=np.int32)
    slots_w = np.empty((r, t_pad), dtype=np.int32)
    first_w = np.zeros((r, t_pad), dtype=np.int32)
    for d, (sl, gl, first) in enumerate(lists):
        k = sl.size
        ibs_w[d, :k] = lut_ibs[sl]
        jbs_w[d, :k] = lut_jbs[sl]
        gsel_w[d, :k] = gl
        slots_w[d, :k] = sl
        first_w[d, :k] = first
        # tail padding: no-op items into the last slot via the zero group
        ibs_w[d, k:] = lut_ibs[sl[-1]]
        jbs_w[d, k:] = lut_jbs[sl[-1]]
        gsel_w[d, k:] = gpd
        slots_w[d, k:] = sl[-1]

    return ShardedClusteredPlan(
        ti=ti, wk=wk, n_pad=n_pad, w_pad=r * (gpd + 1) * wk, nb=nb,
        gpd=gpd, r=r, slot_ibs=slot_ibs, slot_jbs=slot_jbs,
        n_slots=n_slots,
        ibs_w=ibs_w, jbs_w=jbs_w, gsel_w=gsel_w, slots_w=slots_w,
        first_w=first_w, work_fraction=work_fraction,
    )


def pack_sharded_clustered_operand(bm, plan: ShardedClusteredPlan) -> np.ndarray:
    """Host-padded operand uint32 [n_pad, w_pad] laid out so contiguous
    word-sharding gives every device [real groups | one zero group]."""
    per_dev = (plan.gpd + 1) * plan.wk
    xp = np.zeros((plan.n_pad, plan.r * per_dev), dtype=np.uint32)
    w = bm.n_words
    for d in range(plan.r):
        src0 = d * plan.gpd * plan.wk
        src1 = min(src0 + plan.gpd * plan.wk, w)
        if src1 > src0:
            xp[: bm.n, d * per_dev : d * per_dev + (src1 - src0)] = \
                bm.packed[:, src0:src1]
    return xp


def count_matrix_clustered(
    bm,
    *,
    config: Optional[EngineConfig] = None,
    interpret: Optional[bool] = None,
    variant: Optional[str] = None,
    plan: Optional[ClusteredPlan] = None,
) -> np.ndarray:
    """Full N×N exact counts via the K5 work-list kernel (summary-AND
    block skip + triangular mirror). Tile pairs with no co-occupied
    K-group are never computed — their counts are exactly zero."""
    cfg = config or default_config()
    cfg.validate(bm.m_bits)
    if interpret is None:
        interpret = pallas_interpret_default()
    if variant is None:
        from stormtpu.tuning import tuned_variant

        variant = tuned_variant("k2", cfg.k2_variant)
    if plan is None:
        plan = build_clustered_plan(bm, cfg)
    if plan is None:
        # degenerate (single K-group / empty): zero matrix or the plain
        # K2 walk — both exact
        if bm.n == 0 or bm.nnz == 0:
            return np.zeros((bm.n, bm.n), dtype=np.int32)
        from stormtpu.kernels.mxu import count_matrix_pallas_mxu

        return count_matrix_pallas_mxu(
            bm.device_padded(bm.n), config=cfg,
            interpret=interpret, variant=variant,
        )

    def build():
        xp = np.zeros((plan.n_pad, plan.w_pad), dtype=np.uint32)
        xp[: bm.n, : bm.n_words] = bm.packed
        return jnp.asarray(xp)

    packed_d = bm.device_cached(("padded2dz", plan.n_pad, plan.w_pad), build)
    tiles = count_tiles_worklist(
        packed_d,
        jnp.asarray(plan.ibs_w), jnp.asarray(plan.jbs_w),
        jnp.asarray(plan.gsel_w), jnp.asarray(plan.slots_w),
        jnp.asarray(plan.first_w),
        n_slots=int(plan.n_slots),
        tile_rows=plan.ti, tile_words=plan.wk,
        interpret=bool(interpret), variant=variant,
    )
    # pad slots (zero-written fillers) are sliced off on host
    return assemble_triangular(
        np.asarray(tiles)[: plan.slot_ibs.size],
        plan.slot_ibs, plan.slot_jbs, plan.nb, bm.n,
    )
