"""Ring-streaming row-sharded all-pairs driver (D2, distributed form).

Design (BASELINE.json:5, SURVEY.md §3 parallelism table):

- X (packed uint32 [N, W]) is **row-sharded**: device d holds shard
  X_d = X[d·n_loc : (d+1)·n_loc].
- The partner shard **streams around the ring**: at step s, device d
  computes the rectangular count block X_d × X_{(d+s) mod R} while
  ``lax.ppermute`` rotates the streaming buffer one hop for step s+1 —
  the ring-attention-shaped pattern SURVEY.md §6 prescribes for the
  1M×1M multi-host config. Communication rides ICI within a slice and
  DCN across hosts; XLA overlaps the ppermute with the block compute.
- After R steps every ordered shard pair (d, e) has been computed exactly
  once; the result C stays **row-sharded** ([n_loc, N] per device), which
  is the only layout that scales (full C is O(N²)).

The per-step rectangular block kernel is pluggable (``block_fn``): the
XLA int8 path for small W, the Pallas MXU kernel for large W.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.7 stable location
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from stormtpu.config import EngineConfig, default_config
from stormtpu.parallel.mesh import fetch_global, make_row_mesh
from stormtpu.utils import round_up

__all__ = ["distributed_count_matrix", "ring_count_rows", "ring_count_rows_2d"]

BlockFn = Callable[[jax.Array, jax.Array], jax.Array]


def _ring_local_fn(axis: str, r: int, n_loc: int, block_fn: BlockFn,
                   psum_axis: Optional[str] = None):
    """Triangular ring: each UNORDERED shard pair is computed exactly once
    — device d computes (d, d+s) for s = 0..⌈R/2⌉−1ish and ships the
    transposed count tile back over the ring for the mirror entry, instead
    of every device recomputing its partner's block. Halves the
    distributed FLOPs of the square formulation; the extra communication
    is one [n_loc, n_loc] int32 tile per step, which for W ≫ n_loc is far
    smaller than the operand shards already riding the ring (the
    triangular analog of the reference's i ≤ j blocked walk, SURVEY.md
    §4.3, lifted to SPMD).

    Step census: s = 0 is the diagonal; 1 ≤ s ≤ S pairs d with d+s. For
    odd R, S = (R−1)/2 covers every unordered pair once (mirror shipped).
    For even R, S = R/2 and at s = S the pairing d ↔ d+R/2 is mutual —
    both devices compute their own block (SPMD executes everywhere
    anyway), so no mirror is shipped.

    ``psum_axis``: the 2-D composed form — each device holds only a WORD
    slice of its row shard, block_fn yields an exact int32 partial, and
    the psum over the bits axis completes each tile before it enters the
    ring bookkeeping (every device of a row group then runs identical
    ring steps, so the mirrors/ppermutes are unchanged).
    """

    def local_fn(x_local: jax.Array) -> jax.Array:
        my = jax.lax.axis_index(axis)
        out = jnp.zeros((x_local.shape[0], r * n_loc), dtype=jnp.int32)
        buf = x_local
        s_max = r // 2 if r % 2 == 0 else (r - 1) // 2
        for s in range(s_max + 1):
            partner = (my + s) % r
            counts = block_fn(x_local, buf).astype(jnp.int32)
            if psum_axis is not None:
                counts = jax.lax.psum(counts, psum_axis)
            out = jax.lax.dynamic_update_slice(out, counts, (0, partner * n_loc))
            if 0 < s and not (r % 2 == 0 and s == s_max):
                # ship countsᵀ (rows of the partner × cols of me) forward
                # s hops so it lands on the partner that owns those rows
                t_recv = jax.lax.ppermute(
                    counts.T, axis, [(i, (i + s) % r) for i in range(r)]
                )
                src = (my - s) % r
                out = jax.lax.dynamic_update_slice(out, t_recv, (0, src * n_loc))
            if s < s_max:
                # device i sends its buffer to i-1 ⇒ after the hop,
                # device d holds shard (d + s + 1) mod R.
                buf = jax.lax.ppermute(
                    buf, axis, [(i, (i - 1) % r) for i in range(r)]
                )
        return out

    return local_fn


def ring_count_rows(
    mesh: Mesh,
    axis: str,
    n_loc: int,
    block_fn: BlockFn,
):
    """Jittable sharded fn: row-sharded packed [N_pad, W] → row-sharded
    counts int32 [N_pad, N_pad]."""
    r = mesh.shape[axis]
    local = _ring_local_fn(axis, r, n_loc, block_fn)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(axis, None),
        check_vma=False,  # pallas outputs carry no vma metadata
    )


def ring_count_rows_2d(
    mesh: Mesh,
    row_axis: str,
    bit_axis: str,
    n_loc: int,
    block_fn: BlockFn,
):
    """Jittable sharded fn for a 2-D [rows × bits] mesh: packed sharded
    ``P(rows, bits)`` → row-sharded counts int32 [N_pad, N_pad] (each
    device holds a word slice of a row shard; the ring streams row
    shards, a psum over the bits axis completes every tile)."""
    r = mesh.shape[row_axis]
    local = _ring_local_fn(row_axis, r, n_loc, block_fn,
                           psum_axis=bit_axis)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=P(row_axis, bit_axis),
        out_specs=P(row_axis, None),
        check_vma=False,
    )


def kshard_count_rows(mesh: Mesh, axis: str, block_fn: BlockFn):
    """Jittable sharded fn for the **bit-axis (K-dim) sharding** variant:
    each device holds a word slice of every row, computes the partial
    count matrix from its slice, and ``psum`` merges the exact integer
    partials — the honest "sequence parallelism" analog of this workload
    (SURVEY.md §6: the reduction dim is sharded, not the batch)."""

    def local_fn(x_local: jax.Array) -> jax.Array:
        partial = block_fn(x_local, x_local).astype(jnp.int32)
        return jax.lax.psum(partial, axis)

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=P(None, axis),
        out_specs=P(None, None),
        check_vma=False,
    )


def kshard_count_tiles(
    mesh: Mesh,
    axis: str,
    *,
    tile_rows: int,
    tile_words: int,
    interpret: bool,
    variant: str,
):
    """Triangular form of the K-shard variant: each device computes the
    UPPER-TRIANGULAR count tiles of its word slice with the K2 kernel and
    ``psum`` merges the exact int32 partials — half the FLOPs of the
    square ``kshard_count_rows`` (the host mirrors at assembly, exactly
    like the single-chip triangular walk). The tile-id arrays are
    replicated ARGUMENTS, not closure constants (big HLO literals are
    rejected by this environment's remote compiler — CLAUDE.md)."""
    from stormtpu.kernels.mxu import count_tiles_pallas_mxu

    def local_fn(x_local: jax.Array, ibs: jax.Array, jbs: jax.Array):
        tiles = count_tiles_pallas_mxu(
            x_local, ibs, jbs, tile_rows=tile_rows, tile_words=tile_words,
            interpret=interpret, variant=variant,
        )
        return jax.lax.psum(tiles, axis)

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis), P(None), P(None)),
        out_specs=P(None, None),
        check_vma=False,
    )


def kshard_count_tiles_clustered(
    mesh: Mesh,
    axis: str,
    *,
    tile_rows: int,
    tile_words: int,
    n_slots: int,
    interpret: bool,
    variant: str,
):
    """Bits-axis K5: every device runs the work-list kernel over its OWN
    word slice's co-occupied (tile pair, K-group) items (per-device lists
    arrive as row-sharded scalar arrays), and ``psum`` merges the exact
    int32 tile partials. Devices whose slice never touches a slot write
    an exact zero tile via a filler item on their slice's zero K-group —
    every device covers the same slot set, so the psum is well-formed.
    The distributed form of the reference C8 summary-AND skip."""
    from stormtpu.kernels.clustered import count_tiles_worklist

    def local_fn(x_local, ibs, jbs, gsel, slots, first):
        tiles = count_tiles_worklist(
            x_local, ibs[0], jbs[0], gsel[0], slots[0], first[0],
            n_slots=n_slots, tile_rows=tile_rows, tile_words=tile_words,
            interpret=interpret, variant=variant,
        )
        return jax.lax.psum(tiles, axis)

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(None, axis), P(axis, None), P(axis, None), P(axis, None),
            P(axis, None), P(axis, None),
        ),
        out_specs=P(None, None),
        check_vma=False,
    )


# jax.jit(shard_map(...)) built fresh per call recompiles every call
# (20-60 s through the remote-compile service) — cache the compiled fns
# per (mesh, static knobs); jax Meshes hash/compare by value.
@functools.lru_cache(maxsize=64)
def _jit_kshard_tiles_clustered(mesh, axis, ti, wk, n_slots, interpret,
                                variant):
    return jax.jit(kshard_count_tiles_clustered(
        mesh, axis, tile_rows=ti, tile_words=wk, n_slots=n_slots,
        interpret=interpret, variant=variant,
    ))


@functools.lru_cache(maxsize=64)
def _jit_ring2d(mesh, row_axis, bit_axis, n_loc, cfg):
    # default-block_fn form only (a caller-supplied block_fn is a fresh
    # unhashable callable; those callers own their caching)
    from stormtpu.kernels import count_block_auto

    return jax.jit(ring_count_rows_2d(
        mesh, row_axis, bit_axis, n_loc,
        lambda a, b: count_block_auto(a, b, config=cfg),
    ))


@functools.lru_cache(maxsize=64)
def _jit_ring1d(mesh, axis, n_loc, cfg):
    from stormtpu.kernels import count_block_auto

    return jax.jit(ring_count_rows(
        mesh, axis, n_loc,
        lambda a, b: count_block_auto(a, b, config=cfg),
    ))


@functools.lru_cache(maxsize=64)
def _jit_kshard_tiles(mesh, axis, ti, wk, interpret, variant):
    return jax.jit(kshard_count_tiles(
        mesh, axis, tile_rows=ti, tile_words=wk,
        interpret=interpret, variant=variant,
    ))


def distributed_count_matrix(
    packed: np.ndarray,
    *,
    mesh: Optional[Mesh] = None,
    config: Optional[EngineConfig] = None,
    block_fn: Optional[BlockFn] = None,
    shard_axis: str = "rows",
) -> np.ndarray:
    """Exact N×N counts computed data-parallel over a device mesh.

    ``shard_axis="rows"``: row-sharded X, ring-streamed partner shards
    (the BASELINE.json:5 layout; scales N). ``shard_axis="bits"``:
    word-sharded X, psum of exact int32 partial counts (scales M when a
    single row-slice exceeds per-device HBM).

    Returns the gathered matrix (host np.ndarray) — callers at 1M-row
    scale should instead keep the row-sharded device result
    (:func:`ring_count_rows`) or stream stripes (stream.py).
    """
    cfg = config or default_config()
    if mesh is None:
        mesh = make_row_mesh()
    axis = mesh.axis_names[0]
    r = mesh.shape[axis]
    packed = np.asarray(packed, dtype=np.uint32)
    n, w = packed.shape
    cfg.validate(w * 32)
    caller_block_fn = block_fn is not None
    if block_fn is None:
        from stormtpu.kernels import count_block_auto

        block_fn = lambda a, b: count_block_auto(a, b, config=cfg)

    if len(mesh.axis_names) == 2:
        # composed 2-D form (rows × bits): ring over row shards, psum
        # over word slices — for N AND M both beyond a 1-D layout.
        # shard_axis is ignored; the mesh already says both.
        row_axis, bit_axis = mesh.axis_names
        rr, rb = mesh.shape[row_axis], mesh.shape[bit_axis]
        n_pad = round_up(max(n, rr), rr * 8)
        w_pad = round_up(max(w, rb), rb)
        xp = np.zeros((n_pad, w_pad), dtype=np.uint32)
        xp[:n, :w] = packed
        n_loc = n_pad // rr
        x_sharded = jax.device_put(
            xp, NamedSharding(mesh, P(row_axis, bit_axis))
        )
        # compiled fns cached per (mesh, statics) — a fresh
        # jit(shard_map) per call recompiles every call (CLAUDE.md)
        if caller_block_fn:
            fn = jax.jit(ring_count_rows_2d(mesh, row_axis, bit_axis,
                                            n_loc, block_fn))
        else:
            fn = _jit_ring2d(mesh, row_axis, bit_axis, n_loc, cfg)
        return fetch_global(fn(x_sharded))[:n, :n]
    if shard_axis == "bits":
        # each device's word slice must be a multiple of the K-step, and
        # the K-step must satisfy Mosaic's 128-divisible last-dim rule
        wk = 128
        if caller_block_fn or w < r * wk:
            # caller-supplied rectangle kernel, or W too small for a full
            # 128-word K-step per device: square form + psum (at small W
            # the padding waste of the MXU tile walk exceeds its
            # triangular saving; count_block_auto picks the cheap path)
            w_pad = round_up(max(w, r), r)
            xp = np.zeros((n, w_pad), dtype=np.uint32)
            xp[:, :w] = packed
            x_sharded = jax.device_put(xp, NamedSharding(mesh, P(None, axis)))
            fn = jax.jit(kshard_count_rows(mesh, axis, block_fn))
            return np.asarray(fn(x_sharded))[:n, :n]
        # block-clustered inputs route to the K-shard K5 work-list form:
        # per-device summary-AND work lists + psum of exact tile partials
        # (the reference C8 skip at mesh scale). Decided by the same
        # co-occupancy statistic as the single-chip dispatch.
        from stormtpu.kernels.clustered import (
            build_sharded_clustered_plan,
            pack_sharded_clustered_operand,
        )
        from stormtpu.layout import BitMatrix
        from stormtpu.tuning import tuned_variant
        from stormtpu.utils import (
            assemble_triangular,
            pallas_interpret_default,
            triangular_tile_ids,
        )

        bm = BitMatrix.from_packed(packed, m_bits=w * 32)
        splan = build_sharded_clustered_plan(bm, r, cfg)
        if (
            splan is not None
            and splan.work_fraction < cfg.clustered_work_fraction_threshold
        ):
            xp = pack_sharded_clustered_operand(bm, splan)
            fn = _jit_kshard_tiles_clustered(
                mesh, axis, splan.ti, splan.wk, int(splan.n_slots),
                bool(pallas_interpret_default()),
                tuned_variant("k2", cfg.k2_variant),
            )
            sh = NamedSharding(mesh, P(axis, None))
            tiles = np.asarray(fn(
                jax.device_put(xp, NamedSharding(mesh, P(None, axis))),
                jax.device_put(splan.ibs_w, sh),
                jax.device_put(splan.jbs_w, sh),
                jax.device_put(splan.gsel_w, sh),
                jax.device_put(splan.slots_w, sh),
                jax.device_put(splan.first_w, sh),
            ))
            # pad slots (zero on every device, so exact under psum) are
            # sliced off before assembly
            return assemble_triangular(
                tiles[: splan.slot_ibs.size],
                splan.slot_ibs, splan.slot_jbs, splan.nb, n,
            )
        # default: triangular K2 tiles per word-slice, psum of exact
        # partials, host mirror — half the FLOPs of the square form

        ti = min(cfg.k2_tile_rows, round_up(max(n, 32), 32))
        w_pad = round_up(w, r * wk)
        n_pad = round_up(n, ti)
        xp = np.zeros((n_pad, w_pad), dtype=np.uint32)
        xp[:n, :w] = packed
        nb = n_pad // ti
        ibs, jbs = triangular_tile_ids(nb)
        fn = _jit_kshard_tiles(
            mesh, axis, ti, wk,
            bool(pallas_interpret_default()),
            tuned_variant("k2", cfg.k2_variant),
        )
        x_sharded = jax.device_put(xp, NamedSharding(mesh, P(None, axis)))
        rep = NamedSharding(mesh, P(None))
        tiles = np.asarray(fn(
            x_sharded,
            jax.device_put(jnp.asarray(ibs), rep),
            jax.device_put(jnp.asarray(jbs), rep),
        ))
        return assemble_triangular(tiles, ibs, jbs, nb, n)
    if shard_axis != "rows":
        raise ValueError(f"shard_axis must be 'rows' or 'bits', got {shard_axis!r}")

    n_pad = round_up(max(n, r), r * 8)
    xp = np.zeros((n_pad, w), dtype=np.uint32)
    xp[:n] = packed
    n_loc = n_pad // r
    x_sharded = jax.device_put(xp, NamedSharding(mesh, P(axis, None)))
    if caller_block_fn:
        fn = jax.jit(ring_count_rows(mesh, axis, n_loc, block_fn))
    else:
        fn = _jit_ring1d(mesh, axis, n_loc, cfg)
    c = fn(x_sharded)
    return fetch_global(c)[:n, :n]
