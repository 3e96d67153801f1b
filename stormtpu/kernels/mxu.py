"""K2 — Pallas MXU kernel: in-tile bit-unpack + int8 XXᵀ matmul.

The flagship all-pairs path (BASELINE.json:5/:10 — "unpacks bits to int8
and rides the MXU as an integer matmul"; the 100k×1M-bit single-chip
config). There is no reference analog: the reference's peak is AVX-512
popcount (SURVEY.md §3 C5); on TPU the MXU turns each 32-bit word pair
into 32 int8 MACs executed on the systolic array, which beats any VPU
popcount formulation for all-pairs shapes.

The hard part (SURVEY.md §7 "MXU-path memory blowup"): unpacking M bits to
int8 is an 8× expansion — 12.5 GB packed → 100 GB unpacked at 100k×1M — so
the unpack happens **per-tile inside the kernel** (VMEM-resident, fused
with the matmul) and the unpacked matrix never exists in HBM.

K-ordering: the unpack is bit-major (K column b·WK + w holds bit b of word
w). Both operands use the same permutation, and XXᵀ is invariant under any
consistent K permutation, so counts are exact (tested).

Exactness: products are 0/1; ``preferred_element_type=int32`` accumulation
is exact for M < 2³¹ (EngineConfig.validate).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stormtpu.config import WORD_BITS, EngineConfig, default_config
from stormtpu.utils import (
    assemble_triangular,
    pallas_interpret_default,
    round_up,
    triangular_tile_ids,
)

__all__ = [
    "count_tiles_pallas_mxu",
    "count_matrix_pallas_mxu",
    "count_block_pallas_mxu",
]


def _unpack_bits_int8(tile: jax.Array) -> jax.Array:
    """uint32 [R, WK] → int8 {0,1} [R, 32·WK], bit-major K order."""
    return jnp.concatenate(
        [
            ((tile >> jnp.uint32(b)) & jnp.uint32(1)).astype(jnp.int8)
            for b in range(WORD_BITS)
        ],
        axis=1,
    )


def _k2_kernel(ibs_ref, jbs_ref, a_ref, b_ref, o_ref):
    """One (tile-pair t, K-step k) grid cell — "concat" variant.

    a_ref: uint32 [TI, WK] packed; unpacked in-VMEM to int8 [TI, 32·WK]
    b_ref: uint32 [TJ, WK] likewise
    o_ref: int32  [TI, TJ], revisited across k (accumulate)
    """
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _zero():
        o_ref[:] = jnp.zeros_like(o_ref)

    ua = _unpack_bits_int8(a_ref[:])
    ub = _unpack_bits_int8(b_ref[:])
    # o_ref block is (1, TI, TJ): leading axis is the tile-pair id.
    o_ref[0] += jax.lax.dot_general(
        ua,
        ub,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _k2_kernel_planes(ibs_ref, jbs_ref, a_ref, b_ref, o_ref):
    """"planes" variant: one MXU dot per bit plane (32 dots of K=WK),
    avoiding the lane-concatenate of the unpacked operand — trades one big
    matmul for 32 small ones with zero reshuffle traffic."""
    k = pl.program_id(1)

    @pl.when(k == 0)
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


_K2_VARIANTS = {"concat": _k2_kernel, "planes": _k2_kernel_planes}


def _k2_rect_concat(a_ref, b_ref, o_ref):
    """Rectangular grid cell (ib, jb, k): concat-unpack variant.
    Unlike the triangular kernels there is no scalar prefetch and no
    stacked operand — A and B are separate pallas_call inputs, a plain
    3-D (A-block, B-block, K-step) grid."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _zero():
        o_ref[:] = jnp.zeros_like(o_ref)

    ua = _unpack_bits_int8(a_ref[:])
    ub = _unpack_bits_int8(b_ref[:])
    o_ref[:] += jax.lax.dot_general(
        ua,
        ub,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _k2_rect_planes(a_ref, b_ref, o_ref):
    """Rectangular grid cell (ib, jb, k): one MXU dot per bit plane."""
    k = pl.program_id(2)

    @pl.when(k == 0)
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
    o_ref[:] += acc


_K2_RECT_VARIANTS = {"concat": _k2_rect_concat, "planes": _k2_rect_planes}


@functools.partial(
    jax.jit,
    static_argnames=("tile_rows", "tile_words", "interpret", "variant"),
)
def count_tiles_pallas_mxu(
    packed: jax.Array,
    ibs: jax.Array,
    jbs: jax.Array,
    *,
    tile_rows: int,
    tile_words: int,
    interpret: bool,
    variant: str = "concat",
) -> jax.Array:
    """T count tiles int32 [T, TI, TI] for row-block pairs (ibs[t], jbs[t])
    of a padded packed matrix uint32 [N_pad, W_pad], via MXU int8 matmul."""
    n_pad, w_pad = packed.shape
    assert n_pad % tile_rows == 0 and w_pad % tile_words == 0
    t = ibs.shape[0]
    nk = w_pad // tile_words
    kdim = tile_words * WORD_BITS

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t, nk),
        in_specs=[
            pl.BlockSpec(
                (tile_rows, tile_words),
                lambda ti, k, ibs_ref, jbs_ref: (ibs_ref[ti], k),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_rows, tile_words),
                lambda ti, k, ibs_ref, jbs_ref: (jbs_ref[ti], k),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_rows, tile_rows),
            lambda ti, k, ibs_ref, jbs_ref: (ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        _K2_VARIANTS[variant],
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, tile_rows, tile_rows), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * tile_rows * tile_rows * kdim * t * nk,
            bytes_accessed=(2 * tile_rows * tile_words * 4 + tile_rows**2 * 4)
            * t
            * nk,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ibs, jbs, packed, packed)


@functools.partial(
    jax.jit,
    static_argnames=("tile_rows", "tile_words", "interpret", "variant"),
)
def _count_block_padded(
    a_pad: jax.Array,
    b_pad: jax.Array,
    *,
    tile_rows: int,
    tile_words: int,
    interpret: bool,
    variant: str,
) -> jax.Array:
    """Rectangular counts int32 [Na_pad, Nb_pad] via a plain 3-D-grid K2
    kernel over (A-block, B-block, K-step) with A and B as separate
    operands. Fully traced — usable inside lax.map / shard_map as the
    distributed ring's block_fn for large W. (Simpler than the previous
    stack-A-above-B + scalar-prefetch formulation: no concatenated
    operand copy, and the first two grid axes are honest "parallel"
    dimensions.)"""
    na, w_pad = a_pad.shape
    nb_rows, _ = b_pad.shape
    assert na % tile_rows == 0 and nb_rows % tile_rows == 0
    assert w_pad % tile_words == 0
    nba = na // tile_rows
    nbb = nb_rows // tile_rows
    nk = w_pad // tile_words
    kdim = tile_words * WORD_BITS
    return pl.pallas_call(
        _K2_RECT_VARIANTS[variant],
        grid=(nba, nbb, nk),
        in_specs=[
            pl.BlockSpec(
                (tile_rows, tile_words),
                lambda i, j, k: (i, k),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_rows, tile_words),
                lambda i, j, k: (j, k),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_rows, tile_rows),
            lambda i, j, k: (i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((na, nb_rows), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * tile_rows * tile_rows * kdim * nba * nbb * nk,
            bytes_accessed=(2 * tile_rows * tile_words * 4 + tile_rows**2 * 4)
            * nba
            * nbb
            * nk,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_pad, b_pad)


def k2_tile_shape(cfg: EngineConfig, n: int, w: int) -> tuple[int, int]:
    """(tile_rows, tile_words) for the K2 tile walk — the single home of
    the Mosaic block-shape rule (last dim divisible by 128, or equal to
    the full padded dim; small W collapses to a single K step). Shared by
    the count drivers here and the tile-walk query paths (query.py)."""
    ti = min(cfg.k2_tile_rows, round_up(max(n, 32), 32))
    if w <= cfg.k2_tile_words:
        wk = round_up(max(w, 8), 8)
    else:
        wk = round_up(cfg.k2_tile_words, 128)
    return ti, wk


def count_block_pallas_mxu(
    a_packed: jax.Array,
    b_packed: jax.Array,
    *,
    config: Optional[EngineConfig] = None,
    interpret: Optional[bool] = None,
    variant: Optional[str] = None,
) -> jax.Array:
    """Rectangular cross counts int32 [Na, Nb] with in-kernel bit-unpack —
    the large-W form of ``count_block_int8_xla`` (which materializes the
    8× unpacked operands). Returns a device array."""
    cfg = config or default_config()
    if interpret is None:
        interpret = pallas_interpret_default()
    if variant is None:
        variant = cfg.k2_variant
    a_packed = jnp.asarray(a_packed)
    b_packed = jnp.asarray(b_packed)
    na, w = a_packed.shape
    nb_rows, wb = b_packed.shape
    if w != wb:
        raise ValueError("word-count mismatch")
    ti, wk = k2_tile_shape(cfg, max(na, nb_rows), w)
    w_pad = round_up(w, wk)
    na_pad = round_up(na, ti)
    nb_pad = round_up(nb_rows, ti)
    a_pad = jnp.zeros((na_pad, w_pad), dtype=jnp.uint32).at[:na, :w].set(a_packed)
    b_pad = jnp.zeros((nb_pad, w_pad), dtype=jnp.uint32).at[:nb_rows, :w].set(
        b_packed
    )
    out = _count_block_padded(
        a_pad,
        b_pad,
        tile_rows=ti,
        tile_words=wk,
        interpret=bool(interpret),
        variant=variant,
    )
    return out[:na, :nb_rows]


def count_matrix_pallas_mxu(
    packed: jax.Array,
    *,
    config: Optional[EngineConfig] = None,
    interpret: Optional[bool] = None,
    variant: Optional[str] = None,
) -> np.ndarray:
    """Full N×N exact counts via the K2 MXU kernel (triangular walk +
    symmetric mirror)."""
    cfg = config or default_config()
    if interpret is None:
        interpret = pallas_interpret_default()
    if variant is None:
        variant = cfg.k2_variant
    packed = jnp.asarray(packed)
    n, w = packed.shape
    ti, wk = k2_tile_shape(cfg, n, w)
    n_pad = round_up(n, ti)
    w_pad = round_up(w, wk)
    xp = jnp.zeros((n_pad, w_pad), dtype=jnp.uint32)
    xp = xp.at[:n, :w].set(packed)
    nb = n_pad // ti
    ibs, jbs = triangular_tile_ids(nb)
    tiles = count_tiles_pallas_mxu(
        xp,
        jnp.asarray(ibs),
        jnp.asarray(jbs),
        tile_rows=ti,
        tile_words=wk,
        interpret=bool(interpret),
        variant=variant,
    )
    return assemble_triangular(np.asarray(tiles), ibs, jbs, nb, n)
