"""K1 — Pallas dense tile kernel: word-wise AND + population_count.

TPU-native replacement of the reference's AVX2/AVX-512 AND+popcount inner
loops (SURVEY.md §3 C4–C5 ``STORM_intersect_count_avx2/_avx512`` with
Harley–Seal CSA accumulation) fused with its cache-blocked all-pairs driver
(C11, §4.3). Design differences from the reference, driven by the hardware:

- No CSA/popcount-amortization tricks: ``lax.population_count`` is a native
  VPU op on TPU (verified on this backend), so the kernel is a plain
  AND → popcount → int32 accumulate over uint32 lanes.
- The (i-block, j-block) L2 tiling becomes a Pallas grid with VMEM-resident
  row tiles; the triangular (ib ≤ jb) walk is expressed with scalar-prefetch
  block indices so only T = nb(nb+1)/2 tile pairs are streamed from HBM.
- The K (word) axis is a third grid dimension accumulating into the output
  tile in VMEM, so arbitrarily large M streams without VMEM pressure.

Exactness: popcount ≤ 32 per word; int32 tile accumulators are exact for
M < 2³¹ (EngineConfig.validate).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stormtpu.config import EngineConfig, default_config
from stormtpu.utils import (
    assemble_triangular,
    pallas_interpret_default,
    round_up,
    triangular_tile_ids,
)

__all__ = [
    "count_tiles_pallas_dense",
    "count_matrix_pallas_dense",
    "pair_count_stream_pallas",
]


def _k1_kernel(ibs_ref, jbs_ref, a_ref, b_ref, o_ref):
    """One (tile-pair t, K-step k) grid cell — "rows" variant.

    a_ref: uint32 [TI, WK] — row block ibs[t], word slice k
    b_ref: uint32 [TJ, WK] — row block jbs[t], word slice k
    o_ref: int32  [TI, TJ] — count tile, revisited across k (accumulate)
    """
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _zero():
        o_ref[:] = jnp.zeros_like(o_ref)

    b = b_ref[:]
    ti = a_ref.shape[0]

    def row_step(ii, _):
        # One A-row against the whole B tile: (TJ, WK) VPU pass.
        # (o_ref block is (1, TI, TJ): leading axis is the tile-pair id.)
        row = a_ref[ii, :]
        c = jax.lax.population_count(row[None, :] & b)
        o_ref[0, ii, :] += jnp.sum(c.astype(jnp.int32), axis=1)
        return 0

    # NOTE: Mosaic's fori lowering only supports unroll=1 or full unroll.
    jax.lax.fori_loop(0, ti, row_step, 0)


def _k1_kernel_chunk(ibs_ref, jbs_ref, a_ref, b_ref, o_ref):
    """"chunk" variant: statically-unrolled 8-row chunks of A against the
    whole B tile — one (8, TJ, WK) VPU pass per chunk instead of TI
    scalar-indexed row passes."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _zero():
        o_ref[:] = jnp.zeros_like(o_ref)

    b = b_ref[:]
    ti = a_ref.shape[0]
    ch = 8
    for ii0 in range(0, ti, ch):
        chunk = a_ref[ii0 : ii0 + ch, :]
        c = jax.lax.population_count(chunk[:, None, :] & b[None, :, :])
        o_ref[0, ii0 : ii0 + ch, :] += jnp.sum(c.astype(jnp.int32), axis=2)


_K1_VARIANTS = {"rows": _k1_kernel, "chunk": _k1_kernel_chunk}


@functools.partial(
    jax.jit,
    static_argnames=("tile_rows", "tile_words", "interpret", "variant"),
)
def count_tiles_pallas_dense(
    packed: jax.Array,
    ibs: jax.Array,
    jbs: jax.Array,
    *,
    tile_rows: int,
    tile_words: int,
    interpret: bool,
    variant: str = "rows",
) -> jax.Array:
    """Compute T count tiles int32 [T, TI, TI] for row-block pairs
    (ibs[t], jbs[t]) of a padded packed matrix uint32 [N_pad, W_pad]."""
    n_pad, w_pad = packed.shape
    assert n_pad % tile_rows == 0 and w_pad % tile_words == 0
    t = ibs.shape[0]
    nk = w_pad // tile_words

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
    flops_per_cell = 3 * tile_rows * tile_rows * tile_words
    return pl.pallas_call(
        _K1_VARIANTS[variant],
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, tile_rows, tile_rows), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_cell * t * nk,
            bytes_accessed=(2 * tile_rows * tile_words * 4 + tile_rows**2 * 4)
            * t
            * nk,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ibs, jbs, packed, packed)


def _stream_kernel(salt_ref, a_ref, b_ref, o_ref):
    """K0 — streaming batch-pair kernel cell: row block r, word slice k.

    a_ref/b_ref: uint32 [BR, WK]; o_ref: int32 [BR, 128] lane-partial
    counts, revisited across k (final lane reduce happens outside).
    The whole kernel is one (XOR salt →) AND → popcount → per-row
    partial-sum pass; large WK blocks keep the HBM→VMEM DMAs in the MB
    range so the stream runs at memory bandwidth (the reference's C2/C3
    streaming regime). ``salt`` is XORed into A in-VMEM (free on the VPU):
    benchmarks vary it per chained invocation so repeated executions are
    genuinely distinct without adding HBM traffic; production callers
    pass 0, and popcount((a^0) & b) is exactly popcount(a & b).
    """
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _zero():
        o_ref[:] = jnp.zeros_like(o_ref)

    a = a_ref[:] ^ salt_ref[0]
    c = jax.lax.population_count(a & b_ref[:]).astype(jnp.int32)
    br, wk = c.shape
    o_ref[:] += jnp.sum(c.reshape(br, wk // 128, 128), axis=1)


@functools.partial(
    jax.jit, static_argnames=("block_rows", "block_words", "interpret")
)
def pair_count_stream_pallas(
    a_packed: jax.Array,
    b_packed: jax.Array,
    *,
    salt: jax.Array | int = 0,
    block_rows: int = 512,
    block_words: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Row-wise counts int32 [R]: popcount(A[r] AND B[r]) per row — the
    Pallas streaming form of ``pair_count_batch_xla`` (reference C2/C3
    batched-pair regime, SURVEY.md §3). One full 2·(M/8)-byte stream per
    pair with VMEM-pipelined megabyte DMAs.

    Measured on v5e (sustained, salt-perturbed 240-step chains, r2):
    ~209 GB/s at the shipped blocks vs **744 GB/s** for the fused XLA
    form (≈101% of the measured dual-stream ceiling). An explicit
    manual-DMA double-buffered variant (make_async_copy, 2–4 buffers,
    0.5–2 MB chunks per stream) plateaus identically at 207–254 GB/s —
    per-stream DMA throughput, not issue overhead, walls Pallas 2-input
    pipelines on this stack. Dispatch therefore keeps the XLA stream;
    this kernel is retained as the explicit-pipelining form (and for
    backends where XLA fusion of the AND+popcount+reduce chain
    regresses).

    ``salt`` (uint32, default 0 = no-op) is XORed into A inside the
    kernel; see ``_stream_kernel`` for why benchmarks use it."""
    r, w = a_packed.shape
    br = min(block_rows, round_up(max(r, 8), 8))
    wk = round_up(max(w, 128), 128) if w <= block_words else block_words
    r_pad, w_pad = round_up(r, br), round_up(w, wk)
    if (r_pad, w_pad) != (r, w):
        a_packed = jnp.zeros((r_pad, w_pad), jnp.uint32).at[:r, :w].set(a_packed)
        b_packed = jnp.zeros((r_pad, w_pad), jnp.uint32).at[:r, :w].set(b_packed)
    salt_arr = jnp.asarray(salt, dtype=jnp.uint32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r_pad // br, w_pad // wk),
        in_specs=[
            pl.BlockSpec(
                (br, wk), lambda rr, k, salt_ref: (rr, k),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (br, wk), lambda rr, k, salt_ref: (rr, k),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (br, 128), lambda rr, k, salt_ref: (rr, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        _stream_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r_pad, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * r_pad * w_pad,
            bytes_accessed=2 * r_pad * w_pad * 4 + r_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(salt_arr, a_packed, b_packed)
    return jnp.sum(out, axis=1)[:r]


def count_matrix_pallas_dense(
    packed: jax.Array,
    *,
    config: Optional[EngineConfig] = None,
    interpret: Optional[bool] = None,
    variant: Optional[str] = None,
) -> np.ndarray:
    """Full N×N exact counts via the K1 kernel (triangular tile walk +
    symmetric mirror at assembly)."""
    cfg = config or default_config()
    if interpret is None:
        interpret = pallas_interpret_default()
    if variant is None:
        variant = cfg.k1_variant
    packed = jnp.asarray(packed)
    n, w = packed.shape
    ti = min(cfg.k1_tile_rows, round_up(max(n, 8), 8))
    # Mosaic constraint: block last dim divisible by 128, or full-array.
    if w <= cfg.k1_tile_words:
        wk = round_up(max(w, 128), 128)
    else:
        wk = round_up(cfg.k1_tile_words, 128)
    n_pad = round_up(n, ti)
    w_pad = round_up(w, wk)
    xp = jnp.zeros((n_pad, w_pad), dtype=jnp.uint32)
    xp = xp.at[:n, :w].set(packed)
    nb = n_pad // ti
    ibs, jbs = triangular_tile_ids(nb)
    tiles = count_tiles_pallas_dense(
        xp,
        jnp.asarray(ibs),
        jnp.asarray(jbs),
        tile_rows=ti,
        tile_words=wk,
        interpret=bool(interpret),
        variant=variant,
    )
    return assemble_triangular(np.asarray(tiles), ibs, jbs, nb, n)
