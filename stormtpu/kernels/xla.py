"""Pure-XLA compute paths (single device).

These are the capability-complete reference implementations of the two
dense strategies (BASELINE.json:5):

1. word-wise ``AND`` + ``lax.population_count`` (VPU; the analog of the
   reference's AND+popcount SIMD loops, SURVEY.md §3 C2–C5), and
2. bit-unpack to int8 + integer matmul riding the MXU
   (``preferred_element_type=int32`` keeps 0/1-product accumulation exact).

XLA fuses the AND+popcount+reduce chain into a single streaming pass, so
the pair kernel is already HBM-bound; the Pallas kernels in ``dense.py`` /
``mxu.py`` replace the *all-pairs* hot loops where tiling for operand reuse
is what matters (SURVEY.md §4.3).

Exactness: counts are integers ≤ M < 2³¹ (guarded by EngineConfig.validate),
so int32 accumulation is exact everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stormtpu.config import WORD_BITS

__all__ = [
    "pair_count_xla",
    "pair_count_batch_xla",
    "count_block_popcount_xla",
    "count_matrix_popcount_xla",
    "unpack_to_int8",
    "count_block_int8_xla",
    "count_matrix_int8_xla",
]


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


@jax.jit
def pair_count_xla(a_packed: jax.Array, b_packed: jax.Array) -> jax.Array:
    """popcount(a AND b) over two packed uint32 vectors → int32 scalar.

    Config "single pair, dense AND+popcount" (BASELINE.json:7). One fused
    streaming pass; HBM-roofline-bound by construction.
    """
    c = jax.lax.population_count(a_packed & b_packed)
    return jnp.sum(c.astype(jnp.int32), dtype=jnp.int32)


@jax.jit
def pair_count_batch_xla(a_packed: jax.Array, b_packed: jax.Array) -> jax.Array:
    """Row-wise counts int32 [R]: popcount(A[r] AND B[r]) per row.

    The batched form of the single-pair config — on TPU a single 2×125 KB
    pair is dispatch-latency-bound, so throughput-oriented callers (and the
    bench harness) stream many pairs per launch.
    """
    c = jax.lax.population_count(a_packed & b_packed)
    return jnp.sum(c.astype(jnp.int32), axis=1, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile_rows",))
def count_block_popcount_xla(
    a_packed: jax.Array, b_packed: jax.Array, tile_rows: int = 8
) -> jax.Array:
    """Cross-block counts int32 [Na, Nb] via word-wise AND+popcount.

    Sequential ``lax.map`` over row tiles of A bounds the broadcast
    intermediate to [tile_rows, Nb, W].
    """
    na, w = a_packed.shape
    na_pad = _round_up(na, tile_rows)
    a = jnp.zeros((na_pad, w), dtype=jnp.uint32).at[:na].set(a_packed)
    tiles = a.reshape(na_pad // tile_rows, tile_rows, w)

    def per_tile(tile):  # [T, W] × [Nb, W] → [T, Nb]
        anded = tile[:, None, :] & b_packed[None, :, :]
        return jnp.sum(
            jax.lax.population_count(anded).astype(jnp.int32),
            axis=2,
            dtype=jnp.int32,
        )

    out = jax.lax.map(per_tile, tiles).reshape(na_pad, -1)
    return out[:na]


def count_matrix_popcount_xla(
    packed: jax.Array, tile_rows: int = 8
) -> jax.Array:
    """Full N×N counts via the word-popcount path (config BASELINE.json:8)."""
    return count_block_popcount_xla(packed, packed, tile_rows=tile_rows)


def unpack_to_int8(packed: jax.Array) -> jax.Array:
    """uint32 [N, W] → int8 {0,1} [N, 32·W], bit-major K order.

    K column ``b·W + w`` holds bit ``b`` of word ``w``. Any consistent K
    permutation leaves XXᵀ unchanged, and bit-major unpack is 32 wide 2-D
    VPU ops (shift+mask) instead of a lane-hostile [N, W, 32] reshape.
    """
    return jnp.concatenate(
        [((packed >> jnp.uint32(b)) & jnp.uint32(1)).astype(jnp.int8)
         for b in range(WORD_BITS)],
        axis=1,
    )


@jax.jit
def count_block_int8_xla(a_packed: jax.Array, b_packed: jax.Array) -> jax.Array:
    """Cross-block counts int32 [Na, Nb] via MXU int8 matmul."""
    ua = unpack_to_int8(a_packed)
    ub = unpack_to_int8(b_packed)
    return jax.lax.dot_general(
        ua,
        ub,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def count_matrix_int8_xla(packed: jax.Array) -> jax.Array:
    """Full N×N counts via the MXU int8 path (materializes the unpacked
    operand — use the Pallas K2 kernel for large M)."""
    return count_block_int8_xla(packed, packed)
