"""Compute kernels.

- ``xla``    — pure-XLA reference paths (fused AND+popcount; int8 XXᵀ).
  Capability-complete single-device implementations; the Pallas kernels
  below are the tuned replacements for the hot loops.
- ``dense``  — K1: Pallas VPU tile kernel, AND + ``population_count``
  (replaces the reference's AVX2/AVX-512 Harley–Seal CSA kernels C4/C5;
  CSA is unnecessary on TPU — popcount is a native vector op).
- ``mxu``    — K2: Pallas MXU int8 XXᵀ with in-kernel bit-unpack
  (the 100k×1M-bit single-chip path, BASELINE.json:10).
- ``sparse`` — K3: scattered-position path (replaces the reference's
  SIMD uint16 list-intersection C12/C13).
"""

from __future__ import annotations

import jax

# Above this many bits, materializing the 8× unpacked int8 operand (the
# XLA path) is memory-hostile; use the in-kernel-unpack Pallas rectangle.
# This is THE routing constant — api.count_block, the distributed drivers,
# stream kernel choice, and D1 dispatch all share it.
MXU_XLA_MAX_BITS = 1 << 17

__all__ = ["MXU_XLA_MAX_BITS", "count_block_auto"]


def count_block_auto(
    a_packed: jax.Array,
    b_packed: jax.Array,
    config=None,
) -> jax.Array:
    """Rectangular cross counts int32 [Na, Nb]; picks the XLA int8 path at
    small M and the in-kernel-unpack Pallas MXU rectangle at large M.
    Traceable (shapes are static under jit), so usable inside lax.map /
    shard_map bodies. The single shared implementation of the
    XLA-vs-Pallas rectangle routing."""
    from stormtpu.kernels import xla as kx

    if a_packed.shape[1] * 32 <= MXU_XLA_MAX_BITS:
        return kx.count_block_int8_xla(a_packed, b_packed)
    from stormtpu.kernels.mxu import count_block_pallas_mxu

    return count_block_pallas_mxu(a_packed, b_packed, config=config)
