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
