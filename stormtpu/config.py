"""Engine configuration.

Analog of the reference's compile-time macro / function-arg configuration
(SURVEY.md §6 "Config / flag system": ``STORM_HAVE_*`` macros, forced-scalar
overrides, block-size arguments). On TPU there is no CPUID; the knobs that
matter are tile shapes (VMEM budget / MXU alignment), dispatch density
thresholds, and mesh layout.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

# Hardware layout constants (TPU VPU lane structure; see pallas_guide.md).
LANE = 128          # last-dim vector lane count
SUBLANE = 8         # second-to-last dim for 32-bit dtypes
WORD_BITS = 32      # packed word width; uint32 is the natural TPU word


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Frozen knobs for kernels, dispatch, and distribution.

    Defaults are tuned for TPU v5e-class chips (16 MiB VMEM/core,
    ~819 GB/s HBM, int8 MXU). All sizes in elements unless noted.
    """

    # --- K1 dense VPU kernel (AND + popcount) tiles ---
    # Defaults from the on-device sustained-timing sweep (N=8192, v5e).
    k1_tile_rows: int = 128        # rows per (i, j) output tile side
    k1_tile_words: int = 2048      # packed uint32 words per K step (64 Kbit)
    k1_variant: str = "chunk"      # statically-unrolled 8-row VPU passes

    # --- K2 MXU int8 XXᵀ kernel tiles ---
    # Mosaic requires block last-dims divisible by 128 (or full-array).
    # Defaults from the on-device sustained-timing sweep (N=8192, v5e:
    # 2.57 G-pairs/s in the verified bench run ≈ 86% of int8 MXU peak).
    k2_tile_rows: int = 256        # rows per output tile side (MXU-aligned)
    k2_tile_words: int = 256       # packed words per K step → 8192 int8 K
    k2_variant: str = "planes"     # one MXU dot per bit plane, no concat

    # --- D1 dispatch thresholds ---
    # Density below which the sparse positions path (K3) is considered.
    sparse_density_threshold: float = 0.001
    # Minimum all-pairs work (N^2 * W words) before K2/MXU beats K1/VPU.
    mxu_min_rows: int = 64         # tiny-N problems stay on the VPU path

    # --- K3 sparse path ---
    k3_pair_block: int = 512       # row-pairs processed per sparse step

    # --- clustered-sparsity word compaction (C8 block-skip analog) ---
    # Before dense all-pairs, drop word columns empty in EVERY row when
    # the occupied fraction is below this (exact: empty words contribute
    # nothing to AND counts). One O(N·W) host pass saves O(N²·W) device
    # work on clustered inputs; uniform-random sparsity never triggers it.
    compact_occupancy_threshold: float = 0.9

    # --- K5 block-clustered work-list kernel (C8 per-pair block skip) ---
    # The clustered strategy runs the K2 MXU tile kernel over a host-built
    # work list of (tile pair, co-occupied K-group) items — tile pairs
    # whose block summaries share no occupied group cost nothing
    # (SURVEY.md §1 regime 3, the Roaring-style summary-AND skip). Chosen
    # when the co-occupied work fraction (worklist / full K2 walk) is
    # below this threshold (the measured-crossover analog of the
    # reference's C7 container threshold; K5's per-item overhead vs K2 is
    # a few % — tile-axis scalar prefetch is free, CLAUDE.md K2 note).
    clustered_work_fraction_threshold: float = 0.5

    # --- distribution ---
    mesh_axis: str = "rows"        # row-shard axis name

    # --- safety ---
    # Counts are exact in int32 for M < 2^31; assert at config time.
    max_bits: int = 2**31 - 1

    def validate(self, m_bits: int) -> None:
        if m_bits > self.max_bits:
            raise ValueError(
                f"M={m_bits} bits exceeds exact-int32 accumulator range "
                f"({self.max_bits}); counts would not be exact."
            )


_DEFAULT: Optional[EngineConfig] = None


def default_config() -> EngineConfig:
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = EngineConfig()
    return _DEFAULT
