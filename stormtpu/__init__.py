"""stormtpu — TPU-native all-pairs bitmap intersection-count engine.

A brand-new JAX/XLA/Pallas engine with the capability surface of the
reference C library ``mklarqvist/StormBitmaps``: given N binary vectors
(bitmaps) over M bits, compute the exact N×N pairwise intersection-count
matrix ``C[i, j] = popcount(x_i AND x_j)`` — i.e. XXᵀ over a bit-packed
matrix — with density-adaptive kernel dispatch and multi-host scaling.

Provenance note on citations: the read-only reference mount
``/root/reference`` is an **empty directory** (verified; see SURVEY.md §0),
so ``file:line`` citations into it are impossible. Citations throughout this
package therefore point at the structural survey (``SURVEY.md §3``
component IDs C1–C16 / kernel IDs K1–K3 / driver IDs D1–D2) and at the
binding behavioral spec ``BASELINE.json``.

Layer map (TPU-native redesign, not a port):

- ``layout``    — bit-packed containers (reference container layer C7–C10)
- ``oracle``    — exact NumPy ground truth (reference scalar kernels C2)
- ``kernels``   — Pallas/XLA compute kernels K1 (VPU AND+popcount),
                  K2 (MXU int8 XXᵀ), K3 (sparse positions)
                  (reference SIMD kernel layer C3–C5, C12–C13)
- ``dispatch``  — density/shape-adaptive kernel selection D1 (reference
                  runtime CPUID dispatch C6)
- ``allpairs``  — blocked triangular all-pairs driver D2 (reference
                  cache-blocked driver C11)
- ``parallel``  — mesh / shard_map / collectives distributed driver
                  (new surface; the reference is single-threaded)
"""

# Cold-start mitigation: point JAX's persistent compilation cache at a
# stormtpu dir BEFORE any compile can happen (measured 79 s → 2.3 s for a
# fresh process's first kernel on the axon relay; VERDICT r2 #4).
# STORMTPU_COMPILATION_CACHE=0 opts out.
from stormtpu.utils.backend import enable_compilation_cache as _enable_cc

_enable_cc()

from stormtpu.config import EngineConfig, default_config
from stormtpu.layout import BitMatrix, BitMatrixBuilder, pack_bits, unpack_bits
from stormtpu.oracle import (
    oracle_count_matrix,
    oracle_pair_count,
)
from stormtpu.api import (
    intersect_count_matrix,
    pair_count,
)
from stormtpu.setops import (
    column_counts,
    pairs_above_complete,
    pairwise_cardinality,
    similarity_matrix,
    similarity_matrix_complete,
)
from stormtpu.stats import count_histogram, count_row_sums
from stormtpu.query import pair_counts, pairs_above, topk_neighbors
from stormtpu.cross import cross_pairs_above, cross_topk_neighbors
from stormtpu.clump import ClumpResult, clump, clump_from_pairs

__version__ = "0.1.0"

__all__ = [
    "BitMatrix",
    "BitMatrixBuilder",
    "EngineConfig",
    "default_config",
    "pack_bits",
    "unpack_bits",
    "oracle_count_matrix",
    "oracle_pair_count",
    "intersect_count_matrix",
    "pair_count",
    "column_counts",
    "pairwise_cardinality",
    "similarity_matrix",
    "similarity_matrix_complete",
    "pairs_above_complete",
    "count_row_sums",
    "count_histogram",
    "pair_counts",
    "pairs_above",
    "topk_neighbors",
    "cross_pairs_above",
    "cross_topk_neighbors",
    "ClumpResult",
    "clump",
    "clump_from_pairs",
    "__version__",
]
