"""Distributed execution layer.

The reference is a single-process, single-thread C library (SURVEY.md §2:
"no scheduler, no communication layer, ... no multi-process anything"), so
everything here is new TPU-native surface, constrained by the binding
sharding prescription (BASELINE.json:5): the bitmap matrix is row-sharded
across hosts, tile pairs of row blocks are streamed through chips
data-parallel, and the count matrix is assembled via jax.lax collectives.

- ``mesh``     — device mesh construction (single- and multi-host)
- ``allpairs`` — ring-streaming row-sharded all-pairs driver
- ``query``    — distributed reduced queries (top-k, threshold screens)
- ``scaling``  — scaling-efficiency measurement harness
"""

from stormtpu.parallel.mesh import make_grid_mesh, make_row_mesh
from stormtpu.parallel.allpairs import distributed_count_matrix
from stormtpu.parallel.columns import distributed_column_counts
from stormtpu.parallel.cross import (
    distributed_cross_pairs_above,
    distributed_cross_topk_neighbors,
)
from stormtpu.parallel.multihost import (
    distributed_stream_count_matrix,
    initialize_multihost,
)
from stormtpu.parallel.query import (
    distributed_pairs_above,
    distributed_topk_neighbors,
)
from stormtpu.parallel.scaling import measure_scaling
from stormtpu.parallel.setops import (
    distributed_pairwise_cardinality,
    distributed_similarity_matrix,
)
from stormtpu.parallel.stats import (
    distributed_count_histogram,
    distributed_count_row_sums,
)

__all__ = [
    "make_grid_mesh",
    "make_row_mesh",
    "distributed_count_matrix",
    "distributed_column_counts",
    "distributed_count_histogram",
    "distributed_count_row_sums",
    "distributed_cross_pairs_above",
    "distributed_cross_topk_neighbors",
    "distributed_stream_count_matrix",
    "distributed_pairs_above",
    "distributed_pairwise_cardinality",
    "distributed_similarity_matrix",
    "distributed_topk_neighbors",
    "initialize_multihost",
    "measure_scaling",
]
