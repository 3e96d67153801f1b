"""Distributed all-pairs over a row-sharded device mesh.

On a multi-chip slice this runs data-parallel with ring streaming over
ICI; on a single-host checkout you can simulate devices with
XLA_FLAGS=--xla_force_host_platform_device_count=8 (and jax_platforms=cpu).

Run: python examples/distributed.py
"""

import jax
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from stormtpu import BitMatrix
from stormtpu.oracle import oracle_count_matrix
from stormtpu.parallel import distributed_count_matrix, make_row_mesh

rng = np.random.default_rng(7)
n, m = 128, 8192
dense = (rng.random((n, m)) < 0.2).astype(np.uint8)
dense[100] = dense[3]  # a perfectly-correlated pair for the LD screen demo
bm = BitMatrix.from_dense(dense)

mesh = make_row_mesh()  # all visible devices
print(f"mesh: {mesh.shape} over {len(jax.devices())} device(s)")

counts = distributed_count_matrix(bm.packed, mesh=mesh)
assert np.array_equal(counts, oracle_count_matrix(bm.packed))
print(f"distributed counts exact ✓ ({counts.shape}, sum={counts.sum()})")

# At N where C = O(N²) can't materialize, run the reduced queries instead —
# same mesh, O(N·k) / one-bit-per-pair outputs:
from stormtpu.parallel import (
    distributed_column_counts,
    distributed_pairs_above,
    distributed_topk_neighbors,
)

vals, idx = distributed_topk_neighbors(bm, 5, mesh=mesh)
print(f"top-5 neighbors ✓ (best pair count {int(vals.max())})")

ii, jj, r2 = distributed_pairs_above(bm, 0.9, measure="r2", mesh=mesh)
assert (3, 100) in set(zip(ii.tolist(), jj.tolist()))
print(f"r² ≥ 0.9 screen ✓ ({ii.size} pair(s), found the planted duplicate)")

# the mesh screen's pair list feeds the same clumping pass as the
# single-chip one (host logic — no mesh surface needed)
from stormtpu import clump_from_pairs

res = clump_from_pairs(ii, jj, stat=np.arange(bm.n)[::-1], n=bm.n)
assert res.leader[100] == 3  # the planted duplicate joins row 3's clump
print(f"clumped mesh screen ✓ ({res.n_clumps} clumps)")

ac = distributed_column_counts(bm, mesh=mesh)
assert np.array_equal(ac, dense.sum(axis=0).astype(np.int32))
print(f"column counts exact ✓ (max {int(ac.max())})")

from stormtpu.parallel import distributed_similarity_matrix

J = distributed_similarity_matrix(bm, "jaccard", mesh=mesh)
assert J[3, 100] == 1.0  # the planted duplicate pair
print("similarity matrix exact ✓ (duplicate pair has jaccard 1.0)")
