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
bm = BitMatrix.from_dense(dense)

mesh = make_row_mesh()  # all visible devices
print(f"mesh: {mesh.shape} over {len(jax.devices())} device(s)")

counts = distributed_count_matrix(bm.packed, mesh=mesh)
assert np.array_equal(counts, oracle_count_matrix(bm.packed))
print(f"distributed counts exact ✓ ({counts.shape}, sum={counts.sum()})")
