"""Quickstart: build bitmaps, count pairwise intersections.

Analog of the reference's example harness (SURVEY.md §3 C15): minimal
usage — build sets, run pairwise, print counts.

Run: python examples/quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from stormtpu import BitMatrix, intersect_count_matrix, pair_count

# --- build from dense 0/1 rows (variants × samples, say) ---------------
rng = np.random.default_rng(0)
n, m = 100, 4096
dense = (rng.random((n, m)) < 0.1).astype(np.uint8)
bm = BitMatrix.from_dense(dense)
print(f"built {bm}")

# --- full N×N intersection-count matrix (auto-dispatched kernel) --------
counts = intersect_count_matrix(bm)
print(f"count matrix {counts.shape} {counts.dtype}; C[0,1] = {counts[0, 1]}")

# --- single pair ---------------------------------------------------------
print("pair |x0 ∩ x1| =", pair_count(dense[0], dense[1]))

# --- build from scattered set-bit positions (sparse ingest) -------------
lists = [rng.choice(m, size=50, replace=False) for _ in range(10)]
bm_sparse = BitMatrix.from_position_lists(lists, m_bits=m)
c2 = intersect_count_matrix(bm_sparse, strategy="sparse")
print("sparse-path counts diag:", np.diag(c2)[:5], "(= row cardinalities)")

# --- exactness: every strategy returns identical integer counts ---------
for strategy in ("popcount", "mxu"):
    assert np.array_equal(intersect_count_matrix(bm, strategy=strategy), counts)
print("all strategies bit-exact ✓")
