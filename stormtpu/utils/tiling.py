"""Triangular tile scheduling and result assembly.

Analog of the reference's cache-blocked triangular all-pairs driver
(SURVEY.md §3 C11, §4.3 ``*_pairw_intersect_cardinality_blocked``): the
reference walks row-block pairs (ib, jb≥ib) so operands stay in L2; here
the same (ib, jb≥ib) enumeration drives a Pallas grid via scalar prefetch
(VMEM-resident row tiles), and the symmetric lower triangle is mirrored at
assembly instead of recomputed — halving both FLOPs and HBM traffic.
"""

from __future__ import annotations

import numpy as np

__all__ = ["round_up", "triangular_tile_ids", "assemble_triangular"]


def round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def triangular_tile_ids(nb: int) -> tuple[np.ndarray, np.ndarray]:
    """Row-block pair ids (ibs, jbs) int32 [T] for the upper triangle
    including the diagonal, T = nb·(nb+1)/2, ordered i-major."""
    ib, jb = np.triu_indices(nb)
    return ib.astype(np.int32), jb.astype(np.int32)


def assemble_triangular(
    tiles: np.ndarray, ibs: np.ndarray, jbs: np.ndarray, nb: int, n: int
) -> np.ndarray:
    """Scatter T upper-triangular [TI, TJ] count tiles into the full
    symmetric N×N matrix (C[i,j] = C[j,i]; mirror instead of recompute)."""
    t, ti, tj = tiles.shape
    grid = np.zeros((nb, nb, ti, tj), dtype=tiles.dtype)
    grid[ibs, jbs] = tiles
    full = grid.transpose(0, 2, 1, 3).reshape(nb * ti, nb * tj)
    upper = np.triu(full)
    out = upper + np.triu(full, 1).T
    return out[:n, :n]
