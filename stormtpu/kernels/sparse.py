"""K3 — scattered-position (sparse) path.

Replaces the reference's sorted-uint16 SIMD list-intersection kernels
(SURVEY.md §3 C12 ``STORM_intersect_vector16_cardinality`` — the
``pcmpestrm``-style all-vs-all compare — and C13's list×bitmap bit-test
loop). TPU redesign: scattered per-element compares fight the hardware, so
the pair primitive is a **vectorized sorted-membership test** — for each
position in row i's sorted list, binary-search row j's sorted list
(``searchsorted``) — batched over row-pair blocks with ``vmap`` and swept
with ``lax.map``. Cost per pair is O(L·log L) with L = max row nnz, vs
O(M/32) words for the dense paths.

Honest crossover (SURVEY.md §7 "Sparse on TPU"): the MXU dense path is so
fast that sparse only wins at extreme sparsity (default dispatch threshold
0.1%); at the 1% acceptance config the adaptive dispatch may legitimately
route to dense — both paths are exact, which is what D1's semantics-free
contract requires.

Layout: position lists are padded to a common length L (multiple of 128)
with sentinel ``m_bits`` (no valid position equals it); rows stay sorted so
padding sits at the tail.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stormtpu.config import EngineConfig
from stormtpu.layout import BitMatrix
from stormtpu.utils import round_up

__all__ = [
    "padded_position_lists",
    "count_block_sparse",
    "count_matrix_sparse",
]


def padded_position_lists(bm: BitMatrix, pad_mult: int = 128) -> np.ndarray:
    """int32 [N, L] sorted positions per row, tail-padded with m_bits."""
    indptr, indices = bm.positions_csr()
    lmax = int((indptr[1:] - indptr[:-1]).max(initial=0))
    l_pad = round_up(max(lmax, 1), pad_mult)
    out = np.full((bm.n, l_pad), bm.m_bits, dtype=np.int32)
    for i in range(bm.n):
        row = indices[indptr[i] : indptr[i + 1]]
        out[i, : row.size] = row
    return out


def _pair_intersect_sorted(pa: jax.Array, pb: jax.Array, sentinel: int) -> jax.Array:
    """|pa ∩ pb| for sorted padded int32 lists (sentinel-tailed).

    ``method="sort"`` is deliberate: the default binary-search ("scan")
    lowering faults the TPU runtime at vmapped batch × list sizes the
    sparse config actually uses (verified on v5e: worker crash at
    [256, 8064] all-pairs), while the sort-based lowering is a plain
    vectorized sort+gather that runs everywhere and is exactness-tested.
    """
    idx = jnp.searchsorted(pb, pa, method="sort")
    idx = jnp.clip(idx, 0, pb.shape[0] - 1)
    hit = (pb[idx] == pa) & (pa != sentinel)
    return jnp.sum(hit.astype(jnp.int32), dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("sentinel", "block_rows"))
def count_block_sparse(
    pos_a: jax.Array,
    pos_b: jax.Array,
    *,
    sentinel: int,
    block_rows: int = 8,
) -> jax.Array:
    """Cross counts int32 [Na, Nb] from padded sorted position lists.

    Blocks rows of A through ``lax.map`` to bound the [block, Nb, L]
    membership intermediate.
    """
    na, l = pos_a.shape
    na_pad = round_up(na, block_rows)
    pa = jnp.full((na_pad, l), sentinel, dtype=pos_a.dtype).at[:na].set(pos_a)
    blocks = pa.reshape(na_pad // block_rows, block_rows, l)

    pair = functools.partial(_pair_intersect_sorted, sentinel=sentinel)
    one_vs_all = jax.vmap(pair, in_axes=(None, 0))      # row a × all b
    block_vs_all = jax.vmap(one_vs_all, in_axes=(0, None))  # block × all b

    out = jax.lax.map(lambda blk: block_vs_all(blk, pos_b), blocks)
    return out.reshape(na_pad, -1)[:na]


def count_matrix_sparse(
    bm: BitMatrix,
    *,
    config: Optional[EngineConfig] = None,
) -> np.ndarray:
    """Full N×N exact counts via the positions path (config BASELINE.json:9)."""
    del config  # block size is shape-derived; kept for dispatch symmetry
    pos = jnp.asarray(padded_position_lists(bm))
    out = count_block_sparse(pos, pos, sentinel=bm.m_bits)
    return np.asarray(out)
