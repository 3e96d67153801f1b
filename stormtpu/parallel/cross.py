"""Distributed cross-set queries: a query panel against a PANEL-SHARDED
reference (new TPU surface; the single-chip forms are ``stormtpu.cross``).

Layout: the reference panel B is row-sharded across the mesh (the
BASELINE.json:5 row-shard prescription applied to the big operand), the
query set A is replicated (it is the small side — a query panel), and
each device scores A against its own B shard:

- top-k: every device top-k's its shard (k candidates per device), the
  host merges R candidate sets — exact because a global top-k is a
  merge of per-shard top-k's.
- screen: every device emits its shard's packed hit bitmap; hit VALUES
  are recomputed exactly on host from the packed rows (O(hits · W) —
  the hit set is the sparse output, so this beats shipping any count
  block), which also gives the exact float64 similarity refine for free.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.7 stable location
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from stormtpu.parallel.mesh import bit_axis_of, fetch_global, make_row_mesh
from stormtpu.utils import round_up

__all__ = [
    "distributed_cross_topk_neighbors",
    "distributed_cross_pairs_above",
]


def _cross_operands(a, b, mesh):
    from stormtpu.cross import _operands  # one validation home

    bm_a, bm_b = _operands(a, b)
    if mesh is None:
        mesh = make_row_mesh()
    axis = mesh.axis_names[0]
    return bm_a, bm_b, mesh, axis, mesh.shape[axis]


def _put_sharded(bm_a, bm_b, mesh, axis, r):
    """(a replicated-over-rows [na, W], b row-sharded [nb_pad, W],
    n_loc) — device-cached on the BitMatrices (repeated lookups against
    the same reference panel are the workload; re-uploading the panel
    per call cost ~8 s/138 MB through this relay). On a 2-D [rows ×
    bits] mesh both operands are additionally word-sharded; a psum over
    the bits axis completes the count blocks in the kernels."""
    nb_pad = round_up(max(bm_b.n, r), r * 32)
    bit_axis = bit_axis_of(mesh)
    w_pad = bm_b.n_words
    if bit_axis is not None:
        rb = mesh.shape[bit_axis]
        w_pad = round_up(max(w_pad, rb), rb)

    def build_b():
        xb = np.zeros((nb_pad, w_pad), dtype=np.uint32)
        xb[: bm_b.n, : bm_b.n_words] = bm_b.packed
        return jax.device_put(xb, NamedSharding(mesh, P(axis, bit_axis)))

    def build_a():
        xa = np.zeros((bm_a.n, w_pad), dtype=np.uint32)
        xa[:, : bm_a.n_words] = bm_a.packed
        return jax.device_put(xa, NamedSharding(mesh, P(None, bit_axis)))

    b_sharded = bm_b.device_cached(("cross_rowshard", nb_pad, mesh), build_b)
    a_rep = bm_a.device_cached(("cross_replicated", w_pad, mesh), build_a)
    return a_rep, b_sharded, nb_pad // r


@functools.lru_cache(maxsize=64)
def _cross_topk_fn(mesh: Mesh, axis: str, k: int, n_loc: int):
    from stormtpu.kernels import count_block_auto

    bit_axis = bit_axis_of(mesh)

    def local_fn(a_rep, b_loc, nb):
        d = jax.lax.axis_index(axis)
        c = count_block_auto(a_rep, b_loc)          # [na, n_loc]
        if bit_axis is not None:
            # 2-D mesh: complete the word-slice partial before top-k
            c = jax.lax.psum(c.astype(jnp.int32), bit_axis)
        gid = (jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
               + d * jnp.int32(n_loc))
        masked = jnp.where(gid < nb, c, jnp.int32(-1))
        vals, idx = jax.lax.top_k(masked, k)
        gidx = idx.astype(jnp.int32) + d * jnp.int32(n_loc)
        # leading device axis so the global result stacks per shard
        return vals[None], gidx[None]

    return jax.jit(shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, bit_axis), P(axis, bit_axis), P()),
        out_specs=(P(axis, None, None), P(axis, None, None)),
        check_vma=False,
    ))


def distributed_cross_topk_neighbors(
    a,
    b,
    k: int,
    *,
    mesh: Optional[Mesh] = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Per row of A (replicated), the top-k rows of the row-sharded
    panel B by exact intersection count. Same values as
    ``stormtpu.cross.cross_topk_neighbors``; tie order among equal
    counts is route-dependent (per-shard merge)."""
    bm_a, bm_b, mesh, axis, r = _cross_operands(a, b, mesh)
    if not 1 <= k <= bm_b.n:
        raise ValueError(f"k must be in [1, Nb], got k={k}, Nb={bm_b.n}")
    a_rep, b_sharded, n_loc = _put_sharded(bm_a, bm_b, mesh, axis, r)
    if k > n_loc:
        raise ValueError(
            f"k={k} exceeds the {n_loc}-row B shard: each device ranks "
            f"only its own shard; use fewer devices or the single-chip "
            f"cross_topk_neighbors"
        )
    fn = _cross_topk_fn(mesh, axis, int(k), int(n_loc))
    vals_r, idx_r = fn(a_rep, b_sharded,
                       jax.device_put(np.int32(bm_b.n),
                                      NamedSharding(mesh, P())))
    vals_r = fetch_global(vals_r)   # [R, na, k]
    idx_r = fetch_global(idx_r)
    # host merge of the R per-shard candidate sets (exact)
    cv = np.concatenate(list(vals_r), axis=1).astype(np.int64)  # [na, R·k]
    ci = np.concatenate(list(idx_r), axis=1)
    sel = np.argpartition(-cv, k - 1, axis=1)[:, :k]
    vals = np.take_along_axis(cv, sel, axis=1)
    idx = np.take_along_axis(ci, sel, axis=1)
    order = np.argsort(-vals, axis=1, kind="stable")
    return (
        np.take_along_axis(vals, order, axis=1).astype(np.int32),
        np.take_along_axis(idx, order, axis=1).astype(np.int32),
    )


@functools.lru_cache(maxsize=64)
def _cross_screen_fn(mesh: Mesh, axis: str, measure: str, n_loc: int):
    from stormtpu.kernels import count_block_auto
    from stormtpu.query import _pack_bit_rows, _screen_vals

    bit_axis = bit_axis_of(mesh)

    def local_fn(a_rep, b_loc, nnz_a, nnz_b_loc, nb, thresh, m_f):
        d = jax.lax.axis_index(axis)
        c = count_block_auto(a_rep, b_loc)          # [na, n_loc]
        if bit_axis is not None:
            # complete the partial before the float32 screen (the slack
            # math is not a homomorphism over partial counts)
            c = jax.lax.psum(c.astype(jnp.int32), bit_axis)
        vals = _screen_vals(c, nnz_a, nnz_b_loc, m_f, measure)
        gid = (jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
               + d * jnp.int32(n_loc))
        hit = (vals >= thresh) & (gid < nb)
        return _pack_bit_rows(hit)                  # [na, n_loc/32]

    return jax.jit(shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, bit_axis), P(axis, bit_axis), P(), P(axis),
                  P(), P(), P()),
        out_specs=P(None, axis),
        check_vma=False,
    ))


def distributed_cross_pairs_above(
    a,
    b,
    threshold: float,
    *,
    measure: str = "count",
    mesh: Optional[Mesh] = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All (i, j) with measure(A_i, B_j) ≥ threshold, A replicated and B
    row-sharded. Same contract as ``cross.cross_pairs_above`` (full
    rectangle, row-major, exact float64 refine for similarities); D2H is
    the packed hit bitmap, hit values are recomputed exactly on host
    from the packed rows."""
    from stormtpu.query import _expand_words, _validate_screen
    from stormtpu.setops import derive_similarity

    bm_a, bm_b, mesh, axis, r = _cross_operands(a, b, mesh)
    dev_thresh = _validate_screen(measure, threshold)
    a_rep, b_sharded, n_loc = _put_sharded(bm_a, bm_b, mesh, axis, r)
    nnz_b = np.zeros(n_loc * r, dtype=np.int32)
    nnz_b[: bm_b.n] = bm_b.row_nnz.astype(np.int32)
    fn = _cross_screen_fn(mesh, axis, measure, int(n_loc))
    rep = NamedSharding(mesh, P())
    hits = fetch_global(fn(
        a_rep, b_sharded,
        jax.device_put(bm_a.row_nnz.astype(np.int32), rep),
        jax.device_put(nnz_b, NamedSharding(mesh, P(axis))),
        jax.device_put(np.int32(bm_b.n), rep),
        jax.device_put(np.asarray(dev_thresh), rep),
        jax.device_put(np.float32(bm_a.m_bits), rep),
    ))
    ii, jj = _expand_words(hits, np.int32(bm_b.n))
    if not ii.size:
        empty_v = (np.zeros(0, np.int32) if measure == "count"
                   else np.zeros(0, np.float64))
        return np.zeros(0, np.int32), np.zeros(0, np.int32), empty_v
    # exact host recompute of hit values from the packed rows: the hit
    # set is the sparse output, so O(hits · W) beats shipping counts
    counts = np.zeros(ii.size, dtype=np.int64)
    pa, pb = bm_a.packed, bm_b.packed
    blk = max(1, (1 << 24) // max(bm_a.n_words, 1))
    for o in range(0, ii.size, blk):
        s = slice(o, o + blk)
        both = pa[ii[s]] & pb[jj[s]]
        counts[s] = np.bitwise_count(both).sum(axis=1, dtype=np.int64)
    if measure == "count":
        return (ii.astype(np.int32), jj.astype(np.int32),
                counts.astype(np.int32))
    vals = derive_similarity(counts, bm_a.row_nnz[ii], bm_b.row_nnz[jj],
                             bm_a.m_bits, measure)
    keep = vals >= threshold
    return ii[keep].astype(np.int32), jj[keep].astype(np.int32), vals[keep]
