"""Cross-set queries: one bitmap set against another.

The reference's all-pairs surface is single-set (SURVEY.md §3 C11:
N×N over one STORM set); its domain routinely needs the RECTANGULAR
form — a query panel screened against a reference panel (LD lookup of
new variants against a population panel, sample-vs-cohort matching.)
The counts primitive exists (:func:`stormtpu.api.count_block`); these
are its reduced-query twins, fetch-minimizing like the single-set forms
in ``stormtpu.query``:

- :func:`cross_topk_neighbors`: per row of A, the top-k rows of B by
  exact intersection count — D2H is O(Na·k), counts never leave the
  device.
- :func:`cross_pairs_above`: every (i, j) with measure(A_i, B_j) ≥
  threshold — the device fetches a packed 1-bit hit bitmap plus the hit
  values gathered from device-resident counts (D2H ∝ hits). Similarity
  screens run in float32 with under-admission slack and the host
  re-filters exactly in float64 (same contract as ``query.pairs_above``).

Unlike the single-set queries there is no self-pair or triangle rule:
the full Na×Nb rectangle is scored (passing the same matrix twice scores
the diagonal too — use ``query.topk_neighbors`` / ``query.pairs_above``
for within-set semantics). A reference panel beyond the device budget is
walked in resident chunks and merged on host — the cross queries are
host-RAM-bounded like the streaming forms, not HBM-bounded.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stormtpu.config import EngineConfig, default_config
from stormtpu.layout import BitMatrix
from stormtpu.utils import next_pow2, round_up

__all__ = ["cross_topk_neighbors", "cross_pairs_above"]

# A-rows per device block: counts block [bl, Nb_pad] stays ≤ ~256 MB at
# Nb = 16384; the block list pads to one fixed shape (one compile).
_BLOCK_ROWS = 4096


def _operands(a, b):
    from stormtpu.api import _as_bitmatrix

    bm_a = _as_bitmatrix(a)
    bm_b = _as_bitmatrix(b)
    if bm_a.m_bits != bm_b.m_bits:
        raise ValueError(
            f"bit-universe mismatch: {bm_a.m_bits} vs {bm_b.m_bits}"
        )
    if bm_a.n == 0 or bm_b.n == 0:
        raise ValueError("cross queries need non-empty matrices")
    return bm_a, bm_b


def _block_plan(na: int) -> tuple[int, int]:
    """(block_rows, n_pad) for walking A: one compiled shape per pow2
    bucket, blocks ≤ _BLOCK_ROWS."""
    bl = min(_BLOCK_ROWS, next_pow2(na))
    return bl, round_up(na, bl)


def _b_chunk_rows(nb: int, w: int, bl: int, na_pad: int, bitmap: bool) -> int:
    """Rows of B resident per device chunk: the whole (padded) B when it
    fits the refusal budget next to the RESIDENT A operand (all of A
    stays device-cached — it is walked by slice, not re-uploaded) and
    one A block's counts, else the largest power-of-two-floored
    32-multiple that does — the cross queries are host-RAM-bounded like
    the streaming forms, not HBM-bounded. Raises (via the shared guard)
    only when A itself plus a 32-row chunk cannot fit, i.e. the query
    panel or the bit universe is the problem."""
    from stormtpu.stream import _device_refuse_budget, require_device_budget

    budget = _device_refuse_budget()
    per_b_row = 4 * (w + bl) + (bl // 8 if bitmap else 0)
    # the whole A operand is device-resident, plus the sliced A block
    # XLA materializes inside the jit
    fixed = 4 * (na_pad * w + bl * w)
    require_device_budget(
        fixed + 32 * per_b_row,
        f"Na={na_pad} (padded): the resident A operand plus a 32-row "
        f"B chunk",
        "reduce the query panel or the bit universe",
    )
    nb_pad = round_up(nb, 32)
    cb = (budget - fixed) // per_b_row
    if cb >= nb_pad:
        return nb_pad  # single resident chunk (device-cached operand)
    # floor to a 1/8-octave 32-multiple: bounded compile count across
    # budgets, ≤12.5% headroom loss
    e = max(5, cb.bit_length() - 4)
    return (cb >> e) << e


@functools.partial(jax.jit, static_argnames=("k", "bl"))
def _cross_topk_block(a_pad, b_pad, r0, nb_valid, *, k: int, bl: int):
    from stormtpu.kernels import count_block_auto

    a_blk = jax.lax.dynamic_slice_in_dim(a_pad, r0, bl)
    c = count_block_auto(a_blk, b_pad)
    col = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
    masked = jnp.where(col < nb_valid, c, jnp.int32(-1))
    vals, idx = jax.lax.top_k(masked, k)
    return vals, idx.astype(jnp.int32)


def cross_topk_neighbors(
    a, b, k: int, *, measure: str = "count",
    config: Optional[EngineConfig] = None
) -> tuple[np.ndarray, np.ndarray]:
    """Per row of A, the top-k rows of B by exact intersection count.

    Returns (counts int32 [Na, k], indices int32 [Na, k]) sorted
    descending; counts are uniquely determined, tie ORDER among equal
    counts is route-dependent (chunk-merge order). A and B may be
    BitMatrices or {0,1} dense arrays over the same bit universe. B
    beyond the device budget is walked in resident chunks and merged on
    host (host-RAM-bounded, like the streaming queries).

    ``measure``: "count" (default) or a similarity ("jaccard", "dice",
    "cosine", "overlap", "phi", "r2") — then the return is (values
    float64 [Na, k], indices int32 [Na, k]), EXACT: the device extracts
    float32-ranked candidates with their integer counts, the host
    rescores in float64, and a per-chunk certification (the k-th
    candidate must clear the excluded columns' float32 bound plus slack)
    escalates the candidate width until the true top-k is provably
    inside — ties break toward the lower B index.
    """
    bm_a, bm_b = _operands(a, b)
    cfg = config or default_config()
    cfg.validate(bm_a.m_bits)
    if not 1 <= k <= bm_b.n:
        raise ValueError(f"k must be in [1, Nb], got k={k}, Nb={bm_b.n}")
    if measure != "count":
        return _cross_topk_measure(bm_a, bm_b, k, measure)
    from stormtpu.stream import _host_superblock

    w = bm_a.n_words
    bl, na_pad = _block_plan(bm_a.n)
    cb = _b_chunk_rows(bm_b.n, w, bl, na_pad, bitmap=False)
    if k > cb:
        raise ValueError(
            f"k={k} exceeds the {cb}-row B chunk the device budget "
            f"allows: each chunk ranks only its own rows; reduce k or "
            f"raise STORMTPU_DEVICE_REFUSE_BUDGET_BYTES"
        )
    nb_walk = round_up(bm_b.n, cb)
    single = nb_walk == cb
    a_dev = bm_a.device_padded(na_pad)
    best_v = np.full((na_pad, k), -1, dtype=np.int64)
    best_i = np.zeros((na_pad, k), dtype=np.int32)
    from stormtpu.stream_query import _merge_topk

    for b0 in range(0, nb_walk, cb):
        if single:
            b_dev = bm_b.device_padded(cb)
        else:
            b_dev = jnp.asarray(_host_superblock(bm_b.packed, bm_b.n, cb,
                                                 w, b0 // cb))
        nb_valid = jnp.int32(min(bm_b.n - b0, cb))
        for r0 in range(0, na_pad, bl):
            v, i = _cross_topk_block(
                a_dev, b_dev, jnp.int32(r0), nb_valid, k=k, bl=bl
            )
            _merge_topk(best_v, best_i, slice(r0, r0 + bl),
                        np.asarray(v).astype(np.int64),
                        np.asarray(i) + b0, k)
    best_v = best_v[: bm_a.n]
    best_i = best_i[: bm_a.n]
    order = np.argsort(-best_v, axis=1, kind="stable")
    vals = np.take_along_axis(best_v, order, axis=1)
    idx = np.take_along_axis(best_i, order, axis=1)
    # nb >= k real columns exist, so every kept entry is a real count
    return vals.astype(np.int32), idx.astype(np.int32)


@functools.partial(jax.jit, static_argnames=("measure", "bl", "kk"))
def _cross_topk_measure_block(a_pad, b_pad, nnz_a_pad, nnz_b, r0, nb_valid,
                              m_f, *, measure: str, bl: int, kk: int):
    """Top-``kk`` candidate columns per A-row by float32 similarity, with
    their exact integer counts (for the float64 host rescore)."""
    from stormtpu.kernels import count_block_auto
    from stormtpu.query import _screen_vals

    a_blk = jax.lax.dynamic_slice_in_dim(a_pad, r0, bl)
    nnz_a = jax.lax.dynamic_slice_in_dim(nnz_a_pad, r0, bl)
    c = count_block_auto(a_blk, b_pad)
    s = _screen_vals(c, nnz_a, nnz_b, m_f, measure)
    col = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
    s = jnp.where(col < nb_valid, s, -jnp.inf)
    svals, idx = jax.lax.top_k(s, kk)
    cvals = jnp.take_along_axis(c, idx, axis=1)
    return svals, idx.astype(jnp.int32), cvals


# Certification margin for the measure top-k: float32 screen values of
# the [0,1]-range measures sit within ~1e-4 of the float64 truth (the
# screens' threshold slack; phi/r2's in-kernel num inflation keeps its
# score an over-estimate, so the bound holds one-sidedly there too).
# Any column the device did NOT return scores ≤ s_cut in float32, hence
# ≤ s_cut + slack in truth — a candidate set whose k-th float64 value
# strictly clears that bound provably contains the true top-k.
_MEASURE_TOPK_SLACK = 2e-4


def _cross_topk_measure(bm_a, bm_b, k: int, measure: str):
    """Certified-exact similarity top-k over the B-chunk walk: float32
    candidate extraction on device, float64 rescore on host, per-chunk
    certification with escalation (kk doubles — pow2-bucketed compiles —
    until the boundary clears or the chunk is fully enumerated)."""
    from stormtpu.query import _validate_screen
    from stormtpu.setops import derive_similarity
    from stormtpu.stream import _host_superblock

    _validate_screen(measure, 1.0)  # validates the measure name
    w = bm_a.n_words
    bl, na_pad = _block_plan(bm_a.n)
    cb = _b_chunk_rows(bm_b.n, w, bl, na_pad, bitmap=False)
    if k > cb:
        raise ValueError(
            f"k={k} exceeds the {cb}-row B chunk the device budget "
            f"allows: each chunk ranks only its own rows; reduce k or "
            f"raise STORMTPU_DEVICE_REFUSE_BUDGET_BYTES"
        )
    nb_walk = round_up(bm_b.n, cb)
    single = nb_walk == cb
    m_f = jnp.float32(bm_a.m_bits)
    a_dev = bm_a.device_padded(na_pad)
    nnz_a_dev = bm_a.device_nnz(na_pad)
    nnz_a_host = np.zeros(na_pad, dtype=np.int64)
    nnz_a_host[: bm_a.n] = bm_a.row_nnz
    nnz_b_pad = np.zeros(nb_walk, dtype=np.int64)
    nnz_b_pad[: bm_b.n] = bm_b.row_nnz
    kk0 = int(min(next_pow2(max(2 * k, k + 8)), cb))
    chunk_vals: list[np.ndarray] = []
    chunk_idx: list[np.ndarray] = []
    for b0 in range(0, nb_walk, cb):
        if single:
            b_dev = bm_b.device_padded(cb)
            nnz_b_dev = bm_b.device_nnz(cb)
        else:
            b_dev = jnp.asarray(_host_superblock(bm_b.packed, bm_b.n, cb,
                                                 w, b0 // cb))
            nnz_b_dev = jnp.asarray(
                nnz_b_pad[b0 : b0 + cb].astype(np.int32))
        nb_valid = min(bm_b.n - b0, cb)
        kk = kk0
        while True:
            f_rows, g_rows, cut_rows = [], [], []
            for r0 in range(0, na_pad, bl):
                sv, ix, cv = _cross_topk_measure_block(
                    a_dev, b_dev, nnz_a_dev, nnz_b_dev, jnp.int32(r0),
                    jnp.int32(nb_valid), m_f, measure=measure, bl=bl,
                    kk=kk,
                )
                sv = np.asarray(sv)
                ix = np.asarray(ix).astype(np.int64)
                cv = np.asarray(cv)
                valid = sv > -np.inf
                f = derive_similarity(
                    cv, nnz_a_host[r0 : r0 + bl, None],
                    nnz_b_pad[b0 + ix], bm_a.m_bits, measure,
                )
                f = np.where(valid, f, -np.inf)
                g = np.where(valid, ix + b0, np.int64(2**62))
                f_rows.append(f)
                g_rows.append(g)
                cut_rows.append(sv[:, -1])
            f_all = np.concatenate(f_rows)
            g_all = np.concatenate(g_rows)
            s_cut = np.concatenate(cut_rows)
            order = np.lexsort((g_all, -f_all), axis=1)
            f_all = np.take_along_axis(f_all, order, axis=1)
            g_all = np.take_along_axis(g_all, order, axis=1)
            if nb_valid <= kk:
                break  # every valid column is a candidate
            # real rows must clear the exclusion bound at the k-th place
            real = np.arange(na_pad) < bm_a.n
            ok = f_all[:, k - 1] > s_cut + _MEASURE_TOPK_SLACK
            if bool(np.all(ok | ~real)) or kk >= cb:
                break
            kk = int(min(kk * 2, cb))
        chunk_vals.append(f_all[:, :k])
        chunk_idx.append(g_all[:, :k])
    # merge the per-chunk certified top-k lists (global top-k is inside
    # their union); ties break toward the lower global index
    f_m = np.concatenate(chunk_vals, axis=1)
    g_m = np.concatenate(chunk_idx, axis=1)
    order = np.lexsort((g_m, -f_m), axis=1)
    f_m = np.take_along_axis(f_m, order, axis=1)[: bm_a.n, :k]
    g_m = np.take_along_axis(g_m, order, axis=1)[: bm_a.n, :k]
    return f_m, g_m.astype(np.int32)


@functools.partial(jax.jit, static_argnames=("measure", "bl"))
def _cross_screen_block(a_pad, b_pad, nnz_a_pad, nnz_b, r0, nb_valid,
                        thresh, m_f, *, measure: str, bl: int):
    from stormtpu.kernels import count_block_auto
    from stormtpu.query import _pack_bit_rows, _screen_vals

    a_blk = jax.lax.dynamic_slice_in_dim(a_pad, r0, bl)
    nnz_a = jax.lax.dynamic_slice_in_dim(nnz_a_pad, r0, bl)
    c = count_block_auto(a_blk, b_pad)
    vals = _screen_vals(c, nnz_a, nnz_b, m_f, measure)
    col = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)
    hit = (vals >= thresh) & (col < nb_valid)
    return _pack_bit_rows(hit), c


def cross_pairs_above(
    a,
    b,
    threshold: float,
    *,
    measure: str = "count",
    config: Optional[EngineConfig] = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All (i, j) with measure(A_i, B_j) ≥ threshold over the FULL
    Na×Nb rectangle (no triangle/self rule — see module docstring).

    measure: "count" (exact int32 counts) or one of the similarity
    measures ("jaccard", "dice", "cosine", "overlap", "phi", "r2" —
    float64, exact host re-filter). Returns (ii, jj, values) row-major.
    """
    from stormtpu.query import (
        _expand_words,
        _gather_hit_words,
        _validate_screen,
    )
    from stormtpu.setops import derive_similarity

    bm_a, bm_b = _operands(a, b)
    cfg = config or default_config()
    cfg.validate(bm_a.m_bits)
    dev_thresh = _validate_screen(measure, threshold)
    from stormtpu.stream import _host_superblock

    w = bm_a.n_words
    bl, na_pad = _block_plan(bm_a.n)
    cb = _b_chunk_rows(bm_b.n, w, bl, na_pad, bitmap=True)
    nb_walk = round_up(bm_b.n, cb)
    single = nb_walk == cb
    m_f = jnp.float32(bm_a.m_bits)
    a_dev = bm_a.device_padded(na_pad)
    nnz_a_dev = bm_a.device_nnz(na_pad)
    nnz_b_pad = np.zeros(nb_walk, dtype=np.int32)
    nnz_b_pad[: bm_b.n] = bm_b.row_nnz.astype(np.int32)
    out_i: list[np.ndarray] = []
    out_j: list[np.ndarray] = []
    out_c: list[np.ndarray] = []
    for b0 in range(0, nb_walk, cb):
        if single:
            b_dev = bm_b.device_padded(cb)
            nnz_b = bm_b.device_nnz(cb)
        else:
            b_dev = jnp.asarray(_host_superblock(bm_b.packed, bm_b.n, cb,
                                                 w, b0 // cb))
            nnz_b = jnp.asarray(nnz_b_pad[b0 : b0 + cb])
        nb_valid = jnp.int32(min(bm_b.n - b0, cb))
        for r0 in range(0, na_pad, bl):
            hits_d, counts_d = _cross_screen_block(
                a_dev, b_dev, nnz_a_dev, nnz_b, jnp.int32(r0), nb_valid,
                dev_thresh, m_f, measure=measure, bl=bl,
            )
            li, lj = _expand_words(np.asarray(hits_d),
                                   np.int32(min(bm_b.n - b0, cb)))
            if not li.size:
                continue
            # gather hit values from the device-resident counts block
            # (fixed pow2 chunk shapes — every new length is a compile)
            p = li.size
            chunk = int(min(max(next_pow2(p), 4096), 1 << 16))
            p_pad = round_up(p, chunk)
            ri = np.zeros(p_pad, dtype=np.int32)
            ci = np.zeros(p_pad, dtype=np.int32)
            ri[:p] = li
            ci[:p] = lj
            cvals = np.concatenate([
                np.asarray(_gather_hit_words(
                    counts_d, jnp.asarray(ri[o : o + chunk]),
                    jnp.asarray(ci[o : o + chunk]),
                ))
                for o in range(0, p_pad, chunk)
            ])[:p]
            out_i.append((li + r0).astype(np.int64))
            out_j.append((lj + b0).astype(np.int64))
            out_c.append(cvals.astype(np.int64))
    if not out_i:
        empty_v = (np.zeros(0, np.int32) if measure == "count"
                   else np.zeros(0, np.float64))
        return np.zeros(0, np.int32), np.zeros(0, np.int32), empty_v
    ii = np.concatenate(out_i)
    jj = np.concatenate(out_j)
    counts = np.concatenate(out_c)
    keep = ii < bm_a.n  # padded A rows are all-zero but drop them anyway
    ii, jj, counts = ii[keep], jj[keep], counts[keep]
    # chunked walks emit (B-chunk)-major order; the contract is row-major
    order = np.lexsort((jj, ii))
    ii, jj, counts = ii[order], jj[order], counts[order]
    if measure == "count":
        return (ii.astype(np.int32), jj.astype(np.int32),
                counts.astype(np.int32))
    vals = derive_similarity(counts, bm_a.row_nnz[ii], bm_b.row_nnz[jj],
                             bm_a.m_bits, measure)
    keep = vals >= threshold
    return ii[keep].astype(np.int32), jj[keep].astype(np.int32), vals[keep]
