"""Distributed aggregate statistics over C — the mesh twins of
stormtpu/stats.py (VERDICT r3 #4: §6 observability at BASELINE.json:11
scale).

- :func:`distributed_count_row_sums` — row marginals of C = XXᵀ over a
  row mesh: the global column counts come from
  :func:`stormtpu.parallel.columns.distributed_column_counts` (psum of
  exact int32 shard partials), then each device turns its OWN rows'
  weighted reduction into bit-plane AND+popcount passes (the same
  ``Σ_k x·cc = min(cc)·|x| + Σ_t 2ᵗ·popcount(x ∧ plane_t)`` identity as
  the single-chip dense route in stats.py) — per-plane per-row counts
  are ≤ M < 2³¹ so int32 is structurally exact; the host combines the
  planes in int64. Output stays O(N) — row-sharded per-plane counts are
  the only D2H.
- :func:`distributed_count_histogram` — the distribution of off-diagonal
  pair counts via the square ring walk (parallel/query.py pattern):
  partner shards stream around the ring with ``ppermute`` while each
  device bins the count blocks of its local rows under the strict
  global ``i < j < n`` mask, so every unordered pair is binned exactly
  once. D2H is per-(step, block) int32 bin partials (KBs), summed in
  int64 on host — NOT psum'd on device: at the 1M-row config a bin's
  global mass reaches n(n-1)/2 ≈ 5·10¹¹ which overflows int32, and the
  TPU has no int64; per-block partials are ≤ block_rows·n_loc pairs,
  kept < 2³¹ by construction (block_rows is halved until it fits).

Both support the 2-D [rows × bits] grid mesh: word-sharded partials are
psum'd over the bit axis before use (same composition as the 2-D query
forms). The reference has no distributed anything (SURVEY.md §2); these
follow BASELINE.json:5's row-sharding + collectives prescription.
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

from stormtpu.api import MatrixLike, _as_bitmatrix
from stormtpu.config import default_config
from stormtpu.kernels import count_block_auto
from stormtpu.layout import pack_bits
from stormtpu.parallel.columns import distributed_column_counts
from stormtpu.parallel.mesh import bit_axis_of, fetch_global, make_row_mesh
from stormtpu.utils import round_up

__all__ = ["distributed_count_row_sums", "distributed_count_histogram"]


@functools.lru_cache(maxsize=64)
def _plane_counts_fn(mesh: Mesh):
    """Compiled per-plane popcount partials, cached per mesh (fresh
    jit(shard_map) per call recompiles every invocation — CLAUDE.md)."""
    axis = mesh.axis_names[0]
    bit_axis = bit_axis_of(mesh)

    def local_fn(words: jax.Array, planes: jax.Array) -> jax.Array:
        # words [n_loc, Wc], planes [T, Wc] → [T, n_loc] int32
        def one(p):
            return jnp.sum(
                jax.lax.population_count(words & p[None, :]).astype(
                    jnp.int32
                ),
                axis=1,
            )

        out = jax.lax.map(one, planes)
        if bit_axis is not None:
            out = jax.lax.psum(out, bit_axis)
        return out

    return jax.jit(
        shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(axis, bit_axis), P(None, bit_axis)),
            out_specs=P(None, axis),
            check_vma=False,
        )
    )


def distributed_count_row_sums(
    x: MatrixLike,
    *,
    include_self: bool = True,
    mesh: Optional[Mesh] = None,
    chunk_words: int = 4096,
) -> np.ndarray:
    """Exact row sums of the pair-count matrix, int64 [N], computed
    row-sharded over ``mesh`` — value-identical to
    :func:`stormtpu.stats.count_row_sums` (tested). ``chunk_words``
    bounds the per-dispatch H2D slice like the column-counts walk."""
    bm = _as_bitmatrix(x)
    if mesh is None:
        mesh = make_row_mesh()
    axis = mesh.axis_names[0]
    bit_axis = bit_axis_of(mesh)
    r = mesh.shape[axis]
    rb = mesh.shape[bit_axis] if bit_axis is not None else 1

    # cached like any device operand: fixed for an immutable BitMatrix,
    # and recomputing it costs a full panel's worth of device dispatches
    cc = bm.device_cached(
        ("dcc", mesh),
        lambda: distributed_column_counts(bm, mesh=mesh),
    ).astype(np.int64)
    sums = bm.row_nnz.astype(np.int64)
    if bm.n == 0 or cc.size == 0:
        return np.zeros(bm.n, dtype=np.int64)
    base = int(cc.min())
    delta = cc - base
    t_planes = int(delta.max()).bit_length()
    sums *= base
    if t_planes:
        shifts = np.arange(t_planes, dtype=np.int64)[:, None]
        planes = pack_bits(((delta[None, :] >> shifts) & 1).astype(np.uint8))
        n_pad = round_up(max(bm.n, r), r)
        fn = _plane_counts_fn(mesh)
        x_shard = NamedSharding(mesh, P(axis, bit_axis))
        p_shard = NamedSharding(mesh, P(None, bit_axis))
        acc = np.zeros(n_pad, dtype=np.int64)
        w = bm.n_words
        # device-resident chunk reuse (VERDICT r4 #3): a second call must
        # upload nothing — through the ~39 MB/s relay the re-upload was
        # hours at spec scale for an O(N) result. Budgeted ×2 because
        # distributed_column_counts keeps its own sharded copy.
        from stormtpu.stream import _device_operand_budget

        cache_ok = 2 * n_pad * w * 4 <= _device_operand_budget()
        for c0 in range(0, w, chunk_words):
            wr = min(chunk_words, w - c0)  # real words this chunk
            wc = round_up(wr, rb)

            def build_x(c0=c0, wr=wr, wc=wc):
                chunk = np.zeros((n_pad, wc), dtype=np.uint32)
                chunk[: bm.n, :wr] = bm.packed[:, c0 : c0 + wr]
                return jax.device_put(chunk, x_shard)

            def build_p(c0=c0, wr=wr, wc=wc):
                p_chunk = np.zeros((t_planes, wc), dtype=np.uint32)
                p_chunk[:, :wr] = planes[:, c0 : c0 + wr]
                return jax.device_put(p_chunk, p_shard)

            if cache_ok:
                xd = bm.device_cached(
                    ("rs_chunk", mesh, n_pad, c0, wc), build_x)
                # planes derive from the column counts — fixed for an
                # immutable BitMatrix, so they cache with it
                pd = bm.device_cached(
                    ("rs_planes", mesh, t_planes, c0, wc), build_p)
            else:
                xd, pd = build_x(), build_p()
            part = fetch_global(fn(xd, pd)).astype(np.int64)
            acc += (part << shifts).sum(axis=0)
        sums += acc[: bm.n]
    if not include_self:
        sums = sums - bm.row_nnz.astype(np.int64)
    return sums


def _ring_hist_local(axis: str, r: int, n_loc: int, n_bins: int,
                     block_rows: int, psum_axis: Optional[str] = None):
    """Per-device square-ring loop emitting per-(step, block) int32 bin
    partials for the local rows (strict global i<j<n mask — each
    unordered pair binned exactly once across the whole ring)."""
    nb = n_loc // block_rows

    def local_fn(x_local: jax.Array, n_real: jax.Array, bw: jax.Array):
        my = jax.lax.axis_index(axis)
        buf = x_local
        blocks = x_local.reshape(nb, block_rows, x_local.shape[1])
        base = jnp.arange(nb, dtype=jnp.int32) * block_rows
        parts = []
        for s in range(r):
            partner = jnp.remainder(my + s, r)
            c0 = partner * n_loc

            def step_block(args):
                blk, b0 = args
                counts = count_block_auto(blk, buf).astype(jnp.int32)
                if psum_axis is not None:
                    counts = jax.lax.psum(counts, psum_axis)
                row_g = (
                    jax.lax.broadcasted_iota(jnp.int32, counts.shape, 0)
                    + my * n_loc + b0
                )
                col_g = (
                    jax.lax.broadcasted_iota(jnp.int32, counts.shape, 1) + c0
                )
                valid = (row_g < col_g) & (col_g < n_real)
                bins = jnp.minimum(counts // bw, jnp.int32(n_bins - 1))

                # per-bin full reductions, not scatter-add: TPU scatter
                # runs at ~2e5 adds/s (CLAUDE.md / the stream sink note)
                def one(b, _):
                    h = jnp.sum(
                        jnp.where(valid & (bins == b), 1, 0),
                        dtype=jnp.int32,
                    )
                    return b + jnp.int32(1), h

                _, hist = jax.lax.scan(
                    one, jnp.int32(0), None, length=n_bins
                )
                return hist

            parts.append(jax.lax.map(step_block, (blocks, base)))
            if s < r - 1:
                buf = jax.lax.ppermute(
                    buf, axis, [(i, (i - 1) % r) for i in range(r)]
                )
        return jnp.stack(parts)  # [r, nb, n_bins]

    return local_fn


@functools.lru_cache(maxsize=64)
def _hist_fn(mesh: Mesh, n_loc: int, n_bins: int, block_rows: int):
    axis = mesh.axis_names[0]
    bit_axis = bit_axis_of(mesh)
    r = mesh.shape[axis]
    return jax.jit(
        shard_map(
            _ring_hist_local(axis, r, n_loc, n_bins, block_rows,
                             psum_axis=bit_axis),
            mesh=mesh,
            in_specs=(P(axis, bit_axis), P(), P()),
            out_specs=P(axis, None, None),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=64)
def _stripe_hist_fn(mesh: Mesh, n_bins: int):
    """Per-STRIPE histogram partial: one superblock pair's bin counts,
    rows of the i-slice sharded over the mesh, j-slice replicated —
    the mesh twin of stream_count_histogram's per-stripe reduction,
    used by the summary-skipping stripe walk (the ring form computes
    every pair; this form lets co-empty stripes never touch the mesh)."""
    axis = mesh.axis_names[0]
    bit_axis = bit_axis_of(mesh)

    def local_fn(xi, xj, r0, c0, n_real, bw):
        counts = count_block_auto(xi, xj).astype(jnp.int32)
        if bit_axis is not None:
            counts = jax.lax.psum(counts, bit_axis)
        n_loc = xi.shape[0]
        row_g = (
            jax.lax.broadcasted_iota(jnp.int32, counts.shape, 0)
            + jax.lax.axis_index(axis) * n_loc + r0
        )
        col_g = jax.lax.broadcasted_iota(jnp.int32, counts.shape, 1) + c0
        valid = (row_g < col_g) & (col_g < n_real)
        bins = jnp.minimum(counts // bw, jnp.int32(n_bins - 1))

        def one(b, _):
            h = jnp.sum(jnp.where(valid & (bins == b), 1, 0),
                        dtype=jnp.int32)
            return b + jnp.int32(1), h

        _, hist = jax.lax.scan(one, jnp.int32(0), None, length=n_bins)
        return jax.lax.psum(hist, axis)

    return jax.jit(
        shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(axis, bit_axis), P(None, bit_axis), P(), P(), P(),
                      P()),
            out_specs=P(),
            check_vma=False,
        )
    )


def _hist_stripe_walk(bm, occ, sb: int, n_super: int, n_bins: int,
                      bin_width: int, mesh: Mesh) -> np.ndarray:
    """Summary-skipping mesh histogram: host-orchestrated superblock
    stripes (the distributed_stream_count_matrix pattern) — co-empty
    stripes bin their valid-pair mass to 0 arithmetically without
    touching the mesh; occupied stripes run one per-stripe shard_map
    whose D2H is n_bins ints. Pays one dispatch per occupied stripe, so
    the router only picks it when the skip fraction makes that cheap."""
    from stormtpu.stream import _host_superblock

    from collections import OrderedDict

    axis = mesh.axis_names[0]
    bit_axis = bit_axis_of(mesh)
    rb = mesh.shape[bit_axis] if bit_axis is not None else 1
    w_pad = round_up(max(bm.n_words, rb), rb)
    fn = _stripe_hist_fn(mesh, n_bins)
    a_shard = NamedSharding(mesh, P(axis, bit_axis))
    b_shard = NamedSharding(mesh, P(None, bit_axis))
    hist = np.zeros(n_bins, dtype=np.int64)
    xi_d, xi_idx = None, -1
    # small j-slice LRU (VERDICT r4 weak #3): without it each
    # j-superblock re-uploads up to n_super times per walk on clustered
    # panels. Residency bound: xi + 2 cached j-slices = 3 superblock
    # slices (one more than the streaming count driver keeps — a
    # deliberate trade: on the banded/clustered panels this route is
    # auto-picked for, the few occupied partners per row hit the LRU
    # across rows; on fully-occupied panels the ascending-j scan can't
    # hit a bounded cache at all and the extra slice is the only cost)
    xj_cache: OrderedDict[int, jax.Array] = OrderedDict()

    def get_xj(j: int) -> jax.Array:
        if j in xj_cache:
            xj_cache.move_to_end(j)
            return xj_cache[j]
        buf = jax.device_put(
            _host_superblock(bm.packed, bm.n, sb, w_pad, j), b_shard
        )
        xj_cache[j] = buf
        if len(xj_cache) > 2:
            xj_cache.popitem(last=False)
        return buf

    for i in range(n_super):
        for j in range(i, n_super):
            vi = max(0, min(bm.n - i * sb, sb))
            vj = max(0, min(bm.n - j * sb, sb))
            if not (occ[i] & occ[j]).any():
                hist[0] += vi * (vi - 1) // 2 if i == j else vi * vj
                continue
            if xi_idx != i:
                xi_d = jax.device_put(
                    _host_superblock(bm.packed, bm.n, sb, w_pad, i),
                    a_shard,
                )
                xi_idx = i
            part = np.asarray(
                fn(xi_d, get_xj(j), jnp.int32(i * sb), jnp.int32(j * sb),
                   jnp.int32(bm.n), jnp.int32(bin_width))
            )
            hist += part.astype(np.int64)
    return hist


def distributed_count_histogram(
    x: MatrixLike,
    *,
    n_bins: int = 64,
    bin_width: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    block_rows: int = 512,
    method: str = "auto",
    superblock_rows: int = 8192,
) -> dict:
    """Exact histogram of the off-diagonal pair counts C[i<j] on the
    mesh — same manifest contract as
    :func:`stormtpu.stream.stream_count_histogram` (uniform bins, last
    bin absorbs the tail, mass conservation asserted), value-identical
    to the single-chip sink (tested).

    ``method="auto"`` first applies the engine's density dispatch (r5):
    an extreme-sparsity panel routes to the K4 COO-stripe host binning
    (``stream_hist.stream_hist_sparse`` — work ∝ nnz², orders of
    magnitude under any mesh walk of the dense stripes, and host-bound
    so the mesh would idle regardless; the returned manifest's
    ``kernel`` is ``"sparse_outer"`` and ``mesh_shape`` is None).
    Otherwise two mesh routes (picked by the C8 summary):

    - ``"ring"`` — the square ppermute ring, one compiled dispatch for
      the whole walk; computes every pair.
    - ``"stripes"`` — host-orchestrated superblock stripes with the C8
      skip: co-empty stripes bin host-side with zero mesh work, each
      occupied stripe costs one dispatch. Auto picks it when ≥ half the
      stripes skip (banded/clustered panels — at the banded N=1M shape
      that is 8253 of 8256 stripes)."""
    bm = _as_bitmatrix(x)
    if bm.n < 2:
        raise ValueError("count_histogram needs N >= 2 rows")
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    if method not in ("auto", "ring", "stripes"):
        raise ValueError(
            f"method must be 'auto', 'ring' or 'stripes', got {method!r}"
        )
    if bin_width is None:
        from stormtpu.stream import default_hist_bin_width

        bin_width = default_hist_bin_width(bm.m_bits, n_bins)
    if method == "auto":
        # C12 composition at mesh level (r5): at extreme sparsity the K4
        # COO-stripe binning (host emission, work ∝ nnz²) beats ANY mesh
        # walk of the N²·M dense stripes by orders of magnitude (131k×1M
        # d=1e-5 measured: 5.4 s vs est. hours) — and it is host-bound,
        # so the mesh would sit idle either way. Same density policy as
        # the streaming count walk; the manifest's kernel field says
        # which route ran.
        from stormtpu.native import HAVE_NATIVE

        cfg = default_config()
        if (HAVE_NATIVE and bm.n >= 2
                and bm.density < cfg.sparse_density_threshold):
            from stormtpu.stream_hist import stream_hist_sparse

            man = stream_hist_sparse(
                bm, n_bins=n_bins, bin_width=bin_width,
                superblock_rows=superblock_rows, config=cfg,
            )
            man["mesh_shape"] = None  # host route: the mesh was not used
            return man
    if mesh is None:
        mesh = make_row_mesh()
    axis = mesh.axis_names[0]
    bit_axis = bit_axis_of(mesh)
    r = mesh.shape[axis]
    rb = mesh.shape[bit_axis] if bit_axis is not None else 1

    if method != "ring" and bm.n and bm.n_words:
        from stormtpu.stream import cap_hist_superblock

        # per-stripe bin partials are int32 (≤ sb² pairs each) — cap sb
        # below the overflow bound like the ring route's block halving
        sb = cap_hist_superblock(
            round_up(max(superblock_rows, r * 8), r * 8), r * 8
        )
        n_pad_s = round_up(bm.n, sb)
        n_super_s = n_pad_s // sb
        occ_rows = bm.block_summary(block_bits=128 * 32).astype(bool)
        occ_pad = np.zeros((n_pad_s, occ_rows.shape[1]), dtype=bool)
        occ_pad[: bm.n] = occ_rows
        occ = occ_pad.reshape(n_super_s, sb, -1).any(axis=1)
        # [S, S]: stripe (i, j) has any co-occupied K-group
        co = (occ.astype(np.int32) @ occ.T.astype(np.int32)) > 0
        iu = np.triu_indices(n_super_s)
        skipped = int((~co[iu]).sum())
        total_stripes = iu[0].size
        if method == "stripes" or (
            n_super_s >= 2 and skipped * 2 >= total_stripes
        ):
            hist = _hist_stripe_walk(bm, occ, sb, n_super_s, n_bins,
                                     bin_width, mesh)
            return _hist_manifest(bm, mesh, n_bins, bin_width, hist,
                                  kernel="stripes",
                                  extra={"superblock_rows": sb,
                                         "n_super": n_super_s,
                                         "stripes_skipped": skipped})

    block_rows = max(32, min(block_rows, round_up(bm.n, 32)))
    n_pad = round_up(max(bm.n, 1), r * block_rows)
    # int32 partial bound: a (step, block) partial counts at most
    # block_rows·n_loc pairs — halve the block until it is < 2³¹
    while block_rows > 32 and block_rows * (n_pad // r) >= 2**31:
        block_rows //= 2
        n_pad = round_up(max(bm.n, 1), r * block_rows)
    n_loc = n_pad // r

    from stormtpu.parallel.query import _sharded_operands

    x_sharded, _, _ = _sharded_operands(bm, mesh, n_pad)
    fn = _hist_fn(mesh, n_loc, n_bins, block_rows)
    parts = fetch_global(
        fn(x_sharded, jnp.int32(bm.n), jnp.int32(bin_width))
    )  # [R·r, nb, n_bins] int32
    hist = parts.astype(np.int64).sum(axis=(0, 1))
    return _hist_manifest(bm, mesh, n_bins, bin_width, hist, kernel="ring",
                          extra={"block_rows": block_rows})


def _hist_manifest(bm, mesh: Mesh, n_bins: int, bin_width: int,
                   hist: np.ndarray, *, kernel: str, extra: dict) -> dict:
    expect = bm.n * (bm.n - 1) // 2
    got = int(hist.sum())
    if got != expect:
        raise AssertionError(
            f"histogram mass {got} != n*(n-1)/2 = {expect} — a pair was "
            "double-counted or dropped; this is a bug, not an input error"
        )
    edges = np.minimum(
        np.arange(n_bins + 1, dtype=np.int64) * bin_width, bm.m_bits + 1
    )
    man = {
        "n": bm.n,
        "m_bits": bm.m_bits,
        "mesh_shape": dict(mesh.shape),
        "kernel": kernel,
        "sink": "histogram",
        "n_bins": n_bins,
        "bin_width": int(bin_width),
        "bin_edges": edges,
        "hist": hist,
        "pairs": got,
    }
    man.update(extra)
    return man
