"""Opt-in on-device regression tests (STORMTPU_TPU_TESTS=1, real TPU).

These reproduce the TPU-only failures found during development that CPU
tests structurally cannot catch, plus device exactness of the big paths:

- jnp.searchsorted's binary-search lowering crashed the TPU worker at the
  sparse config's real shapes (fixed: method="sort" in kernels/sparse.py)
- pair_counts' unchunked gather OOM'd at 21 GB from a permissive
  pairs_above screen (fixed: ~256 MB chunks)
- large-M queries route through the Pallas MXU rectangle inside lax.map

Run: STORMTPU_TPU_TESTS=1 python -m pytest tests/test_tpu_device.py -q
(minutes: first compiles are slow on the tunneled backend).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("STORMTPU_TPU_TESTS"),
    reason="on-device tests are minutes-long; set STORMTPU_TPU_TESTS=1 "
    "and run OUTSIDE the CPU-forcing conftest environment",
)


@pytest.fixture(scope="module")
def tpu_backend():
    import jax

    if jax.default_backend() == "cpu":
        pytest.skip("needs a real TPU backend (conftest forces CPU; run "
                    "the module directly via the helper below)")
    return jax.default_backend()


def test_sparse_kernel_at_config3_shape(tpu_backend):
    """[256 x ~8k-nnz] all-pairs positions kernel — the shape that faulted
    the TPU worker with the binary-search searchsorted lowering."""
    import jax.numpy as jnp

    from stormtpu.kernels.sparse import count_block_sparse

    rng = np.random.default_rng(1)
    n, lmax, m = 256, 8064, 1_000_000
    pos = np.full((n, lmax), m, dtype=np.int32)
    for i in range(n):
        pos[i, :8000] = np.sort(
            rng.choice(m, size=8000, replace=False)
        ).astype(np.int32)
    out = np.asarray(count_block_sparse(jnp.asarray(pos), jnp.asarray(pos),
                                        sentinel=m))
    want01 = len(np.intersect1d(pos[0][pos[0] < m], pos[1][pos[1] < m]))
    assert int(out[0, 1]) == want01
    assert int(out[3, 3]) == 8000


def test_large_m_queries_and_chunked_gather(tpu_backend):
    """topk + a permissive pairs_above screen at M=1M bits (the screen
    produces >100k hits — exercises the chunked pair gather)."""
    from stormtpu import BitMatrix
    from stormtpu.query import pairs_above, topk_neighbors

    rng = np.random.default_rng(5)
    n, w = 1024, 31250
    packed = rng.integers(0, 2**32, (n, w), dtype=np.uint32)
    bm = BitMatrix.from_packed(packed, m_bits=w * 32)

    vals, _ = topk_neighbors(bm, k=5)
    sub = np.bitwise_count(packed[:2, None, :] & packed[None, :, :]).sum(
        axis=2).astype(np.int64)
    for r in range(2):
        row = sub[r].copy()
        row[r] = -1
        assert np.array_equal(vals[r].astype(np.int64), np.sort(row)[::-1][:5])

    th = int(np.median(sub[0])) + 300
    ii, jj, cv = pairs_above(bm, th)
    assert len(ii) > 50_000  # permissive screen → chunked gather exercised
    sel = np.random.default_rng(1).integers(0, len(ii), 64)
    want = np.bitwise_count(packed[ii[sel]] & packed[jj[sel]]).sum(
        axis=1).astype(np.int64)
    assert np.array_equal(cv[sel].astype(np.int64), want)


def test_auto_dispatch_k4_at_extreme_sparsity(tpu_backend):
    """With a real TPU backend, D1's measured cost model routes extreme
    sparsity to the host-native K4 path; counts stay exact."""
    from stormtpu import BitMatrix, intersect_count_matrix
    from stormtpu.dispatch import choose_strategy
    from stormtpu.native import HAVE_NATIVE
    from stormtpu.oracle import oracle_count_matrix

    if not HAVE_NATIVE:
        pytest.skip("native library unbuilt")
    rng = np.random.default_rng(3)
    n, m, d = 2048, 1_000_000, 1e-4
    nnz = int(m * d)
    rows = np.repeat(np.arange(n, dtype=np.int64), nnz)
    cols = rng.integers(0, m, n * nnz).astype(np.int64)
    bm = BitMatrix.from_positions(rows, cols, n, m)
    assert choose_strategy(bm.n, bm.m_bits, bm.density) == "sparse_outer"
    got = intersect_count_matrix(bm)
    want = oracle_count_matrix(bm.packed[:64])
    assert np.array_equal(got[:64, :64], want)


def test_randomized_soak(tpu_backend):
    """Randomized shapes/densities through the full API on the real chip,
    sampled-exact everywhere (a trimmed version of the 12-config soak that
    passed 2026-08-16; full script shape in the repo history)."""
    from stormtpu import BitMatrix, intersect_count_matrix
    from stormtpu.oracle import oracle_count_block
    from stormtpu.query import pair_counts

    rng = np.random.default_rng(99)
    for it in range(4):
        n = int(rng.integers(33, 1500))
        m = int(rng.integers(900, 150_000))
        density = float(10 ** rng.uniform(-4, -0.3))
        dense = (rng.random((n, m)) < density).astype(np.uint8)
        dense[n // 3] = 0
        dense[n - 1] = dense[0]
        bm = BitMatrix.from_dense(dense)
        c = intersect_count_matrix(bm)
        sel = rng.integers(0, n, min(48, n))
        want = oracle_count_block(bm.packed[sel], bm.packed[sel])
        assert np.array_equal(c[np.ix_(sel, sel)], want), f"iter {it}"
        ii = rng.integers(0, n, 64)
        jj = rng.integers(0, n, 64)
        pc = pair_counts(bm, ii, jj).astype(np.int64)
        pw = np.bitwise_count(bm.packed[ii] & bm.packed[jj]).sum(
            axis=1, dtype=np.int64)
        assert np.array_equal(pc, pw), f"iter {it} pair_counts"


def test_distributed_queries_on_device(tpu_backend):
    """Distributed query paths on the real chip (1-device mesh — the
    degenerate ring; multi-device logic is covered on the forced-8 CPU
    mesh in test_parallel.py). Exercises shard_map + the screen/top-k
    kernels under the TPU backend."""
    import numpy as np

    from stormtpu import pairs_above, topk_neighbors
    from stormtpu.layout import BitMatrix
    from stormtpu.parallel import (
        distributed_column_counts,
        distributed_pairs_above,
        distributed_topk_neighbors,
        make_row_mesh,
    )

    rng = np.random.default_rng(61)
    dense = (rng.random((128, 4096)) < 0.2).astype(np.uint8)
    bm = BitMatrix.from_dense(dense)
    mesh = make_row_mesh(1)

    v1, _ = topk_neighbors(bm, k=4)
    vd, idd = distributed_topk_neighbors(bm, 4, mesh=mesh)
    np.testing.assert_array_equal(vd, v1)

    i1, j1, c1 = pairs_above(bm, 180)
    iid, jjd, cd = distributed_pairs_above(bm, 180, mesh=mesh)
    np.testing.assert_array_equal(iid, i1)
    np.testing.assert_array_equal(jjd, j1)
    np.testing.assert_array_equal(cd, c1)

    # bits-axis screen (128 words = 1 device × wk): psum tile partials
    iik, jjk, ck = distributed_pairs_above(bm, 180, mesh=mesh,
                                           shard_axis="bits")
    np.testing.assert_array_equal(iik, i1)
    np.testing.assert_array_equal(ck, c1)

    ac = distributed_column_counts(bm, mesh=mesh)
    np.testing.assert_array_equal(ac, dense.sum(axis=0).astype(np.int32))


def test_query_soak_on_device(tpu_backend):
    """Randomized shapes/densities/measures through the QUERY layer on
    the real chip, exact vs host brute force — shields the dispatch
    (tile screen / block screen / sparse shortcut), the two-phase fetch,
    and the pow2 gather buckets."""
    import numpy as np

    from stormtpu import BitMatrix, pairs_above, topk_neighbors

    rng = np.random.default_rng(123)
    for it in range(3):
        n = int(rng.integers(40, 900))
        m = int(rng.integers(1000, 120_000))
        density = float(10 ** rng.uniform(-3, -0.3))
        dense = (rng.random((n, m)) < density).astype(np.uint8)
        dense[0] = dense[n // 2]  # a guaranteed high-count pair
        bm = BitMatrix.from_dense(dense)
        want = (dense.astype(np.int64) @ dense.T)

        k = int(rng.integers(1, min(8, n - 1) + 1))
        vals, idx = topk_neighbors(bm, k)
        w = want.copy()
        np.fill_diagonal(w, -1)
        exp = np.sort(w, axis=1)[:, ::-1][:, :k]
        assert np.array_equal(vals, exp), f"iter {it} topk"

        tri = want[np.triu_indices(n, 1)]
        thresh = max(1, int(np.percentile(tri, 99)))
        ii, jj, vv = pairs_above(bm, thresh)
        wi, wj = np.nonzero(np.triu(want, 1) >= thresh)
        assert np.array_equal(ii, wi.astype(np.int32)), f"iter {it} screen ii"
        assert np.array_equal(jj, wj.astype(np.int32)), f"iter {it} screen jj"
        assert np.array_equal(vv, want[wi, wj]), f"iter {it} screen vals"

        nnz = dense.sum(1).astype(np.float64)
        J = want / np.maximum(nnz[:, None] + nnz[None, :] - want, 1)
        jt = float(np.percentile(J[np.triu_indices(n, 1)], 99.5))
        if 0 < jt <= 1:
            ii, jj, vv = pairs_above(bm, jt, measure="jaccard")
            wi, wj = np.nonzero(np.triu(J, 1) >= jt)
            assert np.array_equal(ii, wi.astype(np.int32)), f"iter {it} jac"
            assert np.allclose(vv, J[wi, wj], rtol=0, atol=0), f"iter {it} jacv"


def test_clustered_worklist_on_device(tpu_backend):
    """K5's scalar-prefetched OUTPUT slot map is a Mosaic pattern no
    other kernel uses — prove it compiles + runs exactly on the real
    device (block-diagonal input whose structure is invisible to the
    global column compaction). Measured r2: 4096x1M B=8 block-diagonal
    runs 3.1 ms vs 53.6 ms for the K2 walk (17x; work fraction 2.2%)."""
    from stormtpu.kernels.clustered import (
        build_clustered_plan, clustered_work_fraction, count_matrix_clustered,
    )
    from stormtpu.layout import BitMatrix
    from stormtpu.oracle import oracle_count_matrix

    rng = np.random.default_rng(17)
    n, m, B = 512, 65536, 4
    dense = np.zeros((n, m), dtype=np.uint8)
    for b in range(B):
        dense[b * (n // B):(b + 1) * (n // B),
              b * (m // B):(b + 1) * (m // B)] = (
            rng.random((n // B, m // B)) < 0.3).astype(np.uint8)
    bm = BitMatrix.from_dense(dense)
    assert bm.packed.any(axis=0).mean() > 0.99  # compaction no-op case
    wf = clustered_work_fraction(bm)
    assert wf is not None and wf < 0.5
    assert build_clustered_plan(bm) is not None
    got = count_matrix_clustered(bm, interpret=False)
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_clustered_stream_on_device(tpu_backend, tmp_path):
    """The streaming clustered stripes (per-stripe work lists + sparse
    tile files) on the real device: block-diagonal input crossing a
    superblock boundary — the off-diagonal stripe is summary-zero and
    must never reach the device; result exact vs oracle."""
    from stormtpu.layout import BitMatrix
    from stormtpu.oracle import oracle_count_matrix
    from stormtpu.stream import load_streamed_matrix, stream_count_matrix

    rng = np.random.default_rng(19)
    n, m, B = 512, 65536, 4
    dense = np.zeros((n, m), dtype=np.uint8)
    for b in range(B):
        dense[b * (n // B):(b + 1) * (n // B),
              b * (m // B):(b + 1) * (m // B)] = (
            rng.random((n // B, m // B)) < 0.3).astype(np.uint8)
    bm = BitMatrix.from_dense(dense)
    man = stream_count_matrix(
        bm, str(tmp_path), superblock_rows=256, kernel="clustered",
        interpret=False,
    )
    assert man["kernel"] == "clustered"
    assert man["n_super"] == 2
    got = load_streamed_matrix(str(tmp_path))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_operand_streaming_and_stream_queries_on_device(tpu_backend, tmp_path):
    """Operand-streaming stripe walk + streaming queries on the real
    device at one shared shape (one compile family): stripes exact vs
    oracle with only two superblock slices resident; top-k values and a
    count screen identical to the oracle."""
    from stormtpu.layout import BitMatrix
    from stormtpu.oracle import oracle_count_matrix
    from stormtpu.stream import load_streamed_matrix, stream_count_matrix
    from stormtpu.stream_query import stream_pairs_above, stream_topk_neighbors

    rng = np.random.default_rng(23)
    n, m = 700, 65536
    dense = (rng.random((n, m)) < 0.3).astype(np.uint8)
    bm = BitMatrix.from_dense(dense)
    c = oracle_count_matrix(bm.packed).astype(np.int64)

    man = stream_count_matrix(
        bm, str(tmp_path), superblock_rows=256, kernel="mxu",
        interpret=False, operand_streaming=True,
    )
    assert man["operand_streaming"] is True and man["n_super"] == 3
    got = load_streamed_matrix(str(tmp_path))
    np.testing.assert_array_equal(got, c)

    vals, idx = stream_topk_neighbors(
        bm, 5, superblock_rows=256, kernel="mxu", interpret=False,
    )
    cm = c.copy()
    np.fill_diagonal(cm, -1)
    want = np.maximum(-np.sort(-cm, axis=1)[:, :5], 0)
    np.testing.assert_array_equal(vals, want)
    for r in range(0, n, 131):
        assert c[r, idx[r, 0]] == vals[r, 0] and idx[r, 0] != r

    thr = int(np.percentile(cm[np.triu_indices(n, 1)], 99))
    ii, jj, v = stream_pairs_above(
        bm, thr, superblock_rows=256, kernel="mxu", interpret=False,
    )
    wi, wj = np.nonzero(np.triu(c, 1) >= thr)
    np.testing.assert_array_equal(ii, wi)
    np.testing.assert_array_equal(jj, wj)
    np.testing.assert_array_equal(v, c[wi, wj])


def test_cross_queries_on_device(tpu_backend):
    """Cross-set queries on the real device: the XLA int8 rectangle at
    small M and the Pallas MXU rectangle at large M, top-k and count
    screen both exact vs the oracle."""
    from stormtpu.cross import cross_pairs_above, cross_topk_neighbors
    from stormtpu.layout import BitMatrix
    from stormtpu.oracle import oracle_count_block

    rng = np.random.default_rng(29)
    for m in (4096, 262144):
        da = (rng.random((40, m)) < 0.3).astype(np.uint8)
        db = (rng.random((96, m)) < 0.3).astype(np.uint8)
        a, b = BitMatrix.from_dense(da), BitMatrix.from_dense(db)
        c = oracle_count_block(a.packed, b.packed).astype(np.int64)

        vals, idx = cross_topk_neighbors(a, b, 4)
        np.testing.assert_array_equal(
            vals, -np.sort(-c, axis=1)[:, :4], err_msg=f"m={m}"
        )
        for r in range(a.n):
            assert c[r, idx[r, 0]] == vals[r, 0]

        thr = int(np.percentile(c.ravel(), 98))
        ii, jj, vv = cross_pairs_above(a, b, max(thr, 1))
        wi, wj = np.nonzero(c >= max(thr, 1))
        np.testing.assert_array_equal(ii, wi, err_msg=f"m={m}")
        np.testing.assert_array_equal(jj, wj, err_msg=f"m={m}")
        np.testing.assert_array_equal(vv, c[wi, wj], err_msg=f"m={m}")


def test_stream_complete_screen_on_device(tpu_backend):
    """The four-grid pairwise-complete stripe screen (triangular diag
    grids + dm^T identity + per-pair-universe float32 screen) on the
    real device, exact vs the matrix form."""
    from stormtpu import similarity_matrix_complete
    from stormtpu.layout import BitMatrix
    from stormtpu.stream_query import stream_pairs_above_complete

    rng = np.random.default_rng(31)
    n, m = 700, 65536
    observed = rng.random((n, m)) > 0.1
    values = (rng.random((n, m)) < 0.3) & observed
    bm_d = BitMatrix.from_dense(values.astype(np.uint8))
    bm_m = BitMatrix.from_dense(observed.astype(np.uint8))
    full = similarity_matrix_complete(bm_d, bm_m, "r2")
    thr = float(np.percentile(full[np.triu_indices(n, 1)], 99.9))
    ii, jj, vv = stream_pairs_above_complete(
        bm_d, bm_m, thr, measure="r2", superblock_rows=256,
        kernel="mxu", interpret=False,
    )
    wi, wj = np.nonzero(np.triu(full, 1) >= thr)
    np.testing.assert_array_equal(ii, wi)
    np.testing.assert_array_equal(jj, wj)
    np.testing.assert_allclose(vv, full[wi, wj], rtol=0, atol=0)


def test_stats_aggregates_on_device(tpu_backend):
    """count_histogram's stripe bin-reduce (new traced path: masked
    per-bin VPU reductions over K2 tiles) + count_row_sums' identity,
    exact vs the host oracle at a multi-stripe shape."""
    from stormtpu import BitMatrix
    from stormtpu.oracle import oracle_count_matrix
    from stormtpu.stats import count_histogram, count_row_sums

    rng = np.random.default_rng(47)
    n, w = 700, 2048  # 65536 bits, 3 superblock stripes at sb=256
    packed = rng.integers(0, 2**32, (n, w), dtype=np.uint32)
    packed[n - 3 :] = 0  # empty-row tail
    bm = BitMatrix.from_packed(packed, m_bits=w * 32)

    man = count_histogram(bm, n_bins=16, superblock_rows=256,
                          interpret=False)
    c = oracle_count_matrix(bm.packed)
    iu = np.triu_indices(n, k=1)
    vals = c[iu].astype(np.int64)
    want = np.zeros(16, dtype=np.int64)
    np.add.at(want, np.minimum(vals // man["bin_width"], 15), 1)
    np.testing.assert_array_equal(man["hist"], want)
    assert man["pairs"] == n * (n - 1) // 2

    np.testing.assert_array_equal(
        count_row_sums(bm), c.astype(np.int64).sum(axis=1)
    )

    # r4 mesh twins on the 1-device mesh (new traced paths: per-plane
    # popcount partials, the square-ring histogram) + the dense-route
    # row sums (this shape's ~2.3e7 nnz exceeds the positions budget,
    # so the bit-plane walk runs — both routes must agree)
    from stormtpu.parallel import (
        distributed_count_histogram,
        distributed_count_row_sums,
        make_row_mesh,
    )

    mesh = make_row_mesh(1)
    np.testing.assert_array_equal(
        distributed_count_row_sums(bm, mesh=mesh),
        c.astype(np.int64).sum(axis=1),
    )
    man_d = distributed_count_histogram(bm, n_bins=16, mesh=mesh,
                                        block_rows=256)
    want_d = np.zeros(16, dtype=np.int64)
    np.add.at(want_d, np.minimum(vals // man_d["bin_width"], 15), 1)
    np.testing.assert_array_equal(man_d["hist"], want_d)

    # the r4 stripe route (per-stripe psum'd bin partials) on the real
    # chip, forced so it runs even on this dense panel
    man_s = distributed_count_histogram(bm, n_bins=16, mesh=mesh,
                                        method="stripes",
                                        superblock_rows=256)
    assert man_s["kernel"] == "stripes"
    np.testing.assert_array_equal(man_s["hist"], want_d)

    # r5 density-adaptive single-chip routes (new traced path: the
    # two-slice pair histogram with global-offset scalars)
    man_os = count_histogram(bm, n_bins=16, superblock_rows=256,
                             method="streamed", interpret=False)
    assert man_os["operand_streaming"] is True
    np.testing.assert_array_equal(man_os["hist"], want)

    from stormtpu.native import HAVE_NATIVE

    if HAVE_NATIVE:
        # K4 COO binning with the live cost model on an ultra-sparse
        # panel — expectation from per-column co-occurrence (no oracle
        # matrix at this N)
        from collections import defaultdict

        ns, ms = 4000, 65536
        rows = rng.integers(0, ns, 3000)
        cols = rng.integers(0, ms, 3000)
        bms = BitMatrix.from_positions(rows, cols, ns, ms)
        man_k4 = count_histogram(bms, n_bins=16, bin_width=1,
                                 superblock_rows=256, method="sparse",
                                 interpret=False)
        pair: dict = defaultdict(int)
        by_col = defaultdict(list)
        for r_, c_ in set(zip(rows.tolist(), cols.tolist())):
            by_col[c_].append(r_)
        for c_, rs_ in by_col.items():
            rs_.sort()
            for x in range(len(rs_)):
                for y in range(x + 1, len(rs_)):
                    pair[(rs_[x], rs_[y])] += 1
        want_k4 = np.zeros(16, dtype=np.int64)
        for v in pair.values():
            want_k4[min(v, 15)] += 1
        want_k4[0] = ns * (ns - 1) // 2 - want_k4[1:].sum()
        np.testing.assert_array_equal(man_k4["hist"], want_k4)

    # K5 work-list binning on a block-clustered panel
    nb_, mb_ = 512, 65536
    dense_c = np.zeros((nb_, mb_), dtype=np.uint8)
    for b in range(4):
        r0, r1 = b * 128, (b + 1) * 128
        c0, c1 = b * 16384, (b + 1) * 16384
        dense_c[r0:r1, c0:c1] = rng.random((128, 16384)) < 0.3
    bmc = BitMatrix.from_dense(dense_c)
    man_k5 = count_histogram(bmc, n_bins=16, superblock_rows=256,
                             method="clustered", interpret=False)
    assert man_k5["kernel"] == "clustered"
    cc_ = oracle_count_matrix(bmc.packed)
    iuc = np.triu_indices(nb_, k=1)
    vc = cc_[iuc].astype(np.int64)
    want_k5 = np.zeros(16, dtype=np.int64)
    np.add.at(want_k5, np.minimum(vc // man_k5["bin_width"], 15), 1)
    np.testing.assert_array_equal(man_k5["hist"], want_k5)
