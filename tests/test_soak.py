"""Opt-in randomized integration soak (STORMTPU_SLOW_TESTS=1): one
random panel per iteration driven through EVERY public surface — counts
(all strategies), set-ops, similarities (plain + pairwise-complete),
queries (resident, streaming, cross), and the 8-device distributed
forms — each cross-checked against the NumPy oracle. The per-route unit
tests pin behaviors; this pins their AGREEMENT on shapes none of them
chose."""

import os

import numpy as np
import pytest

from conftest import random_bitmatrix
from stormtpu.oracle import oracle_count_block, oracle_count_matrix

pytestmark = pytest.mark.skipif(
    not os.environ.get("STORMTPU_SLOW_TESTS"),
    reason="~minutes of randomized sweeps; set STORMTPU_SLOW_TESTS=1",
)


def test_public_api_agreement_soak():
    from stormtpu import (
        cross_pairs_above,
        cross_topk_neighbors,
        intersect_count_matrix,
        pairs_above,
        pairs_above_complete,
        pairwise_cardinality,
        similarity_matrix,
        similarity_matrix_complete,
        topk_neighbors,
    )
    from stormtpu.dispatch import STRATEGIES
    from stormtpu.layout import BitMatrix
    from stormtpu.parallel import (
        distributed_count_matrix,
        distributed_pairs_above,
        distributed_topk_neighbors,
        make_grid_mesh,
        make_row_mesh,
    )
    from stormtpu.setops import derive_similarity
    from stormtpu.stream_query import (
        stream_pairs_above,
        stream_topk_neighbors,
    )

    iters = int(os.environ.get("STORMTPU_SOAK_ITERS", "4"))
    rng = np.random.default_rng(20260818)
    for it in range(iters):
        n = int(rng.integers(24, 120))
        m = int(rng.integers(200, 4000))
        density = float(10 ** rng.uniform(-2.2, -0.3))
        dense = (rng.random((n, m)) < density).astype(np.uint8)
        dense[n // 4] = 0                      # empty row
        dense[-1] = dense[0]                   # duplicate row
        bm = BitMatrix.from_dense(dense)
        c = oracle_count_matrix(bm.packed).astype(np.int64)
        ctx = f"iter {it} n={n} m={m} d={density:.4f}"

        # counts: every strategy agrees with the oracle
        for strat in STRATEGIES:
            got = intersect_count_matrix(bm, strategy=strat)
            assert np.array_equal(got, c), f"{ctx} strategy={strat}"

        # set-ops + similarities
        u = pairwise_cardinality(bm, "union")
        assert np.array_equal(
            u, bm.row_nnz[:, None] + bm.row_nnz[None, :] - c), ctx
        jac = similarity_matrix(bm, "jaccard")
        want_j = derive_similarity(c, bm.row_nnz[:, None],
                                   bm.row_nnz[None, :], m, "jaccard")
        np.testing.assert_allclose(jac, want_j, rtol=0, atol=0,
                                   err_msg=ctx)

        # queries, resident + streaming
        k = int(rng.integers(1, min(8, n - 1) + 1))
        cm = c.copy()
        np.fill_diagonal(cm, -1)
        want_topk = np.maximum(-np.sort(-cm, axis=1)[:, :k], 0)
        vals, _ = topk_neighbors(bm, k)
        assert np.array_equal(vals, want_topk), f"{ctx} topk"
        sv, _ = stream_topk_neighbors(bm, k, superblock_rows=32,
                                      interpret=True)
        assert np.array_equal(sv, want_topk), f"{ctx} stream topk"

        # measure ranking: single-chip, streaming, and distributed routes
        # all return the identical exact float64 value set (indices are
        # tie-order-dependent; these measures are >= 0 so the streaming
        # no-partner 0.0 convention coincides with true zero scores)
        meas = str(rng.choice(["jaccard", "cosine", "r2"]))
        simm = derive_similarity(c, bm.row_nnz[:, None],
                                 bm.row_nnz[None, :], m, meas)
        np.fill_diagonal(simm, -np.inf)
        want_mv = np.maximum(-np.sort(-simm, axis=1)[:, :k], 0.0)
        mv, _ = topk_neighbors(bm, k, measure=meas)
        assert np.array_equal(mv, want_mv), f"{ctx} measure topk {meas}"
        smv, _ = stream_topk_neighbors(bm, k, superblock_rows=32,
                                       interpret=True, measure=meas)
        assert np.array_equal(smv, want_mv), f"{ctx} stream measure {meas}"
        dmv, _ = distributed_topk_neighbors(bm, k, mesh=make_row_mesh(8),
                                            block_rows=8, measure=meas)
        assert np.array_equal(dmv, want_mv), f"{ctx} dist measure {meas}"

        thr = max(1, int(np.percentile(c[np.triu_indices(n, 1)], 90)))
        wi, wj = np.nonzero(np.triu(c, 1) >= thr)
        for fn, tag in ((pairs_above, "screen"),
                        (lambda b, t: stream_pairs_above(
                            b, t, superblock_rows=32, interpret=True),
                         "stream screen")):
            ii, jj, vv = fn(bm, thr)
            assert np.array_equal(ii, wi), f"{ctx} {tag}"
            assert np.array_equal(jj, wj), f"{ctx} {tag}"
            assert np.array_equal(vv, c[wi, wj]), f"{ctx} {tag}"

        # pairwise-complete forms
        observed = (rng.random((n, m)) > 0.15) | dense.astype(bool)
        bm_m = BitMatrix.from_dense(observed.astype(np.uint8))
        r2c = similarity_matrix_complete(bm, bm_m, "r2")
        ci, cj, cv = pairs_above_complete(bm, bm_m, 0.4, measure="r2")
        ewi, ewj = np.nonzero(np.triu(r2c, 1) >= 0.4)
        assert np.array_equal(ci, ewi) and np.array_equal(cj, ewj), \
            f"{ctx} complete screen"

        # cross queries vs a second panel
        nb = int(rng.integers(16, 80))
        db = (rng.random((nb, m)) < density).astype(np.uint8)
        bq = BitMatrix.from_dense(db)
        cx = oracle_count_block(bm.packed, bq.packed).astype(np.int64)
        kx = int(rng.integers(1, min(5, nb) + 1))
        xv, xi = cross_topk_neighbors(bm, bq, kx)
        assert np.array_equal(xv, -np.sort(-cx, axis=1)[:, :kx]), \
            f"{ctx} cross topk"
        cxs = derive_similarity(cx, bm.row_nnz[:, None], bq.row_nnz[None, :],
                                m, meas)
        cmv, _ = cross_topk_neighbors(bm, bq, kx, measure=meas)
        assert np.array_equal(cmv, -np.sort(-cxs, axis=1)[:, :kx]), \
            f"{ctx} cross measure {meas}"
        thx = max(1, int(cx.max()) - 1)
        xii, xjj, xvv = cross_pairs_above(bm, bq, thx)
        xwi, xwj = np.nonzero(cx >= thx)
        assert np.array_equal(xii, xwi) and np.array_equal(xvv, cx[xwi, xwj]), \
            f"{ctx} cross screen"

        # distributed forms, 1-D and 2-D meshes
        for mesh in (make_row_mesh(8), make_grid_mesh(4, 2)):
            got = distributed_count_matrix(bm.packed, mesh=mesh)
            assert np.array_equal(got, c), f"{ctx} dist counts {mesh.shape}"
            dv, _ = distributed_topk_neighbors(bm, k, mesh=mesh,
                                               block_rows=8)
            assert np.array_equal(dv, want_topk), f"{ctx} dist topk"
            dii, djj, dvv = distributed_pairs_above(bm, thr, mesh=mesh,
                                                    block_rows=8)
            assert np.array_equal(dii, wi) and np.array_equal(dvv, c[wi, wj]), \
                f"{ctx} dist screen"

        # aggregate statistics (r4): single-chip and mesh twins agree
        # with the oracle marginals/distribution
        from stormtpu.parallel import (
            distributed_count_histogram,
            distributed_count_row_sums,
        )
        from stormtpu.stats import count_histogram, count_row_sums

        want_rs = c.sum(axis=1)
        assert np.array_equal(count_row_sums(bm), want_rs), f"{ctx} row sums"
        assert np.array_equal(
            count_row_sums(bm, positions_budget_bytes=0), want_rs
        ), f"{ctx} row sums (bit-plane route)"
        assert np.array_equal(
            distributed_count_row_sums(bm, mesh=make_row_mesh(8)), want_rs
        ), f"{ctx} dist row sums"
        nb_bins = int(rng.integers(2, 24))
        man_h = count_histogram(bm, n_bins=nb_bins)
        tri_c = c[np.triu_indices(n, 1)]
        want_h = np.zeros(nb_bins, dtype=np.int64)
        np.add.at(want_h, np.minimum(tri_c // man_h["bin_width"],
                                     nb_bins - 1), 1)
        assert np.array_equal(man_h["hist"], want_h), f"{ctx} hist"
        man_dh = distributed_count_histogram(
            bm, n_bins=nb_bins, mesh=make_grid_mesh(2, 4), block_rows=32)
        assert np.array_equal(man_dh["hist"], want_h), f"{ctx} dist hist"

        # r5: the density-adaptive histogram routes agree on every panel
        from stormtpu.native import HAVE_NATIVE

        for route in ["streamed"] + (["sparse"] if HAVE_NATIVE else []):
            man_r = count_histogram(bm, n_bins=nb_bins, method=route)
            assert np.array_equal(man_r["hist"], want_h), \
                f"{ctx} hist route {route}"

        # r5: panel growth — the extend wrappers reproduce from-scratch
        import tempfile

        from stormtpu.stream_query import (
            extend_stream_pairs_above,
            extend_stream_topk_neighbors,
        )

        grow = int(rng.integers(4, 40))
        dense_g = np.concatenate(
            [dense, (rng.random((grow, m)) < density).astype(np.uint8)])
        bm_g = BitMatrix.from_dense(dense_g)
        cg = oracle_count_matrix(bm_g.packed).astype(np.int64)
        with tempfile.TemporaryDirectory() as td:
            sd = os.path.join(td, "scr")
            stream_pairs_above(bm, thr, out_dir=sd)
            gii, gjj, gvv = extend_stream_pairs_above(bm_g, sd)
            wgi, wgj = np.nonzero(np.triu(cg, 1) >= thr)
            assert np.array_equal(gii, wgi) and np.array_equal(
                gvv, cg[wgi, wgj]), f"{ctx} screen extend"
            tkd = os.path.join(td, "tk")
            stream_topk_neighbors(bm, k, out_dir=tkd)
            gv2, _ = extend_stream_topk_neighbors(bm_g, tkd)
            cgd = cg.copy()
            np.fill_diagonal(cgd, -1)
            want_gk = np.maximum(-np.sort(-cgd, axis=1)[:, :k], 0)
            assert np.array_equal(gv2, want_gk), f"{ctx} topk extend"
