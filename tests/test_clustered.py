"""K5 block-clustered work-list path (SURVEY.md §1 regime 3 / §3 C8):
summary-AND skip exactness + dispatch statistic. The motivating input is
block-diagonal structure (LD-block genotype panels) where every word
column is occupied by SOME row, so the global empty-column compaction is
a no-op and only the per-tile-pair skip can win."""

import numpy as np
import pytest

from conftest import DENSITY_SWEEP, random_bitmatrix
from stormtpu.config import EngineConfig
from stormtpu.kernels.clustered import (
    build_clustered_plan,
    clustered_work_fraction,
    count_matrix_clustered,
)
from stormtpu.layout import BitMatrix
from stormtpu.oracle import oracle_count_matrix

# Small tiles so CPU tests cross tile boundaries cheaply; k2_tile_shape
# forces wk=128 words per K-group when W > k2_tile_words.
CFG = EngineConfig(k2_tile_rows=32, k2_tile_words=128)


def block_diagonal_bitmatrix(n, m_bits, n_blocks, density, seed=0):
    """B row blocks, each occupying only its own M/B bit stripe, dense
    enough inside the stripe that every word column is globally occupied
    (the global compaction no-op case)."""
    rng = np.random.default_rng(seed)
    dense = np.zeros((n, m_bits), dtype=np.uint8)
    rows_per = n // n_blocks
    bits_per = m_bits // n_blocks
    for b in range(n_blocks):
        r0, r1 = b * rows_per, (b + 1) * rows_per if b < n_blocks - 1 else n
        c0, c1 = b * bits_per, (b + 1) * bits_per if b < n_blocks - 1 else m_bits
        dense[r0:r1, c0:c1] = (
            rng.random((r1 - r0, c1 - c0)) < density
        ).astype(np.uint8)
    return BitMatrix.from_dense(dense)


def test_clustered_exact_block_diagonal():
    bm = block_diagonal_bitmatrix(128, 16384, 4, 0.3, seed=1)
    # global occupancy is ~100%: the old compaction path can't help
    assert bm.packed.any(axis=0).mean() > 0.99
    got = count_matrix_clustered(bm, config=CFG)
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


@pytest.mark.parametrize("density", DENSITY_SWEEP)
def test_clustered_exact_density_sweep(density):
    bm = random_bitmatrix(96, 16000, density, seed=2)  # ragged N, M
    got = count_matrix_clustered(bm, config=CFG)
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_clustered_exact_ragged_and_small():
    for n, m in ((1, 8192), (7, 9000), (33, 12345)):
        bm = random_bitmatrix(n, m, 0.2, seed=n)
        got = count_matrix_clustered(bm, config=CFG)
        np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_clustered_empty_and_single_group():
    # all-empty matrix: no work items → zeros
    bm = BitMatrix.from_dense(np.zeros((40, 16384), dtype=np.uint8))
    got = count_matrix_clustered(bm, config=CFG)
    np.testing.assert_array_equal(got, np.zeros((40, 40), np.int32))
    # single K-group (W <= wk): plan is None, falls back to the K2 walk
    bm2 = random_bitmatrix(40, 2048, 0.3, seed=5)
    assert build_clustered_plan(bm2, CFG) is None
    got2 = count_matrix_clustered(bm2, config=CFG)
    np.testing.assert_array_equal(got2, oracle_count_matrix(bm2.packed))


def test_clustered_strategy_via_api():
    from stormtpu import intersect_count_matrix

    bm = block_diagonal_bitmatrix(80, 12800, 4, 0.4, seed=6)
    got = intersect_count_matrix(bm, strategy="clustered")
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_work_fraction_statistic():
    # block-diagonal with B=4: only same-block tile pairs co-occupy →
    # work fraction far below 1 (≈ 1/B at aligned geometry)
    bm = block_diagonal_bitmatrix(128, 16384, 4, 0.3, seed=7)
    wf = clustered_work_fraction(bm, CFG)
    assert wf is not None and wf < 0.5, wf
    # a uniformly dense matrix co-occupies everything
    bm2 = random_bitmatrix(128, 16384, 0.5, seed=8)
    wf2 = clustered_work_fraction(bm2, CFG)
    assert wf2 == 1.0
    # plan work must match the statistic
    plan = build_clustered_plan(bm, CFG)
    t_tri = (plan.nb * (plan.nb + 1)) // 2
    assert plan.n_work == round(wf * t_tri * plan.ng)


def test_dispatch_chooses_clustered():
    from stormtpu.dispatch import choose_strategy

    bm = block_diagonal_bitmatrix(128, 16384, 4, 0.3, seed=9)
    s = choose_strategy(bm.n, bm.m_bits, bm.density, CFG, bm=bm)
    assert s == "clustered"
    # without the matrix in hand the statistic is unavailable
    s2 = choose_strategy(bm.n, bm.m_bits, bm.density, CFG)
    assert s2 != "clustered"
    # uniform density at the same shape must NOT choose clustered
    bm2 = random_bitmatrix(128, 16384, 0.3, seed=10)
    s3 = choose_strategy(bm2.n, bm2.m_bits, bm2.density, CFG, bm=bm2)
    assert s3 != "clustered"


def test_dispatch_auto_end_to_end():
    from stormtpu import intersect_count_matrix

    bm = block_diagonal_bitmatrix(96, 12800, 4, 0.35, seed=11)
    got = intersect_count_matrix(bm, strategy="auto", config=CFG)
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_clustered_matches_all_other_strategies():
    # dispatch invariance (SURVEY.md §5.3) extended to K5
    from stormtpu import intersect_count_matrix

    bm = block_diagonal_bitmatrix(64, 8192, 2, 0.25, seed=12)
    want = intersect_count_matrix(bm, strategy="popcount", config=CFG)
    got = intersect_count_matrix(bm, strategy="clustered", config=CFG)
    np.testing.assert_array_equal(got, want)


def test_block_summary_contract():
    # the C8 summary itself: [i, b] == 1 iff row i has a bit in block b
    bm = random_bitmatrix(17, 5000, 0.01, seed=13)
    s = bm.block_summary(block_bits=1024)
    dense = bm.to_dense()
    nb = -(-5000 // 1024)
    want = np.zeros((17, nb), dtype=np.uint8)
    for b in range(nb):
        want[:, b] = dense[:, b * 1024 : (b + 1) * 1024].any(axis=1)
    np.testing.assert_array_equal(s, want)


def test_clustered_screen_and_topk_routes():
    """Screens and top-k on block-clustered matrices take the K5
    count-then-filter route (auto dispatch with the matrix in hand) and
    stay exact — including r2, which scores zero-intersection
    (anti-correlated) pairs and therefore needs the full matrix."""
    import stormtpu.config as config_mod
    from stormtpu import pairs_above, topk_neighbors
    from stormtpu.dispatch import choose_strategy

    bm = block_diagonal_bitmatrix(128, 16384, 4, 0.4, seed=21)
    old = config_mod._DEFAULT
    config_mod._DEFAULT = CFG  # query paths read default_config()
    try:
        assert choose_strategy(bm.n, bm.m_bits, bm.density, CFG, bm=bm) \
            == "clustered"
        want = oracle_count_matrix(bm.packed).astype(np.int64)

        vals, idx = topk_neighbors(bm, 5)
        w = want.copy()
        np.fill_diagonal(w, -1)
        np.testing.assert_array_equal(vals, np.sort(w, 1)[:, ::-1][:, :5])
        np.testing.assert_array_equal(
            want[np.arange(bm.n)[:, None], idx], vals)

        tri = want[np.triu_indices(bm.n, 1)]
        thr = max(1, int(np.percentile(tri[tri > 0], 50)))
        ii, jj, vv = pairs_above(bm, thr)
        ei, ej = np.nonzero(np.triu(want, 1) >= thr)
        assert ei.size > 0
        np.testing.assert_array_equal(ii, ei.astype(np.int32))
        np.testing.assert_array_equal(jj, ej.astype(np.int32))
        np.testing.assert_array_equal(vv.astype(np.int64), want[ei, ej])

        # r2 screen: anti-correlated cross-block pairs (zero counts) can
        # exceed the threshold — the full-matrix filter must keep them
        from stormtpu.setops import derive_similarity

        r2 = derive_similarity(
            want, bm.row_nnz[:, None], bm.row_nnz[None, :], bm.m_bits, "r2")
        thr2 = float(np.percentile(r2[np.triu_indices(bm.n, 1)], 98))
        if 0 < thr2 <= 1:
            ii, jj, vv = pairs_above(bm, thr2, measure="r2")
            ei, ej = np.nonzero(np.triu(r2 >= thr2, 1))
            np.testing.assert_array_equal(ii, ei.astype(np.int32))
            np.testing.assert_array_equal(jj, ej.astype(np.int32))
            np.testing.assert_array_equal(vv, r2[ei, ej])
        # the skip trap itself: a LOW r2 threshold must keep
        # zero-intersection (anti-correlated) cross-block pairs — the
        # full-matrix filter sees them even though K5 never computed
        # their tiles
        thr3 = 0.005
        ii, jj, vv = pairs_above(bm, thr3, measure="r2")
        ei, ej = np.nonzero(np.triu(r2 >= thr3, 1))
        np.testing.assert_array_equal(ii, ei.astype(np.int32))
        assert (want[ei, ej] == 0).any(), "no zero-intersection pair kept"
    finally:
        config_mod._DEFAULT = old


def test_distributed_bits_axis_clustered(mesh8=None):
    """Bits-axis K5 (per-device work lists + psum of tile partials) must
    be exact on the 8-device mesh, and must actually be the route taken
    (the plan exists with a low work fraction)."""
    import jax

    from stormtpu.kernels.clustered import build_sharded_clustered_plan
    from stormtpu.parallel import distributed_count_matrix, make_row_mesh

    assert len(jax.devices()) >= 8
    mesh = make_row_mesh(8)
    # 8 matrix blocks, each exactly one 128-word K-group per device
    n, m, B = 64, 8 * 128 * 32, 8
    bm = block_diagonal_bitmatrix(n, m, B, 0.3, seed=31)
    splan = build_sharded_clustered_plan(bm, 8, CFG)
    assert splan is not None and splan.work_fraction < 0.5
    got = distributed_count_matrix(
        bm.packed, mesh=mesh, shard_axis="bits", config=CFG
    )
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_distributed_bits_axis_clustered_ragged():
    import jax

    from stormtpu.parallel import distributed_count_matrix, make_row_mesh

    assert len(jax.devices()) >= 8
    mesh = make_row_mesh(8)
    # ragged N and W (tail group partially filled), clustered enough
    bm = block_diagonal_bitmatrix(53, 8 * 128 * 32 + 777, 4, 0.25, seed=32)
    got = distributed_count_matrix(
        bm.packed, mesh=mesh, shard_axis="bits", config=CFG
    )
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_distributed_bits_axis_dense_unaffected():
    # uniform input must still take the dense triangular K-shard path
    import jax

    from stormtpu.kernels.clustered import build_sharded_clustered_plan
    from stormtpu.parallel import distributed_count_matrix, make_row_mesh

    assert len(jax.devices()) >= 8
    bm = random_bitmatrix(40, 8 * 128 * 32 + 50, 0.3, seed=33)
    splan = build_sharded_clustered_plan(bm, 8, CFG)
    assert splan is None or splan.work_fraction >= 0.5
    got = distributed_count_matrix(
        bm.packed, mesh=make_row_mesh(8), shard_axis="bits", config=CFG
    )
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))
