"""Distributed driver tests on the 8-device forced-CPU mesh
(SURVEY.md §5 item 4): sharded == single-device == oracle, every shard
pair computed exactly once, N not divisible by shard count."""

import jax
import numpy as np
import pytest

from conftest import random_bitmatrix
from stormtpu.oracle import oracle_count_matrix
from stormtpu.parallel import distributed_count_matrix, make_row_mesh


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 host devices"
    return make_row_mesh(8)


def test_distributed_exact_vs_oracle(mesh8):
    bm = random_bitmatrix(64, 2048, 0.3, seed=41)
    got = distributed_count_matrix(bm.packed, mesh=mesh8)
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_distributed_ragged_n(mesh8):
    # N = 53 not divisible by 8 shards (zero-row padding must be invisible)
    bm = random_bitmatrix(53, 1024, 0.2, seed=42)
    got = distributed_count_matrix(bm.packed, mesh=mesh8)
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_distributed_matches_single_device(mesh8):
    bm = random_bitmatrix(40, 512, 0.5, seed=43)
    got8 = distributed_count_matrix(bm.packed, mesh=mesh8)
    got1 = distributed_count_matrix(bm.packed, mesh=make_row_mesh(1))
    np.testing.assert_array_equal(got8, got1)


def test_each_block_pair_computed_once(mesh8):
    # Structural dedup check: a counting block_fn must be invoked exactly
    # R times per device (R steps), covering all R^2 ordered shard pairs —
    # verified by exactness of a sum-sensitive input (identity-ish rows).
    n = 32
    dense = np.eye(n, 64, dtype=np.uint8)  # row i has single bit i
    from stormtpu.layout import BitMatrix

    bm = BitMatrix.from_dense(dense)
    got = distributed_count_matrix(bm.packed, mesh=mesh8)
    np.testing.assert_array_equal(got, np.eye(n, dtype=np.int32))


def test_distributed_sparse_and_dense_inputs(mesh8):
    for density, seed in ((0.001, 44), (0.9, 45)):
        bm = random_bitmatrix(24, 4096, density, seed=seed)
        got = distributed_count_matrix(bm.packed, mesh=mesh8)
        np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_kshard_bits_axis_exact(mesh8):
    # word-axis sharding + psum of exact partials (the K-dim variant)
    bm = random_bitmatrix(30, 2048, 0.3, seed=46)
    got = distributed_count_matrix(bm.packed, mesh=mesh8, shard_axis="bits")
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_kshard_ragged_w(mesh8):
    # W=19 words not divisible by 8 shards (zero-word padding invisible)
    bm = random_bitmatrix(16, 19 * 32, 0.5, seed=47)
    assert bm.packed.shape[1] == 19
    got = distributed_count_matrix(bm.packed, mesh=mesh8, shard_axis="bits")
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_bad_shard_axis(mesh8):
    import pytest as _pytest

    bm = random_bitmatrix(8, 256, 0.5, seed=48)
    with _pytest.raises(ValueError):
        distributed_count_matrix(bm.packed, mesh=mesh8, shard_axis="cols")


def test_distributed_stream_exact(mesh8, tmp_path):
    from stormtpu.layout import BitMatrix
    from stormtpu.parallel import distributed_stream_count_matrix
    from stormtpu.stream import load_streamed_matrix

    bm = random_bitmatrix(100, 2048, 0.2, seed=49)
    man = distributed_stream_count_matrix(
        bm, str(tmp_path), superblock_rows=64, mesh=mesh8
    )
    assert man["n_super"] == 2  # 100 -> 128 padded / 64
    got = load_streamed_matrix(str(tmp_path))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_distributed_stream_zero_stripe_skip(mesh8, tmp_path):
    """Block-diagonal input across the superblock boundary: the
    off-diagonal stripe is summary-zero — written as an empty
    sparse-tile record without touching the mesh — and the result
    stays exact."""
    from test_clustered import block_diagonal_bitmatrix

    from stormtpu.parallel import distributed_stream_count_matrix
    from stormtpu.stream import load_streamed_matrix, stripe_path

    bm = block_diagonal_bitmatrix(128, 16384, 2, 0.3, seed=65)
    man = distributed_stream_count_matrix(
        bm, str(tmp_path), superblock_rows=64, mesh=mesh8
    )
    assert man["n_super"] == 2
    with np.load(stripe_path(str(tmp_path), 0, 1)) as z:
        assert "tiles" in z.files and z["tiles"].size == 0
    got = load_streamed_matrix(str(tmp_path))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_distributed_stream_resume(mesh8, tmp_path):
    from stormtpu.parallel import distributed_stream_count_matrix

    bm = random_bitmatrix(80, 1024, 0.3, seed=50)
    calls = []
    distributed_stream_count_matrix(
        bm, str(tmp_path), superblock_rows=64, mesh=mesh8,
        progress=lambda d, t: calls.append(d),
    )
    first = len(calls)
    calls.clear()
    distributed_stream_count_matrix(
        bm, str(tmp_path), superblock_rows=64, mesh=mesh8,
        progress=lambda d, t: calls.append(d),
    )
    assert first > 0 and calls == []


def test_distributed_large_w_pallas_blockfn(mesh8):
    # W*32 > 2^17 routes the ring's block_fn through the Pallas rectangle
    bm = random_bitmatrix(24, (1 << 17) + 96, 0.002, seed=51)
    got = distributed_count_matrix(bm.packed, mesh=mesh8)
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_measure_scaling_structural():
    """Scaling harness runs at 1/2/4 forced devices, verifies exactness,
    and reports monotone bookkeeping (efficiency defined, positive)."""
    from stormtpu.parallel.scaling import measure_scaling

    out = measure_scaling(n=128, m_bits=2048, device_counts=(1, 2, 4),
                          reps=1, log=lambda *a: None)
    assert out["platform"] == "cpu"
    assert set(out["results"]) == {1, 2, 4}
    for r, d in out["results"].items():
        assert d["seconds"] > 0 and d["efficiency"] > 0


@pytest.mark.parametrize("r", (1, 2, 3, 4, 5, 7, 8))
def test_triangular_ring_every_device_count(r):
    """The triangular ring's odd/even step census differs — verify
    exactness at every mesh size (incl. N not divisible by R)."""
    bm = random_bitmatrix(30, 2048, 0.3, seed=50 + r)
    got = distributed_count_matrix(bm.packed, mesh=make_row_mesh(r))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_kshard_triangular_large_w(mesh8):
    """W ≥ R·128 words routes the bits-shard variant through the
    triangular K2 tile path (psum of tile partials + host mirror)."""
    bm = random_bitmatrix(40, 8 * 128 * 32 + 77, 0.2, seed=71)
    got = distributed_count_matrix(bm.packed, mesh=mesh8, shard_axis="bits")
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


# ---- distributed reduced queries (parallel/query.py) --------------------


def test_distributed_topk_matches_single_chip(mesh8):
    from stormtpu import pair_counts, topk_neighbors
    from stormtpu.parallel import distributed_topk_neighbors

    bm = random_bitmatrix(96, 2048, 0.2, seed=51)
    v1, i1 = topk_neighbors(bm, k=5)
    vd, idd = distributed_topk_neighbors(bm, 5, mesh=make_row_mesh(8),
                                         block_rows=8)
    # values are uniquely determined; tie order among equal counts is not
    np.testing.assert_array_equal(vd, v1)
    # every reported (row, idx) must actually realize its reported count
    rows = np.repeat(np.arange(bm.n, dtype=np.int32), 5)
    got = pair_counts(bm, rows, idd.ravel().astype(np.int32))
    np.testing.assert_array_equal(got.reshape(bm.n, 5), vd)


def test_distributed_topk_ragged_and_k_over_nloc(mesh8):
    from stormtpu import topk_neighbors
    from stormtpu.parallel import distributed_topk_neighbors

    # N=21 over 8 shards with block_rows=4 → n_loc=4 < k=7
    bm = random_bitmatrix(21, 512, 0.4, seed=52)
    v1, _ = topk_neighbors(bm, k=7)
    vd, _ = distributed_topk_neighbors(bm, 7, mesh=make_row_mesh(8),
                                       block_rows=4)
    np.testing.assert_array_equal(vd, v1)


@pytest.mark.parametrize("measure,threshold", [
    ("count", 40), ("jaccard", 0.15), ("r2", 0.005),
])
def test_distributed_pairs_above_matches_single_chip(mesh8, measure, threshold):
    from stormtpu import pairs_above
    from stormtpu.parallel import distributed_pairs_above

    bm = random_bitmatrix(90, 1024, 0.25, seed=53)
    ii1, jj1, vv1 = pairs_above(bm, threshold, measure=measure)
    iid, jjd, vvd = distributed_pairs_above(
        bm, threshold, measure=measure, mesh=make_row_mesh(8), block_rows=8
    )
    assert ii1.size > 0  # non-degenerate screen
    np.testing.assert_array_equal(iid, ii1)
    np.testing.assert_array_equal(jjd, jj1)
    np.testing.assert_array_equal(vvd, vv1)


def test_distributed_pairs_above_empty_and_ragged(mesh8):
    from stormtpu import pairs_above
    from stormtpu.parallel import distributed_pairs_above

    bm = random_bitmatrix(19, 512, 0.05, seed=54)
    ii, jj, vv = distributed_pairs_above(
        bm, 10**6, mesh=make_row_mesh(8), block_rows=4
    )
    assert ii.size == jj.size == vv.size == 0
    ii1, jj1, vv1 = pairs_above(bm, 5)
    iid, jjd, vvd = distributed_pairs_above(
        bm, 5, mesh=make_row_mesh(8), block_rows=4
    )
    np.testing.assert_array_equal(iid, ii1)
    np.testing.assert_array_equal(jjd, jj1)
    np.testing.assert_array_equal(vvd, vv1)


def test_distributed_column_counts(mesh8):
    from stormtpu import column_counts
    from stormtpu.parallel import distributed_column_counts

    # ragged N (19 over 8 shards) and ragged M (not a chunk multiple)
    bm = random_bitmatrix(19, 1000, 0.3, seed=55)
    got = distributed_column_counts(bm, mesh=mesh8, chunk_words=8)
    np.testing.assert_array_equal(got, column_counts(bm))
    from stormtpu.layout import unpack_bits

    dense = unpack_bits(bm.packed, bm.m_bits)
    np.testing.assert_array_equal(got, dense.sum(axis=0).astype(np.int32))


@pytest.mark.parametrize("r", (1, 2, 3, 5, 8))
def test_distributed_screen_every_device_count(r):
    """The screen's triangular-ring mirror census (diagonal / mirror /
    even-R mutual steps) must be exact at every mesh size."""
    from stormtpu import pairs_above
    from stormtpu.parallel import distributed_pairs_above

    bm = random_bitmatrix(41, 1024, 0.3, seed=60 + r)
    ii1, jj1, vv1 = pairs_above(bm, 80)
    iid, jjd, vvd = distributed_pairs_above(
        bm, 80, mesh=make_row_mesh(r), block_rows=4
    )
    assert ii1.size > 0
    np.testing.assert_array_equal(iid, ii1)
    np.testing.assert_array_equal(jjd, jj1)
    np.testing.assert_array_equal(vvd, vv1)


@pytest.mark.parametrize("r", (3, 5, 7))
def test_distributed_topk_odd_meshes(r):
    from stormtpu import topk_neighbors
    from stormtpu.parallel import distributed_topk_neighbors

    bm = random_bitmatrix(33, 512, 0.35, seed=70 + r)
    v1, _ = topk_neighbors(bm, k=3)
    vd, _ = distributed_topk_neighbors(bm, 3, mesh=make_row_mesh(r),
                                       block_rows=4)
    np.testing.assert_array_equal(vd, v1)


def test_distributed_setops_match_single_chip(mesh8):
    from stormtpu import pairwise_cardinality, similarity_matrix
    from stormtpu.parallel import (
        distributed_pairwise_cardinality,
        distributed_similarity_matrix,
    )

    bm = random_bitmatrix(45, 1024, 0.3, seed=81)
    for op in ("union", "xor", "andnot", "nand"):
        got = distributed_pairwise_cardinality(bm, op, mesh=mesh8)
        np.testing.assert_array_equal(got, pairwise_cardinality(bm, op))
    for measure in ("jaccard", "cosine", "r2"):
        got = distributed_similarity_matrix(bm, measure, mesh=mesh8)
        np.testing.assert_array_equal(got, similarity_matrix(bm, measure))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        distributed_pairwise_cardinality(bm, "bogus", mesh=mesh8)
    with _pytest.raises(ValueError):
        distributed_similarity_matrix(bm, "bogus", mesh=mesh8)


@pytest.mark.parametrize("measure", ["count", "jaccard"])
def test_distributed_pairs_above_bits_axis(mesh8, measure):
    """K-shard screen (psum of triangular count-tile partials) must match
    the single-chip screen exactly. Needs >= 128 words/device."""
    from stormtpu import pairs_above
    from stormtpu.parallel import distributed_pairs_above

    bm = random_bitmatrix(90, 8 * 128 * 32 + 50, 0.02, seed=91)
    want = oracle_count_matrix(bm.packed)
    tri = want[np.triu_indices(bm.n, 1)]
    if measure == "count":
        threshold = max(1, int(np.percentile(tri, 99)))
    else:
        nnz = bm.row_nnz.astype(np.float64)
        J = want / np.maximum(nnz[:, None] + nnz[None, :] - want, 1)
        threshold = float(np.percentile(J[np.triu_indices(bm.n, 1)], 99))
        if not 0 < threshold <= 1:
            pytest.skip("degenerate similarity threshold")
    ii1, jj1, vv1 = pairs_above(bm, threshold, measure=measure)
    iid, jjd, vvd = distributed_pairs_above(
        bm, threshold, measure=measure, mesh=make_row_mesh(8),
        shard_axis="bits",
    )
    assert ii1.size > 0
    np.testing.assert_array_equal(iid, ii1)
    np.testing.assert_array_equal(jjd, jj1)
    np.testing.assert_array_equal(vvd, vv1)


def test_distributed_pairs_above_bits_small_w_falls_back(mesh8):
    from stormtpu import pairs_above
    from stormtpu.parallel import distributed_pairs_above

    bm = random_bitmatrix(40, 512, 0.4, seed=92)  # 16 words << 8*128
    ii1, jj1, vv1 = pairs_above(bm, 50)
    iid, jjd, vvd = distributed_pairs_above(
        bm, 50, mesh=make_row_mesh(8), shard_axis="bits", block_rows=4
    )
    np.testing.assert_array_equal(iid, ii1)
    np.testing.assert_array_equal(vvd, vv1)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        distributed_pairs_above(bm, 50, mesh=make_row_mesh(8),
                                shard_axis="cols")


def test_distributed_topk_bits_axis(mesh8):
    """K-shard top-k (psum of triangular count-tile partials, then the
    replicated tile-walk merge) must report the same VALUES as the
    single-chip form, and every reported (row, idx) must realize its
    count. Needs >= 128 words/device; ragged W on purpose."""
    from stormtpu import pair_counts, topk_neighbors
    from stormtpu.parallel import distributed_topk_neighbors

    bm = random_bitmatrix(70, 8 * 128 * 32 + 50, 0.02, seed=93)
    v1, _ = topk_neighbors(bm, k=5)
    vd, idd = distributed_topk_neighbors(
        bm, 5, mesh=make_row_mesh(8), shard_axis="bits"
    )
    np.testing.assert_array_equal(vd, v1)
    rows = np.repeat(np.arange(bm.n, dtype=np.int32), 5)
    got = pair_counts(bm, rows, idd.ravel().astype(np.int32))
    np.testing.assert_array_equal(got.reshape(bm.n, 5), vd)


def test_distributed_topk_bits_small_w_falls_back(mesh8):
    from stormtpu import topk_neighbors
    from stormtpu.parallel import distributed_topk_neighbors

    bm = random_bitmatrix(40, 512, 0.4, seed=94)  # 16 words << 8*128
    v1, _ = topk_neighbors(bm, k=3)
    vd, _ = distributed_topk_neighbors(
        bm, 3, mesh=make_row_mesh(8), shard_axis="bits", block_rows=4
    )
    np.testing.assert_array_equal(vd, v1)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        distributed_topk_neighbors(bm, 3, mesh=make_row_mesh(8),
                                   shard_axis="cols")


def test_distributed_count_matrix_2d_mesh():
    """Composed rows × bits mesh: ring over row shards with a psum over
    word slices, exact vs oracle at ragged N and W, both orientations
    of the 8-device grid (odd and even ring lengths)."""
    from stormtpu.parallel import distributed_count_matrix, make_grid_mesh

    rng = np.random.default_rng(67)
    packed = rng.integers(0, 2**32, (43, 19), dtype=np.uint32)
    want = oracle_count_matrix(packed)
    for rr, rb in ((4, 2), (2, 4)):
        mesh = make_grid_mesh(rr, rb)
        got = distributed_count_matrix(packed, mesh=mesh)
        np.testing.assert_array_equal(got, want, err_msg=f"{rr}x{rb}")


def test_distributed_queries_2d_mesh():
    """Composed rows × bits mesh for the reduced queries: per-step psum
    completes each count block before the top-k merge / screen; values
    equal the single-chip forms at ragged N and W."""
    from stormtpu.layout import BitMatrix
    from stormtpu.parallel import (
        distributed_pairs_above,
        distributed_topk_neighbors,
        make_grid_mesh,
    )
    from stormtpu.query import pairs_above, topk_neighbors

    rng = np.random.default_rng(71)
    dense = (rng.random((45, 610)) < 0.3).astype(np.uint8)
    bm = BitMatrix.from_dense(dense)
    want_v, _ = topk_neighbors(bm, 4)
    want_hits = pairs_above(bm, 40)
    for rr, rb in ((4, 2), (2, 4)):
        mesh = make_grid_mesh(rr, rb)
        vals, idx = distributed_topk_neighbors(bm, 4, mesh=mesh,
                                               block_rows=8)
        np.testing.assert_array_equal(vals, want_v, err_msg=f"{rr}x{rb}")
        c = oracle_count_matrix(bm.packed)
        for r in range(bm.n):
            for t in range(4):
                if vals[r, t] > 0:
                    assert c[r, idx[r, t]] == vals[r, t]
        ii, jj, vv = distributed_pairs_above(bm, 40, mesh=mesh,
                                             block_rows=8)
        np.testing.assert_array_equal(ii, want_hits[0], err_msg=f"{rr}x{rb}")
        np.testing.assert_array_equal(jj, want_hits[1], err_msg=f"{rr}x{rb}")
        np.testing.assert_array_equal(vv, want_hits[2], err_msg=f"{rr}x{rb}")


def test_distributed_setops_inherit_2d_mesh():
    from stormtpu import similarity_matrix
    from stormtpu.layout import BitMatrix
    from stormtpu.parallel import (
        distributed_pairwise_cardinality,
        distributed_similarity_matrix,
        make_grid_mesh,
    )

    rng = np.random.default_rng(73)
    dense = (rng.random((21, 330)) < 0.35).astype(np.uint8)
    bm = BitMatrix.from_dense(dense)
    mesh = make_grid_mesh(4, 2)
    np.testing.assert_allclose(
        distributed_similarity_matrix(bm, "jaccard", mesh=mesh),
        similarity_matrix(bm, "jaccard"), rtol=0, atol=0,
    )
    want_u = (bm.row_nnz[:, None] + bm.row_nnz[None, :]
              - oracle_count_matrix(bm.packed))
    np.testing.assert_array_equal(
        distributed_pairwise_cardinality(bm, "union", mesh=mesh), want_u,
    )


@pytest.mark.parametrize("measure", ["jaccard", "r2"])
def test_distributed_topk_measure(measure):
    from stormtpu.parallel import distributed_topk_neighbors
    from stormtpu.setops import derive_similarity

    bm = random_bitmatrix(70, 700, 0.25, seed=91)
    mesh = make_row_mesh()
    vals, idx = distributed_topk_neighbors(bm, 5, mesh=mesh,
                                           measure=measure)
    from stormtpu.oracle import oracle_count_matrix

    inter = oracle_count_matrix(bm.packed)
    sim = derive_similarity(inter, bm.row_nnz[:, None],
                            bm.row_nnz[None, :], bm.m_bits, measure)
    np.fill_diagonal(sim, -np.inf)
    for r in range(bm.n):
        want = np.lexsort((np.arange(bm.n), -sim[r]))[:5]
        np.testing.assert_array_equal(idx[r], want)
        np.testing.assert_array_equal(vals[r], sim[r][want])
    assert vals.dtype == np.float64 and idx.dtype == np.int32


def test_distributed_topk_measure_2d_mesh():
    from stormtpu.parallel import distributed_topk_neighbors
    from stormtpu.oracle import oracle_count_matrix
    from stormtpu.parallel import make_grid_mesh
    from stormtpu.setops import derive_similarity

    bm = random_bitmatrix(40, 2048, 0.3, seed=92)
    mesh = make_grid_mesh(4, 2)
    vals, idx = distributed_topk_neighbors(bm, 4, mesh=mesh,
                                           measure="jaccard")
    inter = oracle_count_matrix(bm.packed)
    sim = derive_similarity(inter, bm.row_nnz[:, None],
                            bm.row_nnz[None, :], bm.m_bits, "jaccard")
    np.fill_diagonal(sim, -np.inf)
    for r in range(bm.n):
        want = np.lexsort((np.arange(bm.n), -sim[r]))[:4]
        np.testing.assert_array_equal(idx[r], want)
        np.testing.assert_array_equal(vals[r], sim[r][want])


def test_distributed_topk_measure_bits_1d():
    """Bits-axis 1-D mesh measure ranking: exact psum'd tiles + the
    single-chip host ranking contract (lower-index ties)."""
    from stormtpu.oracle import oracle_count_matrix
    from stormtpu.parallel import distributed_topk_neighbors
    from stormtpu.setops import derive_similarity

    bm = random_bitmatrix(48, 8192, 0.3, seed=93)
    vals, idx = distributed_topk_neighbors(bm, 4, mesh=make_row_mesh(8),
                                           shard_axis="bits",
                                           measure="r2")
    sim = derive_similarity(oracle_count_matrix(bm.packed),
                            bm.row_nnz[:, None], bm.row_nnz[None, :],
                            bm.m_bits, "r2")
    np.fill_diagonal(sim, -np.inf)
    for r in range(bm.n):
        want = np.lexsort((np.arange(bm.n), -sim[r]))[:4]
        np.testing.assert_array_equal(idx[r], want)
        np.testing.assert_array_equal(vals[r], sim[r][want])


def test_distributed_count_row_sums_matches_single_chip(mesh8):
    from stormtpu.parallel import distributed_count_row_sums
    from stormtpu.stats import count_row_sums

    for n, m, d, seed in [(50, 700, 0.3, 81), (37, 1500, 0.01, 82),
                          (64, 64, 0.9, 83)]:
        bm = random_bitmatrix(n, m, d, seed=seed)
        want = count_row_sums(bm)
        got = distributed_count_row_sums(bm, mesh=make_row_mesh(8))
        np.testing.assert_array_equal(got, want)
        got_ns = distributed_count_row_sums(
            bm, include_self=False, mesh=make_row_mesh(8)
        )
        np.testing.assert_array_equal(got_ns, want - bm.row_nnz.astype(np.int64))


def test_distributed_count_row_sums_chunked_and_odd_mesh():
    from stormtpu.parallel import distributed_count_row_sums
    from stormtpu.stats import count_row_sums

    bm = random_bitmatrix(41, 9000, 0.4, seed=84)  # W=282: several chunks
    want = count_row_sums(bm)
    got = distributed_count_row_sums(
        bm, mesh=make_row_mesh(3), chunk_words=64
    )
    np.testing.assert_array_equal(got, want)


def test_distributed_count_row_sums_grid_mesh():
    from stormtpu.parallel import distributed_count_row_sums, make_grid_mesh
    from stormtpu.stats import count_row_sums

    bm = random_bitmatrix(30, 2000, 0.35, seed=85)
    want = count_row_sums(bm)
    got = distributed_count_row_sums(bm, mesh=make_grid_mesh(4, 2))
    np.testing.assert_array_equal(got, want)


def test_distributed_count_histogram_matches_single_chip(mesh8):
    from stormtpu.parallel import distributed_count_histogram
    from stormtpu.stats import count_histogram

    for n, m, d, n_bins, seed in [(50, 700, 0.3, 8, 91), (37, 900, 0.01, 4, 92),
                                  (300, 256, 0.5, 16, 93)]:
        bm = random_bitmatrix(n, m, d, seed=seed)
        want = count_histogram(bm, n_bins=n_bins)
        got = distributed_count_histogram(
            bm, n_bins=n_bins, mesh=make_row_mesh(8), block_rows=32
        )
        np.testing.assert_array_equal(got["hist"], want["hist"])
        assert got["bin_width"] == want["bin_width"]
        np.testing.assert_array_equal(got["bin_edges"], want["bin_edges"])
        assert got["pairs"] == n * (n - 1) // 2


def test_distributed_count_histogram_grid_mesh_and_width():
    from stormtpu.parallel import distributed_count_histogram, make_grid_mesh
    from stormtpu.stats import count_histogram

    bm = random_bitmatrix(60, 512, 0.4, seed=94)
    want = count_histogram(bm, n_bins=97, bin_width=1)
    got = distributed_count_histogram(
        bm, n_bins=97, bin_width=1, mesh=make_grid_mesh(2, 4), block_rows=32
    )
    np.testing.assert_array_equal(got["hist"], want["hist"])


def test_distributed_count_histogram_rejects_small_n(mesh8):
    from stormtpu.parallel import distributed_count_histogram

    bm = random_bitmatrix(1, 128, 0.5, seed=95)
    with pytest.raises(ValueError):
        distributed_count_histogram(bm, mesh=mesh8)


def test_distributed_count_histogram_stripe_route(mesh8):
    """Banded group-aligned panel: auto routes to the summary-skipping
    stripe walk (the r4 C8 skip on the mesh), skips most stripes, and
    matches the single-chip sink exactly; forcing the ring on the same
    panel agrees too."""
    from stormtpu.layout import BitMatrix
    from stormtpu.parallel import distributed_count_histogram
    from stormtpu.stats import count_histogram

    rng = np.random.default_rng(96)
    n, m = 300, 8192
    dense = np.zeros((n, m), dtype=np.uint8)
    dense[:64, :4096] = rng.random((64, 4096)) < 0.3
    dense[-44:, 4096:] = rng.random((44, 4096)) < 0.3
    bm = BitMatrix.from_dense(dense)

    want = count_histogram(bm, n_bins=8)
    got = distributed_count_histogram(bm, n_bins=8, mesh=make_row_mesh(8),
                                      superblock_rows=64)
    assert got["kernel"] == "stripes", got["kernel"]
    assert got["stripes_skipped"] > 0
    np.testing.assert_array_equal(got["hist"], want["hist"])

    ring = distributed_count_histogram(bm, n_bins=8, mesh=make_row_mesh(8),
                                       method="ring", block_rows=32)
    assert ring["kernel"] == "ring"
    np.testing.assert_array_equal(ring["hist"], want["hist"])

    # forced stripes on a 2-D mesh also agrees
    from stormtpu.parallel import make_grid_mesh

    got2d = distributed_count_histogram(
        bm, n_bins=8, mesh=make_grid_mesh(4, 2), method="stripes",
        superblock_rows=64)
    assert got2d["kernel"] == "stripes"
    np.testing.assert_array_equal(got2d["hist"], want["hist"])

    with pytest.raises(ValueError, match="method"):
        distributed_count_histogram(bm, method="bogus", mesh=mesh8)


def test_distributed_count_histogram_forced_stripes_dense(mesh8):
    """method='stripes' on a dense panel (zero skips): every stripe runs
    on the mesh, result still exact."""
    from stormtpu.parallel import distributed_count_histogram
    from stormtpu.stats import count_histogram

    bm = random_bitmatrix(90, 700, 0.4, seed=97)
    want = count_histogram(bm, n_bins=6)
    got = distributed_count_histogram(bm, n_bins=6, mesh=make_row_mesh(8),
                                      method="stripes", superblock_rows=32)
    assert got["kernel"] == "stripes" and got["stripes_skipped"] == 0
    np.testing.assert_array_equal(got["hist"], want["hist"])


def _count_device_puts(monkeypatch):
    import jax as _jax

    real = _jax.device_put
    calls = {"n": 0}

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(_jax, "device_put", counting)
    return calls


def test_distributed_row_sums_second_call_uploads_nothing(monkeypatch):
    """Device-resident chunk reuse (VERDICT r4 #3): the sharded operand
    chunks and bit-plane masks cache on the BitMatrix, so a repeat call
    performs ZERO device_put uploads."""
    from stormtpu.parallel import distributed_count_row_sums
    from stormtpu.stats import count_row_sums

    bm = random_bitmatrix(41, 9000, 0.4, seed=86)
    mesh = make_row_mesh(4)
    calls = _count_device_puts(monkeypatch)
    want = count_row_sums(bm)
    got1 = distributed_count_row_sums(bm, mesh=mesh, chunk_words=64)
    np.testing.assert_array_equal(got1, want)
    first = calls["n"]
    assert first > 0
    got2 = distributed_count_row_sums(bm, mesh=mesh, chunk_words=64)
    np.testing.assert_array_equal(got2, want)
    assert calls["n"] == first, "second call re-uploaded operands"


def test_distributed_row_sums_streams_above_budget(monkeypatch):
    """Above the operand budget the chunks are NOT cached (HBM stays
    bounded) — uploads repeat, results stay exact."""
    from stormtpu.parallel import distributed_count_row_sums
    from stormtpu.stats import count_row_sums

    monkeypatch.setenv("STORMTPU_DEVICE_OPERAND_BUDGET_BYTES", "1024")
    bm = random_bitmatrix(30, 4000, 0.3, seed=87)
    mesh = make_row_mesh(2)
    calls = _count_device_puts(monkeypatch)
    got1 = distributed_count_row_sums(bm, mesh=mesh, chunk_words=32)
    first = calls["n"]
    got2 = distributed_count_row_sums(bm, mesh=mesh, chunk_words=32)
    # streamed: the big chunk uploads repeat; only the (tiny, host-side)
    # column-counts result stays cached — one fewer put the second time
    assert calls["n"] == 2 * first - 1
    np.testing.assert_array_equal(got1, count_row_sums(bm))
    np.testing.assert_array_equal(got1, got2)


def test_distributed_histogram_stripes_jslice_lru(monkeypatch):
    """The stripe walk keeps ≤2 j-slices resident (VERDICT r4 weak #3):
    on a fully-occupied 3-superblock panel the walk performs exactly
    3 xi + 3 xj uploads (j-slices hit the LRU on later rows) instead of
    re-uploading xj for every one of the 6 stripes."""
    from stormtpu.parallel import distributed_count_histogram
    from stormtpu.stats import count_histogram

    bm = random_bitmatrix(48, 700, 0.4, seed=88)
    mesh = make_row_mesh(2)
    want = count_histogram(bm, n_bins=8)
    calls = _count_device_puts(monkeypatch)
    got = distributed_count_histogram(bm, n_bins=8, mesh=mesh,
                                      method="stripes",
                                      superblock_rows=16)
    assert got["kernel"] == "stripes" and got["n_super"] == 3
    np.testing.assert_array_equal(got["hist"], want["hist"])
    assert calls["n"] == 6, f"expected 6 uploads, saw {calls['n']}"


def test_distributed_histogram_auto_routes_sparse(mesh8):
    """r5: an ultra-sparse panel makes distributed_count_histogram
    delegate to the K4 host binning (work ∝ nnz²; the mesh would idle) —
    exact, with the route visible in the manifest."""
    from stormtpu.layout import BitMatrix
    from stormtpu.native import HAVE_NATIVE
    from stormtpu.parallel import distributed_count_histogram
    from stormtpu.stats import count_histogram

    if not HAVE_NATIVE:
        pytest.skip("needs the native K4 tier")
    rng = np.random.default_rng(89)
    n, m = 500, 65536
    rows = rng.integers(0, n, 400)
    cols = rng.integers(0, m, 400)
    bm = BitMatrix.from_positions(rows, cols, n, m)
    assert bm.density < 0.001
    got = distributed_count_histogram(bm, n_bins=8, bin_width=1,
                                      mesh=make_row_mesh(8))
    assert got["kernel"] == "sparse_outer"
    want = count_histogram(bm, n_bins=8, bin_width=1, method="sparse")
    np.testing.assert_array_equal(got["hist"], want["hist"])
    assert got["pairs"] == n * (n - 1) // 2
