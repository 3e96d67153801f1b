"""Query layer: explicit pairs, top-k neighbors, threshold screens — all
exact vs brute force."""

import numpy as np
import pytest

from conftest import random_bitmatrix
from stormtpu.oracle import oracle_count_matrix
from stormtpu.query import pair_counts, pairs_above, topk_neighbors


@pytest.fixture(scope="module")
def data():
    bm = random_bitmatrix(50, 1500, 0.3, seed=71)
    return bm, oracle_count_matrix(bm.packed)


def test_pair_counts_exact(data, rng):
    bm, want = data
    ii = rng.integers(0, bm.n, 200).astype(np.int32)
    jj = rng.integers(0, bm.n, 200).astype(np.int32)
    got = pair_counts(bm, ii, jj)
    np.testing.assert_array_equal(got, want[ii, jj])


def test_pair_counts_validation(data):
    bm, _ = data
    with pytest.raises(ValueError):
        pair_counts(bm, [0], [bm.n])
    with pytest.raises(ValueError):
        pair_counts(bm, [0, 1], [0])
    assert pair_counts(bm, [], []).size == 0


def test_topk_exact(data):
    bm, want = data
    k = 5
    vals, idx = topk_neighbors(bm, k, block_rows=16)
    w = want.astype(np.int64).copy()
    np.fill_diagonal(w, -1)
    for i in range(bm.n):
        expect = np.sort(w[i])[::-1][:k]
        np.testing.assert_array_equal(np.sort(vals[i])[::-1], expect)
        # indices actually achieve the reported counts
        np.testing.assert_array_equal(want[i, idx[i]], vals[i])


def test_topk_validation(data):
    bm, _ = data
    with pytest.raises(ValueError):
        topk_neighbors(bm, 0)
    with pytest.raises(ValueError):
        topk_neighbors(bm, bm.n)


def test_pairs_above_exact(data):
    bm, want = data
    thresh = int(np.percentile(want[np.triu_indices(bm.n, 1)], 90))
    ii, jj, counts = pairs_above(bm, thresh, block_rows=32)
    # every returned pair is a real hit with the right count
    assert (ii < jj).all()
    np.testing.assert_array_equal(counts, want[ii, jj])
    assert (counts >= thresh).all()
    # and the set of hits is complete
    wi, wj = np.nonzero(np.triu(want, 1) >= thresh)
    got = set(zip(ii.tolist(), jj.tolist()))
    assert got == set(zip(wi.tolist(), wj.tolist()))


def test_pairs_above_none(data):
    bm, want = data
    ii, jj, counts = pairs_above(bm, int(want.max()) + 1, block_rows=32)
    assert ii.size == 0 and jj.size == 0 and counts.size == 0


def test_pairs_above_threshold_validation(data):
    bm, _ = data
    with pytest.raises(ValueError):
        pairs_above(bm, 0)


@pytest.mark.parametrize("measure", ("jaccard", "cosine", "overlap", "dice"))
def test_pairs_above_similarity(measure, data):
    bm, want = data
    card = bm.row_nnz.astype(np.float64)
    inter = want.astype(np.float64)
    if measure == "jaccard":
        denom = card[:, None] + card[None, :] - inter
    elif measure == "dice":
        inter = 2 * inter
        denom = card[:, None] + card[None, :]
    elif measure == "cosine":
        denom = np.sqrt(card[:, None] * card[None, :])
    else:
        denom = np.minimum(card[:, None], card[None, :])
    sim = np.where(denom > 0, inter / np.where(denom > 0, denom, 1), 0.0)
    thresh = float(np.percentile(sim[np.triu_indices(bm.n, 1)], 95))
    if thresh <= 0:
        pytest.skip("degenerate threshold")
    ii, jj, vals = pairs_above(bm, thresh, measure=measure, block_rows=32)
    wi, wj = np.nonzero(np.triu(sim, 1) >= thresh)
    assert set(zip(ii.tolist(), jj.tolist())) == set(zip(wi.tolist(), wj.tolist()))
    np.testing.assert_allclose(vals, sim[ii, jj], rtol=1e-12)


def test_pairs_above_similarity_validation(data):
    bm, _ = data
    with pytest.raises(ValueError):
        pairs_above(bm, 1.5, measure="jaccard")
    with pytest.raises(ValueError):
        pairs_above(bm, 0.5, measure="tanimoto")


def test_queries_large_m_route_through_pallas():
    """At M > 2^17 the block kernel routes to the in-kernel-unpack Pallas
    rectangle (the XLA path would materialize the 8x unpacked operand);
    results must stay exact."""
    from conftest import random_bitmatrix

    bm = random_bitmatrix(16, (1 << 17) + 4096, 0.02, seed=77)
    dense = bm.to_dense().astype(np.int64)
    want = (dense[:, None, :] & dense[None, :, :]).sum(axis=2)

    vals, idx = topk_neighbors(bm, k=3, block_rows=8)
    masked = want.copy()
    np.fill_diagonal(masked, -1)
    want_vals = np.sort(masked, axis=1)[:, ::-1][:, :3]
    np.testing.assert_array_equal(vals, want_vals)

    thresh = int(np.percentile(want[np.triu_indices(bm.n, 1)], 90))
    if thresh >= 1:
        ii, jj, got = pairs_above(bm, thresh, block_rows=8)
        wi, wj = np.nonzero(np.triu(want >= thresh, 1))
        assert set(zip(ii.tolist(), jj.tolist())) == set(
            zip(wi.tolist(), wj.tolist())
        )
        np.testing.assert_array_equal(got, want[ii, jj])


def test_pair_counts_chunked_gather_exact(monkeypatch):
    """Huge pair lists are gathered in fixed-shape chunks (an unchunked
    gather materializes P x W x 2 operands — 21 GB was observed from a
    permissive pairs_above screen)."""
    import stormtpu.query as q
    from conftest import random_bitmatrix

    bm = random_bitmatrix(30, 3000, 0.4, seed=3)
    monkeypatch.setattr(q, "_PAIR_GATHER_MAX_WORDS", 64 * bm.n_words)
    rng = np.random.default_rng(2)
    p = 1000  # >> chunk (=64 rounded to mult of 8)
    ii = rng.integers(0, bm.n, p)
    jj = rng.integers(0, bm.n, p)
    got = pair_counts(bm, ii, jj).astype(np.int64)
    want = np.bitwise_count(bm.packed[ii] & bm.packed[jj]).sum(
        axis=1, dtype=np.int64
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("measure", ("phi", "r2"))
def test_pairs_above_phi_r2(measure, data):
    bm, want = data
    card = bm.row_nnz.astype(np.float64)
    inter = want.astype(np.float64)
    m = float(bm.m_bits)
    num = m * inter - card[:, None] * card[None, :]
    den = np.sqrt(card[:, None] * card[None, :]
                  * (m - card[:, None]) * (m - card[None, :]))
    with np.errstate(divide="ignore", invalid="ignore"):
        sim = np.where(den > 0, num / np.where(den > 0, den, 1), 0.0)
    if measure == "r2":
        sim = sim * sim
    thresh = float(np.percentile(sim[np.triu_indices(bm.n, 1)], 95))
    if thresh <= 0:
        pytest.skip("degenerate threshold")
    ii, jj, vals = pairs_above(bm, thresh, measure=measure, block_rows=32)
    wi, wj = np.nonzero(np.triu(sim, 1) >= thresh)
    assert set(zip(ii.tolist(), jj.tolist())) == set(zip(wi.tolist(), wj.tolist()))
    np.testing.assert_allclose(vals, sim[ii, jj], rtol=1e-12)


def test_pairs_above_phi_dense_rows_cancellation():
    """Dense rows make num = m·inter − ca·cb catastrophically cancel in
    the float32 device screen (error > any fixed slack); the screen must
    still admit the pair for the exact host refine (regression: a pair
    with true phi above threshold was silently dropped)."""
    from stormtpu import BitMatrix

    m = 1 << 17
    dense = np.ones((2, m), dtype=np.uint8)
    dense[0, :32] = 0           # A missing bits 0..31
    dense[1, 16:48] = 0         # B missing bits 16..47
    bm = BitMatrix.from_dense(dense)
    ca = float(m - 32)
    inter = float(m - 48)
    num = m * inter - ca * ca
    den = np.sqrt(ca * ca * (m - ca) * (m - ca))
    phi = num / den
    assert 0 < phi < 1
    ii, jj, vals = pairs_above(bm, phi - 1e-9, measure="phi", block_rows=32)
    assert (0, 1) in set(zip(ii.tolist(), jj.tolist()))
    np.testing.assert_allclose(vals[0], phi, rtol=1e-12)


def test_pairs_above_dense_screen_fallback(data):
    """threshold=1 at moderate density admits nearly every pair, pushing
    the two-phase fetch past its density cutoff into the full-bitmap
    fallback — results must be identical to the sparse-gather path."""
    bm, want = data
    ii, jj, counts = pairs_above(bm, 1, block_rows=32)
    wi, wj = np.nonzero(np.triu(want, 1) >= 1)
    np.testing.assert_array_equal(ii, wi.astype(np.int32))
    np.testing.assert_array_equal(jj, wj.astype(np.int32))
    np.testing.assert_array_equal(counts, want[ii, jj])


@pytest.mark.heavy
def test_pairs_above_sparse_dispatch_branch():
    """At extreme sparsity the screen follows D1 dispatch to the host
    sparse path (no device screen); results must match the dense-path
    screen exactly, including similarity measures."""
    from stormtpu.dispatch import choose_strategy

    rng = np.random.default_rng(77)
    n, m = 512, 1 << 17
    dense = (rng.random((n, m)) < 1e-4).astype(np.uint8)
    dense[7, :40] = 1
    dense[13, :40] = 1  # guaranteed hits
    from stormtpu import BitMatrix

    bm = BitMatrix.from_dense(dense)
    assert choose_strategy(bm.n, bm.m_bits, bm.density) in (
        "sparse", "sparse_outer"
    )
    want = oracle_count_matrix(bm.packed)

    ii, jj, vv = pairs_above(bm, 5)
    wi, wj = np.nonzero(np.triu(want, 1) >= 5)
    np.testing.assert_array_equal(ii, wi.astype(np.int32))
    np.testing.assert_array_equal(jj, wj.astype(np.int32))
    np.testing.assert_array_equal(vv, want[wi, wj])

    ii, jj, vv = pairs_above(bm, 0.5, measure="jaccard")
    nnz = dense.sum(1).astype(np.float64)
    J = want / np.maximum(nnz[:, None] + nnz[None, :] - want, 1)
    wi, wj = np.nonzero(np.triu(J, 1) >= 0.5)
    np.testing.assert_array_equal(ii, wi.astype(np.int32))
    np.testing.assert_array_equal(jj, wj.astype(np.int32))

    ii, jj, vv = pairs_above(bm, 0.001, measure="r2")
    assert (ii < jj).all()


@pytest.mark.parametrize("measure,thresh_q", [("count", 90), ("jaccard", 95)])
def test_pairs_above_tile_screen_route(monkeypatch, data, measure, thresh_q):
    """Force the triangular K2 tile-screen route and verify it returns
    exactly what the block screen / oracle does."""
    import stormtpu.dispatch as dispatch

    bm, want = data
    tri = want[np.triu_indices(bm.n, 1)]
    if measure == "count":
        threshold = int(np.percentile(tri, thresh_q))
        wi, wj = np.nonzero(np.triu(want, 1) >= threshold)
        expect_vals = want[wi, wj]
    else:
        nnz = bm.row_nnz.astype(np.float64)
        J = want / np.maximum(nnz[:, None] + nnz[None, :] - want, 1)
        threshold = float(np.percentile(J[np.triu_indices(bm.n, 1)], thresh_q))
        wi, wj = np.nonzero(np.triu(J, 1) >= threshold)
        expect_vals = J[wi, wj]
    monkeypatch.setattr(dispatch, "choose_strategy",
                        lambda *a, **k: "pallas_mxu")
    ii, jj, vv = pairs_above(bm, threshold, measure=measure)
    assert wi.size > 0
    np.testing.assert_array_equal(ii, wi.astype(np.int32))
    np.testing.assert_array_equal(jj, wj.astype(np.int32))
    np.testing.assert_allclose(vv, expect_vals, rtol=0, atol=0)


def test_topk_tile_route(monkeypatch, data):
    """Force the triangular K2 tile top-k route: values must equal the
    block form's exactly; indices must realize their values."""
    import stormtpu.dispatch as dispatch

    bm, want = data
    # compute BOTH block-route references before patching dispatch —
    # otherwise the tile route would be compared against itself
    v1, _ = topk_neighbors(bm, 6)
    v1b, _ = topk_neighbors(bm, bm.n - 1)
    monkeypatch.setattr(dispatch, "choose_strategy",
                        lambda *a, **k: "pallas_mxu")
    vt, it = topk_neighbors(bm, 6)
    np.testing.assert_array_equal(vt, v1)
    np.testing.assert_array_equal(
        want[np.arange(bm.n)[:, None], it], vt
    )
    vtb, _ = topk_neighbors(bm, bm.n - 1)
    np.testing.assert_array_equal(vtb, v1b)


@pytest.mark.parametrize("measure", ["jaccard", "r2", "cosine"])
def test_topk_neighbors_measure(measure):
    from stormtpu.setops import similarity_matrix

    bm = random_bitmatrix(37, 600, 0.25, seed=71)
    k = 5
    vals, idx = topk_neighbors(bm, k, measure=measure)
    sim = np.asarray(similarity_matrix(bm, measure=measure))
    np.fill_diagonal(sim, -np.inf)
    for r in range(bm.n):
        row = sim[r]
        want_order = np.lexsort((np.arange(bm.n), -row))[:k]
        np.testing.assert_allclose(vals[r], row[want_order], rtol=0, atol=0)
        # indices must agree where values are distinct; on exact ties the
        # contract is lower-index-first, which lexsort reproduces
        np.testing.assert_array_equal(idx[r], want_order)
    assert vals.dtype == np.float64 and idx.dtype == np.int32


def test_topk_neighbors_measure_ceiling_and_default():
    bm = random_bitmatrix(10, 128, 0.3, seed=72)
    # count path unchanged (int32 counts)
    vals, idx = topk_neighbors(bm, 3)
    assert vals.dtype == np.int32
    with pytest.raises(ValueError):
        topk_neighbors(bm, 3, measure="nonsense")


def test_topk_neighbors_measure_boundary_ties():
    # tiny M makes integer-ratio similarities collide constantly, so the
    # k-th place is routinely tied: argpartition alone picks arbitrarily
    # there (caught by verification); the contract is lower-index-first
    from stormtpu.setops import similarity_matrix

    bm = random_bitmatrix(40, 64, 0.5, seed=73)
    vals, idx = topk_neighbors(bm, 7, measure="jaccard")
    sim = np.asarray(similarity_matrix(bm, measure="jaccard"))
    np.fill_diagonal(sim, -np.inf)
    for r in range(bm.n):
        want = np.lexsort((np.arange(bm.n), -sim[r]))[:7]
        np.testing.assert_array_equal(idx[r], want)
        np.testing.assert_array_equal(vals[r], sim[r][want])


def test_topk_neighbors_measure_autoroute_above_ceiling(monkeypatch):
    """Above the host N² ceiling the measure route falls back to the
    streaming walk (VERDICT r3 #7: routing, not refusing). Shrinking the
    ceiling exercises the fallback at test scale; values must match the
    host route exactly (tie ORDER may differ; ranked VALUES may not)."""
    import stormtpu.query as query_mod

    bm = random_bitmatrix(48, 400, 0.3, seed=75)
    k = 4
    want_vals, want_idx = topk_neighbors(bm, k, measure="jaccard")
    monkeypatch.setattr(query_mod, "_MEASURE_HOST_N_CEILING", 16)
    got_vals, got_idx = topk_neighbors(bm, k, measure="jaccard")
    np.testing.assert_array_equal(got_vals, want_vals)
    # where the k-th value is strictly above the (k+1)-th the index SET is
    # determined; compare sets per row to stay tie-order-agnostic
    from stormtpu.setops import similarity_matrix

    sim = np.asarray(similarity_matrix(bm, measure="jaccard"))
    np.fill_diagonal(sim, -np.inf)
    for r in range(bm.n):
        srt = np.sort(sim[r])[::-1]
        if srt[k - 1] > srt[k]:
            assert set(got_idx[r]) == set(want_idx[r])
    with pytest.raises(ValueError, match="on_host_limit"):
        topk_neighbors(bm, k, measure="jaccard", on_host_limit="raise")
    with pytest.raises(ValueError):
        topk_neighbors(bm, k, measure="jaccard", on_host_limit="bogus")


def test_topk_neighbors_measure_single_row():
    # N=1 admits k=1; no partner exists — the (0, 0) convention, not the
    # -inf diagonal sentinel
    bm = random_bitmatrix(1, 128, 0.3, seed=74)
    vals, idx = topk_neighbors(bm, 1, measure="jaccard")
    assert vals.shape == (1, 1) and idx.shape == (1, 1)
    assert vals[0, 0] == 0.0 and idx[0, 0] == 0
