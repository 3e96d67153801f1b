"""Derived set-op cardinalities / similarities vs brute-force oracle."""

import numpy as np
import pytest

from conftest import random_bitmatrix
from stormtpu.setops import (
    CARD_OPS,
    SIM_OPS,
    pairwise_cardinality,
    similarity_matrix,
)


@pytest.fixture(scope="module")
def data():
    bm = random_bitmatrix(25, 700, 0.3, seed=61)
    dense = bm.to_dense().astype(np.int64)
    return bm, dense


@pytest.mark.parametrize("op", CARD_OPS)
def test_cardinality_exact(op, data):
    bm, dense = data
    got = pairwise_cardinality(bm, op)
    a = dense[:, None, :]
    b = dense[None, :, :]
    want = {
        "intersect": (a & b).sum(axis=2),
        "union": (a | b).sum(axis=2),
        "xor": (a ^ b).sum(axis=2),
        "andnot": (a & ~b & 1).sum(axis=2),
        "nand": bm.m_bits - (a & b).sum(axis=2),
    }[op]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("measure", SIM_OPS)
def test_similarity_exact(measure, data):
    bm, dense = data
    got = similarity_matrix(bm, measure)
    inter = (dense[:, None, :] & dense[None, :, :]).sum(axis=2).astype(np.float64)
    card = dense.sum(axis=1).astype(np.float64)
    if measure == "jaccard":
        want = inter / (card[:, None] + card[None, :] - inter)
    elif measure == "dice":
        want = 2 * inter / (card[:, None] + card[None, :])
    elif measure == "cosine":
        want = inter / np.sqrt(card[:, None] * card[None, :])
    elif measure in ("phi", "r2"):
        m = float(bm.m_bits)
        num = m * inter - card[:, None] * card[None, :]
        den = np.sqrt(card[:, None] * card[None, :]
                      * (m - card[:, None]) * (m - card[None, :]))
        want = num / den
        if measure == "r2":
            want = want * want
    else:
        want = inter / np.minimum(card[:, None], card[None, :])
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_phi_matches_corrcoef(data):
    """phi over bit rows IS the Pearson correlation of the 0/1 vectors."""
    bm, dense = data
    got = similarity_matrix(bm, "phi")
    want = np.corrcoef(dense)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_empty_rows_similarity_zero():
    from stormtpu import BitMatrix

    dense = np.zeros((3, 64), dtype=np.uint8)
    dense[1, :5] = 1
    bm = BitMatrix.from_dense(dense)
    s = similarity_matrix(bm, "jaccard")
    assert s[0, 0] == 0.0 and s[0, 2] == 0.0  # empty vs empty -> 0, not nan
    assert s[1, 1] == 1.0


def test_bad_op_rejected(data):
    bm, _ = data
    with pytest.raises(ValueError):
        pairwise_cardinality(bm, "xnor")
    with pytest.raises(ValueError):
        similarity_matrix(bm, "pearson")


def test_column_counts_exact(data):
    """Positional popcount (pospopcnt lineage): column sums, exact."""
    from stormtpu.setops import column_counts

    bm, dense = data
    got = column_counts(bm, chunk_words=3)  # force multi-chunk + ragged
    np.testing.assert_array_equal(got, dense.sum(axis=0).astype(np.int32))


def test_column_counts_empty_and_full():
    from stormtpu import BitMatrix
    from stormtpu.setops import column_counts

    z = BitMatrix.from_dense(np.zeros((4, 100), dtype=np.uint8))
    np.testing.assert_array_equal(column_counts(z), np.zeros(100, np.int32))
    f = BitMatrix.from_dense(np.ones((4, 100), dtype=np.uint8))
    np.testing.assert_array_equal(column_counts(f), np.full(100, 4, np.int32))


def test_similarity_matrix_complete_matches_independent_pearson():
    """Pairwise-complete phi/r2 equal the Pearson correlation computed
    over each pair's co-observed columns only (fully independent
    formulation); jaccard restricts to the co-observed universe too."""
    from stormtpu import similarity_matrix_complete
    from stormtpu.layout import BitMatrix

    rng = np.random.default_rng(37)
    n, m = 24, 700
    observed = rng.random((n, m)) > 0.15
    values = (rng.random((n, m)) < 0.4) & observed
    bm_d = BitMatrix.from_dense(values.astype(np.uint8))
    bm_m = BitMatrix.from_dense(observed.astype(np.uint8))

    got_phi = similarity_matrix_complete(bm_d, bm_m, "phi")
    got_r2 = similarity_matrix_complete(bm_d, bm_m, "r2")
    got_jac = similarity_matrix_complete(bm_d, bm_m, "jaccard")
    for i in range(n):
        for j in range(n):
            co = observed[i] & observed[j]
            a = values[i, co].astype(np.float64)
            b = values[j, co].astype(np.float64)
            if a.std() == 0 or b.std() == 0:
                want_phi = 0.0
            else:
                want_phi = float(np.corrcoef(a, b)[0, 1])
            assert abs(got_phi[i, j] - want_phi) < 1e-9, (i, j)
            assert abs(got_r2[i, j] - want_phi**2) < 1e-9, (i, j)
            union = np.logical_or(a, b).sum()
            want_jac = (a * b).sum() / union if union else 0.0
            assert abs(got_jac[i, j] - want_jac) < 1e-12, (i, j)


def test_similarity_matrix_complete_full_mask_equals_plain():
    from stormtpu import similarity_matrix, similarity_matrix_complete
    from stormtpu.layout import BitMatrix

    bm = random_bitmatrix(20, 512, 0.35, seed=41)
    full = BitMatrix.from_dense(np.ones((20, 512), dtype=np.uint8))
    for measure in ("jaccard", "cosine", "phi", "r2"):
        np.testing.assert_allclose(
            similarity_matrix_complete(bm, full, measure),
            similarity_matrix(bm, measure),
            rtol=0, atol=0, err_msg=measure,
        )


def test_similarity_matrix_complete_validation():
    import pytest

    from stormtpu import similarity_matrix_complete
    from stormtpu.layout import BitMatrix

    d = random_bitmatrix(10, 256, 0.4, seed=5)
    with pytest.raises(ValueError, match="identical shape"):
        similarity_matrix_complete(d, random_bitmatrix(11, 256, 0.4, seed=6))
    empty_mask = BitMatrix.from_dense(np.zeros((10, 256), dtype=np.uint8))
    with pytest.raises(ValueError, match="unobserved"):
        similarity_matrix_complete(d, empty_mask)


def test_pairs_above_complete_matches_matrix_form():
    """The missing-data screen equals thresholding the matrix form's
    upper triangle, for phi/r2/jaccard, including slack-admitted
    candidates being dropped by the exact refine."""
    from stormtpu import pairs_above_complete, similarity_matrix_complete
    from stormtpu.layout import BitMatrix

    rng = np.random.default_rng(53)
    n, m = 40, 800
    observed = rng.random((n, m)) > 0.12
    values = (rng.random((n, m)) < 0.4) & observed
    # plant a perfectly correlated pair (over co-observed columns)
    values[7] = values[3] & observed[7]
    bm_d = BitMatrix.from_dense(values.astype(np.uint8))
    bm_m = BitMatrix.from_dense(observed.astype(np.uint8))

    for measure, thr in (("r2", 0.05), ("phi", 0.1), ("jaccard", 0.25)):
        full = similarity_matrix_complete(bm_d, bm_m, measure)
        wi, wj = np.nonzero(np.triu(full, 1) >= thr)
        # default single-block route AND a forced multi-block walk
        # (block_rows=16 < n crosses block boundaries, exercising the
        # per-block row offsets and the ragged tail)
        for br in (None, 16):
            ii, jj, vv = pairs_above_complete(
                bm_d, bm_m, thr, measure=measure, block_rows=br
            )
            np.testing.assert_array_equal(ii, wi, err_msg=f"{measure} br={br}")
            np.testing.assert_array_equal(jj, wj, err_msg=f"{measure} br={br}")
            np.testing.assert_allclose(vv, full[wi, wj], rtol=0, atol=0,
                                       err_msg=f"{measure} br={br}")


def test_pairs_above_complete_validation():
    import pytest

    from stormtpu import pairs_above_complete
    from stormtpu.layout import BitMatrix

    d = random_bitmatrix(10, 256, 0.4, seed=5)
    full = BitMatrix.from_dense(np.ones((10, 256), dtype=np.uint8))
    with pytest.raises(ValueError, match="use pairs_above"):
        pairs_above_complete(d, full, 1, measure="count")
    with pytest.raises(ValueError, match="identical shape"):
        pairs_above_complete(d, random_bitmatrix(11, 256, 0.4, seed=6), 0.5)


def test_pairs_above_complete_large_m_pallas_route():
    """m > MXU_XLA_MAX_BITS routes the four count blocks through the
    Pallas MXU rectangle (interpret on CPU) — values must still equal
    the matrix form exactly."""
    from stormtpu import pairs_above_complete, similarity_matrix_complete
    from stormtpu.kernels import MXU_XLA_MAX_BITS
    from stormtpu.layout import BitMatrix

    m = MXU_XLA_MAX_BITS + 4096
    rng = np.random.default_rng(67)
    observed = rng.random((18, m)) > 0.2
    values = (rng.random((18, m)) < 0.002) & observed  # sparse: fast pack
    bm_d = BitMatrix.from_dense(values.astype(np.uint8))
    bm_m = BitMatrix.from_dense(observed.astype(np.uint8))
    full = similarity_matrix_complete(bm_d, bm_m, "jaccard")
    thr = float(np.percentile(full[np.triu_indices(18, 1)], 80))
    thr = max(thr, 1e-6)
    ii, jj, vv = pairs_above_complete(bm_d, bm_m, thr, measure="jaccard")
    wi, wj = np.nonzero(np.triu(full, 1) >= thr)
    np.testing.assert_array_equal(ii, wi)
    np.testing.assert_array_equal(jj, wj)
    np.testing.assert_allclose(vv, full[wi, wj], rtol=0, atol=0)
