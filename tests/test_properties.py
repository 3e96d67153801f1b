"""Property-based invariants (hypothesis): the algebra the engine must
satisfy on arbitrary inputs, mirroring the reference's randomized
cross-check philosophy but with adversarial shrinking."""

import numpy as np
from hypothesis import given, settings, strategies as st

from stormtpu import BitMatrix, intersect_count_matrix
from stormtpu.layout import pack_bits, unpack_bits
from stormtpu.oracle import oracle_count_matrix

_shapes = st.tuples(
    st.integers(min_value=1, max_value=12),   # N
    st.integers(min_value=1, max_value=200),  # M
)


@st.composite
def bit_matrices(draw):
    n, m = draw(_shapes)
    data = draw(
        st.lists(
            st.integers(min_value=0, max_value=(1 << min(m, 60)) - 1),
            min_size=n,
            max_size=n,
        )
    )
    dense = np.zeros((n, m), dtype=np.uint8)
    for i, v in enumerate(data):
        for b in range(min(m, 60)):
            dense[i, b] = (v >> b) & 1
    return dense


@given(bit_matrices())
@settings(max_examples=30, deadline=None)
def test_pack_roundtrip_property(dense):
    packed = pack_bits(dense)
    np.testing.assert_array_equal(unpack_bits(packed, dense.shape[1]), dense)


@given(bit_matrices())
@settings(max_examples=15, deadline=None)
def test_count_matrix_properties(dense):
    bm = BitMatrix.from_dense(dense)
    c = intersect_count_matrix(bm, strategy="popcount")
    # symmetry
    np.testing.assert_array_equal(c, c.T)
    # diagonal = row cardinality
    np.testing.assert_array_equal(np.diag(c), bm.row_nnz)
    # bounds: 0 <= C[i,j] <= min(|i|, |j|)
    assert (c >= 0).all()
    bound = np.minimum(bm.row_nnz[:, None], bm.row_nnz[None, :])
    assert (c <= bound).all()
    # exactness vs oracle
    np.testing.assert_array_equal(c, oracle_count_matrix(bm.packed))


@given(bit_matrices(), st.integers(min_value=0, max_value=100))
@settings(max_examples=15, deadline=None)
def test_count_invariant_under_column_permutation(dense, seed):
    # XX^T is invariant under any permutation of bit columns — the property
    # K2's bit-major unpack relies on.
    rng = np.random.default_rng(seed)
    perm = rng.permutation(dense.shape[1])
    a = BitMatrix.from_dense(dense)
    b = BitMatrix.from_dense(dense[:, perm])
    np.testing.assert_array_equal(
        oracle_count_matrix(a.packed), oracle_count_matrix(b.packed)
    )


@given(bit_matrices())
@settings(max_examples=8, deadline=None)
def test_all_strategies_agree(dense):
    """D1's semantics-free contract, property-tested: every strategy
    returns the identical exact matrix on arbitrary inputs."""
    from stormtpu.dispatch import STRATEGIES

    bm = BitMatrix.from_dense(dense)
    want = oracle_count_matrix(bm.packed)
    for strategy in STRATEGIES:
        got = intersect_count_matrix(bm, strategy=strategy)
        np.testing.assert_array_equal(
            got, want, err_msg=f"strategy {strategy} diverged"
        )


@given(bit_matrices(), st.integers(min_value=1, max_value=6))
@settings(max_examples=12, deadline=None)
def test_topk_property(dense, k):
    """topk values == sorted row of the oracle with self masked, for any
    matrix and any k ≤ N−1 (both dispatch routes are value-identical)."""
    from stormtpu import topk_neighbors

    n = dense.shape[0]
    if n < 2:
        return
    k = min(k, n - 1)
    bm = BitMatrix.from_dense(dense)
    want = oracle_count_matrix(bm.packed).astype(np.int64)
    vals, idx = topk_neighbors(bm, k)
    w = want.copy()
    np.fill_diagonal(w, -1)
    exp = np.sort(w, axis=1)[:, ::-1][:, :k]
    np.testing.assert_array_equal(vals, exp)
    np.testing.assert_array_equal(want[np.arange(n)[:, None], idx], vals)


@given(bit_matrices(), st.integers(min_value=1, max_value=40))
@settings(max_examples=12, deadline=None)
def test_pairs_above_property(dense, threshold):
    """The count screen returns exactly the upper-triangle pairs with
    count ≥ threshold, for any matrix and threshold."""
    from stormtpu import pairs_above

    if dense.shape[0] < 2:
        return
    bm = BitMatrix.from_dense(dense)
    want = oracle_count_matrix(bm.packed)
    ii, jj, vv = pairs_above(bm, threshold)
    wi, wj = np.nonzero(np.triu(want, 1) >= threshold)
    np.testing.assert_array_equal(ii, wi.astype(np.int32))
    np.testing.assert_array_equal(jj, wj.astype(np.int32))
    np.testing.assert_array_equal(vv, want[wi, wj])


# --- tile-boundary properties (VERDICT r1 weak #7) -----------------------
# The small-entropy matrices above never cross a Pallas tile boundary, so
# they exercise only the XLA small-shape corners. These shapes DO cross
# row-tile and K-step boundaries under a small-tile config (boundaries at
# 32 rows / 128 words), with ragged tails on both axes.

from stormtpu.config import EngineConfig

_TILE_CFG = EngineConfig(
    k1_tile_rows=8, k1_tile_words=128, k2_tile_rows=32, k2_tile_words=128
)


@st.composite
def boundary_matrices(draw):
    n = draw(st.integers(min_value=33, max_value=70))
    m = draw(st.integers(min_value=4100, max_value=9000))
    seed = draw(st.integers(min_value=0, max_value=2**31))
    density = draw(st.sampled_from([0.005, 0.2, 0.6]))
    rng = np.random.default_rng(seed)
    return (rng.random((n, m)) < density).astype(np.uint8)


@given(boundary_matrices())
@settings(max_examples=6, deadline=None)
def test_all_strategies_agree_across_tile_boundaries(dense):
    from stormtpu.dispatch import STRATEGIES

    bm = BitMatrix.from_dense(dense)
    want = oracle_count_matrix(bm.packed)
    for strategy in STRATEGIES:
        got = intersect_count_matrix(bm, strategy=strategy, config=_TILE_CFG)
        np.testing.assert_array_equal(
            got, want, err_msg=f"strategy {strategy} diverged at "
            f"boundary shape {dense.shape}"
        )


@given(boundary_matrices(), st.integers(min_value=1, max_value=5))
@settings(max_examples=4, deadline=None)
def test_topk_property_across_tile_boundaries(dense, k):
    from stormtpu import topk_neighbors

    bm = BitMatrix.from_dense(dense)
    want = oracle_count_matrix(bm.packed).astype(np.int64)
    vals, _ = topk_neighbors(bm, k)
    w = want.copy()
    np.fill_diagonal(w, -1)
    np.testing.assert_array_equal(vals, np.sort(w, axis=1)[:, ::-1][:, :k])


@given(boundary_matrices(), st.integers(min_value=1, max_value=5),
       st.integers(min_value=1, max_value=60))
@settings(max_examples=4, deadline=None)
def test_stream_queries_property(dense, k, threshold):
    """Streaming queries equal the oracle for arbitrary matrices whose
    stripe walk crosses superblock AND tile boundaries (ragged tails on
    rows, words, and superblocks)."""
    from stormtpu.stream_query import stream_pairs_above, stream_topk_neighbors

    bm = BitMatrix.from_dense(dense)
    want = oracle_count_matrix(bm.packed).astype(np.int64)
    w = want.copy()
    np.fill_diagonal(w, -1)

    vals, _ = stream_topk_neighbors(
        bm, k, superblock_rows=32, config=_TILE_CFG, interpret=True,
    )
    np.testing.assert_array_equal(
        vals, np.maximum(np.sort(w, axis=1)[:, ::-1][:, :k], 0)
    )

    ii, jj, vv = stream_pairs_above(
        bm, threshold, superblock_rows=32, config=_TILE_CFG, interpret=True,
    )
    wi, wj = np.nonzero(np.triu(want, 1) >= threshold)
    np.testing.assert_array_equal(ii, wi.astype(np.int32))
    np.testing.assert_array_equal(jj, wj.astype(np.int32))
    np.testing.assert_array_equal(vv, want[wi, wj])
