"""Greedy leader clumping (stormtpu.clump) — exactness vs a brute-force
oracle over the exact similarity matrix, plus grouping invariants.

The clumping semantics are pure host logic over the screen's pair list,
so the oracle recomputes the pass directly from the O(N²) similarity
matrix (no adjacency structure) and the two must agree bit-for-bit on
leader assignment, across measures and densities.
"""

import numpy as np
import pytest

from conftest import random_bitmatrix
from stormtpu import clump, clump_from_pairs
from stormtpu.oracle import oracle_count_matrix
from stormtpu.setops import similarity_matrix


def oracle_clump(sim: np.ndarray, stat: np.ndarray, threshold: float):
    """Direct greedy pass over the full similarity matrix."""
    n = stat.size
    visit = np.argsort(-stat, kind="stable")
    leader = np.full(n, -1, dtype=np.int64)
    leaders = []
    for r in visit:
        r = int(r)
        if leader[r] != -1:
            continue
        leader[r] = r
        leaders.append(r)
        for c in range(n):
            if c != r and leader[c] == -1 and sim[r, c] >= threshold:
                leader[c] = r
    return leader, np.asarray(leaders, dtype=np.int64)


@pytest.mark.parametrize("measure,threshold", [
    ("count", 20.0),
    ("jaccard", 0.3),
    ("r2", 0.2),
])
def test_clump_matches_oracle(measure, threshold):
    bm = random_bitmatrix(48, 700, 0.25, seed=21)
    rng = np.random.default_rng(22)
    stat = rng.random(48)
    got = clump(bm, stat, threshold, measure=measure)

    if measure == "count":
        sim = oracle_count_matrix(bm.packed).astype(np.float64)
    else:
        sim = np.asarray(similarity_matrix(bm, measure=measure),
                         dtype=np.float64)
    np.fill_diagonal(sim, -np.inf)
    want_leader, want_leaders = oracle_clump(sim, stat, threshold)
    np.testing.assert_array_equal(got.leader, want_leader)
    np.testing.assert_array_equal(got.leaders, want_leaders)


def test_clump_invariants():
    bm = random_bitmatrix(40, 512, 0.3, seed=30)
    stat = np.random.default_rng(31).random(40)
    res = clump(bm, stat, 0.15, measure="jaccard")
    # every row assigned; every leader leads itself; members partition
    assert (res.leader >= 0).all()
    np.testing.assert_array_equal(res.leader[res.leaders], res.leaders)
    assert res.sizes().sum() == 40
    assert res.n_clumps == len(set(res.leaders.tolist()))
    seen = np.concatenate([res.members(int(l)) for l in res.leaders])
    assert np.array_equal(np.sort(seen), np.arange(40))
    # leaders come out stat-descending (ties impossible with random floats)
    assert (np.diff(stat[res.leaders]) < 0).all()


def test_clump_from_pairs_edges():
    # no pairs: everyone a singleton leader, visit order = stat order
    stat = np.array([0.1, 0.9, 0.5])
    res = clump_from_pairs([], [], stat)
    np.testing.assert_array_equal(res.leader, [0, 1, 2])
    np.testing.assert_array_equal(res.leaders, [1, 2, 0])
    # one chain 0-1, 1-2: leader 1 absorbs both (greedy, not transitive
    # closure: 0 and 2 join through their shared neighbor's clump)
    res = clump_from_pairs([0, 1], [1, 2], stat)
    np.testing.assert_array_equal(res.leader, [1, 1, 1])
    assert res.n_clumps == 1
    # duplicates + reversed orientation + self pairs are harmless
    res2 = clump_from_pairs([1, 0, 2, 1, 0], [0, 1, 1, 2, 0], stat)
    np.testing.assert_array_equal(res2.leader, res.leader)
    # tie on stat: lower index visited first
    res = clump_from_pairs([], [], np.zeros(3))
    np.testing.assert_array_equal(res.leaders, [0, 1, 2])


def test_clump_stat_length_validated():
    # a short stat must fail loudly even when no pair qualifies (the
    # screen returning zero pairs otherwise masks the wrong n)
    bm = random_bitmatrix(30, 256, 0.2, seed=50)
    with pytest.raises(ValueError):
        clump(bm, np.zeros(10), 0.9, measure="r2")


def test_clump_merges_planted_blocks():
    # 2 planted near-duplicate blocks of 6 rows + 12 random rows: the
    # greedy pass must collapse each block into one clump
    rng = np.random.default_rng(51)
    dense = (rng.random((24, 800)) < 0.3).astype(np.uint8)
    for b in range(2):
        base = (rng.random(800) < 0.3).astype(np.uint8)
        for r in range(6):
            row = base.copy()
            row[rng.random(800) < 0.02] ^= 1
            dense[b * 6 + r] = row
    from stormtpu import BitMatrix

    res = clump(BitMatrix.from_dense(dense), rng.random(24), 0.5,
                measure="r2")
    assert res.n_clumps == 24 - 2 * 5
    for b in range(2):
        block = res.leader[b * 6:(b + 1) * 6]
        assert (block == block[0]).all()


def test_clump_from_pairs_validation():
    with pytest.raises(ValueError):
        clump_from_pairs([0], [3], np.zeros(3))
    with pytest.raises(ValueError):
        clump_from_pairs([0], [1, 2], np.zeros(3))
    with pytest.raises(ValueError):
        clump_from_pairs([], [], np.zeros((2, 2)))


def test_clump_streaming_pairs_agree():
    """stream_pairs_above's pair list groups identically to the
    single-shot screen's (same threshold → same qualifying set)."""
    from stormtpu.query import pairs_above
    from stormtpu.stream_query import stream_pairs_above

    bm = random_bitmatrix(64, 800, 0.2, seed=40)
    stat = np.random.default_rng(41).random(64)
    thr = 0.25
    ii, jj, _ = pairs_above(bm, thr, measure="jaccard")
    a = clump_from_pairs(ii, jj, stat)
    si, sj, _ = stream_pairs_above(bm, thr, measure="jaccard",
                                   superblock_rows=16)
    b = clump_from_pairs(si, sj, stat)
    np.testing.assert_array_equal(a.leader, b.leader)
    np.testing.assert_array_equal(a.leaders, b.leaders)
