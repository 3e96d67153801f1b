"""Cross-set queries (A against B): exact vs the NumPy oracle over the
full rectangle, both kernel routes (small-M XLA int8, large-M Pallas)."""

import numpy as np
import pytest

from conftest import random_bitmatrix
from stormtpu import cross_pairs_above, cross_topk_neighbors
from stormtpu.layout import unpack_bits
from stormtpu.oracle import oracle_count_block
from stormtpu.setops import derive_similarity


def _pair(m_bits, seed):
    a = random_bitmatrix(30, m_bits, 0.35, seed=seed)
    b = random_bitmatrix(44, m_bits, 0.3, seed=seed + 1)
    return a, b


@pytest.mark.parametrize("m_bits", [512, 40_000])
def test_cross_topk_matches_oracle(m_bits):
    a, b = _pair(m_bits, 7)
    c = oracle_count_block(a.packed, b.packed).astype(np.int64)
    vals, idx = cross_topk_neighbors(a, b, 5)
    want = -np.sort(-c, axis=1)[:, :5]
    np.testing.assert_array_equal(vals, want)
    # indices realize the claimed counts
    for r in range(a.n):
        for t in range(5):
            assert c[r, idx[r, t]] == vals[r, t]
    # ties break toward lower B index
    for r in range(a.n):
        seen = set()
        for t in range(5):
            assert idx[r, t] not in seen
            seen.add(idx[r, t])


def test_cross_topk_k_bounds_and_mismatch():
    a, b = _pair(512, 9)
    with pytest.raises(ValueError):
        cross_topk_neighbors(a, b, 0)
    with pytest.raises(ValueError):
        cross_topk_neighbors(a, b, b.n + 1)
    c = random_bitmatrix(10, 1024, 0.3, seed=3)
    with pytest.raises(ValueError, match="mismatch"):
        cross_topk_neighbors(a, c, 2)


@pytest.mark.parametrize("m_bits", [512, 40_000])
@pytest.mark.parametrize("measure,threshold", [
    ("count", 40), ("jaccard", 0.2), ("r2", 0.05),
])
def test_cross_pairs_above_matches_oracle(m_bits, measure, threshold):
    a, b = _pair(m_bits, 11)
    c = oracle_count_block(a.packed, b.packed).astype(np.int64)
    if measure == "count":
        want = c
    else:
        want = derive_similarity(
            c, a.row_nnz[:, None], b.row_nnz[None, :], a.m_bits, measure
        )
    wi, wj = np.nonzero(want >= threshold)
    ii, jj, vv = cross_pairs_above(a, b, threshold, measure=measure)
    np.testing.assert_array_equal(ii, wi, err_msg=f"{measure}@{m_bits}")
    np.testing.assert_array_equal(jj, wj, err_msg=f"{measure}@{m_bits}")
    if measure == "count":
        np.testing.assert_array_equal(vv, c[wi, wj])
    else:
        np.testing.assert_allclose(vv, want[wi, wj], rtol=0, atol=0)


def test_cross_pairs_above_no_hits_and_full_rectangle():
    a, b = _pair(512, 13)
    ii, jj, vv = cross_pairs_above(a, b, 513)
    assert ii.size == jj.size == vv.size == 0
    # threshold 1: same-matrix cross scores the diagonal too (documented)
    ii, jj, vv = cross_pairs_above(a, a, int(a.row_nnz.min()) or 1)
    c = oracle_count_block(a.packed, a.packed)
    assert set(zip(ii.tolist(), jj.tolist())) >= {
        (r, r) for r in range(a.n) if c[r, r] >= max(int(a.row_nnz.min()), 1)
    }


def test_cross_budget_guard(monkeypatch):
    """A budget too small for even a 32-row B chunk refuses; one that
    fits a sub-B chunk silently walks B in chunks instead."""
    a, b = _pair(512, 17)
    monkeypatch.setenv("STORMTPU_DEVICE_REFUSE_BUDGET_BYTES", "1000")
    with pytest.raises(ValueError, match="B chunk"):
        cross_topk_neighbors(a, b, 3)
    with pytest.raises(ValueError, match="B chunk"):
        cross_pairs_above(a, b, 10)


def test_cross_chunked_walk_matches_single_chunk(monkeypatch):
    """Force a multi-chunk B walk via a small budget: values must equal
    the unchunked route exactly (top-k merged on host, screen row-major
    after the chunk-major emit)."""
    from stormtpu.cross import _b_chunk_rows

    a = random_bitmatrix(30, 512, 0.35, seed=19)
    b = random_bitmatrix(150, 512, 0.3, seed=20)
    c = oracle_count_block(a.packed, b.packed).astype(np.int64)
    want_vals = -np.sort(-c, axis=1)[:, :5]
    want_hits = np.nonzero(c >= 45)

    # budget sized so ~64 B rows fit next to the 32-row A block
    bl, w = 32, a.n_words
    budget = 4 * (32 * w + bl * w) + 70 * (4 * (w + bl) + bl // 8)
    monkeypatch.setenv("STORMTPU_DEVICE_REFUSE_BUDGET_BYTES", str(budget))
    cb = _b_chunk_rows(b.n, w, bl, 32, bitmap=True)
    assert cb < b.n, "budget did not force chunking"

    vals, idx = cross_topk_neighbors(a, b, 5)
    np.testing.assert_array_equal(vals, want_vals)
    for r in range(a.n):
        for t in range(5):
            assert c[r, idx[r, t]] == vals[r, t]

    ii, jj, vv = cross_pairs_above(a, b, 45)
    np.testing.assert_array_equal(ii, want_hits[0])
    np.testing.assert_array_equal(jj, want_hits[1])
    np.testing.assert_array_equal(vv, c[want_hits])

    # k larger than the chunk window must refuse with guidance
    with pytest.raises(ValueError, match="exceeds the"):
        cross_topk_neighbors(a, b, cb + 1)


def test_distributed_cross_matches_single_chip():
    """A replicated, B row-sharded over the 8-device mesh: values equal
    the single-chip cross forms (and the oracle) exactly."""
    from stormtpu.parallel import (
        distributed_cross_pairs_above,
        distributed_cross_topk_neighbors,
        make_row_mesh,
    )

    mesh = make_row_mesh(8)
    a = random_bitmatrix(22, 600, 0.35, seed=31)
    b = random_bitmatrix(100, 600, 0.3, seed=32)  # ragged: 100 % 8 != 0
    c = oracle_count_block(a.packed, b.packed).astype(np.int64)

    vals, idx = distributed_cross_topk_neighbors(a, b, 5, mesh=mesh)
    np.testing.assert_array_equal(vals, -np.sort(-c, axis=1)[:, :5])
    for r in range(a.n):
        for t in range(5):
            assert c[r, idx[r, t]] == vals[r, t]

    for measure, thr in (("count", 55), ("jaccard", 0.25), ("r2", 0.05)):
        ii, jj, vv = distributed_cross_pairs_above(
            a, b, thr, measure=measure, mesh=mesh
        )
        ii1, jj1, vv1 = cross_pairs_above(a, b, thr, measure=measure)
        np.testing.assert_array_equal(ii, ii1, err_msg=measure)
        np.testing.assert_array_equal(jj, jj1, err_msg=measure)
        np.testing.assert_allclose(vv, vv1, rtol=0, atol=0, err_msg=measure)

    import pytest

    # n_loc = round_up(100, 8*32)/8 = 32 rows per shard; k above it must
    # refuse (each device ranks only its own shard)
    with pytest.raises(ValueError, match="B shard"):
        distributed_cross_topk_neighbors(a, b, 33, mesh=mesh)


def test_distributed_cross_2d_mesh():
    """Cross queries on the composed rows × bits mesh: the panel is
    row- AND word-sharded, psum completes each count block; values equal
    the single-chip forms."""
    from stormtpu.parallel import (
        distributed_cross_pairs_above,
        distributed_cross_topk_neighbors,
        make_grid_mesh,
    )

    a = random_bitmatrix(15, 580, 0.35, seed=81)
    b = random_bitmatrix(90, 580, 0.3, seed=82)
    c = oracle_count_block(a.packed, b.packed).astype(np.int64)
    for rr, rb in ((4, 2), (2, 4)):
        mesh = make_grid_mesh(rr, rb)
        vals, idx = distributed_cross_topk_neighbors(a, b, 4, mesh=mesh)
        np.testing.assert_array_equal(
            vals, -np.sort(-c, axis=1)[:, :4], err_msg=f"{rr}x{rb}"
        )
        for r in range(a.n):
            for t in range(4):
                assert c[r, idx[r, t]] == vals[r, t]
        ii, jj, vv = distributed_cross_pairs_above(a, b, 52, mesh=mesh)
        ii1, jj1, vv1 = cross_pairs_above(a, b, 52)
        np.testing.assert_array_equal(ii, ii1, err_msg=f"{rr}x{rb}")
        np.testing.assert_array_equal(jj, jj1, err_msg=f"{rr}x{rb}")
        np.testing.assert_array_equal(vv, vv1, err_msg=f"{rr}x{rb}")


@pytest.mark.parametrize("measure", ["jaccard", "r2"])
def test_cross_topk_measure_exact(measure):
    from stormtpu.setops import derive_similarity

    a = random_bitmatrix(30, 700, 0.25, seed=81)
    b = random_bitmatrix(90, 700, 0.3, seed=82)
    k = 6
    vals, idx = cross_topk_neighbors(a, b, k, measure=measure)
    inter = (unpack_bits(a.packed, a.m_bits).astype(np.int64)
             @ unpack_bits(b.packed, b.m_bits).astype(np.int64).T)
    sim = derive_similarity(inter, a.row_nnz[:, None], b.row_nnz[None, :],
                            a.m_bits, measure)
    for r in range(a.n):
        want = np.lexsort((np.arange(b.n), -sim[r]))[:k]
        np.testing.assert_array_equal(idx[r], want)
        np.testing.assert_array_equal(vals[r], sim[r][want])
    assert vals.dtype == np.float64 and idx.dtype == np.int32


def test_cross_topk_measure_tie_heavy():
    # tiny M: integer-ratio similarities collide, exercising both the
    # certification escalation and the lower-index tie contract
    from stormtpu.setops import derive_similarity

    a = random_bitmatrix(16, 64, 0.5, seed=83)
    b = random_bitmatrix(120, 64, 0.5, seed=84)
    vals, idx = cross_topk_neighbors(a, b, 10, measure="jaccard")
    inter = (unpack_bits(a.packed, a.m_bits).astype(np.int64)
             @ unpack_bits(b.packed, b.m_bits).astype(np.int64).T)
    sim = derive_similarity(inter, a.row_nnz[:, None], b.row_nnz[None, :],
                            a.m_bits, "jaccard")
    for r in range(a.n):
        want = np.lexsort((np.arange(b.n), -sim[r]))[:10]
        np.testing.assert_array_equal(idx[r], want)
        np.testing.assert_array_equal(vals[r], sim[r][want])


def test_cross_topk_measure_count_path_unchanged():
    a = random_bitmatrix(8, 256, 0.3, seed=85)
    b = random_bitmatrix(20, 256, 0.3, seed=86)
    v1, i1 = cross_topk_neighbors(a, b, 3)
    v2, i2 = cross_topk_neighbors(a, b, 3, measure="count")
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(i1, i2)
    assert v1.dtype == np.int32
    with pytest.raises(ValueError):
        cross_topk_neighbors(a, b, 3, measure="bogus")


def test_cross_topk_measure_chunked_walk(monkeypatch):
    """Forced multi-chunk B walk: the certified per-chunk candidate sets
    must merge to the exact global similarity top-k."""
    from stormtpu.cross import _b_chunk_rows

    a = random_bitmatrix(20, 512, 0.35, seed=87)
    b = random_bitmatrix(150, 512, 0.3, seed=88)
    bl, w = 32, a.n_words
    budget = 4 * (32 * w + bl * w) + 70 * (4 * (w + bl) + bl // 8)
    monkeypatch.setenv("STORMTPU_DEVICE_REFUSE_BUDGET_BYTES", str(budget))
    cb = _b_chunk_rows(b.n, w, bl, 32, bitmap=False)
    assert cb < b.n, "budget did not force chunking"

    vals, idx = cross_topk_neighbors(a, b, 5, measure="jaccard")
    inter = (unpack_bits(a.packed, a.m_bits).astype(np.int64)
             @ unpack_bits(b.packed, b.m_bits).astype(np.int64).T)
    sim = derive_similarity(inter, a.row_nnz[:, None], b.row_nnz[None, :],
                            a.m_bits, "jaccard")
    for r in range(a.n):
        want = np.lexsort((np.arange(b.n), -sim[r]))[:5]
        np.testing.assert_array_equal(idx[r], want)
        np.testing.assert_array_equal(vals[r], sim[r][want])


def test_cross_topk_measure_escalation(monkeypatch):
    """Force certification failure (huge slack) so kk escalates to the
    full chunk; the enumerated result must still be exact."""
    import stormtpu.cross as cross

    monkeypatch.setattr(cross, "_MEASURE_TOPK_SLACK", 1.0)
    kks = []
    orig = cross._cross_topk_measure_block

    def spy(*a, **kw):
        kks.append(kw["kk"])
        return orig(*a, **kw)

    monkeypatch.setattr(cross, "_cross_topk_measure_block", spy)
    a = random_bitmatrix(10, 256, 0.3, seed=89)
    b = random_bitmatrix(100, 256, 0.3, seed=90)
    vals, idx = cross_topk_neighbors(a, b, 4, measure="jaccard")
    assert max(kks) > min(kks), "escalation never fired"
    inter = (unpack_bits(a.packed, a.m_bits).astype(np.int64)
             @ unpack_bits(b.packed, b.m_bits).astype(np.int64).T)
    sim = derive_similarity(inter, a.row_nnz[:, None], b.row_nnz[None, :],
                            a.m_bits, "jaccard")
    for r in range(a.n):
        want = np.lexsort((np.arange(b.n), -sim[r]))[:4]
        np.testing.assert_array_equal(idx[r], want)
        np.testing.assert_array_equal(vals[r], sim[r][want])


def test_cross_queries_on_memmap_panel(tmp_path):
    """Disk-resident reference panels (io.save_bitmatrix_mmap) feed the
    cross queries directly — the B walk slices the memmap per chunk, so
    the panel is disk-bounded, not RAM-bounded."""
    from stormtpu.io import load_bitmatrix_mmap, save_bitmatrix_mmap

    a = random_bitmatrix(12, 512, 0.3, seed=94)
    b = random_bitmatrix(64, 512, 0.3, seed=95)
    path = tmp_path / "panel"
    save_bitmatrix_mmap(b, str(path))
    b_mm = load_bitmatrix_mmap(str(path))
    # from_packed re-bases the memmap to a plain ndarray VIEW (subok
    # normalization) — assert it still shares the mapped file buffer,
    # i.e. no copy was made
    import mmap as _mmap

    assert not b_mm.packed.flags.owndata
    assert b_mm.packed.flags.writeable is False
    base = b_mm.packed
    while getattr(base, "base", None) is not None:
        base = base.base
    assert isinstance(base, _mmap.mmap)  # the buffer IS the mapped file
    v1, i1 = cross_topk_neighbors(a, b, 4)
    v2, i2 = cross_topk_neighbors(a, b_mm, 4)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(i1, i2)
    mv1, mi1 = cross_topk_neighbors(a, b, 4, measure="jaccard")
    mv2, mi2 = cross_topk_neighbors(a, b_mm, 4, measure="jaccard")
    np.testing.assert_array_equal(mv1, mv2)
    np.testing.assert_array_equal(mi1, mi2)
    s1 = cross_pairs_above(a, b, 30)
    s2 = cross_pairs_above(a, b_mm, 30)
    for x, y in zip(s1, s2):
        np.testing.assert_array_equal(x, y)
