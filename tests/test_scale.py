"""Config-5 machinery scale rehearsal (VERDICT r1 #7): N = 65,536 through
the distributed streaming driver on the forced 8-device CPU mesh — two
orders of magnitude above the everyday N=100 test, exercising manifest
growth, stripe I/O volume (17 GB of raw count stripes), and per-stripe
fetch_global gathers at real size. Opt-in (STORMTPU_SLOW_TESTS=1): takes
minutes and tens of GB of disk.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("STORMTPU_SLOW_TESTS"),
    reason="scale rehearsal takes minutes + ~20 GB disk; set "
    "STORMTPU_SLOW_TESTS=1",
)


def test_scale_rehearsal_n65536(tmp_path):
    import jax

    from stormtpu.layout import BitMatrix
    from stormtpu.parallel import (
        distributed_stream_count_matrix,
        make_row_mesh,
    )
    from stormtpu.stream import stripe_path

    assert len(jax.devices()) >= 8
    mesh = make_row_mesh(8)
    n, m = 65_536, 512
    rng = np.random.default_rng(65536)
    # ~10% density keeps counts small; packed is 4 MB — the output is the
    # scale under test (65536² × int32 = 17 GB of stripes)
    packed = rng.integers(0, 2**32, (n, m // 32), dtype=np.uint32)
    packed &= rng.integers(0, 2**32, (n, m // 32), dtype=np.uint32)
    packed &= rng.integers(0, 2**32, (n, m // 32), dtype=np.uint32)
    bm = BitMatrix.from_packed(packed, m_bits=m)

    out = str(tmp_path / "stripes")
    man = distributed_stream_count_matrix(
        bm, out, superblock_rows=8192, mesh=mesh, compress=False,
    )
    assert man["n_super"] == 8
    assert len(man["completed"]) == 36
    assert os.path.exists(os.path.join(out, "manifest.json"))

    # sampled exactness on three stripes (diagonal, off-diagonal, last)
    sb = man["superblock_rows"]
    for (i, j) in ((0, 0), (0, 7), (7, 7)):
        with np.load(stripe_path(out, i, j)) as z:
            stripe = z["counts"]
        assert stripe.shape == (sb, sb)
        for _ in range(64):
            a = int(rng.integers(0, sb))
            b = int(rng.integers(0, sb))
            gi, gj = i * sb + a, j * sb + b
            want = int(np.bitwise_count(packed[gi] & packed[gj]).sum())
            assert stripe[a, b] == want, (gi, gj)

    # resume: a second run must skip every completed stripe (no recompute)
    import time

    t0 = time.time()
    man2 = distributed_stream_count_matrix(
        bm, out, superblock_rows=8192, mesh=mesh, compress=False,
    )
    assert len(man2["completed"]) == 36
    assert time.time() - t0 < 30, "resume recomputed stripes"


def _banded_packed(n: int, words: int, band: int, seed: int) -> np.ndarray:
    """Rows nonzero only in the FIRST and LAST ``band``-row superblocks —
    the block-clustered shape whose C8 summary skip makes an N=262,144
    walk feasible on the 1-core CPU runner: every stripe between
    all-zero superblocks is a host-only skip, so the test exercises the
    metadata scale (checkpoint arrays ∝ n_pad·k, manifest length,
    thousands of stripe records) without the O(N²·W) device compute the
    real chip would do (VERDICT r2 #6)."""
    rng = np.random.default_rng(seed)

    def blk() -> np.ndarray:
        x = rng.integers(0, 2**32, (band, words), dtype=np.uint32)
        x &= rng.integers(0, 2**32, (band, words), dtype=np.uint32)
        x &= rng.integers(0, 2**32, (band, words), dtype=np.uint32)
        return x

    packed = np.zeros((n, words), dtype=np.uint32)
    packed[:band] = blk()
    packed[n - band :] = blk()
    return packed


def test_scale_rehearsal_stream_topk_n262144(tmp_path):
    """VERDICT r2 #6: stream_topk_neighbors resume at N=262,144 (tiny M,
    k=4 — output is O(N·k)), sampled exact."""
    import time

    from stormtpu.layout import BitMatrix
    from stormtpu.stream_query import stream_topk_neighbors

    n, m, k, sb = 262_144, 512, 4, 4096
    packed = _banded_packed(n, m // 32, sb, seed=262144)
    bm = BitMatrix.from_packed(packed, m_bits=m)
    out = str(tmp_path / "topk262k")

    vals, idx = stream_topk_neighbors(bm, k, superblock_rows=sb,
                                      out_dir=out)
    assert vals.shape == (n, k) and idx.shape == (n, k)

    # sampled exactness: brute-force top-k over the nonzero band (all
    # other partners count exactly 0, which the (0, 0) convention emits)
    band_rows = np.concatenate([np.arange(sb), np.arange(n - sb, n)])
    band = packed[band_rows]
    rng = np.random.default_rng(7)
    for r in map(int, rng.choice(band_rows, 48, replace=False)):
        c = np.bitwise_count(band & packed[r]).sum(axis=1, dtype=np.int64)
        c[band_rows == r] = -1  # self excluded
        want = np.maximum(-np.sort(-c)[:k], 0)
        np.testing.assert_array_equal(vals[r], want, err_msg=f"row {r}")
        for t in range(k):
            if vals[r, t] > 0:
                got = int(np.bitwise_count(packed[r] & packed[idx[r, t]])
                          .sum())
                assert got == vals[r, t] and idx[r, t] != r
    # all-zero rows report no partners
    assert not vals[sb : n - sb].any() and not idx[sb : n - sb].any()

    # resume: the checkpoint's next_i points past the last dirty row, so
    # a second run replays no stripe (device-free, near-instant)
    t0 = time.time()
    vals2, idx2 = stream_topk_neighbors(bm, k, superblock_rows=sb,
                                        out_dir=out)
    assert time.time() - t0 < 60, "resume recomputed stripes"
    np.testing.assert_array_equal(vals, vals2)
    np.testing.assert_array_equal(idx, idx2)


def test_scale_rehearsal_distributed_stream_n262144(tmp_path):
    """VERDICT r2 #6: distributed_stream_count_matrix resume at
    N=262,144 on the forced 8-device mesh — 528-stripe manifest, zero
    stripes as empty sparse-tile records, sampled exact."""
    import time

    import jax

    from stormtpu.layout import BitMatrix
    from stormtpu.parallel import (
        distributed_stream_count_matrix,
        make_row_mesh,
    )
    from stormtpu.stream import stripe_path

    assert len(jax.devices()) >= 8
    mesh = make_row_mesh(8)
    n, m, sb = 262_144, 512, 8192
    packed = _banded_packed(n, m // 32, sb, seed=524288)
    bm = BitMatrix.from_packed(packed, m_bits=m)
    out = str(tmp_path / "stripes262k")

    man = distributed_stream_count_matrix(
        bm, out, superblock_rows=sb, mesh=mesh, compress=False,
    )
    n_super = n // sb
    assert man["n_super"] == n_super
    assert len(man["completed"]) == n_super * (n_super + 1) // 2  # 528

    rng = np.random.default_rng(11)
    # real stripes (the nonzero corners) are dense [sb, sb] counts …
    for (i, j) in ((0, 0), (0, n_super - 1), (n_super - 1, n_super - 1)):
        with np.load(stripe_path(out, i, j)) as z:
            stripe = z["counts"]
        assert stripe.shape == (sb, sb)
        for _ in range(48):
            a, b = int(rng.integers(0, sb)), int(rng.integers(0, sb))
            gi, gj = i * sb + a, j * sb + b
            want = int(np.bitwise_count(packed[gi] & packed[gj]).sum())
            assert stripe[a, b] == want, (gi, gj)
    # … and summary-skipped stripes are empty sparse-tile records
    with np.load(stripe_path(out, 3, 17)) as z:
        assert z["tiles"].shape[0] == 0

    t0 = time.time()
    man2 = distributed_stream_count_matrix(
        bm, out, superblock_rows=sb, mesh=mesh, compress=False,
    )
    assert len(man2["completed"]) == len(man["completed"])
    assert time.time() - t0 < 60, "resume recomputed stripes"


def _rss_mb() -> float:
    import resource

    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def test_scale_rehearsal_n1m_distributed_stream(tmp_path):
    """VERDICT r3 #1: config 5's row count N=1,048,576 output-bounded
    through the distributed streaming driver (8-device mesh, memmap-backed
    panel): 128-superblock manifest (8256 stripes), sampled exact, resume
    zero-recompute, wall/RSS recorded."""
    import time

    import jax

    from stormtpu.io import load_bitmatrix_mmap, save_bitmatrix_mmap
    from stormtpu.parallel import (
        distributed_stream_count_matrix,
        make_row_mesh,
    )
    from stormtpu.stream import stripe_path

    assert len(jax.devices()) >= 8
    mesh = make_row_mesh(8)
    n, m, sb = 1_048_576, 512, 8192
    packed = _banded_packed(n, m // 32, sb, seed=1048576)
    from stormtpu.layout import BitMatrix

    save_bitmatrix_mmap(BitMatrix.from_packed(packed, m_bits=m),
                        str(tmp_path / "panel"))
    bm = load_bitmatrix_mmap(str(tmp_path / "panel"))  # memmap tier
    # from_packed strips the memmap SUBCLASS but the view stays
    # disk-backed (test_io.py's base check)
    import mmap as _mmap

    assert isinstance(bm.packed.base, (np.memmap, _mmap.mmap))

    out = str(tmp_path / "stripes1m")
    t0 = time.time()
    man = distributed_stream_count_matrix(
        bm, out, superblock_rows=sb, mesh=mesh, compress=False,
    )
    wall = time.time() - t0
    n_super = n // sb
    assert man["n_super"] == n_super == 128
    assert len(man["completed"]) == n_super * (n_super + 1) // 2  # 8256

    rng = np.random.default_rng(13)
    for (i, j) in ((0, 0), (0, n_super - 1), (n_super - 1, n_super - 1)):
        with np.load(stripe_path(out, i, j)) as z:
            stripe = z["counts"]
        assert stripe.shape == (sb, sb)
        for _ in range(32):
            a, b = int(rng.integers(0, sb)), int(rng.integers(0, sb))
            gi, gj = i * sb + a, j * sb + b
            want = int(np.bitwise_count(packed[gi] & packed[gj]).sum())
            assert stripe[a, b] == want, (gi, gj)
    with np.load(stripe_path(out, 5, 99)) as z:  # summary-skipped stripe
        assert z["tiles"].shape[0] == 0

    t0 = time.time()
    man2 = distributed_stream_count_matrix(
        bm, out, superblock_rows=sb, mesh=mesh, compress=False,
    )
    resume_s = time.time() - t0
    assert len(man2["completed"]) == len(man["completed"])
    assert resume_s < 120, f"resume recomputed stripes ({resume_s:.0f}s)"
    print(f"[scale1m] distributed stream: wall {wall:.1f}s, "
          f"resume {resume_s:.1f}s, peak RSS {_rss_mb():.0f} MB")


def test_scale_rehearsal_n1m_stream_topk_resume(tmp_path):
    """VERDICT r3 #1: stream_topk_neighbors at N=1,048,576 (k=4, banded,
    memmap-backed), checkpointed + resumed with zero recompute; running
    best = 4M entries (the metadata decade the 262k test stopped short
    of)."""
    import time

    from stormtpu.io import load_bitmatrix_mmap, save_bitmatrix_mmap
    from stormtpu.layout import BitMatrix
    from stormtpu.stream_query import stream_topk_neighbors

    n, m, k, sb = 1_048_576, 512, 4, 8192
    packed = _banded_packed(n, m // 32, sb, seed=2097152)
    save_bitmatrix_mmap(BitMatrix.from_packed(packed, m_bits=m),
                        str(tmp_path / "panel"))
    bm = load_bitmatrix_mmap(str(tmp_path / "panel"))
    out = str(tmp_path / "topk1m")

    t0 = time.time()
    vals, idx = stream_topk_neighbors(bm, k, superblock_rows=sb,
                                      out_dir=out)
    wall = time.time() - t0
    assert vals.shape == (n, k) and idx.shape == (n, k)

    band_rows = np.concatenate([np.arange(sb), np.arange(n - sb, n)])
    band = packed[band_rows]
    rng = np.random.default_rng(7)
    for r in map(int, rng.choice(band_rows, 32, replace=False)):
        c = np.bitwise_count(band & packed[r]).sum(axis=1, dtype=np.int64)
        c[band_rows == r] = -1
        want = np.maximum(-np.sort(-c)[:k], 0)
        np.testing.assert_array_equal(vals[r], want, err_msg=f"row {r}")
    assert not vals[sb : n - sb].any() and not idx[sb : n - sb].any()

    t0 = time.time()
    vals2, idx2 = stream_topk_neighbors(bm, k, superblock_rows=sb,
                                        out_dir=out)
    resume_s = time.time() - t0
    assert resume_s < 120, f"resume recomputed stripes ({resume_s:.0f}s)"
    np.testing.assert_array_equal(vals, vals2)
    np.testing.assert_array_equal(idx, idx2)
    print(f"[scale1m] stream topk: wall {wall:.1f}s, resume {resume_s:.1f}s, "
          f"peak RSS {_rss_mb():.0f} MB")


def test_scale_rehearsal_n1m_sparse_k4_walk(tmp_path):
    """VERDICT r3 #1: the per-superblock K4 walk at N=1,048,576 extreme
    sparsity (~0.05 set bits/row — the d≈1e-5-class regime scaled to the
    512-bit universe). Every occupied stripe takes the buffer-free COO
    emission path (the r4 fix: the dense sb² fill+scan would cost the
    8256-stripe walk ~30 min of pure buffer traffic); the full emitted
    COO set is verified against an independent per-column pair count."""
    import time
    from collections import defaultdict

    from stormtpu.layout import BitMatrix
    from stormtpu.native import HAVE_NATIVE
    from stormtpu.stream import stream_count_matrix, stripe_path

    if not HAVE_NATIVE:
        pytest.skip("needs the native K4 tier")

    n, m, sb = 1_048_576, 512, 8192
    rng = np.random.default_rng(31415)
    nnz = 52_000
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, m, nnz)
    bm = BitMatrix.from_positions(rows, cols, n, m)

    out = str(tmp_path / "sparse1m")
    t0 = time.time()
    man = stream_count_matrix(
        bm, out, superblock_rows=sb, kernel="sparse_outer", compress=False,
    )
    wall = time.time() - t0
    n_super = n // sb
    assert man["n_super"] == n_super
    assert man["stripe_kernels"]["k4"] == n_super * (n_super + 1) // 2

    # independent expectation: per-column row lists -> pair co-occurrence
    want: dict = defaultdict(int)
    by_col = defaultdict(list)
    dedup = set(zip(rows.tolist(), cols.tolist()))
    for r, c in dedup:
        by_col[c].append(r)
    for c, rs in by_col.items():
        rs.sort()
        for x in range(len(rs)):
            for y in range(x, len(rs)):
                want[(rs[x], rs[y])] += 1

    got: dict = {}
    for i, j in man["completed"]:
        with np.load(stripe_path(out, i, j)) as z:
            for a, b, v in zip(z["coo_i"], z["coo_j"], z["coo_v"]):
                gi, gj = i * sb + int(a), j * sb + int(b)
                if gi <= gj:  # diagonal stripes carry the mirrored square
                    got[(gi, gj)] = int(v)
    assert got == dict(want), (
        f"COO mismatch: {len(got)} got vs {len(want)} want"
    )

    t0 = time.time()
    stream_count_matrix(bm, out, superblock_rows=sb,
                        kernel="sparse_outer", compress=False)
    resume_s = time.time() - t0
    assert resume_s < 120, f"resume recomputed stripes ({resume_s:.0f}s)"
    print(f"[scale1m] sparse K4 walk: wall {wall:.1f}s, "
          f"resume {resume_s:.1f}s, peak RSS {_rss_mb():.0f} MB, "
          f"{len(got)} nonzero pairs")


def test_scale_rehearsal_n1m_sparse_queries(tmp_path):
    """r4 follow-through on the BASELINE.md gap note: the sparse QUERY
    walks at N=1,048,576 extreme sparsity — stream_topk_neighbors and
    stream_pairs_above ride the same buffer-free _CooStripe path as the
    counts walk (before it, 8256 dense sb² buffers ≈ 30 min of traffic).
    Sampled exact against per-column brute force."""
    import time
    from collections import defaultdict

    from stormtpu.layout import BitMatrix
    from stormtpu.native import HAVE_NATIVE
    from stormtpu.stream_query import (
        stream_pairs_above,
        stream_topk_neighbors,
    )

    if not HAVE_NATIVE:
        pytest.skip("needs the native K4 tier")

    n, m, sb, k = 1_048_576, 512, 8192, 4
    rng = np.random.default_rng(27182)
    nnz = 52_000
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, m, nnz)
    bm = BitMatrix.from_positions(rows, cols, n, m)

    # independent expectation: per-column co-occurrence counts
    want: dict = defaultdict(int)
    by_col = defaultdict(list)
    for r, c in set(zip(rows.tolist(), cols.tolist())):
        by_col[c].append(r)
    for c, rs in by_col.items():
        rs.sort()
        for x in range(len(rs)):
            for y in range(x + 1, len(rs)):
                want[(rs[x], rs[y])] += 1

    t0 = time.time()
    vals, idx = stream_topk_neighbors(bm, k, superblock_rows=sb,
                                      kernel="auto")
    wall_topk = time.time() - t0
    assert vals.shape == (n, k)
    # brute per-row partner lists from the pair dict
    partners: dict = defaultdict(list)
    for (a, b), v in want.items():
        partners[a].append((v, b))
        partners[b].append((v, a))
    hot = sorted(partners, key=lambda r: -len(partners[r]))[:16]
    sample = hot + [r for r in map(int, rng.choice(list(partners), 32))]
    for r in sample:
        ps = sorted(partners[r], key=lambda t: -t[0])[:k]
        want_vals = np.zeros(k, dtype=np.int64)
        want_vals[: len(ps)] = [v for v, _ in ps]
        np.testing.assert_array_equal(vals[r], want_vals, err_msg=f"row {r}")
    # rows with no partners carry the (0, 0) convention
    empty_rows = [r for r in range(0, n, 65537) if r not in partners]
    for r in empty_rows:
        assert not vals[r].any() and not idx[r].any()

    t0 = time.time()
    ii, jj, vv = stream_pairs_above(bm, 1, superblock_rows=sb,
                                    kernel="auto")
    wall_screen = time.time() - t0
    got = {(int(a), int(b)): int(v) for a, b, v in zip(ii, jj, vv)}
    assert got == dict(want), (
        f"screen mismatch: {len(got)} got vs {len(want)} want"
    )
    print(f"[scale1m] sparse queries: topk {wall_topk:.1f}s, "
          f"screen {wall_screen:.1f}s, peak RSS {_rss_mb():.0f} MB, "
          f"{len(want)} true pairs")


def test_scale_rehearsal_n1m_sparse_aggregate_stats(tmp_path):
    """r5 (VERDICT r4 #1/#7): the aggregate sinks at N=1,048,576 extreme
    sparsity. count_histogram auto-routes to the K4 COO-stripe binning
    (every stripe host-side; the old dense-only sink would walk 8256 MXU
    stripes) and count_row_sums rides the O(nnz) positions route — both
    exact against an independent per-column co-occurrence expectation."""
    import time
    from collections import defaultdict

    from stormtpu.layout import BitMatrix
    from stormtpu.native import HAVE_NATIVE
    from stormtpu.stats import count_histogram, count_row_sums

    if not HAVE_NATIVE:
        pytest.skip("needs the native K4 tier")

    n, m, sb = 1_048_576, 512, 8192
    rng = np.random.default_rng(16180)
    nnz = 52_000
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, m, nnz)
    bm = BitMatrix.from_positions(rows, cols, n, m)

    # independent expectation: per-column co-occurrence (strict pairs)
    want: dict = defaultdict(int)
    by_col = defaultdict(list)
    dedup = set(zip(rows.tolist(), cols.tolist()))
    for r, c in dedup:
        by_col[c].append(r)
    for c, rs in by_col.items():
        rs.sort()
        for x in range(len(rs)):
            for y in range(x + 1, len(rs)):
                want[(rs[x], rs[y])] += 1

    n_bins = 8
    t0 = time.time()
    man = count_histogram(bm, n_bins=n_bins, bin_width=1,
                          superblock_rows=sb, method="auto")
    wall_hist = time.time() - t0
    assert man["kernel"] == "sparse_outer", man["kernel"]
    assert man["stripe_kernels"]["dense"] == 0
    want_h = np.zeros(n_bins, dtype=np.int64)
    for v in want.values():
        want_h[min(v, n_bins - 1)] += 1
    want_h[0] = n * (n - 1) // 2 - sum(want_h[1:])
    np.testing.assert_array_equal(man["hist"], want_h)

    t0 = time.time()
    sums = count_row_sums(bm)
    wall_rs = time.time() - t0
    # brute expectation for sampled rows: partner dict + the self term
    partners = defaultdict(int)
    for (a, b), v in want.items():
        partners[a] += v
        partners[b] += v
    row_nnz = defaultdict(int)
    for r, _ in dedup:
        row_nnz[r] += 1
    hot = sorted(partners, key=lambda r: -partners[r])[:16]
    for r in hot + [int(x) for x in rng.choice(list(row_nnz), 32)]:
        assert sums[r] == partners[r] + row_nnz[r], r
    # rows with no set bits sum to exactly zero
    zero_rows = [r for r in range(0, n, 65537) if r not in row_nnz]
    assert not sums[zero_rows].any()
    print(f"[scale1m] sparse aggregates: hist {wall_hist:.1f}s "
          f"(all-K4, {len(want)} nonzero pairs), row_sums {wall_rs:.1f}s, "
          f"peak RSS {_rss_mb():.0f} MB")


def test_scale_rehearsal_n1m_banded_aggregate_stats(tmp_path):
    """r5 (VERDICT r4 #7): the aggregate sinks at N=1,048,576 on the
    banded panel — the mesh histogram auto-routes to the C8 stripes walk
    (8253 of 8256 stripes skipped), the host row sums ride the positions
    route, and the mesh row-sums twin agrees — all exact against an
    independent popcount/bincount expectation over the two bands."""
    import time
    from collections import defaultdict

    import jax

    from stormtpu.layout import BitMatrix
    from stormtpu.parallel import make_row_mesh
    from stormtpu.parallel.stats import (
        distributed_count_histogram,
        distributed_count_row_sums,
    )
    from stormtpu.stats import count_row_sums

    assert len(jax.devices()) >= 8
    n, m, sb = 1_048_576, 512, 8192
    packed = _banded_packed(n, m // 32, sb, seed=31337)
    bm = BitMatrix.from_packed(packed, m_bits=m)
    band_rows = np.concatenate([np.arange(sb), np.arange(n - sb, n)])
    band = packed[band_rows]

    n_bins = 16
    t0 = time.time()
    man = distributed_count_histogram(
        bm, n_bins=n_bins, mesh=make_row_mesh(8), superblock_rows=sb)
    wall_hist = time.time() - t0
    assert man["kernel"] == "stripes", man["kernel"]
    n_super = n // sb
    assert man["stripes_skipped"] == n_super * (n_super + 1) // 2 - 3
    # independent expectation: exact pair counts over the 16384 band
    # rows via unpack + float32 matmul (counts <= 512 < 2^24, exact),
    # chunked; everything else counts 0 -> bin 0
    unpacked = np.unpackbits(
        band.view(np.uint8), axis=1, bitorder="little").astype(np.float32)
    bw = man["bin_width"]
    want_h = np.zeros(n_bins, dtype=np.int64)
    nb = band.shape[0]
    for r0 in range(0, nb, 2048):
        c = (unpacked[r0 : r0 + 2048] @ unpacked.T).astype(np.int64)
        # strict upper triangle in BAND-LOCAL order (band_rows is
        # globally sorted, so local i<j iff global i<j)
        li = np.arange(r0, min(r0 + 2048, nb))[:, None]
        lj = np.arange(nb)[None, :]
        vals = c[li < lj]
        want_h += np.bincount(
            np.minimum(vals // bw, n_bins - 1), minlength=n_bins)
    want_h[0] += n * (n - 1) // 2 - nb * (nb - 1) // 2
    np.testing.assert_array_equal(man["hist"], want_h)

    t0 = time.time()
    sums = count_row_sums(bm)
    wall_rs = time.time() - t0
    rng = np.random.default_rng(9)
    for r in map(int, rng.choice(band_rows, 32, replace=False)):
        want = int(np.bitwise_count(band & packed[r]).sum())
        assert sums[r] == want, r
    assert not sums[sb : n - sb].any()

    t0 = time.time()
    dsums = distributed_count_row_sums(bm, mesh=make_row_mesh(8))
    wall_drs = time.time() - t0
    np.testing.assert_array_equal(dsums, sums)
    print(f"[scale1m] banded aggregates: mesh hist {wall_hist:.1f}s "
          f"(3 occupied stripes), row_sums host {wall_rs:.1f}s / mesh "
          f"{wall_drs:.1f}s, peak RSS {_rss_mb():.0f} MB")
