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
