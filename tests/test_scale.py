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
