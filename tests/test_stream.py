"""Streaming driver: stripes exact, resume skips completed shards."""

import numpy as np
import pytest

from conftest import random_bitmatrix
from stormtpu.config import EngineConfig
from stormtpu.oracle import oracle_count_matrix
from stormtpu.stream import load_streamed_matrix, stream_count_matrix, stripe_path


def _small_cfg():
    return EngineConfig(
        k1_tile_rows=8, k1_tile_words=128, k2_tile_rows=8, k2_tile_words=8
    )


def test_stream_exact_roundtrip(tmp_path):
    bm = random_bitmatrix(40, 600, 0.3, seed=51)
    manifest = stream_count_matrix(
        bm, str(tmp_path), superblock_rows=16, config=_small_cfg(),
        interpret=True,
    )
    assert manifest["n_super"] == 3  # 40 rows -> 48 padded / 16
    got = load_streamed_matrix(str(tmp_path))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_stream_resume_skips_done(tmp_path):
    bm = random_bitmatrix(20, 300, 0.2, seed=52)
    calls = []
    stream_count_matrix(
        bm, str(tmp_path), superblock_rows=8, config=_small_cfg(),
        interpret=True, progress=lambda d, t: calls.append((d, t)),
    )
    n_first = len(calls)
    # poison one stripe file's mtime marker then re-run: everything skipped
    calls.clear()
    stream_count_matrix(
        bm, str(tmp_path), superblock_rows=8, config=_small_cfg(),
        interpret=True, progress=lambda d, t: calls.append((d, t)),
    )
    assert calls == []  # no recompute
    assert n_first > 0
    got = load_streamed_matrix(str(tmp_path))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_stream_partial_then_resume(tmp_path):
    import os

    bm = random_bitmatrix(24, 300, 0.4, seed=53)
    stream_count_matrix(
        bm, str(tmp_path), superblock_rows=8, config=_small_cfg(),
        interpret=True,
    )
    # delete one shard -> resume recomputes exactly that one
    os.remove(stripe_path(str(tmp_path), 0, 1))
    calls = []
    stream_count_matrix(
        bm, str(tmp_path), superblock_rows=8, config=_small_cfg(),
        interpret=True, progress=lambda d, t: calls.append(d),
    )
    assert len(calls) == 1
    got = load_streamed_matrix(str(tmp_path))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_stream_k1_kernel(tmp_path):
    bm = random_bitmatrix(18, 500, 0.5, seed=54)
    stream_count_matrix(
        bm, str(tmp_path), superblock_rows=8, kernel="dense",
        config=_small_cfg(), interpret=True,
    )
    got = load_streamed_matrix(str(tmp_path))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_stream_xla_kernels(tmp_path):
    for kernel in ("xla_int8", "xla_popcount"):
        d = tmp_path / kernel
        bm = random_bitmatrix(20, 400, 0.3, seed=55)
        stream_count_matrix(
            bm, str(d), superblock_rows=8, kernel=kernel,
            config=_small_cfg(), interpret=True,
        )
        got = load_streamed_matrix(str(d))
        np.testing.assert_array_equal(
            got, oracle_count_matrix(bm.packed), err_msg=kernel
        )


def test_stream_auto_kernel(tmp_path):
    bm = random_bitmatrix(20, 400, 0.3, seed=56)
    stream_count_matrix(
        bm, str(tmp_path), superblock_rows=8, kernel="auto",
        config=_small_cfg(), interpret=True,
    )
    got = load_streamed_matrix(str(tmp_path))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_stream_operand_streaming_exact(tmp_path):
    """Operand-streaming mode (HBM-as-cache: only two superblock slices
    device-resident) must produce byte-identical stripes to the resident
    walk — both Pallas tile kernels and the XLA block kernels."""
    for kernel in ("mxu", "dense", "xla_int8", "xla_popcount"):
        d = tmp_path / kernel
        bm = random_bitmatrix(40, 600, 0.3, seed=57)
        man = stream_count_matrix(
            bm, str(d), superblock_rows=16, kernel=kernel,
            config=_small_cfg(), interpret=True, operand_streaming=True,
        )
        assert man["operand_streaming"] is True
        assert man["n_super"] == 3
        got = load_streamed_matrix(str(d))
        np.testing.assert_array_equal(
            got, oracle_count_matrix(bm.packed), err_msg=kernel
        )


def test_stream_operand_streaming_auto_budget(tmp_path, monkeypatch):
    """The auto mode flips to operand streaming when the padded matrix
    exceeds the device budget, and the resident mode otherwise."""
    monkeypatch.setenv("STORMTPU_DEVICE_OPERAND_BUDGET_BYTES", "1024")
    bm = random_bitmatrix(24, 400, 0.4, seed=58)
    man = stream_count_matrix(
        bm, str(tmp_path / "steam"), superblock_rows=8,
        config=_small_cfg(), interpret=True,
    )
    assert man["operand_streaming"] is True
    got = load_streamed_matrix(str(tmp_path / "steam"))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))
    monkeypatch.setenv("STORMTPU_DEVICE_OPERAND_BUDGET_BYTES", str(1 << 40))
    man = stream_count_matrix(
        bm, str(tmp_path / "res"), superblock_rows=8,
        config=_small_cfg(), interpret=True,
    )
    assert man["operand_streaming"] is False


def test_stream_operand_streaming_resume(tmp_path):
    """Resume under operand streaming: only the missing stripe recomputes
    (and a fully-resumed run uploads nothing — progress stays empty)."""
    import os

    bm = random_bitmatrix(24, 300, 0.4, seed=59)
    stream_count_matrix(
        bm, str(tmp_path), superblock_rows=8, config=_small_cfg(),
        interpret=True, operand_streaming=True,
    )
    os.remove(stripe_path(str(tmp_path), 1, 2))
    calls = []
    stream_count_matrix(
        bm, str(tmp_path), superblock_rows=8, config=_small_cfg(),
        interpret=True, operand_streaming=True,
        progress=lambda d, t: calls.append(d),
    )
    assert len(calls) == 1
    got = load_streamed_matrix(str(tmp_path))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_stream_clustered_operand_streaming(tmp_path):
    """The clustered stripe walk under operand streaming: work-list ids
    shift to the local two-superblock frame; summary-zero stripes skip
    the upload as well as the compute. Exact vs oracle."""
    from test_clustered import CFG, block_diagonal_bitmatrix

    bm = block_diagonal_bitmatrix(128, 16384, 4, 0.3, seed=65)
    man = stream_count_matrix(
        bm, str(tmp_path), superblock_rows=32, kernel="clustered",
        config=CFG, interpret=True, operand_streaming=True,
    )
    assert man["kernel"] == "clustered"
    assert man["operand_streaming"] is True
    assert man["work_items"] > 0
    got = load_streamed_matrix(str(tmp_path))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_stream_clustered_exact(tmp_path):
    """K5 at streaming scale: block-diagonal input (every word column
    globally occupied) through the clustered stripe path — exact, and
    zero stripes never reach the device."""
    from test_clustered import CFG, block_diagonal_bitmatrix

    bm = block_diagonal_bitmatrix(128, 16384, 4, 0.3, seed=61)
    manifest = stream_count_matrix(
        bm, str(tmp_path), superblock_rows=64, kernel="clustered",
        config=CFG, interpret=True,
    )
    assert manifest["kernel"] == "clustered"
    assert manifest["n_super"] == 2
    assert manifest["work_items"] > 0
    got = load_streamed_matrix(str(tmp_path))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_stream_auto_routes_clustered(tmp_path):
    """auto dispatch reroutes to the clustered stripes when the summary
    statistic crosses the threshold (block-diagonal: wf = 0.1)."""
    from stormtpu.kernels.clustered import clustered_work_fraction
    from test_clustered import CFG, block_diagonal_bitmatrix

    bm = block_diagonal_bitmatrix(128, 16384, 4, 0.3, seed=62)
    wf = clustered_work_fraction(bm, CFG)
    assert wf is not None and wf < CFG.clustered_work_fraction_threshold
    manifest = stream_count_matrix(
        bm, str(tmp_path), superblock_rows=64, kernel="auto",
        config=CFG, interpret=True,
    )
    assert manifest["kernel"] == "clustered"
    got = load_streamed_matrix(str(tmp_path))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_stream_clustered_resume(tmp_path):
    import os

    from test_clustered import CFG, block_diagonal_bitmatrix

    bm = block_diagonal_bitmatrix(96, 12800, 4, 0.35, seed=63)
    stream_count_matrix(
        bm, str(tmp_path), superblock_rows=32, kernel="clustered",
        config=CFG, interpret=True,
    )
    os.remove(stripe_path(str(tmp_path), 0, 1))
    calls = []
    stream_count_matrix(
        bm, str(tmp_path), superblock_rows=32, kernel="clustered",
        config=CFG, interpret=True, progress=lambda d, t: calls.append(d),
    )
    assert len(calls) == 1
    got = load_streamed_matrix(str(tmp_path))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_stream_clustered_random_dense_input(tmp_path):
    """Uniform-random input through the explicit clustered kernel stays
    exact (every cell co-occupied → no skip, pure overhead case)."""
    from test_clustered import CFG

    bm = random_bitmatrix(64, 12800, 0.4, seed=64)
    stream_count_matrix(
        bm, str(tmp_path), superblock_rows=32, kernel="clustered",
        config=CFG, interpret=True,
    )
    got = load_streamed_matrix(str(tmp_path))
    np.testing.assert_array_equal(got, oracle_count_matrix(bm.packed))


def test_stream_checksums_clustered(tmp_path):
    """The clustered checksum sink must agree with the dense checksum
    walk stripe-for-stripe on the same input (skipped tiles are exact
    zeros either way) and its samples must match the oracle — including
    samples landing on summary-skipped tiles."""
    import jax.numpy as jnp

    from stormtpu.config import default_config
    from stormtpu.stream import (
        stream_count_checksums,
        stream_count_checksums_clustered,
    )
    from stormtpu.utils import round_up
    from test_clustered import block_diagonal_bitmatrix

    bm = block_diagonal_bitmatrix(600, 16384, 4, 0.3, seed=78)
    cfg = default_config()
    ti, wk = cfg.k2_tile_rows, cfg.k2_tile_words
    # one tile-block per superblock: tile-blocks 0 and 2 occupy disjoint
    # K-groups, so stripe (0, 2) is summary-zero (skipped entirely)
    sb = round_up(256, ti)

    man_c = stream_count_checksums_clustered(
        bm, superblock_rows=sb, samples_per_stripe=6, config=cfg,
    )
    assert man_c["n_super"] == 3
    assert any(rec["skipped"] for rec in man_c["stripes"])
    assert man_c["work_items"] > 0

    n_pad = round_up(bm.n, sb)
    w_pad = round_up(bm.n_words, wk)
    xp = np.zeros((n_pad, w_pad), dtype=np.uint32)
    xp[: bm.n, : bm.n_words] = bm.packed
    man_d = stream_count_checksums(
        jnp.asarray(xp), bm.n, bm.m_bits, superblock_rows=sb, config=cfg,
    )
    chk_c = {(r["i"], r["j"]): r["checksum"] for r in man_c["stripes"]}
    chk_d = {(r["i"], r["j"]): r["checksum"] for r in man_d["stripes"]}
    assert chk_c == chk_d

    want = oracle_count_matrix(bm.packed)
    c_pad = np.zeros((n_pad, n_pad), dtype=np.int64)
    c_pad[: bm.n, : bm.n] = want
    for gi, gj, v in zip(man_c["sample_ii"], man_c["sample_jj"],
                         man_c["sample_vals"]):
        assert int(v) == int(c_pad[gi, gj]), (gi, gj)


def test_stream_checksums_mode(tmp_path):
    """The D2H-minimizing full-scale sink (stream_count_checksums) must
    walk the same stripes as stream_count_matrix: per-stripe checksums
    and sampled entries match the oracle exactly."""
    import jax.numpy as jnp

    from conftest import random_bitmatrix
    from stormtpu.config import default_config
    from stormtpu.oracle import oracle_count_matrix
    from stormtpu.stream import stream_count_checksums
    from stormtpu.utils import round_up, triangular_tile_ids

    bm = random_bitmatrix(600, 4000, 0.3, seed=77)
    cfg = default_config()
    ti, wk = cfg.k2_tile_rows, cfg.k2_tile_words
    sb = round_up(512, ti)
    n_pad = round_up(bm.n, sb)
    w_pad = round_up(bm.n_words, wk)
    xp = np.zeros((n_pad, w_pad), dtype=np.uint32)
    xp[: bm.n, : bm.n_words] = bm.packed
    man = stream_count_checksums(
        jnp.asarray(xp), bm.n, bm.m_bits, superblock_rows=sb,
        samples_per_stripe=4,
    )
    assert man["n_super"] == n_pad // sb == 2
    assert len(man["stripes"]) == 3

    want = oracle_count_matrix(bm.packed)
    c_pad = np.zeros((n_pad, n_pad), dtype=np.int64)
    c_pad[: bm.n, : bm.n] = want

    # sampled entries are exact
    for gi, gj, v in zip(man["sample_ii"], man["sample_jj"],
                         man["sample_vals"]):
        assert int(v) == int(c_pad[gi, gj]), (gi, gj)

    # per-stripe checksums match the oracle tile sums
    tps = sb // ti
    for rec in man["stripes"]:
        i, j = rec["i"], rec["j"]
        if i == j:
            li, lj = triangular_tile_ids(tps)
        else:
            li, lj = np.meshgrid(np.arange(tps), np.arange(tps),
                                 indexing="ij")
            li, lj = li.ravel(), lj.ravel()
        chk = 0
        for a, b in zip(li + i * tps, lj + j * tps):
            tile = c_pad[a * ti:(a + 1) * ti, b * ti:(b + 1) * ti]
            chk += int((tile % 251).sum())
        assert rec["checksum"] == np.int32(chk), (i, j)


def test_stream_count_matrix_rejects_unknown_kernel(tmp_path):
    import pytest

    from conftest import random_bitmatrix
    from stormtpu.stream import stream_count_matrix

    bm = random_bitmatrix(16, 256, 0.3, seed=3)
    with pytest.raises(ValueError, match="unknown kernel"):
        stream_count_matrix(bm, str(tmp_path / "s"), kernel="mxU")


def test_checksum_sinks_agree_below_tile_rows():
    """n < k2_tile_rows shrinks the tile geometry (k2_tile_shape); both
    sinks must list the SAME tiles or diagonal-stripe checksums diverge
    (regression: the dense sink pinned ti=256 and double-counted
    diagonal-tile lower triangles the clustered walk lists once)."""
    import jax.numpy as jnp

    from stormtpu.config import default_config
    from stormtpu.stream import (
        stream_count_checksums,
        stream_count_checksums_clustered,
    )
    from stormtpu.utils import round_up
    from test_clustered import block_diagonal_bitmatrix

    bm = block_diagonal_bitmatrix(128, 16384, 2, 0.3, seed=21)
    cfg = default_config()
    man_c = stream_count_checksums_clustered(
        bm, superblock_rows=128, samples_per_stripe=6, config=cfg,
    )
    n_pad = round_up(bm.n, 128)
    w_pad = round_up(bm.n_words, cfg.k2_tile_words)
    xp = np.zeros((n_pad, w_pad), dtype=np.uint32)
    xp[: bm.n, : bm.n_words] = bm.packed
    man_d = stream_count_checksums(
        jnp.asarray(xp), bm.n, bm.m_bits, superblock_rows=128, config=cfg,
    )
    chk_c = {(r["i"], r["j"]): r["checksum"] for r in man_c["stripes"]}
    chk_d = {(r["i"], r["j"]): r["checksum"] for r in man_d["stripes"]}
    assert chk_c == chk_d
    want = oracle_count_matrix(bm.packed)
    for gi, gj, v in zip(man_d["sample_ii"], man_d["sample_jj"],
                         man_d["sample_vals"]):
        assert int(v) == int(want[gi, gj])


@pytest.mark.heavy
def test_checksum_sink_repads_small_n(tmp_path):
    """n < k2_tile_rows shrinks the tile geometry; a caller who padded
    xd per the old 'multiple of superblock_rows' contract must still get
    exact results (regression: the tile-rounded superblock stopped
    dividing the caller's padding and raised)."""
    import jax.numpy as jnp

    from stormtpu.config import default_config
    from stormtpu.stream import stream_count_checksums
    from stormtpu.utils import round_up

    bm = random_bitmatrix(70, 16384, 0.3, seed=23)
    cfg = default_config()
    n_pad = round_up(bm.n, 4096)  # old contract: superblock multiple
    w_pad = round_up(bm.n_words, cfg.k2_tile_words)
    xp = np.zeros((n_pad, w_pad), dtype=np.uint32)
    xp[: bm.n, : bm.n_words] = bm.packed
    man = stream_count_checksums(
        jnp.asarray(xp), bm.n, bm.m_bits, superblock_rows=4096, config=cfg,
    )
    want = oracle_count_matrix(bm.packed)
    pad = np.zeros((man["n_super"] * man["superblock_rows"],) * 2, np.int64)
    pad[: bm.n, : bm.n] = want
    for gi, gj, v in zip(man["sample_ii"], man["sample_jj"],
                         man["sample_vals"]):
        assert int(v) == int(pad[gi, gj])


def _grown_panel(n_old, n_new, m, density, seed):
    """(bm_old, bm_new) with bm_new's first n_old rows byte-identical."""
    from stormtpu.layout import BitMatrix

    rng = np.random.default_rng(seed)
    dense = (rng.random((n_new, m)) < density).astype(np.uint8)
    return (BitMatrix.from_dense(dense[:n_old]),
            BitMatrix.from_dense(dense), dense)


def test_extend_streamed_matrix_partial_superblock(tmp_path):
    """Grow past a PARTIAL last superblock: its stripes are recomputed,
    every stripe inside the old complete superblocks is reused untouched
    (file mtimes prove it), and the reassembled matrix is oracle-exact."""
    import os

    from stormtpu.stream import extend_streamed_matrix

    sb = 16
    bm_old, bm_new, dense = _grown_panel(36, 70, 600, 0.3, seed=171)
    out = str(tmp_path / "grow")
    stream_count_matrix(bm_old, out, superblock_rows=sb,
                        config=_small_cfg(), interpret=True)
    # old n_super = ceil(36/16) = 3, last (index 2) partial
    kept = {}
    for i in range(3):
        for j in range(i, 3):
            kept[(i, j)] = os.path.getmtime(stripe_path(out, i, j))
    man = extend_streamed_matrix(bm_new, out, config=_small_cfg(),
                                 interpret=True)
    assert man["n"] == 70 and man["superblock_rows"] == sb
    got = load_streamed_matrix(out)
    np.testing.assert_array_equal(got, oracle_count_matrix(bm_new.packed))
    for (i, j), t in kept.items():
        if i == 2 or j == 2:
            assert os.path.getmtime(stripe_path(out, i, j)) != t, (i, j)
        else:
            assert os.path.getmtime(stripe_path(out, i, j)) == t, (i, j)


def test_extend_streamed_matrix_aligned_reuses_everything(tmp_path):
    """old_n a superblock multiple: nothing is invalidated — every old
    stripe file survives byte-identical (mtime check)."""
    import os

    from stormtpu.stream import extend_streamed_matrix

    sb = 16
    bm_old, bm_new, _ = _grown_panel(32, 60, 512, 0.4, seed=172)
    out = str(tmp_path / "grow")
    stream_count_matrix(bm_old, out, superblock_rows=sb,
                        config=_small_cfg(), interpret=True)
    old_times = {(i, j): os.path.getmtime(stripe_path(out, i, j))
                 for i in range(2) for j in range(i, 2)}
    extend_streamed_matrix(bm_new, out, config=_small_cfg(),
                           interpret=True)
    got = load_streamed_matrix(out)
    np.testing.assert_array_equal(got, oracle_count_matrix(bm_new.packed))
    for (i, j), t in old_times.items():
        assert os.path.getmtime(stripe_path(out, i, j)) == t, (i, j)


def test_extend_streamed_matrix_refusals(tmp_path):
    from stormtpu.layout import BitMatrix
    from stormtpu.stream import extend_streamed_matrix

    bm_old, bm_new, dense = _grown_panel(36, 70, 600, 0.3, seed=173)
    out = str(tmp_path / "grow")
    stream_count_matrix(bm_old, out, superblock_rows=16,
                        config=_small_cfg(), interpret=True)
    # changed old content: fingerprint mismatch
    tampered = dense.copy()
    tampered[3, :9] ^= 1
    with pytest.raises(ValueError, match="fingerprint"):
        extend_streamed_matrix(BitMatrix.from_dense(tampered), out,
                               config=_small_cfg(), interpret=True)
    # shrinking
    with pytest.raises(ValueError, match="appended"):
        extend_streamed_matrix(BitMatrix.from_dense(dense[:20]), out,
                               config=_small_cfg(), interpret=True)
    # changed universe
    with pytest.raises(ValueError, match="m_bits"):
        extend_streamed_matrix(
            BitMatrix.from_dense(np.zeros((70, 601), np.uint8)), out,
            config=_small_cfg(), interpret=True)
    # incompatible tile geometry (sb=16 not a multiple of the forced
    # mxu kernel's 32-row tiles)
    with pytest.raises(ValueError, match="tile geometry"):
        extend_streamed_matrix(
            bm_new, out, kernel="mxu",
            config=EngineConfig(k2_tile_rows=32), interpret=True)


def test_extend_streamed_matrix_distributed(tmp_path):
    """Mesh extend: same directory format; distributed stripes fill the
    new region, old single-chip stripes are reused (formats may mix)."""
    import jax

    from stormtpu.parallel import make_row_mesh
    from stormtpu.stream import extend_streamed_matrix

    assert len(jax.devices()) >= 8
    sb = 16
    bm_old, bm_new, _ = _grown_panel(32, 64, 512, 0.35, seed=174)
    out = str(tmp_path / "grow")
    stream_count_matrix(bm_old, out, superblock_rows=sb,
                        config=_small_cfg(), interpret=True)
    man = extend_streamed_matrix(bm_new, out, mesh=make_row_mesh(2),
                                 config=_small_cfg())
    assert man["n"] == 64
    got = load_streamed_matrix(out)
    np.testing.assert_array_equal(got, oracle_count_matrix(bm_new.packed))


def test_extend_streamed_matrix_sparse_outer(tmp_path):
    """Extend a K4 (COO-stripe) directory: format-mixed reuse — old COO
    stripes survive, the grown panel's walk re-resolves (still sparse
    here), result oracle-exact."""
    from stormtpu.layout import BitMatrix
    from stormtpu.native import HAVE_NATIVE
    from stormtpu.stream import extend_streamed_matrix

    if not HAVE_NATIVE:
        pytest.skip("needs the native K4 tier")
    rng = np.random.default_rng(175)
    n_old, n_new, m = 40, 90, 8192
    dense = np.zeros((n_new, m), dtype=np.uint8)
    dense[rng.integers(0, n_new, 300), rng.integers(0, m, 300)] = 1
    out = str(tmp_path / "grow")
    stream_count_matrix(BitMatrix.from_dense(dense[:n_old]), out,
                        superblock_rows=32, kernel="sparse_outer",
                        config=_small_cfg(), compress=False)
    man = extend_streamed_matrix(BitMatrix.from_dense(dense), out,
                                 kernel="sparse_outer",
                                 config=_small_cfg())
    assert man["n"] == n_new and man["kernel"] == "sparse_outer"
    got = load_streamed_matrix(out)
    np.testing.assert_array_equal(
        got, oracle_count_matrix(BitMatrix.from_dense(dense).packed))


def test_extend_clustered_to_mxu_carries_tile_rows(tmp_path):
    """Kernel-family drift on extend (advisor r4 medium): a clustered
    directory extended by a walk that resolves to a non-tiles kernel
    must keep the format-bearing ``tile_rows`` key — old tiles-format
    stripe files still on disk assemble under it."""
    import json
    import os

    from stormtpu.layout import BitMatrix
    from stormtpu.stream import extend_streamed_matrix
    from test_clustered import CFG, block_diagonal_bitmatrix

    bm_new = block_diagonal_bitmatrix(128, 16384, 4, 0.3, seed=176)
    bm_old = BitMatrix.from_packed(
        np.ascontiguousarray(bm_new.packed[:96]), bm_new.m_bits)
    out = str(tmp_path / "grow")
    man0 = stream_count_matrix(bm_old, out, superblock_rows=32,
                               kernel="clustered", config=CFG,
                               interpret=True)
    assert man0["kernel"] == "clustered" and man0["tile_rows"] == 32
    man = extend_streamed_matrix(bm_new, out, kernel="mxu", config=CFG,
                                 interpret=True)
    assert man["kernel"] == "mxu"
    assert man["tile_rows"] == 32  # carried for the reused tiles stripes
    with open(os.path.join(out, "manifest.json")) as f:
        assert json.load(f)["tile_rows"] == 32
    got = load_streamed_matrix(out)
    np.testing.assert_array_equal(got, oracle_count_matrix(bm_new.packed))


def test_extend_clustered_tile_rows_drift_refused(tmp_path):
    """clustered→clustered extend under a CHANGED k2_tile_rows passes the
    modulus check but would misassemble old stripes — refused up front."""
    from stormtpu.layout import BitMatrix
    from stormtpu.stream import extend_streamed_matrix
    from test_clustered import CFG, block_diagonal_bitmatrix

    bm_new = block_diagonal_bitmatrix(128, 16384, 4, 0.3, seed=177)
    bm_old = BitMatrix.from_packed(
        np.ascontiguousarray(bm_new.packed[:96]), bm_new.m_bits)
    out = str(tmp_path / "grow")
    stream_count_matrix(bm_old, out, superblock_rows=32,
                        kernel="clustered", config=CFG, interpret=True)
    drifted = EngineConfig(k2_tile_rows=16, k2_tile_words=128)
    with pytest.raises(ValueError, match="tile_rows"):
        extend_streamed_matrix(bm_new, out, kernel="clustered",
                               config=drifted, interpret=True)


def test_extend_streamed_matrix_2d_mesh_modulus(tmp_path):
    """2-D [rows × bits] mesh extend rounds by the ROW axis only (advisor
    r4): a directory aligned to rows·8 must not be refused because the
    total device count suggests a larger modulus."""
    import jax

    from stormtpu.parallel.mesh import make_grid_mesh
    from stormtpu.stream import extend_streamed_matrix

    assert len(jax.devices()) >= 8
    sb = 16  # multiple of rows·8 = 16, NOT of total·8 = 64
    bm_old, bm_new, _ = _grown_panel(32, 64, 512, 0.35, seed=178)
    out = str(tmp_path / "grow")
    stream_count_matrix(bm_old, out, superblock_rows=sb,
                        config=_small_cfg(), interpret=True)
    man = extend_streamed_matrix(bm_new, out, mesh=make_grid_mesh(2, 4),
                                 config=_small_cfg())
    assert man["n"] == 64
    got = load_streamed_matrix(out)
    np.testing.assert_array_equal(got, oracle_count_matrix(bm_new.packed))


def test_extend_clustered_dir_through_mesh_carries_tile_rows(tmp_path):
    """The trickiest format branch (advisor r4 medium): a clustered
    directory extended THROUGH THE MESH — the distributed walk writes
    empty ti=8 tiles records and 'counts' stripes, but the manifest must
    keep the OLD nonzero tiles' tile_rows so everything assembles."""
    import json
    import os

    import jax

    from stormtpu.layout import BitMatrix
    from stormtpu.parallel import make_row_mesh
    from stormtpu.stream import extend_streamed_matrix
    from test_clustered import CFG, block_diagonal_bitmatrix

    assert len(jax.devices()) >= 8
    bm_new = block_diagonal_bitmatrix(128, 16384, 4, 0.3, seed=179)
    bm_old = BitMatrix.from_packed(
        np.ascontiguousarray(bm_new.packed[:96]), bm_new.m_bits)
    out = str(tmp_path / "grow")
    man0 = stream_count_matrix(bm_old, out, superblock_rows=32,
                               kernel="clustered", config=CFG,
                               interpret=True)
    assert man0["tile_rows"] == 32
    man = extend_streamed_matrix(bm_new, out, mesh=make_row_mesh(2),
                                 config=CFG)
    assert man["tile_rows"] == 32  # old nonzero tiles' ti wins
    with open(os.path.join(out, "manifest.json")) as f:
        assert json.load(f)["tile_rows"] == 32
    got = load_streamed_matrix(out)
    np.testing.assert_array_equal(got, oracle_count_matrix(bm_new.packed))
