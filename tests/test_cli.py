"""CLI harness: sweep verifies and prints, count round-trips files."""

import numpy as np
import pytest

from stormtpu.cli import main


def test_cli_info(capsys):
    assert main(["info"]) == 0
    out = capsys.readouterr().out
    assert "stormtpu" in out and "devices" in out


def test_cli_sweep_small(capsys):
    rc = main([
        "sweep", "--n", "40", "--m", "512",
        "--densities", "0.05,0.5",
        "--strategies", "popcount,mxu", "--reps", "1",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("exact") == 4  # 2 densities × 2 strategies, all verified


def test_cli_count_positions_roundtrip(tmp_path, rng):
    n, m = 12, 300
    dense = (rng.random((n, m)) < 0.1).astype(np.uint8)
    rows, cols = np.nonzero(dense)
    infile = tmp_path / "in.npz"
    outfile = tmp_path / "out.npy"
    np.savez(infile, row_ids=rows, positions=cols, n=n, m_bits=m)
    rc = main(["count", "--in", str(infile), "--out", str(outfile)])
    assert rc == 0
    got = np.load(outfile)
    want = dense.astype(np.int64) @ dense.T.astype(np.int64)
    np.testing.assert_array_equal(got, want)


def test_cli_count_dense_union(tmp_path, rng):
    dense = (rng.random((8, 128)) < 0.4).astype(np.uint8)
    infile = tmp_path / "in.npy"
    outfile = tmp_path / "out.npy"
    np.save(infile, dense)
    rc = main(["count", "--in", str(infile), "--out", str(outfile),
               "--op", "union"])
    assert rc == 0
    got = np.load(outfile)
    a = dense[:, None, :].astype(np.int64)
    b = dense[None, :, :].astype(np.int64)
    np.testing.assert_array_equal(got, (a | b).sum(axis=2))


def test_cli_topk_and_screen(tmp_path):
    import numpy as np

    from stormtpu import BitMatrix, pairs_above, topk_neighbors
    from stormtpu.cli import main
    from stormtpu.io import save_bitmatrix

    rng = np.random.default_rng(3)
    dense = (rng.random((60, 1024)) < 0.3).astype(np.uint8)
    bm = BitMatrix.from_dense(dense)
    mat = tmp_path / "m.npz"
    save_bitmatrix(bm, str(mat))

    out = tmp_path / "topk.npz"
    assert main(["topk", "--in", str(mat), "--out", str(out), "--k", "4"]) == 0
    with np.load(out) as z:
        v1, i1 = topk_neighbors(bm, 4)
        np.testing.assert_array_equal(z["counts"], v1)

    out = tmp_path / "hits.npz"
    assert main(["screen", "--in", str(mat), "--out", str(out),
                 "--threshold", "100"]) == 0
    with np.load(out) as z:
        ii, jj, vv = pairs_above(bm, 100)
        assert ii.size > 0
        np.testing.assert_array_equal(z["ii"], ii)
        np.testing.assert_array_equal(z["jj"], jj)
        np.testing.assert_array_equal(z["values"], vv)

    # dense .npy input path too
    npy = tmp_path / "m.npy"
    np.save(npy, dense)
    out2 = tmp_path / "hits2.npz"
    assert main(["screen", "--in", str(npy), "--out", str(out2),
                 "--threshold", "0.3", "--measure", "jaccard"]) == 0


def test_cli_stream_and_streaming_queries(tmp_path, rng):
    """stream subcommand writes resumable stripes; topk/screen --stream
    ride the operand-streaming stripe walk — all exact."""
    from stormtpu.stream import load_streamed_matrix

    n, m = 70, 2048
    dense = (rng.random((n, m)) < 0.3).astype(np.uint8)
    infile = tmp_path / "in.npy"
    np.save(infile, dense)
    want = dense.astype(np.int64) @ dense.T

    out_dir = tmp_path / "stripes"
    rc = main(["stream", "--in", str(infile), "--out-dir", str(out_dir),
               "--superblock", "32", "--operand-streaming", "on"])
    assert rc == 0
    np.testing.assert_array_equal(load_streamed_matrix(str(out_dir)), want)

    topk_out = tmp_path / "topk.npz"
    rc = main(["topk", "--in", str(infile), "--out", str(topk_out),
               "--k", "4", "--stream", "--superblock", "32"])
    assert rc == 0
    with np.load(topk_out) as z:
        w = want.copy()
        np.fill_diagonal(w, -1)
        np.testing.assert_array_equal(
            z["counts"], np.maximum(np.sort(w, axis=1)[:, ::-1][:, :4], 0)
        )

    scr_out = tmp_path / "scr.npz"
    thr = int(np.percentile(want[np.triu_indices(n, 1)], 90))
    rc = main(["screen", "--in", str(infile), "--out", str(scr_out),
               "--threshold", str(thr), "--stream", "--superblock", "32"])
    assert rc == 0
    with np.load(scr_out) as z:
        wi, wj = np.nonzero(np.triu(want, 1) >= thr)
        np.testing.assert_array_equal(z["ii"], wi)
        np.testing.assert_array_equal(z["jj"], wj)
        np.testing.assert_array_equal(z["values"], want[wi, wj])


def test_cli_cross_against(tmp_path):
    import numpy as np

    from stormtpu import BitMatrix, cross_pairs_above, cross_topk_neighbors
    from stormtpu.cli import main
    from stormtpu.io import save_bitmatrix

    rng = np.random.default_rng(5)
    q = BitMatrix.from_dense((rng.random((12, 512)) < 0.3).astype(np.uint8))
    panel = BitMatrix.from_dense(
        (rng.random((40, 512)) < 0.35).astype(np.uint8)
    )
    qf, pf = tmp_path / "q.npz", tmp_path / "p.npz"
    save_bitmatrix(q, str(qf))
    save_bitmatrix(panel, str(pf))

    out = tmp_path / "xk.npz"
    assert main(["topk", "--in", str(qf), "--out", str(out),
                 "--k", "3", "--against", str(pf)]) == 0
    with np.load(out) as z:
        v, _ = cross_topk_neighbors(q, panel, 3)
        np.testing.assert_array_equal(z["counts"], v)

    out = tmp_path / "xs.npz"
    assert main(["screen", "--in", str(qf), "--out", str(out),
                 "--threshold", "40", "--against", str(pf)]) == 0
    with np.load(out) as z:
        ii, jj, vv = cross_pairs_above(q, panel, 40)
        np.testing.assert_array_equal(z["ii"], ii)
        np.testing.assert_array_equal(z["jj"], jj)
        np.testing.assert_array_equal(z["values"], vv)


def test_cli_against_rejects_stream(tmp_path):
    import numpy as np
    import pytest

    from stormtpu import BitMatrix
    from stormtpu.cli import main
    from stormtpu.io import save_bitmatrix

    bm = BitMatrix.from_dense(np.eye(8, 64, dtype=np.uint8))
    f = tmp_path / "m.npz"
    save_bitmatrix(bm, str(f))
    with pytest.raises(SystemExit, match="mutually exclusive"):
        main(["topk", "--in", str(f), "--out", str(tmp_path / "o.npz"),
              "--k", "2", "--against", str(f), "--stream"])
    with pytest.raises(SystemExit, match="mutually exclusive"):
        main(["screen", "--in", str(f), "--out", str(tmp_path / "o.npz"),
              "--threshold", "1", "--against", str(f), "--stream"])


def test_cli_stream_ckpt_dir(tmp_path):
    import numpy as np

    from stormtpu import BitMatrix
    from stormtpu.cli import main
    from stormtpu.io import save_bitmatrix
    from stormtpu.stream_query import stream_topk_neighbors

    rng = np.random.default_rng(7)
    bm = BitMatrix.from_dense((rng.random((40, 512)) < 0.3).astype(np.uint8))
    f = tmp_path / "m.npz"
    save_bitmatrix(bm, str(f))
    out = tmp_path / "topk.npz"
    ck = tmp_path / "ck"
    assert main(["topk", "--in", str(f), "--out", str(out), "--k", "3",
                 "--stream", "--superblock", "16",
                 "--ckpt-dir", str(ck)]) == 0
    assert (ck / "topk_ckpt.npz").exists()
    with np.load(out) as z:
        want, _ = stream_topk_neighbors(bm, 3, superblock_rows=16)
        np.testing.assert_array_equal(z["counts"], want)
    out2 = tmp_path / "hits.npz"
    ck2 = tmp_path / "ck2"
    assert main(["screen", "--in", str(f), "--out", str(out2),
                 "--threshold", "20", "--stream", "--superblock", "16",
                 "--ckpt-dir", str(ck2)]) == 0
    assert (ck2 / "screen_manifest.json").exists()


def test_cli_ckpt_dir_requires_stream(tmp_path):
    import numpy as np
    import pytest

    from stormtpu import BitMatrix
    from stormtpu.cli import main
    from stormtpu.io import save_bitmatrix

    bm = BitMatrix.from_dense(np.eye(8, 64, dtype=np.uint8))
    f = tmp_path / "m.npz"
    save_bitmatrix(bm, str(f))
    with pytest.raises(SystemExit, match="requires --stream"):
        main(["topk", "--in", str(f), "--out", str(tmp_path / "o.npz"),
              "--k", "2", "--ckpt-dir", str(tmp_path / "ck")])
    with pytest.raises(SystemExit, match="requires --stream"):
        main(["screen", "--in", str(f), "--out", str(tmp_path / "o.npz"),
              "--threshold", "1", "--ckpt-dir", str(tmp_path / "ck")])


def test_cli_clump(tmp_path, rng):
    # planted near-duplicate block of 4 rows must land in one clump, and
    # the single-shot and --stream routes must agree
    n, m = 24, 512
    dense = (rng.random((n, m)) < 0.3).astype(np.uint8)
    base = (rng.random(m) < 0.3).astype(np.uint8)
    for r in range(4):
        row = base.copy()
        row[rng.random(m) < 0.02] ^= 1
        dense[r] = row
    infile = tmp_path / "in.npy"
    statfile = tmp_path / "stat.npy"
    np.save(infile, dense)
    np.save(statfile, rng.random(n))
    out1 = tmp_path / "clumps.npz"
    rc = main(["clump", "--in", str(infile), "--out", str(out1),
               "--threshold", "0.5", "--measure", "r2",
               "--stat", str(statfile)])
    assert rc == 0
    z1 = np.load(out1)
    block = z1["leader"][:4]
    assert (block == block[0]).all()
    assert z1["sizes"].sum() == n
    out2 = tmp_path / "clumps_stream.npz"
    rc = main(["clump", "--in", str(infile), "--out", str(out2),
               "--threshold", "0.5", "--measure", "r2",
               "--stat", str(statfile), "--stream", "--superblock", "8"])
    assert rc == 0
    z2 = np.load(out2)
    np.testing.assert_array_equal(z1["leader"], z2["leader"])
    np.testing.assert_array_equal(z1["leaders"], z2["leaders"])
    # default stat (row cardinalities) also runs
    out3 = tmp_path / "clumps_nostat.npz"
    assert main(["clump", "--in", str(infile), "--out", str(out3),
                 "--threshold", "20", "--measure", "count"]) == 0


def test_cli_clump_ckpt_dir_requires_stream(tmp_path, rng):
    dense = (rng.random((8, 128)) < 0.3).astype(np.uint8)
    infile = tmp_path / "in.npy"
    np.save(infile, dense)
    import pytest

    with pytest.raises(SystemExit, match="requires --stream"):
        main(["clump", "--in", str(infile), "--out",
              str(tmp_path / "o.npz"), "--threshold", "0.5",
              "--ckpt-dir", str(tmp_path / "ck")])


def test_cli_hist(tmp_path, rng):
    from stormtpu.layout import BitMatrix
    from stormtpu.oracle import oracle_count_matrix

    n, m = 30, 500
    dense = (rng.random((n, m)) < 0.4).astype(np.uint8)
    infile = tmp_path / "x.npy"
    out = tmp_path / "hist.npz"
    np.save(infile, dense)
    rc = main(["hist", "--in", str(infile), "--out", str(out),
               "--bins", "8", "--row-sums"])
    assert rc == 0
    c = oracle_count_matrix(BitMatrix.from_dense(dense).packed)
    with np.load(out) as z:
        assert z["pairs"] == n * (n - 1) // 2
        iu = np.triu_indices(n, k=1)
        vals = c[iu].astype(np.int64)
        w = int(z["bin_edges"][1] - z["bin_edges"][0])
        want = np.zeros(8, dtype=np.int64)
        np.add.at(want, np.minimum(vals // w, 7), 1)
        np.testing.assert_array_equal(z["hist"], want)
        np.testing.assert_array_equal(
            z["row_sums"],
            c.astype(np.int64).sum(axis=1) - np.diag(c).astype(np.int64),
        )


def test_cli_stream_extend(tmp_path, rng):
    """stream --extend grows an existing directory to a larger panel,
    exact vs numpy."""
    from stormtpu.stream import load_streamed_matrix

    n_old, n_new, m = 40, 90, 1024
    dense = (rng.random((n_new, m)) < 0.3).astype(np.uint8)
    old_file = tmp_path / "old.npy"
    new_file = tmp_path / "new.npy"
    np.save(old_file, dense[:n_old])
    np.save(new_file, dense)
    out_dir = tmp_path / "stripes"
    assert main(["stream", "--in", str(old_file), "--out-dir", str(out_dir),
                 "--superblock", "32"]) == 0
    assert main(["stream", "--in", str(new_file), "--out-dir", str(out_dir),
                 "--extend"]) == 0
    np.testing.assert_array_equal(
        load_streamed_matrix(str(out_dir)),
        dense.astype(np.int64) @ dense.T,
    )


def test_cli_hist_method(tmp_path, rng):
    """hist --method routes explicitly (streamed here) and stays exact."""
    n, m = 60, 1024
    dense = (rng.random((n, m)) < 0.3).astype(np.uint8)
    f = tmp_path / "x.npy"
    np.save(f, dense)
    out = tmp_path / "h.npz"
    assert main(["hist", "--in", str(f), "--out", str(out),
                 "--bins", "8", "--superblock", "32",
                 "--method", "streamed"]) == 0
    with np.load(out) as z:
        hist = z["hist"]
        edges = z["bin_edges"]
    C = dense.astype(np.int64) @ dense.T
    iu = np.triu_indices(n, 1)
    bw = int(edges[1] - edges[0])
    want = np.bincount(np.minimum(C[iu] // bw, 7), minlength=8)
    np.testing.assert_array_equal(hist, want)


def test_cli_query_extend(tmp_path, rng):
    """screen/topk --stream --ckpt-dir --extend grow a completed run;
    parameters ride the stored manifest/checkpoint."""
    n_old, n_new, m = 40, 80, 1024
    dense = (rng.random((n_new, m)) < 0.3).astype(np.uint8)
    old_f, new_f = tmp_path / "old.npy", tmp_path / "new.npy"
    np.save(old_f, dense[:n_old])
    np.save(new_f, dense)
    C = dense.astype(np.int64) @ dense.T

    d = tmp_path / "scr"
    out = tmp_path / "s.npz"
    assert main(["screen", "--in", str(old_f), "--out", str(out),
                 "--threshold", "60", "--stream", "--superblock", "32",
                 "--ckpt-dir", str(d)]) == 0
    assert main(["screen", "--in", str(new_f), "--out", str(out),
                 "--stream", "--superblock", "32", "--ckpt-dir", str(d),
                 "--extend"]) == 0
    with np.load(out) as z:
        ii, jj, vv = z["ii"], z["jj"], z["values"]
    iu = np.triu_indices(n_new, 1)
    keep = C[iu] >= 60
    np.testing.assert_array_equal(ii, iu[0][keep])
    np.testing.assert_array_equal(jj, iu[1][keep])
    np.testing.assert_array_equal(vv, C[iu][keep])

    d2 = tmp_path / "tk"
    out2 = tmp_path / "t.npz"
    assert main(["topk", "--in", str(old_f), "--out", str(out2),
                 "--k", "4", "--stream", "--superblock", "32",
                 "--ckpt-dir", str(d2)]) == 0
    assert main(["topk", "--in", str(new_f), "--out", str(out2),
                 "--stream", "--superblock", "32", "--ckpt-dir", str(d2),
                 "--extend"]) == 0
    with np.load(out2) as z:
        vals = z["counts"]
    Cd = C.copy()
    np.fill_diagonal(Cd, -1)
    want = np.maximum(-np.sort(-Cd, axis=1)[:, :4], 0)
    np.testing.assert_array_equal(vals, want)

    # refusals: --extend without the stream checkpoint machinery
    with pytest.raises(SystemExit, match="--extend"):
        main(["screen", "--in", str(new_f), "--out", str(out),
              "--threshold", "60", "--extend"])
    with pytest.raises(SystemExit, match="--threshold"):
        main(["screen", "--in", str(new_f), "--out", str(out)])


def test_cli_extend_against_conflict(tmp_path, rng):
    dense = (rng.random((30, 256)) < 0.3).astype(np.uint8)
    f = tmp_path / "x.npy"
    np.save(f, dense)
    out = tmp_path / "o.npz"
    with pytest.raises(SystemExit, match="against"):
        main(["screen", "--in", str(f), "--against", str(f),
              "--extend", "--stream", "--ckpt-dir", str(tmp_path / "d"),
              "--out", str(out)])
    with pytest.raises(SystemExit, match="against"):
        main(["topk", "--in", str(f), "--against", str(f), "--extend",
              "--stream", "--ckpt-dir", str(tmp_path / "d"),
              "--out", str(out)])
