"""True multi-process validation: two OS processes (= two "hosts"), four
forced CPU devices each, joined with jax.distributed over localhost —
the closest this environment gets to config 5's "N ≥ 2 hosts"
(BASELINE.json:11). The ring driver must produce exact global counts."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    dpp = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={dpp}"
    )
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc, process_id=pid,
    )
    import numpy as np
    sys.path.insert(0, "@REPO@")
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stormtpu.kernels.xla import count_block_int8_xla
    from stormtpu.parallel import make_row_mesh
    from stormtpu.parallel.allpairs import ring_count_rows

    assert jax.process_count() == nproc
    mesh = make_row_mesh()
    r = nproc * dpp
    n, w = r * 24, 32
    rng = np.random.default_rng(0)
    packed = rng.integers(0, 2**32, (n, w), dtype=np.uint32)
    sharding = NamedSharding(mesh, P("rows", None))
    x = jax.make_array_from_callback(
        packed.shape, sharding, lambda idx: packed[idx]
    )
    fn = jax.jit(ring_count_rows(mesh, "rows", n // r, count_block_int8_xla))
    c_host = multihost_utils.process_allgather(fn(x), tiled=True)
    want = np.bitwise_count(
        packed[:, None, :] & packed[None, :, :]
    ).sum(axis=2)
    assert np.array_equal(np.asarray(c_host), want), "multihost ring INEXACT"
    print(f"proc {pid} OK", flush=True)
    """
)


_SLOW = pytest.mark.skipif(
    not os.environ.get("STORMTPU_SLOW_TESTS"),
    reason="spawns jax.distributed processes (~20 s each); "
    "set STORMTPU_SLOW_TESTS=1",
)


def _run_procs(tmp_path, nproc, dpp):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("@REPO@", repo))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(nproc), str(port),
             str(dpp)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in range(nproc)
    ]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} OK" in out


@_SLOW
def test_two_process_ring_exact(tmp_path):
    _run_procs(tmp_path, nproc=2, dpp=4)  # R=8: even census


@_SLOW
def test_three_process_odd_ring_exact(tmp_path):
    # R=3 (odd): every unordered shard pair is computed once and the
    # MIRROR count tile crosses a real process boundary via ppermute
    _run_procs(tmp_path, nproc=3, dpp=1)


_WRAPPER_WORKER = textwrap.dedent(
    """
    import os, sys
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    dpp = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={dpp}"
    )
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc, process_id=pid,
    )
    import numpy as np
    sys.path.insert(0, "@REPO@")
    from stormtpu.layout import BitMatrix
    from stormtpu.parallel import (
        distributed_count_matrix, distributed_pairs_above,
        distributed_topk_neighbors, distributed_column_counts,
        make_row_mesh,
    )

    # the PUBLIC wrappers (not the raw shard_map fns) must work with a
    # multi-process mesh: inputs device_put globally, row-sharded results
    # gathered via fetch_global (a plain np.asarray of a non-addressable
    # sharded result raises RuntimeError — the bug this test pins)
    rng = np.random.default_rng(5)
    dense = (rng.random((48, 1024)) < 0.25).astype(np.uint8)
    bm = BitMatrix.from_dense(dense)
    C = dense.astype(np.int64) @ dense.T
    mesh = make_row_mesh()

    got = distributed_count_matrix(bm.packed, mesh=mesh)
    assert np.array_equal(got, C), "count_matrix INEXACT multihost"

    ii, jj, vv = distributed_pairs_above(bm, 70, mesh=mesh)
    eii, ejj = np.nonzero(np.triu(C >= 70, k=1))
    assert eii.size > 0 and np.array_equal(ii, eii) and np.array_equal(jj, ejj)
    assert np.array_equal(vv, C[eii, ejj])

    vals, idx = distributed_topk_neighbors(bm, 4, mesh=mesh)
    Cm = C.copy(); np.fill_diagonal(Cm, -1)
    assert np.array_equal(vals, -np.sort(-Cm, axis=1)[:, :4])

    # measure ranking across the process boundary: THREE row-sharded ring
    # outputs (scores/counts/indices) come back through fetch_global, the
    # host rescores float64 and certifies
    from stormtpu.setops import derive_similarity
    mv, mi = distributed_topk_neighbors(bm, 4, mesh=mesh,
                                        measure="jaccard")
    sim = derive_similarity(C, bm.row_nnz[:, None], bm.row_nnz[None, :],
                            bm.m_bits, "jaccard")
    np.fill_diagonal(sim, -np.inf)
    for rr in range(bm.n):
        order = np.lexsort((np.arange(bm.n), -sim[rr]))[:4]
        assert np.array_equal(mi[rr], order), "measure topk idx multihost"
        assert np.array_equal(mv[rr], sim[rr][order]), \
            "measure topk vals multihost"

    ac = distributed_column_counts(bm, mesh=mesh)
    assert np.array_equal(ac, dense.sum(0).astype(np.int32))

    # aggregate statistics across the process boundary: row sums (psum'd
    # colcount shard partials + per-shard plane counts via fetch_global)
    # and the ring histogram (per-step bin partials, int64 host sum)
    from stormtpu.parallel import (
        distributed_count_histogram, distributed_count_row_sums,
    )
    rs = distributed_count_row_sums(bm, mesh=mesh)
    assert np.array_equal(rs, C.sum(axis=1)), "row sums INEXACT multihost"
    man = distributed_count_histogram(bm, n_bins=8, mesh=mesh, block_rows=8)
    iu = np.triu_indices(bm.n, 1)
    want_h = np.zeros(8, dtype=np.int64)
    np.add.at(want_h, np.minimum(C[iu] // man["bin_width"], 7), 1)
    assert np.array_equal(man["hist"], want_h), "histogram INEXACT multihost"

    # bits-axis screen: psum of triangular count-tile partials crosses
    # the process boundary (needs >= 128 words per device)
    dense2 = (rng.random((24, 4 * 128 * 32 + 40)) < 0.1).astype(np.uint8)
    bm2 = BitMatrix.from_dense(dense2)
    C2 = dense2.astype(np.int64) @ dense2.T
    thr = max(1, int(C2[np.triu_indices(24, 1)].max()) - 1)
    ii, jj, vv = distributed_pairs_above(bm2, thr, mesh=mesh,
                                         shard_axis="bits")
    eii, ejj = np.nonzero(np.triu(C2 >= thr, k=1))
    assert eii.size > 0 and np.array_equal(ii, eii) and np.array_equal(jj, ejj)
    assert np.array_equal(vv, C2[eii, ejj])

    # bits-axis CLUSTERED counts: per-device K5 work lists + psum of
    # tile partials across the process boundary (block-diagonal input
    # whose co-occupancy routes the K-shard clustered form)
    nb_, mb_ = 32, 4 * 128 * 32
    db = np.zeros((nb_, mb_), dtype=np.uint8)
    for b in range(4):
        db[b * 8:(b + 1) * 8, b * (mb_ // 4):(b + 1) * (mb_ // 4)] = (
            rng.random((8, mb_ // 4)) < 0.3).astype(np.uint8)
    bmc = BitMatrix.from_dense(db)
    from stormtpu.config import EngineConfig
    from stormtpu.kernels.clustered import build_sharded_clustered_plan
    cfgc = EngineConfig(k2_tile_rows=8, k2_tile_words=128)
    sp = build_sharded_clustered_plan(bmc, 4, cfgc)
    assert sp is not None and sp.work_fraction < 0.5, "route not clustered"
    got = distributed_count_matrix(bmc.packed, mesh=mesh,
                                   shard_axis="bits", config=cfgc)
    Cc = db.astype(np.int64) @ db.T
    assert np.array_equal(got, Cc), "bits-axis clustered INEXACT multihost"

    # bits-axis top-k: the psum-then-merge form, replicated output across
    # the same process boundary
    vals2, idx2 = distributed_topk_neighbors(bm2, 3, mesh=mesh,
                                             shard_axis="bits")
    C2m = C2.copy(); np.fill_diagonal(C2m, -1)
    assert np.array_equal(vals2, -np.sort(-C2m, axis=1)[:, :3]), \
        "bits-axis topk INEXACT multihost"

    # 2-D composed mesh spanning the process boundary: ring over row
    # shards with a per-step psum over word slices (both collectives
    # cross hosts), through the public wrappers
    from stormtpu.parallel import make_grid_mesh
    mesh2d = make_grid_mesh(2, 2)
    got2 = distributed_count_matrix(bm.packed, mesh=mesh2d)
    assert np.array_equal(got2, C), "2-D mesh count INEXACT multihost"
    v2d, _ = distributed_topk_neighbors(bm, 3, mesh=mesh2d, block_rows=8)
    assert np.array_equal(v2d, -np.sort(-Cm, axis=1)[:, :3]), \
        "2-D mesh topk INEXACT multihost"

    # streaming driver: all processes compute + gather collectively,
    # process 0 writes; the result on disk must be the exact matrix
    from stormtpu.parallel import distributed_stream_count_matrix
    from stormtpu.stream import load_streamed_matrix
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "stream_out")
    distributed_stream_count_matrix(bm, out_dir, superblock_rows=16,
                                    mesh=mesh)
    if jax.process_index() == 0:
        got = load_streamed_matrix(out_dir)
        assert np.array_equal(got, C), "multihost stream INEXACT"
    print(f"proc {pid} OK", flush=True)
    """
)


@_SLOW
def test_two_process_public_wrappers(tmp_path):
    """Every public distributed_* wrapper end-to-end across a real
    process boundary (2 procs x 2 devices; mirror tiles, top-k state,
    hit bitmaps, and column psums all cross hosts)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "wrapper_worker.py"
    script.write_text(_WRAPPER_WORKER.replace("@REPO@", repo))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", str(port), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} OK" in out
