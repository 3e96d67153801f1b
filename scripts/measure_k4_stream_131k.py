"""Measure the per-superblock K4 streaming walk at the VERDICT r2 #3
shape — N=131,072 × M=1M bits at d=1e-5 (a rare-variant genotype panel;
the single-shot K4 ceiling is N=32,768) — and record the win over the
dense stripe walk (BASELINE.md "Per-superblock K4" section when run).

Run with NOTHING else on this 1-core host (K4 emission is host compute;
any concurrent process poisons the wall numbers — CLAUDE.md). The dense
comparison times ONE device stripe end-to-end (H2D + MXU compute + D2H)
after a warm-up compile, then extrapolates over the 528-stripe walk: a
full dense walk at this shape moves ~270 GB H2D through the ~17 MB/s
relay and would take hours — which is the point of the measurement.

Usage:
    python scripts/measure_k4_stream_131k.py          # counts walk + dense stripe
    python scripts/measure_k4_stream_131k.py --topk   # also the streaming top-k
"""

import json
import sys
import tempfile
import time

import numpy as np

N, M, D = 131_072, 1_000_000, 1e-5
SB = 4096


def sampled_exact_check(bm, out_dir, rows_g, pos_g, rng) -> int:
    """Sampled stripe entries vs brute-force packed-row intersections."""
    from stormtpu.stream import stripe_path

    n_super = -(-bm.n // SB)
    checked = 0
    for (i, j) in ((0, 0), (0, n_super - 1), (3, 17), (n_super - 1,) * 2):
        with np.load(stripe_path(out_dir, i, j)) as z:
            if "coo_i" in z.files:
                ci, cj, cv = z["coo_i"], z["coo_j"], z["coo_v"]
            else:  # dense-format stripe (cost model sent it to the MXU)
                s = z["counts"]
                ci, cj = np.nonzero(s)
                cv = s[ci, cj]
        if ci.size:
            take = rng.choice(ci.size, min(64, ci.size), replace=False)
            for t in take:
                gi, gj = i * SB + int(ci[t]), j * SB + int(cj[t])
                want = int(np.bitwise_count(
                    bm.packed[gi] & bm.packed[gj]).sum())
                assert want == int(cv[t]), (gi, gj, int(cv[t]), want)
                checked += 1
        # a couple of ZERO entries too (absent from the COO must mean 0)
        present = set(zip(ci.tolist(), cj.tolist()))
        for _ in range(8):
            a, b = int(rng.integers(0, SB)), int(rng.integers(0, SB))
            if (a, b) in present:
                continue
            gi, gj = i * SB + a, j * SB + b
            if gi >= bm.n or gj >= bm.n:
                continue
            want = int(np.bitwise_count(
                bm.packed[gi] & bm.packed[gj]).sum())
            assert want == 0, (gi, gj, want)
            checked += 1
    return checked


def time_one_dense_stripe(bm) -> dict:
    """End-to-end wall cost of ONE dense device stripe at this shape
    (the unit the dense walk pays 528 times): slice upload + K2 MXU
    stripe + count D2H. Compile excluded by a warm-up run."""
    import jax.numpy as jnp

    from stormtpu.config import default_config
    from stormtpu.stream import _compute_stripe_pair, _host_superblock
    from stormtpu.utils import round_up

    cfg = default_config()
    ti, wk = cfg.k2_tile_rows, cfg.k2_tile_words
    w_pad = round_up(bm.n_words, wk)
    tps = SB // ti

    def upload(idx):
        t0 = time.time()
        xd = jnp.asarray(_host_superblock(bm.packed, bm.n, SB, w_pad, idx))
        xd.block_until_ready()
        return xd, time.time() - t0

    xi, t_up_i = upload(0)
    xj, _ = upload(1)
    # warm-up (pays the 20-60 s remote compile once)
    _ = _compute_stripe_pair(xi, xj, tps, ti, wk, False, "mxu")
    xj2, t_up_j = upload(2)
    t0 = time.time()
    stripe = _compute_stripe_pair(xi, xj2, tps, ti, wk, False, "mxu")
    t_compute = time.time() - t0
    assert stripe.shape == (SB, SB)
    return {"upload_slice_s": t_up_j, "upload_first_s": t_up_i,
            "compute_fetch_s": t_compute}


def main() -> None:
    from stormtpu.layout import BitMatrix
    from stormtpu.stream import stream_count_matrix

    rng = np.random.default_rng(131072)
    counts = rng.binomial(M, D, size=N)
    rows_g = np.repeat(np.arange(N, dtype=np.int64), counts)
    pos_g = rng.integers(0, M, size=int(counts.sum()), dtype=np.int64)
    print(f"panel: N={N} M={M} nnz={rows_g.size} "
          f"(density {rows_g.size / (float(N) * M):.2e})", flush=True)

    t0 = time.time()
    bm = BitMatrix.from_positions(rows_g, pos_g, n=N, m_bits=M)
    t_ingest = time.time() - t0
    print(f"ingest {t_ingest:.1f} s (packed "
          f"{bm.packed.nbytes / 2**30:.1f} GiB host)", flush=True)

    out = {"n": N, "m_bits": M, "nnz": int(rows_g.size),
           "ingest_s": t_ingest}

    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        t0 = time.time()
        man = stream_count_matrix(bm, td, superblock_rows=SB,
                                  kernel="auto", compress=False)
        t_k4 = time.time() - t0
        assert man["kernel"] == "sparse_outer", man["kernel"]
        print(f"K4 streaming walk: {t_k4:.1f} s over "
              f"{len(man['completed'])} stripes "
              f"(k4={man['stripe_kernels']['k4']} "
              f"dense={man['stripe_kernels']['dense']})", flush=True)
        checked = sampled_exact_check(bm, td, rows_g, pos_g, rng)
        print(f"sampled-exact: {checked} entries verified", flush=True)
        out.update(k4_walk_s=t_k4, stripes=len(man["completed"]),
                   stripe_kernels=man["stripe_kernels"],
                   samples_verified=checked)

        if "--hist" in sys.argv:
            # r5 (VERDICT r4 #1 done-criterion): the density-adaptive
            # histogram at this shape must cost ~the K4 walk, not the
            # dense stripe walk's est. hours — and match the histogram
            # DERIVED from the counts walk's own stripes exactly
            from stormtpu.stats import count_histogram
            from stormtpu.stream import stripe_path

            t0 = time.time()
            hman = count_histogram(bm, n_bins=8, bin_width=1,
                                   superblock_rows=SB, method="auto")
            t_hist = time.time() - t0
            assert hman["kernel"] == "sparse_outer", hman["kernel"]
            want_h = np.zeros(8, dtype=np.int64)
            nz_pairs = 0
            for i, j in man["completed"]:
                with np.load(stripe_path(td, i, j)) as z:
                    if "coo_i" in z.files:
                        ci, cj, cv = z["coo_i"], z["coo_j"], z["coo_v"]
                    else:
                        s = z["counts"]
                        ci, cj = np.nonzero(s)
                        cv = s[ci, cj]
                if i == j:
                    cv = cv[ci < cj]
                np.add.at(want_h, np.minimum(cv, 7), 1)
                nz_pairs += cv.size
            want_h[0] += N * (N - 1) // 2 - nz_pairs
            np.testing.assert_array_equal(hman["hist"], want_h)
            print(f"count_histogram (auto→sparse): {t_hist:.1f} s, "
                  f"exact vs the counts-walk-derived oracle "
                  f"({nz_pairs} nonzero pairs)", flush=True)
            out.update(hist_s=t_hist,
                       hist_stripe_kernels=hman["stripe_kernels"],
                       hist_exact_vs_counts_walk=True)

    if "--topk" in sys.argv:
        from stormtpu.stream_query import stream_topk_neighbors

        k = 8
        t0 = time.time()
        vals, idx = stream_topk_neighbors(bm, k, superblock_rows=SB)
        t_topk = time.time() - t0
        print(f"stream_topk_neighbors(k={k}): {t_topk:.1f} s", flush=True)
        # sampled exact: candidates of a row = rows sharing any column
        ver = 0
        for r in map(int, rng.integers(0, N, 24)):
            rp = pos_g[rows_g == r]
            cand = np.unique(rows_g[np.isin(pos_g, rp)])
            cand = cand[cand != r]
            cc = np.bitwise_count(
                bm.packed[cand] & bm.packed[r]).sum(axis=1, dtype=np.int64)
            want = np.zeros(k, dtype=np.int64)
            top = -np.sort(-cc)[:k]
            want[: top.size] = np.maximum(top, 0)
            np.testing.assert_array_equal(vals[r], want, err_msg=f"row {r}")
            ver += 1
        print(f"top-k sampled-exact: {ver} rows", flush=True)
        out.update(topk_s=t_topk, topk_rows_verified=ver)

    dense = time_one_dense_stripe(bm)
    n_super = -(-N // SB)
    total = n_super * (n_super + 1) // 2
    est_dense_walk = total * (dense["compute_fetch_s"]
                              + dense["upload_slice_s"])
    out.update(dense_one_stripe=dense,
               est_dense_walk_s=est_dense_walk,
               k4_speedup_vs_dense_est=est_dense_walk / out["k4_walk_s"])
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
