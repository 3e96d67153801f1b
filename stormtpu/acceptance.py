"""Acceptance-config runner — the five BASELINE.json:7–11 configs.

Each config runs end-to-end on the current backend, is verified against
the exact oracle (sampled where the full matrix is too large to check
whole), and reports timing. Scaled sizes default to what this
environment's single emulated chip + ~10 MB/s device→host link can finish
interactively; ``--full`` runs the spec sizes (intended for real pods).

  python -m stormtpu accept              # all configs, scaled
  python -m stormtpu accept --config 3   # one config
  python -m stormtpu accept --full       # spec sizes (hours on 1 chip)
"""

from __future__ import annotations

import json
import time
from typing import Callable, Optional

import numpy as np

__all__ = ["run_acceptance", "CONFIGS"]


def _sample_verify(counts_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
                   packed: np.ndarray, n: int, n_samples: int, seed: int) -> None:
    """counts_fn(ii, jj) -> got; checked vs exact host popcount."""
    rng = np.random.default_rng(seed)
    ii = rng.integers(0, n, n_samples)
    jj = rng.integers(0, n, n_samples)
    want = np.bitwise_count(packed[ii] & packed[jj]).sum(axis=1, dtype=np.int64)
    got = np.asarray(counts_fn(ii, jj)).astype(np.int64)
    if not np.array_equal(got, want):
        raise AssertionError(
            f"acceptance verification FAILED on {int((got != want).sum())}"
            f"/{n_samples} sampled pairs"
        )


def _random_packed(n: int, w: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 2**32, (n, w), dtype=np.uint32)


def config1_single_pair(full: bool, log) -> dict:
    """Dense AND+popcount of two 1M-bit bitmaps, single pair (B:7)."""
    from stormtpu import BitMatrix, pair_count

    m = 1_000_000
    w = -(-m // 32)
    packed = _random_packed(2, w, seed=101)
    packed[:, -1] &= (1 << (m % 32)) - 1 if m % 32 else 0xFFFFFFFF
    a = BitMatrix.from_packed(packed[:1], m_bits=m)
    b = BitMatrix.from_packed(packed[1:], m_bits=m)
    t0 = time.time()
    got = pair_count(a, b)
    dt_cold = time.time() - t0
    want = int(np.bitwise_count(packed[0] & packed[1]).sum())
    assert got == want, f"single-pair mismatch {got} != {want}"
    # warm latency: same executable, fresh data (relay memoizes identical
    # executions, so perturb)
    packed2 = _random_packed(2, w, seed=111)
    a2 = BitMatrix.from_packed(packed2[:1], m_bits=w * 32)
    b2 = BitMatrix.from_packed(packed2[1:], m_bits=w * 32)
    t0 = time.time()
    got2 = pair_count(a2, b2)
    dt_warm = time.time() - t0
    assert got2 == int(np.bitwise_count(packed2[0] & packed2[1]).sum())
    log(f"[config1] |A∩B| = {got} exact; {dt_cold * 1e3:.1f} ms cold "
        f"(compile+dispatch), {dt_warm * 1e3:.1f} ms warm")
    return {"config": 1, "m_bits": m, "exact": True, "seconds": dt_warm,
            "seconds_cold": dt_cold}


def config2_allpairs_dense(full: bool, log) -> dict:
    """All-pairs N×N, dense 1k bitmaps × 64k bits, word-wise AND+popcount
    (B:8) — run at spec size either way; verified in full."""
    from stormtpu import BitMatrix, intersect_count_matrix
    from stormtpu.oracle import oracle_count_matrix

    n, m = 1000, 65536
    packed = _random_packed(n, m // 32, seed=102)
    bm = BitMatrix.from_packed(packed, m_bits=m)
    # compile warmup on distinct same-shape data (first-compile is minutes
    # on the tunneled backend and is not the deliverable being measured)
    warm = BitMatrix.from_packed(_random_packed(n, m // 32, seed=202), m_bits=m)
    intersect_count_matrix(warm, strategy="pallas_dense")
    t0 = time.time()
    got = intersect_count_matrix(bm, strategy="pallas_dense")  # word-wise path
    dt = time.time() - t0
    want = oracle_count_matrix(packed)
    assert np.array_equal(got, want), "config2 full verification failed"
    pairs = n * n
    # the wall number at this small shape is dominated by the relay's
    # fixed per-dispatch cost + tile padding (N=1000 pads to 1024), so it
    # is recorded as latency-bound; the SUSTAINED device rate is measured
    # separately by slope timing (the headline methodology)
    import jax.numpy as jnp

    from stormtpu.config import default_config
    from stormtpu.kernels.dense import count_tiles_pallas_dense
    from stormtpu.tuning import tuned_variant
    from stormtpu.utils import (
        pallas_interpret_default,
        round_up,
        timeit_sustained_auto,
        triangular_tile_ids,
    )

    cfg = default_config()
    ti = cfg.k1_tile_rows
    wk = min(cfg.k1_tile_words, m // 32)
    n_pad = round_up(n, ti)
    rng = np.random.default_rng(7)
    xds = []
    for s in range(3):
        xp = np.zeros((n_pad, m // 32), dtype=np.uint32)
        xp[:n] = packed if s == 0 else _random_packed(n, m // 32, seed=300 + s)
        xds.append(jnp.asarray(xp))
    ibs, jbs = map(jnp.asarray, triangular_tile_ids(n_pad // ti))
    interp = bool(pallas_interpret_default())
    var = tuned_variant("k1", cfg.k1_variant)
    # chain length sized from a one-dispatch probe: the K1 walk's
    # per-step cost at 1k×64k is sub-ms, so a fixed short chain leaves
    # the marginal inside relay jitter and "sustained" would just be
    # dispatch-floor arithmetic (the very artifact this field de-noises)
    dt_s = timeit_sustained_auto(
        lambda x: count_tiles_pallas_dense(
            x, ibs, jbs, tile_rows=ti, tile_words=wk, interpret=interp,
            variant=var,
        ),
        xds,
    )
    tri = n * (n + 1) / 2
    log(f"[config2] {n}×{m//1024}Kbit all-pairs exact (full check); "
        f"{dt:.2f} s wall (latency-bound: relay floor + padding) → "
        f"sustained {tri / dt_s / 1e6:.0f} M-pairs/s")
    return {"config": 2, "n": n, "m_bits": m, "exact": True, "seconds": dt,
            "pairs_per_s": pairs / dt, "latency_bound": True,
            "sustained_pairs_per_s": tri / dt_s,
            "note": "wall seconds are relay-dispatch dominated at this "
            "small shape; sustained_pairs_per_s is the slope-timed device "
            "rate"}


def config3_sparse(full: bool, log) -> dict:
    """Sparse (<1% density) scattered positions, 10k × 1M bits (B:9) —
    at FULL spec size: sparse ingest from scattered positions, then the
    full 10k×10k all-pairs matrix computed on device (tiles stay
    device-resident — the 400 MB matrix is the expensive thing to *move*,
    not to compute) with sampled entries gathered and checked exactly.

    Dispatch is density-adaptive: at ~0.8% it honestly routes to the MXU
    dense kernel (SURVEY.md §7 "sparse ingest, dense compute"); the
    positions path (K3) is exercised explicitly on a row subset.

    Scaled mode (``full=False``, for CPU test runs) ingests 2k rows and
    verifies sampled pair counts only — and, on a real TPU backend,
    ADDITIONALLY runs the full-spec pass and records it under the
    ``full`` key (config 4's ``full_stream`` side-channel pattern,
    VERDICT r3 #3: the committed artifact must carry spec-size evidence
    alongside the CI-comparable scaled entry)."""
    if full:
        return _config3_body(10_000, log)
    result = _config3_body(2_000, log)
    from stormtpu.utils import is_tpu_backend

    if is_tpu_backend():
        result["full"] = _config3_body(10_000, log)
    return result


def _config3_body(n: int, log) -> dict:
    import jax.numpy as jnp

    from stormtpu import BitMatrix
    from stormtpu.config import default_config
    from stormtpu.dispatch import choose_strategy
    from stormtpu.kernels.mxu import count_tiles_pallas_mxu
    from stormtpu.kernels.sparse import count_block_sparse, padded_position_lists
    from stormtpu.utils import (
        pallas_interpret_default,
        round_up,
        triangular_tile_ids,
    )

    full = n >= 10_000
    m = 1_000_000
    density = 0.008
    rng = np.random.default_rng(103)
    nnz_per_row = int(m * density)
    rows = np.repeat(np.arange(n, dtype=np.int64), nnz_per_row)
    cols = rng.integers(0, m, n * nnz_per_row).astype(np.int64)
    t0 = time.time()
    bm = BitMatrix.from_positions(rows, cols, n, m)
    ingest = time.time() - t0
    strat = choose_strategy(bm.n, bm.m_bits, bm.density)
    log(f"[config3] ingest {n}×1M {bm.density * 100:.2f}%: {ingest:.2f} s "
        f"(native packer); dispatch → {strat}")

    # K3 positions path, exercised explicitly on a 256-row subset
    sub = 256
    bm_sub = BitMatrix.from_packed(bm.packed[:sub], m_bits=bm.m_bits)
    pos = jnp.asarray(padded_position_lists(bm_sub))
    got_sub = np.asarray(count_block_sparse(pos, pos, sentinel=bm.m_bits))
    from stormtpu.oracle import oracle_count_block

    # (chunked oracle: the one-shot broadcast would be a ~8 GB host temp)
    want_sub = oracle_count_block(bm.packed[:sub], bm.packed[:sub])
    assert np.array_equal(
        got_sub.astype(np.int64), want_sub.astype(np.int64)
    ), "config3 K3 positions path mismatch"
    log(f"[config3] K3 positions path exact on {sub}×{sub} subset")

    if not full:
        from stormtpu.query import pair_counts

        t0 = time.time()
        _sample_verify(lambda ii, jj: pair_counts(bm, ii, jj), bm.packed, n,
                       4096, seed=103)
        dt = time.time() - t0
        log(f"[config3] scaled: 4096 sampled pair counts exact; {dt:.2f} s")
        return {"config": 3, "n": n, "m_bits": m, "density": bm.density,
                "dispatch": strat, "exact_sampled": True,
                "ingest_seconds": ingest}

    # full 10k×10k all-pairs on device (adaptive winner = MXU dense)
    cfg = default_config()
    ti, wk = cfg.k2_tile_rows, cfg.k2_tile_words
    n_pad = round_up(n, ti)
    w_pad = round_up(bm.n_words, wk)
    xp = np.zeros((n_pad, w_pad), dtype=np.uint32)
    xp[:n, : bm.n_words] = bm.packed
    nb = n_pad // ti
    ibs, jbs = triangular_tile_ids(nb)
    # sampled (i ≤ j) pairs → (tile id, in-tile offsets), gathered on device
    s_rng = np.random.default_rng(1003)
    ii = s_rng.integers(0, n, 4096)
    jj = s_rng.integers(0, n, 4096)
    lo, hi = np.minimum(ii, jj), np.maximum(ii, jj)
    ib, jb = lo // ti, hi // ti
    # i-major triu enumeration: t = ib·nb − ib(ib−1)/2 + (jb − ib)
    tid = (ib * nb - (ib * (ib - 1)) // 2 + (jb - ib)).astype(np.int32)
    interpret = pallas_interpret_default()
    xd = jnp.asarray(xp)
    ibs_d, jbs_d = jnp.asarray(ibs), jnp.asarray(jbs)
    tid_d = jnp.asarray(tid)
    lo_d = jnp.asarray((lo % ti).astype(np.int32))
    hi_d = jnp.asarray((hi % ti).astype(np.int32))

    def run(x):
        tiles = count_tiles_pallas_mxu(
            x, ibs_d, jbs_d, tile_rows=ti, tile_words=wk,
            interpret=interpret, variant=cfg.k2_variant,
        )
        return np.asarray(tiles[tid_d, lo_d, hi_d]).astype(np.int64)

    # compile warmup on a perturbed input (a DISTINCT execution — the
    # relay memoizes identical ones, so warming on xd itself would make
    # the timed run a cache hit)
    run(xd ^ jnp.uint32(1))
    t0 = time.time()
    got = run(xd)
    dt = time.time() - t0
    want = np.bitwise_count(bm.packed[lo] & bm.packed[hi]).sum(
        axis=1, dtype=np.int64
    )
    assert np.array_equal(got, want), "config3 full all-pairs mismatch"
    pairs = n * (n + 1) / 2
    log(f"[config3] full {n}×{n} all-pairs on device, 4096 sampled exact; "
        f"{dt:.2f} s → {pairs / dt / 1e6:.0f} M-pairs/s")
    return {"config": 3, "n": n, "m_bits": m, "density": bm.density,
            "dispatch": strat, "exact_sampled": True,
            "ingest_seconds": ingest, "seconds": dt,
            "pairs_per_s": pairs / dt}


def _config4_spec_rate(log) -> dict:
    """Measured kernel rate at the FULL primary-metric shape (100k × 1M,
    B:10/B:2) on the current device: the 12.6 GB packed matrix is
    generated on device (host upload is tunnel-bound in this environment)
    and a 4096-tile-pair slice of the triangular walk is timed —
    same executable the streaming driver runs, so the rate is the
    config's compute rate. Repeated executions use different tile-pair
    selections (device args), so they cannot be memoized; per-dispatch
    latency is <2% of the ~1.5 s compute. Exactness is verified on a
    host-pulled tile sample."""
    import jax
    import jax.numpy as jnp

    from stormtpu.config import default_config
    from stormtpu.kernels.mxu import count_tiles_pallas_mxu
    from stormtpu.utils import round_up, triangular_tile_ids

    n, m = 100_000, 1_000_000
    cfg = default_config()
    ti, wk = cfg.k2_tile_rows, cfg.k2_tile_words
    w = m // 32
    n_pad, w_pad = round_up(n, ti), round_up(w, wk)
    t_sub = 4096

    @jax.jit
    def gen(key):
        x = jax.random.bits(key, (n_pad, w_pad), dtype=jnp.uint32)
        row_ok = jnp.arange(n_pad)[:, None] < n
        col_ok = jnp.arange(w_pad)[None, :] < w
        return jnp.where(row_ok & col_ok, x, jnp.uint32(0))

    xd = gen(jax.random.key(0))
    xd.block_until_ready()
    nb = n_pad // ti
    ibs_all, jbs_all = triangular_tile_ids(nb)

    def selection(seed):
        r = np.random.default_rng(seed)
        sel = np.sort(r.choice(len(ibs_all), size=t_sub, replace=False))
        return jnp.asarray(ibs_all[sel]), jnp.asarray(jbs_all[sel]), sel

    @jax.jit
    def g(x, ibs, jbs):
        tiles = count_tiles_pallas_mxu(
            x, ibs, jbs, tile_rows=ti, tile_words=wk, interpret=False,
            variant=cfg.k2_variant)
        return jnp.sum(tiles % jnp.int32(251)), tiles[0]

    ibs0, jbs0, sel0 = selection(0)
    chk, tile0 = g(xd, ibs0, jbs0)
    np.asarray(chk)  # warm compile + roundtrip
    ib0, jb0 = int(ibs_all[sel0[0]]), int(jbs_all[sel0[0]])
    rows_i = np.asarray(xd[ib0 * ti : ib0 * ti + 8])
    rows_j = np.asarray(xd[jb0 * ti : jb0 * ti + 8])
    want = np.bitwise_count(rows_i[:, None, :] & rows_j[None, :, :]).sum(
        axis=2, dtype=np.int64)
    assert np.array_equal(np.asarray(tile0[:8, :8]).astype(np.int64), want), \
        "config4 spec-shape tile INEXACT"

    dts = []
    for seed in (1, 2, 3):
        ibs, jbs, _ = selection(seed)
        t0 = time.time()
        np.asarray(g(xd, ibs, jbs)[0])
        dts.append(time.time() - t0)
    dt = float(np.median(dts))
    from stormtpu.utils import V5E_INT8_PEAK_OPS

    rate = t_sub * ti * ti / dt
    total_pairs = n * (n + 1) / 2
    peak_frac = rate * 2 * m / V5E_INT8_PEAK_OPS
    log(f"[config4] spec-shape rate (100k×1M, {t_sub} tile-pair slice, "
        f"sampled exact): {rate / 1e6:.0f} M-pairs/s = "
        f"{peak_frac * 100:.0f}% int8 peak → full config "
        f"≈{total_pairs / rate:.0f} s compute on one chip")
    del xd
    return {
        "spec_rate_pairs_per_s": rate,
        "spec_int8_peak_frac": peak_frac,
        "spec_full_config_seconds_est": total_pairs / rate,
    }


def _config4_full_stream(log) -> dict:
    """Drive the FULL 100k×1M config end-to-end through the streaming
    stripe walk (n_super=25, all 325 superblock stripes) with the
    D2H-minimizing checksum sink (stream.stream_count_checksums): the
    matrix is generated on device, every stripe executes the exact
    production tile-walk executable, and only per-stripe checksums +
    sampled entries leave the device (this tunnel fetches at ~5 MB/s —
    the 40 GB of stripes would take hours; the compute is ~30 s).

    Verification: 8 sampled entries per stripe cross-checked on device
    against the independent fused-XLA AND+popcount path, plus a host
    oracle anchor on fetched rows."""
    import jax
    import jax.numpy as jnp

    from stormtpu.kernels import xla as kx
    from stormtpu.stream import stream_count_checksums
    from stormtpu.utils import round_up

    n, m = 100_000, 1_000_000
    sb = 4096
    w = -(-m // 32)
    from stormtpu.config import default_config

    cfg = default_config()
    n_pad = round_up(n, sb)
    w_pad = round_up(w, cfg.k2_tile_words)

    @jax.jit
    def gen(key):
        x = jax.random.bits(key, (n_pad, w_pad), dtype=jnp.uint32)
        row_ok = jnp.arange(n_pad)[:, None] < n
        col_ok = jnp.arange(w_pad)[None, :] < w
        return jnp.where(row_ok & col_ok, x, jnp.uint32(0))

    xd = gen(jax.random.key(4))
    xd.block_until_ready()
    t0 = time.time()
    man = stream_count_checksums(
        xd, n, m, superblock_rows=sb,
        progress=lambda d, t: (d % 50 == 0 or d == t)
        and log(f"  [config4/full] stripe {d}/{t}"),
    )
    dt = time.time() - t0
    assert man["n_super"] == n_pad // sb

    # cross-path verification: the sampled entries must equal the fused
    # XLA AND+popcount of the same rows (independent executable)
    ii = np.asarray(man["sample_ii"], dtype=np.int32)
    jj = np.asarray(man["sample_jj"], dtype=np.int32)

    @jax.jit
    def xla_pairs(x, ii_, jj_):
        return kx.pair_count_batch_xla(
            jnp.take(x, ii_, axis=0), jnp.take(x, jj_, axis=0)
        )

    want = np.asarray(xla_pairs(xd, jnp.asarray(ii), jnp.asarray(jj)))
    assert np.array_equal(want, man["sample_vals"]), \
        "config4 full-stream sampled entries mismatch XLA cross-path"

    # host oracle anchor: 8 pairs recomputed from fetched rows
    anchor = slice(0, 8)
    rows_i = np.asarray(jnp.take(xd, jnp.asarray(ii[anchor]), axis=0))
    rows_j = np.asarray(jnp.take(xd, jnp.asarray(jj[anchor]), axis=0))
    host = np.bitwise_count(rows_i & rows_j).sum(axis=1, dtype=np.int64)
    assert np.array_equal(host, man["sample_vals"][anchor].astype(np.int64)), \
        "config4 full-stream host anchor mismatch"

    pairs = n * (n + 1) / 2
    log(f"[config4] FULL 100k×1M stream: {man['n_super']} superblocks / "
        f"{len(man['stripes'])} stripes in {dt:.1f} s "
        f"({pairs / dt / 1e6:.0f} M-pairs/s end-to-end), "
        f"{ii.size} sampled entries exact (XLA cross-path + host anchor)")
    del xd
    return {
        "full": True,
        "sink": "checksum",
        "n_super": man["n_super"],
        "stripes": len(man["stripes"]),
        "seconds": dt,
        "pairs_per_s": pairs / dt,
        "samples_verified": int(ii.size),
        "sampled_exact": True,
    }


def _config4_aggregate_stats(log) -> dict:
    """r5 (VERDICT r4 #2): the aggregate sinks at the primary spec shape
    on device. The 100k×1M-bit histogram runs the device-resident stripe
    walk on the same generated panel as ``_config4_full_stream`` (same
    tile compute, so its cost ≈ the checksum walk's ~55 s). Verification:
    the built-in mass-conservation assert; a SECOND walk at double the
    bin width whose bins must equal the first's pairwise sums exactly
    (deterministic counts + consistent binning across two executions);
    and a binomial-location sanity (C ~ Binomial(10⁶, ¼) on this panel —
    the mass must sit in the two bins the normal model picks). Per-value
    exactness of the executable itself is pinned by the device smoke
    (test_tpu_device.test_stats_aggregates_on_device). Row sums run the
    HOST bit-plane route at the same shape on an independent host panel,
    brute-verified on sampled rows."""
    import math

    import jax
    import jax.numpy as jnp

    from stormtpu.config import default_config
    from stormtpu.stream import stream_count_histogram
    from stormtpu.utils import round_up

    n, m = 100_000, 1_000_000
    sb = 4096
    w = -(-m // 32)
    cfg = default_config()
    n_pad = round_up(n, sb)
    w_pad = round_up(w, cfg.k2_tile_words)

    @jax.jit
    def gen(key):
        x = jax.random.bits(key, (n_pad, w_pad), dtype=jnp.uint32)
        row_ok = jnp.arange(n_pad)[:, None] < n
        col_ok = jnp.arange(w_pad)[None, :] < w
        return jnp.where(row_ok & col_ok, x, jnp.uint32(0))

    xd = gen(jax.random.key(4))
    xd.block_until_ready()
    n_bins = 64
    t0 = time.time()
    man = stream_count_histogram(
        xd, n, m, n_bins=n_bins, superblock_rows=sb,
        progress=lambda d, t: (d % 50 == 0 or d == t)
        and log(f"  [config4/hist] stripe {d}/{t}"),
    )
    dt_hist = time.time() - t0
    bw = man["bin_width"]
    t0 = time.time()
    man2 = stream_count_histogram(
        xd, n, m, n_bins=n_bins // 2, bin_width=2 * bw,
        superblock_rows=sb,
    )
    dt_hist2 = time.time() - t0
    np.testing.assert_array_equal(
        man2["hist"], man["hist"][0::2] + man["hist"][1::2],
        err_msg="doubled-bin-width cross-check: the two walks disagree",
    )
    # binomial location: the panel is uniform random bits, so C[ij] ~
    # Binomial(m, 1/4); with bw ≈ 36σ essentially all mass sits in the
    # two bins straddling μ = 250k, split per the normal CDF
    mu, sigma = m / 4, math.sqrt(m * 3 / 16)
    pairs = n * (n - 1) // 2

    def cdf(x):
        return 0.5 * (1 + math.erf((x - mu) / (sigma * math.sqrt(2))))

    for b in range(n_bins):
        p = cdf((b + 1) * bw) - cdf(b * bw)
        got = man["hist"][b] / pairs
        assert abs(got - p) < 0.02, (b, got, p)
    log(f"[config4] 100k×1M histogram on device: {dt_hist:.1f} s "
        f"(+{dt_hist2:.1f} s doubled-width cross-check), mass + cross-sum + "
        f"binomial-location verified")
    del xd

    # row sums at spec shape, HOST route (independent host panel; the
    # device matrix cannot come down the ~0.15 GB/s relay)
    from stormtpu import BitMatrix
    from stormtpu.stats import count_row_sums

    packed = _random_packed(n, w, seed=104)
    bm = BitMatrix.from_packed(packed, m_bits=m)
    t0 = time.time()
    sums = count_row_sums(bm)
    dt_rs = time.time() - t0
    rng = np.random.default_rng(41)
    for r in map(int, rng.integers(0, n, 3)):
        acc = 0
        for c0 in range(0, n, 8192):
            acc += int(
                np.bitwise_count(packed[c0 : c0 + 8192] & packed[r])
                .sum(dtype=np.int64)
            )
        assert sums[r] == acc, r
    log(f"[config4] 100k×1M row sums (host bit-plane route): {dt_rs:.1f} s, "
        f"3 rows brute-verified")
    del packed, bm
    return {
        "hist_seconds": dt_hist,
        "hist_crosscheck_seconds": dt_hist2,
        "hist_n_bins": n_bins,
        "hist_verified": "mass+doubled-width-cross-sum+binomial-location",
        "row_sums_seconds": dt_rs,
        "row_sums_verified": "3 rows brute popcount",
    }


def config4_mxu_stream(full: bool, log) -> dict:
    """Density-adaptive tiled XXᵀ on (100k if full else 8k) × 1M bits,
    single chip MXU path with superblock streaming (B:10) — C would be
    40 GB at full size, so stripes stream with resume. On a real TPU the
    kernel rate is additionally measured at the FULL spec shape
    (``_config4_spec_rate``)."""
    import tempfile

    from stormtpu import BitMatrix
    from stormtpu.query import pair_counts
    from stormtpu.stream import stream_count_matrix, stripe_path

    n = 100_000 if full else 8_192
    m = 1_000_000
    w = -(-m // 32)
    packed = _random_packed(n, w, seed=104)
    bm = BitMatrix.from_packed(packed, m_bits=w * 32)
    t0 = time.time()
    with tempfile.TemporaryDirectory() as d:
        manifest = stream_count_matrix(
            bm, d, superblock_rows=4096, kernel="mxu",
        )
        dt = time.time() - t0
        # verify a sampled stripe against the oracle
        with np.load(stripe_path(d, 0, manifest["n_super"] - 1)) as z:
            stripe = z["counts"]
        rng = np.random.default_rng(104)
        sb = manifest["superblock_rows"]
        base_j = (manifest["n_super"] - 1) * sb
        for _ in range(512):
            i = int(rng.integers(0, min(sb, n)))
            j = int(rng.integers(base_j, n))
            want = int(np.bitwise_count(packed[i] & packed[j]).sum())
            assert stripe[i, j - base_j] == want
    pairs = n * (n + 1) / 2
    log(f"[config4] {n}×1M MXU streamed ({manifest['n_super']} superblocks) "
        f"sampled-exact; {dt:.1f} s → {pairs / dt / 1e6:.2f} M-pairs/s "
        f"(streaming end-to-end incl. device→host + compression)")
    result = {"config": 4, "n": n, "m_bits": m, "exact_sampled": True,
              "seconds": dt, "pairs_per_s": pairs / dt}
    from stormtpu.utils import is_tpu_backend

    if is_tpu_backend():
        result.update(_config4_spec_rate(log))
        result["full_stream"] = _config4_full_stream(log)
        result["aggregate_stats"] = _config4_aggregate_stats(log)
    return result


def config5_multihost(full: bool, log) -> dict:
    """Multi-host row-sharded all-pairs with collective merge (B:11) —
    run over all visible devices (scaled: N=2k × 64k bits; this
    environment has one chip, so the mesh degenerates — the same code is
    validated on an 8-device CPU mesh in tests/ and dryrun_multichip)."""
    import jax

    from stormtpu.parallel import distributed_count_matrix, make_row_mesh

    n = 1_000_000 if full else 2_048
    m = 65_536
    packed = _random_packed(n, m // 32, seed=105)
    mesh = make_row_mesh()
    t0 = time.time()
    got = distributed_count_matrix(packed, mesh=mesh)
    dt = time.time() - t0
    rng = np.random.default_rng(105)
    ii = rng.integers(0, n, 2048)
    jj = rng.integers(0, n, 2048)
    want = np.bitwise_count(packed[ii] & packed[jj]).sum(axis=1, dtype=np.int64)
    assert np.array_equal(got[ii, jj].astype(np.int64), want)
    pairs = float(n) * n

    # Trend number (VERDICT r2 #8): the scaled shape's wall time is
    # relay-dispatch dominated, so ring-driver regressions hide inside
    # the dispatch floor. Slope-time the jitted ring fn itself (the same
    # compiled object distributed_count_matrix dispatches) on staged
    # sharded inputs — comparable round over round on one chip.
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stormtpu.config import default_config
    from stormtpu.parallel.allpairs import _jit_ring1d
    from stormtpu.utils import round_up, timeit_sustained_auto

    cfg = default_config()
    axis = mesh.axis_names[0]
    r = mesh.shape[axis]
    n_pad = round_up(max(n, r), r * 8)
    xs = []
    for s in range(3):
        xp = np.zeros((n_pad, m // 32), dtype=np.uint32)
        xp[:n] = packed if s == 0 else _random_packed(n, m // 32, seed=500 + s)
        xs.append(jax.device_put(xp, NamedSharding(mesh, P(axis, None))))
    ring_fn = _jit_ring1d(mesh, axis, n_pad // r, cfg)
    dt_s = timeit_sustained_auto(ring_fn, xs)
    log(f"[config5] {n} rows over {mesh.shape} mesh sampled-exact; "
        f"{dt:.1f} s → {pairs / dt / 1e6:.1f} M-pairs/s wall, "
        f"sustained {pairs / dt_s / 1e6:.1f} M-pairs/s "
        f"({len(jax.devices())} device(s) visible)")
    return {"config": 5, "n": n, "devices": len(mesh.devices.ravel()),
            "exact_sampled": True, "seconds": dt, "pairs_per_s": pairs / dt,
            "latency_bound": not full,
            "sustained_pairs_per_s": pairs / dt_s,
            "note": "scaled-mode wall time is relay-dispatch dominated; "
            "sustained_pairs_per_s slope-times the compiled ring fn (the "
            "round-over-round trend number); the ≥80% scaling target "
            "needs a real pod (parallel.measure_scaling)"}


CONFIGS = {
    1: config1_single_pair,
    2: config2_allpairs_dense,
    3: config3_sparse,
    4: config4_mxu_stream,
    5: config5_multihost,
}


def _relay_health() -> dict:
    """Stamp the run's relay condition into the artifact: wall-clock
    numbers on this stack track the per-dispatch floor (measured 26 ms
    healthy, 55+ ms degraded — BASELINE.md), so a reader comparing
    acceptance runs across rounds needs the floor alongside them."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128), jnp.int32)
    f(x).block_until_ready()  # compile outside the timed probes
    floors = []
    for i in range(3):
        t0 = time.time()
        np.asarray(f(x + i))  # distinct executions; fetch drains the queue
        floors.append(time.time() - t0)
    return {"dispatch_floor_ms": round(min(floors) * 1e3, 1)}


def run_acceptance(
    configs: Optional[list[int]] = None,
    full: bool = False,
    log=print,
    out_path: str = "acceptance.json",
) -> list[dict]:
    """Run the requested configs and MERGE into ``out_path``: entries for
    configs not in this run are preserved (a ``--config 3`` refresh no
    longer clobbers the other four — the r3 refresh lost the r1 full-size
    config-3 record exactly this way, VERDICT r3 missing #1). Returns the
    entries run this time."""
    import os

    health = _relay_health()
    log(f"[health] dispatch floor {health['dispatch_floor_ms']} ms")
    ran: dict[int, dict] = {}
    for cid in configs or sorted(CONFIGS):
        ran[cid] = {**CONFIGS[cid](full, log), **health}
    merged: dict[int, dict] = {}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                for entry in json.load(f):
                    if isinstance(entry, dict) and "config" in entry:
                        merged[int(entry["config"])] = entry
        except (ValueError, OSError):  # unreadable artifact: overwrite
            merged = {}
    merged.update(ran)
    with open(out_path, "w") as f:
        json.dump([merged[k] for k in sorted(merged)], f, indent=2)
    log(f"wrote {out_path}")
    return [ran[k] for k in sorted(ran)]
