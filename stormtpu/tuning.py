"""On-device kernel tuning — measured dispatch crossovers, per shape bucket.

The reference's dispatch constants (SURVEY.md §3 C6/C7: ISA ladder, the
Roaring-style container threshold) encode *measured* crossovers for x86,
and its ladder is length-aware (short inputs fall back to scalar). The TPU
analog: probe every exact kernel path on the live device over a small
(N, M) shape grid, record pairs/s per bucket in a cache file, and let D1
dispatch prefer the measured winner of the NEAREST bucket (log-space
distance) — a winner measured at one MXU-friendly shape must not misroute
small-N/large-M workloads. Tuning is explicit (``python -m stormtpu
tune``) because first-compiles are expensive; without a cache, dispatch
falls back to its static heuristics.

The same run re-fits the K4 host cost model's constants (sort/emission
rates are host-CPU properties, the dense alternative's TOPS and the
dispatch floor are device/link properties — all machine-specific; see
``refit_k4_constants``). dispatch.py reads the fitted constants from the
cache and falls back to the shipped v5e/1-core defaults when untuned.

Timing methodology matches bench.py: warmup compile, then sustained slope
timing over in-jit chains of perturbed inputs (this environment's relay
memoizes identical executions, returns early from block_until_ready, and
adds a ~25 ms fixed cost per dispatch — the slope cancels the fixed cost).
Paths whose single dispatch exceeds ``slow_path_budget_s`` are recorded at
their latency-inclusive upper-bound rate instead of slope-timed (marked
``latency_bound``) — they are never near the winner, and slope-timing a
30 s path would blow the tuning budget.
"""

from __future__ import annotations

import json
import math
import os
from typing import Optional, Sequence

import numpy as np

CACHE_ENV = "STORMTPU_TUNING_CACHE"
_DEFAULT_CACHE = os.path.join(
    os.path.expanduser("~"), ".cache", "stormtpu", "tuning.json"
)
#: Repo-shipped snapshot of the last clean full-grid tune (written by
#: scripts/tpu_return.sh at round end). The build machine is REIMAGED
#: between rounds — discovered r4 when the r3 nine-bucket cache silently
#: vanished with ~/.cache and two single-shape probes rebuilt a 2-bucket
#: cache from nothing — so the live cache alone is not durable.
#: load_tuning falls back here when the live cache is absent; the
#: device-string match in _device_tuning still guards against foreign
#: hardware, and any fresh tune() merges/overwrites as usual.
_SNAPSHOT_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "data",
    "tuning_snapshot.json",
)

_DENSE_PATHS = ("popcount", "mxu", "pallas_dense", "pallas_mxu")

# (N, m_bits) probe grid — MXU-shaped, small-N, and long-K corners
# (VERDICT r1 #6; all dims divide the shipped tile shapes so probe
# operands need no padding copies).
DEFAULT_GRID: tuple[tuple[int, int], ...] = (
    (256, 8192), (256, 65536), (256, 1048576),
    (4096, 8192), (4096, 65536), (4096, 1048576),
    (16384, 8192), (16384, 65536), (16384, 1048576),
)


def cache_path() -> str:
    return os.environ.get(CACHE_ENV, _DEFAULT_CACHE)


def load_tuning() -> Optional[dict]:
    try:
        with open(cache_path()) as f:
            return json.load(f)
    except (OSError, ValueError):
        pass
    if os.environ.get(CACHE_ENV):
        # an explicitly pinned cache path opts out of the snapshot
        # fallback (tests and hermetic runs)
        return None
    try:  # repo-shipped snapshot (see _SNAPSHOT_CACHE)
        with open(_SNAPSHOT_CACHE) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _device_tuning() -> Optional[dict]:
    import jax

    t = load_tuning()
    if not t or t.get("device") != str(jax.devices()[0]):
        return None
    return t


def tuned_variant(kernel: str, default: str) -> str:
    """Best measured Pallas kernel variant ("k1" or "k2") on this device,
    or ``default`` when untuned."""
    t = _device_tuning()
    if not t:
        return default
    return t.get(f"best_{kernel}_variant", default)


def _bucket_key(n: int, m_bits: int) -> str:
    return f"{n}x{m_bits}"


def measured_dense_winner(
    n: Optional[int] = None, m_bits: Optional[int] = None
) -> Optional[str]:
    """Best dense all-pairs strategy from the cache for the bucket nearest
    (n, m_bits) in log space, if tuned on this backend; None otherwise.
    Without a shape (legacy callers) the whole-cache best is returned."""
    t = _device_tuning()
    if not t:
        return None
    buckets = t.get("buckets")
    if not buckets:
        # legacy single-shape cache (round-1 format)
        rates = t.get("dense_pairs_per_s", {})
        return max(rates, key=rates.get) if rates else None
    if n is None or m_bits is None:
        agg: dict[str, float] = {}
        for b in buckets.values():
            for k, v in b.get("dense_pairs_per_s", {}).items():
                agg[k] = max(agg.get(k, 0.0), v)
        return max(agg, key=agg.get) if agg else None

    def dist(key: str) -> float:
        bn, bm = key.split("x")
        return abs(math.log(max(n, 1) / int(bn))) + abs(
            math.log(max(m_bits, 1) / int(bm))
        )

    keys = [k for k in buckets if buckets[k].get("dense_pairs_per_s")]
    if not keys:
        return None
    near = min(keys, key=dist)
    rates = buckets[near]["dense_pairs_per_s"]
    return max(rates, key=rates.get)


def k4_cost_model() -> Optional[dict]:
    """Fitted K4 cost-model constants for this device/host, or None when
    untuned (dispatch then uses its shipped defaults)."""
    t = _device_tuning()
    if not t:
        return None
    return t.get("k4_cost_model")


# Shipped K4 cost-model defaults (round-1 v5e + 1-core host measurements;
# BASELINE.md "Sparse-path crossover"). `python -m stormtpu tune` re-fits
# them for the current machine; every consumer (dispatch.py single-shot,
# stream.py per-stripe) reads through k4_constants() so the fitted and
# shipped values can never diverge between call sites.
K4_DEFAULTS = {
    "c_sort_s_per_nnz": 3e-8,
    "c_n2_s_per_elem": 4e-9,
    "c_emit_s_per_emission": 2e-9,
    "k2_int8_ops_per_s": 330e12,
    "dispatch_floor_s": 0.03,
}


def k4_constants() -> dict:
    """K4 cost-model constants: the fitted cache values where present,
    shipped defaults elsewhere."""
    out = dict(K4_DEFAULTS)
    out.update(k4_cost_model() or {})
    return out


def _auto_c2(t1: float) -> int:
    """Chain length whose marginal time clears relay jitter, from a
    one-dispatch probe ``t1`` (fixed per-candidate chain lengths made
    small-bucket rates artifacts of the chosen c2: every probe path's
    per-step cost sat inside the ±5 ms jitter and the jitter-floor
    fallback t2/c2 ranked candidates by their c2 divisor, not speed)."""
    step_est = max(t1 - 0.025, 1e-6)
    return int(min(1024, max(8, -(-0.05 // step_est) + 2)))


def _timeit(f, xs, t1: float) -> float:
    """Sustained per-invocation device time (shared slope-timing
    implementation, chain length adapted from the probe ``t1``)."""
    from stormtpu.utils.profiling import timeit_sustained

    c2 = _auto_c2(t1)
    return timeit_sustained(f, xs, c1=max(1, c2 // 8), c2=c2)


def _tune_shape(
    n: int, m_bits: int, reps: int, slow_path_budget_s: float, log,
    k1_variant: Optional[str] = None,
    k2_variant: Optional[str] = None,
) -> dict:
    """Measure all eligible dense paths at one shape; verify each against
    the oracle; return the bucket dict. ``k1_variant``/``k2_variant``
    None sweeps every Pallas kernel variant (the anchor bucket); a value
    probes only that variant — the one production will run, passed from
    the anchor's sweep (reading the PREVIOUS cache here recorded rates
    for a variant this tune was about to retire)."""
    import jax.numpy as jnp

    from stormtpu.config import default_config
    from stormtpu.kernels import MXU_XLA_MAX_BITS
    from stormtpu.kernels import xla as kx
    from stormtpu.kernels.dense import count_tiles_pallas_dense
    from stormtpu.kernels.mxu import count_tiles_pallas_mxu
    from stormtpu.oracle import oracle_count_block
    from stormtpu.utils import (
        pallas_interpret_default,
        round_up,
        triangular_tile_ids,
    )
    from stormtpu.utils.profiling import timeit_chain

    interpret = pallas_interpret_default()
    cfg = default_config()
    w = m_bits // 32
    rng = np.random.default_rng(99)
    packed = rng.integers(0, 2**32, (n, w), dtype=np.uint32)
    xds = [jnp.asarray(packed)] + [
        jnp.asarray(rng.integers(0, 2**32, (n, w), dtype=np.uint32))
        for _ in range(reps)
    ]
    xd = xds[0]
    # deliverable-normalized: unique pairs per second for every candidate
    # (square paths compute 2× work for the same deliverable)
    tri = n * (n + 1) / 2

    rates: dict[str, float] = {}
    variants: dict[str, float] = {}
    latency_bound: list[str] = []
    suspect: list[str] = []

    # Roofline sanity (r4, VERDICT r3 weak #5): a measured rate whose
    # implied ops/s exceeds the chip's int8 peak is an over-measurement
    # (sub-ms per-pass buckets can fool even adaptive slope chains — the
    # r3 4096×8K cell read 28.3 G-pairs/s = 494 implied TOPS on a
    # 394-TOPS chip). Deliverable ops = 2·M MACs per unique pair; every
    # candidate computes at LEAST that, so the bound is conservative for
    # all of them. On violation: re-measure once, keep the slower
    # (physically possible wins over fast-and-impossible), and flag.
    from stormtpu.utils.backend import V5E_INT8_PEAK_OPS, is_tpu_backend

    on_tpu = is_tpu_backend()

    def _roofline_ok(rate: float) -> bool:
        return (not on_tpu) or rate * 2.0 * m_bits <= V5E_INT8_PEAK_OPS * 1.05

    def _sane_rate(name, rate, remeasure):
        if _roofline_ok(rate):
            return rate
        re_rate = remeasure()
        kept = min(rate, re_rate)
        log(f"  {name}: {rate:,.0f} pairs/s implies "
            f"{rate * 2 * m_bits / 1e12:,.0f} TOPS > int8 peak — "
            f"re-measured {re_rate:,.0f}, keeping {kept:,.0f}"
            + ("" if _roofline_ok(kept) else " (STILL SUSPECT)"))
        if not _roofline_ok(kept):
            suspect.append(name)
        return kept

    # All candidates are timed identically: device output + host checksum
    # only (full-matrix D2H would swamp kernel time on tunneled devices and
    # is the same cost for every path anyway).
    def check_block(c_np, name, nc):
        want = oracle_count_block(packed[:nc], packed[:nc])
        if not np.array_equal(np.asarray(c_np)[:nc, :nc], want):
            raise AssertionError(f"tuning candidate {name} is INEXACT")

    def measure(name, f):
        # one-dispatch roundtrip probe bounds the budget AND sizes the
        # slope-run chain length (see _auto_c2)
        t1 = timeit_chain(f, xds[:2], 1)
        if t1 > slow_path_budget_s:
            rates[name] = tri / t1
            latency_bound.append(name)
            log(f"  {name}: {rates[name]:,.0f} pairs/s "
                f"(latency-inclusive bound; {t1:.1f} s/dispatch)")
            return
        rates[name] = _sane_rate(
            name, tri / _timeit(f, xds, t1),
            lambda: tri / _timeit(f, xds, t1),
        )
        log(f"  {name}: {rates[name]:,.0f} pairs/s")

    check_block(kx.count_block_popcount_xla(xd, xd, tile_rows=8), "popcount",
                min(n, 128))
    measure("popcount", lambda x: kx.count_block_popcount_xla(x, x, tile_rows=8))

    if m_bits <= MXU_XLA_MAX_BITS:
        check_block(kx.count_block_int8_xla(xd, xd), "mxu", min(n, 128))
        measure("mxu", lambda x: kx.count_block_int8_xla(x, x))
    else:
        log("  mxu: skipped (8× unpacked operand beyond memory budget)")

    def pallas_candidate(count_tiles, ti_cap, wk_cap, variant):
        ti = min(ti_cap, round_up(max(n, 8), 8))
        wk = round_up(max(w, 128), 128) if w <= wk_cap else round_up(wk_cap, 128)
        n_pad, w_pad = round_up(n, ti), round_up(w, wk)
        if (n_pad, w_pad) == (n, w):
            xps = xds  # grid shapes divide the tiles: no padding copies
        else:
            xps = [
                jnp.zeros((n_pad, w_pad), dtype=jnp.uint32).at[:n, :w].set(x)
                for x in xds
            ]
        ibs, jbs = map(jnp.asarray, triangular_tile_ids(n_pad // ti))
        f = lambda x: count_tiles(
            x, ibs, jbs, tile_rows=ti, tile_words=wk,
            interpret=interpret, variant=variant,
        )
        check_block(f(xps[0])[0], variant, min(ti, n))
        t1 = timeit_chain(f, xps[:2], 1)
        if t1 > slow_path_budget_s:
            latency_bound.append(variant)
            return tri / t1
        return _sane_rate(
            variant, tri / _timeit(f, xps, t1),
            lambda: tri / _timeit(f, xps, t1),
        )

    # probe at the SHIPPED tile defaults so cached rates describe the
    # kernels production dispatch actually runs. Variant sweeps
    # (rows/chunk, concat/planes) are compile-heavy and shape-stable, so
    # grid runs sweep them at ONE anchor shape and the caller passes the
    # anchor's winners here for every other bucket.
    k1_vars = ("rows", "chunk") if k1_variant is None else (k1_variant,)
    for variant in k1_vars:
        variants[f"pallas_dense/{variant}"] = pallas_candidate(
            count_tiles_pallas_dense, cfg.k1_tile_rows, cfg.k1_tile_words,
            variant,
        )
        log(f"  pallas_dense/{variant}: "
            f"{variants[f'pallas_dense/{variant}']:,.0f} pairs/s")
    rates["pallas_dense"] = max(
        v for k, v in variants.items() if k.startswith("pallas_dense")
    )

    k2_vars = ("concat", "planes") if k2_variant is None else (k2_variant,)
    for variant in k2_vars:
        variants[f"pallas_mxu/{variant}"] = pallas_candidate(
            count_tiles_pallas_mxu, cfg.k2_tile_rows, cfg.k2_tile_words,
            variant,
        )
        log(f"  pallas_mxu/{variant}: "
            f"{variants[f'pallas_mxu/{variant}']:,.0f} pairs/s")
    rates["pallas_mxu"] = max(
        v for k, v in variants.items() if k.startswith("pallas_mxu")
    )
    out = {
        "dense_pairs_per_s": rates,
        "variant_pairs_per_s": variants,
        "latency_bound": latency_bound,
    }
    if suspect:
        out["roofline_suspect"] = suspect
    return out


def refit_k4_constants(log=print) -> Optional[dict]:
    """Measure the K4 cost-model constants on THIS host/device (the
    shipped dispatch defaults encode the round-1 machine: ~3e-8 s/nnz
    np.unique sort, ~4e-9 s/elem N² mirror, ~2e-9 s/emission, 330 int8
    TOPS, 30 ms dispatch floor). Returns the fitted dict or None when the
    native tier is unbuilt (K4 is never auto-dispatched then)."""
    import time

    from stormtpu.native import HAVE_NATIVE

    if not HAVE_NATIVE:
        return None
    from stormtpu.kernels.sparse import count_matrix_sparse_outer
    from stormtpu.layout import BitMatrix

    rng = np.random.default_rng(7)
    # c_sort: the np.unique over col-major keys (the dominant nnz term).
    # Host-timed probes on this 1-core box are vulnerable to transient
    # load (a concurrent pytest once inflated this 100x and the clamped
    # subtraction below zeroed c_n2/c_emit) — take the min of repeats,
    # which is robust to contention spikes.
    nnz_probe = 4_000_000
    keys = rng.integers(0, 2**62, nnz_probe, dtype=np.int64)

    def min_time(fn, repeats=3):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    c_sort = min_time(lambda: np.unique(keys)) / nnz_probe

    # c_n2 and c_emit come from TWO end-to-end K4 runs (the real code
    # path — a synthetic transpose-read pass over-estimated c_n2 4× and
    # misrouted K4 at shapes where it measurably wins): probe A is
    # emission-light (its remainder after the sort term is the N² pass),
    # probe B emission-heavy (its remainder after sort + N² is E).
    def k4_probe(d):
        n, m = 2048, 1 << 20
        nnz = int(n * m * d)
        rows = rng.integers(0, n, nnz).astype(np.int64)
        poss = rng.integers(0, m, nnz).astype(np.int64)
        bm = BitMatrix.from_positions(rows, poss, n, m)
        count_matrix_sparse_outer(bm)  # warm (allocators, code paths)
        return n, m, nnz, min_time(
            lambda: count_matrix_sparse_outer(bm), repeats=2)

    n, m, nnz_a, total_a = k4_probe(3e-4)
    c_n2 = max(total_a - c_sort * nnz_a, 0.0) / (n * n)
    _, _, nnz_b, total_b = k4_probe(3e-3)
    emissions_b = nnz_b * nnz_b / m  # E ≈ nnz²/M for uniform positions
    c_emit = max(total_b - c_sort * nnz_b - c_n2 * n * n, 0.0) / max(
        emissions_b, 1)

    # h2d: the per-stripe K4-vs-dense model charges dense off-diagonal
    # stripes their j-slice upload (stream._SparseStripePlan) — measure
    # the actual host→device rate with a 64 MB put drained by a tiny
    # fetch (the relay queues transfers and block_until_ready returns
    # early; the 1-element fetch is the honest completion point). The
    # payload is salted per repeat so nothing upstream can memoize it.
    import jax

    h2d_bytes = 64 << 20
    arr = rng.integers(0, 2**32, h2d_bytes // 4, dtype=np.uint32)
    salt = [0]

    def upload():
        salt[0] += 1
        arr[0] = salt[0]
        d = jax.device_put(arr)
        np.asarray(d[:1])

    upload()  # warm the d[:1] executable out of the timed path
    h2d_rate = h2d_bytes / min_time(upload, repeats=2)

    fitted = {
        "c_sort_s_per_nnz": c_sort,
        "c_n2_s_per_elem": c_n2,
        "c_emit_s_per_emission": c_emit,
        "h2d_bytes_per_s": h2d_rate,
        "probe": {"n": n, "m_bits": m,
                  "k4_total_s": [total_a, total_b]},
    }
    log(f"k4 refit: sort {c_sort:.2e} s/nnz, n2 {c_n2:.2e} s/elem, "
        f"emit {c_emit:.2e} s/emission, h2d {h2d_rate/1e6:.0f} MB/s "
        f"(probes {total_a*1e3:.0f}/{total_b*1e3:.0f} ms)")
    return fitted


def tune(
    n: Optional[int] = None,
    m_bits: Optional[int] = None,
    reps: int = 3,
    log=print,
    shapes: Optional[Sequence[tuple[int, int]]] = None,
    slow_path_budget_s: float = 3.0,
) -> dict:
    """Measure all dense paths (and Pallas kernel variants) over the
    shape grid; verify each against the oracle; re-fit the K4 host cost
    model; write the cache. An explicit ``(n, m_bits)`` tunes ONLY that
    shape (the single-shape CLI/legacy entry point); the default is the
    full :data:`DEFAULT_GRID`."""
    import jax

    if shapes is not None:
        grid = list(shapes)
    elif n is not None and m_bits is not None:
        grid = [(n, m_bits)]
    else:
        grid = list(DEFAULT_GRID)

    # variant sweep only at the anchor (largest-work) shape — variant
    # deltas are shape-stable and each extra variant is 2 more compiles.
    # The anchor runs FIRST so the other buckets probe the variant this
    # tune is about to ship, not the previous cache's.
    anchor = max(grid, key=lambda g: g[0] * g[0] * g[1])
    buckets: dict[str, dict] = {}
    log(f"[tune] shape {anchor[0]} x {anchor[1]} bits (anchor)")
    buckets[_bucket_key(*anchor)] = _tune_shape(
        anchor[0], anchor[1], reps, slow_path_budget_s, log,
    )

    def best_variant(prefix: str) -> str:
        # variant choice rides the anchor bucket (largest work, where the
        # delta matters most — and the only bucket that swept both)
        agg = {
            k: v
            for k, v in buckets[_bucket_key(*anchor)]
            ["variant_pairs_per_s"].items()
            if k.startswith(prefix)
        }
        return max(agg, key=agg.get).split("/")[1]

    k1_best, k2_best = best_variant("pallas_dense"), best_variant("pallas_mxu")

    from stormtpu.utils.profiling import timeit_chain
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    tiny = [
        jnp.asarray(rng.integers(0, 2**32, (8, 128), dtype=np.uint32))
        for _ in range(3)
    ]
    floor_s = timeit_chain(lambda x: x & jnp.uint32(7), tiny, 1)

    # intermediate checkpoints carry the previous cache's K4 model (same
    # device only) until this run's refit replaces it at the end; a
    # same-device previous GRID cache also contributes its buckets, so an
    # explicit single-shape probe refreshes one bucket instead of
    # discarding every other measured bucket (the clobbering failure the
    # old CLI default had).
    prev = load_tuning()
    same_device_prev = (
        prev if prev and prev.get("device") == str(jax.devices()[0])
        else None
    )
    prev_k4 = (same_device_prev or {}).get("k4_cost_model")
    prev_buckets = dict((same_device_prev or {}).get("buckets") or {})
    prev_grid = [tuple(g) for g in (same_device_prev or {}).get("grid", [])]
    if len(grid) == 1 and prev_buckets:
        # merged single-shape run: bucket rates are best-of-variant, so
        # they rank strategies correctly even though the GLOBAL variant
        # choice (below) stays the previous grid anchor's
        k1_best = (same_device_prev or {}).get("best_k1_variant", k1_best)
        k2_best = (same_device_prev or {}).get("best_k2_variant", k2_best)

    def assemble() -> dict:
        merged = {**prev_buckets, **buckets} if len(grid) == 1 else buckets
        grid_out = list(grid)
        for g in prev_grid:
            if len(grid) == 1 and g not in grid_out:
                grid_out.append(g)
        result = {
            "device": str(jax.devices()[0]),
            "grid": [list(g) for g in grid_out],
            "buckets": merged,
            "best_k1_variant": k1_best,
            "best_k2_variant": k2_best,
            "dispatch_floor_s": floor_s,
        }
        if prev_k4 is not None:
            result["k4_cost_model"] = prev_k4
        if len(grid) == 1:
            # explicit single-shape runs keep the round-1 top-level fields
            # (CLI users and older cache readers). Gated on len(grid), NOT
            # len(buckets): a full-grid run's first checkpoint also has
            # one bucket (the anchor), and labeling the anchor's rates
            # with grid[0]'s shape mislabeled the cache if the process
            # died mid-grid.
            only = buckets[_bucket_key(*anchor)]
            result["dense_pairs_per_s"] = only["dense_pairs_per_s"]
            result["variant_pairs_per_s"] = only["variant_pairs_per_s"]
            result["shape"] = {"n": grid[0][0], "m_bits": grid[0][1]}
        return result

    def write(result: dict) -> str:
        path = cache_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(result, f, indent=2)
        os.replace(tmp, path)
        return path

    # checkpoint the cache after EVERY bucket: a grid run is tens of
    # minutes of device time through this relay, and a killed process
    # must not lose the measured buckets (nearest-bucket dispatch is
    # correct on any prefix of the grid).
    write(assemble())
    for gn, gm in grid:
        if (gn, gm) == anchor:
            continue
        log(f"[tune] shape {gn} x {gm} bits")
        buckets[_bucket_key(gn, gm)] = _tune_shape(
            gn, gm, reps, slow_path_budget_s, log,
            k1_variant=k1_best, k2_variant=k2_best,
        )
        write(assemble())

    result = assemble()

    # device TOPS for the K4-vs-K2 crossover: best measured MXU rate over
    # every bucket in the outgoing cache — including merged-in previous
    # buckets on a single-shape refresh, whose small new bucket alone
    # would under-estimate the device and bias dispatch toward K4
    # (2·m_bits int8 MACs per unique pair)
    k2_tops = 0.0
    for key, b in result["buckets"].items():
        bm_bits = int(key.split("x")[1])
        rate = b["dense_pairs_per_s"].get("pallas_mxu", 0.0)
        k2_tops = max(k2_tops, rate * 2 * bm_bits)
    k4 = refit_k4_constants(log)
    if k4 is not None:
        k4["k2_int8_ops_per_s"] = k2_tops
        k4["dispatch_floor_s"] = floor_s
        result["k4_cost_model"] = k4

    log(f"wrote {write(result)}")
    return result
