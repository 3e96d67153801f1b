"""Benchmark harness (reference C14 analog; SURVEY.md §4.5).

Like the reference's harness, every number is **verified against the exact
oracle before being reported** — an unverified benchmark is never printed.

Headline config: dense all-pairs N=16384 × M=65536 bits (BASELINE.json:8
shape, scaled up so per-dispatch compute dominates every overhead). All exact kernel paths are measured (XLA popcount, XLA int8 XXᵀ,
Pallas K1 VPU, Pallas K2 MXU) and the best verified path is reported —
the density/shape-adaptive engine ships whichever kernel wins on the
hardware it finds, exactly like the reference's runtime dispatch (C6).

Baseline ("vs_baseline"): the reference's published numbers are
unavailable (BASELINE.json:13 '"published": {}'; the reference mount is
empty), so the baseline is a faithful port of the reference's own
algorithm to this device — a streaming word-wise AND+popcount over each
pair's full 2·M/8 bytes with no tile reuse — measured on the same device
in the same session. vs_baseline = headline pairs/s ÷ streaming pairs/s:
how much the blocked, reuse-heavy TPU formulation beats a straight port.

Timing methodology: the axon relay memoizes identical executions and its
block_until_ready can return before remote completion, so every timed rep
materializes a host-side checksum of the output (np.asarray of a reduced
scalar) and inputs are pre-staged device buffers. The relay also imposes a
~25 ms fixed latency on EVERY dispatch (measured by a tiny-op probe), which
would swamp kernels whose true device time is 10-40 ms; the headline is
therefore **sustained throughput via slope timing**: time an in-jit
lax.scan chain of C1 and C2 kernel invocations on step-perturbed inputs
(x ^ step — every step computes the full all-pairs on a genuinely
different matrix; CSE/memoization cannot elide it) and take
(t(C2)-t(C1))/(C2-C1), which cancels the fixed dispatch cost exactly. The
per-dispatch (latency-inclusive) numbers are kept in bench_details.json.

Diagnostics on stderr; per-path details in bench_details.json; stdout is
exactly ONE JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

N_HEAD = 16384
M_HEAD = 65536
REPS = 3


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _checksummed(fn):
    """Wrap a device computation so timing it is honest on this relay:
    the checksum is NONLINEAR in the result (modulo), so it cannot be
    algebraically factored away, lives in the SAME executable (no
    cross-executable laziness), and ships 4 bytes to host."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def g(x):
        c = fn(x)
        leaf = jax.tree.leaves(c)[0]
        return jnp.sum(leaf % jnp.int32(251))

    return g


def _timeit(fn, xs) -> float:
    """Honest mean over DISTINCT pre-staged device inputs (the relay
    memoizes identical executions; block_until_ready can return early, so
    each rep materializes the in-jit checksum scalar). ``xs[0]`` is the
    warmup/compile input; the rest are timed."""
    g = _checksummed(fn)
    np.asarray(g(xs[0]))  # compile + full roundtrip
    t0 = time.time()
    for x in xs[1:]:
        np.asarray(g(x))
    return (time.time() - t0) / (len(xs) - 1)


def _timeit_sustained(fn, xs, c1: int = 2, c2: int = 10) -> float:
    """Sustained per-invocation device time (shared slope-timing
    implementation: stormtpu.utils.profiling.timeit_sustained)."""
    from stormtpu.utils import timeit_sustained

    return timeit_sustained(fn, xs, c1=c1, c2=c2)


def _verify_sample(c: np.ndarray, packed: np.ndarray, n_samples: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    n = c.shape[0]
    ii = rng.integers(0, n, n_samples)
    jj = rng.integers(0, n, n_samples)
    want = np.bitwise_count(packed[ii] & packed[jj]).sum(axis=1, dtype=np.int64)
    got = c[ii, jj].astype(np.int64)
    if not np.array_equal(got, want):
        raise AssertionError(
            f"VERIFICATION FAILED on {int((got != want).sum())} of "
            f"{n_samples} sampled pairs"
        )


def main() -> None:
    import argparse

    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default="", help="jax.profiler trace dir")
    ap.add_argument(
        "--smoke", action="store_true",
        help="tiny shape for CI contract checks (CPU-friendly; the "
        "reported number is NOT a performance figure)",
    )
    cli = ap.parse_args()

    from stormtpu.kernels import xla as kx
    from stormtpu.kernels.dense import count_tiles_pallas_dense
    from stormtpu.kernels.mxu import count_tiles_pallas_mxu
    from stormtpu.utils import (
        assemble_triangular,
        pallas_interpret_default,
        triangular_tile_ids,
    )

    # Backend probe with a timeout, in a SUBPROCESS: the axon relay has
    # gone hard-down for hours at a stretch, and jax.devices() then hangs
    # inside the plugin's C retry loop (uninterruptible in-process — a
    # SIGALRM never fires, measured). The driver contract is ONE JSON
    # line; a hang loses the round's bench artifact, so probe first and
    # fall back to a marked CPU smoke run. Override the probe timeout via
    # STORMTPU_BENCH_BACKEND_TIMEOUT_S; 0 skips the probe.
    import os
    import subprocess
    import sys

    degraded = None
    try:
        probe_s = int(os.environ.get("STORMTPU_BENCH_BACKEND_TIMEOUT_S",
                                     "300"))
    except ValueError:
        # a malformed override must not break the one-JSON-line contract
        # this probe exists to protect
        probe_s = 300
    if probe_s > 0 and "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_s, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
            log(f"TPU backend unavailable ({type(e).__name__}); falling "
                f"back to a CPU smoke run — the reported number is NOT a "
                f"device rate")
            jax.config.update("jax_platforms", "cpu")
            degraded = "tpu-unavailable-cpu-fallback"
            cli.smoke = True
    dev = jax.devices()[0]
    log(f"device: {dev} (platform={dev.platform})")
    interpret = pallas_interpret_default()

    n, m_bits = (1024, 4096) if cli.smoke else (N_HEAD, M_HEAD)
    w = m_bits // 32
    rng = np.random.default_rng(12345)
    packed = rng.integers(0, 2**32, (n, w), dtype=np.uint32)
    # REPS+1 distinct device-resident inputs (memoization defeat): the
    # first is warmup/verify, the rest are timed.
    xds = [jnp.asarray(packed)] + [
        jnp.asarray(rng.integers(0, 2**32, (n, w), dtype=np.uint32))
        for _ in range(REPS)
    ]
    xd = xds[0]
    # Deliverable-normalized rate: every candidate is scored on UNIQUE
    # pairs delivered per second (the square XLA paths compute the full
    # N×N — 2× the work for the same deliverable — and are charged for it,
    # exactly as a user experiences).
    pairs_tri = n * (n + 1) / 2

    candidates = {}

    if cli.profile:
        jax.profiler.start_trace(cli.profile)

    # --- fixed dispatch latency probe (tiny op, full roundtrip) ----------
    tiny = [
        jnp.asarray(rng.integers(0, 2**32, (8, 128), dtype=np.uint32))
        for _ in range(REPS + 1)
    ]
    latency_s = _timeit(lambda x: x & jnp.uint32(7), tiny)
    log(f"[latency] fixed per-dispatch floor: {latency_s * 1e3:.1f} ms "
        f"(cancelled out of sustained numbers by slope timing)")

    # --- reference-style baseline: streaming AND+popcount, no reuse ------
    # One full 2×(M/8)-byte stream per pair, batched R pairs per launch.
    # Timed SUSTAINED (same slope methodology as the candidates). R is
    # sized so the per-step working set (2×128 MB) far exceeds on-chip
    # storage and cannot stay resident across scan steps — the baseline
    # must remain an honest HBM-bound stream. Both operands are jit
    # ARGUMENTS (a closure constant of this size gets baked into the HLO
    # and rejected by the remote compiler).
    r_stream = 16384
    ab_hosts = [
        rng.integers(0, 2**32, (2, r_stream, w), dtype=np.uint32)
        for _ in range(REPS + 1)
    ]
    ab_list = [jnp.asarray(a) for a in ab_hosts]
    ab0 = ab_hosts[0]  # host copy kept: verifying via D2H of 268 MB would
    # cost seconds on this tunnel
    got = np.asarray(
        kx.pair_count_batch_xla(ab_list[0][0], ab_list[0][1])
    ).astype(np.int64)
    want = np.bitwise_count(ab0[0] & ab0[1]).sum(axis=1, dtype=np.int64)
    assert np.array_equal(got, want), "stream baseline failed verification"
    # Salted long chains: the baseline's per-step cost is sub-ms
    # (≈0.36 ms at the measured 744 GB/s), so (a) short chains leave the
    # marginal inside the ±5 ms relay jitter (r1's 193 GB/s row), and
    # (b) the generic `x ^ s` perturbation of the STACKED input
    # materializes a 256 MB temp per step, tripling the measured traffic
    # (226 GB/s artifact) — the salt must enter post-slice where XLA can
    # fuse it. See profiling.timeit_sustained_salted.
    from stormtpu.utils import timeit_sustained_salted

    dt = timeit_sustained_salted(
        lambda ab, s: kx.pair_count_batch_xla(ab[0] ^ s, ab[1]), ab_list,
        c1=16, c2=192,
    )
    base_pairs_s = r_stream / dt
    base_gbps = 2 * r_stream * w * 4 / dt / 1e9
    log(f"[baseline] streaming AND+popcount: {base_pairs_s:,.0f} pairs/s "
        f"({base_gbps:.2f} GB/s) on {m_bits}-bit pairs, sustained")

    def add_candidate(name, f, c1=2, c2=10):
        dt_rt = _timeit(f, xds)
        dt_s = _timeit_sustained(f, xds, c1=c1, c2=c2)
        candidates[name] = {
            "seconds_sustained": dt_s,
            "seconds_per_dispatch": dt_rt,
            "pairs_per_s": pairs_tri / dt_s,
        }

    # --- candidate: XLA popcount all-pairs (full square) ------------------
    c_pc = np.asarray(kx.count_block_popcount_xla(xd, xd, tile_rows=8))
    _verify_sample(c_pc, packed, 4096, seed=1)
    add_candidate(
        "xla_popcount",
        lambda x: kx.count_block_popcount_xla(x, x, tile_rows=8),
        c1=1, c2=2,  # slow path (~1 s/step at N=16384); keep the run bounded
    )

    # --- candidate: XLA int8 XXᵀ (full square) ----------------------------
    c_i8 = np.asarray(kx.count_block_int8_xla(xd, xd))
    _verify_sample(c_i8, packed, 4096, seed=2)
    add_candidate("xla_int8_mxu", lambda x: kx.count_block_int8_xla(x, x),
                  c1=1, c2=5)

    # --- candidate: Pallas K1 (VPU popcount, triangular) ------------------
    from stormtpu.config import default_config
    from stormtpu.tuning import tuned_variant

    cfg = default_config()
    ti1, wk1 = cfg.k1_tile_rows, min(cfg.k1_tile_words, w)
    ibs1, jbs1 = triangular_tile_ids(n // ti1)
    i1, j1 = jnp.asarray(ibs1), jnp.asarray(jbs1)
    k1_variant = tuned_variant("k1", cfg.k1_variant)
    k1 = lambda x: count_tiles_pallas_dense(
        x, i1, j1, tile_rows=ti1, tile_words=wk1, interpret=interpret,
        variant=k1_variant,
    )
    c_k1 = assemble_triangular(np.asarray(k1(xd)), ibs1, jbs1, n // ti1, n)
    _verify_sample(c_k1, packed, 4096, seed=3)
    add_candidate("pallas_k1_vpu", k1, c1=1, c2=3)

    # --- candidate: Pallas K2 (MXU int8, triangular) ----------------------
    ti2, wk2 = cfg.k2_tile_rows, min(cfg.k2_tile_words, w)
    ibs2, jbs2 = triangular_tile_ids(n // ti2)
    i2, j2 = jnp.asarray(ibs2), jnp.asarray(jbs2)
    k2_variant = tuned_variant("k2", cfg.k2_variant)
    k2 = lambda x: count_tiles_pallas_mxu(
        x, i2, j2, tile_rows=ti2, tile_words=wk2, interpret=interpret,
        variant=k2_variant,
    )
    c_k2 = assemble_triangular(np.asarray(k2(xd)), ibs2, jbs2, n // ti2, n)
    _verify_sample(c_k2, packed, 4096, seed=4)
    add_candidate("pallas_k2_mxu", k2, c1=1, c2=7)

    if cli.profile:
        jax.profiler.stop_trace()
        log(f"[profile] trace written to {cli.profile}")

    for name, d in sorted(candidates.items(), key=lambda kv: -kv[1]["pairs_per_s"]):
        log(f"[{name:>14}] {d['pairs_per_s'] / 1e9:.6f} G-pairs/s sustained "
            f"({d['seconds_sustained'] * 1e3:.1f} ms; "
            f"{d['seconds_per_dispatch'] * 1e3:.1f} ms per-dispatch)")

    best_name, best = max(candidates.items(), key=lambda kv: kv[1]["pairs_per_s"])
    gpairs = best["pairs_per_s"] / 1e9
    eff_gbps = best["pairs_per_s"] * 2 * (m_bits / 8) / 1e9
    vs_baseline = best["pairs_per_s"] / base_pairs_s
    # roofline accounting (v5e nominal): each unique pair costs 2·M int8
    # MACs on the MXU path — only meaningful when an MXU kernel won
    from stormtpu.utils import V5E_INT8_PEAK_OPS

    if "mxu" in best_name:
        mxu_frac = best["pairs_per_s"] * 2 * m_bits / V5E_INT8_PEAK_OPS
        log(f"[roofline] best kernel ≈ {mxu_frac * 100:.0f}% of v5e int8 "
            f"MXU peak")
    else:
        mxu_frac = None

    details = {
        "device": str(dev),
        "config": {"n": n, "m_bits": m_bits, "reps": REPS},
        "dispatch_latency_ms": latency_s * 1e3,
        "timing": "sustained = slope over in-jit scan chains of perturbed "
        "inputs (fixed dispatch latency cancels); per_dispatch = single "
        "launch incl. relay roundtrip",
        "baseline_streaming": {
            "pairs_per_s": base_pairs_s,
            "GBps": base_gbps,
            "definition": "reference-algorithm port: per-pair full-stream "
            "AND+popcount, no reuse, same device, sustained timing",
        },
        "candidates": candidates,
        "best": best_name,
    }
    with open("bench_details.json", "w") as f:
        json.dump(details, f, indent=2)

    print(
        json.dumps(
            {
                "metric": (
                    f"allpairs_intersect_count_{n}x{m_bits}_dense_SMOKE"
                    if cli.smoke
                    else "allpairs_intersect_count_16384x65536_dense"
                ),
                "value": round(gpairs, 6),
                "unit": "G-pairs/s",
                "vs_baseline": round(vs_baseline, 3),
                "best_kernel": best_name,
                "effective_GBps": round(eff_gbps, 2),
                "mxu_int8_peak_frac": (
                    round(mxu_frac, 3) if mxu_frac is not None else None
                ),
                "verified_exact": True,
                "baseline_def": "reference-style streaming AND+popcount on same device",
                **({"degraded": degraded} if degraded else {}),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
