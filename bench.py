"""Benchmark harness (reference C14 analog; SURVEY.md §4.5).

Like the reference's harness, every number is **verified against the exact
oracle before being reported** — an unverified benchmark is never printed.
Verification is sampled in-jit (the candidate computes 4096 randomly
sampled pair counts on device, 16 KB fetched) because a full count-matrix
D2H at the headline shape is ~1 GB through this relay and adds nothing:
the old full fetch was itself only sample-checked.

Headline config: dense all-pairs N=16384 × M=65536 bits (BASELINE.json:8
shape, scaled up so per-dispatch compute dominates every overhead). All
exact kernel paths are measured (XLA popcount, XLA int8 XXᵀ, Pallas K1
VPU, Pallas K2 MXU) and the best verified path is reported — the
density/shape-adaptive engine ships whichever kernel wins on the hardware
it finds, exactly like the reference's runtime dispatch (C6).

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

Driver contract hardening (the round-2 artifact was lost to rc=124 —
VERDICT r2 weak #1): stdout must carry EXACTLY ONE JSON line no matter
how this process ends. Three mechanisms, layered:

1. **Global wall-clock deadline** (STORMTPU_BENCH_DEADLINE_S, default
   1200 s — well under any sane driver timeout), checked between stages
   AND enforced by a watchdog *thread* that flushes the best-so-far line
   and exits. A thread, not a signal: when the main thread is parked
   inside the PJRT plugin's C wait (slow relay fetch, 20-min cold
   compile) Python signal handlers are deferred indefinitely, but a
   daemon thread keeps running the moment the C call releases the GIL.
2. **Degraded-relay adaptation**: the tiny-op latency probe's measured
   floor is consumed — floor ≥ STORMTPU_BENCH_DEGRADED_FLOOR_S (0.2 s)
   switches to a reduced plan (two strongest candidates, one timed rep,
   shorter baseline chains, floor-scaled slope chains) and marks the
   output "degraded": "relay-slow". The r2 bench measured a 1240 ms
   floor, ignored it, and died mid-plan.
3. **Incremental emission**: every completed stage immediately updates
   the prebuilt result line and bench_details.json, so a SIGTERM (the
   driver's `timeout` sends TERM before KILL) or the watchdog flushes a
   valid, verified, best-so-far artifact. Until the streaming baseline
   has been measured, vs_baseline falls back to the last recorded device
   baseline (marked "vs_baseline_source": "recorded-2026-08-17").

Test coverage: tests/test_bench_contract.py runs this file under an
injected 1 s-per-dispatch tax (STORMTPU_TEST_DISPATCH_TAX_S) with a tight
deadline and a hard kill, and asserts the one-JSON-line contract holds.

Diagnostics on stderr; per-path details in bench_details.json; stdout is
exactly ONE JSON line.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

import numpy as np

N_HEAD = 16384
M_HEAD = 65536
REPS = 3

# Last recorded device baseline at the headline shape (round-3 honest
# chains, 2026-08-18: 44.07 M pairs/s = 722 GB/s stream — earlier rounds'
# shorter chains under-measured it; BASELINE.md streaming notes): used for
# vs_baseline ONLY while this run's own baseline stage hasn't completed
# yet, and marked as such.
_RECORDED_BASELINE_PAIRS_S = 44_069_833
_RECORDED_BASELINE_TAG = "recorded-2026-08-18"


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


class _DeadlineHit(Exception):
    """Raised by between-stage checks when the budget is exhausted."""


class BenchRun:
    """Best-so-far state with a crash-/kill-/deadline-proof single flush.

    The JSON line is PREBUILT on every update; the emergency paths
    (watchdog thread, SIGTERM handler) rebuild it only to stamp a
    degraded marker, and every build/mutation of the shared candidate
    dict happens under one REENTRANT lock — reentrant because the signal
    handler runs on the main thread and may interrupt a frame that
    already holds it (a plain Lock would deadlock the flush), while the
    watchdog is a real second thread that must not iterate the dict
    mid-insert. No device calls ever happen under the lock, so the
    emergency paths cannot block on a hung relay."""

    def __init__(self, deadline_s: float, smoke: bool,
                 n: int, m_bits: int) -> None:
        self.t0 = time.monotonic()
        self.deadline_s = deadline_s
        self.smoke = smoke
        self.n, self.m_bits = n, m_bits
        self.degraded: str | None = None
        self.details: dict = {}
        self.candidates: dict = {}
        self.baseline_pairs_s: float | None = None
        self.skipped: list[str] = []
        self._line: str | None = None
        self._lock = threading.RLock()
        self._flushed = False
        # artifact-of-record hygiene (VERDICT r4 weak #6): only the
        # round-end run (scripts/tpu_return.sh, which exports
        # STORMTPU_BENCH_CANONICAL=1) writes bench_details.json; any
        # other invocation — the driver's capture window included —
        # writes a dated side file so it can never clobber the clean
        # committed artifact. Dated files are gitignored.
        if os.environ.get("STORMTPU_BENCH_CANONICAL") == "1":
            self.details_path = "bench_details.json"
        else:
            self.details_path = time.strftime(
                "bench_details_%Y%m%d_%H%M%S.json")

    def record_candidate(self, name: str, d: dict) -> None:
        """Insert under the lock: the watchdog iterates ``candidates``
        while flushing, and a concurrent insert would blow up exactly
        when the emergency line is being built."""
        with self._lock:
            self.candidates[name] = d
        self.update()

    def _metric_name(self) -> str:
        suffix = "_SMOKE" if self.smoke else ""
        return f"allpairs_intersect_count_{self.n}x{self.m_bits}_dense{suffix}"

    def _fallback_line(self, reason: str) -> str:
        """Parseable last-resort line when NOTHING was verified: value 0
        with an explicit marker beats losing the artifact (BENCH_r02 was
        rc=124/parsed=null), and cannot be mistaken for a real rate."""
        return json.dumps({
            "metric": self._metric_name(),
            "value": 0.0,
            "unit": "G-pairs/s",
            "vs_baseline": None,
            "verified_exact": False,
            "degraded": reason,
            **({"skipped_stages": self.skipped} if self.skipped else {}),
        })

    # -- budget --------------------------------------------------------
    def remaining(self) -> float:
        return self.deadline_s - (time.monotonic() - self.t0)

    def require(self, est_s: float, stage: str) -> None:
        """Between-stage gate: skip everything downstream when ``stage``
        cannot plausibly finish inside the budget."""
        if self.remaining() < est_s:
            self.skipped.append(stage)
            log(f"[deadline] {self.remaining():.0f} s left < {est_s:.0f} s "
                f"estimated for '{stage}' — flushing best-so-far")
            raise _DeadlineHit(stage)

    # -- result building ------------------------------------------------
    def _build_line(self, extra_degraded: str | None = None) -> str | None:
        best = None
        for name, d in self.candidates.items():
            if best is None or d["pairs_per_s"] > best[1]["pairs_per_s"]:
                best = (name, d)
        if best is None:
            return None
        name, d = best
        n, m_bits = self.n, self.m_bits
        pairs_s = d["pairs_per_s"]
        if self.baseline_pairs_s is not None:
            vs_baseline = round(pairs_s / self.baseline_pairs_s, 3)
            vs_src = "measured"
        elif not self.smoke:
            vs_baseline = round(pairs_s / _RECORDED_BASELINE_PAIRS_S, 3)
            vs_src = _RECORDED_BASELINE_TAG
        else:
            vs_baseline, vs_src = None, "unavailable"
        from stormtpu.utils import V5E_INT8_PEAK_OPS

        mxu_frac = (
            round(pairs_s * 2 * m_bits / V5E_INT8_PEAK_OPS, 3)
            if "mxu" in name else None
        )
        degraded = extra_degraded or self.degraded
        out = {
            "metric": self._metric_name(),
            "value": round(pairs_s / 1e9, 6),
            "unit": "G-pairs/s",
            "vs_baseline": vs_baseline,
            "best_kernel": name,
            "effective_GBps": round(pairs_s * 2 * (m_bits / 8) / 1e9, 2),
            "mxu_int8_peak_frac": mxu_frac,
            "verified_exact": True,
            "baseline_def": "reference-style streaming AND+popcount on same device",
            **({"vs_baseline_source": vs_src} if vs_src != "measured" else {}),
            **({"degraded": degraded} if degraded else {}),
            **({"skipped_stages": self.skipped} if self.skipped else {}),
        }
        return json.dumps(out)

    def update(self) -> None:
        """Rebuild the emergency line and persist details (incremental
        artifact: a partial run is a valid run)."""
        with self._lock:
            self._line = self._build_line()
            self.details["candidates"] = self.candidates
            self.details["skipped_stages"] = self.skipped
            if self.degraded:
                self.details["degraded"] = self.degraded
            payload = json.dumps(self.details, indent=2)
        try:
            with open(self.details_path, "w") as f:
                f.write(payload)
        except OSError:
            pass

    def flush(self, extra_degraded: str | None = None) -> bool:
        """Print the one JSON line (idempotent; thread-safe). When nothing
        verified exists, prints the fallback line instead — the driver
        ALWAYS gets its artifact. Returns False iff the fallback fired."""
        with self._lock:
            if self._flushed:
                return True
            line = (
                self._build_line(extra_degraded)
                if extra_degraded else self._line
            )
            ok = line is not None
            if not ok:
                line = self._fallback_line(
                    extra_degraded or self.degraded or "no-candidate-measured")
            self._flushed = True
        print(line, flush=True)
        return ok

    # -- emergency paths --------------------------------------------------
    def arm(self) -> None:
        def watchdog() -> None:
            while True:
                time.sleep(1.0)
                if self._flushed:
                    return
                if self.remaining() <= 0:
                    log("[watchdog] deadline expired — flushing "
                        "best-so-far and exiting")
                    ok = self.flush(extra_degraded=self.degraded or "deadline")
                    os._exit(0 if ok else 1)

        t = threading.Thread(target=watchdog, daemon=True, name="bench-watchdog")
        t.start()

        def on_term(signum, frame):  # noqa: ANN001
            log(f"[signal] {signal.Signals(signum).name} — flushing "
                f"best-so-far")
            ok = self.flush(extra_degraded=self.degraded or "killed")
            os._exit(0 if ok else 1)

        try:
            signal.signal(signal.SIGTERM, on_term)
        except ValueError:  # non-main thread (embedded use)
            pass


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default="", help="jax.profiler trace dir")
    ap.add_argument(
        "--smoke", action="store_true",
        help="tiny shape for CI contract checks (CPU-friendly; the "
        "reported number is NOT a performance figure)",
    )
    cli = ap.parse_args()

    try:
        deadline_s = float(os.environ.get("STORMTPU_BENCH_DEADLINE_S", "1200"))
    except ValueError:
        deadline_s = 1200.0
    try:
        degraded_floor_s = float(
            os.environ.get("STORMTPU_BENCH_DEGRADED_FLOOR_S", "0.2"))
    except ValueError:
        degraded_floor_s = 0.2

    import jax
    import jax.numpy as jnp

    # Backend probe with a timeout, in a SUBPROCESS: the axon relay has
    # gone hard-down for hours at a stretch, and jax.devices() then hangs
    # inside the plugin's C retry loop (uninterruptible in-process — a
    # SIGALRM never fires, measured). The driver contract is ONE JSON
    # line; a hang loses the round's bench artifact, so probe first and
    # fall back to a marked CPU smoke run. Override the probe timeout via
    # STORMTPU_BENCH_BACKEND_TIMEOUT_S; 0 skips the probe.
    import subprocess

    backend_degraded = None
    try:
        probe_s = int(os.environ.get("STORMTPU_BENCH_BACKEND_TIMEOUT_S",
                                     "300"))
    except ValueError:
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
            backend_degraded = "tpu-unavailable-cpu-fallback"
            cli.smoke = True

    n, m_bits = (1024, 4096) if cli.smoke else (N_HEAD, M_HEAD)
    run = BenchRun(deadline_s, smoke=cli.smoke, n=n, m_bits=m_bits)
    run.degraded = backend_degraded
    run.arm()

    from stormtpu.kernels import xla as kx
    from stormtpu.kernels.dense import count_tiles_pallas_dense
    from stormtpu.kernels.mxu import count_tiles_pallas_mxu
    from stormtpu.utils import (
        pallas_interpret_default,
        triangular_tile_ids,
    )
    from stormtpu.utils.profiling import (
        _test_dispatch_tax,
        timeit_chain,
        timeit_sustained,
        timeit_sustained_salted,
    )

    dev = jax.devices()[0]
    log(f"device: {dev} (platform={dev.platform})")
    # Host-contention warning (VERDICT r2 weak #2): on this 1-core host a
    # concurrent process poisons every host-timed measurement.
    try:
        load1 = os.getloadavg()[0]
        if load1 > 1.5:
            log(f"[warn] load average {load1:.1f} on a 1-core host — "
                f"another process is running; timings may be contaminated")
    except OSError:
        pass
    interpret = pallas_interpret_default()

    w = m_bits // 32
    run.details = {
        "device": str(dev),
        "config": {"n": n, "m_bits": m_bits, "reps": REPS},
        "deadline_s": deadline_s,
        "timing": "sustained = slope over in-jit scan chains of perturbed "
        "inputs (fixed dispatch latency cancels); per_dispatch = single "
        "launch incl. relay roundtrip",
    }

    rng = np.random.default_rng(12345)
    packed = rng.integers(0, 2**32, (n, w), dtype=np.uint32)
    pairs_tri = n * (n + 1) / 2

    if cli.profile:
        jax.profiler.start_trace(cli.profile)

    # --- fixed dispatch latency probe (tiny op, full roundtrip) ----------
    tiny = [
        jnp.asarray(rng.integers(0, 2**32, (8, 128), dtype=np.uint32))
        for _ in range(4)
    ]
    g_tiny = jax.jit(lambda x: jnp.sum((x & jnp.uint32(7)) % jnp.int32(251)))
    np.asarray(g_tiny(tiny[0]))
    _test_dispatch_tax()
    t0 = time.time()
    for x in tiny[1:]:
        np.asarray(g_tiny(x))
        _test_dispatch_tax()
    latency_s = (time.time() - t0) / (len(tiny) - 1)
    run.details["dispatch_latency_ms"] = latency_s * 1e3
    log(f"[latency] fixed per-dispatch floor: {latency_s * 1e3:.1f} ms "
        f"(cancelled out of sustained numbers by slope timing)")

    # --- degraded-relay adaptation (consume the floor measurement) -------
    relay_slow = latency_s >= degraded_floor_s
    if relay_slow and not run.degraded:
        run.degraded = "relay-slow"
        log(f"[degraded] dispatch floor {latency_s * 1e3:.0f} ms ≥ "
            f"{degraded_floor_s * 1e3:.0f} ms — reduced plan: 2 candidates, "
            f"1 timed rep, short baseline chains")
    reps_eff = 1 if relay_slow else REPS
    xds = [jnp.asarray(packed)] + [
        jnp.asarray(rng.integers(0, 2**32, (n, w), dtype=np.uint32))
        for _ in range(reps_eff)
    ]
    xd = xds[0]

    # --- candidate machinery ---------------------------------------------
    # sampled pairs for in-jit verification (host oracle is cheap)
    n_samples = 512 if relay_slow else 4096
    vrng = np.random.default_rng(7)
    ii = vrng.integers(0, n, n_samples)
    jj = vrng.integers(0, n, n_samples)
    want_samples = np.bitwise_count(packed[ii] & packed[jj]).sum(
        axis=1, dtype=np.int64)

    def verify_square(f) -> None:
        got = np.asarray(jax.jit(lambda x: f(x)[ii, jj])(xd)).astype(np.int64)
        if not np.array_equal(got, want_samples):
            raise AssertionError(
                f"VERIFICATION FAILED on {int((got != want_samples).sum())} "
                f"of {n_samples} sampled pairs")

    def verify_tri(f, ibs, jbs, ti) -> None:
        # map sampled (i, j) onto the triangular tile stack (T, ti, ti):
        # tile-level swap so ib ≤ jb (counts are symmetric)
        si = np.minimum(ii // ti, jj // ti)
        sj = np.maximum(ii // ti, jj // ti)
        swap = (ii // ti) > (jj // ti)
        li = np.where(swap, jj, ii) % ti
        lj = np.where(swap, ii, jj) % ti
        tile_of = {(int(a), int(b)): k for k, (a, b) in enumerate(zip(ibs, jbs))}
        tidx = np.array([tile_of[(int(a), int(b))] for a, b in zip(si, sj)])
        got = np.asarray(
            jax.jit(lambda x: f(x)[tidx, li, lj])(xd)).astype(np.int64)
        if not np.array_equal(got, want_samples):
            raise AssertionError(
                f"VERIFICATION FAILED on {int((got != want_samples).sum())} "
                f"of {n_samples} sampled pairs")

    def _timeit_per_dispatch(f) -> float:
        return timeit_chain(f, xds, 1)

    def add_candidate(name, f, verify, c1, c2) -> None:
        stage_est = 60 if cli.smoke else 180
        run.require(stage_est, name)
        t_start = time.monotonic()
        verify(f)
        if relay_slow:
            # floor-scaled chains: the marginal must clear floor-sized
            # jitter, and every extra dispatch costs ≥ the floor
            dt_rt = None
            t1 = timeit_chain(f, xds, 1)
            step_est = max(t1 - latency_s, 1e-6)
            c2 = int(min(c2 * 4, max(4, -(-2 * latency_s // step_est) + 2)))
            c1 = max(1, c2 // 8)
            dt_s = timeit_sustained(f, xds, c1=c1, c2=c2)
        else:
            dt_rt = _timeit_per_dispatch(f)
            dt_s = timeit_sustained(f, xds, c1=c1, c2=c2)
        run.record_candidate(name, {
            "seconds_sustained": dt_s,
            **({"seconds_per_dispatch": dt_rt} if dt_rt is not None else {}),
            "pairs_per_s": pairs_tri / dt_s,
            "stage_seconds": time.monotonic() - t_start,
            "verified": f"sampled-{n_samples}-exact",
        })
        log(f"[{name:>14}] "
            f"{run.candidates[name]['pairs_per_s'] / 1e9:.6f} G-pairs/s "
            f"sustained ({dt_s * 1e3:.1f} ms)")

    from stormtpu.config import default_config
    from stormtpu.tuning import tuned_variant

    cfg = default_config()

    def make_k2():
        ti2, wk2 = cfg.k2_tile_rows, min(cfg.k2_tile_words, w)
        ibs2, jbs2 = triangular_tile_ids(n // ti2)
        i2, j2 = jnp.asarray(ibs2), jnp.asarray(jbs2)
        k2_variant = tuned_variant("k2", cfg.k2_variant)
        f = lambda x: count_tiles_pallas_mxu(
            x, i2, j2, tile_rows=ti2, tile_words=wk2, interpret=interpret,
            variant=k2_variant,
        )
        return f, (lambda g: verify_tri(g, ibs2, jbs2, ti2))

    def make_k1():
        ti1, wk1 = cfg.k1_tile_rows, min(cfg.k1_tile_words, w)
        ibs1, jbs1 = triangular_tile_ids(n // ti1)
        i1, j1 = jnp.asarray(ibs1), jnp.asarray(jbs1)
        k1_variant = tuned_variant("k1", cfg.k1_variant)
        f = lambda x: count_tiles_pallas_dense(
            x, i1, j1, tile_rows=ti1, tile_words=wk1, interpret=interpret,
            variant=k1_variant,
        )
        return f, (lambda g: verify_tri(g, ibs1, jbs1, ti1))

    # plan: strongest candidate FIRST so a kill 2 minutes in still ships a
    # verified number; weakest candidates only run when budget remains
    k2f, k2v = make_k2()
    plan = [("pallas_k2_mxu", k2f, k2v, 1, 7),
            ("xla_int8_mxu", lambda x: kx.count_block_int8_xla(x, x),
             verify_square, 1, 5)]
    if not relay_slow:
        k1f, k1v = make_k1()
        plan += [("pallas_k1_vpu", k1f, k1v, 1, 3),
                 ("xla_popcount",
                  lambda x: kx.count_block_popcount_xla(x, x, tile_rows=8),
                  verify_square, 1, 2)]

    try:
        # first candidate before the baseline: a verified value exists
        # within one compile+chain, whatever happens later
        name, f, v, c1, c2 = plan[0]
        add_candidate(name, f, v, c1, c2)

        # --- reference-style baseline: streaming AND+popcount, no reuse --
        # One full 2×(M/8)-byte stream per pair, batched R pairs per
        # launch, R sized so the per-step working set (2×128 MB) cannot
        # stay resident across scan steps — an honest HBM-bound stream.
        # Both operands are jit ARGUMENTS (closure constants this size get
        # baked into HLO and rejected by the remote compiler). Salt enters
        # post-slice so XLA fuses it (a stacked-input x^s materializes a
        # 256 MB temp per step and triples measured traffic — profiling
        # module docstring).
        run.require(60 if cli.smoke else 180, "baseline_stream")
        r_stream = 16384 if not cli.smoke else 2048
        ab_hosts = [
            rng.integers(0, 2**32, (2, r_stream, w), dtype=np.uint32)
            for _ in range(reps_eff + 1)
        ]
        ab_list = [jnp.asarray(a) for a in ab_hosts]
        got = np.asarray(
            kx.pair_count_batch_xla(ab_list[0][0], ab_list[0][1])
        ).astype(np.int64)
        want = np.bitwise_count(ab_hosts[0][0] & ab_hosts[0][1]).sum(
            axis=1, dtype=np.int64)
        assert np.array_equal(got, want), "stream baseline failed verification"
        bc1, bc2 = (8, 48) if relay_slow else (16, 192)
        dt = timeit_sustained_salted(
            lambda ab, s: kx.pair_count_batch_xla(ab[0] ^ s, ab[1]), ab_list,
            c1=bc1, c2=bc2,
        )
        run.baseline_pairs_s = r_stream / dt
        base_gbps = 2 * r_stream * w * 4 / dt / 1e9
        run.details["baseline_streaming"] = {
            "pairs_per_s": run.baseline_pairs_s,
            "GBps": base_gbps,
            "definition": "reference-algorithm port: per-pair full-stream "
            "AND+popcount, no reuse, same device, sustained timing",
        }
        run.update()
        log(f"[baseline] streaming AND+popcount: "
            f"{run.baseline_pairs_s:,.0f} pairs/s ({base_gbps:.2f} GB/s) "
            f"on {m_bits}-bit pairs, sustained")

        for name, f, v, c1, c2 in plan[1:]:
            add_candidate(name, f, v, c1, c2)
    except _DeadlineHit:
        pass
    except BaseException:
        # a mid-plan crash must still ship the verified best-so-far (or
        # the fallback line) before the traceback reaches the driver log
        run.flush(extra_degraded=run.degraded or "exception")
        raise

    if cli.profile:
        jax.profiler.stop_trace()
        log(f"[profile] trace written to {cli.profile}")

    if run.candidates:
        for name, d in sorted(run.candidates.items(),
                              key=lambda kv: -kv[1]["pairs_per_s"]):
            log(f"[{name:>14}] {d['pairs_per_s'] / 1e9:.6f} G-pairs/s "
                f"sustained")
        best = max(run.candidates.items(),
                   key=lambda kv: kv[1]["pairs_per_s"])
        run.details["best"] = best[0]
        if "mxu" in best[0]:
            from stormtpu.utils import V5E_INT8_PEAK_OPS

            frac = best[1]["pairs_per_s"] * 2 * m_bits / V5E_INT8_PEAK_OPS
            log(f"[roofline] best kernel ≈ {frac * 100:.0f}% of v5e int8 "
                f"MXU peak")
        run.update()
    if not run.flush():
        sys.exit(1)


if __name__ == "__main__":
    main()
