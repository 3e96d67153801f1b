"""Bench driver contract: stdout carries EXACTLY ONE JSON line no matter
how the process ends (VERDICT r2 weak #1 — the round-2 artifact was lost
to rc=124 with zero JSON lines when a slow-alive relay outlasted the
driver's timeout).

The degraded relay is simulated with STORMTPU_TEST_DISPATCH_TAX_S (a
host-side sleep added to every timed dispatch by the shared profiling
harness) so each scenario exercises the real code path: the latency probe
measures the inflated floor, bench switches to the reduced relay-slow
plan, and either the internal deadline watchdog or an external SIGTERM
must flush a verified best-so-far line.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _bench_env(**extra):
    # exclude the axon sitecustomize dir so JAX_PLATFORMS=cpu sticks in
    # the subprocess (CLAUDE.md: the plugin otherwise force-registers)
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["STORMTPU_BENCH_BACKEND_TIMEOUT_S"] = "0"
    env.update(extra)
    return env


def _parse_single_json_line(stdout: str) -> dict:
    lines = [ln for ln in stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line, got: {lines!r}"
    return json.loads(lines[0])


@pytest.mark.heavy
def test_smoke_emits_one_json_line(tmp_path):
    p = subprocess.run(
        [sys.executable, BENCH, "--smoke"], env=_bench_env(),
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
    )
    assert p.returncode == 0, p.stderr[-2000:]
    out = _parse_single_json_line(p.stdout)
    assert out["unit"] == "G-pairs/s"
    assert out["value"] > 0
    assert out["verified_exact"] is True
    assert "degraded" not in out


@pytest.mark.heavy
def test_deadline_flushes_best_so_far_under_slow_relay(tmp_path):
    # 1 s per dispatch + a 30 s budget: the plan cannot finish; the
    # watchdog must flush a verified best-so-far line well before the
    # 120 s hard kill, carrying both degraded markers' lineage
    t0 = time.monotonic()
    p = subprocess.run(
        [sys.executable, BENCH, "--smoke"],
        env=_bench_env(
            STORMTPU_TEST_DISPATCH_TAX_S="1.0",
            STORMTPU_BENCH_DEADLINE_S="30",
        ),
        capture_output=True, text=True, timeout=120, cwd=str(tmp_path),
    )
    elapsed = time.monotonic() - t0
    out = _parse_single_json_line(p.stdout)
    assert out["unit"] == "G-pairs/s"
    # the inflated floor must have flipped the reduced plan on
    assert "[degraded]" in p.stderr or out.get("degraded")
    assert out.get("degraded") in ("relay-slow", "deadline")
    if out["value"] > 0:
        assert out["verified_exact"] is True
        assert p.returncode == 0, p.stderr[-2000:]
    assert elapsed < 110, "watchdog did not fire near the deadline"


@pytest.mark.heavy
def test_sigterm_flushes_best_so_far(tmp_path):
    # the driver's `timeout` sends SIGTERM before SIGKILL: bench must
    # trap it and flush (a long internal deadline guarantees the TERM
    # arrives first)
    p = subprocess.Popen(
        [sys.executable, BENCH, "--smoke"],
        env=_bench_env(
            STORMTPU_TEST_DISPATCH_TAX_S="0.5",
            STORMTPU_BENCH_DEADLINE_S="600",
        ),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=str(tmp_path),
    )
    time.sleep(20)  # enough for import + probe + first stages
    p.send_signal(signal.SIGTERM)
    try:
        stdout, stderr = p.communicate(timeout=60)
    except subprocess.TimeoutExpired:
        p.kill()
        pytest.fail("bench did not exit after SIGTERM")
    out = _parse_single_json_line(stdout)
    assert out["unit"] == "G-pairs/s"
    assert "degraded" in out
