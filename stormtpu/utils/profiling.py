"""Profiling and honest-timing infrastructure (SURVEY.md §6 tracing row).

The reference embeds TSC cycle counters in its bench harness; the TPU
analog is a ``jax.profiler`` trace (TensorBoard/XProf format: per-kernel
device timelines, HBM traffic, fusion views) plus the sustained wall-clock
harness shared by bench.py and tuning.py. ``trace()`` wraps any region;
bench exposes it as ``python bench.py --profile /tmp/trace``.

Timing methodology (one implementation, shared): this environment's relay
memoizes identical executions, returns early from ``block_until_ready``,
and adds a ~25 ms fixed cost to every dispatch. So (a) every timed rep
materializes an in-jit nonlinear checksum on a DISTINCT input, and (b)
sustained per-invocation time is the SLOPE between two in-jit scan-chain
lengths on step-perturbed inputs (x ^ s) — the fixed dispatch cost appears
in both chain timings and cancels exactly. When the marginal cost is below
relay jitter (slope ≲ 0 would fabricate absurd rates), fall back to the
latency-inclusive upper bound t(c2)/c2, which is conservative.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import numpy as np

__all__ = [
    "trace",
    "timeit_chain",
    "timeit_sustained",
    "timeit_sustained_auto",
    "timeit_chain_salted",
    "timeit_sustained_salted",
]

# Slope below this fraction of the per-invocation upper bound is treated
# as unresolved relay jitter rather than a real marginal cost.
_JITTER_FLOOR_FRAC = 0.03


def _test_dispatch_tax() -> None:
    """Test-only fault injection: STORMTPU_TEST_DISPATCH_TAX_S adds a
    host-side sleep to every timed dispatch, simulating a degraded (slow
    but alive) relay — the failure mode that cost the round-2 bench
    artifact. Consumed by the bench deadline-contract tests; a no-op
    unless the env var is set."""
    import os

    tax = os.environ.get("STORMTPU_TEST_DISPATCH_TAX_S")
    if tax:
        time.sleep(float(tax))


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Profile the wrapped region to ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def _chained(fn, chain: int):
    """One dispatch = ``chain`` invocations of ``fn`` on step-perturbed
    inputs (x ^ s, s = 1..chain — distinct matrices, so nothing can be
    CSE'd, loop-hoisted, or relay-memoized), reduced to one int32."""
    import jax.numpy as jnp

    @jax.jit
    def g(x):
        def step(carry, s):
            c = fn(x ^ s)
            leaf = jax.tree.leaves(c)[0]
            return carry + jnp.sum(leaf % jnp.int32(251)), None

        out, _ = jax.lax.scan(
            step, jnp.int32(0), jnp.arange(1, chain + 1, dtype=jnp.uint32)
        )
        return out

    return g


def timeit_chain(fn, xs, chain: int) -> float:
    """Mean wall time of one ``chain``-invocation dispatch over the
    distinct pre-staged inputs ``xs[1:]`` (``xs[0]`` warms the compile)."""
    g = _chained(fn, chain)
    np.asarray(g(xs[0]))
    _test_dispatch_tax()
    t0 = time.time()
    for x in xs[1:]:
        np.asarray(g(x))
        _test_dispatch_tax()
    return (time.time() - t0) / (len(xs) - 1)


def timeit_sustained(fn, xs, c1: int = 2, c2: int = 10) -> float:
    """Sustained per-invocation device seconds via slope timing (see
    module docstring for why, and for the jitter-floor fallback)."""
    t1 = timeit_chain(fn, xs, c1)
    t2 = timeit_chain(fn, xs, c2)
    slope = (t2 - t1) / (c2 - c1)
    if slope < _JITTER_FLOOR_FRAC * t2 / c2:
        return t2 / c2
    return slope


def timeit_sustained_auto(
    fn,
    xs,
    *,
    target_marginal_s: float = 0.05,
    c2_min: int = 8,
    c2_max: int = 1024,
    dispatch_floor_s: float = 0.025,
) -> float:
    """Slope timing with the chain length chosen from a one-dispatch
    probe so the MARGINAL chain time clears relay jitter (≥ ~50 ms —
    fixed short chains left sub-ms step costs inside the ±5 ms jitter
    and recorded rates that were artifacts of the chosen c2; BASELINE.md
    r2 streaming notes). The probe's ~25 ms relay floor is subtracted
    before estimating the per-step cost; when even ``c2_max`` steps
    cannot clear the jitter, the ``timeit_sustained`` fallback returns
    the latency-inclusive upper bound t(c2)/c2 (conservative, and less
    wrong the longer the chain)."""
    t1 = timeit_chain(fn, xs, 1)
    step_est = max(t1 - dispatch_floor_s, 1e-6)
    c2 = int(min(c2_max, max(c2_min, -(-target_marginal_s // step_est) + 2)))
    c1 = max(1, c2 // 8)
    return timeit_sustained(fn, xs, c1=c1, c2=c2)


def _chained_salted(fn_salt, chain: int):
    """Like :func:`_chained` but the step perturbation is routed by the
    CALLER — ``fn_salt(x, s)`` decides where the uint32 salt enters.

    Why it exists: ``fn(x ^ s)`` on a multi-operand stacked input is an
    elementwise producer with several slice consumers, which XLA
    MATERIALIZES — for a bandwidth-bound kernel that extra write+read
    triples the measured traffic (observed: the streaming baseline read
    226 GB/s this way vs 744 GB/s with the salt fused post-slice).
    Bandwidth-bound candidates must salt a single fusable operand, e.g.
    ``lambda ab, s: f(ab[0] ^ s, ab[1])``."""
    import jax.numpy as jnp

    @jax.jit
    def g(x):
        def step(carry, s):
            c = fn_salt(x, s)
            leaf = jax.tree.leaves(c)[0]
            return carry + jnp.sum(leaf % jnp.int32(251)), None

        out, _ = jax.lax.scan(
            step, jnp.int32(0), jnp.arange(1, chain + 1, dtype=jnp.uint32)
        )
        return out

    return g


def timeit_chain_salted(fn_salt, xs, chain: int) -> float:
    """Mean wall time of one ``chain``-invocation dispatch of
    ``fn_salt(x, s)`` over the distinct pre-staged inputs ``xs[1:]``."""
    g = _chained_salted(fn_salt, chain)
    np.asarray(g(xs[0]))
    _test_dispatch_tax()
    t0 = time.time()
    for x in xs[1:]:
        np.asarray(g(x))
        _test_dispatch_tax()
    return (time.time() - t0) / (len(xs) - 1)


def timeit_sustained_salted(fn_salt, xs, c1: int = 16, c2: int = 192) -> float:
    """Slope timing with caller-routed salt (see ``_chained_salted``) and
    long default chains: sub-ms per-step costs need a ≥50 ms marginal to
    clear the ±5 ms relay jitter (short chains mis-measured the streaming
    regime 2× in BOTH directions — BASELINE.md r2 streaming notes)."""
    t1 = timeit_chain_salted(fn_salt, xs, c1)
    t2 = timeit_chain_salted(fn_salt, xs, c2)
    slope = (t2 - t1) / (c2 - c1)
    if slope < _JITTER_FLOOR_FRAC * t2 / c2:
        return t2 / c2
    return slope
