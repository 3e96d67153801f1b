"""Scaling-efficiency measurement for the distributed ring driver.

BASELINE.json:5 sets the scaling target ("≥80% efficiency at 2+ hosts;
measured at 1 chip / 1 host / N≥2 hosts"). This harness produces that
measurement on whatever mesh is available: run it on a pod slice and the
numbers are real ICI/DCN scaling; run it in this environment (one tunneled
chip / forced CPU host devices) and the numbers validate the *structure*
(work division, collective schedule, exactness) while wall-clock
efficiency is labeled meaningless — forced host devices share the same
cores, so perfect scaling shows up as ~flat wall-clock, not ~linear.

Method: for each device count R, row-shard an identical N×W problem over
the first R devices and time the jitted ring all-pairs (warm, per-dispatch
with host materialization of a checksum — the relay memoizes identical
executions, so each rep perturbs the input). Efficiency(R) =
T(1) / (R · T(R)).
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import numpy as np

__all__ = ["measure_scaling"]


def measure_scaling(
    n: int = 2048,
    m_bits: int = 65536,
    device_counts: Optional[Sequence[int]] = None,
    reps: int = 2,
    verify: bool = True,
    log=print,
) -> dict:
    """Time the ring all-pairs driver at each device count; return
    {"results": {R: {"seconds", "pairs_per_s", "efficiency"}}, ...}."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stormtpu.kernels import count_block_auto
    from stormtpu.parallel.allpairs import ring_count_rows
    from stormtpu.parallel.mesh import make_row_mesh
    from stormtpu.utils import round_up

    devs = jax.devices()
    if device_counts is None:
        device_counts = [r for r in (1, 2, 4, 8, 16, 32) if r <= len(devs)]
    rng = np.random.default_rng(7)
    w = m_bits // 32
    packed = rng.integers(0, 2**32, (n, w), dtype=np.uint32)
    ns = min(n, 32)
    if verify:
        sample = np.bitwise_count(
            packed[:ns, None, :] & packed[None, :ns, :]
        ).sum(axis=2, dtype=np.int64)

    results: dict[int, dict] = {}
    base = None  # (R0, T(R0)) — efficiency is relative to the FIRST count
    for r in device_counts:
        mesh = make_row_mesh(r)
        axis = mesh.axis_names[0]
        n_pad = round_up(max(n, r), r * 8)
        xp = np.zeros((n_pad, w), dtype=np.uint32)
        xp[:n] = packed
        n_loc = n_pad // r
        fn = jax.jit(ring_count_rows(mesh, axis, n_loc, count_block_auto))
        sharding = NamedSharding(mesh, P(axis, None))

        xs = [jax.device_put(xp, sharding)]
        for k in range(reps):
            xq = xp.copy()
            xq[0, 0] ^= np.uint32(k + 1)  # distinct executions per rep
            xs.append(jax.device_put(xq, sharding))

        c0 = fn(xs[0])
        if verify:
            got = np.asarray(c0[:ns, :ns]).astype(np.int64)
            if not np.array_equal(got, sample):
                raise AssertionError(f"ring driver inexact at R={r}")
        # timed reps: materialize a reduced checksum per rep
        chk = jax.jit(lambda x: jnp.sum(fn(x) % jnp.int32(251)))
        np.asarray(chk(xs[0]))
        t0 = time.time()
        for x in xs[1:]:
            np.asarray(chk(x))
        dt = (time.time() - t0) / reps
        if base is None:
            base = (r, dt)
        # Efficiency(R) = (R0·T(R0)) / (R·T(R)) — device-seconds relative
        # to the first measured count (== T(1)/(R·T(R)) when R0 = 1)
        eff = (base[0] * base[1]) / (r * dt)
        pairs = float(n) * n
        results[r] = {
            "seconds": dt,
            "pairs_per_s": pairs / dt,
            "efficiency": eff,
        }
        log(f"[scaling] R={r:3d}: {dt * 1e3:9.1f} ms  "
            f"{pairs / dt / 1e6:9.1f} M-pairs/s  efficiency {eff:.2f}")

    return {
        "n": n,
        "m_bits": m_bits,
        "platform": jax.default_backend(),
        "note": (
            "forced host devices share cores — structural validation only"
            if jax.default_backend() == "cpu"
            else "real devices"
        ),
        "results": results,
    }
