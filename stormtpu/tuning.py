"""On-device kernel tuning — measured dispatch crossovers.

The reference's dispatch constants (SURVEY.md §3 C6/C7: ISA ladder, the
Roaring-style container threshold) encode *measured* crossovers for x86.
The TPU analog: probe every exact kernel path on the live device at a
representative shape, record pairs/s in a cache file, and let D1 dispatch
prefer the measured winner. Tuning is explicit (``python -m stormtpu
tune``) because first-compiles are expensive; without a cache, dispatch
falls back to its static heuristics.

Timing methodology matches bench.py: warmup compile, then sustained slope
timing over in-jit chains of perturbed inputs (this environment's relay
memoizes identical executions, returns early from block_until_ready, and
adds a ~25 ms fixed cost per dispatch — the slope cancels the fixed cost).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

CACHE_ENV = "STORMTPU_TUNING_CACHE"
_DEFAULT_CACHE = os.path.join(
    os.path.expanduser("~"), ".cache", "stormtpu", "tuning.json"
)

_DENSE_PATHS = ("popcount", "mxu", "pallas_dense", "pallas_mxu")


def cache_path() -> str:
    return os.environ.get(CACHE_ENV, _DEFAULT_CACHE)


def load_tuning() -> Optional[dict]:
    try:
        with open(cache_path()) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def tuned_variant(kernel: str, default: str) -> str:
    """Best measured Pallas kernel variant ("k1" or "k2") on this device,
    or ``default`` when untuned."""
    import jax

    t = load_tuning()
    if not t or t.get("device") != str(jax.devices()[0]):
        return default
    return t.get(f"best_{kernel}_variant", default)


def measured_dense_winner() -> Optional[str]:
    """Best dense all-pairs strategy from the cache, if tuned on this
    backend; None otherwise."""
    import jax

    t = load_tuning()
    if not t:
        return None
    if t.get("device") != str(jax.devices()[0]):
        return None
    rates = t.get("dense_pairs_per_s", {})
    if not rates:
        return None
    return max(rates, key=rates.get)


def _timeit(f, xs, c1: int = 2, c2: int = 20) -> float:
    """Sustained per-invocation device time (shared slope-timing
    implementation: stormtpu.utils.profiling.timeit_sustained)."""
    from stormtpu.utils.profiling import timeit_sustained

    return timeit_sustained(f, xs, c1=c1, c2=c2)


def tune(n: int = 4096, m_bits: int = 65536, reps: int = 3, log=print) -> dict:
    """Measure all dense paths (and Pallas kernel variants) at shape
    (n, m_bits); verify each against the oracle; write the cache."""
    import jax
    import jax.numpy as jnp

    from stormtpu.kernels import xla as kx
    from stormtpu.kernels.dense import count_tiles_pallas_dense
    from stormtpu.kernels.mxu import count_tiles_pallas_mxu
    from stormtpu.oracle import oracle_count_block
    from stormtpu.utils import (
        pallas_interpret_default,
        round_up,
        triangular_tile_ids,
    )

    interpret = pallas_interpret_default()
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

    # All candidates are timed identically: device output + host checksum
    # only (full-matrix D2H would swamp kernel time on tunneled devices and
    # is the same cost for every path anyway).
    def check_block(c_np, name, nc):
        want = oracle_count_block(packed[:nc], packed[:nc])
        if not np.array_equal(np.asarray(c_np)[:nc, :nc], want):
            raise AssertionError(f"tuning candidate {name} is INEXACT")

    check_block(kx.count_block_popcount_xla(xd, xd, tile_rows=8), "popcount",
                min(n, 128))
    rates["popcount"] = tri / _timeit(
        lambda x: kx.count_block_popcount_xla(x, x, tile_rows=8), xds
    )
    log(f"popcount: {rates['popcount']:,.0f} pairs/s")

    check_block(kx.count_block_int8_xla(xd, xd), "mxu", min(n, 128))
    rates["mxu"] = tri / _timeit(lambda x: kx.count_block_int8_xla(x, x), xds)
    log(f"mxu: {rates['mxu']:,.0f} pairs/s")

    def pallas_candidate(count_tiles, ti_cap, wk_cap, variant):
        ti = min(ti_cap, round_up(max(n, 8), 8))
        wk = round_up(max(w, 128), 128) if w <= wk_cap else round_up(wk_cap, 128)
        n_pad, w_pad = round_up(n, ti), round_up(w, wk)
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
        return tri / _timeit(f, xps)

    from stormtpu.config import default_config

    cfg = default_config()
    # probe at the SHIPPED tile defaults so cached rates describe the
    # kernels production dispatch actually runs
    for variant in ("rows", "chunk"):
        variants[f"pallas_dense/{variant}"] = pallas_candidate(
            count_tiles_pallas_dense, cfg.k1_tile_rows, cfg.k1_tile_words,
            variant,
        )
        log(f"pallas_dense/{variant}: "
            f"{variants[f'pallas_dense/{variant}']:,.0f} pairs/s")
    rates["pallas_dense"] = max(
        v for k, v in variants.items() if k.startswith("pallas_dense")
    )

    for variant in ("concat", "planes"):
        variants[f"pallas_mxu/{variant}"] = pallas_candidate(
            count_tiles_pallas_mxu, cfg.k2_tile_rows, cfg.k2_tile_words,
            variant,
        )
        log(f"pallas_mxu/{variant}: "
            f"{variants[f'pallas_mxu/{variant}']:,.0f} pairs/s")
    rates["pallas_mxu"] = max(
        v for k, v in variants.items() if k.startswith("pallas_mxu")
    )

    result = {
        "device": str(jax.devices()[0]),
        "shape": {"n": n, "m_bits": m_bits},
        "dense_pairs_per_s": rates,
        "variant_pairs_per_s": variants,
        "best_k1_variant": max(
            (k for k in variants if k.startswith("pallas_dense")),
            key=variants.get,
        ).split("/")[1],
        "best_k2_variant": max(
            (k for k in variants if k.startswith("pallas_mxu")),
            key=variants.get,
        ).split("/")[1],
    }
    path = cache_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    log(f"wrote {path}")
    return result
