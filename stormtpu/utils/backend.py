"""Backend probing.

Analog of the reference's one-time CPUID query (SURVEY.md §3 C1/C6): on
TPU there is no runtime ISA detection — the only probe that matters is
"are we on a real TPU (compile Pallas via Mosaic) or on CPU (run Pallas in
interpreter mode for tests)". The axon PJRT plugin canonicalizes its
platform to TPU but reports platform name "axon"; treat it as TPU.
"""

from __future__ import annotations

import os

import jax

_TPU_PLATFORMS = ("tpu", "axon")


def enable_compilation_cache() -> None:
    """Point JAX's persistent compilation cache at a stormtpu cache dir.

    Cold-start mitigation (VERDICT r2 #4): the axon relay's remote
    compiler costs 20–60 s per new executable (minutes when cold), so a
    fresh process's first tiny ``pair_count`` burned ~8 min in round-2's
    acceptance config 1. Measured on the axon backend (2026-08-18): the
    persistent cache DOES work through the relay plugin — a 79 s
    first-process compile+run became 2.3 s in a fresh process. Every
    ``stormtpu`` import enables it (before any compile happens);
    opt out with ``STORMTPU_COMPILATION_CACHE=0``, redirect with
    ``STORMTPU_COMPILATION_CACHE=<dir>``. A user-set
    ``JAX_COMPILATION_CACHE_DIR`` (or prior ``jax.config`` value) wins.
    """
    knob = os.environ.get("STORMTPU_COMPILATION_CACHE", "")
    if knob == "0":
        return
    try:
        if jax.config.jax_compilation_cache_dir:
            return  # user already configured one
        cache_dir = knob or os.path.join(
            os.path.expanduser("~"), ".cache", "stormtpu", "xla_cache"
        )
        _seed_compilation_cache(cache_dir)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:  # pragma: no cover - never block import on this
        pass


def _seed_compilation_cache(cache_dir: str) -> None:
    """One-time unpack of the repo-shipped compile-cache seed into an
    EMPTY/missing cache dir. The build machine is reimaged between
    rounds (r4: ~/.cache vanished wholesale), so every round re-paid the
    remote compiler's cold pathology (first executable 6–20 min);
    ``scripts/tpu_return.sh`` tars the warm cache into
    ``stormtpu/data/xla_cache_seed.tar.gz`` at round end and this
    restores it at first import. Stale entries (new jax version, other
    platform) simply miss — the cache key covers them."""
    import tarfile

    if os.path.isdir(cache_dir) and os.listdir(cache_dir):
        return  # live cache already populated: never overwrite
    seed = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "xla_cache_seed.tar.gz",
    )
    if not os.path.exists(seed):
        return
    parent = os.path.dirname(cache_dir) or "."
    os.makedirs(parent, exist_ok=True)
    with tarfile.open(seed) as tf:
        members = tf.getmembers()
        base = "xla_cache"
        for m in members:
            n = m.name
            # explicit member validation (not just filter='data', which
            # pre-3.12 tarfile lacks): every entry must live under
            # xla_cache/ with no traversal components, and be a plain
            # file or directory — symlinks/devices/hardlinks refused
            parts = n.split("/")
            if not (n == base or n.startswith(base + "/")):
                return  # unexpected layout: refuse rather than scatter
            if n.startswith("/") or ".." in parts or not (
                m.isreg() or m.isdir()
            ):
                return
        try:
            tf.extractall(parent, members=members, filter="data")
        except TypeError:  # pragma: no cover - pre-3.12 tarfile
            tf.extractall(parent, members=members)
    if os.path.basename(cache_dir) != "xla_cache":
        os.replace(os.path.join(parent, "xla_cache"), cache_dir)


def is_tpu_backend() -> bool:
    try:
        dev = jax.devices()[0]
    except RuntimeError:  # pragma: no cover
        return False
    return dev.platform.lower() in _TPU_PLATFORMS or "tpu" in str(dev).lower()


def pallas_interpret_default() -> bool:
    """Pallas kernels compile via Mosaic on TPU; anywhere else (CPU test
    backend) they run in interpreter mode — same semantics, slower."""
    return not is_tpu_backend()


# v5e nominal int8 MXU peak (ops/s) — the roofline denominator used by
# bench.py and acceptance._config4_spec_rate.
V5E_INT8_PEAK_OPS = 394e12
