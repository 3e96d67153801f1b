"""Backend probing.

Analog of the reference's one-time CPUID query (SURVEY.md §3 C1/C6): on
TPU there is no runtime ISA detection — the only probe that matters is
"are we on a real TPU (compile Pallas via Mosaic) or on CPU (run Pallas in
interpreter mode for tests)". The axon PJRT plugin canonicalizes its
platform to TPU but reports platform name "axon"; treat it as TPU.
"""

from __future__ import annotations

import jax

_TPU_PLATFORMS = ("tpu", "axon")


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
