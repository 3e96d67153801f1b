"""Test harness config.

Tests run on CPU with 8 forced host devices (SURVEY.md §5 item 4): the
axon TPU emulator's compile latency is minutes per kernel, and the
multi-device sharding tests need >1 device. Kernel exactness is still
checked against the NumPy oracle, which is backend-independent; a separate
opt-in marker (`tpu`) exists for on-device runs.
"""

import os

# NOTE: this environment's sitecustomize registers the axon TPU PJRT plugin
# at interpreter startup and force-sets jax_platforms="axon,cpu" via
# jax.config — an env-var JAX_PLATFORMS=cpu is silently overridden. Undo it
# here (backends are not initialized yet at conftest time) so tests run on
# the fast local CPU backend with 8 forced devices.
# STORMTPU_TPU_TESTS=1 leaves the real backend in place (for
# tests/test_tpu_device.py — target that module specifically, the rest of
# the suite is CPU-shaped and would be minutes-per-test on the tunnel).
if not os.environ.get("STORMTPU_TPU_TESTS"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():  # pragma: no cover - defensive
        from jax.extend.backend import clear_backends

        clear_backends()
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


DENSITY_SWEEP = (0.0001, 0.01, 0.1, 0.5, 0.99, 1.0)


def random_bitmatrix(n, m_bits, density, seed=0):
    """Random packed test input at a target density (reference bench
    harness style, SURVEY.md §4.5)."""
    from stormtpu.layout import BitMatrix

    rng = np.random.default_rng(seed)
    dense = (rng.random((n, m_bits)) < density).astype(np.uint8)
    return BitMatrix.from_dense(dense)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
