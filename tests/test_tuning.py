"""Tuning cache: tune() writes a cache, dispatch honors measured winner,
mismatched device invalidates."""

import json

import numpy as np
import pytest

from stormtpu import tuning
from stormtpu.dispatch import choose_strategy


@pytest.fixture
def cache(tmp_path, monkeypatch):
    path = tmp_path / "tuning.json"
    monkeypatch.setenv(tuning.CACHE_ENV, str(path))
    return path


def test_tune_writes_cache_and_dispatch_uses_it(cache):
    logs = []
    result = tuning.tune(n=32, m_bits=1024, reps=1, log=logs.append)
    assert cache.exists()
    assert set(result["dense_pairs_per_s"]) == {
        "popcount", "mxu", "pallas_dense", "pallas_mxu"
    }
    winner = tuning.measured_dense_winner()
    assert winner in result["dense_pairs_per_s"]
    # dense dispatch at moderate M follows the measured winner
    assert choose_strategy(1000, 65536, 0.5) == winner


def test_dispatch_guards_mxu_memory_blowup(cache):
    import jax

    # force a cache that says "mxu" wins, then ask for a huge-M shape:
    # dispatch must reroute to the in-kernel-unpack pallas form.
    cache.write_text(json.dumps({
        "device": str(jax.devices()[0]),
        "dense_pairs_per_s": {"mxu": 100.0, "popcount": 1.0},
    }))
    assert choose_strategy(100_000, 1_000_000, 0.5) == "pallas_mxu"
    assert choose_strategy(1000, 65536, 0.5) == "mxu"


def test_stale_device_cache_ignored(cache):
    cache.write_text(json.dumps({
        "device": "TPU v9 imaginary",
        "dense_pairs_per_s": {"popcount": 100.0},
    }))
    assert tuning.measured_dense_winner() is None


def test_corrupt_cache_ignored(cache):
    cache.write_text("{not json")
    assert tuning.load_tuning() is None
    assert tuning.measured_dense_winner() is None
