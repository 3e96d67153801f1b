"""Acceptance runner smoke (scaled configs that are CPU-fast; the heavier
configs run on device via `python -m stormtpu accept`)."""

import json
import os

import pytest

from stormtpu.acceptance import CONFIGS, run_acceptance

pytestmark = pytest.mark.skipif(
    not os.environ.get("STORMTPU_SLOW_TESTS"),
    reason="acceptance configs are minutes-long on CPU; set STORMTPU_SLOW_TESTS=1",
)


def test_config1_and_5(tmp_path, capsys):
    out = tmp_path / "acc.json"
    results = run_acceptance([1, 5], log=lambda *a: None, out_path=str(out))
    assert [r["config"] for r in results] == [1, 5]
    assert all(r.get("exact") or r.get("exact_sampled") for r in results)
    assert json.loads(out.read_text())[0]["config"] == 1


def test_config3_scaled_ingest(tmp_path):
    # config3 at its scaled size exercises native ingest + dispatch + the
    # sampled pair verification
    res = CONFIGS[3](False, lambda *a: None)
    assert res["exact_sampled"] and 0.005 < res["density"] < 0.01
