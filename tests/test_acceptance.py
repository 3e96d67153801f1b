"""Acceptance runner smoke (scaled configs that are CPU-fast; the heavier
configs run on device via `python -m stormtpu accept`)."""

import json
import os

import pytest

from stormtpu.acceptance import CONFIGS, run_acceptance

_SLOW = pytest.mark.skipif(
    not os.environ.get("STORMTPU_SLOW_TESTS"),
    reason="acceptance configs are minutes-long on CPU; set STORMTPU_SLOW_TESTS=1",
)


@_SLOW
def test_config1_and_5(tmp_path, capsys):
    out = tmp_path / "acc.json"
    results = run_acceptance([1, 5], log=lambda *a: None, out_path=str(out))
    assert [r["config"] for r in results] == [1, 5]
    assert all(r.get("exact") or r.get("exact_sampled") for r in results)
    assert json.loads(out.read_text())[0]["config"] == 1


@_SLOW
def test_config3_scaled_ingest(tmp_path):
    # config3 at its scaled size exercises native ingest + dispatch + the
    # sampled pair verification
    res = CONFIGS[3](False, lambda *a: None)
    assert res["exact_sampled"] and 0.005 < res["density"] < 0.01


def test_run_acceptance_merges_partial_runs(tmp_path, monkeypatch):
    """A --config N refresh must preserve the other configs' entries in
    the artifact (VERDICT r3 missing #1: the r3 config-3 refresh
    overwrote the r1 full-size record)."""
    import json

    import stormtpu.acceptance as acc

    out = tmp_path / "acceptance.json"
    out.write_text(json.dumps([
        {"config": 2, "keep": "me"},
        {"config": 4, "full_stream": {"full": True}},
    ]))
    monkeypatch.setattr(acc, "CONFIGS", {3: lambda full, log: {"config": 3,
                                                               "fresh": 1}})
    monkeypatch.setattr(acc, "_relay_health", lambda: {"dispatch_floor_ms": 0})
    ran = acc.run_acceptance([3], log=lambda *a: None, out_path=str(out))
    assert ran[0]["config"] == 3
    got = {e["config"]: e for e in json.loads(out.read_text())}
    assert set(got) == {2, 3, 4}
    assert got[2]["keep"] == "me" and got[4]["full_stream"]["full"] is True
    assert got[3]["fresh"] == 1
