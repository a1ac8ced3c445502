"""The BENCH_TUNED.json refresh gate: a garbage metric must never replace
the known-good record (round 4 committed 45,000,000 ICP iters/s into it,
poisoning every later cached-fallback bench line — VERDICT r4 #2)."""

import importlib.util
import json
import os
import sys

import pytest

_BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")
spec = importlib.util.spec_from_file_location("bench_mod", _BENCH)
bench = importlib.util.module_from_spec(spec)
sys.modules.setdefault("bench_mod", bench)
spec.loader.exec_module(bench)

GOOD_OLD = {
    "value": 1886.6, "icp_iterations_per_sec": 690.1,
    "perception_ticks_per_sec": 1095.8, "mesh_extracts_per_sec": 61.7,
    "mesh_block_extracts_per_sec": 106.3, "mesh_batch_extracts_per_sec": 68.6,
}


def fresh(**over):
    rec = {
        "value": 1850.0, "icp_iterations_per_sec": 650.0,
        "perception_ticks_per_sec": 1100.0, "mesh_extracts_per_sec": 60.0,
        "mesh_block_extracts_per_sec": 100.0,
        "mesh_batch_extracts_per_sec": 65.0,
    }
    rec.update(over)
    return rec


def test_healthy_record_accepted():
    ok, reason = bench.record_plausible(fresh(), GOOD_OLD)
    assert ok, reason


def test_round4_45m_garbage_rejected():
    ok, reason = bench.record_plausible(
        fresh(icp_iterations_per_sec=45_000_000.0), GOOD_OLD)
    assert not ok and "ceiling" in reason


def test_sharp_regression_rejected_without_force():
    ok, reason = bench.record_plausible(fresh(value=200.0), GOOD_OLD)
    assert not ok and "known-good" in reason
    ok, _ = bench.record_plausible(fresh(value=200.0), GOOD_OLD, force=True)
    assert ok


def test_missing_or_nonfinite_metric_rejected():
    bad = fresh()
    del bad["mesh_extracts_per_sec"]
    assert not bench.record_plausible(bad, GOOD_OLD)[0]
    for v in (float("nan"), float("inf"), 0.0, -5.0, "fast"):
        assert not bench.record_plausible(fresh(value=v), GOOD_OLD)[0]


def test_no_old_record_still_applies_ceilings():
    ok, _ = bench.record_plausible(fresh(), None)
    assert ok
    ok, reason = bench.record_plausible(
        fresh(perception_ticks_per_sec=1e9), None)
    assert not ok and "ceiling" in reason


def test_maybe_refresh_leaves_file_untouched_on_garbage(tmp_path,
                                                        monkeypatch):
    monkeypatch.delenv("OTSLAM_BENCH_FORCE_TUNED", raising=False)
    path = tmp_path / "tuned.json"
    path.write_text(json.dumps(GOOD_OLD))
    written, reason = bench.maybe_refresh_tuned(
        fresh(icp_iterations_per_sec=45_000_000.0), path=str(path))
    assert not written
    assert json.loads(path.read_text()) == GOOD_OLD

    written, _ = bench.maybe_refresh_tuned(fresh(), path=str(path))
    assert written
    assert json.loads(path.read_text())["value"] == 1850.0


def test_force_env_overrides_floor_but_not_ceiling(tmp_path, monkeypatch):
    monkeypatch.setenv("OTSLAM_BENCH_FORCE_TUNED", "1")
    path = tmp_path / "tuned.json"
    path.write_text(json.dumps(GOOD_OLD))
    written, _ = bench.maybe_refresh_tuned(fresh(value=200.0),
                                           path=str(path))
    assert written                       # investigated regression: allowed
    written, reason = bench.maybe_refresh_tuned(
        fresh(icp_iterations_per_sec=45_000_000.0), path=str(path))
    assert not written and "ceiling" in reason  # garbage: never


def test_history_append(tmp_path):
    path = tmp_path / "hist.jsonl"
    bench._append_history({"value": 1}, path=str(path))
    bench._append_history({"value": 2}, path=str(path))
    lines = path.read_text().strip().splitlines()
    assert [json.loads(ln)["value"] for ln in lines] == [1, 2]


def test_committed_record_is_currently_plausible():
    """The repo's committed known-good record must itself pass the gate —
    this is what un-poisons round 4's 45M entry and keeps it out."""
    with open(bench.TUNED_PATH) as f:
        rec = json.load(f)
    ok, reason = bench.record_plausible(rec, None)
    assert ok, f"committed BENCH_TUNED.json is implausible: {reason}"
    assert rec["icp_iterations_per_sec"] < 1e6


@pytest.mark.slow
def test_bench_icp_cpu_path_smoke():
    """bench_icp.measure() on the CPU backend returns a bounded, finite
    value (exercises the new estimator wiring end to end)."""
    import bench_icp

    out = bench_icp.measure()
    v = out["value"]
    assert 0 < v < 1e6 and v == v
    assert out["icp_config"]["rep_spread_s"]
