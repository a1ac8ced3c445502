"""Docs <-> artifact consistency (VERDICT r4 #4): the performance numbers
README.md and PARITY.md attribute to BENCH_TUNED.json must match what that
artifact currently says. Round 4 refreshed the record without updating the
docs (and with garbage); this test makes the fast suite fail on any future
divergence — update both together."""

import json
import os
import re

import pytest

_ROOT = os.path.join(os.path.dirname(__file__), os.pardir)


def _read(name):
    with open(os.path.join(_ROOT, name)) as f:
        return f.read()


@pytest.fixture(scope="module")
def record():
    with open(os.path.join(_ROOT, "BENCH_TUNED.json")) as f:
        return json.load(f)


def _one(pattern, text, doc):
    m = re.findall(pattern, text)
    assert len(m) == 1, (f"{doc}: expected exactly one match for "
                         f"{pattern!r}, got {m}")
    return float(m[0])


def _close(quoted, actual, what, rel=0.02):
    assert actual == pytest.approx(quoted, rel=rel), (
        f"{what}: doc quotes {quoted} but BENCH_TUNED.json says {actual} "
        f"— update the doc and the artifact together")


def test_readme_matches_record(record):
    txt = _read("README.md")
    _close(_one(r"\*\*([\d.]+) VGA frames fused/s/chip\*\*", txt, "README"),
           record["value"], "README fusion f/s")
    _close(_one(r"\*\*([\d.]+) ICP iterations/s at", txt, "README"),
           record["icp_iterations_per_sec"], "README ICP iters/s")
    _close(_one(r"full-scan mode ([\d.]+)\)", txt, "README"),
           record["icp_config"]["full_scan"], "README ICP full-scan")
    _close(_one(r"~([\d.]+) block-sparse 256", txt, "README"),
           record["mesh_block_extracts_per_sec"], "README mesh block/s")
    _close(_one(r"\(([\d.]+) dense-grid\)", txt, "README"),
           record["mesh_extracts_per_sec"], "README mesh dense/s")


def test_parity_matches_record(record):
    txt = _read("PARITY.md")
    _close(_one(r"\*\*([\d.]+) VGA frames/s/chip\*\*", txt, "PARITY"),
           record["value"], "PARITY fusion f/s")
    _close(_one(r"\*\*([\d.]+) iters/s at 50k", txt, "PARITY"),
           record["icp_iterations_per_sec"], "PARITY ICP iters/s")
    _close(_one(r"full-scan mode ([\d.]+);", txt, "PARITY"),
           record["icp_config"]["full_scan"], "PARITY ICP full-scan")
    _close(_one(r"\*\*([\d.]+) block-sparse\*\*", txt, "PARITY"),
           record["mesh_block_extracts_per_sec"], "PARITY mesh block/s")
    _close(_one(r"([\d.]+) dense-grid extractions/s", txt, "PARITY"),
           record["mesh_extracts_per_sec"], "PARITY mesh dense/s")
    _close(_one(r"([\d.]+)/volume batched", txt, "PARITY"),
           record["mesh_batch_extracts_per_sec"], "PARITY mesh batched/s")


def test_record_is_internally_consistent(record):
    assert record["vs_baseline"] == pytest.approx(record["value"] / 500.0,
                                                  rel=0.01)
    cfg = record["icp_config"]
    best = max(v for v in (cfg.get("windowed"), cfg.get("full_scan"))
               if isinstance(v, (int, float)))
    assert record["icp_iterations_per_sec"] == pytest.approx(best, rel=0.01)
