"""End-to-end headline claim: selective hybrid mapping vs dense mapping.

Automates the reference's flagship result — 99.0% map-data-size reduction
with accuracy better than the dense baseline (README.md:60,
eval/result_plot.py:8-18) — over the analytic simulator, VERDICT round-1
item #8.
"""

import pytest

from otslam_tpu.eval.headline import headline_report

pytestmark = pytest.mark.slow


def test_headline_size_reduction_and_accuracy(tmp_path):
    rep = headline_report(str(tmp_path), frames_per_object=8, room_frames=12,
                          object_samples=20_000)
    # the flagship claim: >= 99.0% smaller than the dense map
    assert rep["size_reduction_percent"] >= rep["reference_claim_percent"]
    assert rep["dense_bytes"] > 100 * rep["hybrid_bytes"]
    m = rep["objects"]["Object_0"]
    # beats the published cardboard-box accuracy (4.15 cm,
    # eval/result_plot.py:9-10) by a wide margin
    assert m["proposal_accuracy_cm"] < 1.5
    assert m["proposal_completeness_cm"] < 1.5
    # report includes the dense-side metrics for the published-table shape
    assert "dense_accuracy_cm" in m and "dense_completeness_cm" in m
