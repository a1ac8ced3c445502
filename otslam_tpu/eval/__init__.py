from otslam_tpu.eval.metrics import evaluate_map, EvalMetrics  # noqa: F401
from otslam_tpu.eval.scenarios import (  # noqa: F401
    sample_scene_surface,
    sample_object_surfaces,
    scenario_gt,
)
from otslam_tpu.eval.report import print_summary_table, plot_results  # noqa: F401
from otslam_tpu.eval.headline import headline_report  # noqa: F401
