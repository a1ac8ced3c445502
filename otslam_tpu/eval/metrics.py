"""Map-quality evaluation protocol.

Mirrors the eval scripts (eval_table_chair.py:90-119): accuracy = mean NN
distance map->GT in cm, completeness = mean NN distance GT->map in cm, with
an optional point-to-point ICP snap of the GT onto the map (threshold 0.05,
identity init) before measuring.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from otslam_tpu.config import EvalConfig
from otslam_tpu.kernels.icp import icp_point_to_point
from otslam_tpu.kernels.nn import auto_nn_window, chamfer_metrics


@dataclass
class EvalMetrics:
    accuracy_cm: float       # mean(dist map->GT) * 100
    completeness_cm: float   # mean(dist GT->map) * 100
    icp_fitness: float = 1.0
    icp_rmse: float = 0.0


def evaluate_map(map_points: np.ndarray, gt_points: np.ndarray,
                 use_icp: bool = False, cfg: EvalConfig | None = None
                 ) -> EvalMetrics:
    cfg = cfg or EvalConfig()
    m = jnp.asarray(np.asarray(map_points, np.float32))
    g = jnp.asarray(np.asarray(gt_points, np.float32))
    fitness, rmse = 1.0, 0.0
    if use_icp:
        # align GT onto the map (refine_alignment_icp semantics); windowed
        # NN sized host-side — exact for inliers, fit-flag fallback else
        window, axis = auto_nn_window(gt_points, map_points,
                                      cfg.icp_threshold)
        res = icp_point_to_point(g, m, threshold=cfg.icp_threshold,
                                 max_iterations=min(cfg.icp_max_iterations, 50),
                                 chunk=cfg.chamfer_tile,
                                 nn_window=window, nn_axis=axis)
        T = res.transformation
        g = g @ T[:3, :3].T + T[:3, 3]
        fitness, rmse = float(res.fitness), float(res.inlier_rmse)
    acc, comp = chamfer_metrics(m, g, chunk=cfg.chamfer_tile)
    return EvalMetrics(float(acc) * 100.0, float(comp) * 100.0, fitness, rmse)
