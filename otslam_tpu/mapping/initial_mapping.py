"""Initial-mapping perception: cluster + classify raw scans (no prior map).

Equivalent of the lidar_cluster_publisher pipeline (SURVEY.md §3.5,
lidar_cluster_publisher.cpp:151-291): the first mapping session has no saved
map, so objects are found by classifying raw scan clusters into
WALL / OBJECT / UNKNOWN via bbox length and PCA linearity; the OBJECT points
(in the map frame) feed the same tracker as the change-detection pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from otslam_tpu.config import ClusterConfig, LidarConfig
from otslam_tpu.kernels.cluster import (
    OBJECT, UNKNOWN, WALL, analyze_clusters, cluster_scan_points,
    scan_to_points)


class LidarClusterClassifier:
    """Per-scan classification: returns map-frame point sets per class."""

    def __init__(self, cfg: ClusterConfig | None = None,
                 lidar: LidarConfig | None = None):
        self.cfg = cfg or ClusterConfig()
        self.lidar = lidar or LidarConfig()

    def classify(self, ranges: jnp.ndarray, angles: jnp.ndarray, robot_pose):
        """One scan -> dict with 'wall' / 'object' / 'unknown' (K, 2) arrays
        of map-frame points (classified in the sensor frame, transformed
        after — same order as the reference node)."""
        cfg = self.cfg
        pts, valid = scan_to_points(ranges, angles, self.lidar.range_max,
                                    cfg.max_range_ratio)
        labels, _ = cluster_scan_points(pts, valid, cfg.gap_threshold,
                                        cfg.max_clusters)
        stats = analyze_clusters(pts, labels, cfg)

        lbl = np.asarray(labels)
        cls_per_cluster = np.asarray(stats.classes)
        point_cls = np.full(lbl.shape, -1)
        in_range = lbl < cfg.max_clusters
        point_cls[in_range] = cls_per_cluster[lbl[in_range]]

        p = np.asarray(pts)
        x0, y0, yaw = robot_pose
        c, s = np.cos(yaw), np.sin(yaw)
        wx = x0 + p[:, 0] * c - p[:, 1] * s
        wy = y0 + p[:, 0] * s + p[:, 1] * c
        world = np.stack([wx, wy], -1).astype(np.float32)
        vm = np.asarray(valid)
        return {
            "wall": world[vm & (point_cls == WALL)],
            "object": world[vm & (point_cls == OBJECT)],
            "unknown": world[vm & (point_cls == UNKNOWN)],
            "stats": stats,
        }
