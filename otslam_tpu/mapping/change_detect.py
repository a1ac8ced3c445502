"""Scan-diff change detection with temporal evidence grids.

Equivalent of the diff_node (diff_node.cpp:25-242): compares each real scan
against the latest virtual scan, accumulates NEW/REMOVED evidence in two
dwell/decay grids, and emits confident cell centers as the added/removed
object clouds.

The whole per-scan update (windowed diff + map-frame transform + two grid
updates) is one jitted device step; the class only carries the dwell grids
and the last-update wall clock (like the node's members).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from otslam_tpu.config import ChangeDetectConfig, LidarConfig
from otslam_tpu.kernels.scan_diff import scan_diff
from otslam_tpu.kernels.evidence import (
    scatter_hits, update_evidence, evidence_points)


@partial(jax.jit, static_argnames=("cfg", "range_max"))
def _step(new_grid: jnp.ndarray, gone_grid: jnp.ndarray,
          real: jnp.ndarray, virt: jnp.ndarray, angles: jnp.ndarray,
          robot_pose: jnp.ndarray, dt: jnp.ndarray,
          cfg: ChangeDetectConfig, range_max: float):
    new_mask, removed_mask = scan_diff(
        real, virt, angles, range_max,
        cfg.distance_threshold, cfg.search_window)

    # sensor frame -> map frame via planar pose (diff_node.cpp:223-234)
    x0, y0, yaw = robot_pose[0], robot_pose[1], robot_pose[2]
    c, s = jnp.cos(yaw), jnp.sin(yaw)

    def to_map(r):
        lx = r * jnp.cos(angles)
        ly = r * jnp.sin(angles)
        return x0 + lx * c - ly * s, y0 + lx * s + ly * c

    rx, ry = to_map(jnp.nan_to_num(real, posinf=0.0))
    vx, vy = to_map(jnp.nan_to_num(virt, posinf=0.0))

    new_hits = scatter_hits(new_grid, rx, ry, new_mask, cfg.grid_resolution)
    gone_hits = scatter_hits(gone_grid, vx, vy, removed_mask,
                             cfg.grid_resolution)
    new_grid = update_evidence(new_grid, new_hits, dt, cfg.time_threshold,
                               cfg.decay_rate)
    gone_grid = update_evidence(gone_grid, gone_hits, dt, cfg.time_threshold,
                                cfg.decay_rate)
    return new_grid, gone_grid


class ChangeDetector:
    """Host-side state machine (one instance per robot)."""

    def __init__(self, cfg: ChangeDetectConfig | None = None,
                 lidar: LidarConfig | None = None):
        self.cfg = cfg or ChangeDetectConfig()
        self.lidar = lidar or LidarConfig()
        gh, gw = self.cfg.grid_cells
        self.new_grid = jnp.zeros((gh, gw), jnp.float32)
        self.gone_grid = jnp.zeros((gh, gw), jnp.float32)
        self._last_time: float | None = None
        self._last_virtual: jnp.ndarray | None = None

    def on_virtual_scan(self, ranges: jnp.ndarray) -> None:
        self._last_virtual = ranges

    def on_scan(self, ranges: jnp.ndarray, angles: jnp.ndarray,
                robot_pose, now: float) -> None:
        """Process one real scan. robot_pose = (x, y, yaw) in the map frame.

        Mirrors the node's guards: no-op without a virtual scan or on beam
        count mismatch (diff_node.cpp:83-86).
        """
        if self._last_virtual is None:
            return
        if self._last_virtual.shape[0] != ranges.shape[0]:
            return
        dt = 0.0 if self._last_time is None else now - self._last_time
        self._last_time = now
        self.new_grid, self.gone_grid = _step(
            self.new_grid, self.gone_grid, ranges, self._last_virtual,
            angles, jnp.asarray(robot_pose, dtype=jnp.float32),
            jnp.float32(dt), self.cfg, float(self.lidar.range_max))

    def added_objects(self) -> np.ndarray:
        """Confident added-object cell centers, (K, 2) map-frame (compact)."""
        pts, conf = evidence_points(self.new_grid, self.cfg.grid_resolution,
                                    self.cfg.time_threshold)
        return np.asarray(pts)[np.asarray(conf)]

    def removed_objects(self) -> np.ndarray:
        pts, conf = evidence_points(self.gone_grid, self.cfg.grid_resolution,
                                    self.cfg.time_threshold)
        return np.asarray(pts)[np.asarray(conf)]
