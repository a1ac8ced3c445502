"""Object-vs-wall proximity filter (the launch-variant-2 gate).

Equivalent of the object_filter node (object_filter.cpp:40-160): the virtual
scan converts to map-frame wall points; any candidate object point within
``proximity_threshold`` (default 0.5 m) of a wall point is dropped. The C++
brute-force O(N*M) scan becomes the tiled MXU distance kernel.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from otslam_tpu.kernels.nn import nn_distance


class WallProximityFilter:
    def __init__(self, proximity_threshold: float = 0.5):
        self.proximity_threshold = proximity_threshold
        self._walls: jnp.ndarray | None = None   # (M, 2) map frame

    def on_virtual_scan(self, ranges: jnp.ndarray, angles: jnp.ndarray,
                        robot_pose) -> None:
        """Cache the latest wall points (finite virtual returns, map frame)."""
        r = np.asarray(ranges)
        a = np.asarray(angles)
        ok = np.isfinite(r)
        if not ok.any():
            self._walls = None
            return
        x0, y0, yaw = robot_pose
        lx = r[ok] * np.cos(a[ok])
        ly = r[ok] * np.sin(a[ok])
        c, s = np.cos(yaw), np.sin(yaw)
        wx = x0 + lx * c - ly * s
        wy = y0 + lx * s + ly * c
        self._walls = jnp.asarray(np.stack([wx, wy], -1).astype(np.float32))

    def filter(self, object_points: np.ndarray) -> np.ndarray:
        """Drop object points near walls. No wall data yet -> empty output
        (the node returns without publishing, object_filter.cpp:93)."""
        pts = np.asarray(object_points, np.float32).reshape(-1, 2)
        if self._walls is None:
            return pts[:0]
        if len(pts) == 0:
            return pts
        src = jnp.asarray(np.concatenate(
            [pts, np.zeros((len(pts), 1), np.float32)], -1))
        dst = jnp.concatenate(
            [self._walls, jnp.zeros((self._walls.shape[0], 1))], -1)
        d = np.asarray(nn_distance(src, dst, chunk=2048))
        return pts[d >= self.proximity_threshold]
