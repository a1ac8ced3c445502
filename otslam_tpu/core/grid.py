"""2D occupancy grid types and world<->grid coordinate conventions.

Two pixel conventions exist in the reference and both are preserved:

* ROS OccupancyGrid (row 0 = bottom): cell value 100 = occupied, 0 = free,
  -1 = unknown; world_x = origin_x + col * resolution (virtual_scan_node.cpp:274-281).
* PGM image (row 0 = top, slam_toolbox export): pixel < 100 = occupied,
  205 +/- 5 = unknown; world_y = origin_y + (height - 1 - row) * resolution
  (hybrid_map.py:50-55).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass
class OccupancyGrid2D:
    """ROS-convention occupancy grid: data[row, col], row 0 at origin (bottom).

    data: (H, W) int8 — 100 occupied, 0 free, -1 unknown.
    """

    data: jnp.ndarray
    resolution: float
    origin: Tuple[float, float]  # world coords of cell (0, 0) corner

    def tree_flatten(self):
        return (self.data,), (self.resolution, self.origin)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])

    @property
    def height(self) -> int:
        return self.data.shape[0]

    @property
    def width(self) -> int:
        return self.data.shape[1]

    def world_to_cell(self, xy):
        """World (…,2) -> integer (col, row) indices, truncating like the
        reference's `(int)((x - ox) / res)` (virtual_scan_node.cpp:274-275)."""
        xy = jnp.asarray(xy)
        gx = jnp.floor((xy[..., 0] - self.origin[0]) / self.resolution).astype(jnp.int32)
        gy = jnp.floor((xy[..., 1] - self.origin[1]) / self.resolution).astype(jnp.int32)
        return gx, gy

    def in_bounds(self, gx, gy):
        return (gx >= 0) & (gx < self.width) & (gy >= 0) & (gy < self.height)

    @classmethod
    def from_pgm(cls, img: np.ndarray, resolution: float, origin: Tuple[float, float],
                 occupied_threshold: int = 100, unknown_value: int = 205,
                 unknown_band: int = 5) -> "OccupancyGrid2D":
        """PGM image (row 0 = top) -> ROS occupancy grid (row 0 = bottom)."""
        img = np.asarray(img)
        flipped = img[::-1]  # row 0 now bottom
        occ = flipped < occupied_threshold
        unknown = (flipped >= unknown_value - unknown_band) & (
            flipped <= unknown_value + unknown_band
        )
        data = np.zeros(flipped.shape, dtype=np.int8)
        data[occ] = 100
        data[unknown] = -1
        return cls(jnp.asarray(data), float(resolution), (float(origin[0]), float(origin[1])))

    def to_pgm(self, unknown_value: int = 205) -> np.ndarray:
        """ROS occupancy grid -> PGM image (row 0 = top)."""
        data = np.asarray(self.data)
        img = np.full(data.shape, 254, dtype=np.uint8)  # free = near-white
        img[data == 100] = 0
        img[data == -1] = unknown_value
        return img[::-1]

    def occupied_world_points(self) -> np.ndarray:
        """World (x, y) of occupied cell *origins* following hybrid_map.py:50-55.

        The reference iterates PGM pixels: wx = ox + c*res,
        wy = oy + (h-1-r)*res; in the bottom-origin convention that is simply
        wx = ox + col*res, wy = oy + row*res.
        """
        data = np.asarray(self.data)
        rows, cols = np.nonzero(data == 100)
        wx = self.origin[0] + cols * self.resolution
        wy = self.origin[1] + rows * self.resolution
        return np.stack([wx, wy], axis=-1)
