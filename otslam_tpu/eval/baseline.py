"""Dense-mapping baseline and map-size comparison.

The reference's headline claim is a 99.0% map-data-size reduction vs
conventional dense 3D mapping (README.md:60; RTAB-Map is the dense baseline,
1.7 MB vs 169 MB: eval/result_plot.py:17-18). This module provides the
equivalent comparison natively:

* ``dense_room_reconstruction`` — a whole-room dense TSDF map from a
  trajectory of frames (what RTAB-Map-style mapping stores), the baseline
  for accuracy/completeness and size.
* ``hybrid_map_size_stats`` — byte sizes of a selective hybrid map
  (2D PGM + per-object PLYs) vs a dense map PLY, and the reduction ratio.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import numpy as np

from otslam_tpu.config import ReconstructionConfig, TSDFConfig
from otslam_tpu.core.camera import PinholeIntrinsics
from otslam_tpu.kernels.sampling import resample_points
from otslam_tpu.kernels.tsdf import extract_surface_points
from otslam_tpu.pipeline.reconstruct import fuse_frames


def dense_room_reconstruction(depths, colors, extrinsics,
                              intr: PinholeIntrinsics,
                              room_bounds, voxel_size: float = 0.02,
                              sdf_trunc: float = 0.08,
                              samples: int = 500_000,
                              backend: str = "sparse", seed: int = 0):
    """Dense whole-room reconstruction (the conventional-mapping baseline).

    room_bounds: (xmin, xmax, ymin, ymax, zmin, zmax). Returns (points,
    colors) of the sampled dense map cloud.
    """
    xmin, xmax, ymin, ymax, zmin, zmax = room_bounds

    def rnd8(v):
        return int(-(-v // 8)) * 8

    dims = (rnd8((xmax - xmin) / voxel_size), rnd8((ymax - ymin) / voxel_size),
            rnd8((zmax - zmin) / voxel_size))
    cfg = ReconstructionConfig(
        tsdf=TSDFConfig(voxel_size=voxel_size, sdf_trunc=sdf_trunc,
                        dims=dims, origin=(xmin, ymin, zmin)),
        surface_samples=samples)
    vol = fuse_frames(depths, colors, extrinsics, intr, cfg, backend,
                      max_active=8192)
    pts, cols, mask = extract_surface_points(vol, capacity=4_000_000)
    s_pts, s_cols, _ = resample_points(jax.random.PRNGKey(seed), pts, mask,
                                       samples, colors=cols)
    return np.asarray(s_pts), np.asarray(s_cols)


@dataclass
class MapSizeStats:
    hybrid_bytes: int
    dense_bytes: int
    reduction_percent: float
    breakdown: dict


def hybrid_map_size_stats(map_pgm_path: str, object_dir: str,
                          dense_map_path: str) -> MapSizeStats:
    """Selective hybrid map (2D PGM + object PLYs) vs a dense map file."""
    import glob
    pgm = os.path.getsize(map_pgm_path)
    objs = {os.path.basename(f): os.path.getsize(f)
            for f in glob.glob(os.path.join(object_dir, "*.ply"))}
    hybrid = pgm + sum(objs.values())
    dense = os.path.getsize(dense_map_path)
    reduction = 100.0 * (1.0 - hybrid / dense) if dense > 0 else 0.0
    return MapSizeStats(hybrid, dense, reduction,
                        {"pgm": pgm, "objects": objs})
