"""Scan-to-map localization (the slam_toolbox-localization equivalent)."""

import numpy as np
import jax.numpy as jnp

from otslam_tpu.config import LidarConfig
from otslam_tpu.mapping.localize import ScanLocalizer
from otslam_tpu.sim.sensors import render_lidar
from otslam_tpu.sim.world import cardboard_room

LIDAR = LidarConfig(num_beams=360)


def angles():
    return jnp.asarray(np.linspace(0, 2 * np.pi, 360, endpoint=False),
                       dtype=jnp.float32)


class TestScanLocalizer:
    def test_recovers_pose_from_perturbed_prior(self):
        scene = cardboard_room()
        loc = ScanLocalizer(scene.occupancy_grid(0.05))
        true = (0.6, -1.1, 0.8)
        scan = render_lidar(scene, *true, angles(),
                            LIDAR.range_min, LIDAR.range_max)
        # odometry drifted by 12 cm and 4 degrees
        prior = (true[0] + 0.12, true[1] - 0.08, true[2] + 0.07)
        res = loc.localize(scan, angles(), prior)
        assert np.hypot(res.x - true[0], res.y - true[1]) < 0.04
        assert abs(res.yaw - true[2]) < 0.02
        assert res.fitness > 0.9

    def test_exact_prior_stays_put(self):
        scene = cardboard_room()
        loc = ScanLocalizer(scene.occupancy_grid(0.05))
        true = (-2.0, 1.0, -0.4)
        scan = render_lidar(scene, *true, angles(),
                            LIDAR.range_min, LIDAR.range_max)
        res = loc.localize(scan, angles(), true)
        assert np.hypot(res.x - true[0], res.y - true[1]) < 0.03
        assert abs(res.yaw - true[2]) < 0.015


class TestScanLocalizerDegraded:
    """Degraded-input contract: perception loops need a prior-unchanged
    result, never an exception (localize.py docstring)."""

    def test_empty_map_returns_prior(self):
        from otslam_tpu.core.grid import OccupancyGrid2D
        blank = OccupancyGrid2D(np.full((64, 64), 205, np.uint8),
                                resolution=0.05, origin=(0.0, 0.0))
        loc = ScanLocalizer(blank)
        res = loc.localize(np.full(360, 2.0, np.float32), angles(),
                           (1.0, -2.0, 0.3))
        assert (res.x, res.y, res.yaw) == (1.0, -2.0, 0.3)
        assert res.fitness == 0.0

    def test_no_finite_returns_returns_prior(self):
        scene = cardboard_room()
        loc = ScanLocalizer(scene.occupancy_grid(0.05))
        res = loc.localize(np.full(360, np.inf, np.float32), angles(),
                           (0.5, 0.5, 0.0))
        assert (res.x, res.y, res.yaw) == (0.5, 0.5, 0.0)
        assert res.fitness == 0.0

    def test_partial_infinite_beams_still_localize(self):
        # masked invalid beams keep the scan cloud's static shape and must
        # not corrupt the solve
        scene = cardboard_room()
        loc = ScanLocalizer(scene.occupancy_grid(0.05))
        true = (0.6, -1.1, 0.8)
        scan = np.array(render_lidar(scene, *true, angles(),
                                     LIDAR.range_min, LIDAR.range_max))
        scan[::3] = np.inf                  # a third of the beams drop out
        prior = (true[0] + 0.1, true[1] - 0.06, true[2] + 0.05)
        res = loc.localize(scan, angles(), prior)
        assert np.hypot(res.x - true[0], res.y - true[1]) < 0.05
        assert abs(res.yaw - true[2]) < 0.03


def test_wrong_basin_fit_returns_prior():
    """A correction larger than max_correction is a wrong-basin fit by
    construction (observed: a degenerate in-wall scan converging 15 m away
    at fitness 1.0) — the localizer must return the odometry prior."""
    scene = cardboard_room()
    loc = ScanLocalizer(scene.occupancy_grid(0.05), max_correction=0.5)
    real = render_lidar(scene, 0.0, 0.0, 0.0, angles(),
                        LIDAR.range_min, LIDAR.range_max)
    # prior deliberately far off: the fit either jumps a long way
    # (rejected, prior returned) or can't move far enough to matter
    prior = (3.5, 3.5, 2.0)
    res = loc.localize(real, angles(), prior)
    moved = np.hypot(res.x - prior[0], res.y - prior[1])
    assert moved <= 0.5 + 1e-6
