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
