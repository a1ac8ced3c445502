"""Batched perception ticks (mapping/perception.py): one dispatch for K
ticks of raycast -> scan diff -> evidence, with parity against the
sequential VirtualScanner + ChangeDetector path and a full batched mission.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from otslam_tpu.config import (CameraConfig, ChangeDetectConfig, LidarConfig,
                               OTSLAMConfig, TrackerConfig)
from otslam_tpu.mapping.change_detect import ChangeDetector
from otslam_tpu.mapping.perception import perception_ticks
from otslam_tpu.mapping.virtual_scan import VirtualScanner
from otslam_tpu.sim.sensors import render_lidar
from otslam_tpu.sim.world import Box, Scene

LIDAR = LidarConfig(num_beams=360)
BOX = Box((1.5, 0.5, 0.15), (0.5, 0.4, 0.3), 0.3, (0.76, 0.6, 0.42), "box")


def _setup():
    scene_map = Scene(objects=())
    scene_world = Scene(objects=(BOX,))
    vs = VirtualScanner(LIDAR)
    vs.set_map(scene_map.occupancy_grid(0.05))
    det = ChangeDetector(ChangeDetectConfig(), LIDAR)
    return scene_world, vs, det


class TestBatchedParity:
    def test_matches_sequential_path(self):
        """K moving-pose ticks through the fused scan must produce the same
        grids, virtual scans, and confident detections as the sequential
        per-tick path."""
        scene_world, vs, det = _setup()
        angles = vs.angles()
        K = 12
        rng = np.random.default_rng(0)
        poses = np.stack([
            np.linspace(-0.5, 0.5, K),
            np.linspace(1.5, 1.0, K),
            rng.uniform(-1.5, -1.0, K)], axis=1).astype(np.float32)
        dts = np.full(K, 0.2, np.float32)
        dts[0] = 0.0
        reals = jnp.stack([
            render_lidar(scene_world, *poses[i], angles,
                         LIDAR.range_min, LIDAR.range_max)
            for i in range(K)])

        # sequential reference
        t = 0.0
        for i in range(K):
            t += 0.2
            virt = vs.scan(*poses[i])
            det.on_virtual_scan(virt)
            det.on_scan(reals[i], angles, poses[i], t)
        seq_new = np.asarray(det.new_grid)
        seq_gone = np.asarray(det.gone_grid)
        seq_added = det.added_objects()

        g = vs._map
        det2 = ChangeDetector(ChangeDetectConfig(), LIDAR)
        batch = perception_ticks(
            g.data, float(g.resolution), float(g.origin[0]),
            float(g.origin[1]), det2.new_grid, det2.gone_grid, reals,
            jnp.asarray(poses), jnp.asarray(dts), angles, det2.cfg,
            float(LIDAR.range_max))
        np.testing.assert_allclose(np.asarray(batch.new_grid), seq_new,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(batch.gone_grid), seq_gone,
                                   atol=1e-6)
        # last tick's virtual scan equals the sequential one
        np.testing.assert_allclose(np.asarray(batch.virtual[-1]),
                                   np.asarray(vs.scan(*poses[-1])), atol=1e-6)
        # final-tick confident detections match (set equality)
        cnt = int(batch.added_cnt[-1])
        got = set(map(tuple, np.round(
            np.asarray(batch.added_pts[-1][:cnt]), 4).tolist()))
        want = set(map(tuple, np.round(seq_added, 4).tolist()))
        assert got == want
        assert len(want) > 0            # the box was actually detected

    def test_compaction_capacity(self):
        """Counts clip at max_points; points beyond the count are zeroed."""
        scene_world, vs, det = _setup()
        angles = vs.angles()
        g = vs._map
        pose = jnp.asarray([[-0.5, 1.5, -1.2]], jnp.float32)
        real = render_lidar(scene_world, -0.5, 1.5, -1.2, angles,
                            LIDAR.range_min, LIDAR.range_max)[None]
        # enough dwell to confirm everything in one tick
        dts = jnp.asarray([100.0], jnp.float32)
        batch = perception_ticks(
            g.data, float(g.resolution), float(g.origin[0]),
            float(g.origin[1]), det.new_grid, det.gone_grid, real, pose,
            dts, angles, det.cfg, float(LIDAR.range_max), max_points=4)
        assert int(batch.added_cnt[0]) <= 4
        assert np.all(np.asarray(batch.added_pts[0][4:]) == 0.0)


@pytest.mark.slow
class TestBatchedMission:
    def test_mission_completes_with_batched_perception(self, tmp_path):
        from otslam_tpu.sim.runner import MissionRunner

        cam = CameraConfig(width=160, height=120, fx=141.4002, fy=141.4002,
                           cx=80.5, cy=60.5)
        cfg = OTSLAMConfig(camera=cam, lidar=LIDAR,
                           tracker=TrackerConfig.update_pipeline_profile())
        runner = MissionRunner(Scene(objects=()), Scene(objects=(BOX,)),
                               str(tmp_path), cfg,
                               start_pose=(-0.5, 1.5, -1.2),
                               perception_batch=5)
        summary = runner.run(max_ticks=400)
        assert summary.stable_objects == 1
        assert summary.missions_completed >= 1
        assert summary.frames_captured >= 2
        s = runner.tracker.stable_objects[0]
        np.testing.assert_allclose((s.cx, s.cy), (1.5, 0.5), atol=0.5)
