"""Production-scale closed-loop mission on the 5-object-group scene.

The full_room scene mirrors the reference's flagship world
(cardboard_table_chairs_cones_room.world:249-378: table + 4 chairs +
cardboard box + 2 cones) and the mission runs with the production
estimated-pose stack: drifting odometry + scan-to-map localization
(slam_toolbox-localization equivalent) AND a removed object seeded in the
saved map so the removed-object check-point pipeline engages
(diff_node.cpp:131-158). VERDICT r3 item #5's CPU-suite counterpart; the
on-chip artifact is MISSION_r04.json.
"""

import dataclasses as dc

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from otslam_tpu.config import (CameraConfig, LidarConfig, OTSLAMConfig,
                               TrackerConfig)
from otslam_tpu.sim.runner import MissionRunner
from otslam_tpu.sim.world import Box, full_room

CAM = CameraConfig(width=160, height=120, fx=141.4002, fy=141.4002,
                   cx=80.5, cy=60.5)
# production beam count: the wall-thickness filter (tuned 0.3 m,
# 3_virtual_lidar_navigation.launch.py) rejects distant small objects at
# coarser angular resolution — the cones subtend ~4 beams at 360 beams
LIDAR = LidarConfig()
PHANTOM = Box((4.0, -4.0, 0.15), (0.5, 0.4, 0.3), 0.0, (0.7, 0.7, 0.7),
              "removed_box")


@pytest.fixture(scope="module")
def mission(tmp_path_factory):
    work = str(tmp_path_factory.mktemp("full"))
    world = full_room()
    cfg = OTSLAMConfig(camera=CAM, lidar=LIDAR,
                       tracker=TrackerConfig.update_pipeline_profile())
    runner = MissionRunner(
        scene_map=dc.replace(world, objects=(PHANTOM,)),
        scene_world=world, workdir=work, cfg=cfg,
        # within detection reach of every object group at t=0: table 8.3 m,
        # box 5.7 m, cones 4.6 m, phantom 9.3 m (lidar range 10 m)
        start_pose=(0.5, 4.5, 0.0),
        odom_noise_per_m=0.01, use_localizer=True,
        perception_batch=5)
    summary = runner.run(max_ticks=900)
    return runner, summary, work


class TestFullRoomMission:
    def test_scene_has_eight_objects_in_room(self):
        world = full_room()
        assert len(world.objects) == 8
        xmin, xmax, ymin, ymax = world.room
        for o in world.objects:
            assert xmin < o.center[0] < xmax and ymin < o.center[1] < ymax

    def test_multiple_objects_scanned(self, mission):
        _, summary, _ = mission
        # the run visits several distinct object groups with estimated
        # poses (table group + at least one far-field object)
        assert summary.missions_completed >= 4
        assert len(summary.labels) >= 3
        assert summary.frames_captured >= len(summary.labels)

    def test_removed_check_point_visited(self, mission):
        runner, _, _ = mission
        # the phantom map object produced a removed-object check mission
        assert len(runner.sender.visited_removed_ids) >= 1
        removed = runner.removed_tracker.stable_objects
        assert any(np.hypot(s.cx - 4.0, s.cy + 4.0) < 1.0 for s in removed)

    def test_localizer_kept_pose_error_bounded(self, mission):
        runner, _, _ = mission
        ex, ey, _ = runner.pose_estimate
        assert np.hypot(ex - runner.x, ey - runner.y) < 0.25

    def test_dataset_reconstructs(self, mission):
        from otslam_tpu.config import ReconstructionConfig, TSDFConfig
        from otslam_tpu.pipeline.dataset import CaptureDataset
        from otslam_tpu.pipeline.reconstruct import reconstruct_object

        runner, summary, work = mission
        ds = CaptureDataset(work + "/dataset", CAM)
        label = summary.labels[0]
        cfg = ReconstructionConfig(
            camera=CAM, tsdf=TSDFConfig(voxel_size=0.02, sdf_trunc=0.08,
                                        dims=(128, 128, 64)))
        res = reconstruct_object(ds, label, cfg=cfg, backend="sparse",
                                 auto_origin=True)
        assert len(res.points) > 200
