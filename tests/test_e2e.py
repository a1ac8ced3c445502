"""End-to-end closed-loop mission: detect a new object, navigate, scan,
reconstruct — the headless equivalent of the reference's Gazebo workflow
(SURVEY.md §3.1 / §4.1)."""

import numpy as np
import pytest

from otslam_tpu.config import (
    CameraConfig, LidarConfig, OTSLAMConfig, ReconstructionConfig, TSDFConfig)
from otslam_tpu.pipeline.dataset import CaptureDataset
from otslam_tpu.pipeline.reconstruct import reconstruct_object
from otslam_tpu.sim.runner import MissionRunner
from otslam_tpu.sim.world import Box, Scene

# small camera for CPU-speed rendering; intrinsics scaled from the reference
CAM = CameraConfig(width=160, height=120, fx=141.4002, fy=141.4002,
                   cx=80.5, cy=60.5)
LIDAR = LidarConfig(num_beams=360)
BOX = Box((1.5, 0.5, 0.15), (0.5, 0.4, 0.3), 0.3, (0.76, 0.6, 0.42),
          "cardboard_box")


def make_cfg():
    from otslam_tpu.config import TrackerConfig
    return OTSLAMConfig(camera=CAM, lidar=LIDAR,
                        tracker=TrackerConfig.update_pipeline_profile())


@pytest.fixture(scope="module")
def mission(tmp_path_factory):
    work = str(tmp_path_factory.mktemp("mission"))
    runner = MissionRunner(
        scene_map=Scene(objects=()),          # saved map: empty room
        scene_world=Scene(objects=(BOX,)),    # reality: box appeared
        workdir=work,
        cfg=make_cfg(),
        start_pose=(-2.0, -2.0, 0.5),
    )
    summary = runner.run(max_ticks=300)
    return runner, summary, work


class TestClosedLoop:
    def test_object_detected_and_tracked(self, mission):
        runner, summary, _ = mission
        assert summary.stable_objects == 1
        s = runner.tracker.stable_objects[0]
        assert np.hypot(s.cx - 1.5, s.cy - 0.5) < 0.4

    def test_missions_executed_and_frames_captured(self, mission):
        runner, summary, _ = mission
        assert summary.missions_completed >= 4
        assert summary.frames_captured >= 4
        assert summary.labels == ["Object_0"]
        # all visiting points exhausted
        assert runner.sender.pending_count() == 0

    def test_dataset_on_disk_matches_scanner_format(self, mission):
        _, summary, work = mission
        ds = CaptureDataset(f"{work}/dataset", CAM)
        assert ds.object_names() == ["Object_0"]
        batch = ds.load_object("Object_0")
        assert batch.depths.shape[0] == summary.frames_captured
        assert batch.depths.shape[1:] == (120, 160)
        # captured depths contain real returns
        assert (batch.depths > 0).mean() > 0.2

    def test_reconstruction_recovers_box_geometry(self, mission):
        _, summary, work = mission
        ds = CaptureDataset(f"{work}/dataset", CAM)
        cfg = ReconstructionConfig(
            camera=CAM,
            tsdf=TSDFConfig(dims=(128, 128, 64), origin=(0.9, -0.1, -0.1)),
            surface_samples=20000)
        res = reconstruct_object(ds, "Object_0", cfg, backend="sparse")
        assert len(res.points) > 5000
        # distance of reconstructed points to the true (yawed) box surface
        p = res.points - np.array([1.5, 0.5, 0.15])
        c, s = np.cos(-0.3), np.sin(-0.3)
        local = np.stack([p[:, 0] * c - p[:, 1] * s,
                          p[:, 0] * s + p[:, 1] * c, p[:, 2]], -1)
        q = np.abs(local) - np.array([0.25, 0.2, 0.15])
        d_out = np.linalg.norm(np.maximum(q, 0), axis=1)
        d_in = np.minimum(np.max(q, axis=1), 0)
        sdf = d_out + d_in
        rmse = float(np.sqrt((sdf ** 2).mean()))
        assert rmse < 0.02, f"box reconstruction RMSE {rmse*1000:.1f} mm"


class TestLocalizedMission:
    @pytest.mark.slow
    def test_mission_with_drifting_odometry_and_localizer(self, tmp_path):
        """No oracle poses: odometry drifts per meter traveled; scan-to-map
        localization keeps the believed pose (and thus captures, goals, and
        change detection) accurate."""
        runner = MissionRunner(
            scene_map=Scene(objects=()),
            scene_world=Scene(objects=(BOX,)),
            workdir=str(tmp_path), cfg=make_cfg(),
            start_pose=(-2.0, -2.0, 0.5),
            odom_noise_per_m=0.02, use_localizer=True, fault_seed=3)
        summary = runner.run(max_ticks=300)
        assert summary.missions_completed >= 3
        assert summary.frames_captured >= 3
        # drift accumulated but the believed pose stayed close to truth
        drift = float(np.hypot(*runner._odom_drift[:2]))
        est_err = float(np.hypot(runner.pose_estimate[0] - runner.x,
                                 runner.pose_estimate[1] - runner.y))
        assert drift > 0.03  # odometry alone would be materially off
        assert est_err < 0.06
        assert est_err < drift
        # captures reconstruct to usable geometry despite noisy odometry
        ds = CaptureDataset(f"{tmp_path}/dataset", CAM)
        cfg = ReconstructionConfig(
            camera=CAM,
            tsdf=TSDFConfig(dims=(128, 128, 64), origin=(0.9, -0.1, -0.1)),
            surface_samples=20000)
        res = reconstruct_object(ds, "Object_0", cfg, backend="sparse")
        assert len(res.points) > 3000
        p = res.points - np.array([1.5, 0.5, 0.15])
        c, s = np.cos(-0.3), np.sin(-0.3)
        local = np.stack([p[:, 0] * c - p[:, 1] * s,
                          p[:, 0] * s + p[:, 1] * c, p[:, 2]], -1)
        q = np.abs(local) - np.array([0.25, 0.2, 0.15])
        sdf = (np.linalg.norm(np.maximum(q, 0), axis=1)
               + np.minimum(np.max(q, axis=1), 0))
        rmse = float(np.sqrt((sdf ** 2).mean()))
        assert rmse < 0.04, f"RMSE {rmse*1000:.1f} mm with localized poses"
