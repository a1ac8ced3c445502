"""Cone scenario eval (eval_cone analog): two cones reconstruct and beat the
published numbers (accuracy 2.48 cm / completeness 4.18 cm)."""

import numpy as np
import pytest

from otslam_tpu.config import CameraConfig, ReconstructionConfig, TSDFConfig
from otslam_tpu.core.camera import PinholeIntrinsics
from otslam_tpu.core.se3 import T_FIX_OPTICAL
from otslam_tpu.eval.metrics import evaluate_map
from otslam_tpu.eval.scenarios import sample_scene_surface
from otslam_tpu.pipeline.dataset import CaptureDataset
from otslam_tpu.pipeline.reconstruct import reconstruct_all
from otslam_tpu.sim.sensors import look_at_pose, render_rgbd
from otslam_tpu.sim.world import cone_room

CAM = CameraConfig(width=160, height=120, fx=141.4002, fy=141.4002,
                   cx=80.5, cy=60.5)


class TestConeScenario:
    @pytest.mark.slow
    def test_beats_published_numbers(self, tmp_path):
        scene = cone_room()
        intr = PinholeIntrinsics.from_config(CAM)
        ds = CaptureDataset(str(tmp_path), CAM)
        for oi, cone in enumerate(scene.objects):
            cx, cy, _ = cone.center
            for i in range(8):
                a = 2 * np.pi * i / 8
                eye = np.array([cx + 0.9 * np.cos(a), cy + 0.9 * np.sin(a),
                                0.55])
                optical = look_at_pose(eye, np.array([cx, cy, 0.2]))
                d, c = render_rgbd(scene, optical, intr, far=CAM.depth_max)
                ds.save_frame(f"Object_{oi}", np.asarray(c).astype(np.uint8),
                              np.asarray(d), optical @ T_FIX_OPTICAL.T)
        cfg = ReconstructionConfig(
            camera=CAM,
            tsdf=TSDFConfig(voxel_size=0.01, sdf_trunc=0.04,
                            dims=(96, 96, 96)),
            surface_samples=20000)
        out = reconstruct_all(ds, cfg, backend="sparse", auto_origin=True)
        map_pts = np.concatenate([r.points for r in out.values()])
        gt = sample_scene_surface(scene, 30000, seed=0)
        gt = gt[gt[:, 2] >= 0.03]
        m = evaluate_map(map_pts, gt)
        # published (Gazebo): accuracy 2.48 cm, completeness 4.18 cm
        assert m.accuracy_cm < 2.48, m
        assert m.completeness_cm < 4.18, m

    @pytest.mark.slow
    def test_batched_mesh_output_matches_per_object(self, tmp_path):
        """reconstruct_all(output='mesh') routes multi-object extraction
        through ONE batched dispatch (extract_meshes_block); the welded
        meshes must be identical to the per-object reconstruct_object
        path (same triangles, capacity-independent welding)."""
        from otslam_tpu.pipeline.reconstruct import reconstruct_object

        scene = cone_room()
        intr = PinholeIntrinsics.from_config(CAM)
        ds = CaptureDataset(str(tmp_path), CAM)
        for oi, cone in enumerate(scene.objects):
            cx, cy, _ = cone.center
            for i in range(6):
                a = 2 * np.pi * i / 6
                eye = np.array([cx + 0.9 * np.cos(a), cy + 0.9 * np.sin(a),
                                0.55])
                optical = look_at_pose(eye, np.array([cx, cy, 0.2]))
                d, c = render_rgbd(scene, optical, intr, far=CAM.depth_max)
                ds.save_frame(f"Object_{oi}", np.asarray(c).astype(np.uint8),
                              np.asarray(d), optical @ T_FIX_OPTICAL.T)
        cfg = ReconstructionConfig(
            camera=CAM,
            tsdf=TSDFConfig(voxel_size=0.02, sdf_trunc=0.08,
                            dims=(64, 64, 64)))
        out_b = reconstruct_all(ds, cfg, backend="sparse", output="mesh",
                                save_dir=str(tmp_path / "meshes"),
                                auto_origin=True)
        assert len(out_b) == 2
        for name in out_b:
            ref = reconstruct_object(ds, name, cfg, backend="sparse",
                                     output="mesh", auto_origin=True)
            assert len(out_b[name].points) == len(ref.points) > 50
            np.testing.assert_array_equal(out_b[name].points, ref.points)
            np.testing.assert_array_equal(out_b[name].colors, ref.colors)
        assert (tmp_path / "meshes" / "Object_0.ply").exists()
