"""Full table & chair scenario: per-object captures, auto-origin volumes,
reconstruction of all five objects, and evaluation against the analytic GT —
the acceptance analog of eval_table_chair.py, compared to the published
reference numbers (accuracy 2.63 cm / completeness 8.59 cm)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from otslam_tpu.config import CameraConfig, ReconstructionConfig, TSDFConfig
from otslam_tpu.core.camera import PinholeIntrinsics
from otslam_tpu.core.se3 import T_FIX_OPTICAL
from otslam_tpu.eval.metrics import evaluate_map
from otslam_tpu.eval.scenarios import sample_scene_surface
from otslam_tpu.pipeline.dataset import CaptureDataset
from otslam_tpu.pipeline.reconstruct import reconstruct_all
from otslam_tpu.sim.sensors import look_at_pose, render_rgbd
from otslam_tpu.sim.world import table_chair_room

CAM = CameraConfig(width=160, height=120, fx=141.4002, fy=141.4002,
                   cx=80.5, cy=60.5)


@pytest.fixture(scope="module")
def reconstructed(tmp_path_factory):
    work = str(tmp_path_factory.mktemp("tc"))
    scene = table_chair_room()
    intr = PinholeIntrinsics.from_config(CAM)
    ds = CaptureDataset(work, CAM)
    for oi, obj in enumerate(scene.objects):
        cx, cy, cz = obj.center
        radius = max(obj.size[0], obj.size[1]) / 2 + 1.0
        for i in range(10):
            a = 2 * np.pi * i / 10
            eye = np.array([cx + radius * np.cos(a), cy + radius * np.sin(a),
                            obj.size[2] + 0.4])
            optical = look_at_pose(eye, np.array([cx, cy, cz]))
            d, c = render_rgbd(scene, optical, intr, far=CAM.depth_max)
            # save in scanner format (map->body pose)
            ds.save_frame(f"Object_{oi}", np.asarray(c).astype(np.uint8),
                          np.asarray(d), optical @ T_FIX_OPTICAL.T)
    cfg = ReconstructionConfig(
        camera=CAM,
        tsdf=TSDFConfig(voxel_size=0.01, sdf_trunc=0.04,
                        dims=(192, 192, 128)),
        surface_samples=40000)
    out = reconstruct_all(ds, cfg, backend="sparse", auto_origin=True)
    return scene, out


class TestTableChairScenario:
    def test_all_five_objects_reconstruct(self, reconstructed):
        _, out = reconstructed
        assert sorted(out) == [f"Object_{i}" for i in range(5)]
        for res in out.values():
            assert len(res.points) > 5000

    def test_beats_published_reference_numbers(self, reconstructed):
        scene, out = reconstructed
        map_pts = np.concatenate([r.points for r in out.values()])
        gt = sample_scene_surface(scene, 50000, seed=0)
        gt = gt[gt[:, 2] >= 0.03]
        m = evaluate_map(map_pts, gt)
        # published (Gazebo): accuracy 2.63 cm, completeness 8.59 cm
        assert m.accuracy_cm < 2.63, m
        assert m.completeness_cm < 8.59, m
