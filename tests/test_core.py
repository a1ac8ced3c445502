"""Core layer: camera, SE(3), grids, IO round-trips."""

import numpy as np
import pytest

from otslam_tpu.core import (
    PinholeIntrinsics, T_FIX_OPTICAL, T_FIX_GT, invert_se3, quat_to_matrix,
    transform_points, euler_xyz_to_matrix, OccupancyGrid2D,
)
from otslam_tpu.core import io as tio
from otslam_tpu.core.se3 import pose_to_extrinsic, quat_yaw, yaw_to_quat
from otslam_tpu.config import OTSLAMConfig


INTR = PinholeIntrinsics(width=640, height=480, fx=565.6009, fy=565.6009,
                         cx=320.5, cy=240.5)


class TestCamera:
    def test_rays_backproject_center_pixel(self):
        rays = np.asarray(INTR.pixel_rays())
        # pixel at (u,v)=(320,240): x=(320-320.5)/fx
        np.testing.assert_allclose(rays[240, 320, 0], (320 - 320.5) / 565.6009,
                                   rtol=1e-6)
        np.testing.assert_allclose(rays[..., 2], 1.0)

    def test_project_roundtrip(self):
        rays = np.asarray(INTR.pixel_rays())
        depth = 2.5
        pts = rays * depth
        u, v, z = INTR.project(pts)
        uu, vv = np.meshgrid(np.arange(640), np.arange(480))
        np.testing.assert_allclose(np.asarray(u), uu, atol=1e-3)
        np.testing.assert_allclose(np.asarray(v), vv, atol=1e-3)
        np.testing.assert_allclose(np.asarray(z), depth)


class TestSE3:
    def test_tfix_rotations(self):
        # both fix matrices are pure rotations (orthonormal, det +1)
        for T in (T_FIX_OPTICAL, T_FIX_GT):
            R = T[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
            assert np.isclose(np.linalg.det(R), 1.0)

    def test_invert_se3(self, rng):
        R = euler_xyz_to_matrix(0.3, -0.2, 1.1)
        T = np.eye(4); T[:3, :3] = R; T[:3, 3] = [1, 2, 3]
        np.testing.assert_allclose(invert_se3(T) @ T, np.eye(4), atol=1e-12)

    def test_quat_matrix_yaw(self):
        yaw = 0.7
        q = yaw_to_quat(yaw)
        R = quat_to_matrix(*q)
        np.testing.assert_allclose(R[0, 0], np.cos(yaw), atol=1e-12)
        assert np.isclose(quat_yaw(*q), yaw)

    def test_pose_to_extrinsic_matches_reference_formula(self, rng):
        pose = np.eye(4)
        pose[:3, :3] = euler_xyz_to_matrix(0, 0, 0.5)
        pose[:3, 3] = [2.0, -1.0, 0.3]
        ext = pose_to_extrinsic(pose)
        np.testing.assert_allclose(ext, np.linalg.inv(pose @ T_FIX_OPTICAL),
                                   atol=1e-12)

    def test_transform_points(self):
        T = np.eye(4); T[:3, 3] = [1, 0, 0]
        out = transform_points(T, np.zeros((5, 3)))
        np.testing.assert_allclose(out[:, 0], 1.0)


class TestGrid:
    def test_pgm_roundtrip_conventions(self):
        img = np.full((4, 6), 254, np.uint8)
        img[0, 1] = 0      # occupied at top row of image
        img[2, 3] = 205    # unknown
        g = OccupancyGrid2D.from_pgm(img, 0.05, (-1.0, -2.0))
        data = np.asarray(g.data)
        assert data[3, 1] == 100           # top image row = last grid row
        assert data[1, 3] == -1
        back = g.to_pgm()
        assert back[0, 1] == 0 and back[2, 3] == 205

    def test_occupied_world_points_matches_reference_pixel_math(self):
        # reference: wx = ox + c*res ; wy = oy + (h-1-r)*res (hybrid_map.py:50-55)
        img = np.full((10, 8), 254, np.uint8)
        img[7, 2] = 0
        res, ox, oy = 0.05, -1.0, -2.0
        g = OccupancyGrid2D.from_pgm(img, res, (ox, oy))
        pts = g.occupied_world_points()
        assert pts.shape == (1, 2)
        np.testing.assert_allclose(pts[0], [ox + 2 * res, oy + (10 - 1 - 7) * res])

    def test_world_to_cell(self):
        g = OccupancyGrid2D.from_pgm(np.full((4, 4), 254, np.uint8), 0.5, (0.0, 0.0))
        gx, gy = g.world_to_cell(np.array([[1.2, 0.6]]))
        assert int(gx[0]) == 2 and int(gy[0]) == 1


class TestIO:
    def test_ply_roundtrip_binary_and_ascii(self, tmp_path, rng):
        pts = rng.standard_normal((100, 3)).astype(np.float32)
        cols = rng.uniform(0, 1, (100, 3)).astype(np.float32)
        for binary in (True, False):
            p = str(tmp_path / f"c_{binary}.ply")
            tio.write_ply(p, pts, colors=cols, binary=binary)
            out = tio.read_ply(p)
            np.testing.assert_allclose(out["points"], pts, atol=1e-5)
            np.testing.assert_allclose(out["colors"], cols, atol=1.0 / 255.0)

    def test_ply_mesh_roundtrip(self, tmp_path):
        pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        faces = np.array([[0, 1, 2]], np.int32)
        p = str(tmp_path / "m.ply")
        tio.write_ply(p, pts, faces=faces)
        out = tio.read_ply(p)
        np.testing.assert_array_equal(out["faces"], faces)

    def test_pgm_roundtrip(self, tmp_path, rng):
        img = rng.integers(0, 255, (32, 40), dtype=np.uint8)
        p = str(tmp_path / "m.pgm")
        tio.write_pgm(p, img)
        np.testing.assert_array_equal(tio.read_pgm(p), img)

    def test_pose_roundtrip(self, tmp_path):
        pose = np.eye(4); pose[:3, 3] = [1.234567, -0.5, 9.0]
        p = str(tmp_path / "p.txt")
        tio.write_pose_txt(p, pose)
        np.testing.assert_allclose(tio.read_pose_txt(p), pose, atol=1e-6)

    def test_depth_png_roundtrip_with_scanner_clipping(self, tmp_path):
        d = np.array([[0.5, 6.0], [np.nan, 2.001]], np.float32)
        p = str(tmp_path / "d.png")
        tio.write_depth_png(p, d)   # >5m and NaN -> 0 (scanner_node semantics)
        out = tio.read_depth_png(p)
        np.testing.assert_allclose(out, [[0.5, 0.0], [0.0, 2.001]], atol=5e-4)

    def test_map_yaml_roundtrip(self, tmp_path):
        p = str(tmp_path / "map.yaml")
        tio.write_map_yaml(p, "map.pgm", 0.05, (-10.0, -10.0, 0.0))
        d = tio.read_map_yaml(p)
        assert d["resolution"] == 0.05 and d["origin"][0] == -10.0


class TestConfig:
    def test_json_roundtrip(self):
        cfg = OTSLAMConfig()
        cfg2 = OTSLAMConfig.from_json(cfg.to_json())
        assert cfg == cfg2
        assert cfg.tracker.stability_time == 3.0
        assert cfg.tsdf.dims == (256, 256, 256)
