"""Real-format GT ingestion: OBJ/STL/DAE mesh loading + reference GT
protocol (eval_table_chair.py:66-88, eval_cone.py:27-49).

Parity layering: the mesh assets in tests/assets/ model the same shapes as
the analytic fixtures (sim/world.py), so a mesh-sampled GT and the analytic
GT must agree to sampling noise. The e2e test then evaluates an actual
reconstruction against the MESH-sampled GT — the reference's protocol end to
end, no analytic shortcut. An Open3D cross-check runs when open3d is
importable (the BASELINE <=1 mm RMSE contract) and skips otherwise.
"""

import importlib.util
import os

import jax.numpy as jnp
import numpy as np
import pytest

from otslam_tpu.config import CameraConfig, ReconstructionConfig, TSDFConfig
from otslam_tpu.core.camera import PinholeIntrinsics
from otslam_tpu.core.mesh_io import (TriMesh, load_mesh, read_obj, read_stl,
                                     sample_mesh_surface)
from otslam_tpu.eval.metrics import evaluate_map
from otslam_tpu.eval.scenarios import (apply_transform, assemble_mesh_gt,
                                       load_and_scale_gt,
                                       sample_object_surfaces)
from otslam_tpu.sim.world import cardboard_room, cone_room, table_chair_room

ASSETS = os.path.join(os.path.dirname(__file__), "assets")
CUBE_OBJ = os.path.join(ASSETS, "unit_cube.obj")
CUBE_DAE = os.path.join(ASSETS, "unit_cube.dae")
TRANSFORMED_CUBE_DAE = os.path.join(ASSETS, "transformed_cube.dae")
CONE_STL = os.path.join(ASSETS, "cone.stl")

DEG = 180.0 / np.pi


class TestReaders:
    def test_obj_cube(self):
        m = read_obj(CUBE_OBJ)
        assert m.vertices.shape == (8, 3)
        assert m.faces.shape == (12, 3)
        assert np.allclose(np.abs(m.vertices), 0.5)

    def test_obj_negative_and_slash_indices(self, tmp_path):
        p = tmp_path / "tri.obj"
        p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3/1/1 -2/2/2 -1/3/3\n")
        m = read_obj(str(p))
        assert m.faces.tolist() == [[0, 1, 2]]

    def test_stl_binary_cone(self):
        m = read_stl(CONE_STL)
        assert len(m.faces) == 192
        lo, hi = m.vertices.min(0), m.vertices.max(0)
        assert abs(lo[2]) < 1e-6 and abs(hi[2] - 50.0) < 1e-5
        assert abs(hi[0] - 16.0) < 0.1

    def test_stl_binary_trailing_bytes(self, tmp_path):
        """Exporters commonly append padding after the records; detection
        must not fall through to the ASCII parser."""
        data = open(CONE_STL, "rb").read() + b"\n\x00\x00"
        p = tmp_path / "pad.stl"
        p.write_bytes(data)
        m = read_stl(str(p))
        assert len(m.faces) == 192

    def test_stl_binary_with_solid_header(self, tmp_path):
        """Some binary exporters write free-form 80-byte headers starting
        with 'solid ... facet ...'; record arithmetic must win over prefix
        sniffing (regression: the old prefix check mis-parsed as ASCII)."""
        data = bytearray(open(CONE_STL, "rb").read())
        hdr = b"solid exported facet mesh"
        data[:len(hdr)] = hdr
        p = tmp_path / "solidhdr.stl"
        p.write_bytes(bytes(data))
        m = read_stl(str(p))
        assert len(m.faces) == 192

    def test_stl_ascii(self, tmp_path):
        p = tmp_path / "tri.stl"
        p.write_text(
            "solid t\nfacet normal 0 0 1\nouter loop\n"
            "vertex 0 0 0\nvertex 1 0 0\nvertex 0 1 0\n"
            "endloop\nendfacet\nendsolid t\n")
        m = read_stl(str(p))
        assert m.faces.shape == (1, 3)
        assert np.allclose(m.vertices[1], [1, 0, 0])

    def test_dae_polylist_quads(self):
        m = load_mesh(CUBE_DAE)
        assert m.vertices.shape == (8, 3)
        # 6 quads fan-triangulated -> 12 triangles
        assert m.faces.shape == (12, 3)
        # surface area of the unit cube = 6
        a, b, c = (m.vertices[m.faces[:, k]] for k in range(3))
        area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum()
        assert abs(area - 6.0) < 1e-6

    def test_dae_scene_transforms_and_units(self):
        """Gazebo-export-style DAE: <unit meter="0.01"> + a scene node chain
        (matrix translate -> instance_node -> rotate 90 about z -> scale
        (2,1,1)) must place the +-50 cm cube as a 2 x 1 x 1 m box centered
        at (1, 0, 0) m. Regression: the pre-round-3 reader ignored the
        header and scene, yielding a 100 m cube at the origin."""
        m = load_mesh(TRANSFORMED_CUBE_DAE)
        lo, hi = m.vertices.min(0), m.vertices.max(0)
        np.testing.assert_allclose(lo, [0.5, -1.0, -0.5], atol=1e-9)
        np.testing.assert_allclose(hi, [1.5, 1.0, 0.5], atol=1e-9)
        # area of a 2 x 1 x 1 box = 2*(2*1 + 2*1 + 1*1) = 10 m^2
        a, b, c = (m.vertices[m.faces[:, k]] for k in range(3))
        area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1).sum()
        assert abs(area - 10.0) < 1e-9

    def test_unknown_extension(self, tmp_path):
        p = tmp_path / "m.xyz"
        p.write_text("")
        with pytest.raises(ValueError):
            load_mesh(str(p))


class TestSampling:
    def test_points_on_cube_surface(self):
        m = read_obj(CUBE_OBJ)
        pts = sample_mesh_surface(m, 4000, seed=1)
        on_face = np.isclose(np.abs(pts), 0.5, atol=1e-6).any(axis=1)
        assert on_face.all()
        inside = (np.abs(pts) <= 0.5 + 1e-6).all(axis=1)
        assert inside.all()

    def test_area_weighting(self):
        # two triangles, one 100x larger: samples should land ~100:1
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                      [10, 10, 0], [20, 10, 0], [10, 20, 0]], float)
        f = np.array([[0, 1, 2], [3, 4, 5]])
        pts = sample_mesh_surface(TriMesh(v, f), 4000, seed=0)
        frac_big = (pts[:, 0] >= 9.0).mean()
        assert frac_big > 0.95

    def test_deterministic(self):
        m = read_stl(CONE_STL)
        a = sample_mesh_surface(m, 1000, seed=3)
        b = sample_mesh_surface(m, 1000, seed=3)
        assert np.array_equal(a, b)


def _parity(mesh_gt, analytic_gt, bound_cm=0.6):
    m = evaluate_map(mesh_gt, analytic_gt)
    assert m.accuracy_cm < bound_cm, m
    assert m.completeness_cm < bound_cm, m


class TestReferenceGTProtocol:
    def test_cardboard_obj_matches_analytic(self):
        box = cardboard_room().objects[0]
        mesh_gt = assemble_mesh_gt(
            [(CUBE_OBJ, box.size, (0, 0, box.yaw * DEG), box.center)],
            n_per=20000)
        analytic = sample_object_surfaces([box], 20000, seed=9)
        _parity(mesh_gt, analytic)

    @pytest.mark.slow
    def test_cones_stl_matches_analytic(self):
        """UNIT_SCALE=0.01 centimeter STL assets, like eval_cone.py:28."""
        cones = cone_room().objects
        assets = [(CONE_STL, (1.0, 1.0, 1.0), (0, 0, 0), c.center)
                  for c in cones]
        mesh_gt = assemble_mesh_gt(assets, n_per=20000, unit_scale=0.01)
        analytic = sample_object_surfaces(list(cones), 40000, seed=9)
        _parity(mesh_gt, analytic)

    @pytest.mark.slow
    def test_table_chair_dae_obj_matches_analytic(self):
        """Mixed-format scene: DAE table + OBJ chairs, per-asset scale and
        placement (the eval_table_chair.py:23-33 block)."""
        objs = table_chair_room().objects
        assets = []
        for k, o in enumerate(objs):
            path = CUBE_DAE if k == 0 else CUBE_OBJ
            assets.append((path, o.size, (0, 0, o.yaw * DEG), o.center))
        mesh_gt = assemble_mesh_gt(assets, n_per=20000)
        analytic = sample_object_surfaces(list(objs), 100000, seed=9)
        # looser bound than the single-object tests: the table alone has
        # 5.4 m^2 of surface, so 20k points/asset is ~4k pts/m^2 density
        _parity(mesh_gt, analytic, bound_cm=0.8)

    def test_global_offset(self):
        """The per-method GT_OFFSET_* alignment shifts the combined cloud."""
        box = cardboard_room().objects[0]
        asset = [(CUBE_OBJ, box.size, (0, 0, box.yaw * DEG), box.center)]
        a = assemble_mesh_gt(asset, n_per=500)
        b = assemble_mesh_gt(asset, n_per=500,
                             global_trans=(-2.3, -3.5, 0.5))
        assert np.allclose(b - a, [-2.3, -3.5, 0.5], atol=1e-5)

    def test_apply_transform_rotation_order(self):
        p = np.array([[1.0, 0.0, 0.0]], np.float32)
        out = apply_transform(p, (0, 0, 90), (0, 0, 0))
        assert np.allclose(out, [[0, 1, 0]], atol=1e-6)


@pytest.mark.slow
class TestMeshGTEndToEnd:
    def test_reconstruction_vs_mesh_gt(self):
        """Full reference eval protocol with a real mesh-sampled GT: fuse a
        capture circle, extract the filtered cloud, compare against the
        OBJ-derived GT — accuracy must beat the published 4.15 cm
        (result_plot.py cardboard row)."""
        from otslam_tpu.kernels.tsdf_block import (
            extract_surface_points_sparse, integrate_frames_sparse,
            make_block_volume)
        from otslam_tpu.sim.sensors import look_at_pose, render_rgbd

        cam = CameraConfig(width=160, height=120, fx=141.4002, fy=141.4002,
                           cx=80.5, cy=60.5)
        cfg = ReconstructionConfig(
            camera=cam,
            tsdf=TSDFConfig(dims=(128, 128, 64), origin=(0.9, -0.1, -0.1)))
        intr = PinholeIntrinsics.from_config(cam)
        scene = cardboard_room()
        depths, colors, exts = [], [], []
        for i in range(12):
            a = 2 * np.pi * i / 12
            eye = np.array([1.5 + 1.1 * np.cos(a), 0.5 + 1.1 * np.sin(a),
                            0.5])
            pose = look_at_pose(eye, np.array([1.5, 0.5, 0.15]))
            d, c = render_rgbd(scene, pose, intr, far=5.0)
            depths.append(np.asarray(d))
            colors.append(np.asarray(c))
            exts.append(np.linalg.inv(pose).astype(np.float32))
        vol = integrate_frames_sparse(
            make_block_volume(cfg.tsdf), jnp.asarray(np.stack(depths)),
            jnp.asarray(np.stack(colors)), jnp.asarray(np.stack(exts)),
            intr, max_active=1024)
        pts, _, mask = extract_surface_points_sparse(vol, capacity=200000,
                                                     max_blocks=4096)
        P = np.asarray(pts)[np.asarray(mask)]
        P = P[P[:, 2] >= 0.03]                     # floor filter

        box = scene.objects[0]
        gt = assemble_mesh_gt(
            [(CUBE_OBJ, box.size, (0, 0, box.yaw * DEG), box.center)],
            n_per=20000)
        gt = gt[gt[:, 2] >= 0.03]
        m = evaluate_map(P, gt)
        assert m.accuracy_cm < 4.15, m             # beat the published row
        assert m.completeness_cm < 4.39, m


requires_open3d = pytest.mark.skipif(
    importlib.util.find_spec("open3d") is None,
    reason="open3d not installed (golden cross-check runs where it is)")


@requires_open3d
class TestOpen3DGolden:
    def test_tsdf_parity_vs_open3d(self):
        """BASELINE contract: block-sparse fusion matches Open3D's
        ScalableTSDFVolume surface within 1 mm RMSE on a synthetic frame."""
        import open3d as o3d

        from otslam_tpu.kernels.tsdf_block import (
            extract_surface_points_sparse, integrate_frames_sparse,
            make_block_volume)
        from otslam_tpu.sim.sensors import look_at_pose, render_rgbd

        cam = CameraConfig(width=160, height=120, fx=141.4002, fy=141.4002,
                           cx=80.5, cy=60.5)
        cfg = TSDFConfig(dims=(128, 128, 64), origin=(0.9, -0.1, -0.1))
        intr = PinholeIntrinsics.from_config(cam)
        scene = cardboard_room()
        eye = np.array([2.6, 0.5, 0.5])
        pose = look_at_pose(eye, np.array([1.5, 0.5, 0.15]))
        d, c = render_rgbd(scene, pose, intr, far=5.0)
        ext = np.linalg.inv(pose).astype(np.float32)

        vol = integrate_frames_sparse(
            make_block_volume(cfg), jnp.asarray(np.asarray(d))[None],
            jnp.asarray(np.asarray(c))[None], jnp.asarray(ext)[None], intr,
            max_active=1024)
        pts, _, mask = extract_surface_points_sparse(vol, capacity=200000,
                                                     max_blocks=4096)
        ours = np.asarray(pts)[np.asarray(mask)]

        o3d_vol = o3d.pipelines.integration.ScalableTSDFVolume(
            voxel_length=cfg.voxel_size, sdf_trunc=cfg.sdf_trunc,
            color_type=o3d.pipelines.integration.TSDFVolumeColorType.RGB8)
        rgbd = o3d.geometry.RGBDImage.create_from_color_and_depth(
            o3d.geometry.Image(np.ascontiguousarray(
                np.asarray(c)).astype(np.uint8)),
            o3d.geometry.Image(np.ascontiguousarray(np.asarray(d))),
            depth_scale=1.0, depth_trunc=5.0, convert_rgb_to_intensity=False)
        o3d_intr = o3d.camera.PinholeCameraIntrinsic(
            cam.width, cam.height, cam.fx, cam.fy, cam.cx, cam.cy)
        o3d_vol.integrate(rgbd, o3d_intr, ext.astype(np.float64))
        golden = np.asarray(
            o3d_vol.extract_point_cloud().points, np.float32)
        m = evaluate_map(ours, golden)
        assert m.accuracy_cm < 0.1 and m.completeness_cm < 0.1, m
