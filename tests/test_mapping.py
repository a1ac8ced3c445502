"""Mapping layer: virtual scan, change detection, selective merge, hybrid map."""

import numpy as np
import jax.numpy as jnp

from otslam_tpu.config import ChangeDetectConfig, LidarConfig, OTSLAMConfig
from otslam_tpu.core import io as tio
from otslam_tpu.core.grid import OccupancyGrid2D
from otslam_tpu.mapping.change_detect import ChangeDetector
from otslam_tpu.mapping.merge import smart_paste, selective_merge
from otslam_tpu.mapping.hybrid import build_hybrid_map, map_to_cloud
from otslam_tpu.mapping.virtual_scan import VirtualScanner
from otslam_tpu.sim.world import Box, Scene, cardboard_room
from otslam_tpu.sim.sensors import render_lidar

LIDAR = LidarConfig(num_beams=360)


class TestVirtualScanner:
    def test_virtual_matches_real_for_unchanged_world(self):
        scene = Scene(objects=())
        vs = VirtualScanner(LIDAR)
        vs.set_map(scene.occupancy_grid(0.05))
        virt = np.asarray(vs.scan(0.0, 0.0, 0.0))
        real = np.asarray(render_lidar(scene, 0.0, 0.0, 0.0, vs.angles(),
                                       LIDAR.range_min, LIDAR.range_max))
        both = np.isfinite(virt) & np.isfinite(real)
        assert both.mean() > 0.95
        # grid discretization: agreement within ~2 cells
        assert np.abs(virt[both] - real[both]).max() < 0.15

    def test_requires_map(self):
        vs = VirtualScanner(LIDAR)
        try:
            vs.scan(0, 0, 0)
            assert False, "expected RuntimeError"
        except RuntimeError:
            pass


class TestChangeDetector:
    def test_added_object_detected_and_decays(self):
        scene_empty = Scene(objects=())
        scene_box = cardboard_room()
        vs = VirtualScanner(LIDAR)
        vs.set_map(scene_empty.occupancy_grid(0.05))
        det = ChangeDetector(ChangeDetectConfig(), LIDAR)
        angles = vs.angles()
        pose = (-1.0, -1.0, 0.5)
        t = 0.0
        for _ in range(20):  # 4 s of scans at 5 Hz
            t += 0.2
            virt = vs.scan(*pose)
            real = render_lidar(scene_box, *pose, angles,
                                LIDAR.range_min, LIDAR.range_max)
            det.on_virtual_scan(virt)
            det.on_scan(real, angles, pose, t)
        added = det.added_objects()
        assert len(added) > 0
        # detections cluster near the box at (1.5, 0.5)
        center = added.mean(axis=0)
        assert np.hypot(center[0] - 1.5, center[1] - 0.5) < 0.6
        # occluded wall segments behind the new box legitimately read as
        # "removed" (the reference behaves the same); but nothing near the
        # box itself may be flagged removed
        removed = det.removed_objects()
        if len(removed):
            d_box = np.hypot(removed[:, 0] - 1.5, removed[:, 1] - 0.5)
            assert d_box.min() > 1.0
        # stop seeing the object -> evidence decays away
        for _ in range(40):
            t += 0.2
            virt = vs.scan(*pose)
            real = render_lidar(scene_empty, *pose, angles,
                                LIDAR.range_min, LIDAR.range_max)
            det.on_virtual_scan(virt)
            det.on_scan(real, angles, pose, t)
        assert len(det.added_objects()) == 0

    def test_removed_object_detected(self):
        scene_box = cardboard_room()
        scene_empty = Scene(objects=())
        vs = VirtualScanner(LIDAR)
        vs.set_map(scene_box.occupancy_grid(0.05))  # map KNOWS the box
        det = ChangeDetector(ChangeDetectConfig(), LIDAR)
        angles = vs.angles()
        pose = (-1.0, -1.0, 0.5)
        t = 0.0
        for _ in range(20):
            t += 0.2
            virt = vs.scan(*pose)
            real = render_lidar(scene_empty, *pose, angles,
                                LIDAR.range_min, LIDAR.range_max)
            det.on_virtual_scan(virt)
            det.on_scan(real, angles, pose, t)
        removed = det.removed_objects()
        assert len(removed) > 0
        center = removed.mean(axis=0)
        assert np.hypot(center[0] - 1.5, center[1] - 0.5) < 0.6


class TestMerge:
    def test_smart_paste_respects_unknown_band(self):
        base = np.full((10, 10), 254, np.uint8)
        over = np.full((10, 10), 205, np.uint8)   # all unknown
        over[2, 2] = 0                            # one known occupied pixel
        over[3, 3] = 209                          # inside the +/-5 band
        out = smart_paste(base, over, 0, 0, 10, 10)
        assert out[2, 2] == 0
        assert out[3, 3] == 254  # unknown band not pasted

    def test_out_of_bounds_rect_noop(self):
        base = np.full((10, 10), 254, np.uint8)
        over = np.zeros((10, 10), np.uint8)
        out = smart_paste(base, over, 5, 5, 10, 10)
        assert (out == 254).all()

    def test_selective_merge_regions(self):
        old = np.full((20, 20), 254, np.uint8)
        new = np.zeros((20, 20), np.uint8)
        out = selective_merge(old, new, [(0, 0, 5, 5), (10, 10, 4, 4)])
        assert (out[:5, :5] == 0).all()
        assert (out[10:14, 10:14] == 0).all()
        assert out[7, 7] == 254
        assert (old == 254).all()  # input untouched


class TestHybrid:
    def test_map_cloud_pixel_math(self):
        img = np.full((10, 8), 254, np.uint8)
        img[7, 2] = 0
        grid = OccupancyGrid2D.from_pgm(img, 0.05, (-1.0, -2.0))
        pts, cols = map_to_cloud(grid)
        assert pts.shape == (1, 3)
        np.testing.assert_allclose(pts[0], [-1.0 + 2 * 0.05,
                                            -2.0 + 2 * 0.05, 0.0], atol=1e-6)
        np.testing.assert_allclose(cols[0], [0.2, 0.2, 0.2])

    def test_build_hybrid_map(self, tmp_path, rng):
        img = np.full((20, 20), 254, np.uint8)
        img[5:8, 5:8] = 0
        grid = OccupancyGrid2D.from_pgm(img, 0.05, (0.0, 0.0))
        obj_dir = str(tmp_path / "objs")
        obj = rng.standard_normal((50, 3)).astype(np.float32)
        tio.write_ply(obj_dir + "/Object_0.ply", obj)
        pts, cols = build_hybrid_map(grid, obj_dir)
        assert len(pts) == 9 + 50
        # objects painted red
        np.testing.assert_allclose(cols[9:], [[1.0, 0.0, 0.0]] * 50)

    def test_manual_alignment(self, tmp_path):
        obj_dir = str(tmp_path / "objs")
        obj = np.zeros((10, 3), np.float32)
        tio.write_ply(obj_dir + "/Object_0.ply", obj)
        img = np.full((4, 4), 254, np.uint8)
        grid = OccupancyGrid2D.from_pgm(img, 0.05, (0.0, 0.0))
        pts, _ = build_hybrid_map(grid, obj_dir,
                                  alignments={"Object_0.ply": (0.5, -0.25, 90.0)})
        np.testing.assert_allclose(pts[:, 0], 0.5, atol=1e-6)
        np.testing.assert_allclose(pts[:, 1], -0.25, atol=1e-6)


class TestStaticWallFilter:
    def test_walls_gated_objects_pass(self):
        from otslam_tpu.mapping.object_filter import StaticWallFilter
        from otslam_tpu.sim.world import Box, Scene

        # room walls (large components) + one removable box (small)
        scene = Scene(objects=(Box((1.0, 1.0, 0.15), (0.5, 0.4, 0.3), 0.0,
                                   (0.7, 0.7, 0.7), "box"),))
        grid = scene.occupancy_grid(0.05)
        f = StaticWallFilter(grid)
        pts = np.array([
            [1.0, 1.0],          # on the removable box -> kept
            [0.0, 0.0],          # open floor -> kept
            [0.0, 4.99],         # at the north wall face -> dropped
            [4.99, 4.99],        # wall corner smear -> dropped
            [50.0, 50.0],        # off-grid -> kept (pass-through)
        ], np.float32)
        out = f.filter(pts)
        kept = {tuple(p) for p in out.round(2)}
        assert (1.0, 1.0) in kept and (0.0, 0.0) in kept
        assert (50.0, 50.0) in kept
        assert (0.0, 4.99) not in kept and (4.99, 4.99) not in kept
