"""2D occupancy mapping from scans (the slam_toolbox-replacement)."""

import numpy as np
import jax.numpy as jnp

from otslam_tpu.config import LidarConfig
from otslam_tpu.core import io as tio
from otslam_tpu.mapping.grid_mapper import GridMapper
from otslam_tpu.mapping.virtual_scan import VirtualScanner
from otslam_tpu.sim.sensors import render_lidar
from otslam_tpu.sim.world import cardboard_room, Scene

LIDAR = LidarConfig(num_beams=360)


def angles():
    return jnp.asarray(np.linspace(0, 2 * np.pi, 360, endpoint=False),
                       dtype=jnp.float32)


def survey_poses():
    out = []
    for x in (-3.0, 0.0, 3.0):
        for y in (-3.0, 0.0, 3.0):
            for yaw in (0.0, 1.57, 3.14, 4.71):
                out.append((x, y, yaw))
    return out


class TestGridMapper:
    def test_builds_correct_room_map(self, tmp_path):
        scene = cardboard_room()
        gm = GridMapper(extent=(-5.6, 5.6, -5.6, 5.6), resolution=0.1,
                        lidar=LIDAR)
        poses = survey_poses()
        rb = np.stack([np.asarray(render_lidar(scene, *p, angles(),
                                               LIDAR.range_min,
                                               LIDAR.range_max))
                       for p in poses])
        gm.add_trajectory(rb, angles(), np.asarray(poses, np.float32))
        grid = gm.to_grid()
        data = np.asarray(grid.data)
        occ_pts = grid.occupied_world_points()
        assert len(occ_pts) > 100

        # every occupied cell lies on real structure: near a wall or the box
        d_wall = np.minimum.reduce([
            np.abs(np.abs(occ_pts[:, 0]) - 5.0),
            np.abs(np.abs(occ_pts[:, 1]) - 5.0)])
        d_box = np.hypot(occ_pts[:, 0] - 1.5, occ_pts[:, 1] - 0.5)
        on_structure = (d_wall < 0.25) | (d_box < 0.6)
        assert on_structure.mean() > 0.97

        # the box shows up
        assert (d_box < 0.6).sum() > 3
        # interior free space is mapped free, not unknown
        ih, iw = data.shape[0] // 2, data.shape[1] // 2
        assert data[ih, iw] == 0

        # save -> reload -> usable as a virtual-scan map
        gm.save(str(tmp_path / "map.pgm"), str(tmp_path / "map.yaml"))
        meta = tio.read_map_yaml(str(tmp_path / "map.yaml"))
        img = tio.read_pgm(str(tmp_path / "map.pgm"))
        from otslam_tpu.core.grid import OccupancyGrid2D
        g2 = OccupancyGrid2D.from_pgm(img, meta["resolution"],
                                      tuple(meta["origin"][:2]))
        np.testing.assert_array_equal(np.asarray(g2.data), data)

    def test_mapped_room_drives_virtual_scan(self):
        """Initial-mapping loop closure: map built from scans of an empty
        room serves as the virtual map; a later scan with a new box then
        diffs against it correctly."""
        empty = Scene(objects=())
        gm = GridMapper(extent=(-5.6, 5.6, -5.6, 5.6), resolution=0.1,
                        lidar=LIDAR)
        poses = survey_poses()
        rb = np.stack([np.asarray(render_lidar(empty, *p, angles(),
                                               LIDAR.range_min,
                                               LIDAR.range_max))
                       for p in poses])
        gm.add_trajectory(rb, angles(), np.asarray(poses, np.float32))
        vs = VirtualScanner(LIDAR)
        vs.set_map(gm.to_grid())
        # virtual scan from the learned map vs the real empty-room scan
        virt = np.asarray(vs.scan(0.0, 0.0, 0.3))
        real = np.asarray(render_lidar(empty, 0.0, 0.0, 0.3,
                                       vs.angles(), LIDAR.range_min,
                                       LIDAR.range_max))
        both = np.isfinite(virt) & np.isfinite(real)
        assert both.mean() > 0.9
        assert np.abs(virt[both] - real[both]).max() < 0.3
