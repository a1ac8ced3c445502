"""C++ mission runtime vs the Python control plane: identical semantics."""

import numpy as np
import pytest

from otslam_tpu.config import MissionConfig, TrackerConfig
from otslam_tpu.adapters.native_mission import (
    NativeGoalSender, NativeObjectTracker, load_mission_native)
from otslam_tpu.mission.goal_queue import GoalSender
from otslam_tpu.mission.tracker import ObjectTracker, TrackedCluster
from otslam_tpu.mission.visiting import visiting_points

pytestmark = pytest.mark.skipif(load_mission_native() is None,
                                reason="no native toolchain")


def random_scenario(seed, steps=40):
    """A random stream of change-point clouds (two drifting blobs + noise)."""
    rng = np.random.default_rng(seed)
    clouds = []
    for k in range(steps):
        pts = []
        for (cx, cy) in ((2.0 + 0.01 * k, 1.0), (-3.0, -2.0 + 0.005 * k)):
            if rng.random() < 0.9:
                m = rng.integers(5, 20)
                ang = rng.uniform(0, 2 * np.pi, m)
                rad = rng.uniform(0.1, 0.35, m)
                pts.append(np.stack([cx + rad * np.cos(ang),
                                     cy + rad * np.sin(ang)], -1))
        clouds.append(np.concatenate(pts) if pts else np.zeros((0, 2)))
    return clouds


class TestTrackerParity:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_python_tracker(self, seed):
        cfg = TrackerConfig(cluster_distance_threshold=1.0,
                            min_cluster_points=5,
                            wall_thickness_threshold=0.2,
                            stability_time=1.0, lock_margin=0.5)
        py = ObjectTracker(cfg)
        cc = NativeObjectTracker(cfg)
        t = 0.0
        for cloud in random_scenario(seed):
            t += 0.2
            py.update(cloud, t)
            cc.update(cloud, t)
        assert len(cc.stable_objects) == len(py.stable_objects)
        ps = sorted((s.cx, s.cy, s.width, s.height)
                    for s in py.stable_objects)
        cs = sorted((s.cx, s.cy, s.width, s.height)
                    for s in cc.stable_objects)
        # the Python tracker clusters in f32 (JAX kernel), the C++ in f64
        np.testing.assert_allclose(cs, ps, atol=1e-5)

    def test_freeze_parity(self):
        cfg = TrackerConfig(min_cluster_points=3, stability_time=0.5)
        cc = NativeObjectTracker(cfg)
        cc.set_tracking_mode(False)
        for i in range(10):
            cc.update(np.random.default_rng(0).uniform(0, 1, (10, 2)),
                      0.2 * (i + 1))
        assert len(cc.stable_objects) == 0
        assert not cc.tracking_enabled


class TestSenderParity:
    def drive(self, sender, points, odometry):
        """Run the queue to exhaustion, teleporting to each goal."""
        visits = []
        sender.on_added_points(points)
        sender.on_odom(*odometry)
        for _ in range(100):
            g = sender.control_step()
            if g is None and sender.pending_count() == 0:
                break
            if g is not None:
                visits.append((g.unique_id, g.object_id))
                sender.on_odom(g.x, g.y)
                sender.on_added_points(points)
        return visits

    @pytest.mark.parametrize("start", [(0.0, 0.0), (4.5, 0.2), (-2.0, 3.0)])
    def test_identical_visit_order(self, start):
        cfg = TrackerConfig()
        objs = [TrackedCluster(0.0, 0.0, 0.5, 0.5, 1.0, 0, 0, True),
                TrackedCluster(5.0, 0.0, 0.4, 0.6, 1.1, 0, 0, True),
                TrackedCluster(-1.0, 4.0, 0.3, 0.3, 0.8, 0, 0, True)]
        pts = visiting_points(objs, cfg)
        py_visits = self.drive(GoalSender(MissionConfig()), pts, start)
        cc_visits = self.drive(NativeGoalSender(MissionConfig()), pts, start)
        assert py_visits == cc_visits
        assert len({u for u, _ in py_visits}) == len(pts)

    def test_removed_merge_parity(self):
        cfg = TrackerConfig()
        added = visiting_points(
            [TrackedCluster(1.0, 0.0, 0.5, 0.5, 1.0, 0, 0, True)], cfg)
        removed = visiting_points(
            [TrackedCluster(-4.0, 0.0, 0.5, 0.5, 1.0, 0, 0, True)], cfg,
            removed=True)
        py = GoalSender(MissionConfig())
        cc = NativeGoalSender(MissionConfig())
        for s in (py, cc):
            s.on_added_points(added)
            s.on_removed_points(removed)
            s.on_odom(0.0, 0.0)
        order_py, order_cc = [], []
        for s, order in ((py, order_py), (cc, order_cc)):
            for _ in range(60):
                g = s.control_step()
                if g is None and s.pending_count() == 0:
                    break
                if g is not None:
                    order.append((g.unique_id, g.is_removed))
                    s.on_odom(g.x, g.y)
                    s.on_added_points(added)
                    s.on_removed_points(removed)
        assert order_py == order_cc
        assert any(r for _, r in order_py)  # removed points were visited too
