"""Legacy mission variants kept in the reference tree (SURVEY.md C12/C13):

* static scripted goal lists (system_manager goal_list.hpp),
* adaptive-count / degree-step visiting-point placement
  (object_goal_selector.cpp, multi_object_goal_selector.cpp),
* removed-object single-check-point selection
  (removed_object_goal_selector.cpp).
"""

import numpy as np

from otslam_tpu.config import CameraConfig, LidarConfig, OTSLAMConfig, \
    TrackerConfig
from otslam_tpu.mission import (
    GoalData, RemovedCheckConfig, as_targets, bfs_clusters,
    default_goal_list, load_goal_list, nearest_check_point, save_goal_list,
    visiting_points)
from otslam_tpu.mission.goal_queue import decode_marker_id
from otslam_tpu.mission.tracker import TrackedCluster
from otslam_tpu.sim.runner import MissionRunner
from otslam_tpu.sim.world import Scene


class TestVisitingModes:
    def small(self):
        return TrackedCluster(1.0, 2.0, 0.3, 0.3, 0.8, 0, 0, True)

    def big(self):
        # bbox diagonal 1.7 m > scan_step_threshold 1.0
        return TrackedCluster(0.0, 0.0, 1.2, 1.2, 1.5, 0, 0, True)

    def test_adaptive_count_small_vs_big(self):
        """object_goal_selector.cpp:247-255 — 6 points for small objects,
        8 for big, ids obj*10+i."""
        cfg = TrackerConfig(visiting_mode="adaptive-count")
        vps = visiting_points([self.small(), self.big()], cfg)
        per_obj = {0: [p for p in vps if p.object_id == 0],
                   1: [p for p in vps if p.object_id == 1]}
        assert len(per_obj[0]) == cfg.points_count_normal == 6
        assert len(per_obj[1]) == cfg.points_count_big == 8
        assert [p.unique_id for p in per_obj[0]] == list(range(6))
        assert [p.unique_id for p in per_obj[1]] == [10 + i for i in range(8)]
        # legacy id encoding decodes with stride 10
        assert decode_marker_id(per_obj[1][3].unique_id, False,
                                id_stride=10) == 1
        # uniform full circle at the visiting radius, facing center
        c = self.small()
        r = c.lock_radius + cfg.visiting_point_buffer
        for i, p in enumerate(per_obj[0]):
            ang = 2 * np.pi * i / 6
            np.testing.assert_allclose(
                [p.x, p.y], [c.cx + r * np.cos(ang), c.cy + r * np.sin(ang)],
                atol=1e-6)
            assert np.isclose(p.yaw, ang + np.pi)

    def test_degree_step_count_and_spacing(self):
        """multi_object_goal_selector.cpp:245-261 — ceil(360/deg) points at a
        fixed angular interval, ids obj*100+i."""
        cfg = TrackerConfig(visiting_mode="degree-step",
                            degree_visiting_points=10.0)
        vps = visiting_points([self.small()], cfg)
        assert len(vps) == 36
        for i, p in enumerate(vps):
            assert p.unique_id == i
        # angular spacing is exactly the configured step (not 2*pi/n)
        a0 = np.arctan2(vps[1].y - 2.0, vps[1].x - 1.0)
        a1 = np.arctan2(vps[2].y - 2.0, vps[2].x - 1.0)
        np.testing.assert_allclose(np.rad2deg(a1 - a0), 10.0, atol=1e-6)

    def test_degree_step_ceil_semantics(self):
        # 7-degree step: 360/7 = 51.43 -> 52 points (the last lands closer)
        cfg = TrackerConfig(visiting_mode="degree-step",
                            degree_visiting_points=7.0)
        assert len(visiting_points([self.small()], cfg)) == 52

    def test_unknown_mode_rejected(self):
        cfg = TrackerConfig(visiting_mode="spiral")
        try:
            visiting_points([self.small()], cfg)
        except ValueError as e:
            assert "spiral" in str(e)
        else:
            raise AssertionError("expected ValueError")


class TestGoalList:
    def test_default_matches_reference_header(self):
        """goal_list.hpp:16-22 placeholder entries."""
        goals = default_goal_list()
        assert [(g.id, g.label, g.x, g.y, g.theta) for g in goals] == [
            (1, "kitchen_point", 1.5, 0.0, 0.0),
            (2, "living_chair", 2.0, 2.0, 90.0),
            (3, "entrance", -1.0, 0.5, 180.0)]

    def test_save_load_roundtrip(self, tmp_path):
        path = tmp_path / "goals.txt"
        save_goal_list(default_goal_list(), path)
        assert load_goal_list(path) == default_goal_list()

    def test_as_targets_converts_degrees(self):
        t = as_targets([GoalData(7, "x", 1.0, 2.0, 90.0)])[0]
        assert (t.unique_id, t.object_id) == (7, 7)
        np.testing.assert_allclose(t.yaw, np.pi / 2)

    def test_static_mission_executes_all_goals_nearest_first(self, tmp_path):
        cam = CameraConfig(width=160, height=120, fx=141.4002, fy=141.4002,
                           cx=80.5, cy=60.5)
        runner = MissionRunner(
            scene_map=Scene(objects=()), scene_world=Scene(objects=()),
            workdir=str(tmp_path),
            cfg=OTSLAMConfig(camera=cam, lidar=LidarConfig(num_beams=360)),
            start_pose=(-1.5, 0.5, 0.0))
        summary = runner.run_static(default_goal_list())
        assert summary.missions_completed == 3
        # start (-1.5, 0.5) is nearest "entrance" (-1.0, 0.5); from there
        # "kitchen_point" (1.5, 0) beats "living_chair" (2, 2)
        assert summary.capture_sequence == [
            "entrance", "kitchen_point", "living_chair"]
        # captures saved under the scripted labels
        assert (tmp_path / "dataset" / "poses" / "entrance_1.txt").exists()


class TestRemovedCheck:
    def two_clusters(self):
        rng = np.random.default_rng(0)
        a = rng.normal([0.0, 0.0], 0.05, (8, 2))
        b = rng.normal([4.0, 0.0], 0.05, (8, 2))
        return np.vstack([a, b])

    def test_bfs_clusters_splits_and_gates(self):
        pts = self.two_clusters()
        cl = bfs_clusters(pts, 0.4, 4)
        assert len(cl) == 2 and all(len(c) == 8 for c in cl)
        # min-size gate drops a 3-point clump (min is 4)
        small = np.array([[10.0, 0], [10.1, 0], [10.2, 0]])
        assert len(bfs_clusters(np.vstack([pts, small]), 0.4, 4)) == 2

    def test_bfs_chain_connectivity(self):
        # a chain of points each within thresh of the next is ONE cluster
        chain = np.array([[0.3 * i, 0.0] for i in range(10)])
        assert len(bfs_clusters(chain, 0.4, 4)) == 1

    def test_nearest_single_point_across_clusters(self):
        """removed_object_goal_selector.cpp:246-277 — ONE winner across all
        clusters, on the 0.6 m circle, facing the centroid."""
        cfg = RemovedCheckConfig()
        cp = nearest_check_point(self.two_clusters(), robot_xy=(5.5, 0.0),
                                 cfg=cfg)
        # robot is right of cluster b -> winner rings b at angle 0
        np.testing.assert_allclose(cp.centroid, [4.0, 0.0], atol=0.1)
        np.testing.assert_allclose(
            np.hypot(cp.x - cp.centroid[0], cp.y - cp.centroid[1]),
            cfg.goal_distance_from_center, atol=1e-6)
        # faces the centroid: yaw = angle + pi
        ang = np.arctan2(cp.y - cp.centroid[1], cp.x - cp.centroid[0])
        np.testing.assert_allclose(
            np.mod(cp.yaw - (ang + np.pi), 2 * np.pi), 0.0, atol=1e-6)

    def test_empty_and_gated_input(self):
        assert nearest_check_point(np.empty((0, 2)), (0, 0)) is None
        assert nearest_check_point(np.array([[0.0, 0.0]]), (0, 0)) is None
