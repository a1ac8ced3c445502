"""Direct TSDF frame-to-model tracking + loop-closed trajectory refinement.

Covers kernels/track.py (trilinear SDF sampling, projective GN tracking) and
the pipeline variants refine_trajectory_f2m / refine_trajectory_pgo against
the frame-to-frame chain baseline, per the round-2 goal: frame-to-model must
beat the chain's trajectory RMSE by >=2x on a long drifting-odometry circle
and close the loop (first/last-frame consistency).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from otslam_tpu.config import CameraConfig, ReconstructionConfig, TSDFConfig
from otslam_tpu.core.camera import PinholeIntrinsics
from otslam_tpu.core.se3 import euler_xyz_to_matrix, invert_se3, se3
from otslam_tpu.kernels.track import sample_tsdf_trilinear, track_frame_to_tsdf
from otslam_tpu.kernels.tsdf_block import (integrate_frames_sparse,
                                           make_block_volume)
from otslam_tpu.pipeline.refine import (_frame_points, refine_trajectory,
                                        refine_trajectory_f2m,
                                        refine_trajectory_pgo,
                                        trajectory_error)
from otslam_tpu.sim.sensors import look_at_pose, render_rgbd
from otslam_tpu.sim.world import cardboard_room

CAM = CameraConfig(width=160, height=120, fx=141.4002, fy=141.4002,
                   cx=80.5, cy=60.5)
CFG = ReconstructionConfig(
    camera=CAM,
    tsdf=TSDFConfig(dims=(128, 128, 64), origin=(0.9, -0.1, -0.1)),
    surface_samples=30000)


def make_captures(n):
    scene = cardboard_room()
    intr = PinholeIntrinsics.from_config(CAM)
    depths, colors, exts = [], [], []
    for i in range(n):
        a = 2 * np.pi * i / n
        eye = np.array([1.5 + 1.1 * np.cos(a), 0.5 + 1.1 * np.sin(a), 0.5])
        pose = look_at_pose(eye, np.array([1.5, 0.5, 0.15]))
        d, c = render_rgbd(scene, pose, intr, far=5.0)
        depths.append(np.asarray(d))
        colors.append(np.asarray(c))
        exts.append(np.linalg.inv(pose))
    return (np.stack(depths), np.stack(colors),
            np.stack(exts).astype(np.float32))


def perturb(exts, seed=0, t_sigma=0.008, r_sigma=0.005):
    """Compounding per-step odometry drift (frame 0 exact)."""
    rng = np.random.default_rng(seed)
    out = [exts[0]]
    drift = np.eye(4)
    for e in exts[1:]:
        dR = euler_xyz_to_matrix(*rng.normal(0, r_sigma, 3))
        drift = se3(dR, rng.normal(0, t_sigma, 3)) @ drift
        out.append((drift @ e).astype(np.float32))
    return np.stack(out)


class TestSampleTSDF:
    def test_surface_points_near_zero(self):
        intr = PinholeIntrinsics.from_config(CAM)
        depths, colors, exts = make_captures(10)
        vol = integrate_frames_sparse(
            make_block_volume(CFG.tsdf), jnp.asarray(depths),
            jnp.asarray(colors), jnp.asarray(exts), intr, max_active=1024)
        # backproject frame 0 at GT: sampled |sdf*trunc| should be ~voxel
        pts, mask = _frame_points(jnp.asarray(depths[0]), intr, stride=4)
        T = invert_se3(exts[0].astype(np.float64)).astype(np.float32)
        q = pts @ jnp.asarray(T[:3, :3].T) + jnp.asarray(T[:3, 3])
        s, g, ok = sample_tsdf_trilinear(vol, q)
        sel = np.asarray(ok & mask & (jnp.abs(s) < 0.95))
        assert sel.sum() > 300
        dist = np.asarray(s)[sel] * CFG.tsdf.sdf_trunc
        assert np.sqrt((dist ** 2).mean()) < CFG.tsdf.voxel_size

    def test_floor_gradient_is_up(self):
        intr = PinholeIntrinsics.from_config(CAM)
        depths, colors, exts = make_captures(6)
        vol = integrate_frames_sparse(
            make_block_volume(CFG.tsdf), jnp.asarray(depths),
            jnp.asarray(colors), jnp.asarray(exts), intr, max_active=1024)
        # sample just above OPEN floor (south strip, clear of the box whose
        # footprint spans x 1.25-1.75, y 0.3-0.7)
        xs = np.linspace(1.1, 1.9, 8)
        ys = np.linspace(0.0, 0.12, 8)
        pts = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2)
        q = jnp.asarray(np.concatenate(
            [pts, np.full((len(pts), 1), 0.005)], -1).astype(np.float32))
        s, g, ok = sample_tsdf_trilinear(vol, q)
        g = np.asarray(g)[np.asarray(ok)]
        assert len(g) > 10
        n = g / np.linalg.norm(g, axis=1, keepdims=True)
        # floor normal (gradient of signed distance) points +z
        assert (n[:, 2] > 0.9).mean() > 0.8

    def test_unobserved_space_invalid(self):
        vol = make_block_volume(CFG.tsdf)
        q = jnp.asarray([[1.5, 0.5, 0.2], [99.0, 0.0, 0.0]], jnp.float32)
        _, _, ok = sample_tsdf_trilinear(vol, q)
        assert not bool(ok[0])   # empty volume: nothing observed
        assert not bool(ok[1])   # out of bounds


class TestTrackFrame:
    def test_recovers_perturbed_pose(self):
        intr = PinholeIntrinsics.from_config(CAM)
        depths, colors, exts = make_captures(12)
        vol = integrate_frames_sparse(
            make_block_volume(CFG.tsdf), jnp.asarray(depths),
            jnp.asarray(colors), jnp.asarray(exts), intr,
            max_active=1024)
        T_gt = invert_se3(exts[5].astype(np.float64))
        rng = np.random.default_rng(3)
        for _ in range(3):
            T_prior = se3(euler_xyz_to_matrix(*rng.normal(0, 0.01, 3)),
                          rng.normal(0, 0.015, 3)) @ T_gt
            pts, mask = _frame_points(jnp.asarray(depths[5]), intr, stride=2)
            res = track_frame_to_tsdf(vol, pts, mask,
                                      jnp.asarray(T_prior, jnp.float32),
                                      max_iterations=15)
            T = np.asarray(res.transformation, np.float64)
            t_err = np.linalg.norm(T[:3, 3] - T_gt[:3, 3])
            r_err = np.arccos(np.clip(
                (np.trace(T[:3, :3].T @ T_gt[:3, :3]) - 1) / 2, -1, 1))
            assert t_err < 0.008, t_err
            assert r_err < 0.006, r_err
            assert float(res.rmse) < 0.005

    def test_tracking_is_deterministic_fixed_point(self):
        """Tracking FROM the ground-truth pose must stay at it."""
        intr = PinholeIntrinsics.from_config(CAM)
        depths, colors, exts = make_captures(12)
        vol = integrate_frames_sparse(
            make_block_volume(CFG.tsdf), jnp.asarray(depths),
            jnp.asarray(colors), jnp.asarray(exts), intr,
            max_active=1024)
        T_gt = invert_se3(exts[5].astype(np.float64))
        pts, mask = _frame_points(jnp.asarray(depths[5]), intr, stride=2)
        res = track_frame_to_tsdf(vol, pts, mask,
                                  jnp.asarray(T_gt, jnp.float32),
                                  max_iterations=15)
        T = np.asarray(res.transformation, np.float64)
        assert np.linalg.norm(T[:3, 3] - T_gt[:3, 3]) < 0.006


@pytest.mark.slow
class TestTrajectoryRefinement:
    def test_f2m_bounds_drift(self):
        intr = PinholeIntrinsics.from_config(CAM)
        depths, colors, exts_gt = make_captures(30)
        noisy = perturb(exts_gt)
        t0, r0 = trajectory_error(noisy, exts_gt)
        res = refine_trajectory_f2m(depths, colors, noisy, intr, CFG,
                                    max_active=1024, stride=4)
        t1, r1 = trajectory_error(res.extrinsics, exts_gt)
        assert t1 < t0 * 0.7, (t0, t1)
        assert max(res.rmse) < 0.01

    def test_pgo_beats_chain_2x_and_closes_loop(self):
        """The round-2 acceptance test: 100-frame drifting circle; the
        loop-closed pipeline must beat the frame-to-frame chain's
        translation RMSE by >=2x and the first/last relative pose must
        match GT (loop consistency)."""
        intr = PinholeIntrinsics.from_config(CAM)
        n = 100
        depths, colors, exts_gt = make_captures(n)
        noisy = perturb(exts_gt, seed=1, t_sigma=0.005, r_sigma=0.003)
        t0, r0 = trajectory_error(noisy, exts_gt)

        chain = refine_trajectory(depths, colors, noisy, intr, CFG,
                                  max_active=1024, stride=4)
        tc, rc = trajectory_error(chain.extrinsics, exts_gt)

        pgo = refine_trajectory_pgo(depths, colors, noisy, intr, CFG,
                                    max_active=1024, stride=4,
                                    min_gap=n // 2, loop_radius=0.5,
                                    max_loop_pairs=8)
        tp, rp = trajectory_error(pgo.extrinsics, exts_gt)

        assert tp < tc * 0.5, (tc, tp)       # >=2x better than the chain
        assert tp < t0 * 0.6, (t0, tp)       # and much better than odometry

        # loop consistency: est relative pose first->last vs GT
        def rel(ext):
            a = invert_se3(ext[0].astype(np.float64))
            b = invert_se3(ext[-1].astype(np.float64))
            return np.linalg.inv(a) @ b

        gt_rel = rel(exts_gt)
        for name, ext, bound in (("noisy", noisy, None),
                                 ("pgo", pgo.extrinsics, 0.03)):
            d = rel(ext) @ np.linalg.inv(gt_rel)
            err = np.linalg.norm(d[:3, 3])
            if bound is not None:
                assert err < bound, (name, err)
            else:
                noisy_gap = err
        assert noisy_gap > 0.05              # the drift was material
