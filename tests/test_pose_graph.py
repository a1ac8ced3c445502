"""SE(3) lie-group ops and pose-graph optimization (kernels/pose_graph.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otslam_tpu.kernels.pose_graph import exp_se3, log_se3, optimize_pose_graph


class TestSE3Ops:
    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(0, 0.5, (32, 6)).astype(np.float32))
        back = log_se3(exp_se3(xi))
        assert float(jnp.max(jnp.abs(back - xi))) < 1e-5

    def test_small_angle_roundtrip(self):
        for th in (0.0, 1e-7, 1e-5, 1e-4, 2e-3):
            xi = jnp.asarray(np.array([th, 0, 0, 0.1, -0.05, 0.02],
                                      np.float32))
            back = log_se3(exp_se3(xi))
            assert bool(jnp.all(jnp.isfinite(back)))
            assert float(jnp.max(jnp.abs(back - xi))) < 1e-5, th

    def test_exp_is_rigid(self, rng):
        xi = jnp.asarray(rng.normal(0, 1.0, (8, 6)).astype(np.float32))
        T = np.asarray(exp_se3(xi))
        for t in T:
            assert np.allclose(t[:3, :3] @ t[:3, :3].T, np.eye(3), atol=1e-5)
            assert np.allclose(np.linalg.det(t[:3, :3]), 1.0, atol=1e-5)
            assert np.allclose(t[3], [0, 0, 0, 1])

    def test_jacobian_finite_at_identity(self):
        """jacfwd through exp/log must not produce NaN at zero rotation
        (sqrt'(0) / arccos'(1) are the classic traps) — the pose-graph GN
        step depends on this."""
        J = jax.jacfwd(lambda x: log_se3(exp_se3(x)))(jnp.zeros(6))
        assert bool(jnp.all(jnp.isfinite(J)))
        assert bool(jnp.allclose(J, jnp.eye(6), atol=1e-4))


def _circle_graph(n, rng, t_sigma=0.01, with_loop=True):
    """GT poses on a circle, exact relative edges, drifted initial chain."""
    gt = []
    for i in range(n):
        a = 2 * np.pi * i / n
        c, s = np.cos(a), np.sin(a)
        T = np.eye(4)
        T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        T[:3, 3] = [2 * c, 2 * s, 0.0]
        gt.append(T)
    gt = np.stack(gt).astype(np.float32)
    ei = list(range(n - 1))
    ej = list(range(1, n))
    Z = [np.linalg.inv(gt[i]) @ gt[i + 1] for i in range(n - 1)]
    if with_loop:
        ei.append(0)
        ej.append(n - 1)
        Z.append(np.linalg.inv(gt[0]) @ gt[n - 1])
    w = np.ones(len(ei), np.float32)
    noisy = [gt[0]]
    for i in range(n - 1):
        dxi = rng.normal(0, t_sigma, 6).astype(np.float32)
        noisy.append(noisy[-1] @ Z[i] @ np.asarray(exp_se3(jnp.asarray(dxi))))
    return (gt, np.stack(noisy).astype(np.float32),
            np.array(ei, np.int32), np.array(ej, np.int32),
            np.stack(Z).astype(np.float32), w)


class TestPoseGraph:
    def test_loop_closure_recovers_circle(self, rng):
        gt, noisy, ei, ej, Z, w = _circle_graph(40, rng)
        err0 = np.linalg.norm(noisy[:, :3, 3] - gt[:, :3, 3], axis=1).mean()
        res = optimize_pose_graph(jnp.asarray(noisy), jnp.asarray(ei),
                                  jnp.asarray(ej), jnp.asarray(Z),
                                  jnp.asarray(w))
        opt = np.asarray(res.poses)
        err1 = np.linalg.norm(opt[:, :3, 3] - gt[:, :3, 3], axis=1).mean()
        assert float(res.residual_rmse) < float(res.initial_rmse) * 0.2
        assert err1 < err0 * 0.2, (err0, err1)

    def test_anchor_fixed(self, rng):
        gt, noisy, ei, ej, Z, w = _circle_graph(20, rng)
        res = optimize_pose_graph(jnp.asarray(noisy), jnp.asarray(ei),
                                  jnp.asarray(ej), jnp.asarray(Z),
                                  jnp.asarray(w))
        opt = np.asarray(res.poses)
        assert np.allclose(opt[0], noisy[0], atol=1e-3)

    def test_zero_weight_edges_ignored(self, rng):
        """Padding edges (weight 0) must not affect the solution."""
        gt, noisy, ei, ej, Z, w = _circle_graph(16, rng)
        res_a = optimize_pose_graph(jnp.asarray(noisy), jnp.asarray(ei),
                                    jnp.asarray(ej), jnp.asarray(Z),
                                    jnp.asarray(w))
        # append garbage edges with zero weight
        ei2 = np.concatenate([ei, [3, 7]]).astype(np.int32)
        ej2 = np.concatenate([ej, [12, 1]]).astype(np.int32)
        Zg = np.stack([np.eye(4, dtype=np.float32)] * 2)
        Z2 = np.concatenate([Z, Zg])
        w2 = np.concatenate([w, [0.0, 0.0]]).astype(np.float32)
        res_b = optimize_pose_graph(jnp.asarray(noisy), jnp.asarray(ei2),
                                    jnp.asarray(ej2), jnp.asarray(Z2),
                                    jnp.asarray(w2))
        assert np.allclose(np.asarray(res_a.poses), np.asarray(res_b.poses),
                           atol=1e-4)
        # all-ZERO Z padding (singular — inv() would be non-finite) must be
        # equally inert, per the docstring's "0 disables an edge" contract
        Z3 = np.concatenate([Z, np.zeros((2, 4, 4), np.float32)])
        res_c = optimize_pose_graph(jnp.asarray(noisy), jnp.asarray(ei2),
                                    jnp.asarray(ej2), jnp.asarray(Z3),
                                    jnp.asarray(w2))
        assert np.isfinite(float(res_c.residual_rmse))
        assert np.allclose(np.asarray(res_a.poses), np.asarray(res_c.poses),
                           atol=1e-4)

    def test_consistent_graph_stays_put(self, rng):
        """A graph whose poses already satisfy every edge must not move."""
        gt, _, ei, ej, Z, w = _circle_graph(12, rng)
        res = optimize_pose_graph(jnp.asarray(gt), jnp.asarray(ei),
                                  jnp.asarray(ej), jnp.asarray(Z),
                                  jnp.asarray(w))
        moved = np.linalg.norm(
            np.asarray(res.poses)[:, :3, 3] - gt[:, :3, 3], axis=1)
        assert moved.max() < 1e-3
