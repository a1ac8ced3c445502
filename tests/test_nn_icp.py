"""NN-distance and ICP kernels."""

import numpy as np
import jax.numpy as jnp

from otslam_tpu.core.se3 import euler_xyz_to_matrix, se3
from otslam_tpu.kernels.nn import nn_distance, chamfer_metrics
from otslam_tpu.kernels.icp import icp_point_to_point, icp_point_to_plane


class TestNN:
    def test_matches_bruteforce(self, rng):
        a = rng.standard_normal((300, 3)).astype(np.float32)
        b = rng.standard_normal((500, 3)).astype(np.float32)
        d, i = nn_distance(jnp.asarray(a), jnp.asarray(b), chunk=128,
                           with_index=True)
        full = np.linalg.norm(a[:, None] - b[None], axis=-1)
        np.testing.assert_allclose(np.asarray(d), full.min(1), atol=1e-3)
        np.testing.assert_array_equal(np.asarray(i), full.argmin(1))

    def test_masks(self, rng):
        a = rng.standard_normal((64, 3)).astype(np.float32)
        b = np.concatenate([a, np.full((64, 3), 100.0)]).astype(np.float32)
        bmask = np.arange(128) < 64
        d = nn_distance(jnp.asarray(a), jnp.asarray(b),
                        dst_mask=jnp.asarray(bmask), chunk=64)
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-3)
        # masked-out dst (identical garbage excluded): with mask inverted,
        # distances are large
        d2 = nn_distance(jnp.asarray(a), jnp.asarray(b),
                         dst_mask=jnp.asarray(~bmask), chunk=64)
        assert float(np.asarray(d2).min()) > 50

    def test_chamfer_symmetry(self, rng):
        a = rng.standard_normal((200, 3)).astype(np.float32)
        acc, comp = chamfer_metrics(jnp.asarray(a), jnp.asarray(a), chunk=64)
        assert float(acc) < 1e-3 and float(comp) < 1e-3


class TestICP:
    def test_point_to_point_recovers_pose(self, rng):
        src = rng.uniform(-1, 1, (1000, 3)).astype(np.float32)
        T_true = se3(euler_xyz_to_matrix(0.0, 0.0, 0.05), [0.03, -0.02, 0.01])
        dst = (src @ T_true[:3, :3].T + T_true[:3, 3]).astype(np.float32)
        res = icp_point_to_point(jnp.asarray(src), jnp.asarray(dst),
                                 threshold=0.3, max_iterations=30, chunk=256)
        np.testing.assert_allclose(np.asarray(res.transformation), T_true,
                                   atol=2e-3)
        assert float(res.fitness) > 0.99
        assert float(res.inlier_rmse) < 5e-3

    def test_point_to_plane_recovers_pose(self, rng):
        # points on 3 orthogonal planes (well-constrained for p2plane)
        n_per = 400
        pts, nrms = [], []
        for axis in range(3):
            p = rng.uniform(-1, 1, (n_per, 3))
            p[:, axis] = 0.0
            nr = np.zeros((n_per, 3)); nr[:, axis] = 1.0
            pts.append(p); nrms.append(nr)
        dst = np.concatenate(pts).astype(np.float32)
        normals = np.concatenate(nrms).astype(np.float32)
        T_true = se3(euler_xyz_to_matrix(0.02, -0.01, 0.03), [0.02, 0.01, -0.03])
        src = ((dst - T_true[:3, 3]) @ T_true[:3, :3]).astype(np.float32)
        res = icp_point_to_plane(jnp.asarray(src), jnp.asarray(dst),
                                 jnp.asarray(normals), threshold=0.3,
                                 max_iterations=30, chunk=256)
        np.testing.assert_allclose(np.asarray(res.transformation), T_true,
                                   atol=5e-3)

    def test_identity_on_aligned(self, rng):
        src = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
        res = icp_point_to_point(jnp.asarray(src), jnp.asarray(src),
                                 threshold=0.1, max_iterations=10, chunk=256)
        np.testing.assert_allclose(np.asarray(res.transformation), np.eye(4),
                                   atol=1e-4)
        assert int(res.iterations) <= 3


class TestNNPallas:
    """Fused Pallas NN kernel vs the XLA scan oracle (interpret mode)."""

    def test_matches_xla_path(self, rng):
        src = jnp.asarray(rng.uniform(-2, 2, (700, 3)).astype(np.float32))
        dst = jnp.asarray(rng.uniform(-2, 2, (900, 3)).astype(np.float32))
        d1, i1 = nn_distance(src, dst, with_index=True, impl="xla")
        d2, i2 = nn_distance(src, dst, with_index=True, impl="pallas")
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)

    def test_masks_and_empty_dst(self, rng):
        src = jnp.asarray(rng.uniform(-1, 1, (64, 3)).astype(np.float32))
        dst = jnp.asarray(rng.uniform(-1, 1, (128, 3)).astype(np.float32))
        dmask = jnp.asarray(np.arange(128) < 40)
        d1, i1 = nn_distance(src, dst, dst_mask=dmask, with_index=True,
                             impl="xla")
        d2, i2 = nn_distance(src, dst, dst_mask=dmask, with_index=True,
                             impl="pallas")
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        assert int(np.asarray(i2).max()) < 40
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)
        # fully-masked dst: sentinel distances survive on both paths
        none = jnp.zeros(128, bool)
        d3 = nn_distance(src, dst, dst_mask=none, impl="pallas")
        assert float(np.asarray(d3).min()) > 1e18
