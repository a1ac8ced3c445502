"""NN-distance and ICP kernels."""

import numpy as np
import jax.numpy as jnp
import pytest

from otslam_tpu.core.se3 import euler_xyz_to_matrix, se3
from otslam_tpu.kernels.nn import (auto_nn_window, chamfer_metrics,
                                   nn_distance, nn_distance_radius)
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


class TestNNWindowed:
    """Radius-limited windowed NN kernel (nn_distance_radius, interpret
    mode): exact for every point with a neighbor within the radius, a
    lower-bounded estimate beyond it, and traced-fit fallback to the full
    kernel whenever the window assumption breaks."""

    RADIUS = 0.3

    def _clouds(self, rng, n=4096, m=16384, axis=2):
        src = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
        dst = rng.uniform(-2, 2, (m, 3)).astype(np.float32)
        return (src[np.argsort(src[:, axis])],
                dst[np.argsort(dst[:, axis])])

    def test_exact_within_radius_lower_bound_beyond(self, rng):
        src, dst = self._clouds(rng)
        W, axis = auto_nn_window(src, dst, self.RADIUS, axis=2)
        assert W < -(-dst.shape[0] // 1024), "workload must exercise windows"
        d_ref, i_ref = nn_distance(jnp.asarray(src), jnp.asarray(dst),
                                   with_index=True)
        d_win, i_win = nn_distance_radius(
            jnp.asarray(src), jnp.asarray(dst), self.RADIUS,
            window_chunks=W, axis=axis, with_index=True, interpret=True)
        d_ref, d_win = np.asarray(d_ref), np.asarray(d_win)
        inl = d_ref < self.RADIUS
        assert inl.any()
        np.testing.assert_allclose(d_win[inl], d_ref[inl], atol=1e-6)
        out = ~inl
        assert (d_win[out] >= d_ref[out] - 1e-6).all()
        assert (d_win[out] >= self.RADIUS - 1e-6).all()

    def test_fallback_on_unsorted_and_undersized(self, rng):
        src, dst = self._clouds(rng, n=1024, m=4096)
        d_ref = np.asarray(nn_distance(jnp.asarray(src), jnp.asarray(dst)))
        # unsorted dst: fit flag must route to the full kernel (exact
        # everywhere, not just within the radius)
        perm = rng.permutation(dst.shape[0])
        d_ref_p = np.asarray(nn_distance(jnp.asarray(src),
                                         jnp.asarray(dst[perm])))
        d_u = np.asarray(nn_distance_radius(
            jnp.asarray(src), jnp.asarray(dst[perm]), self.RADIUS,
            window_chunks=2, axis=2, interpret=True))
        np.testing.assert_allclose(d_u, d_ref_p, atol=1e-6)
        # sorted but window too small for the tile spans: same fallback
        d_s = np.asarray(nn_distance_radius(
            jnp.asarray(src), jnp.asarray(dst), self.RADIUS,
            window_chunks=1, axis=2, interpret=True))
        np.testing.assert_allclose(d_s, d_ref, atol=1e-6)

    def test_masks(self, rng):
        src, dst = self._clouds(rng, n=2048, m=8192)
        sm = rng.random(src.shape[0]) > 0.2
        dm = rng.random(dst.shape[0]) > 0.2
        W, axis = auto_nn_window(src, dst, self.RADIUS, axis=2)
        d_ref = np.asarray(nn_distance(jnp.asarray(src), jnp.asarray(dst),
                                       jnp.asarray(sm), jnp.asarray(dm)))
        d_win = np.asarray(nn_distance_radius(
            jnp.asarray(src), jnp.asarray(dst), self.RADIUS,
            jnp.asarray(sm), jnp.asarray(dm), window_chunks=W, axis=axis,
            interpret=True))
        inl = (d_ref < self.RADIUS) & sm
        np.testing.assert_allclose(d_win[inl], d_ref[inl], atol=1e-6)
        assert (d_win[~sm] == 0).all()

    def test_small_dst_uses_exact_path(self, rng):
        # guard: window covering the whole cloud short-circuits to the
        # plain exact kernel
        src, dst = self._clouds(rng, n=256, m=1500)
        d_ref = np.asarray(nn_distance(jnp.asarray(src), jnp.asarray(dst)))
        d_win = np.asarray(nn_distance_radius(
            jnp.asarray(src), jnp.asarray(dst), self.RADIUS,
            window_chunks=8, axis=2, interpret=True))
        np.testing.assert_allclose(d_win, d_ref, atol=1e-6)

    def test_oversize_dst_routes_to_xla_scan(self, rng, monkeypatch):
        # past _PALLAS_MAX_DST the VMEM-resident rhs cannot fit on the
        # chip; "auto"/radius paths must fall back to the HBM-chunked XLA
        # scan (exact everywhere). Shrink the cap so the route engages at
        # test scale; unique m keeps jit cache entries from aliasing runs
        # traced under the real cap.
        from otslam_tpu.kernels import nn as nn_mod

        monkeypatch.setattr(nn_mod, "_PALLAS_MAX_DST", 2048)
        src, dst = self._clouds(rng, n=512, m=3037)
        full = np.linalg.norm(
            src[:, None] - dst[None], axis=-1).min(1)
        d_radius = np.asarray(nn_distance_radius(
            jnp.asarray(src), jnp.asarray(dst), self.RADIUS,
            window_chunks=2, axis=2, interpret=True))
        np.testing.assert_allclose(d_radius, full, atol=1e-5)

    def test_vmem_params_sizing(self):
        from jax.experimental.pallas import tpu as pltpu

        from otslam_tpu.kernels.nn import _nn_vmem_params

        assert _nn_vmem_params(4096, interpret=False) == {}
        assert _nn_vmem_params(1 << 20, interpret=True) == {}
        params = _nn_vmem_params(1 << 20, interpret=False)
        cp = params["compiler_params"]
        assert isinstance(cp, pltpu.CompilerParams)
        # budget 3x the rhs: the scoped stack stages a layout copy of the
        # whole operand besides the resident buffer (measured 93.41 MB at
        # a 34.8 MB rhs)
        assert cp.vmem_limit_bytes == 3 * 24 * (1 << 20) * 4 + (8 << 20)


@pytest.mark.slow
class TestICPWindowed:
    """ICP with the windowed NN enabled matches the full-scan ICP."""

    def test_point_to_point_parity(self, rng):
        n = 12000
        src = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
        th = 0.02
        T_true = se3(euler_xyz_to_matrix(0.0, 0.0, th), [0.01, -0.02, 0.005])
        dst = (src @ T_true[:3, :3].T + T_true[:3, 3]).astype(np.float32)
        W, axis = auto_nn_window(src, dst, 0.3)
        assert W < -(-n // 1024), "workload must exercise windows"
        kw = dict(threshold=0.3, max_iterations=12, relative_fitness=0.0,
                  relative_rmse=0.0)
        ref = icp_point_to_point(jnp.asarray(src), jnp.asarray(dst), **kw)
        win = icp_point_to_point(jnp.asarray(src), jnp.asarray(dst),
                                 nn_window=W, nn_axis=axis,
                                 nn_interpret=True, **kw)
        np.testing.assert_allclose(np.asarray(win.transformation),
                                   np.asarray(ref.transformation), atol=1e-5)
        np.testing.assert_allclose(np.asarray(win.transformation), T_true,
                                   atol=2e-3)
        assert float(win.fitness) > 0.99

    def test_point_to_plane_parity(self, rng):
        n_per = 4000
        pts, nrms = [], []
        for axis in range(3):
            p = rng.uniform(-1, 1, (n_per, 3))
            p[:, axis] = 0.0
            nr = np.zeros((n_per, 3))
            nr[:, axis] = 1.0
            pts.append(p)
            nrms.append(nr)
        dst = np.concatenate(pts).astype(np.float32)
        normals = np.concatenate(nrms).astype(np.float32)
        T_true = se3(euler_xyz_to_matrix(0.02, -0.01, 0.03),
                     [0.02, 0.01, -0.03])
        src = ((dst - T_true[:3, 3]) @ T_true[:3, :3]).astype(np.float32)
        W, ax = auto_nn_window(src, dst, 0.3)
        res = icp_point_to_plane(jnp.asarray(src), jnp.asarray(dst),
                                 jnp.asarray(normals), threshold=0.3,
                                 max_iterations=20, nn_window=W, nn_axis=ax,
                                 nn_interpret=True)
        np.testing.assert_allclose(np.asarray(res.transformation), T_true,
                                   atol=5e-3)


class TestDstSlabbing:
    """Beyond _DST_SLAB rows the full Pallas kernel runs as a slab loop
    whose results min-combine (a 362k-row rhs = 93.4 MB scoped-vmem stack
    failed the remote compile during the mission headline; slabbing bounds
    the resident rhs at any cloud size)."""

    def test_slabbed_matches_single_slab_semantics(self, rng):
        import otslam_tpu.kernels.nn as nnmod
        from otslam_tpu.kernels.nn import _nn_min_pallas

        src = jnp.asarray(rng.standard_normal((100, 3)).astype(np.float32))
        dst = jnp.asarray(rng.standard_normal((700, 3)).astype(np.float32))
        mask = jnp.ones(700, bool)
        ref_d, ref_i = _nn_min_pallas(src, dst, mask, interpret=True)
        old = nnmod._DST_SLAB
        try:
            nnmod._DST_SLAB = 256   # force the slab loop
            got_d, got_i = _nn_min_pallas(src, dst, mask, interpret=True)
        finally:
            nnmod._DST_SLAB = old
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))
        np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d),
                                   rtol=1e-6)

    def test_slabbed_ties_prefer_lowest_index(self):
        import otslam_tpu.kernels.nn as nnmod
        from otslam_tpu.kernels.nn import _nn_min_pallas

        # duplicate dst points across slab boundary: index of the FIRST
        # must win, like the single-slab kernel's min-index rule
        src = jnp.zeros((8, 3), jnp.float32)
        dst = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32),
                       (600, 1))
        mask = jnp.ones(600, bool)
        old = nnmod._DST_SLAB
        try:
            nnmod._DST_SLAB = 256
            _, got_i = _nn_min_pallas(src, dst, mask, interpret=True)
        finally:
            nnmod._DST_SLAB = old
        np.testing.assert_array_equal(np.asarray(got_i), np.zeros(8, np.int32))
