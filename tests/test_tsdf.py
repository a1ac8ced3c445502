"""TSDF fusion kernels vs. a tiny NumPy oracle (golden-value unit tests,
SURVEY.md §4(a))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otslam_tpu.config import TSDFConfig
from otslam_tpu.core.camera import PinholeIntrinsics
from otslam_tpu.kernels.tsdf import (
    make_volume, integrate_frame, integrate_frames, partial_integrate,
    merge_partials, extract_surface_points,
)
from otslam_tpu.kernels.backproject import filter_depth, backproject_pointcloud
from otslam_tpu.kernels.voxel import voxel_downsample
from otslam_tpu.kernels.sampling import resample_points

INTR = PinholeIntrinsics(width=64, height=48, fx=56.0, fy=56.0, cx=32.0, cy=24.0)
CFG = TSDFConfig(voxel_size=0.02, sdf_trunc=0.08, dims=(64, 64, 64),
                 origin=(-0.64, -0.64, -0.64))


def numpy_tsdf_oracle(cfg, depth, extrinsic, intr):
    """Straightforward per-voxel reference implementation."""
    X, Y, Z = cfg.dims
    xs = cfg.origin[0] + (np.arange(X) + 0.5) * cfg.voxel_size
    ys = cfg.origin[1] + (np.arange(Y) + 0.5) * cfg.voxel_size
    zs = cfg.origin[2] + (np.arange(Z) + 0.5) * cfg.voxel_size
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    pts = np.stack([gx, gy, gz, np.ones_like(gx)], -1).reshape(-1, 4)
    cam = (extrinsic @ pts.T).T[:, :3]
    z = cam[:, 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.round(intr.fx * cam[:, 0] / z + intr.cx).astype(int)
        v = np.round(intr.fy * cam[:, 1] / z + intr.cy).astype(int)
    valid = (z > 0) & (u >= 0) & (u < intr.width) & (v >= 0) & (v < intr.height)
    d = np.zeros(len(pts))
    d[valid] = depth[v[valid], u[valid]]
    sdf = d - z
    valid &= (d > 0) & (sdf >= -cfg.sdf_trunc)
    tsdf = np.minimum(sdf / cfg.sdf_trunc, 1.0)
    tsdf[~valid] = 0.0
    return tsdf.reshape(X, Y, Z), valid.reshape(X, Y, Z).astype(np.float32)


def make_wall_frame(depth_val=0.5):
    """Camera at origin looking +z (identity extrinsic), wall at z=depth."""
    depth = np.full((INTR.height, INTR.width), depth_val, np.float32)
    color = np.full((INTR.height, INTR.width, 3), 128.0, np.float32)
    extrinsic = np.eye(4, dtype=np.float32)
    return depth, color, extrinsic


class TestIntegrate:
    def test_single_frame_matches_numpy_oracle(self):
        depth, color, ext = make_wall_frame()
        vol = make_volume(CFG)
        vol = integrate_frame(vol, jnp.asarray(depth), jnp.asarray(color),
                              jnp.asarray(ext), INTR)
        t_ref, w_ref = numpy_tsdf_oracle(CFG, depth, ext, INTR)
        np.testing.assert_allclose(np.asarray(vol.weight), w_ref, atol=0)
        np.testing.assert_allclose(np.asarray(vol.tsdf), t_ref, atol=1e-5)

    def test_two_frames_running_mean(self):
        d1, c1, ext = make_wall_frame(0.5)
        d2, _, _ = make_wall_frame(0.52)
        c2 = np.full_like(c1, 64.0)
        vol = make_volume(CFG)
        vol = integrate_frame(vol, jnp.asarray(d1), jnp.asarray(c1),
                              jnp.asarray(ext), INTR)
        vol = integrate_frame(vol, jnp.asarray(d2), jnp.asarray(c2),
                              jnp.asarray(ext), INTR)
        t1, w1 = numpy_tsdf_oracle(CFG, d1, ext, INTR)
        t2, w2 = numpy_tsdf_oracle(CFG, d2, ext, INTR)
        both = (w1 > 0) & (w2 > 0)
        expect = (t1 + t2) / 2.0
        np.testing.assert_allclose(np.asarray(vol.tsdf)[both], expect[both],
                                   atol=1e-5)
        # color running mean: (128 + 64)/2 = 96 where both frames observed
        np.testing.assert_allclose(np.asarray(vol.color)[0][both], 96.0, atol=1e-4)

    def test_batched_scan_equals_sequential(self):
        frames = [make_wall_frame(0.4 + 0.05 * i) for i in range(4)]
        depths = jnp.asarray(np.stack([f[0] for f in frames]))
        colors = jnp.asarray(np.stack([f[1] for f in frames]))
        exts = jnp.asarray(np.stack([f[2] for f in frames]))
        vol_seq = make_volume(CFG)
        for f in frames:
            vol_seq = integrate_frame(vol_seq, jnp.asarray(f[0]),
                                      jnp.asarray(f[1]), jnp.asarray(f[2]), INTR)
        vol_bat = integrate_frames(make_volume(CFG), depths, colors, exts, INTR)
        np.testing.assert_allclose(np.asarray(vol_bat.tsdf),
                                   np.asarray(vol_seq.tsdf), atol=1e-6)
        np.testing.assert_allclose(np.asarray(vol_bat.weight),
                                   np.asarray(vol_seq.weight), atol=0)

    def test_partial_sums_equal_scan(self):
        frames = [make_wall_frame(0.4 + 0.05 * i) for i in range(4)]
        depths = jnp.asarray(np.stack([f[0] for f in frames]))
        colors = jnp.asarray(np.stack([f[1] for f in frames]))
        exts = jnp.asarray(np.stack([f[2] for f in frames]))
        # two "shards" of 2 frames combined by addition == full batch
        p1 = partial_integrate(depths[:2], colors[:2], exts[:2], INTR, CFG)
        p2 = partial_integrate(depths[2:], colors[2:], exts[2:], INTR, CFG)
        merged = merge_partials(*(a + b for a, b in zip(p1, p2)), CFG)
        vol = integrate_frames(make_volume(CFG), depths, colors, exts, INTR)
        np.testing.assert_allclose(np.asarray(merged.tsdf),
                                   np.asarray(vol.tsdf), atol=1e-5)
        np.testing.assert_allclose(np.asarray(merged.weight),
                                   np.asarray(vol.weight), atol=0)


class TestExtract:
    def test_wall_surface_recovered_within_voxel(self):
        depth, color, ext = make_wall_frame(0.5)
        vol = integrate_frames(make_volume(CFG),
                               jnp.asarray(depth)[None], jnp.asarray(color)[None],
                               jnp.asarray(ext)[None], INTR)
        pts, cols, mask = extract_surface_points(vol, capacity=200_000)
        pts = np.asarray(pts)[np.asarray(mask)]
        assert len(pts) > 100
        # surface points cluster at z = 0.5 within half a voxel
        assert np.abs(np.median(pts[:, 2]) - 0.5) < CFG.voxel_size
        assert np.percentile(np.abs(pts[:, 2] - 0.5), 95) < CFG.voxel_size

    def test_normals_point_along_view_axis(self):
        depth, color, ext = make_wall_frame(0.5)
        vol = integrate_frames(make_volume(CFG),
                               jnp.asarray(depth)[None], jnp.asarray(color)[None],
                               jnp.asarray(ext)[None], INTR)
        pts, cols, mask, normals = extract_surface_points(
            vol, capacity=200_000, with_normals=True)
        nz = np.asarray(normals)[np.asarray(mask)][:, 2]
        assert np.mean(np.abs(nz) > 0.9) > 0.9  # wall normal is +/- z

    def test_resample_deterministic(self):
        pts = jnp.asarray(np.arange(300, dtype=np.float32).reshape(100, 3))
        mask = jnp.arange(100) < 60
        s1, _, _ = resample_points(jax.random.PRNGKey(0), pts, mask, 1000)
        s2, _, _ = resample_points(jax.random.PRNGKey(0), pts, mask, 1000)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        # only valid rows sampled
        assert np.asarray(s1)[:, 0].max() < 60 * 3


class TestBackproject:
    def test_filter_depth(self):
        d = jnp.asarray([[0.5, 3.5], [jnp.nan, -1.0]])
        out = np.asarray(filter_depth(d, 3.0))
        np.testing.assert_allclose(out, [[0.5, 0.0], [0.0, 0.0]])

    def test_backproject_wall(self):
        depth, color, _ = make_wall_frame(2.0)
        pc = backproject_pointcloud(jnp.asarray(depth),
                                    jnp.asarray(color, dtype=jnp.uint8), INTR)
        pts, cols = pc.to_numpy()
        np.testing.assert_allclose(pts[:, 2], 2.0)
        # center pixel ~ optical axis
        center = pts[24 * 64 + 32]
        assert abs(center[0]) < 0.05 and abs(center[1]) < 0.05

    def test_backproject_world_frame(self):
        depth, color, _ = make_wall_frame(1.0)
        T = np.eye(4, dtype=np.float32); T[:3, 3] = [10.0, 0.0, 0.0]
        pc = backproject_pointcloud(jnp.asarray(depth), None, INTR,
                                    extrinsic_inv=jnp.asarray(T))
        pts, _ = pc.to_numpy()
        np.testing.assert_allclose(pts[:, 0].mean(), 10.0, atol=0.2)


class TestVoxelDownsample:
    def test_matches_bucket_mean_oracle(self, rng):
        pts = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
        voxel = 0.25
        ds_pts, _, mask = voxel_downsample(jnp.asarray(pts), voxel)
        ds = np.asarray(ds_pts)[np.asarray(mask)]
        # oracle: bucket means
        mins = pts.min(0)
        keys = np.floor((pts - mins) / voxel).astype(int)
        uniq, inv = np.unique(keys, axis=0, return_inverse=True)
        means = np.zeros((len(uniq), 3))
        np.add.at(means, inv, pts)
        counts = np.bincount(inv)
        means /= counts[:, None]
        assert len(ds) == len(uniq)
        # compare as sorted sets
        ds_sorted = ds[np.lexsort(ds.T)]
        means_sorted = means[np.lexsort(means.T)]
        np.testing.assert_allclose(ds_sorted, means_sorted, atol=1e-4)

    def test_respects_mask_and_colors(self, rng):
        pts = np.zeros((10, 3), np.float32)
        pts[5:] = 100.0  # far bucket, but masked out
        mask = np.arange(10) < 5
        cols = np.ones((10, 3), np.float32) * 0.5
        ds_pts, ds_cols, out_mask = voxel_downsample(
            jnp.asarray(pts), 1.0, mask=jnp.asarray(mask), colors=jnp.asarray(cols))
        valid = np.asarray(out_mask)
        assert valid.sum() == 1
        np.testing.assert_allclose(np.asarray(ds_pts)[valid][0], 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ds_cols)[valid][0], 0.5, atol=1e-6)
