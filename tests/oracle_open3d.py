"""Slow, obviously-correct NumPy transcription of Open3D's TSDF semantics.

The BASELINE acceptance bound ("point clouds within 1 mm RMSE of the Open3D
reference") was previously asserted only by an ``open3d``-gated golden test
that skips where open3d is not installed. This module makes the contract
executable everywhere by transcribing the *documented* behavior of the exact
pipeline the reference runs (``/root/reference/3d_model/reconstruct_rgbd.py:
79-118``): ``ScalableTSDFVolume(voxel_length=0.01, sdf_trunc=0.04,
color_type=RGB8)``, RGBD frames built with ``depth_scale=1000`` /
``depth_trunc=3.0``, per-frame ``volume.integrate(rgbd, intrinsic,
extrinsic)``, surface extraction.

Transcribed semantics (Open3D ``UniformTSDFVolume::Integrate`` /
``ExtractPointCloud``, which ``ScalableTSDFVolume`` applies per 16^3 volume
unit — behavior, not code):

integrate, per voxel with center ``p = origin + (idx + 0.5) * voxel``:
  1. camera point ``pc = extrinsic @ [p, 1]``; skip if ``pc.z <= 0``.
  2. pixel ``u = round(fx*pc.x/pc.z + cx)``, ``v = round(...)``;
     skip if outside the image.
  3. ``d = depth[v, u]``; skip if ``d <= 0`` (invalid or beyond
     depth_trunc, which the RGBD constructor zeroes).
  4. ``sdf = (d - pc.z) * multiplier(u, v)`` where ``multiplier`` is
     Open3D's depth-to-camera-distance image
     ``sqrt(((u-cx)/fx)^2 + ((v-cy)/fy)^2 + 1)`` (converts the z-depth
     difference to distance along the viewing ray).
  5. if ``sdf > -sdf_trunc``: ``t_obs = min(sdf / sdf_trunc, 1)``; running
     means ``tsdf = (tsdf*w + t_obs) / (w+1)``, RGB8 color likewise,
     ``w += 1``.

extract (zero-crossing surface points): for every voxel pair adjacent along
+x/+y/+z with both weights > 0 and ``tsdf0 * tsdf1 < 0``, emit the linear
interpolation ``p0 + (tsdf0 / (tsdf0 - tsdf1)) * voxel * axis``.

The repo's device paths intentionally omit the ray multiplier (step 4):
it rescales tsdf magnitudes but leaves the d == z zero set unchanged, and
adjacent voxels see near-identical multipliers, so crossing positions move
well under 1 mm — exactly the tolerance the BASELINE bound allows. Keeping
the multiplier HERE makes the oracle faithful to Open3D rather than to the
implementation under test.
"""

from __future__ import annotations

import numpy as np


def oracle_integrate(depths, colors, extrinsics, fx, fy, cx, cy,
                     origin, dims, voxel_size, sdf_trunc,
                     depth_trunc=3.0, ray_multiplier=True):
    """Integrate frames into a dense uniform TSDF grid, Open3D semantics.

    depths: (N, H, W) float meters (0 = invalid); colors: (N, H, W, 3)
    [0, 255]; extrinsics: (N, 4, 4) world->camera. Returns (tsdf, weight,
    color) arrays of shape dims / dims+(3,), float64.
    """
    X, Y, Z = dims
    H, W = depths.shape[1:]
    tsdf = np.zeros((X, Y, Z))
    weight = np.zeros((X, Y, Z))
    color = np.zeros((X, Y, Z, 3))

    ii, jj, kk = np.indices(dims)
    px = origin[0] + (ii + 0.5) * voxel_size
    py = origin[1] + (jj + 0.5) * voxel_size
    pz = origin[2] + (kk + 0.5) * voxel_size
    P = np.stack([px, py, pz, np.ones_like(px)], axis=-1)   # (X,Y,Z,4)

    for n in range(depths.shape[0]):
        d_img = np.where(depths[n] >= depth_trunc, 0.0,
                         depths[n]).astype(np.float64)
        E = extrinsics[n].astype(np.float64)
        pc = P @ E.T                                        # (X,Y,Z,4)
        z = pc[..., 2]
        in_front = z > 0
        zs = np.where(in_front, z, 1.0)
        u = np.round(fx * pc[..., 0] / zs + cx).astype(np.int64)
        v = np.round(fy * pc[..., 1] / zs + cy).astype(np.int64)
        in_img = in_front & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        uc = np.clip(u, 0, W - 1)
        vc = np.clip(v, 0, H - 1)
        d = d_img[vc, uc]
        if ray_multiplier:
            mult = np.sqrt(((uc - cx) / fx) ** 2
                           + ((vc - cy) / fy) ** 2 + 1.0)
        else:
            mult = 1.0
        sdf = (d - z) * mult
        valid = in_img & (d > 0) & (sdf > -sdf_trunc)
        t_obs = np.minimum(sdf / sdf_trunc, 1.0)
        c_obs = colors[n][vc, uc].astype(np.float64)

        w_new = weight + valid
        denom = np.maximum(w_new, 1.0)
        tsdf = np.where(valid, (tsdf * weight + t_obs) / denom, tsdf)
        color = np.where(valid[..., None],
                         (color * weight[..., None] + c_obs)
                         / denom[..., None], color)
        weight = w_new
    return tsdf, weight, color


def oracle_extract(tsdf, weight, origin, voxel_size):
    """Zero-crossing surface points of an oracle grid (Open3D
    extract_point_cloud semantics). Returns (M, 3) float64 points."""
    pts = []
    X, Y, Z = tsdf.shape
    for axis in range(3):
        sl0 = [slice(None)] * 3
        sl1 = [slice(None)] * 3
        sl0[axis] = slice(0, -1)
        sl1[axis] = slice(1, None)
        t0 = tsdf[tuple(sl0)]
        t1 = tsdf[tuple(sl1)]
        w0 = weight[tuple(sl0)]
        w1 = weight[tuple(sl1)]
        cross = (w0 > 0) & (w1 > 0) & (t0 * t1 < 0)
        idx = np.argwhere(cross)
        if len(idx) == 0:
            continue
        a = t0[cross]
        b = t1[cross]
        frac = a / (a - b)
        base = (idx + 0.5) * voxel_size + np.asarray(origin)
        off = np.zeros_like(base)
        off[:, axis] = frac * voxel_size
        pts.append(base + off)
    if not pts:
        return np.zeros((0, 3))
    return np.concatenate(pts)
