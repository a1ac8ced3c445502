"""Pose refinement: frame-to-model ICP tracking (KinectFusion-style).

BASELINE config 3 — "point-to-plane ICP pose refinement + trajectory eval vs
GT": capture poses from odometry/TF drift; before fusing, each frame
registers against the surface extracted from the volume built so far, and
its extrinsic is corrected. The reference has no equivalent (it trusts TF);
this is the TPU-native upgrade path for real-robot data.

Loop shape: host iterates frames (each step is a handful of fused device
dispatches: backproject + sparse model extraction + point-to-plane ICP +
block integration).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from otslam_tpu.config import ReconstructionConfig
from otslam_tpu.core.camera import PinholeIntrinsics
from otslam_tpu.core.se3 import invert_se3
from otslam_tpu.kernels.icp import icp_point_to_plane, icp_point_to_point
from otslam_tpu.kernels.tsdf_block import (
    extract_surface_points_sparse, integrate_frames_sparse,
    make_block_volume)


@dataclass
class RefineResult:
    extrinsics: np.ndarray               # (N, 4, 4) corrected world->camera
    volume: object                       # final BlockTSDFVolume
    fitness: List[float] = field(default_factory=list)
    rmse: List[float] = field(default_factory=list)


def _frame_points(depth, intr: PinholeIntrinsics, stride: int = 4,
                  max_points: int = 8192, max_depth: float = 4.0):
    """Subsampled camera-frame points of a depth frame (padded + mask)."""
    d = depth[::stride, ::stride]
    H, W = d.shape
    us = (jnp.arange(W) * stride).astype(jnp.float32)
    vs = (jnp.arange(H) * stride).astype(jnp.float32)
    uu, vv = jnp.meshgrid(us, vs)
    x = (uu - intr.cx) / intr.fx * d
    y = (vv - intr.cy) / intr.fy * d
    pts = jnp.stack([x, y, d], -1).reshape(-1, 3)
    mask = ((d > 0) & (d < max_depth)).reshape(-1)
    if pts.shape[0] > max_points:
        pts = pts[:max_points]
        mask = mask[:max_points]
    return pts, mask


def _frame_points_normals(depth, intr: PinholeIntrinsics, stride: int = 4,
                          max_depth: float = 4.0):
    """Camera-frame points + normals from depth-image gradients.

    Normal = normalize(cross(dP/du, dP/dv)); exact for planar surfaces,
    invalid across depth discontinuities (masked by a gradient gate).
    """
    d = depth[::stride, ::stride]
    H, W = d.shape
    us = (jnp.arange(W) * stride).astype(jnp.float32)
    vs = (jnp.arange(H) * stride).astype(jnp.float32)
    uu, vv = jnp.meshgrid(us, vs)
    P = jnp.stack([(uu - intr.cx) / intr.fx * d,
                   (vv - intr.cy) / intr.fy * d, d], -1)   # (H, W, 3)
    du = jnp.roll(P, -1, axis=1) - P
    dv = jnp.roll(P, -1, axis=0) - P
    n = jnp.cross(du, dv)
    ln = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.where(ln > 1e-12, ln, 1.0)
    smooth = (jnp.linalg.norm(du, axis=-1) < 0.1) & (
        jnp.linalg.norm(dv, axis=-1) < 0.1)
    valid = (d > 0) & (d < max_depth) & smooth
    # zero the wrap-around borders
    valid = valid.at[-1, :].set(False).at[:, -1].set(False)
    return (P.reshape(-1, 3), n.reshape(-1, 3), valid.reshape(-1))


def refine_trajectory(depths, colors, extrinsics, intr: PinholeIntrinsics,
                      cfg: ReconstructionConfig, max_active: int = 2048,
                      thresholds=(0.1, 0.05, 0.02), stride: int = 4,
                      trust_translation: float = 0.15, trust_rot: float = 0.15,
                      interpret: bool | None = None) -> RefineResult:
    """Frame-to-frame point-to-plane tracking, then fusion with the
    corrected poses.

    Each frame registers against its predecessor (both full-frustum views —
    large overlap, no volume cropping) using normals from the predecessor's
    depth gradients. The correspondence threshold anneals coarse-to-fine:
    partially-overlapping view pairs bias wide-threshold ICP, so each stage
    re-solves with a tighter gate starting from the previous stage's pose.
    Relative corrections compose along the chain; frame 0 anchors it.

    depths (N,H,W) f32 meters, colors (N,H,W,3) [0,255], extrinsics (N,4,4)
    world->camera priors (e.g. drifting odometry).
    """
    del interpret  # fusion backend selected below is XLA-sparse
    n = depths.shape[0]
    out_ext = [np.asarray(extrinsics[0], np.float64)]
    fitness, rmses = [], []

    prev_pts, prev_nrm, prev_valid = _frame_points_normals(
        jnp.asarray(depths[0]), intr, stride)
    for i in range(1, n):
        cur_pts, cur_nrm, cur_valid = _frame_points_normals(
            jnp.asarray(depths[i]), intr, stride)
        # prior relative transform camera_i -> camera_{i-1}
        E_prev = np.asarray(extrinsics[i - 1], np.float64)
        E_cur = np.asarray(extrinsics[i], np.float64)
        Tr_prior = E_prev @ invert_se3(E_cur)
        src = cur_pts @ jnp.asarray(Tr_prior[:3, :3].T, jnp.float32) \
            + jnp.asarray(Tr_prior[:3, 3], jnp.float32)
        T_acc = jnp.eye(4, dtype=jnp.float32)
        res = None
        for thr in thresholds:
            res = icp_point_to_plane(src, prev_pts, prev_nrm, threshold=thr,
                                     init=T_acc,
                                     src_mask=cur_valid, dst_mask=prev_valid,
                                     max_iterations=15, chunk=2048)
            T_acc = res.transformation
        dT = np.asarray(T_acc, np.float64)
        # trust region around the odometry prior: low-overlap pairs can score
        # a *wrong* pose higher (density sliding); corrections beyond
        # plausible per-step drift keep the prior instead of a confident lie
        d_rot = np.arccos(np.clip((np.trace(dT[:3, :3]) - 1) / 2, -1, 1))
        d_tr = np.linalg.norm(dT[:3, 3])
        if d_rot > trust_rot or d_tr > trust_translation:
            dT = np.eye(4)
        Tr = dT @ Tr_prior
        # E_i = Tr^{-1} E_{i-1}, chained through the corrected predecessor
        corrected = invert_se3(Tr) @ out_ext[-1]
        out_ext.append(corrected)
        fitness.append(float(res.fitness))
        rmses.append(float(res.inlier_rmse))
        prev_pts, prev_nrm, prev_valid = cur_pts, cur_nrm, cur_valid

    ext = np.stack(out_ext).astype(np.float32)
    vol = integrate_frames_sparse(
        make_block_volume(cfg.tsdf), jnp.asarray(depths),
        jnp.asarray(colors), jnp.asarray(ext), intr, max_active=max_active)
    return RefineResult(ext, vol, fitness, rmses)


def trajectory_error(ext_est, ext_gt):
    """(translation RMSE m, rotation RMSE rad) of camera poses given
    world->camera extrinsics (trajectory eval vs GT, BASELINE config 3)."""
    t_err, r_err = [], []
    for a, b in zip(np.asarray(ext_est), np.asarray(ext_gt)):
        Ta = invert_se3(a)
        Tb = invert_se3(b)
        t_err.append(np.linalg.norm(Ta[:3, 3] - Tb[:3, 3]) ** 2)
        dR = Ta[:3, :3].T @ Tb[:3, :3]
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1.0, 1.0))
        r_err.append(ang ** 2)
    return float(np.sqrt(np.mean(t_err))), float(np.sqrt(np.mean(r_err)))
