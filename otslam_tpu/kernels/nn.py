"""Nearest-neighbor distances between point clouds (chamfer-style).

Reproduces Open3D ``compute_point_cloud_distance`` (used by the eval
protocol, eval_table_chair.py:106-119) as a tiled brute-force kernel: the
distance matrix is never materialized; target chunks stream through
``|a-b|^2 = |a|^2 + |b|^2 - 2 a.b`` with the cross-term on the MXU, and a
running (min, argmin) carry. 50k x 100k is a few GFLOP — trivial for TPU,
no KD-tree needed (KD-trees are pointer-chasing, the worst possible TPU
workload; brute-force matmul is the TPU-native design).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = jnp.float32(3.0e38)


@partial(jax.jit, static_argnames=("chunk", "with_index"))
def nn_distance(src: jnp.ndarray, dst: jnp.ndarray,
                src_mask: jnp.ndarray | None = None,
                dst_mask: jnp.ndarray | None = None,
                chunk: int = 4096, with_index: bool = False):
    """For each src point, distance to (and optionally index of) the nearest
    dst point.

    src (N,3), dst (M,3); masks select valid rows (padded clouds). Invalid
    src rows get distance 0 and index 0 (mask them downstream). Returns
    dists (N,) [, indices (N,)].
    """
    n = src.shape[0]
    m = dst.shape[0]
    pad = (-m) % chunk
    dstp = jnp.pad(dst, ((0, pad), (0, 0)))
    dmask = jnp.ones(m, bool) if dst_mask is None else dst_mask
    dmaskp = jnp.pad(dmask, (0, pad))

    s2 = jnp.sum(src * src, axis=-1)  # (N,)
    nchunks = dstp.shape[0] // chunk
    dst_c = dstp.reshape(nchunks, chunk, 3)
    msk_c = dmaskp.reshape(nchunks, chunk)

    def body(carry, inputs):
        best_d, best_i = carry
        d_chunk, m_chunk, base = inputs
        d2 = jnp.sum(d_chunk * d_chunk, axis=-1)  # (chunk,)
        # full-precision cross term: TPU MXU matmuls round to bf16 by
        # default, which corrupts argmin selection once point spacing is
        # finer than ~0.4% of coordinate magnitude
        cross = jax.lax.dot_general(
            src, d_chunk, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)  # (N, chunk) on the MXU
        dist2 = s2[:, None] + d2[None, :] - 2.0 * cross
        dist2 = jnp.where(m_chunk[None, :], dist2, _BIG)
        cmin = jnp.min(dist2, axis=1)
        carg = jnp.argmin(dist2, axis=1).astype(jnp.int32) + base
        take = cmin < best_d
        return (jnp.where(take, cmin, best_d),
                jnp.where(take, carg, best_i)), None

    # carry inherits the inputs' device-varying type (shard_map-compatible)
    zvar = (jnp.zeros((), jnp.float32) * src.reshape(-1)[0]
            * dst.reshape(-1)[0])
    init = (jnp.full(n, _BIG) + zvar, jnp.zeros(n, jnp.int32) + zvar.astype(jnp.int32))
    bases = jnp.arange(nchunks, dtype=jnp.int32) * chunk
    (best_d, best_i), _ = jax.lax.scan(body, init, (dst_c, msk_c, bases))

    # the |a|^2+|b|^2-2ab expansion loses ~1e-7 relative to cancellation
    # (~3e-4 m at meter scale); recompute the winning pair's distance exactly
    smask = jnp.ones(n, bool) if src_mask is None else src_mask
    nearest = jnp.take(dstp, best_i, axis=0)
    diff = src - nearest
    exact = jnp.sum(diff * diff, axis=-1)
    exact = jnp.where(best_d >= _BIG, best_d, exact)  # no valid dst at all
    dists = jnp.sqrt(jnp.maximum(jnp.where(smask, exact, 0.0), 0.0))
    if with_index:
        return dists, jnp.where(smask, best_i, 0)
    return dists


@partial(jax.jit, static_argnames=("chunk",))
def chamfer_metrics(map_pts: jnp.ndarray, gt_pts: jnp.ndarray,
                    map_mask: jnp.ndarray | None = None,
                    gt_mask: jnp.ndarray | None = None,
                    chunk: int = 4096):
    """(accuracy, completeness) in meters: mean NN distance map->gt and
    gt->map over valid points (eval_table_chair.py:106-119; x100 for cm)."""
    d_mg = nn_distance(map_pts, gt_pts, map_mask, gt_mask, chunk=chunk)
    d_gm = nn_distance(gt_pts, map_pts, gt_mask, map_mask, chunk=chunk)
    mm = jnp.ones(map_pts.shape[0], bool) if map_mask is None else map_mask
    gm = jnp.ones(gt_pts.shape[0], bool) if gt_mask is None else gt_mask
    acc = jnp.sum(d_mg * mm) / jnp.maximum(jnp.sum(mm), 1)
    comp = jnp.sum(d_gm * gm) / jnp.maximum(jnp.sum(gm), 1)
    return acc, comp
