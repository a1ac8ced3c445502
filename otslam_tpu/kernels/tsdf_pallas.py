"""Pallas TPU kernel for block-sparse TSDF integration.

Replaces the per-voxel depth/color image gather of kernels/tsdf_block.py
(XLA element-gathers run at ~90M elem/s on TPU — the fusion bottleneck) with
**one-hot matmul sampling on the MXU**:

  For each active 8^3 block, its 512 voxels project to pixels (u, v). A
  (patch_rows x DEPTH_WIN) slab of the depth image around the block's
  projected center is selected in two steps:

     M[r, n]  = sum_c patch[r, c] * onehot[c, n]       (MXU matmul)
     d[n]     = sum_r M[r, n] * onehot_v[r, n]         (VPU multiply-reduce)

  where ``onehot[c, n] = (u[n] - patch_u0 == c)``. Exactly one entry per
  column is 1, so the matmul *selects* — depth selection is bit-exact vs.
  the gather path (the f32 depth pre-splits into bf16 hi+lo parts, fused
  into one matmul by stacking the parts on rows).

Color is sampled the same way, either from a half-resolution bf16 pyramid
(default: color needs only ~1-pixel accuracy and half-res halves MXU time)
or at full resolution (color_res="full": reuses the depth one-hot, matches
the gather path exactly — Open3D integrates full-res RGB,
reconstruct_rgbd.py:99-107).

Block rows are pre-gathered to a compact (A, 512) working set outside the
kernel (row DMAs), the kernel updates them in place, and XLA row-scatters
them back.

Coverage: a (frame, block) pair is handled by the kernel iff the block's
projected corner bounds fit the depth slab (exact 8-corner test computed
batched outside). Pairs that do NOT fit — blocks nearer than ~0.4 m, or
straddling the camera plane — are integrated by an XLA gather fallback pass
(near_field="fallback", default), so close-range captures lose nothing; the
reference integrates them via Open3D (reconstruct_rgbd.py:107).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from otslam_tpu.core.camera import PinholeIntrinsics
from otslam_tpu.kernels.tsdf_block import (
    BLOCK, BLOCK_VOXELS, BlockTSDFVolume, _active_blocks, _sample_frame,
    _voxel_world_coords, compact_ids, pack_rgb,
)

BPG = 8  # blocks per grid step (amortizes per-step overhead)
DEPTH_WIN = 256  # aligned lane window (2 lane tiles); dynamic lane starts
# must be 128-multiples, so the guaranteed u-coverage is win - 128 centered


def _project(e, wx, wy, wz, intr):
    px = e[0] * wx + e[1] * wy + e[2] * wz + e[3]
    py = e[4] * wx + e[5] * wy + e[6] * wz + e[7]
    pz = e[8] * wx + e[9] * wy + e[10] * wz + e[11]
    zsafe = jnp.where(pz > 0, pz, 1.0)
    u = jnp.round(intr.fx * px / zsafe + intr.cx).astype(jnp.int32)
    v = jnp.round(intr.fy * py / zsafe + intr.cy).astype(jnp.int32)
    return u, v, pz


def _make_kernel(intr: PinholeIntrinsics, sdf_trunc: float,
                 patch_rows: int, color_rows: int, nb: int, fpc: int,
                 full_color: bool):
    """Kernel processing ``fpc`` frames per call: the per-block row DMAs and
    state writes are shared across the frames (the dominant non-matmul
    cost), while each frame contributes its own projection + selection +
    running-mean step, gated by a per-frame active flag (preserving the
    sequential creation semantics exactly).

    Voxel world coordinates arrive as pre-gathered (A, 512) rows (computed
    once per chunk in XLA — no per-block div/mod skeleton in the kernel),
    and depth arrives pre-split into bf16 hi/lo images.
    """
    H, W = intr.height, intr.width
    H2, W2 = H // 2, W // 2
    win = min(DEPTH_WIN, W)
    V = BLOCK_VOXELS

    def kernel(ids_ref, act_ref, pvf_ref, pvh_ref, puf_ref, e_ref,
               tsdf_ref, w_ref, col_ref, wx_ref, wy_ref, wz_ref,
               dhi_ref, dlo_ref, cimg_ref, tsdf_out, w_out, col_out):
        step = pl.program_id(0)
        A = ids_ref.shape[0]

        for j in range(BPG):
            k = step * BPG + j
            bid = ids_ref[k]

            @pl.when(bid < nb)
            def _():
                # --- shared per-block state (row DMAs already done) ---
                wxr = wx_ref[j, :].reshape(1, V)
                wyr = wy_ref[j, :].reshape(1, V)
                wzr = wz_ref[j, :].reshape(1, V)
                told = tsdf_ref[j, :].reshape(1, V)
                wold = w_ref[j, :].reshape(1, V)
                cold = [col_ref[j, c * V:(c + 1) * V].reshape(1, V)
                        for c in range(3)]

                for f in range(fpc):
                    e = [e_ref[f * 12 + q] for q in range(12)]
                    act = act_ref[f * A + k]
                    pvf = pl.multiple_of(pvf_ref[f * A + k], 8)
                    pvh = pl.multiple_of(pvh_ref[f * A + k], 8)
                    puf = pl.multiple_of(puf_ref[f * A + k], 128)

                    u_r, v_r, pz_r = _project(e, wxr, wyr, wzr, intr)

                    # --- depth selection (bf16 hi/lo, two matmuls) ---
                    # one-hot oriented (win, V): u on lanes broadcasts over
                    # a sublane iota — no column-oriented projection needed.
                    # hi and lo parts go through SEPARATE dots and add in
                    # f32: same MACs as a stacked operand but no concat copy
                    # and half the v-select multiply-reduce
                    iota_w = jax.lax.broadcasted_iota(
                        jnp.int32, (win, V), 0)
                    ou = ((u_r - puf) == iota_w).astype(jnp.bfloat16)
                    dims = (((1,), (0,)), ((), ()))

                    def sel_dot(slab):
                        return jax.lax.dot_general(
                            slab, ou, dims,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)

                    M = (sel_dot(dhi_ref[f, pl.ds(pvf, patch_rows),
                                         pl.ds(puf, win)])
                         + sel_dot(dlo_ref[f, pl.ds(pvf, patch_rows),
                                           pl.ds(puf, win)]))  # (pr, V)
                    iota_pr = jax.lax.broadcasted_iota(
                        jnp.int32, (patch_rows, V), 0)
                    ovT = ((v_r - pvf) == iota_pr).astype(jnp.float32)
                    d = jnp.sum(M * ovT, axis=0, keepdims=True)

                    # --- color selection (per-channel dots, no concat) ---
                    if full_color:
                        # full-res: reuse the depth one-hot, window, and ovT
                        iota_cr = iota_pr
                        ov_c = ovT
                        Mc = [sel_dot(cimg_ref[f,
                                               pl.ds(c * H + pvf, color_rows),
                                               pl.ds(puf, win)])
                              for c in range(3)]
                    else:
                        # half-res bf16 pyramid, whole-width lanes
                        iota_wh = jax.lax.broadcasted_iota(
                            jnp.int32, (W2, V), 0)
                        ouh = ((u_r // 2) == iota_wh).astype(jnp.bfloat16)
                        iota_cr = jax.lax.broadcasted_iota(
                            jnp.int32, (color_rows, V), 0)
                        ov_c = (((v_r // 2) - pvh) == iota_cr
                                ).astype(jnp.float32)
                        Mc = [jax.lax.dot_general(
                            cimg_ref[f, pl.ds(c * H2 + pvh, color_rows), :],
                            ouh, dims, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
                            for c in range(3)]
                    csel = [jnp.sum(Mc[c] * ov_c, axis=0, keepdims=True)
                            for c in range(3)]

                    # --- running-mean step, gated by the frame's activity ---
                    in_img = ((pz_r > 0) & (u_r >= 0) & (u_r < W)
                              & (v_r >= 0) & (v_r < H))
                    sdf = d - pz_r
                    valid = in_img & (d > 0) & (sdf >= -sdf_trunc)
                    tsdf_obs = jnp.where(
                        valid, jnp.minimum(sdf / sdf_trunc, 1.0), 0.0)
                    w_obs = valid.astype(jnp.float32) * (act > 0).astype(
                        jnp.float32)
                    w_new = wold + w_obs
                    denom = jnp.maximum(w_new, 1.0)
                    told = (told * wold + tsdf_obs * w_obs) / denom
                    cold = [(cold[c] * wold + csel[c] * w_obs) / denom
                            for c in range(3)]
                    wold = w_new

                tsdf_out[j, :] = told.reshape(V)
                w_out[j, :] = wold.reshape(V)
                for c in range(3):
                    col_out[j, c * V:(c + 1) * V] = cold[c].reshape(V)

    return kernel


FPC = 6  # frames per kernel call (share block row DMAs across frames)


@functools.partial(jax.jit, static_argnames=(
    "intr", "vol_meta", "patch_rows", "color_rows", "full_color",
    "interpret"))
def _update_active_blocks(tsdf_rows, w_rows, col_rows, wx_rows, wy_rows,
                          wz_rows, dhi, dlo, cimg,
                          ids, act, pvf, pvh, puf, evec,
                          intr: PinholeIntrinsics, vol_meta,
                          patch_rows: int, color_rows: int,
                          full_color: bool, interpret: bool = False):
    """Run the Pallas kernel over compact active-block rows for FPC frames.

    tsdf_rows/w_rows/wx/wy/wz_rows: (A, 512) f32; col_rows: (A, 1536) f32;
    dhi/dlo: (FPC, H, W) bf16; cimg: (FPC, 3*Hc, Wc) bf16;
    ids: (A,) i32; act/pvf/pvh/puf: (FPC*A,) i32 frame-major;
    evec: (FPC*12,) f32 (extrinsic rows 0..2 per frame).
    """
    grid_blocks, origin, voxel_size, sdf_trunc = vol_meta
    nb = grid_blocks[0] * grid_blocks[1] * grid_blocks[2]
    A = tsdf_rows.shape[0]
    assert A % BPG == 0
    fpc = dhi.shape[0]

    kernel = _make_kernel(intr, sdf_trunc, patch_rows, color_rows, nb, fpc,
                          full_color)
    row_spec = pl.BlockSpec((BPG, BLOCK_VOXELS), lambda i, *_: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(A // BPG,),
        in_specs=[
            row_spec,                                          # tsdf
            row_spec,                                          # weight
            pl.BlockSpec((BPG, 3 * BLOCK_VOXELS), lambda i, *_: (i, 0)),
            row_spec,                                          # wx
            row_spec,                                          # wy
            row_spec,                                          # wz
            pl.BlockSpec(memory_space=pltpu.VMEM),             # dhi
            pl.BlockSpec(memory_space=pltpu.VMEM),             # dlo
            pl.BlockSpec(memory_space=pltpu.VMEM),             # cimg
        ],
        out_specs=[
            row_spec,
            row_spec,
            pl.BlockSpec((BPG, 3 * BLOCK_VOXELS), lambda i, *_: (i, 0)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct(tsdf_rows.shape, tsdf_rows.dtype),
        jax.ShapeDtypeStruct(w_rows.shape, w_rows.dtype),
        jax.ShapeDtypeStruct(col_rows.shape, col_rows.dtype),
    ]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={6: 0, 7: 1, 8: 2},
        interpret=interpret,
    )(ids, act, pvf, pvh, puf, evec, tsdf_rows, w_rows, col_rows,
      wx_rows, wy_rows, wz_rows, dhi, dlo, cimg)


@functools.partial(jax.jit, static_argnames=("intr",))
def _max_active_needed(vol: BlockTSDFVolume, depths, extrinsics,
                       intr: PinholeIntrinsics):
    """Exact upper bound on the per-CHUNK union active-block count for a
    batch (the kernel processes FPC frames per call over their union):
    replays the creation recurrence (created |= band; active = created &
    visible) with a cumulative OR — one cheap batched dispatch."""
    nb = vol.num_blocks
    n = depths.shape[0]
    pad = (-n) % FPC
    if pad:
        depths = jnp.concatenate(
            [depths, jnp.zeros((pad,) + depths.shape[1:], depths.dtype)])
        extrinsics = jnp.concatenate(
            [extrinsics,
             jnp.tile(jnp.eye(4, dtype=extrinsics.dtype)[None], (pad, 1, 1))])
    band_all, visible_all = jax.vmap(
        lambda d, e: _active_blocks(vol, d, e, intr))(depths, extrinsics)
    created_cum = jax.lax.associative_scan(jnp.logical_or, band_all, axis=0)
    created_cum = created_cum | vol.created[:nb][None]
    active = created_cum & visible_all
    union = jnp.any(active.reshape(-1, FPC, nb), axis=1)
    return jnp.max(jnp.sum(union, axis=1))


def auto_max_active(vol: BlockTSDFVolume, depths, extrinsics,
                    intr: PinholeIntrinsics, bucket: int = 128) -> int:
    """Static capacity for integrate_frames_pallas, rounded up to `bucket`
    (larger buckets = fewer recompiles across batches)."""
    n = int(_max_active_needed(vol, jnp.asarray(depths),
                               jnp.asarray(extrinsics), intr))
    n = max(n, BPG)
    return -(-n // bucket) * bucket


def _corner_coverage(vol_meta, ids, E, intr: PinholeIntrinsics,
                     patch_rows: int, win: int, pvf, puf):
    """Exact per-(frame, block) slab-coverage test via the 8 block corners.

    covered == every voxel of the block that can land in the image is
    guaranteed to fall inside the (patch_rows x win) depth slab. A block
    with any corner behind the camera plane is not covered (projection
    unbounded) unless every corner is behind (then nothing integrates and
    it is trivially covered).
    """
    grid_blocks, origin, voxel_size, _ = vol_meta
    bx, by, bz = grid_blocks
    nb = bx * by * bz
    H, W = intr.height, intr.width
    idc = jnp.minimum(ids, nb - 1)
    ix = idc // (by * bz)
    iy = (idc // bz) % by
    iz = idc % bz
    f32 = jnp.float32
    lo = jnp.stack([origin[0] + ix.astype(f32) * (BLOCK * voxel_size),
                    origin[1] + iy.astype(f32) * (BLOCK * voxel_size),
                    origin[2] + iz.astype(f32) * (BLOCK * voxel_size)], -1)
    side = BLOCK * voxel_size
    umin = jnp.full(ids.shape, np.inf, f32)
    umax = jnp.full(ids.shape, -np.inf, f32)
    vmin = jnp.full(ids.shape, np.inf, f32)
    vmax = jnp.full(ids.shape, -np.inf, f32)
    n_behind = jnp.zeros(ids.shape, jnp.int32)
    for dx in (0.0, side):
        for dy in (0.0, side):
            for dz in (0.0, side):
                cx = lo[..., 0] + dx
                cy = lo[..., 1] + dy
                cz = lo[..., 2] + dz
                px = E[0, 0] * cx + E[0, 1] * cy + E[0, 2] * cz + E[0, 3]
                py = E[1, 0] * cx + E[1, 1] * cy + E[1, 2] * cz + E[1, 3]
                pz = E[2, 0] * cx + E[2, 1] * cy + E[2, 2] * cz + E[2, 3]
                behind = pz < 1e-3
                zs = jnp.where(behind, 1.0, pz)
                u = intr.fx * px / zs + intr.cx
                v = intr.fy * py / zs + intr.cy
                big = jnp.asarray(np.inf, f32)
                umin = jnp.minimum(umin, jnp.where(behind, big, u))
                umax = jnp.maximum(umax, jnp.where(behind, -big, u))
                vmin = jnp.minimum(vmin, jnp.where(behind, big, v))
                vmax = jnp.maximum(vmax, jnp.where(behind, -big, v))
                n_behind = n_behind + behind.astype(jnp.int32)
    # clip bounds to the image: off-image voxels are invalid in the kernel
    # anyway, so only the in-image span must fit the slab (+-1 px rounding)
    u_lo = jnp.clip(jnp.floor(umin) - 1, 0, W - 1)
    u_hi = jnp.clip(jnp.ceil(umax) + 1, 0, W - 1)
    v_lo = jnp.clip(jnp.floor(vmin) - 1, 0, H - 1)
    v_hi = jnp.clip(jnp.ceil(vmax) + 1, 0, H - 1)
    fits = ((u_lo >= puf) & (u_hi < puf + win)
            & (v_lo >= pvf) & (v_hi < pvf + patch_rows))
    off_image = (umax < 0) | (umin > W - 1) | (vmax < 0) | (vmin > H - 1)
    all_behind = n_behind == 8
    some_behind = n_behind > 0
    return jnp.where(all_behind | off_image, True, fits & ~some_behind)


@functools.partial(jax.jit, static_argnames=("intr", "vol_meta",
                                              "max_active", "full_color",
                                              "interpret"),
                   donate_argnums=(0, 1, 2))
def _integrate_core(tsdf, weight, color, created_in, depths, colors,
                    extrinsics, intr: PinholeIntrinsics, vol_meta,
                    max_active: int, full_color: bool,
                    interpret: bool = False):
    """The batched Pallas fusion pass. Returns updated (tsdf, weight, color,
    created). (frame, block) pairs failing the slab-coverage test are left
    untouched (handled by the caller's fallback pass)."""
    grid_blocks, origin, voxel_size, sdf_trunc = vol_meta
    nb = grid_blocks[0] * grid_blocks[1] * grid_blocks[2]
    H, W = depths.shape[1:]
    patch_rows = min(128, H)
    color_rows = patch_rows if full_color else min(64, H // 2)
    win = min(DEPTH_WIN, W)

    # pre-split bf16 depth (hi + lo rows reassemble exactly in the matmul)
    dhi_all = depths.astype(jnp.bfloat16)
    dlo_all = (depths - dhi_all.astype(jnp.float32)).astype(jnp.bfloat16)

    # quantize to integers first (pack_rgb truncation semantics — the gather
    # path stores uint8 channels); 0..255 integers are exact in bf16
    colors_q = jnp.clip(colors, 0, 255).astype(jnp.uint8)
    if full_color:
        cimg_all = (colors_q.transpose(0, 3, 1, 2)
                    .reshape(depths.shape[0], 3 * H, W).astype(jnp.bfloat16))
    else:
        cimg_all = (colors_q[:, ::2, ::2, :].transpose(0, 3, 1, 2)
                    .reshape(depths.shape[0], 3 * (H // 2), W // 2)
                    .astype(jnp.bfloat16))

    # the creation recurrence is independent of integration, so EVERYTHING
    # per-frame except the volume update itself precomputes batched outside
    # the scan: activity, created evolution (cumulative OR), per-chunk
    # union-active compaction, per-frame activity flags, patch starts, and
    # the exact coverage test
    n_frames = depths.shape[0]
    pad = (-n_frames) % FPC
    if pad:
        depths = jnp.concatenate(
            [depths, jnp.zeros((pad,) + depths.shape[1:], depths.dtype)])
        dhi_all = jnp.concatenate(
            [dhi_all, jnp.zeros((pad,) + dhi_all.shape[1:], dhi_all.dtype)])
        dlo_all = jnp.concatenate(
            [dlo_all, jnp.zeros((pad,) + dlo_all.shape[1:], dlo_all.dtype)])
        cimg_all = jnp.concatenate(
            [cimg_all, jnp.zeros((pad,) + cimg_all.shape[1:],
                                 cimg_all.dtype)])
        extrinsics = jnp.concatenate(
            [extrinsics,
             jnp.tile(jnp.eye(4, dtype=extrinsics.dtype)[None], (pad, 1, 1))])
    n_total = depths.shape[0]
    n_chunks = n_total // FPC

    dummy = BlockTSDFVolume(tsdf, weight, color, created_in, origin,
                            voxel_size, sdf_trunc, grid_blocks)
    band_all, visible_all = jax.vmap(
        lambda d, e: _active_blocks(dummy, d, e, intr))(depths, extrinsics)
    created_all = jax.lax.associative_scan(jnp.logical_or, band_all, axis=0)
    created_all = created_all | created_in[:nb][None]
    active_all = created_all & visible_all                     # (N, NB)

    # chunk-union compaction + per-frame flags at the union ids
    active_c = active_all.reshape(n_chunks, FPC, nb)
    union_c = jnp.any(active_c, axis=1)                        # (C, NB)
    ids_all = jax.vmap(lambda a: compact_ids(a, max_active, nb))(union_c)
    act_pad = jnp.concatenate(
        [active_c, jnp.zeros((n_chunks, FPC, 1), bool)], axis=-1)
    act_all = jax.vmap(
        lambda af, i: jnp.take(af, i, axis=1))(act_pad, ids_all)

    def starts(E, ids):
        bx, by, bz = grid_blocks
        idc = jnp.minimum(ids, nb - 1)
        half = 0.5 * BLOCK * voxel_size
        bcx = origin[0] + (idc // (by * bz)).astype(jnp.float32) \
            * (BLOCK * voxel_size) + half
        bcy = origin[1] + ((idc // bz) % by).astype(jnp.float32) \
            * (BLOCK * voxel_size) + half
        bcz = origin[2] + (idc % bz).astype(jnp.float32) \
            * (BLOCK * voxel_size) + half
        px = E[0, 0] * bcx + E[0, 1] * bcy + E[0, 2] * bcz + E[0, 3]
        py = E[1, 0] * bcx + E[1, 1] * bcy + E[1, 2] * bcz + E[1, 3]
        pz = E[2, 0] * bcx + E[2, 1] * bcy + E[2, 2] * bcz + E[2, 3]
        zs = jnp.where(pz > 0, pz, 1.0)
        uc = intr.fx * px / zs + intr.cx
        vc = intr.fy * py / zs + intr.cy
        # rounded down to sublane multiples of 8 / lane multiples of 128
        pvf = jnp.clip(jnp.round(vc).astype(jnp.int32) - patch_rows // 2,
                       0, H - patch_rows) & ~7
        pvh = jnp.clip(jnp.round(vc / 2).astype(jnp.int32)
                       - min(64, H // 2) // 2,
                       0, H // 2 - min(64, H // 2)) & ~7
        puf = jnp.clip((jnp.round(uc).astype(jnp.int32) - win // 2 + 64)
                       & ~127, 0, W - win)
        covered = _corner_coverage(vol_meta, ids, E, intr, patch_rows, win,
                                   pvf, puf)
        return pvf, pvh, puf, covered

    E_all = extrinsics.astype(jnp.float32).reshape(n_chunks, FPC, 4, 4)
    ids_rep = jnp.repeat(ids_all[:, None, :], FPC, axis=1)     # (C, FPC, A)
    pvf_all, pvh_all, puf_all, cov_all = jax.vmap(jax.vmap(starts))(
        E_all, ids_rep)
    act_kernel = (act_all & cov_all).astype(jnp.int32).reshape(
        n_chunks, FPC * max_active)
    pvf_all = pvf_all.reshape(n_chunks, FPC * max_active)
    pvh_all = pvh_all.reshape(n_chunks, FPC * max_active)
    puf_all = puf_all.reshape(n_chunks, FPC * max_active)
    evec_all = E_all[:, :, :3, :].reshape(n_chunks, FPC * 12)
    dhi_c = dhi_all.reshape((n_chunks, FPC) + dhi_all.shape[1:])
    dlo_c = dlo_all.reshape((n_chunks, FPC) + dlo_all.shape[1:])
    cimg_c = cimg_all.reshape((n_chunks, FPC) + cimg_all.shape[1:])

    # uncovered-pair mask at full-frame resolution for the caller's fallback
    skipped_c = act_all & ~cov_all                    # (C, FPC, A) at ids
    nbp1 = nb + 1
    skipped_full = jnp.zeros((n_chunks, FPC, nbp1), bool)
    skipped_full = jax.vmap(
        lambda sf, i, sk: sf.at[:, i].max(sk),
        in_axes=(0, 0, 0))(skipped_full, ids_all, skipped_c)
    skipped_full = skipped_full.reshape(n_total, nbp1)[:n_frames, :nb]

    def step(carry, frame):
        tsdf, weight, color = carry
        dhi, dlo, cimg, ids, act, pvf, pvh, puf, evec = frame
        t_rows = jnp.take(tsdf, ids, axis=0)
        w_rows = jnp.take(weight, ids, axis=0)
        c_rows = jnp.take(color, ids, axis=0)
        vol_stub = BlockTSDFVolume(tsdf, weight, color, created_in, origin,
                                   voxel_size, sdf_trunc, grid_blocks)
        wx_rows, wy_rows, wz_rows = _voxel_world_coords(vol_stub, ids)
        t_new, w_new, c_new = _update_active_blocks(
            t_rows, w_rows, c_rows, wx_rows, wy_rows, wz_rows,
            dhi, dlo, cimg, ids, act, pvf, pvh, puf, evec, intr, vol_meta,
            patch_rows, color_rows, full_color, interpret)
        tsdf = tsdf.at[ids].set(t_new, unique_indices=True)
        weight = weight.at[ids].set(w_new, unique_indices=True)
        color = color.at[ids].set(c_new, unique_indices=True)
        return (tsdf, weight, color), None

    (tsdf, weight, color), _ = jax.lax.scan(
        step, (tsdf, weight, color),
        (dhi_c, dlo_c, cimg_c, ids_all, act_kernel, pvf_all, pvh_all,
         puf_all, evec_all))
    created = created_in.at[:nb].set(created_all[n_frames - 1])
    return tsdf, weight, color, created, skipped_full


@functools.partial(jax.jit, static_argnames=("intr", "vol_meta", "max_near"),
                   donate_argnums=(0, 1, 2))
def _near_fallback(tsdf, weight, color, depths, colors_packed, extrinsics,
                   near_mask, intr: PinholeIntrinsics, vol_meta,
                   max_near: int):
    """XLA gather-path integration of the (frame, block) pairs the kernel's
    depth slab could not cover (close-range blocks). Weighted-mean updates
    commute, so applying them after the main pass is exact."""
    grid_blocks, origin, voxel_size, sdf_trunc = vol_meta
    nb = grid_blocks[0] * grid_blocks[1] * grid_blocks[2]

    def step(carry, frame):
        tsdf, weight, color = carry
        depth, cpacked, extrinsic, mask = frame
        ids = compact_ids(mask, max_near, nb)
        vol_stub = BlockTSDFVolume(tsdf, weight, color, None, origin,
                                   voxel_size, sdf_trunc, grid_blocks)
        wx, wy, wz = _voxel_world_coords(vol_stub, ids)
        tsdf_obs, w_obs, col_obs = _sample_frame(
            wx, wy, wz, depth, cpacked, extrinsic, intr, sdf_trunc)
        t_rows = jnp.take(tsdf, ids, axis=0)
        w_rows = jnp.take(weight, ids, axis=0)
        c_rows = jnp.take(color, ids, axis=0)
        w_new = w_rows + w_obs
        denom = jnp.maximum(w_new, 1.0)
        t_new = (t_rows * w_rows + tsdf_obs * w_obs) / denom
        w3 = jnp.tile(w_rows, (1, 3))
        c_new = (c_rows * w3 + col_obs) / jnp.tile(denom, (1, 3))
        tsdf = tsdf.at[ids].set(t_new, unique_indices=True)
        weight = weight.at[ids].set(w_new, unique_indices=True)
        color = color.at[ids].set(c_new, unique_indices=True)
        return (tsdf, weight, color), None

    (tsdf, weight, color), _ = jax.lax.scan(
        step, (tsdf, weight, color),
        (depths, colors_packed, extrinsics, near_mask))
    return tsdf, weight, color


def integrate_frames_pallas(vol: BlockTSDFVolume, depths: jnp.ndarray,
                            colors: jnp.ndarray, extrinsics: jnp.ndarray,
                            intr: PinholeIntrinsics, max_active: int = 2048,
                            interpret: bool = False,
                            color_res: str = "half",
                            near_field: str = "fallback") -> BlockTSDFVolume:
    """Fuse a batch of frames through the Pallas block kernel.

    Same contract as tsdf_block.integrate_frames_sparse; geometry (tsdf,
    weight) is bit-identical to it. color_res="half" (default) samples color
    from a half-resolution pyramid (~1-pixel error, faster); "full" samples
    at full resolution and matches the gather path exactly.

    near_field: "fallback" (default) integrates blocks too close to the
    camera for the kernel's depth slab via an exact XLA pass (zero lost
    integrations); "skip" drops those (frame, block) pairs (fastest, exact
    for captures where everything is > ~0.45 m away); the count of fallback
    frames is fetched with one small host sync that overlaps the main pass.
    """
    if color_res not in ("half", "full"):
        raise ValueError(f"color_res must be 'half' or 'full': {color_res!r}")
    if near_field not in ("fallback", "skip"):
        raise ValueError(
            f"near_field must be 'fallback' or 'skip': {near_field!r}")
    depths = jnp.asarray(depths)
    colors = jnp.asarray(colors)
    extrinsics = jnp.asarray(extrinsics)
    vol_meta = (vol.grid_blocks, vol.origin, vol.voxel_size, vol.sdf_trunc)

    tsdf, weight, color, created, skipped = _integrate_core(
        vol.tsdf, vol.weight, vol.color, vol.created, depths, colors,
        extrinsics, intr, vol_meta, max_active, color_res == "full",
        interpret)

    if near_field == "fallback":
        per_frame = jnp.sum(skipped, axis=1)          # (N,)
        counts = np.asarray(per_frame)                # host sync (small)
        if counts.max() > 0:
            sel = np.nonzero(counts > 0)[0]
            max_near = int(-(-counts.max() // 64) * 64)
            cpacked = jax.vmap(pack_rgb)(colors[sel])
            tsdf, weight, color = _near_fallback(
                tsdf, weight, color, depths[sel], cpacked, extrinsics[sel],
                skipped[sel], intr, vol_meta, max_near)

    # compact_ids pads with the dead-row id, so the scans above scatter
    # garbage into row nb; restore the row-nb == 0 invariant extraction and
    # neighbor reads rely on.
    nb = vol.num_blocks
    tsdf = tsdf.at[nb].set(0.0)
    weight = weight.at[nb].set(0.0)
    color = color.at[nb].set(0.0)
    return BlockTSDFVolume(tsdf, weight, color, created, vol.origin,
                           vol.voxel_size, vol.sdf_trunc, vol.grid_blocks)
