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

def _cumulative_or(band: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative OR over the frame axis of a (N, NB) bool array.

    A lower-triangular ones matmul on the MXU: ~60x faster than
    lax.associative_scan(logical_or) at (384, 32768) on TPU (the scan's
    log-N passes of slice/or/concat are layout-bound). Sums of 0/1 terms
    accumulate in f32, so > 0 is exact.
    """
    n = band.shape[0]
    tri = jnp.tril(jnp.ones((n, n), jnp.bfloat16))
    acc = jax.lax.dot_general(tri, band.astype(jnp.bfloat16),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.DEFAULT)
    return acc > 0


BPG = 8  # blocks per grid step (amortizes per-step overhead)
DEPTH_WIN = 256  # aligned lane window (2 lane tiles); dynamic lane starts
# must be 128-multiples, so the guaranteed u-coverage is win - 128 centered
PATCH_ROWS = 128  # depth-slab rows: covers every block at >= ~0.66 m
# (v-extent fy*0.139/z + alignment slack); closer blocks go through the
# exact near-field fallback. Tried 112/120: the saved depth-matmul is small
# and both trigger rare marginal fallbacks on the capture-circle workload,
# which cost far more (fallback mode's mid-pipeline sync + gather pass)
# than the matmul saving — 128 keeps near_field="skip" exact there.


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
                 full_color: bool, grid_blocks, origin, voxel_size,
                 win: int, planes: int = 1):
    """Kernel processing ``fpc`` frames per call: the per-block row DMAs and
    state writes are shared across the frames (the dominant non-matmul
    cost), while each frame contributes its own projection + selection +
    running-mean step, gated by a per-frame active flag (preserving the
    sequential creation semantics exactly).

    Voxel world coordinates derive from the block id in-register (scalar
    div/mod + a hoisted iota split — cheaper than streaming three
    pre-gathered (A, 512) row arrays in); depth arrives pre-split into bf16
    hi/lo images.

    win: depth-slab lane window (the selection dots' K dimension).
    planes: depth images arrive as (fpc, planes*H, W) row-stacked
    (128//planes)-lane-left-shifted copies — Mosaic only allows
    128-multiple dynamic lane starts, so a window at a (128//planes)-
    grained ``puf`` reads the plane matching ``puf % 128`` at the
    128-aligned lane base, selecting the plane via the (dynamic,
    8-aligned) sublane start ``plane*H + pvf`` — the same dynamic-slab
    mechanism as pvf itself, no dynamic leading-dim indexing. win=128 at
    32-grained starts (planes=4) covers any block whose projected u-span
    is < ~96 px at HALF the 128-grained window's K — the dominant
    selection-dot cost. planes=1 expects 128-aligned ``puf``.
    """
    H, W = intr.height, intr.width
    H2 = H // 2
    V = BLOCK_VOXELS
    _, gby, gbz = grid_blocks
    ox, oy, oz = (float(o) for o in origin)
    vs = float(voxel_size)

    def kernel(ids_ref, act_ref, pvf_ref, pvh_ref, puf_ref, pcs_ref, e_ref,
               tsdf_ref, w_ref, col_ref,
               dhi_ref, dlo_ref, cimg_ref, cimgs_ref,
               tsdf_out, w_out, col_out):
        step = pl.program_id(0)
        A = ids_ref.shape[0]

        # block-local voxel index split (constant across blocks; hoisted)
        l = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
        lx = l // (BLOCK * BLOCK)
        ly = (l // BLOCK) % BLOCK
        lz = l % BLOCK

        for j in range(BPG):
            k = step * BPG + j
            bid = ids_ref[k]

            @pl.when(bid < nb)
            def _():
                # --- voxel world coords from the block id (same op order as
                # _voxel_world_coords for bit-identical results; cheaper than
                # streaming three pre-gathered (A, 512) row arrays in) ---
                ix = bid // (gby * gbz)
                iy = (bid // gbz) % gby
                iz = bid % gbz
                f32 = jnp.float32
                wxr = ((ix * BLOCK + lx).astype(f32) + 0.5) * vs + ox
                wyr = ((iy * BLOCK + ly).astype(f32) + 0.5) * vs + oy
                wzr = ((iz * BLOCK + lz).astype(f32) + 0.5) * vs + oz
                told = tsdf_ref[j, :].reshape(1, V)
                wold = w_ref[j, :].reshape(1, V)
                cold = [col_ref[j, c * V:(c + 1) * V].reshape(1, V)
                        for c in range(3)]

                for f in range(fpc):
                    e = [e_ref[f * 12 + q] for q in range(12)]
                    act = act_ref[f * A + k]
                    pvf = pl.multiple_of(pvf_ref[f * A + k], 8)
                    pvh = pl.multiple_of(pvh_ref[f * A + k], 8)
                    pch = pcs_ref[f * A + k]        # 64-aligned color start
                    if planes == 1:
                        puf = pl.multiple_of(puf_ref[f * A + k], 128)
                        base = puf
                        prow = pvf
                    else:
                        # (128//planes)-grained window start: read the
                        # matching lane-shifted plane (stacked on rows) at
                        # the 128-aligned lane base
                        grain = 128 // planes
                        puf = pl.multiple_of(puf_ref[f * A + k], grain)
                        base = pl.multiple_of(puf & ~127, 128)
                        prow = pl.multiple_of(
                            ((puf & 127) // grain) * H + pvf, 8)

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

                    M = (sel_dot(dhi_ref[f, pl.ds(prow, patch_rows),
                                         pl.ds(base, win)])
                         + sel_dot(dlo_ref[f, pl.ds(prow, patch_rows),
                                           pl.ds(base, win)]))  # (pr, V)
                    iota_pr = jax.lax.broadcasted_iota(
                        jnp.int32, (patch_rows, V), 0)
                    ovT = ((v_r - pvf) == iota_pr).astype(jnp.float32)
                    d = jnp.sum(M * ovT, axis=0, keepdims=True)

                    # --- color selection (per-channel dots, no concat) ---
                    if full_color:
                        # full-res: reuse the depth one-hot, window, and ovT
                        # (planes == 1 only: puf is 128-aligned there)
                        iota_cr = iota_pr
                        ov_c = ovT
                        Mc = [sel_dot(cimg_ref[f,
                                               pl.ds(c * H + pvf, color_rows),
                                               pl.ds(puf, win)])
                              for c in range(3)]
                    else:
                        # half-res bf16 pyramid; the 3 channel slabs concat
                        # into ONE M=3*rows dot (three M=64 dots leave half
                        # of every MXU M-tile idle) over a 128-lane window
                        # starting exactly at pch (the block's 64-aligned
                        # half-res window start from _block_schedule): a
                        # covered block's half-res u-span is < 128 lanes, so
                        # K collapses from W/2 (3 K-tiles at VGA) to ONE.
                        # Mosaic only allows 128-aligned lane starts, so the
                        # 64-offset windows read from a 64-lane-shifted copy
                        # of the image (cimgs) at the aligned base instead
                        pw = pl.multiple_of(pch & ~127, 128)
                        shifted = (pch & 127) != 0
                        iota_wh = jax.lax.broadcasted_iota(
                            jnp.int32, (128, V), 0)
                        ouh = ((u_r // 2 - pch) == iota_wh).astype(
                            jnp.bfloat16)
                        iota_cr = jax.lax.broadcasted_iota(
                            jnp.int32, (color_rows, V), 0)
                        ov_c = (((v_r // 2) - pvh) == iota_cr
                                ).astype(jnp.float32)
                        slab3 = jnp.concatenate(
                            [jnp.where(
                                shifted,
                                cimgs_ref[f, pl.ds(c * H2 + pvh, color_rows),
                                          pl.ds(pw, 128)],
                                cimg_ref[f, pl.ds(c * H2 + pvh, color_rows),
                                         pl.ds(pw, 128)])
                             for c in range(3)], axis=0)
                        M3 = jax.lax.dot_general(
                            slab3, ouh, dims,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
                        Mc = [M3[c * color_rows:(c + 1) * color_rows]
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


FPC = 8  # frames per kernel call (share block row DMAs across frames).
# Chip sweep with the round-3 windowed selection (ms in f/s at n=384):
# FPC 4: 1618, 6: 1818, 8: 1855, 12: 1587, 16: 1623 — the old FPC=6 pick
# predates the window shrink (smaller per-frame VMEM slabs moved the DMA
# sharing sweet spot up one notch; 12+ unions too many inactive pairs).


def smem_max_active(fpc: int = FPC, smem_budget: int = 900_000) -> int:
    """Largest max_active whose scalar-prefetch schedules fit in SMEM.

    The kernel prefetches ids (A,) plus 5 frame-major (fpc*A,) i32 window
    schedules and evec (fpc*12,) f32 into the 1 MiB scalar memory; the
    budget leaves ~100 KiB for compiler internals (a 1.58 MiB request was
    observed to fail remote compile with "Ran out of memory in memory
    space smem"). Rounded down to a BPG multiple."""
    rows = (smem_budget // 4 - fpc * 12) // (1 + 5 * fpc)
    return max((rows // BPG) * BPG, BPG)


@functools.partial(jax.jit, static_argnames=(
    "intr", "vol_meta", "patch_rows", "color_rows", "full_color",
    "interpret", "win", "planes"))
def _update_active_blocks(tsdf_rows, w_rows, col_rows, dhi, dlo, cimg, cimgs,
                          ids, act, pvf, pvh, puf, pcs, evec,
                          intr: PinholeIntrinsics, vol_meta,
                          patch_rows: int, color_rows: int,
                          full_color: bool, interpret: bool = False,
                          win: int | None = None, planes: int = 1):
    """Run the Pallas kernel over compact active-block rows for FPC frames.

    tsdf_rows/w_rows: (A, 512) f32; col_rows: (A, 1536) f32;
    dhi/dlo: (FPC, planes*H, W) bf16 (planes>1: row-stacked lane-shifted
    copies for the fine-grained depth windows); cimg:
    (FPC, 3*Hc, Wc) bf16 (half mode: Wc lane-padded to a 128 multiple for
    the color-window slices); cimgs: cimg shifted left 64 lanes (half
    mode; a tiny dummy when full_color — the kernel's full branch never
    reads it); ids: (A,) i32; act/pvf/pvh/puf/pcs: (FPC*A,) i32
    frame-major; evec: (FPC*12,) f32 (extrinsic rows 0..2 per frame).
    Voxel world coordinates are derived from the block id inside the
    kernel.
    """
    grid_blocks, origin, voxel_size, sdf_trunc = vol_meta
    nb = grid_blocks[0] * grid_blocks[1] * grid_blocks[2]
    A = tsdf_rows.shape[0]
    assert A % BPG == 0
    win = min(DEPTH_WIN, dhi.shape[2]) if win is None else win
    fpc = dhi.shape[0]

    kernel = _make_kernel(intr, sdf_trunc, patch_rows, color_rows, nb, fpc,
                          full_color, grid_blocks, origin, voxel_size,
                          win, planes)
    row_spec = pl.BlockSpec((BPG, BLOCK_VOXELS), lambda i, *_: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(A // BPG,),
        in_specs=[
            row_spec,                                          # tsdf
            row_spec,                                          # weight
            pl.BlockSpec((BPG, 3 * BLOCK_VOXELS), lambda i, *_: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),             # dhi
            pl.BlockSpec(memory_space=pltpu.VMEM),             # dlo
            pl.BlockSpec(memory_space=pltpu.VMEM),             # cimg
            pl.BlockSpec(memory_space=pltpu.VMEM),             # cimgs
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
    # the whole-array VMEM image operands (dhi/dlo/cimg/cimgs) can exceed
    # the TPU compiler's default 16 MiB scoped-VMEM budget (VGA at FPC=8 is
    # ~17.8 MiB of images; whether the default assignment happens to fit
    # depends on loop structure and A — multi-chunk batches at large
    # max_active OOM'd at compile). Raise the per-kernel limit to the
    # actual operand footprint plus room for the in-kernel temporaries and
    # double-buffered row blocks; v5e has 128 MiB of VMEM per core.
    img_bytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                    for a in (dhi, dlo, cimg, cimgs))
    params = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=max(16, (img_bytes >> 20) + 8) << 20)}
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={7: 0, 8: 1, 9: 2},
        interpret=interpret,
        **params,
    )(ids, act, pvf, pvh, puf, pcs, evec, tsdf_rows, w_rows, col_rows,
      dhi, dlo, cimg, cimgs)


def _make_classify_kernel(intr: PinholeIntrinsics, vol_meta, tb: int,
                          th: int, tw: int, tile: int):
    """Kernel mirroring tsdf_block._active_blocks over a tile of `tb` blocks:
    the per-block mip-row lookup (a 32k-row gather per frame in XLA, the
    measured activity bottleneck at 0.22 ms/frame) becomes a one-hot matmul
    select against the (192, tw) level-plane table in VMEM. The table is
    bf16-safe (tsdf_block._bf16_conservative), so the selected bounds equal
    the XLA gather path's bit-for-bit."""
    grid_blocks, origin, voxel_size, sdf_trunc = vol_meta
    _, gby, gbz = grid_blocks
    ox, oy, oz = (float(o) for o in origin)
    H, W = intr.height, intr.width
    half = 0.5 * BLOCK * voxel_size
    r = 0.8661 * BLOCK * voxel_size
    fmax = max(intr.fx, intr.fy)
    twp = -(-tw // 128) * 128        # lane-aligned table width

    nb = grid_blocks[0] * grid_blocks[1] * grid_blocks[2]
    n_tiles = nb // tb

    def kernel(e_ref, g_ref, tbl_ref, band_out, vis_out):
        f = pl.program_id(0)
        f32 = jnp.float32
        e = [e_ref[f * 12 + q] for q in range(12)]
        gmin = g_ref[f * 2]
        gmax = g_ref[f * 2 + 1]

        for t in range(n_tiles):  # static tiles: aligned output slices
            ids = t * tb + jax.lax.broadcasted_iota(jnp.int32, (1, tb), 1)
            ix = ids // (gby * gbz)
            iy = (ids // gbz) % gby
            iz = ids % gbz
            cx = ox + ix.astype(f32) * BLOCK * voxel_size + half
            cy = oy + iy.astype(f32) * BLOCK * voxel_size + half
            cz = oz + iz.astype(f32) * BLOCK * voxel_size + half
            px = e[0] * cx + e[1] * cy + e[2] * cz + e[3]
            py = e[4] * cx + e[5] * cy + e[6] * cz + e[7]
            pz = e[8] * cx + e[9] * cy + e[10] * cz + e[11]

            in_front = pz > r * 0.5
            zsafe = jnp.where(pz > 1e-6, pz, 1e-6)
            u = intr.fx * px / zsafe + intr.cx
            v = intr.fy * py / zsafe + intr.cy
            slack = fmax * r / zsafe + 1.0
            in_frustum = (in_front & (u + slack >= 0) & (u - slack < W)
                          & (v + slack >= 0) & (v - slack < H))
            tu0 = jnp.clip((u / tile).astype(jnp.int32), 0, tw - 1)
            tv0 = jnp.clip((v / tile).astype(jnp.int32), 0, th - 1)

            # one-hot select of the 6 level values at (tv0, tu0) per block
            iota_u = jax.lax.broadcasted_iota(jnp.int32, (twp, tb), 0)
            ohu = (iota_u == tu0).astype(jnp.bfloat16)
            M = jax.lax.dot_general(
                tbl_ref[0].astype(jnp.bfloat16), ohu, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)         # (192, tb)
            # (DEFAULT precision is exact here: the one-hot selects a single
            # bf16 value; the package-wide HIGHEST default would demand f32
            # operands, which Mosaic rejects for bf16 dots)
            iota_v = jax.lax.broadcasted_iota(jnp.int32, (32, tb), 0)
            ovT = (iota_v == tv0).astype(f32)
            vals = [jnp.sum(M[c * 32:(c + 1) * 32] * ovT, axis=0,
                            keepdims=True) for c in range(6)]

            l1 = slack > tile
            l2 = slack > 2 * tile
            bmin = jnp.where(l2, vals[4], jnp.where(l1, vals[2], vals[0]))
            bmax = jnp.where(l2, vals[5], jnp.where(l1, vals[3], vals[1]))
            too_big = slack > 4 * tile
            bmin = jnp.where(too_big, gmin, bmin)
            bmax = jnp.where(too_big, gmax, bmax)

            has_depth = bmax > 0
            band = (in_frustum & has_depth
                    & (pz + r >= bmin - sdf_trunc)
                    & (pz - r <= bmax + sdf_trunc))
            visible = in_frustum & has_depth & (pz - r <= bmax + sdf_trunc)
            band_out[0, :, t * tb:(t + 1) * tb] = band.astype(jnp.int32)
            vis_out[0, :, t * tb:(t + 1) * tb] = visible.astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("intr", "vol_meta", "interpret"))
def _classify_blocks(depths, extrinsics, intr: PinholeIntrinsics, vol_meta,
                     interpret: bool = False):
    """(band, visible) bool (N, NB) for a frame batch — the batched
    equivalent of vmapping tsdf_block._active_blocks, with the mip lookup on
    the MXU instead of a row gather."""
    from otslam_tpu.kernels.tsdf_block import depth_mip_planes
    grid_blocks, origin, voxel_size, sdf_trunc = vol_meta
    nb = grid_blocks[0] * grid_blocks[1] * grid_blocks[2]
    n = depths.shape[0]
    tb = min(4096, nb)
    tile = 16
    th, tw = -(-intr.height // tile), -(-intr.width // tile)
    planes, gbounds = jax.vmap(
        lambda d: depth_mip_planes(d, tile)[:2])(depths)
    evec = extrinsics.astype(jnp.float32)[:, :3, :].reshape(n * 12)

    kernel = _make_classify_kernel(intr, vol_meta, tb, th, tw, tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, 6 * 32, -(-tw // 128) * 128),
                               lambda f, *_: (f, 0, 0))],
        out_specs=[pl.BlockSpec((1, 1, nb), lambda f, *_: (f, 0, 0)),
                   pl.BlockSpec((1, 1, nb), lambda f, *_: (f, 0, 0))],
    )
    out_shape = [jax.ShapeDtypeStruct((n, 1, nb), jnp.int32),
                 jax.ShapeDtypeStruct((n, 1, nb), jnp.int32)]
    band, vis = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret)(evec, gbounds.reshape(-1), planes)
    return (band.reshape(n, nb).astype(bool),
            vis.reshape(n, nb).astype(bool))


def _pad_width_128(W, win, *imgs):
    """Zero-pad the lane (width) axis of per-frame images to the next
    multiple of 128 when W exceeds the slab window and is not already
    aligned (e.g. QVGA 320 -> 384). Keeps every scheduled window start a
    multiple of the window grain; depth-0 padding never integrates."""
    if W <= win or W % 128 == 0:
        return imgs
    wpad = -(-W // 128) * 128 - W
    out = []
    for img in imgs:
        pad = [(0, 0)] * img.ndim
        pad[2] = (0, wpad)
        out.append(jnp.pad(img, pad))
    return tuple(out)


def _pad_to_fpc(extrinsics, *frame_arrays):
    """Pad a frame batch to a multiple of FPC: zero frames + identity
    extrinsics (identity frames classify as empty and integrate nothing).
    Returns (extrinsics, *arrays) padded."""
    pad = (-extrinsics.shape[0]) % FPC
    if pad:
        frame_arrays = tuple(
            jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
            for a in frame_arrays)
        extrinsics = jnp.concatenate(
            [extrinsics,
             jnp.tile(jnp.eye(4, dtype=extrinsics.dtype)[None],
                      (pad, 1, 1))])
    return (extrinsics,) + frame_arrays


@functools.partial(jax.jit, static_argnames=("intr",))
def _max_active_needed(vol: BlockTSDFVolume, depths, extrinsics,
                       intr: PinholeIntrinsics):
    """Exact upper bound on the per-CHUNK union active-block count for a
    batch (the kernel processes FPC frames per call over their union):
    replays the creation recurrence (created |= band; active = created &
    visible) with a cumulative OR — one cheap batched dispatch."""
    nb = vol.num_blocks
    extrinsics, depths = _pad_to_fpc(extrinsics, depths)
    band_all, visible_all = jax.vmap(
        lambda d, e: _active_blocks(vol, d, e, intr))(depths, extrinsics)
    created_cum = _cumulative_or(band_all)
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


def auto_patch_rows(vol: BlockTSDFVolume, depths, extrinsics,
                    intr: PinholeIntrinsics, max_active: int,
                    interpret: bool = False,
                    depth_win: int | None = None,
                    depth_planes: int = 4) -> int:
    """Smallest 8-multiple depth-slab height (the selection dots' M
    dimension) whose slab-coverage skip set matches the PATCH_ROWS
    default's — shrinking the dot costs zero extra fallbacks on this
    workload. Far-field capture circles (the reference scan protocol,
    reconstruct_rgbd_filter.py:91-105) project ~40-50 px block v-spans at
    VGA, roughly halving the depth-selection MACs vs the 128-row default.
    Runs a few scheduling-pass dispatches (binary search over the
    8-multiples); untimed setup, cacheable by jit."""
    depths = jnp.asarray(depths)
    extrinsics = jnp.asarray(extrinsics)
    H = depths.shape[1]
    vm = (vol.grid_blocks, vol.origin, vol.voxel_size, vol.sdf_trunc)

    def skipped(pr: int) -> int:
        return int(np.sum(np.asarray(near_fallback_counts(
            vol.created, depths, extrinsics, intr, vm, max_active,
            interpret=interpret, patch_rows=pr, depth_win=depth_win,
            depth_planes=depth_planes))))

    return _shrink_rows_to_base(skipped, min(PATCH_ROWS, H) // 8)


def _shrink_rows_to_base(skipped, hi_u: int, lo_u: int = 2) -> int:
    """Binary search for the smallest 8-multiple row count whose coverage
    skip count equals the hi_u*8 default's (skips are monotone
    non-increasing in the window height, so equality with the default
    means the skip SET is unchanged — shrinking costs zero fallbacks)."""
    base = skipped(hi_u * 8)
    while lo_u < hi_u:
        mid_u = (lo_u + hi_u) // 2
        if skipped(mid_u * 8) == base:
            hi_u = mid_u
        else:
            lo_u = mid_u + 1
    return hi_u * 8


def auto_depth_config(vol: BlockTSDFVolume, depths, extrinsics,
                      intr: PinholeIntrinsics, max_active: int,
                      patch_rows: int | None = None,
                      interpret: bool = False) -> Tuple[int | None, int]:
    """(depth_win, depth_planes) for integrate_frames_pallas: the one-K-tile
    window when it covers exactly the pairs the 256-lane default does on
    this workload — halving the depth selection dots' K costs zero extra
    fallbacks there — preferring planes=2 (64-grain starts, one extra
    shifted copy, coverage ~63 px) over planes=4 (32-grain, ~96 px, 2x
    the extra image VMEM/prep). Far-field capture circles project
    ~30-50 px block u-spans at VGA. Exactness never depends on the choice
    (uncovered pairs fall back); this only picks the faster config."""
    depths = jnp.asarray(depths)
    extrinsics = jnp.asarray(extrinsics)
    vm = (vol.grid_blocks, vol.origin, vol.voxel_size, vol.sdf_trunc)

    def skipped(dw: int | None, planes: int = 4) -> int:
        return int(np.sum(np.asarray(near_fallback_counts(
            vol.created, depths, extrinsics, intr, vm, max_active,
            interpret=interpret, patch_rows=patch_rows, depth_win=dw,
            depth_planes=planes))))

    base = skipped(None)
    for planes in (2, 4):
        if skipped(128, planes) == base:
            return 128, planes
    return None, 4


def auto_depth_win(vol: BlockTSDFVolume, depths, extrinsics,
                   intr: PinholeIntrinsics, max_active: int,
                   patch_rows: int | None = None,
                   interpret: bool = False) -> int:
    """The depth_win half of auto_depth_config (kept for callers that only
    size the window; returns DEPTH_WIN when the narrow window would cost
    extra fallbacks)."""
    dw, _ = auto_depth_config(vol, depths, extrinsics, intr, max_active,
                              patch_rows=patch_rows, interpret=interpret)
    return dw or DEPTH_WIN


def _effective_patch_rows(patch_rows: int | None, H: int) -> int:
    """Clamp the requested depth-slab height: 8-sublane multiple, >= 16
    where the image allows, and NEVER above H (rounding up past a
    non-8-multiple H would slice the depth slab out of bounds — the
    clipped pvf start goes to 0 but the slab still overruns the image)."""
    if H < 8:
        raise ValueError(f"depth images must be >= 8 rows tall (got {H}) — "
                         "the depth slab is sliced in 8-row sublane tiles")
    pr = 8 * (min(patch_rows or PATCH_ROWS, H) // 8)
    return max(pr, min(16, 8 * (H // 8)))


def _effective_color_rows(color_rows: int | None, H: int,
                          patch_rows: int = PATCH_ROWS) -> int:
    """Clamp the requested half-res color window height (the color slab
    dot's M/3). None = the patch-coupled default 8*(patch_rows//16 + 1)
    (top-anchored at the span's first half-res row, this covers every pair
    whose full-res span fits the depth slab: span <= patch_rows rows ->
    half span <= patch_rows//2 + alignment slack 7 < default). An explicit
    value rounds DOWN to an 8-sublane multiple in [16, H//2] (the window
    must stay inside the half-res channel plane); values below the default
    can route extra pairs to the fallback — the exact coverage test
    decides."""
    cap = H // 2
    dflt = min(8 * (patch_rows // 16 + 1), cap)
    if color_rows is None or cap < 16:
        return dflt
    return min(max(16, 8 * (min(color_rows, cap) // 8)), cap)


def auto_color_rows(vol: BlockTSDFVolume, depths, extrinsics,
                    intr: PinholeIntrinsics, max_active: int,
                    patch_rows: int | None = None,
                    depth_win: int | None = None,
                    interpret: bool = False,
                    depth_planes: int = 4) -> int:
    """Smallest 8-multiple half-res color window height whose coverage
    skip set matches the 64-row default's — the color slab dot's M is
    3*color_rows, so far-field workloads (projected half-res v-spans
    ~20-25 rows at VGA capture distance) cut the color MACs ~2x. Same
    zero-extra-fallbacks construction as auto_patch_rows."""
    depths = jnp.asarray(depths)
    extrinsics = jnp.asarray(extrinsics)
    H = depths.shape[1]
    vm = (vol.grid_blocks, vol.origin, vol.voxel_size, vol.sdf_trunc)

    def skipped(cr: int) -> int:
        return int(np.sum(np.asarray(near_fallback_counts(
            vol.created, depths, extrinsics, intr, vm, max_active,
            interpret=interpret, patch_rows=patch_rows,
            depth_win=depth_win, color_rows=cr,
            depth_planes=depth_planes))))

    pr_eff = _effective_patch_rows(patch_rows, H)
    return _shrink_rows_to_base(
        skipped, _effective_color_rows(None, H, pr_eff) // 8)


def _corner_bounds(vol_meta, ids, E, intr: PinholeIntrinsics):
    """Projected pixel bounds of the 8 corners of each block (per frame):
    (umin, umax, vmin, vmax, n_behind). Corners behind the camera plane
    contribute +-inf bounds and count into n_behind."""
    grid_blocks, origin, voxel_size, _ = vol_meta
    bx, by, bz = grid_blocks
    nb = bx * by * bz
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
    return umin, umax, vmin, vmax, n_behind


def _corner_coverage(bounds, intr: PinholeIntrinsics,
                     patch_rows: int, win: int, pvf, puf,
                     pvh, cr_half: int, full_color: bool):
    """Exact per-(frame, block) slab-coverage test from the corner bounds.

    covered == every voxel of the block that can land in the image is
    guaranteed to fall inside the (patch_rows x win) depth slab AND (in
    half-res color mode) inside the (cr_half x 128) color row window at
    pvh. A block with any corner behind the camera plane is not covered
    (projection unbounded) unless every corner is behind (then nothing
    integrates and it is trivially covered).
    """
    umin, umax, vmin, vmax, n_behind = bounds
    H, W = intr.height, intr.width
    # clip bounds to the image: off-image voxels are invalid in the kernel
    # anyway, so only the in-image span must fit the slab (+-1 px rounding)
    u_lo = jnp.clip(jnp.floor(umin) - 1, 0, W - 1)
    u_hi = jnp.clip(jnp.ceil(umax) + 1, 0, W - 1)
    v_lo = jnp.clip(jnp.floor(vmin) - 1, 0, H - 1)
    v_hi = jnp.clip(jnp.ceil(vmax) + 1, 0, H - 1)
    fits = ((u_lo >= puf) & (u_hi < puf + win)
            & (v_lo >= pvf) & (v_hi < pvf + patch_rows))
    if not full_color:
        # the half-res color rows the kernel requests are v_r // 2 for
        # v_r in [v_lo, v_hi]: they must fit the (cr_half)-row window at
        # pvh, else the frame's color contribution for those voxels would
        # silently drop while their weight still accumulated (a bias the
        # pre-round-3 center-anchored pvh exhibited on parallax-skewed
        # near blocks) — route such pairs to the exact fallback instead
        vh_lo = v_lo.astype(jnp.int32) // 2
        vh_hi = v_hi.astype(jnp.int32) // 2
        fits = fits & (vh_lo >= pvh) & (vh_hi < pvh + cr_half)
    # off-image must match the kernel's round-to-nearest in_img bounds: a
    # corner at u in (W-1, W-0.5) still rounds INTO the image, so only
    # bounds beyond the +-0.5 rounding midpoints are trivially covered
    off_image = ((umax < -0.5) | (umin >= W - 0.5)
                 | (vmax < -0.5) | (vmin >= H - 0.5))
    all_behind = n_behind == 8
    some_behind = n_behind > 0
    # the off-image shortcut only applies when no corner straddles the
    # camera plane: a straddling block's in-front corners can project
    # off-image while interior voxels still sweep through it
    return jnp.where(all_behind | (off_image & ~some_behind), True,
                     fits & ~some_behind)


def _block_schedule(created_in, depths, extrinsics, intr: PinholeIntrinsics,
                    vol_meta, max_active: int, patch_rows: int, win: int,
                    n_frames: int, interpret: bool,
                    full_color: bool = False, planes: int = 1,
                    color_rows: int | None = None):
    """Per-chunk block schedule for the fusion scan (traced inline by its
    callers): activity classification, created evolution (cumulative OR),
    chunk-union compaction, per-frame act flags at the union ids, patch
    starts, the exact slab-coverage test, and the uncovered-pair counts.

    planes>1 anchors the depth windows at (128//planes)-grained lane
    starts (the kernel reads them from lane-shifted image copies), which
    lets a win one K-tile wide cover far-field blocks; the coverage test
    tightens accordingly, so pairs that no longer fit route to the
    caller's exact fallback as usual.

    depths/extrinsics must already be padded to a multiple of FPC.
    """
    grid_blocks, origin, voxel_size, sdf_trunc = vol_meta
    nb = grid_blocks[0] * grid_blocks[1] * grid_blocks[2]
    H, W = depths.shape[1:]
    n_total = depths.shape[0]
    n_chunks = n_total // FPC

    # the classify kernel needs the block tile to divide the block count and
    # the mip height to fit its 32-row level stride (images <= 512 px tall);
    # anything else uses the exact XLA classification
    if nb % min(4096, nb) == 0 and -(-H // 16) <= 32:
        band_all, visible_all = _classify_blocks(depths, extrinsics, intr,
                                                 vol_meta, interpret)
    else:
        dummy = BlockTSDFVolume(None, None, None, created_in, origin,
                                voxel_size, sdf_trunc, grid_blocks)
        band_all, visible_all = jax.vmap(
            lambda d, e: _active_blocks(dummy, d, e, intr))(depths,
                                                            extrinsics)
    created_all = _cumulative_or(band_all)
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

    cr_half = _effective_color_rows(color_rows, H, patch_rows)
    grain = 128 // planes

    def starts(E, ids):
        bounds = _corner_bounds(vol_meta, ids, E, intr)
        umin, umax, vmin, vmax, _ = bounds
        Ht, Wt = intr.height, intr.width
        # anchor every window at the midpoint of the clipped in-image
        # corner span (the block-center projection is parallax-skewed for
        # near or grazing blocks, wasting slab rows on one side and — for
        # the color row window — clipping rows the depth slab covered);
        # pairs with any corner behind the camera are never covered, so
        # their anchor is arbitrary — sanitize the infs to 0
        v_lo = jnp.clip(jnp.floor(vmin) - 1, 0, Ht - 1)
        v_hi = jnp.clip(jnp.ceil(vmax) + 1, 0, Ht - 1)
        u_lo = jnp.clip(jnp.floor(umin) - 1, 0, Wt - 1)
        u_hi = jnp.clip(jnp.ceil(umax) + 1, 0, Wt - 1)
        vmid = jnp.where(jnp.isfinite(vmin), 0.5 * (v_lo + v_hi), 0.0)
        umid = jnp.where(jnp.isfinite(umin), 0.5 * (u_lo + u_hi), 0.0)
        # rounded down to sublane multiples of 8 / lane multiples of the
        # depth-window grain (128 classic; 128//planes with shifted planes)
        pvf = jnp.clip(jnp.round(vmid).astype(jnp.int32) - patch_rows // 2,
                       0, H - patch_rows) & ~7
        # color window TOP-anchored at the span's first half-res row (not
        # span-midpoint-anchored): with the patch-coupled default cr_half,
        # [vh_lo & ~7, +cr_half) covers every span the depth slab covers —
        # a midpoint anchor needs ~cr_half/2 slack on BOTH sides, and its
        # 64-row default missed spans of 65 half-rows (a 128-row full-res
        # span straddling row parity), flipping whole batches into the
        # fallback mode for a handful of (frame, block) pairs
        vh_lo = v_lo.astype(jnp.int32) // 2
        pvh = jnp.clip(vh_lo & ~7, 0, H // 2 - cr_half)
        puf = jnp.clip((jnp.round(umid).astype(jnp.int32) - win // 2
                        + grain // 2) & ~(grain - 1), 0, W - win)
        # half-res color window start: a covered block's u-span is
        # [puf, puf+win) -> u//2 in [puf//2, puf//2 + win//2), a span of
        # <= win//2 + 48 <= 128 lanes from the 64-aligned floor of puf//2
        # (the kernel reads the 64-offset windows from a lane-shifted
        # image copy)
        pcs = (puf // 2) & ~63
        covered = _corner_coverage(bounds, intr, patch_rows, win,
                                   pvf, puf, pvh, cr_half, full_color)
        return pvf, pvh, puf, pcs, covered

    E_all = extrinsics.astype(jnp.float32).reshape(n_chunks, FPC, 4, 4)
    ids_rep = jnp.repeat(ids_all[:, None, :], FPC, axis=1)     # (C, FPC, A)
    pvf_all, pvh_all, puf_all, pcs_all, cov_all = jax.vmap(jax.vmap(starts))(
        E_all, ids_rep)
    act_kernel = (act_all & cov_all).astype(jnp.int32).reshape(
        n_chunks, FPC * max_active)
    pvf_all = pvf_all.reshape(n_chunks, FPC * max_active)
    pvh_all = pvh_all.reshape(n_chunks, FPC * max_active)
    puf_all = puf_all.reshape(n_chunks, FPC * max_active)
    pcs_all = pcs_all.reshape(n_chunks, FPC * max_active)
    evec_all = E_all[:, :, :3, :].reshape(n_chunks, FPC * 12)

    # uncovered (frame, block) pairs for the caller's fallback: keep in
    # compact (chunk, frame, slot) form — the full (N, NB) mask is only
    # expanded (by _expand_skipped) when a fallback actually triggers
    skipped_c = act_all & ~cov_all                    # (C, FPC, A) at ids
    skipped_counts = jnp.sum(skipped_c, axis=2, dtype=jnp.int32).reshape(
        n_total)[:n_frames]
    return (ids_all, act_kernel, pvf_all, pvh_all, puf_all, pcs_all,
            evec_all, created_all, skipped_c, skipped_counts)


@functools.partial(jax.jit, static_argnames=("intr", "vol_meta",
                                              "max_active", "interpret",
                                              "patch_rows", "color_res",
                                              "depth_win", "color_rows",
                                              "depth_planes"))
def near_fallback_counts(created, depths, extrinsics,
                         intr: PinholeIntrinsics, vol_meta,
                         max_active: int, interpret: bool = False,
                         patch_rows: int | None = None,
                         color_res: str = "half",
                         depth_win: int | None = None,
                         color_rows: int | None = None,
                         depth_planes: int = 4):
    """Per-frame count of (frame, block) pairs the Pallas kernel's depth
    slab cannot cover (the pairs near_field='fallback' integrates via the
    exact XLA pass). All-zero counts mean near_field='skip' is exact for
    this batch — the fast path for far-field captures (bench.py uses this
    to pick the mode without paying the fallback's mid-pipeline sync).
    patch_rows, color_res, depth_win, and color_rows must match the
    values passed to integrate_frames_pallas."""
    depths = jnp.asarray(depths)
    extrinsics = jnp.asarray(extrinsics)
    H, W = depths.shape[1:]
    (depths,) = _pad_width_128(
        W, _win_planes(depth_win, W, H, depth_planes)[0], depths)
    W = depths.shape[2]
    n_frames = depths.shape[0]
    extrinsics, depths = _pad_to_fpc(extrinsics, depths)
    pr = _effective_patch_rows(patch_rows, H)
    win, planes = _win_planes(depth_win, W, H, depth_planes)
    sched = _block_schedule(created, depths, extrinsics, intr, vol_meta,
                            max_active, pr, win, n_frames, interpret,
                            color_res == "full", planes, color_rows)
    return sched[9]


def _validate_depth_win(depth_win: int | None, color_res: str,
                        depth_planes: int = 4) -> int | None:
    """Shared entry-point validation: allowed values, DEPTH_WIN->None
    normalization, and the full-res-color gate (full-res color reuses the
    depth window at puf, which shifted-plane starts misalign)."""
    if depth_win not in (None, 128, DEPTH_WIN):
        raise ValueError(f"depth_win must be None, 128, or {DEPTH_WIN}: "
                         f"{depth_win!r}")
    if depth_planes not in (2, 4):
        raise ValueError(f"depth_planes must be 2 or 4: {depth_planes!r}")
    if depth_win == DEPTH_WIN:
        depth_win = None
    if depth_win is not None and color_res == "full":
        raise ValueError("depth_win=128 requires color_res='half' (full-res "
                         "color reuses the depth window, which shifted-plane "
                         "starts misalign)")
    return depth_win


def _win_planes(depth_win: int | None, W: int, H: int,
                depth_planes: int = 4) -> Tuple[int, int]:
    """Resolve the depth-window mode: (win, planes). depth_win=None is the
    classic 2-K-tile window at 128-aligned starts; depth_win=128 is the
    one-K-tile window at (128//depth_planes)-grained starts read from
    depth_planes lane-shifted depth copies (4 -> 32-grain, coverage
    ~96 px; 2 -> 64-grain, coverage ~63 px at HALF the extra image
    VMEM/prep). Degenerate widths collapse to a single plane, as does a
    non-8-multiple image height (the plane select is the dynamic sublane
    start plane*H + pvf, whose 8-alignment promise needs 8 | H)."""
    win = min(DEPTH_WIN if depth_win is None else depth_win, W)
    if depth_win is not None and win == 128 and W > 128:
        if H % 8 == 0:
            return 128, depth_planes
        # shifted planes unavailable: fall back to the classic window
        # (win=128 at 128-grain starts would skip nearly every pair)
        return min(DEPTH_WIN, W), 1
    return win, 1


def _integrate_core_impl(tsdf, weight, color, created_in, depths, colors,
                         extrinsics, intr: PinholeIntrinsics, vol_meta,
                         max_active: int, full_color: bool,
                         interpret: bool = False,
                         patch_rows: int | None = None,
                         depth_win: int | None = None,
                         color_rows: int | None = None,
                         depth_planes: int = 4):
    """The batched Pallas fusion pass. Returns updated (tsdf, weight, color,
    created). (frame, block) pairs failing the slab-coverage test are left
    untouched (handled by the caller's fallback pass)."""
    grid_blocks, origin, voxel_size, sdf_trunc = vol_meta
    nb = grid_blocks[0] * grid_blocks[1] * grid_blocks[2]
    H, W = depths.shape[1:]
    # lane-pad images to a 128-multiple width: _block_schedule rounds window
    # starts down to 128-lane multiples, so the clip bound W - win must
    # itself be a multiple of 128 — a W=320 QVGA image would otherwise
    # produce a 64-lane depth-slab start (breaking the kernel's
    # pl.multiple_of(puf, 128) promise) and a 32-lane-misaligned half-res
    # color window. Padded columns have depth 0 == invalid, so they never
    # integrate; validity tests use the true intr.width.
    depths, colors = _pad_width_128(
        W, _win_planes(depth_win, W, H, depth_planes)[0], depths, colors)
    W = depths.shape[2]
    # patch_rows sets the depth-slab dot's M dimension — the dominant MAC
    # cost. The PATCH_ROWS=128 default covers every block beyond ~0.66 m;
    # far-field workloads have much smaller projected v-spans, and
    # auto_patch_rows sizes this down (the exact slab-coverage test routes
    # any uncovered pair to the caller's fallback, so a small value can
    # only cost performance, never correctness).
    patch_rows = _effective_patch_rows(patch_rows, H)
    # half-mode color window rows = the color slab dot's M/3; auto-sized
    # like patch_rows (full-res color reuses the depth slab geometry)
    color_rows = (patch_rows if full_color
                  else _effective_color_rows(color_rows, H, patch_rows))
    # depth_win=128 halves the depth selection dots' K (the dominant MAC
    # cost after auto_patch_rows): fine-grained window starts come from 4
    # lane-shifted depth copies (full-res color reuses the depth window at
    # puf, which planes>1 misaligns — _validate_depth_win gates that
    # combination at every public entry point)
    win, planes = _win_planes(depth_win, W, H, depth_planes)
    assert not (full_color and planes > 1)

    # pre-split bf16 depth (hi + lo rows reassemble exactly in the matmul)
    dhi_all = depths.astype(jnp.bfloat16)
    dlo_all = (depths - dhi_all.astype(jnp.float32)).astype(jnp.bfloat16)

    # quantize to integers first (pack_rgb truncation semantics — the gather
    # path stores uint8 channels); 0..255 integers are exact in bf16
    colors_q = jnp.clip(colors, 0, 255).astype(jnp.uint8)
    if full_color:
        cimg_all = (colors_q.transpose(0, 3, 1, 2)
                    .reshape(depths.shape[0], 3 * H, W).astype(jnp.bfloat16))
        # the shifted copy only exists in half mode; the kernel's full
        # branch never reads it, so pass a tiny dummy
        cimgs_all = jnp.zeros((depths.shape[0], 8, 128), jnp.bfloat16)
    else:
        cimg_all = (colors_q[:, ::2, ::2, :].transpose(0, 3, 1, 2)
                    .reshape(depths.shape[0], 3 * (H // 2), W // 2)
                    .astype(jnp.bfloat16))
        # lane-pad to a 128 multiple so the kernel's 128-aligned window
        # slices are in bounds (padding is never selected: one-hot columns
        # beyond W//2 are all-zero), and build the 64-lane-shifted copy the
        # kernel reads when the block's window start is 64 mod 128
        w2pad = -(-(W // 2) // 128) * 128
        cimg_all = jnp.pad(cimg_all, ((0, 0), (0, 0),
                                      (0, w2pad - W // 2)))
        cimgs_all = jnp.pad(cimg_all[:, :, 64:], ((0, 0), (0, 0), (0, 64)))

    # the creation recurrence is independent of integration, so EVERYTHING
    # per-frame except the volume update itself precomputes batched outside
    # the scan: activity, created evolution (cumulative OR), per-chunk
    # union-active compaction, per-frame activity flags, patch starts, and
    # the exact coverage test
    n_frames = depths.shape[0]
    extrinsics, depths, dhi_all, dlo_all, cimg_all, cimgs_all = _pad_to_fpc(
        extrinsics, depths, dhi_all, dlo_all, cimg_all, cimgs_all)
    n_total = depths.shape[0]
    n_chunks = n_total // FPC

    sched = _block_schedule(created_in, depths, extrinsics, intr, vol_meta,
                            max_active, patch_rows, win, n_frames, interpret,
                            full_color, planes,
                            None if full_color else color_rows)
    (ids_all, act_kernel, pvf_all, pvh_all, puf_all, pcs_all, evec_all,
     created_all, skipped_c, skipped_counts) = sched
    if planes > 1:
        # row-stacked lane-shifted copies: plane p of frame f (rows
        # [p*H, (p+1)*H)) is the image shifted left p*(128//planes) lanes,
        # so the kernel's 128-aligned lane-base read at sublane start
        # p*H + pvf lands the window's true start
        g = 128 // planes

        def mkplanes(img):
            return jnp.concatenate(
                [jnp.pad(img[:, :, p * g:], ((0, 0), (0, 0), (0, p * g)))
                 for p in range(planes)], axis=1)

        dhi_all = mkplanes(dhi_all)
        dlo_all = mkplanes(dlo_all)
    dhi_c = dhi_all.reshape((n_chunks, FPC) + dhi_all.shape[1:])
    dlo_c = dlo_all.reshape((n_chunks, FPC) + dlo_all.shape[1:])
    cimg_c = cimg_all.reshape((n_chunks, FPC) + cimg_all.shape[1:])
    cimgs_c = cimgs_all.reshape((n_chunks, FPC) + cimgs_all.shape[1:])

    def step(carry, frame):
        tsdf, weight, color = carry
        dhi, dlo, cimg, cimgs, ids, act, pvf, pvh, puf, pcs, evec = frame
        t_rows = jnp.take(tsdf, ids, axis=0)
        w_rows = jnp.take(weight, ids, axis=0)
        c_rows = jnp.take(color, ids, axis=0)
        t_new, w_new, c_new = _update_active_blocks(
            t_rows, w_rows, c_rows,
            dhi, dlo, cimg, cimgs, ids, act, pvf, pvh, puf, pcs, evec, intr,
            vol_meta, patch_rows, color_rows, full_color, interpret,
            win=win, planes=planes)
        # no unique_indices: compact_ids pads with duplicate dead-row ids
        tsdf = tsdf.at[ids].set(t_new)
        weight = weight.at[ids].set(w_new)
        color = color.at[ids].set(c_new)
        return (tsdf, weight, color), None

    (tsdf, weight, color), _ = jax.lax.scan(
        step, (tsdf, weight, color),
        (dhi_c, dlo_c, cimg_c, cimgs_c, ids_all, act_kernel, pvf_all,
         pvh_all, puf_all, pcs_all, evec_all))
    created = created_in.at[:nb].set(created_all[n_frames - 1])
    return tsdf, weight, color, created, skipped_counts, skipped_c, ids_all


_integrate_core = functools.partial(
    jax.jit, static_argnames=("intr", "vol_meta", "max_active", "full_color",
                              "interpret", "patch_rows", "depth_win",
                              "color_rows", "depth_planes"),
    donate_argnums=(0, 1, 2))(_integrate_core_impl)


@functools.partial(jax.jit, static_argnames=("nb", "n_frames"))
def _expand_skipped(skipped_c, ids_all, nb: int, n_frames: int):
    """(C, FPC, A) compact skip flags at ids -> (n_frames, nb) full mask."""
    n_chunks, fpc, _ = skipped_c.shape
    full = jnp.zeros((n_chunks, fpc, nb + 1), bool)
    full = jax.vmap(lambda sf, i, sk: sf.at[:, i].max(sk))(
        full, ids_all, skipped_c)
    return full.reshape(n_chunks * fpc, nb + 1)[:n_frames, :nb]


def _near_fallback_impl(tsdf, weight, color, depths, colors_packed,
                        extrinsics, near_mask, intr: PinholeIntrinsics,
                        vol_meta, max_near: int):
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
        # no unique_indices: compact_ids pads with duplicate dead-row ids
        tsdf = tsdf.at[ids].set(t_new)
        weight = weight.at[ids].set(w_new)
        color = color.at[ids].set(c_new)
        return (tsdf, weight, color), None

    (tsdf, weight, color), _ = jax.lax.scan(
        step, (tsdf, weight, color),
        (depths, colors_packed, extrinsics, near_mask))
    return tsdf, weight, color


_near_fallback = functools.partial(
    jax.jit, static_argnames=("intr", "vol_meta", "max_near"),
    donate_argnums=(0, 1, 2))(_near_fallback_impl)


def integrate_frames_pallas(vol: BlockTSDFVolume, depths: jnp.ndarray,
                            colors: jnp.ndarray, extrinsics: jnp.ndarray,
                            intr: PinholeIntrinsics, max_active: int = 2048,
                            interpret: bool = False,
                            color_res: str = "half",
                            near_field: str = "fallback",
                            patch_rows: int | None = None,
                            depth_win: int | None = None,
                            color_rows: int | None = None,
                            depth_planes: int = 4
                            ) -> BlockTSDFVolume:
    """Fuse a batch of frames through the Pallas block kernel.

    Same contract as tsdf_block.integrate_frames_sparse, to bf16-split
    tolerance (the tested contract: |tsdf| diff <= 1e-3 with <= 1.5%
    boundary-validity flips — the bf16 hi/lo depth split admits rare
    sdf-threshold flips; selection itself is exact given identical
    validity). color_res="half" (default) samples color from a
    half-resolution pyramid (~1-pixel error, faster); "full" samples at
    full resolution with the same one-hot selection.

    near_field: "fallback" (default) integrates blocks too close to the
    camera for the kernel's depth slab via an exact XLA pass (zero lost
    integrations); "skip" drops those (frame, block) pairs (fastest, exact
    for captures where everything is > ~0.45 m away); the count of fallback
    frames is fetched with one small host sync that overlaps the main pass.

    patch_rows: depth-slab rows = the M dimension of the dominant
    selection dots. None = the PATCH_ROWS default (covers every block at
    >= ~0.66 m); auto_patch_rows sizes it to the workload's projected
    v-spans — far-field captures run ~2x fewer depth MACs. Uncovered
    pairs fall back exactly, whatever the value.

    depth_win: depth-slab lane window = the K dimension of the selection
    dots. None = the 256-lane default (window starts must be 128-aligned,
    so guaranteed coverage is spans <= ~128 px); 128 halves the dots' K
    and reads the windows at 32-grained starts from 4 lane-shifted depth
    copies (coverage spans <= ~96 px — far-field workloads; requires
    color_res="half"). depth_planes=2 uses 64-grain starts from a single
    extra shifted copy (coverage ~63 px, half the extra image VMEM/prep).
    auto_depth_config picks the cheapest setting with no extra fallbacks.
    Uncovered pairs fall back exactly, whatever the value.

    color_rows: half-res color window rows = the color slab dot's M/3.
    None = the patch-coupled default 8*(patch_rows//16 + 1), which covers
    every pair the depth slab covers (the window is top-anchored at the
    span's first half-res row); auto_color_rows sizes it further down to
    the workload's projected half-res v-spans (ignored with
    color_res="full", which reuses the depth slab geometry). Uncovered
    pairs fall back exactly, whatever the value.
    """
    if color_res not in ("half", "full"):
        raise ValueError(f"color_res must be 'half' or 'full': {color_res!r}")
    if near_field not in ("fallback", "skip"):
        raise ValueError(
            f"near_field must be 'fallback' or 'skip': {near_field!r}")
    if not interpret and max_active > smem_max_active():
        # The per-(frame, block) schedule arrays live in SMEM (1 MiB/core):
        # 4 bytes x max_active x (1 + 5*FPC) ints. A very large object (the
        # full_room table group spans ~3 m -> ~9.9k active rows = 1.58 MiB)
        # fails the remote compile with an SMEM OOM. The XLA block-sparse
        # path has no static schedule and the same semantics (the Pallas
        # kernel's tested contract is bf16-split tolerance against it), so
        # route oversized workloads there instead of failing to compile.
        from otslam_tpu.kernels.tsdf_block import integrate_frames_sparse
        return integrate_frames_sparse(vol, depths, colors, extrinsics,
                                       intr, max_active=max_active)
    depth_win = _validate_depth_win(depth_win, color_res, depth_planes)
    depths = jnp.asarray(depths)
    colors = jnp.asarray(colors)
    extrinsics = jnp.asarray(extrinsics)
    vol_meta = (vol.grid_blocks, vol.origin, vol.voxel_size, vol.sdf_trunc)

    (tsdf, weight, color, created, skipped_counts, skipped_c,
     ids_all) = _integrate_core(
        vol.tsdf, vol.weight, vol.color, vol.created, depths, colors,
        extrinsics, intr, vol_meta, max_active, color_res == "full",
        interpret, patch_rows, depth_win, color_rows, depth_planes)

    if near_field == "fallback":
        counts = np.asarray(skipped_counts)           # host sync (small)
        if counts.max() > 0:
            nb = vol.num_blocks
            skipped = _expand_skipped(skipped_c, ids_all, nb,
                                      depths.shape[0])
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
