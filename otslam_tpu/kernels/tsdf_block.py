"""Block-sparse TSDF fusion — the fast path.

Open3D's ``ScalableTSDFVolume`` (the reference's volume type,
reconstruct_rgbd.py:79-83) is a hash map of 16^3 voxel "volume units" created
lazily near observed surfaces; only existing units are integrated. This module
is the TPU-native equivalent:

* The volume is a **fixed grid of 8^3 voxel blocks stored block-major**:
  ``tsdf/weight: (NB+1, 512)`` where row b holds block b's voxels and the last
  row is a dead row for padding (gather/scatter there is a no-op). Block-major
  rows make the active working set move as contiguous row DMAs — measured ~6x
  faster than element gathers on TPU.
* A persistent ``created`` bitmask replaces the hash map: a block is created
  when it first falls within ``sdf_trunc`` (+ a one-block skirt) of an
  observed surface, and every created block inside the frustum is integrated
  each frame (free-space carving inside created blocks, like Open3D).
* Per frame, block activity is decided entirely with fused elementwise math
  over all blocks plus a min/max depth mip pyramid — no data-dependent
  shapes. Active block ids are compacted to a static ``max_active`` capacity
  with ``nonzero(size=...)``.
* Only active blocks are gathered, updated (voxel-projection sampling of the
  depth/color images), and scattered back. The depth sample is the remaining
  element-gather; kernels/tsdf_pallas.py replaces it with an MXU one-hot
  sampling kernel.

Numerically the update is identical to kernels/tsdf.py (same running weighted
mean); tests assert dense/sparse agreement on the created region.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from otslam_tpu.config import TSDFConfig
from otslam_tpu.core.camera import PinholeIntrinsics
from otslam_tpu.kernels.tsdf import TSDFVolume

BLOCK = 8               # voxels per block edge
BLOCK_VOXELS = BLOCK ** 3


@jax.tree_util.register_pytree_node_class
@dataclass
class BlockTSDFVolume:
    """Block-major sparse TSDF volume.

    tsdf/weight: (NB+1, 512) f32; color: (NB+1, 1536) f32 — per-block RGB
    laid out channel-major in one row ([R*512 | G*512 | B*512], values in
    [0,255]) so the whole block state moves as two row DMAs; created: (NB+1,)
    bool. Row NB is the dead padding row.
    """

    tsdf: jnp.ndarray
    weight: jnp.ndarray
    color: jnp.ndarray
    created: jnp.ndarray
    origin: Tuple[float, float, float]
    voxel_size: float
    sdf_trunc: float
    grid_blocks: Tuple[int, int, int]

    def tree_flatten(self):
        return (self.tsdf, self.weight, self.color, self.created), (
            self.origin, self.voxel_size, self.sdf_trunc, self.grid_blocks)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0], aux[1], aux[2], aux[3])

    @property
    def num_blocks(self) -> int:
        bx, by, bz = self.grid_blocks
        return bx * by * bz


def make_block_volume(cfg: TSDFConfig, dtype=jnp.float32) -> BlockTSDFVolume:
    X, Y, Z = cfg.dims
    if any(d % BLOCK for d in cfg.dims):
        raise ValueError(f"dims {cfg.dims} must be multiples of {BLOCK}")
    gb = (X // BLOCK, Y // BLOCK, Z // BLOCK)
    nb = gb[0] * gb[1] * gb[2]
    return BlockTSDFVolume(
        tsdf=jnp.zeros((nb + 1, BLOCK_VOXELS), dtype),
        weight=jnp.zeros((nb + 1, BLOCK_VOXELS), dtype),
        color=jnp.zeros((nb + 1, 3 * BLOCK_VOXELS), dtype),
        created=jnp.zeros((nb + 1,), bool),
        origin=tuple(float(o) for o in cfg.origin),
        voxel_size=float(cfg.voxel_size),
        sdf_trunc=float(cfg.sdf_trunc),
        grid_blocks=gb,
    )


def _block_centers(vol: BlockTSDFVolume):
    """(NB,) world-space block center coordinates, one array per axis."""
    bx, by, bz = vol.grid_blocks
    ids = jnp.arange(bx * by * bz)
    ix = ids // (by * bz)
    iy = (ids // bz) % by
    iz = ids % bz
    half = 0.5 * BLOCK * vol.voxel_size
    cx = vol.origin[0] + ix.astype(jnp.float32) * BLOCK * vol.voxel_size + half
    cy = vol.origin[1] + iy.astype(jnp.float32) * BLOCK * vol.voxel_size + half
    cz = vol.origin[2] + iz.astype(jnp.float32) * BLOCK * vol.voxel_size + half
    return cx, cy, cz


_MIP_BIG = 1.0e30  # finite "empty tile" min sentinel: the Pallas classify
# kernel selects mip values with multiply-reduces, where an inf would turn
# 0 * inf into NaN; 1e30 behaves like inf in every band/visible comparison


def _bf16_conservative(v: jnp.ndarray, is_max: bool) -> jnp.ndarray:
    """Round mip bounds to bf16-representable f32 values, padded so the
    rounding can only widen the bound (mins move down, maxes up). Keeps the
    XLA row-gather select and the Pallas one-hot matmul select (which runs
    the table through a bf16 MXU dot) numerically identical."""
    pad = jnp.abs(v) * jnp.float32(2 ** -8)
    v2 = jnp.where(jnp.isfinite(v), v + (pad if is_max else -pad), v)
    # preserve the exact 0.0 "no depth" sentinel (has_depth = bmax > 0)
    return v2.astype(jnp.bfloat16).astype(jnp.float32)


def _depth_mips(depth: jnp.ndarray, tile: int = 16):
    """Dilated min/max depth mip, packed for a single row-gather.

    Returns a (th*tw, 8) table: per level-0 tile (tile x tile px) the columns
    are [dmin0, dmax0, dmin1, dmax1, pad...] where level 1 is the tile's 4x4
    parent. Packing both levels in one row means block classification needs
    exactly one row-gather (measured ~12x faster than 4 element-gathers on
    TPU). Invalid pixels are excluded (min via the finite _MIP_BIG sentinel,
    max via 0); a 3x3 dilation makes border-straddling footprints
    conservative. All bounds are
    bf16-safe (see _bf16_conservative) so the Pallas classify kernel's
    matmul select returns the same values.
    """
    H, W = depth.shape
    th, tw = -(-H // tile), -(-W // tile)
    dpad = jnp.pad(depth, ((0, th * tile - H), (0, tw * tile - W)))
    d = dpad.reshape(th, tile, tw, tile)
    valid = d > 0
    dmin0 = jnp.min(jnp.where(valid, d, _MIP_BIG), axis=(1, 3))
    dmax0 = jnp.max(jnp.where(valid, d, 0.0), axis=(1, 3))

    def pool3(m, reducer, pad_val):
        p = jnp.pad(m, 1, constant_values=pad_val)
        stack = jnp.stack([p[i:i + th, j:j + tw] for i in range(3) for j in range(3)])
        return reducer(stack, axis=0)
    dmin0 = pool3(dmin0, jnp.min, _MIP_BIG)
    dmax0 = pool3(dmax0, jnp.max, 0.0)

    def coarsen(mn, mx, h, w, f):
        """f-x coarser level with 3x3 dilation, broadcast back to level 0."""
        ph, pw = (-h) % f, (-w) % f
        mn_p = jnp.pad(mn, ((0, ph), (0, pw)), constant_values=_MIP_BIG)
        mx_p = jnp.pad(mx, ((0, ph), (0, pw)), constant_values=0.0)
        lh, lw = (h + ph) // f, (w + pw) // f
        mn_c = jnp.min(mn_p.reshape(lh, f, lw, f), axis=(1, 3))
        mx_c = jnp.max(mx_p.reshape(lh, f, lw, f), axis=(1, 3))

        def pool3(m, reducer, pad_val):
            p = jnp.pad(m, 1, constant_values=pad_val)
            stack = jnp.stack([p[i:i + lh, j:j + lw]
                               for i in range(3) for j in range(3)])
            return reducer(stack, axis=0)
        mn_c = pool3(mn_c, jnp.min, _MIP_BIG)
        mx_c = pool3(mx_c, jnp.max, 0.0)
        mn_f = jnp.repeat(jnp.repeat(mn_c, f, 0), f, 1)[:h, :w]
        mx_f = jnp.repeat(jnp.repeat(mx_c, f, 0), f, 1)[:h, :w]
        return mn_f, mx_f

    # levels 1 and 2: 2x and 4x coarser tiles (32 px and 64 px at tile=16);
    # the finest adequate level keeps the creation band tight
    dmin1, dmax1 = coarsen(dmin0, dmax0, th, tw, 2)
    dmin2, dmax2 = coarsen(dmin0, dmax0, th, tw, 4)
    levels = [_bf16_conservative(m, i % 2 == 1) for i, m in
              enumerate([dmin0, dmax0, dmin1, dmax1, dmin2, dmax2])]
    table = jnp.stack(levels, axis=-1)
    table = jnp.pad(table.reshape(th * tw, 6), ((0, 0), (0, 2)))
    return table, th, tw


def depth_mip_planes(depth: jnp.ndarray, tile: int = 16):
    """The same six mip bounds as `_depth_mips` laid out as level planes for
    the Pallas classify kernel: (6*32, tw) bf16, each level's (th, tw) image
    zero-padded to 32 rows (static sublane-aligned slices in the kernel).
    Values are identical to the packed table's (both bf16-safe). Also
    returns the global (gmin, gmax) bounds the too-big-footprint fallback
    uses (same reduction as _active_blocks)."""
    table, th, tw = _depth_mips(depth, tile)
    imgs = table[:, :6].reshape(th, tw, 6)
    rows = 32
    assert th <= rows, f"mip height {th} exceeds the kernel's level stride"
    twp = -(-tw // 128) * 128        # lane-aligned contraction dim
    # f32 carrier (values are bf16-exact): XLA picks packed layouts for
    # computed bf16 arrays that Mosaic rejects as dot operands ("Bad lhs
    # type"); the kernel casts to bf16 in-register instead
    out = jnp.zeros((6 * rows, twp), jnp.float32)
    for c in range(6):
        out = out.at[c * rows:c * rows + th, :tw].set(imgs[:, :, c])
    gbounds = jnp.stack([jnp.min(table[:, 4]), jnp.max(table[:, 5])])
    return out, gbounds, th, tw


def _active_blocks(vol: BlockTSDFVolume, depth: jnp.ndarray,
                   extrinsic: jnp.ndarray, intr: PinholeIntrinsics):
    """Per-frame block classification.

    Returns (band, visible): band = block within the truncation band of this
    frame's surface (drives creation); visible = block inside the frustum with
    plausible depth overlap (drives integration of created blocks).
    """
    cx, cy, cz = _block_centers(vol)
    E = extrinsic.astype(jnp.float32)
    px = E[0, 0] * cx + E[0, 1] * cy + E[0, 2] * cz + E[0, 3]
    py = E[1, 0] * cx + E[1, 1] * cy + E[1, 2] * cz + E[1, 3]
    pz = E[2, 0] * cx + E[2, 1] * cy + E[2, 2] * cz + E[2, 3]

    r = 0.8661 * BLOCK * vol.voxel_size  # block bounding-sphere radius (+eps)
    in_front = pz > r * 0.5
    zsafe = jnp.where(pz > 1e-6, pz, 1e-6)
    u = intr.fx * px / zsafe + intr.cx
    v = intr.fy * py / zsafe + intr.cy
    # pixel slack: projected bounding-sphere radius
    slack = jnp.maximum(intr.fx, intr.fy) * r / zsafe + 1.0
    in_frustum = (in_front & (u + slack >= 0) & (u - slack < intr.width)
                  & (v + slack >= 0) & (v - slack < intr.height))

    tile = 16
    table, th, tw = _depth_mips(depth, tile)
    # finest adequate mip level by footprint size (each level l covers a
    # dilated (3*2^l*tile) window, guaranteeing +/- 2^l*tile of margin);
    # one packed row-gather serves all levels
    tu0 = jnp.clip((u / tile).astype(jnp.int32), 0, tw - 1)
    tv0 = jnp.clip((v / tile).astype(jnp.int32), 0, th - 1)
    rows = jnp.take(table, tv0 * tw + tu0, axis=0)
    l1 = slack > tile
    l2 = slack > 2 * tile
    bmin = jnp.where(l2, rows[:, 4], jnp.where(l1, rows[:, 2], rows[:, 0]))
    bmax = jnp.where(l2, rows[:, 5], jnp.where(l1, rows[:, 3], rows[:, 1]))
    # footprints beyond the coarsest level: be conservative (whole image);
    # global bounds come from the full table (not the gathered subset) so
    # the Pallas classify kernel can mirror them exactly
    too_big = slack > 4 * tile
    gmin = jnp.min(table[:, 4])
    gmax = jnp.max(table[:, 5])
    bmin = jnp.where(too_big, gmin, bmin)
    bmax = jnp.where(too_big, gmax, bmax)

    has_depth = bmax > 0
    band = (in_frustum & has_depth
            & (pz + r >= bmin - vol.sdf_trunc)
            & (pz - r <= bmax + vol.sdf_trunc))
    # visible: anything in the frustum in front of (or at) the far surface
    visible = in_frustum & has_depth & (pz - r <= bmax + vol.sdf_trunc)
    return band, visible


def _voxel_world_coords(vol: BlockTSDFVolume, ids: jnp.ndarray):
    """World coords of the 512 voxel centers of each block id: (A, 512) x 3."""
    bx, by, bz = vol.grid_blocks
    ix = ids // (by * bz)
    iy = (ids // bz) % by
    iz = ids % bz
    l = jnp.arange(BLOCK_VOXELS)
    lx = (l // (BLOCK * BLOCK))[None, :]
    ly = ((l // BLOCK) % BLOCK)[None, :]
    lz = (l % BLOCK)[None, :]
    vs = vol.voxel_size
    wx = vol.origin[0] + ((ix[:, None] * BLOCK + lx).astype(jnp.float32) + 0.5) * vs
    wy = vol.origin[1] + ((iy[:, None] * BLOCK + ly).astype(jnp.float32) + 0.5) * vs
    wz = vol.origin[2] + ((iz[:, None] * BLOCK + lz).astype(jnp.float32) + 0.5) * vs
    return wx, wy, wz


def _sample_frame(wx, wy, wz, depth, color_packed, extrinsic,
                  intr: PinholeIntrinsics, sdf_trunc: float):
    """Voxel-projection sampling for (A, 512) voxel coords.

    color_packed: (H, W) uint32 with RGB packed in the low 24 bits (single
    gather for all three channels). Returns (tsdf_obs, w_obs, col_obs(3,A,512)).
    """
    E = extrinsic.astype(jnp.float32)
    px = E[0, 0] * wx + E[0, 1] * wy + E[0, 2] * wz + E[0, 3]
    py = E[1, 0] * wx + E[1, 1] * wy + E[1, 2] * wz + E[1, 3]
    pz = E[2, 0] * wx + E[2, 1] * wy + E[2, 2] * wz + E[2, 3]
    in_front = pz > 0
    zsafe = jnp.where(in_front, pz, 1.0)
    u = jnp.round(intr.fx * px / zsafe + intr.cx).astype(jnp.int32)
    v = jnp.round(intr.fy * py / zsafe + intr.cy).astype(jnp.int32)
    inb = in_front & (u >= 0) & (u < intr.width) & (v >= 0) & (v < intr.height)
    flat = (jnp.clip(v, 0, intr.height - 1) * intr.width
            + jnp.clip(u, 0, intr.width - 1))
    d = jnp.take(depth.reshape(-1), flat)
    packed = jnp.take(color_packed.reshape(-1), flat)

    sdf = d - pz
    valid = inb & (d > 0) & (sdf >= -sdf_trunc)
    tsdf_obs = jnp.where(valid, jnp.minimum(sdf / sdf_trunc, 1.0), 0.0)
    w_obs = valid.astype(jnp.float32)
    r = (packed & 0xFF).astype(jnp.float32)
    g = ((packed >> 8) & 0xFF).astype(jnp.float32)
    b = ((packed >> 16) & 0xFF).astype(jnp.float32)
    # channel-major flat color rows: (A, 1536)
    col_obs = jnp.concatenate([r, g, b], axis=-1) * jnp.tile(w_obs, (1, 3))
    return tsdf_obs, w_obs, col_obs


def compact_ids(active: jnp.ndarray, max_active: int, nb: int) -> jnp.ndarray:
    """Compact active block indices to a static capacity, padded with ``nb``
    (the dead row), ids in ascending order. top_k over (id if active else
    nb) beats both ``jnp.nonzero(size=...)`` and a stable argsort on TPU
    (top_k is O(n log k) vs the full sort's O(n log^2 n))."""
    ids = jnp.arange(active.shape[0], dtype=jnp.int32)
    keys = jnp.where(active, ids, nb)
    k = min(max_active, active.shape[0])
    out = -jax.lax.top_k(-keys, k)[0]      # k smallest keys, ascending
    if k < max_active:                     # capacity exceeds the block count
        out = jnp.pad(out, (0, max_active - k), constant_values=nb)
    return out.astype(jnp.int32)


def pack_rgb(color: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) float [0,255] or uint8 -> (H, W) uint32 packed 0x00BBGGRR."""
    c = jnp.clip(color, 0, 255).astype(jnp.uint32)
    return c[..., 0] | (c[..., 1] << 8) | (c[..., 2] << 16)


@partial(jax.jit, static_argnames=("intr", "max_active"), donate_argnums=(0,))
def integrate_frames_sparse(vol: BlockTSDFVolume, depths: jnp.ndarray,
                            colors: jnp.ndarray, extrinsics: jnp.ndarray,
                            intr: PinholeIntrinsics,
                            max_active: int = 4096) -> BlockTSDFVolume:
    """Fuse a batch of frames through the block-sparse path.

    depths (N,H,W) f32 meters (0 invalid), colors (N,H,W,3) [0,255],
    extrinsics (N,4,4) world->camera. One dispatch for the whole batch.
    """
    nb = vol.num_blocks
    color_packed = jax.vmap(pack_rgb)(colors)

    def step(carry, frame):
        tsdf, weight, color, created = carry
        depth, cpacked, extrinsic = frame
        v = BlockTSDFVolume(tsdf, weight, color, created, vol.origin,
                            vol.voxel_size, vol.sdf_trunc, vol.grid_blocks)
        band, visible = _active_blocks(v, depth, extrinsic, intr)
        created_new = created.at[:nb].set(created[:nb] | band)
        active = created_new[:nb] & visible
        ids = compact_ids(active, max_active, nb)

        wx, wy, wz = _voxel_world_coords(v, ids)
        tsdf_obs, w_obs, col_obs = _sample_frame(
            wx, wy, wz, depth, cpacked, extrinsic, intr, vol.sdf_trunc)

        t_rows = jnp.take(tsdf, ids, axis=0)
        w_rows = jnp.take(weight, ids, axis=0)
        c_rows = jnp.take(color, ids, axis=0)

        w_new = w_rows + w_obs
        denom = jnp.maximum(w_new, 1.0)
        t_new = (t_rows * w_rows + tsdf_obs * w_obs) / denom
        w3 = jnp.tile(w_rows, (1, 3))
        c_new = (c_rows * w3 + col_obs) / jnp.tile(denom, (1, 3))

        # NOTE: no unique_indices — compact_ids pads with the dead-row index
        # nb repeated, and asserting uniqueness over duplicate indices is
        # undefined behavior per the JAX scatter docs (every duplicate does
        # write the identical row, but correctness must not rest on that)
        tsdf = tsdf.at[ids].set(t_new)
        weight = weight.at[ids].set(w_new)
        color = color.at[ids].set(c_new)
        return (tsdf, weight, color, created_new), None

    init = (vol.tsdf, vol.weight, vol.color, vol.created)
    (tsdf, weight, color, created), _ = jax.lax.scan(
        init=init, xs=(depths, color_packed, extrinsics), f=step)
    # compact_ids pads with nb, so every step scatters (garbage) updates into
    # the dead row; restore the row-nb == 0 invariant that extraction and
    # neighbor reads rely on.
    tsdf = tsdf.at[nb].set(0.0)
    weight = weight.at[nb].set(0.0)
    color = color.at[nb].set(0.0)
    return BlockTSDFVolume(tsdf, weight, color, created, vol.origin,
                           vol.voxel_size, vol.sdf_trunc, vol.grid_blocks)


@jax.jit
def block_to_dense(vol: BlockTSDFVolume) -> TSDFVolume:
    """Expand the block volume to a dense TSDFVolume (for extraction etc.)."""
    bx, by, bz = vol.grid_blocks
    X, Y, Z = bx * BLOCK, by * BLOCK, bz * BLOCK

    def expand(rows):  # (NB+1, 512) -> (X, Y, Z)
        g = rows[:-1].reshape(bx, by, bz, BLOCK, BLOCK, BLOCK)
        return g.transpose(0, 3, 1, 4, 2, 5).reshape(X, Y, Z)

    color = jnp.stack([expand(vol.color[:, c * BLOCK_VOXELS:(c + 1) * BLOCK_VOXELS])
                       for c in range(3)])
    return TSDFVolume(expand(vol.tsdf), expand(vol.weight), color,
                      vol.origin, vol.voxel_size, vol.sdf_trunc)


@partial(jax.jit, static_argnames=("cfg",))
def dense_to_block(dense: TSDFVolume, cfg: TSDFConfig) -> BlockTSDFVolume:
    """Pack a dense volume into block-major form (created = any weight > 0)."""
    vol = make_block_volume(cfg, dense.tsdf.dtype)
    bx, by, bz = vol.grid_blocks

    def collapse(g):  # (X, Y, Z) -> (NB, 512)
        r = g.reshape(bx, BLOCK, by, BLOCK, bz, BLOCK)
        return r.transpose(0, 2, 4, 1, 3, 5).reshape(bx * by * bz, BLOCK_VOXELS)

    tsdf = vol.tsdf.at[:-1].set(collapse(dense.tsdf))
    weight = vol.weight.at[:-1].set(collapse(dense.weight))
    color = vol.color.at[:-1].set(
        jnp.concatenate([collapse(dense.color[c]) for c in range(3)], axis=-1))
    created = vol.created.at[:-1].set(jnp.any(collapse(dense.weight) > 0, axis=1))
    return BlockTSDFVolume(tsdf, weight, color, created, vol.origin,
                           vol.voxel_size, vol.sdf_trunc, vol.grid_blocks)


# ---------------------------------------------------------------------------
# sparse surface extraction (created blocks only — no densification)
# ---------------------------------------------------------------------------

def _neighbor_block_ids(vol: BlockTSDFVolume, ids: jnp.ndarray):
    """Per axis, the +1-neighbor block id of each id (dead row when at the
    grid boundary or for padding ids)."""
    bx, by, bz = vol.grid_blocks
    nb = bx * by * bz
    ix = ids // (by * bz)
    iy = (ids // bz) % by
    iz = ids % bz
    ok = ids < nb
    nx = jnp.where(ok & (ix < bx - 1), ids + by * bz, nb)
    ny = jnp.where(ok & (iy < by - 1), ids + bz, nb)
    nz = jnp.where(ok & (iz < bz - 1), ids + 1, nb)
    return nx, ny, nz


def _build_corner_lane_plan():
    """Lane-level plan for building per-corner fields from (M, 512) block
    rows: for cube corner offset o = (dx, dy, dz), the corner value of
    voxel l = lx*64 + ly*8 + lz is a LANE SHIFT of either the block's own
    row or one of its 7 (+x/+y/+z combo) halo rows — which one depends on
    which coordinates sit at the block boundary (==7). Per corner, per
    wrap-combo w ⊆ nonzero(o): (w, lane shift, static (512,) mask); the
    masks partition the lanes. 27 masked rolls total across the 8 corners,
    all on (M, 512) arrays whose 512-lane minor dim tiles perfectly — the
    previous (M, 9, 9, 9) halo expansion + (M*512, 8) stack paid a 14-16x
    lane-padding tax on every pass (measured 3.35 ms of a 13.7 ms
    256^3-volume mesh extraction for tsdf+weight alone)."""
    import numpy as np

    lane = np.arange(BLOCK_VOXELS)
    coords = (lane // (BLOCK * BLOCK), (lane // BLOCK) % BLOCK, lane % BLOCK)
    strides = (BLOCK * BLOCK, BLOCK, 1)
    top = BLOCK - 1
    plan = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                o = (dx, dy, dz)
                axes = [a for a in range(3) if o[a]]
                entries = []
                for bits in range(1 << len(axes)):
                    w = [0, 0, 0]
                    mask = np.ones(BLOCK_VOXELS, bool)
                    shift = 0
                    for j, a in enumerate(axes):
                        wrapped = (bits >> j) & 1
                        w[a] = wrapped
                        mask &= ((coords[a] == top) if wrapped
                                 else (coords[a] < top))
                        shift += (1 - BLOCK * wrapped) * strides[a]
                    entries.append((tuple(w), int(shift), mask))
                plan.append(entries)
    return plan


_CORNER_LANE_PLAN = _build_corner_lane_plan()
# plan index for cube corner (dx, dy, dz) — z fastest, matching _CORNERS
_CORNER_INDEX = {(dx, dy, dz): dx * 4 + dy * 2 + dz
                 for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)}


def _row_sets(arr, ids, halo_ids):
    """dict w -> (M, 512) gathered field rows: w=(0,0,0) the block's own
    row, plus +offset halo rows for every key in halo_ids (dead row =
    zeros at boundaries and for padding ids)."""
    out = {(0, 0, 0): jnp.take(arr, ids, axis=0)}
    for w, hid in halo_ids.items():
        out[w] = jnp.take(arr, hid, axis=0)
    return out


def _corner_field(rows, corner):
    """(M, 512) field values at cube corner `corner` of every voxel, from
    _row_sets output via the static lane plan (masked rolls; masks
    partition, so a where-chain covers every lane exactly once)."""
    entries = _CORNER_LANE_PLAN[_CORNER_INDEX[tuple(corner)]]
    w0, shift0, _ = entries[0]
    acc = jnp.roll(rows[w0], -shift0, axis=1)
    for w, shift, mask in entries[1:]:
        acc = jnp.where(jnp.asarray(mask)[None, :],
                        jnp.roll(rows[w], -shift, axis=1), acc)
    return acc


def _corner_fields(rows):
    """(8, M, 512): _corner_field for all 8 cube corners, z fastest."""
    return jnp.stack([_corner_field(rows, (dx, dy, dz))
                      for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
                     axis=0)


@partial(jax.jit, static_argnames=("capacity", "max_blocks", "with_normals"))
def extract_surface_points_sparse(vol: BlockTSDFVolume,
                                  capacity: int = 1_000_000,
                                  max_blocks: int = 8192,
                                  with_normals: bool = False):
    """TSDF zero-crossing extraction directly from the block volume.

    Touches only created blocks (plus their +axis neighbor rows), so the cost
    scales with the surface, not the grid — no densification, no grid-sized
    compaction. Semantics match kernels/tsdf.extract_surface_points.

    Returns (points (C,3), colors (C,3) [0,1], mask (C,), [normals]).
    """
    nb = vol.num_blocks
    bx, by, bz = vol.grid_blocks
    ids = compact_ids(vol.created[:nb], max_blocks, nb)     # (M,)
    M = max_blocks
    V = BLOCK_VOXELS

    # +axis-shifted fields as lane-rolled (M, 512) rows (see
    # _build_corner_lane_plan: the +1 shift along axis a IS the
    # single-axis cube corner field) — the former (M, 8, 8, 8) working
    # tensors paid a 16x lane-padding tax on every pass
    nxi, nyi, nzi = _neighbor_block_ids(vol, ids)
    _AX_CORNERS = ((1, 0, 0), (0, 1, 0), (0, 0, 1))
    nbr = dict(zip(_AX_CORNERS, (nxi, nyi, nzi)))

    def shifted3(arr, self_rows):
        rows = {(0, 0, 0): self_rows}
        rows.update({c: jnp.take(arr, nbr[c], axis=0) for c in _AX_CORNERS})
        return jnp.stack([_corner_field(rows, c) for c in _AX_CORNERS])

    t_s = jnp.take(vol.tsdf, ids, axis=0)                    # (M, 512)
    w_s = jnp.take(vol.weight, ids, axis=0)
    # padding entries of `ids` all alias the dead row; mask them out so the
    # extraction is correct even if a caller hands in a volume whose dead row
    # was dirtied (integration restores it, but keep this self-contained)
    w_s = w_s * (ids < nb).astype(w_s.dtype)[:, None]
    t_b = shifted3(vol.tsdf, t_s)                            # (3, M, 512)
    w_b = shifted3(vol.weight, w_s)

    cross = (w_s[None] > 0) & (w_b > 0) & (t_s[None] * t_b < 0)  # (3, M, 512)
    flat_mask = cross.reshape(-1)
    count = jnp.sum(flat_mask, dtype=jnp.int32)
    # stable argsort compaction (see tsdf.extract_surface_points): faster than
    # nonzero(size=...) on TPU, same ascending order and 0-fill semantics
    sel = jnp.argsort(~flat_mask, stable=True)[:capacity]
    if sel.shape[0] < capacity:  # capacity exceeds the block crossing slots
        sel = jnp.pad(sel, (0, capacity - sel.shape[0]))
    out_mask = jnp.arange(capacity) < count
    sel = jnp.where(out_mask, sel, 0)

    axis = sel // (M * V)
    ci = (sel // V) % M
    l = sel % V
    lx = l // (BLOCK * BLOCK)
    ly = (l // BLOCK) % BLOCK
    lz = l % BLOCK

    bid = jnp.take(ids, ci)
    ix = bid // (by * bz)
    iy = (bid // bz) % by
    iz = bid % bz
    f32 = jnp.float32
    base = jnp.stack([
        vol.origin[0] + ((ix * BLOCK + lx).astype(f32) + 0.5) * vol.voxel_size,
        vol.origin[1] + ((iy * BLOCK + ly).astype(f32) + 0.5) * vol.voxel_size,
        vol.origin[2] + ((iz * BLOCK + lz).astype(f32) + 0.5) * vol.voxel_size,
    ], axis=-1)

    flat_sv = ci * V + l
    a = jnp.take(t_s.reshape(-1), flat_sv)
    b = jnp.take(t_b.reshape(-1), sel)
    denom = a - b
    frac = jnp.clip(a / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0), 0.0, 1.0)
    offset = jax.nn.one_hot(axis, 3, dtype=f32) * (frac * vol.voxel_size)[:, None]
    points = base + offset

    # colors: lerp channel-major flat rows (self and shifted neighbor)
    cols_a, cols_b = [], []
    for c in range(3):
        ch = vol.color[:, c * V:(c + 1) * V]
        c_s = jnp.take(ch, ids, axis=0)                      # (M, 512)
        c_bn = shifted3(ch, c_s)                             # (3, M, 512)
        cols_a.append(jnp.take(c_s.reshape(-1), flat_sv))
        cols_b.append(jnp.take(c_bn.reshape(-1), sel))
    ca = jnp.stack(cols_a, axis=-1)
    cb = jnp.stack(cols_b, axis=-1)
    colors = jnp.clip((ca * (1.0 - frac[:, None]) + cb * frac[:, None]) / 255.0,
                      0.0, 1.0)

    if not with_normals:
        return points, colors, out_mask

    # forward-difference gradient at the base voxel from the shifted fields
    grad = t_b - t_s[None]                                   # (3, M, 8,8,8)
    g = jnp.stack([jnp.take(grad[k].reshape(-1), flat_sv) for k in range(3)],
                  axis=-1)
    norm = jnp.linalg.norm(g, axis=-1, keepdims=True)
    normals = g / jnp.where(norm > 1e-12, norm, 1.0)
    return points, colors, out_mask, normals
