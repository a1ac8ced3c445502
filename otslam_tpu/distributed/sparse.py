"""Multi-chip sharding of the BLOCK-SPARSE (Pallas) fusion path.

`distributed/sharding.py` scales the dense `kernels/tsdf.py` grid; this
module scales the flagship block-sparse path (`kernels/tsdf_pallas.py` /
`kernels/tsdf_block.py`) — the kernel that produces the headline fused
frames/s number — over a device mesh. The workload contract is the
reference's TSDF hot loop (reconstruct_rgbd_filter.py:91-105).

Decomposition (same algebra as the dense path, block-major state):

* **frame (data) axis** — frames shard contiguously across devices. The
  only cross-frame coupling in the sparse path is the CREATION recurrence
  (created |= band, sequential in frame order; active = created & visible).
  Each device computes its local per-frame block bands, the per-device band
  unions are all-gathered (an (nd, NB) bool array — a few hundred KB), and
  every device ORs the unions of the devices BEFORE it into its starting
  `created` mask. Contiguous sharding makes this exactly the single-chip
  creation prefix, so per-frame active sets match the serial path
  bit-for-bit. Each device then fuses its shard into a zero-initialized
  block volume with the unchanged single-chip kernel; the per-block partial
  sums (tsdf*w, w, color*w) reduce with one psum over ICI, and weighted
  means commute (order-independent, SURVEY §2.4) — so the merged volume
  matches the serial running mean up to float reassociation.
* **object axis** — one BlockTSDFVolume per object, objects sharded across
  devices, ZERO integrate-time communication. Per-object volume placement
  uses an extrinsic shift (world -> world - (origin_o - base)) so a single
  compiled program with a static grid serves every object.

Pallas inside shard_map runs per-device, unchanged; on the virtual CPU mesh
pass interpret=True (the driver dryrun does).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from otslam_tpu.core.camera import PinholeIntrinsics
from otslam_tpu.kernels.tsdf_block import (
    BLOCK_VOXELS, BlockTSDFVolume, _active_blocks, pack_rgb)
from otslam_tpu.kernels.tsdf_pallas import (
    _expand_skipped, _integrate_core_impl, _near_fallback_impl,
    _validate_depth_win)


def auto_max_active_sharded(vol: BlockTSDFVolume, depths, extrinsics,
                            intr: PinholeIntrinsics, n_shards: int,
                            bucket: int = 128) -> int:
    """Static active-block capacity for fuse_frames_sparse_data_parallel.

    The sharded path re-chunks each device's LOCAL frames into FPC-frame
    kernel calls, so chunk boundaries differ from the single-chip batch and
    tsdf_pallas.auto_max_active on the full batch is not a strict bound
    (a local chunk can straddle two global chunks whose union exceeds
    either). This replays the creation recurrence globally and takes the
    max union over the per-shard chunking.
    """
    import numpy as np

    from otslam_tpu.kernels.tsdf_pallas import FPC, _cumulative_or, BPG

    n = jnp.shape(depths)[0]
    if n % n_shards:
        # fuse_frames_sparse_data_parallel rejects indivisible batches; a
        # bound computed over truncated shards would silently underestimate
        # for a caller that pads to divisibility AFTER sizing
        raise ValueError(f"{n} frames not divisible by {n_shards} shards")
    nb = vol.num_blocks
    depths = jnp.asarray(depths)
    extrinsics = jnp.asarray(extrinsics)
    band_all, visible_all = jax.vmap(
        lambda d, e: _active_blocks(vol, d, e, intr))(depths, extrinsics)
    created_cum = _cumulative_or(band_all) | vol.created[:nb][None]
    active = np.asarray(created_cum & visible_all)
    n = active.shape[0]
    per = n // n_shards
    best = 0
    for s in range(n_shards):
        a = active[s * per:(s + 1) * per]
        pad = (-a.shape[0]) % FPC
        if pad:
            a = np.concatenate([a, np.zeros((pad, nb), bool)])
        union = a.reshape(-1, FPC, nb).any(axis=1)
        best = max(best, int(union.sum(axis=1).max()))
    best = max(best, BPG)
    return -(-best // bucket) * bucket


def _combine_partials(vol: BlockTSDFVolume, sum_tw, sum_w, sum_cw,
                      created_any):
    """Merge psum'd partial sums into the prior volume's running means."""
    nb = vol.num_blocks
    w_new = vol.weight + sum_w
    denom = jnp.maximum(w_new, 1.0)
    t_new = (vol.tsdf * vol.weight + sum_tw) / denom
    w3_old = jnp.tile(vol.weight, (1, 3))
    c_new = (vol.color * w3_old + sum_cw) / jnp.tile(denom, (1, 3))
    # compact_ids padding scatters garbage into the dead row on every
    # device; restore the row-nb == 0 invariant after the reduce
    t_new = t_new.at[nb].set(0.0)
    w_new = w_new.at[nb].set(0.0)
    c_new = c_new.at[nb].set(0.0)
    created = vol.created.at[:nb].set(created_any[:nb])
    created = created.at[nb].set(False)
    return BlockTSDFVolume(t_new, w_new, c_new, created, vol.origin,
                           vol.voxel_size, vol.sdf_trunc, vol.grid_blocks)


def fuse_frames_sparse_data_parallel(
        vol: BlockTSDFVolume, depths: jnp.ndarray, colors: jnp.ndarray,
        extrinsics: jnp.ndarray, intr: PinholeIntrinsics, mesh: Mesh,
        data_axis: str = "data", max_active: int | None = None,
        color_res: str = "half", near_field: str = "fallback",
        max_near: int = 512, interpret: bool = False,
        patch_rows: int | None = None,
        depth_win: int | None = None,
        color_rows: int | None = None,
        depth_planes: int = 4) -> BlockTSDFVolume:
    """Frame-sharded block-sparse fusion (Pallas kernel per device, one
    psum of the per-block partial sums over the data axis).

    Same contract as kernels.tsdf_pallas.integrate_frames_pallas up to
    float reassociation of the cross-device reduce: the creation prefix is
    replayed exactly (see module docstring), so per-frame active sets match
    the serial path. N frames must divide by the data-axis size.
    max_active=None (default) sizes the capacity exactly with
    auto_max_active_sharded; an explicit value must bound each device's
    per-chunk union active count (shard chunk boundaries differ from the
    single-chip batch's, so the plain auto_max_active is not a strict
    bound).

    near_field="fallback" runs the exact XLA pass for slab-uncovered
    (frame, block) pairs UNCONDITIONALLY with static capacity `max_near`
    per frame (no host sync is possible inside shard_map; use
    near_fallback_counts beforehand if you need to validate the capacity);
    "skip" drops those pairs (exact for far-field capture circles).
    """
    if color_res not in ("half", "full"):
        raise ValueError(f"color_res must be 'half' or 'full': {color_res!r}")
    if near_field not in ("fallback", "skip"):
        raise ValueError(
            f"near_field must be 'fallback' or 'skip': {near_field!r}")
    depth_win = _validate_depth_win(depth_win, color_res, depth_planes)
    nd = mesh.shape[data_axis]
    n = depths.shape[0]
    if n % nd:
        raise ValueError(f"{n} frames not divisible by {nd} devices")
    if max_active is None:
        max_active = auto_max_active_sharded(vol, depths, extrinsics, intr,
                                             nd)
    nb = vol.num_blocks
    vol_meta = (vol.grid_blocks, vol.origin, vol.voxel_size, vol.sdf_trunc)
    full_color = color_res == "full"

    def shard_fn(tsdf0, weight0, color0, created0, d, c, e):
        idx = jax.lax.axis_index(data_axis)
        # creation prefix: OR of the band unions of all earlier devices
        stub = BlockTSDFVolume(None, None, None, created0, vol.origin,
                               vol.voxel_size, vol.sdf_trunc,
                               vol.grid_blocks)
        band, _ = jax.vmap(
            lambda dd, ee: _active_blocks(stub, dd, ee, intr))(d, e)
        local_union = jnp.any(band, axis=0)                     # (NB,)
        unions = jax.lax.all_gather(local_union, data_axis)     # (nd, NB)
        before = (jnp.arange(nd) < idx)[:, None]
        prev = jnp.any(unions & before, axis=0)
        created_start = created0.at[:nb].set(created0[:nb] | prev)

        n_local = d.shape[0]
        tsdf_d, w_d, c_d, created_d, _, skipped_c, ids_all = \
            _integrate_core_impl(
                tsdf0, weight0, color0, created_start, d, c, e, intr,
                vol_meta, max_active, full_color, interpret, patch_rows,
                depth_win, color_rows, depth_planes)
        if near_field == "fallback":
            skipped = _expand_skipped(skipped_c, ids_all, nb, n_local)
            cpacked = jax.vmap(pack_rgb)(c)
            tsdf_d, w_d, c_d = _near_fallback_impl(
                tsdf_d, w_d, c_d, d, cpacked, e, skipped, intr, vol_meta,
                max_near)

        sum_tw = jax.lax.psum(tsdf_d * w_d, data_axis)
        sum_w = jax.lax.psum(w_d, data_axis)
        sum_cw = jax.lax.psum(c_d * jnp.tile(w_d, (1, 3)), data_axis)
        created_any = jax.lax.psum(
            created_d.astype(jnp.int32), data_axis) > 0
        return sum_tw, sum_w, sum_cw, created_any

    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(data_axis), P(data_axis),
                  P(data_axis)),
        out_specs=(P(), P(), P(), P()),
        # Pallas calls inside the mapped fn cannot declare varying-mesh-axis
        # metadata on their out_shapes; replication is handled explicitly
        # via the psums above
        check_vma=False)
    zeros = jnp.zeros_like
    sum_tw, sum_w, sum_cw, created_any = jax.jit(mapped)(
        zeros(vol.tsdf), zeros(vol.weight), zeros(vol.color), vol.created,
        jnp.asarray(depths), jnp.asarray(colors), jnp.asarray(extrinsics))
    return _combine_partials(vol, sum_tw, sum_w, sum_cw, created_any)


def fuse_objects_sparse_parallel(
        depths: jnp.ndarray, colors: jnp.ndarray, extrinsics: jnp.ndarray,
        origins: jnp.ndarray, intr: PinholeIntrinsics, cfg, mesh: Mesh,
        axis: str = "data", max_active: int | None = None,
        color_res: str = "half", near_field: str = "fallback",
        max_near: int = 512, interpret: bool = False,
        patch_rows: int | None = None, depth_win: int | None = None,
        color_rows: int | None = None, depth_planes: int = 4):
    """OBJECT-axis parallel block-sparse fusion: each device fuses the frame
    stacks of its object shard into per-object block volumes with the
    single-chip Pallas kernel — embarrassingly parallel, zero integrate-time
    collectives (the sparse analog of sharding.fuse_objects_parallel).

    depths (O, N, H, W), colors (O, N, H, W, 3), extrinsics (O, N, 4, 4),
    origins (O, 3) traced per-object volume origins; cfg: TSDFConfig (its
    static `origin` is the placement base — each object's grid relocates to
    origins[i] via an extrinsic shift, so one compiled program serves all).

    Returns (tsdf (O, NB+1, 512), weight (O, NB+1, 512),
    color (O, NB+1, 1536), created (O, NB+1)), object-sharded over `axis`.
    Reassemble per-object volumes with BlockTSDFVolume(..., origin=
    tuple(origins[i]), ...).

    max_active=None (default) sizes the static capacity exactly: the max
    over objects of tsdf_pallas.auto_max_active at that object's volume
    origin (per-object chunking here matches the single-chip batch's, so
    the plain per-object bound is strict).
    """
    import numpy as np

    from otslam_tpu.kernels.tsdf_block import make_block_volume
    from otslam_tpu.kernels.tsdf_pallas import auto_max_active

    if color_res not in ("half", "full"):
        raise ValueError(f"color_res must be 'half' or 'full': {color_res!r}")
    depth_win = _validate_depth_win(depth_win, color_res, depth_planes)
    nd = mesh.shape[axis]
    n_obj = depths.shape[0]
    if n_obj % nd:
        raise ValueError(f"{n_obj} objects not divisible by {nd} devices")
    proto = make_block_volume(cfg)
    if max_active is None:
        max_active = max(
            auto_max_active(
                BlockTSDFVolume(proto.tsdf, proto.weight, proto.color,
                                proto.created,
                                tuple(float(x) for x in np.asarray(o)),
                                proto.voxel_size, proto.sdf_trunc,
                                proto.grid_blocks),
                depths[i], extrinsics[i], intr)
            for i, o in enumerate(np.asarray(origins)))
    nb = proto.num_blocks
    vol_meta = (proto.grid_blocks, proto.origin, proto.voxel_size,
                proto.sdf_trunc)
    base = jnp.asarray(cfg.origin, jnp.float32)
    full_color = color_res == "full"
    obj_per_dev = n_obj // nd

    def one_object(d, c, e, o):
        # world' = world - (o - base): the voxel at cfg.origin + idx*vs in
        # world' sits at o + idx*vs in the true world
        shift = jnp.eye(4, dtype=e.dtype).at[:3, 3].set(
            (o - base).astype(e.dtype))
        e_shift = jnp.einsum("nij,jk->nik", e, shift)
        tsdf0 = jnp.zeros_like(proto.tsdf)
        w0 = jnp.zeros_like(proto.weight)
        c0 = jnp.zeros_like(proto.color)
        cr0 = jnp.zeros_like(proto.created)
        tsdf_o, w_o, c_o, cr_o, _, skipped_c, ids_all = _integrate_core_impl(
            tsdf0, w0, c0, cr0, d, c, e_shift, intr, vol_meta, max_active,
            full_color, interpret, patch_rows, depth_win, color_rows,
            depth_planes)
        if near_field == "fallback":
            skipped = _expand_skipped(skipped_c, ids_all, nb, d.shape[0])
            cpacked = jax.vmap(pack_rgb)(c)
            tsdf_o, w_o, c_o = _near_fallback_impl(
                tsdf_o, w_o, c_o, d, cpacked, e_shift, skipped, intr,
                vol_meta, max_near)
        tsdf_o = tsdf_o.at[nb].set(0.0)
        w_o = w_o.at[nb].set(0.0)
        c_o = c_o.at[nb].set(0.0)
        return tsdf_o, w_o, c_o, cr_o

    def shard_fn(d, c, e, o):
        # static unroll over the per-device object shard (Pallas calls with
        # scalar-prefetch grids do not vmap; shard sizes are tiny)
        outs = [one_object(d[i], c[i], e[i], o[i])
                for i in range(obj_per_dev)]
        return tuple(jnp.stack([out[k] for out in outs])
                     for k in range(4))

    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
        check_vma=False)  # Pallas out_shapes carry no vma metadata
    return jax.jit(mapped)(
        jnp.asarray(depths), jnp.asarray(colors), jnp.asarray(extrinsics),
        jnp.asarray(origins, jnp.float32))


def extract_meshes_sharded(vols, mesh: Mesh, axis: str = "data",
                           max_blocks: int | None = None,
                           max_cells: int | None = None):
    """Object-axis sharded mesh extraction: triangle soups of B same-shape
    BlockTSDFVolumes in ONE sharded dispatch — each device extracts its
    object shard as one flat block-soup problem
    (marching._extract_meshes_flat), zero collectives (extraction is embarrassingly
    object-parallel, like fuse_objects_sparse_parallel).

    Returns (verts (B, T, 9), cols (B, T, 9), masks (B, T)) with
    T = max_cells * 12 (rows vertex-major, see marching.extract_mesh_soup),
    object-sharded over `axis`, bit-identical per
    volume to marching.extract_mesh_soup_block. The volume list pads to a
    device-count multiple by repeating the last volume; padded rows are
    dropped on return. Capacities default to the max of the per-volume
    auto configs (static — shared by every shard)."""
    from otslam_tpu.kernels.marching import (_extract_meshes_flat,
                                             batched_extract_setup)

    n_obj = len(vols)
    nd = mesh.shape[axis]
    padded = list(vols) + [vols[-1]] * ((-n_obj) % nd)
    stacks, _, mb, mc = batched_extract_setup(padded, max_blocks, max_cells)
    v0 = vols[0]

    def shard_fn(t, w, c, cr, o):
        # each shard extracts its local object batch as one flat problem
        # (see marching._extract_meshes_flat — 2.1x faster than vmapping
        # the single-volume path)
        return _extract_meshes_flat(t, w, c, cr, o,
                                    grid_blocks=v0.grid_blocks,
                                    voxel_size=v0.voxel_size,
                                    max_blocks=mb, max_cells=mc)

    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)))
    verts, cols, masks = jax.jit(mapped)(*stacks)
    return verts[:n_obj], cols[:n_obj], masks[:n_obj]


def reconstruct_all_sharded_sparse(ds, cfg, mesh: Mesh, axis: str = "data",
                                   auto_origin: bool = True,
                                   max_active: int | None = None,
                                   interpret: bool = False,
                                   **extract_kw) -> dict:
    """Object-sharded reconstruct_all over the BLOCK-SPARSE Pallas path:
    one jitted dispatch fuses every object's frames (objects sharded across
    devices), then sparse extraction + filtering runs per object exactly
    like pipeline.reconstruct_object(backend='pallas') — including exact
    capacity auto-sizing (max_active=None, the default, measures each
    object's per-chunk union active-block bound instead of assuming a
    fixed capacity).

    Frame counts pad to the dataset max with empty (depth 0) frames (their
    bands are empty, so they create and integrate nothing); the object list
    pads to the device count by repeating the last object (dropped on
    return).
    """
    import numpy as np

    from otslam_tpu.pipeline.reconstruct import (auto_volume_origin,
                                                 extract_filtered_cloud)

    names = ds.object_names()
    if not names:
        return {}
    intr = PinholeIntrinsics.from_config(ds.camera)
    batches = {n: ds.load_object(n) for n in names}
    max_frames = max(b.depths.shape[0] for b in batches.values())
    nd = mesh.shape[axis]

    ds_list, cs_list, es_list, os_list = [], [], [], []
    for n in names:
        b = batches[n]
        pad = max_frames - b.depths.shape[0]
        ds_list.append(np.concatenate(
            [b.depths, np.zeros((pad,) + b.depths.shape[1:], np.float32)]))
        cs_list.append(np.concatenate(
            [b.colors, np.zeros((pad,) + b.colors.shape[1:], np.float32)]))
        es_list.append(np.concatenate(
            [b.extrinsics,
             np.tile(np.eye(4, dtype=np.float32)[None], (pad, 1, 1))]))
        os_list.append(auto_volume_origin(b, intr, cfg) if auto_origin
                       else cfg.tsdf.origin)
    while len(ds_list) % nd:
        ds_list.append(ds_list[-1])
        cs_list.append(cs_list[-1])
        es_list.append(es_list[-1])
        os_list.append(os_list[-1])

    tsdf, weight, color, created = fuse_objects_sparse_parallel(
        np.stack(ds_list), np.stack(cs_list), np.stack(es_list),
        np.stack(os_list).astype(np.float32), intr, cfg.tsdf, mesh, axis,
        max_active=max_active, interpret=interpret)

    from otslam_tpu.kernels.tsdf_block import make_block_volume
    proto = make_block_volume(cfg.tsdf)
    out = {}
    for i, n in enumerate(names):
        vol = BlockTSDFVolume(
            tsdf[i], weight[i], color[i], created[i],
            tuple(float(x) for x in os_list[i]), proto.voxel_size,
            proto.sdf_trunc, proto.grid_blocks)
        res = extract_filtered_cloud(vol, cfg, **extract_kw)
        res.num_frames = int(batches[n].depths.shape[0])
        out[n] = res
    return out
