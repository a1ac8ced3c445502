"""Multi-chip sharding of the fusion and eval workloads.

TSDF integration is an order-independent weighted sum (SURVEY.md §2.4), which
fixes the parallel decomposition:

* **data axis** — frames shard across devices; each device computes partial
  sums (sum_tw, sum_w, sum_cw) over its shard with the same scan kernel as
  single-chip, and one ``psum`` over ICI merges them. Scaling is
  embarrassingly parallel; the all-reduce volume is the voxel grid, paid
  once per batch (not per frame).
* **model axis** — the voxel grid shards as X-slabs; every device integrates
  all its frames into its own slab (per-shard volume origin offset), with
  **zero** integrate-time communication. Combine with the data axis for a
  2-D (data x model) mesh: psum over 'data' only.

Everything uses ``shard_map`` over an explicit Mesh; collectives are XLA
psums riding ICI.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from otslam_tpu.config import TSDFConfig
from otslam_tpu.core.camera import PinholeIntrinsics
from otslam_tpu.kernels.tsdf import TSDFVolume, merge_partials, partial_integrate
from otslam_tpu.kernels.nn import nn_distance


def fuse_frames_data_parallel(depths: jnp.ndarray, colors: jnp.ndarray,
                              extrinsics: jnp.ndarray,
                              intr: PinholeIntrinsics, cfg: TSDFConfig,
                              mesh: Mesh, data_axis: str = "data"
                              ) -> TSDFVolume:
    """Frame-sharded fusion: N frames split over the data axis, one psum.

    N must divide by the data-axis size. Bit-identical to the single-chip
    partial-sum path up to float reassociation of the reduce.
    """
    nd = mesh.shape[data_axis]
    n = depths.shape[0]
    if n % nd:
        raise ValueError(f"{n} frames not divisible by {nd} devices")

    def shard_fn(d, c, e):
        sum_tw, sum_w, sum_cw = partial_integrate(d, c, e, intr, cfg)
        sum_tw = jax.lax.psum(sum_tw, data_axis)
        sum_w = jax.lax.psum(sum_w, data_axis)
        sum_cw = jax.lax.psum(sum_cw, data_axis)
        return sum_tw, sum_w, sum_cw

    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(data_axis), P(data_axis), P(data_axis)),
        out_specs=(P(), P(), P()))
    sum_tw, sum_w, sum_cw = jax.jit(mapped)(depths, colors, extrinsics)
    return merge_partials(sum_tw, sum_w, sum_cw, cfg)


def fuse_frames_2d_sharded(depths: jnp.ndarray, colors: jnp.ndarray,
                           extrinsics: jnp.ndarray,
                           intr: PinholeIntrinsics, cfg: TSDFConfig,
                           mesh: Mesh, data_axis: str = "data",
                           model_axis: str = "model") -> TSDFVolume:
    """2-D sharding: frames over 'data', voxel-grid X-slabs over 'model'.

    Each (data, model) device integrates its frame shard into its X-slab
    (slab-local volume origin), psums partials over 'data' only, and the
    full volume is reassembled from the slabs.
    """
    nd = mesh.shape[data_axis]
    nm = mesh.shape[model_axis]
    X, Y, Z = cfg.dims
    if X % nm:
        raise ValueError(f"X dim {X} not divisible by model axis {nm}")
    if depths.shape[0] % nd:
        raise ValueError("frames not divisible by data axis")
    slab_x = X // nm

    def shard_fn(d, c, e):
        m = jax.lax.axis_index(model_axis)
        # slab-local volume: same grid, origin shifted along X
        ox = cfg.origin[0] + m.astype(jnp.float32) * slab_x * cfg.voxel_size
        slab_cfg = dataclasses.replace(
            cfg, dims=(slab_x, Y, Z), origin=(0.0, cfg.origin[1], cfg.origin[2]))
        # partial_integrate needs a static origin; shift the *extrinsic*
        # instead: world' = world + (ox, 0, 0) => extrinsic' = E @ T(+ox)
        shift = jnp.eye(4, dtype=e.dtype).at[0, 3].set(ox)
        e_shift = jnp.einsum("nij,jk->nik", e, shift)
        d = d + jnp.zeros((), d.dtype) * ox  # make inputs model-varying too
        sum_tw, sum_w, sum_cw = partial_integrate(d, c, e_shift, intr, slab_cfg)
        sum_tw = jax.lax.psum(sum_tw, data_axis)
        sum_w = jax.lax.psum(sum_w, data_axis)
        sum_cw = jax.lax.psum(sum_cw, data_axis)
        return sum_tw, sum_w, sum_cw

    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(data_axis), P(data_axis), P(data_axis)),
        out_specs=(P(model_axis), P(model_axis), P(None, model_axis)))
    sum_tw, sum_w, sum_cw = jax.jit(mapped)(depths, colors, extrinsics)
    return merge_partials(sum_tw, sum_w, sum_cw, cfg)


def chamfer_data_parallel(src: jnp.ndarray, dst: jnp.ndarray, mesh: Mesh,
                          data_axis: str = "data", chunk: int = 2048):
    """Source points shard over devices; each finds NNs in the (replicated)
    target; mean distance reduced with one psum. src length must divide."""
    nd = mesh.shape[data_axis]
    if src.shape[0] % nd:
        raise ValueError("src points not divisible by data axis size")

    def shard_fn(s, d):
        dist = nn_distance(s, d, chunk=chunk)
        return jax.lax.psum(jnp.sum(dist), data_axis), jax.lax.psum(
            jnp.asarray(s.shape[0], jnp.float32), data_axis)

    mapped = jax.shard_map(shard_fn, mesh=mesh,
                           in_specs=(P(data_axis), P()), out_specs=(P(), P()))
    total, count = jax.jit(mapped)(src, dst)
    return total / count
