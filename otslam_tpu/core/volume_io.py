"""TSDF volume checkpointing.

The reference checkpoints everything as files between pipeline stages
(SURVEY.md §5); volumes get the same treatment so fusion can resume
incrementally (e.g. integrate new captures of a rescanned object into its
existing volume instead of refusing from scratch).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from otslam_tpu.kernels.tsdf import TSDFVolume
from otslam_tpu.kernels.tsdf_block import BlockTSDFVolume


def save_volume(path: str, vol) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if isinstance(vol, BlockTSDFVolume):
        np.savez_compressed(
            path, kind="block", tsdf=np.asarray(vol.tsdf),
            weight=np.asarray(vol.weight), color=np.asarray(vol.color),
            created=np.asarray(vol.created), origin=np.asarray(vol.origin),
            voxel_size=vol.voxel_size, sdf_trunc=vol.sdf_trunc,
            grid_blocks=np.asarray(vol.grid_blocks))
    elif isinstance(vol, TSDFVolume):
        np.savez_compressed(
            path, kind="dense", tsdf=np.asarray(vol.tsdf),
            weight=np.asarray(vol.weight), color=np.asarray(vol.color),
            origin=np.asarray(vol.origin), voxel_size=vol.voxel_size,
            sdf_trunc=vol.sdf_trunc)
    else:
        raise TypeError(type(vol))


def load_volume(path: str):
    with np.load(path) as z:
        kind = str(z["kind"])
        if kind == "block":
            return BlockTSDFVolume(
                jnp.asarray(z["tsdf"]), jnp.asarray(z["weight"]),
                jnp.asarray(z["color"]), jnp.asarray(z["created"]),
                tuple(float(v) for v in z["origin"]),
                float(z["voxel_size"]), float(z["sdf_trunc"]),
                tuple(int(v) for v in z["grid_blocks"]))
        return TSDFVolume(
            jnp.asarray(z["tsdf"]), jnp.asarray(z["weight"]),
            jnp.asarray(z["color"]),
            tuple(float(v) for v in z["origin"]),
            float(z["voxel_size"]), float(z["sdf_trunc"]))
