"""Multi-chip sharding on the virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8, per SURVEY.md §4(c))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from otslam_tpu.config import TSDFConfig
from otslam_tpu.core.camera import PinholeIntrinsics
from otslam_tpu.distributed.mesh import make_mesh
from otslam_tpu.distributed.sharding import (
    fuse_frames_data_parallel, fuse_frames_2d_sharded, chamfer_data_parallel)
from otslam_tpu.kernels.nn import nn_distance
from otslam_tpu.kernels.tsdf import make_volume, integrate_frames

INTR = PinholeIntrinsics(64, 48, 56.0, 56.0, 32.0, 24.0)
CFG = TSDFConfig(voxel_size=0.02, sdf_trunc=0.08, dims=(64, 64, 64),
                 origin=(-0.64, -0.64, -0.64))


def frames(n=8):
    depths = np.stack([np.full((48, 64), 0.4503 + 0.013 * i, np.float32)
                       for i in range(n)])
    colors = np.stack([np.full((48, 64, 3), 90.0 + 10 * i, np.float32)
                       for i in range(n)])
    exts = np.stack([np.eye(4, dtype=np.float32)] * n)
    return jnp.asarray(depths), jnp.asarray(colors), jnp.asarray(exts)


@pytest.fixture(scope="module")
def eight_devices():
    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")
    return jax.devices()[:8]


class TestDataParallel:
    def test_matches_single_chip(self, eight_devices):
        mesh = make_mesh((8,), ("data",), eight_devices)
        d, c, e = frames(8)
        vol = fuse_frames_data_parallel(d, c, e, INTR, CFG, mesh)
        ref = integrate_frames(make_volume(CFG), d, c, e, INTR)
        np.testing.assert_allclose(np.asarray(vol.weight),
                                   np.asarray(ref.weight), atol=0)
        np.testing.assert_allclose(np.asarray(vol.tsdf),
                                   np.asarray(ref.tsdf), atol=1e-5)
        np.testing.assert_allclose(np.asarray(vol.color),
                                   np.asarray(ref.color), atol=1e-3)

    def test_rejects_indivisible(self, eight_devices):
        mesh = make_mesh((8,), ("data",), eight_devices)
        d, c, e = frames(6)
        with pytest.raises(ValueError):
            fuse_frames_data_parallel(d, c, e, INTR, CFG, mesh)


class TestTwoDSharded:
    def test_matches_single_chip(self, eight_devices):
        mesh = make_mesh((4, 2), ("data", "model"), eight_devices)
        d, c, e = frames(8)
        vol = fuse_frames_2d_sharded(d, c, e, INTR, CFG, mesh)
        ref = integrate_frames(make_volume(CFG), d, c, e, INTR)
        np.testing.assert_allclose(np.asarray(vol.weight),
                                   np.asarray(ref.weight), atol=0)
        np.testing.assert_allclose(np.asarray(vol.tsdf),
                                   np.asarray(ref.tsdf), atol=1e-4)


class TestChamferSharded:
    def test_matches_single_chip(self, eight_devices, rng):
        mesh = make_mesh((8,), ("data",), eight_devices)
        src = jnp.asarray(rng.standard_normal((1024, 3)).astype(np.float32))
        dst = jnp.asarray(rng.standard_normal((2048, 3)).astype(np.float32))
        got = chamfer_data_parallel(src, dst, mesh, chunk=256)
        want = jnp.mean(nn_distance(src, dst, chunk=256))
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
