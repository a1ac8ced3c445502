"""Marching-tetrahedra mesh extraction."""

import numpy as np
import jax.numpy as jnp
import pytest

from otslam_tpu.config import TSDFConfig
from otslam_tpu.core import io as tio
from otslam_tpu.core.camera import PinholeIntrinsics
from otslam_tpu.kernels.marching import extract_mesh, extract_mesh_soup, _TET_TABLE
from otslam_tpu.kernels.tsdf import TSDFVolume, make_volume, integrate_frames

CFG = TSDFConfig(voxel_size=0.02, sdf_trunc=0.08, dims=(48, 48, 48),
                 origin=(-0.48, -0.48, -0.48))


def sphere_volume(radius=0.3):
    """Analytic truncated SDF of a sphere, fully observed."""
    X, Y, Z = CFG.dims
    xs = CFG.origin[0] + (np.arange(X) + 0.5) * CFG.voxel_size
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    d = np.linalg.norm(g, axis=-1) - radius
    tsdf = np.clip(d / CFG.sdf_trunc, -1, 1).astype(np.float32)
    vol = make_volume(CFG)
    return TSDFVolume(jnp.asarray(tsdf), jnp.ones_like(vol.weight),
                      jnp.full_like(vol.color, 128.0), CFG.origin,
                      CFG.voxel_size, CFG.sdf_trunc)


class TestTetTable:
    def test_case_triangle_counts(self):
        counts = [(_TET_TABLE[c, :, 0, 0] >= 0).sum() for c in range(16)]
        assert counts[0] == 0 and counts[15] == 0
        for c in range(1, 15):
            ninside = bin(c).count("1")
            assert counts[c] == (2 if ninside == 2 else 1)


class TestSphere:
    def test_vertices_on_sphere(self):
        vol = sphere_volume(0.3)
        verts, faces, cols, normals = extract_mesh(vol, max_cells=32768)
        assert len(verts) > 1000 and len(faces) > 1000
        r = np.linalg.norm(verts, axis=1)
        # zero-crossing interpolation: vertices within half a voxel of r=0.3
        assert np.abs(r - 0.3).max() < CFG.voxel_size
        assert np.sqrt(np.mean((r - 0.3) ** 2)) < 2e-3

    def test_normals_outward(self):
        vol = sphere_volume(0.3)
        verts, faces, cols, normals = extract_mesh(vol, max_cells=32768)
        rad = verts / np.linalg.norm(verts, axis=1, keepdims=True)
        cosang = np.sum(normals * rad, axis=1)
        assert np.mean(cosang > 0.7) > 0.98

    def test_mesh_is_edge_manifold(self):
        """Every interior edge is shared by exactly 2 triangles (closed
        surface from marching tets must be watertight)."""
        vol = sphere_volume(0.3)
        verts, faces, cols, normals = extract_mesh(vol, max_cells=32768)
        edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                                faces[:, [2, 0]]])
        edges = np.sort(edges, axis=1)
        uniq, counts = np.unique(edges, axis=0, return_counts=True)
        assert (counts == 2).mean() > 0.999

    def test_mesh_ply_roundtrip(self, tmp_path):
        vol = sphere_volume(0.25)
        verts, faces, cols, normals = extract_mesh(vol, max_cells=32768)
        p = str(tmp_path / "sphere.ply")
        tio.write_ply(p, verts, colors=cols, normals=normals, faces=faces)
        back = tio.read_ply(p)
        assert back["faces"].shape == faces.shape
        np.testing.assert_allclose(back["points"], verts, atol=1e-5)


class TestAutoCapacity:
    def test_auto_max_cells_is_exact_and_lossless(self):
        """auto_max_cells must bound the true active-cell count, and the
        right-sized extraction must produce the identical welded mesh as an
        oversized one (the capacity only pads; measured 5x device time at
        the 131072 default vs the ~8k real surface cells of a 256^3 scan)."""
        from otslam_tpu.kernels.marching import auto_max_cells
        vol = sphere_volume(0.3)
        mc = auto_max_cells(vol)
        v_auto, f_auto, _, _ = extract_mesh(vol)          # auto capacity
        v_big, f_big, _, _ = extract_mesh(vol, max_cells=32768)
        assert mc <= 32768
        assert len(v_auto) == len(v_big) and len(f_auto) == len(f_big)
        np.testing.assert_allclose(v_auto, v_big, atol=0)


class TestFromFusion:
    def test_wall_mesh_from_integrated_frames(self):
        intr = PinholeIntrinsics(64, 48, 56.0, 56.0, 32.0, 24.0)
        depth = jnp.full((48, 64), 0.3503, jnp.float32)
        color = jnp.full((48, 64, 3), 200.0, jnp.float32)
        ext = jnp.eye(4)[None]
        cfg = TSDFConfig(voxel_size=0.02, sdf_trunc=0.08, dims=(48, 48, 48),
                         origin=(-0.48, -0.48, 0.0))
        vol = integrate_frames(make_volume(cfg), depth[None], color[None],
                               ext, intr)
        verts, faces, cols, normals = extract_mesh(vol, max_cells=16384)
        assert len(verts) > 50
        assert np.abs(verts[:, 2] - 0.3503).max() < 0.02
        # colors carried through (200/255)
        np.testing.assert_allclose(cols.mean(), 200 / 255, atol=0.02)


def _masked_tris(soup):
    verts, cols, mask = soup
    m = np.asarray(mask)
    return (np.asarray(verts)[m].reshape(-1, 3, 3),
            np.asarray(cols)[m].reshape(-1, 3, 3))


def _canon(tris):
    """Lexsort a triangle list by its 9 coordinates (soup order differs
    between the dense x-major and block-major compactions)."""
    flat = tris.reshape(len(tris), -1)
    order = np.lexsort(flat.T[::-1])
    return flat[order]


class TestBlockPath:
    """extract_mesh_soup_block must produce the identical triangle SET as
    the densified path — same corner values, same shared soup phase, only
    the cell compaction order differs."""

    def _fused_block_volume(self):
        from otslam_tpu.kernels.tsdf_block import (integrate_frames_sparse,
                                                   make_block_volume)
        intr = PinholeIntrinsics(64, 48, 56.0, 56.0, 32.0, 24.0)
        depth = np.full((2, 48, 64), 0.3503, np.float32)
        depth[1] += 0.08                       # second wall plane
        color = np.zeros((2, 48, 64, 3), np.float32)
        color[0] = 200.0
        color[1] = 40.0
        ext = np.stack([np.eye(4), np.eye(4)]).astype(np.float32)
        ext[1, 2, 3] = 0.08                    # shifted camera
        cfg = TSDFConfig(voxel_size=0.02, sdf_trunc=0.08, dims=(48, 48, 48),
                         origin=(-0.48, -0.48, 0.0))
        return integrate_frames_sparse(make_block_volume(cfg),
                                       jnp.asarray(depth), jnp.asarray(color),
                                       jnp.asarray(ext), intr,
                                       max_active=512)

    def test_soup_matches_densified(self):
        from otslam_tpu.kernels.marching import extract_mesh_soup_block
        from otslam_tpu.kernels.tsdf_block import block_to_dense

        bvol = self._fused_block_volume()
        dense = block_to_dense(bvol)
        v_d, c_d = _masked_tris(extract_mesh_soup(dense, max_cells=16384))
        v_b, c_b = _masked_tris(extract_mesh_soup_block(bvol, max_blocks=512,
                                                        max_cells=16384))
        assert len(v_d) > 100 and len(v_d) == len(v_b)
        np.testing.assert_array_equal(_canon(v_d), _canon(v_b))
        # colors ride the same canonical order as their vertices
        key_d = np.lexsort(v_d.reshape(len(v_d), -1).T[::-1])
        key_b = np.lexsort(v_b.reshape(len(v_b), -1).T[::-1])
        np.testing.assert_array_equal(c_d[key_d], c_b[key_b])

    def test_extract_mesh_accepts_block_volume(self):
        from otslam_tpu.kernels.tsdf_block import block_to_dense

        bvol = self._fused_block_volume()
        v_b, f_b, c_b, n_b = extract_mesh(bvol)            # auto capacities
        v_d, f_d, c_d, n_d = extract_mesh(block_to_dense(bvol))
        # welded meshes are identical (np.unique canonicalizes vertex order)
        np.testing.assert_array_equal(v_b, v_d)
        assert len(f_b) == len(f_d)
        np.testing.assert_array_equal(c_b, c_d)

    def test_empty_volume(self):
        from otslam_tpu.kernels.tsdf_block import make_block_volume
        cfg = TSDFConfig(voxel_size=0.02, sdf_trunc=0.08, dims=(48, 48, 48),
                         origin=(-0.48, -0.48, 0.0))
        v, f, c, n = extract_mesh(make_block_volume(cfg))
        assert len(v) == 0 and len(f) == 0

    @pytest.mark.slow
    def test_batched_matches_single(self):
        """extract_meshes_block (B volumes, one dispatch) must reproduce
        the per-volume single-call soups bit-exactly, including distinct
        per-volume origins (vmapped as a traced argument)."""
        import dataclasses as dc
        from otslam_tpu.kernels.marching import (extract_mesh_soup_block,
                                                 extract_meshes_block)

        v1 = self._fused_block_volume()
        v2 = dc.replace(self._fused_block_volume(),
                        tsdf=v1.tsdf * 0.7, origin=(-0.4, -0.44, 0.02))
        verts, cols, masks = extract_meshes_block([v1, v2], max_blocks=512,
                                                  max_cells=16384)
        for b, v in enumerate((v1, v2)):
            sv, sc, sm = extract_mesh_soup_block(v, max_blocks=512,
                                                 max_cells=16384)
            np.testing.assert_array_equal(np.asarray(masks[b]),
                                          np.asarray(sm))
            m = np.asarray(sm)
            np.testing.assert_array_equal(np.asarray(verts[b])[m],
                                          np.asarray(sv)[m])
            np.testing.assert_array_equal(np.asarray(cols[b])[m],
                                          np.asarray(sc)[m])

    def test_batched_rejects_shape_mismatch(self):
        import dataclasses as dc
        import pytest
        from otslam_tpu.kernels.marching import extract_meshes_block
        v1 = self._fused_block_volume()
        v2 = dc.replace(v1, voxel_size=0.04)
        with pytest.raises(ValueError):
            extract_meshes_block([v1, v2])

    def test_auto_config_matches_oversized(self):
        from otslam_tpu.kernels.marching import (auto_mesh_block_config,
                                                 extract_mesh_soup_block)
        bvol = self._fused_block_volume()
        mb, mc = auto_mesh_block_config(bvol)
        v_a, _ = _masked_tris(extract_mesh_soup_block(bvol, mb, mc))
        v_big, _ = _masked_tris(extract_mesh_soup_block(bvol, max_blocks=512,
                                                        max_cells=16384))
        np.testing.assert_array_equal(_canon(v_a), _canon(v_big))


class TestHierCompaction:
    """_compact_ids_hier must be a drop-in for compact_ids (the flat top_k
    over all 16.6M cell keys was 39 ms of every 256^3 extraction on-chip;
    the segmented pass keeps only ascending-id/pad-n semantics intact)."""

    def test_matches_flat_compact_ids(self):
        from otslam_tpu.kernels.marching import _compact_ids_hier
        from otslam_tpu.kernels.tsdf_block import compact_ids

        rng = np.random.default_rng(3)
        for n, density, max_ids, seg in [
            (100_000, 0.0001, 64, 128),      # sparse
            (100_000, 0.01, 1024, 128),      # normal
            (100_000, 0.05, 256, 128),       # overflow: keeps smallest ids
            (4_097, 0.2, 512, 128),          # n not a multiple of seg
            (999, 0.3, 64, 128),             # n < capacity * seg (degenerate)
            (50_000, 0.0, 128, 256),         # empty mask
        ]:
            active = jnp.asarray(rng.random(n) < density)
            got = np.asarray(_compact_ids_hier(active, max_ids, seg=seg))
            want = np.asarray(compact_ids(active, max_ids, n))
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"n={n} d={density}")

    def test_clustered_actives(self):
        """Spatially clustered actives (the real surface-cell pattern)."""
        from otslam_tpu.kernels.marching import _compact_ids_hier
        from otslam_tpu.kernels.tsdf_block import compact_ids

        n = 200_000
        a = np.zeros(n, bool)
        a[5_000:5_400] = True
        a[150_000:150_037] = True
        a[n - 3:] = True
        active = jnp.asarray(a)
        got = np.asarray(_compact_ids_hier(active, 512))
        want = np.asarray(compact_ids(active, 512, n))
        np.testing.assert_array_equal(got, want)
