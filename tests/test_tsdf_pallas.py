"""Pallas block-integration kernel vs the XLA sparse path (interpret mode on
CPU; the real-hardware path is exercised by bench.py / __graft_entry__.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from otslam_tpu.config import TSDFConfig
from otslam_tpu.core import PinholeIntrinsics
from otslam_tpu.kernels.tsdf_block import make_block_volume, integrate_frames_sparse
from otslam_tpu.kernels.tsdf_pallas import integrate_frames_pallas

INTR = PinholeIntrinsics(64, 48, 56.0, 56.0, 32.0, 24.0)
CFG = TSDFConfig(voxel_size=0.02, sdf_trunc=0.08, dims=(32, 32, 32),
                 origin=(-0.32, -0.32, 0.2))


def scene():
    th = 0.07
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]], np.float32)
    E = np.eye(4, dtype=np.float32)
    E[:3, :3] = R
    E[:3, 3] = [0.013, -0.021, 0.004]
    depths = jnp.asarray(np.stack([
        np.full((48, 64), 0.4503, np.float32),
        np.full((48, 64), 0.5217, np.float32)]))
    colors = jnp.asarray(np.stack([
        np.full((48, 64, 3), 100.0, np.float32),
        np.full((48, 64, 3), 180.0, np.float32)]))
    exts = jnp.asarray(np.stack([np.eye(4, dtype=np.float32), E]))
    return depths, colors, exts


class TestPallasKernel:
    def test_matches_xla_sparse_path(self):
        depths, colors, exts = scene()
        s = integrate_frames_sparse(make_block_volume(CFG), depths, colors,
                                    exts, INTR, max_active=64)
        p = integrate_frames_pallas(make_block_volume(CFG), depths, colors,
                                    exts, INTR, max_active=64, interpret=True)
        ws, wp = np.asarray(s.weight), np.asarray(p.weight)
        ts, tp = np.asarray(s.tsdf), np.asarray(p.tsdf)
        observed = (ws > 0) | (wp > 0)
        # validity may flip for voxels whose projection lands exactly on a
        # pixel-rounding boundary (sub-pixel selection jitter); must be rare
        frac_diff = (ws != wp).sum() / max(observed.sum(), 1)
        assert frac_diff < 0.015
        same = (ws == wp) & (ws > 0)
        # depth selection uses a bf16 hi/lo split: ~2^-16 relative error,
        # i.e. < 0.1 mm of depth, < 1e-3 in tsdf units
        np.testing.assert_allclose(tp[same], ts[same], atol=1e-3)
        # color sampled from the half-res pyramid: exact for smooth fields
        # (color rows are channel-major flat: (NB+1, 3*512))
        cs = np.asarray(s.color).reshape(-1, 3, 512).transpose(1, 0, 2)
        cp = np.asarray(p.color).reshape(-1, 3, 512).transpose(1, 0, 2)
        m = (ws > 0) & (wp > 0)
        assert np.abs(cs[:, m] - cp[:, m]).max() < 1.0

    def test_created_mask_identical(self):
        depths, colors, exts = scene()
        s = integrate_frames_sparse(make_block_volume(CFG), depths, colors,
                                    exts, INTR, max_active=64)
        p = integrate_frames_pallas(make_block_volume(CFG), depths, colors,
                                    exts, INTR, max_active=64, interpret=True)
        np.testing.assert_array_equal(np.asarray(s.created), np.asarray(p.created))


class TestFullResColor:
    @pytest.mark.slow
    def test_full_color_matches_gather_path_exactly(self):
        """color_res='full' reuses the depth one-hot at full resolution —
        bf16 holds 0..255 integers exactly, so color parity is EXACT."""
        depths, colors, exts = scene()
        # a color gradient makes half-res vs full-res distinguishable
        gx = np.linspace(0, 255, 64, dtype=np.float32)[None, :, None]
        colors = jnp.asarray(
            np.broadcast_to(gx, (2, 48, 64, 3)).copy())
        s = integrate_frames_sparse(make_block_volume(CFG), depths, colors,
                                    exts, INTR, max_active=64)
        p = integrate_frames_pallas(make_block_volume(CFG), depths, colors,
                                    exts, INTR, max_active=64,
                                    interpret=True, color_res="full")
        ws, wp = np.asarray(s.weight), np.asarray(p.weight)
        m = (ws == wp) & (ws > 0)
        cs = np.asarray(s.color).reshape(-1, 3, 512).transpose(1, 0, 2)
        cp = np.asarray(p.color).reshape(-1, 3, 512).transpose(1, 0, 2)
        np.testing.assert_allclose(cp[:, m], cs[:, m], atol=2e-3)

    def test_half_color_within_one_pixel(self):
        """Half-res color error is bounded by one full-res pixel: on a
        linear gradient that is exactly one gradient step."""
        depths, colors, exts = scene()
        gx = np.linspace(0, 255, 64, dtype=np.float32)[None, :, None]
        colors = jnp.asarray(np.broadcast_to(gx, (2, 48, 64, 3)).copy())
        s = integrate_frames_sparse(make_block_volume(CFG), depths, colors,
                                    exts, INTR, max_active=64)
        p = integrate_frames_pallas(make_block_volume(CFG), depths, colors,
                                    exts, INTR, max_active=64,
                                    interpret=True, color_res="half")
        ws, wp = np.asarray(s.weight), np.asarray(p.weight)
        m = (ws == wp) & (ws > 0)
        cs = np.asarray(s.color).reshape(-1, 3, 512).transpose(1, 0, 2)
        cp = np.asarray(p.color).reshape(-1, 3, 512).transpose(1, 0, 2)
        step = 255.0 / 63.0          # one full-res pixel of this gradient
        # +1 for the uint8 truncation quantization on each side
        assert np.abs(cp[:, m] - cs[:, m]).max() <= np.ceil(step) + 1e-3


class TestNearField:
    """Blocks closer than the slab-coverage bound must not lose frames."""

    INTR_BIG = PinholeIntrinsics(256, 256, 200.0, 200.0, 128.0, 128.0)
    CFG_NEAR = TSDFConfig(voxel_size=0.02, sdf_trunc=0.08, dims=(32, 32, 32),
                          origin=(-0.32, -0.32, 0.1))

    def _near_scene(self):
        # depth plane at 0.3 m: the truncation band creates blocks down to
        # z ~ 0.22 m, whose projected span exceeds the 128-row slab
        # (fy*0.16/0.22 = 145 rows) -> exercises the fallback
        depths = jnp.asarray(
            np.full((1, 256, 256), 0.30, np.float32))
        colors = jnp.asarray(np.full((1, 256, 256, 3), 120.0, np.float32))
        exts = jnp.asarray(np.eye(4, dtype=np.float32))[None]
        return depths, colors, exts

    @pytest.mark.slow
    def test_fallback_matches_gather_path(self):
        depths, colors, exts = self._near_scene()
        s = integrate_frames_sparse(make_block_volume(self.CFG_NEAR), depths,
                                    colors, exts, self.INTR_BIG,
                                    max_active=512)
        p = integrate_frames_pallas(make_block_volume(self.CFG_NEAR), depths,
                                    colors, exts, self.INTR_BIG,
                                    max_active=512, interpret=True,
                                    near_field="fallback")
        ws, wp = np.asarray(s.weight), np.asarray(p.weight)
        np.testing.assert_array_equal(ws, wp)      # zero lost integrations
        m = ws > 0
        np.testing.assert_allclose(np.asarray(p.tsdf)[m],
                                   np.asarray(s.tsdf)[m], atol=1e-3)

    def test_skip_mode_drops_near_blocks(self):
        """near_field='skip' documents the round-1 behavior: close blocks
        silently miss the frame. The fallback test above is what guards the
        regression; this asserts the scenario actually HAS near blocks."""
        depths, colors, exts = self._near_scene()
        s = integrate_frames_sparse(make_block_volume(self.CFG_NEAR), depths,
                                    colors, exts, self.INTR_BIG,
                                    max_active=512)
        p = integrate_frames_pallas(make_block_volume(self.CFG_NEAR), depths,
                                    colors, exts, self.INTR_BIG,
                                    max_active=512, interpret=True,
                                    near_field="skip")
        ws, wp = np.asarray(s.weight), np.asarray(p.weight)
        assert (ws > wp).sum() > 100               # material coverage hole


class TestAutoCapacity:
    def test_union_bound_covers_all_chunks(self):
        """auto_max_active must bound the per-chunk UNION active count — the
        kernel processes FPC frames per call and silently skips overflow."""
        import numpy as np
        from otslam_tpu.kernels.tsdf_block import (
            _active_blocks, make_block_volume)
        from otslam_tpu.kernels.tsdf_pallas import FPC, auto_max_active
        import jax
        import jax.numpy as jnp

        depths, colors, exts = scene()
        # extend to 4 frames with varied poses
        depths = jnp.concatenate([depths, depths + 0.11])
        colors = jnp.concatenate([colors, colors])
        exts = jnp.concatenate([exts, exts])
        vol = make_block_volume(CFG)
        ma = auto_max_active(vol, depths, exts, INTR, bucket=8)

        band, vis = jax.vmap(
            lambda d, e: _active_blocks(vol, d, e, INTR))(depths, exts)
        created = jax.lax.associative_scan(jnp.logical_or, band, axis=0)
        active = np.asarray(created & vis)
        n, nb = active.shape
        pad = (-n) % FPC
        if pad:
            active = np.concatenate([active, np.zeros((pad, nb), bool)])
        unions = active.reshape(-1, FPC, nb).any(axis=1).sum(axis=1)
        assert ma >= unions.max()


class TestClassifyKernel:
    """The Pallas block-activity classifier must equal the XLA gather path
    bit-for-bit (same bf16-safe mip table values, same comparisons)."""

    def test_matches_active_blocks(self):
        import jax

        from otslam_tpu.kernels.tsdf_block import _active_blocks
        from otslam_tpu.kernels.tsdf_pallas import _classify_blocks
        depths, colors, exts = scene()
        vol = make_block_volume(CFG)
        vol_meta = (vol.grid_blocks, vol.origin, vol.voxel_size,
                    vol.sdf_trunc)
        b1, v1 = jax.vmap(
            lambda d, e: _active_blocks(vol, d, e, INTR))(depths, exts)
        b2, v2 = _classify_blocks(depths, exts, INTR, vol_meta,
                                  interpret=True)
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        assert int(np.asarray(b1).sum()) > 0          # scene creates blocks

    def test_cumulative_or_matches_scan(self):
        import jax

        from otslam_tpu.kernels.tsdf_pallas import _cumulative_or
        rng = np.random.default_rng(3)
        band = jnp.asarray(rng.random((37, 513)) < 0.1)
        ref = jax.lax.associative_scan(jnp.logical_or, band, axis=0)
        np.testing.assert_array_equal(np.asarray(_cumulative_or(band)),
                                      np.asarray(ref))

    def test_near_fallback_counts(self):
        """Counts are zero for this far-field scene (skip mode exact) and
        positive when a block sits closer than the slab can cover."""
        from otslam_tpu.kernels.tsdf_pallas import near_fallback_counts
        depths, colors, exts = scene()
        vol = make_block_volume(CFG)
        vol_meta = (vol.grid_blocks, vol.origin, vol.voxel_size,
                    vol.sdf_trunc)
        counts = np.asarray(near_fallback_counts(
            vol.created, depths, exts, INTR, vol_meta, 64, interpret=True))
        assert counts.shape == (2,)
        assert counts.max() == 0
        # frame 1 (identity) creates the band blocks around the z=0.4503
        # plane (block-center layer z=0.44); frame 2's camera sits 0.075 m
        # below that layer, so those created blocks are in front
        # (pz=0.075 > r/2) but have corners behind the camera plane
        # (pz-0.08 < 1e-3) — the projection-unbounded case the slab cannot
        # cover
        near_ext = np.eye(4, dtype=np.float32)
        near_ext[2, 3] = -0.365
        counts2 = np.asarray(near_fallback_counts(
            vol.created, depths,
            jnp.asarray(np.stack([np.eye(4, dtype=np.float32), near_ext])),
            INTR, vol_meta, 512, interpret=True))
        assert counts2[0] == 0 and counts2[1] > 0


class TestNon128Width:
    """Widths above DEPTH_WIN that are not multiples of 128 (e.g. QVGA 320)
    previously produced a 64-lane depth-slab start — violating the kernel's
    ``pl.multiple_of(puf, 128)`` promise — and a 32-lane-misaligned half-res
    color window (color sampled 32 half-res columns to the right). The
    schedule now lane-pads such images to the next 128 multiple, keeping
    every window start aligned; this scene places blocks right-of-center
    (round(uc) >= 192 at W=320) where the misaligned start triggers."""

    INTR_320 = PinholeIntrinsics(320, 64, 280.0, 100.0, 160.5, 32.5)
    CFG_320 = TSDFConfig(voxel_size=0.01, sdf_trunc=0.04, dims=(16, 16, 16),
                         origin=(0.06, -0.08, 0.40))

    def _scene(self):
        depths = jnp.asarray(np.full((1, 64, 320), 0.5, np.float32))
        # color = a pure-u ramp: a shifted color window shows up as a
        # ~0.8 * shift error; correct half-res sampling errs < 1 px
        u_ramp = np.linspace(0, 255, 320, dtype=np.float32)[None, :, None]
        colors = jnp.asarray(
            np.broadcast_to(u_ramp, (64, 320, 3)).copy()[None])
        exts = jnp.asarray(np.eye(4, dtype=np.float32))[None]
        return depths, colors, exts

    @pytest.mark.slow
    def test_half_res_color_parity_at_w320(self):
        depths, colors, exts = self._scene()
        s = integrate_frames_sparse(make_block_volume(self.CFG_320), depths,
                                    colors, exts, self.INTR_320,
                                    max_active=64)
        p = integrate_frames_pallas(make_block_volume(self.CFG_320), depths,
                                    colors, exts, self.INTR_320,
                                    max_active=64, interpret=True)
        ws, wp = np.asarray(s.weight), np.asarray(p.weight)
        frac_diff = (ws != wp).sum() / max((ws > 0).sum(), 1)
        assert frac_diff < 0.015
        m = (ws > 0) & (wp > 0)
        assert m.sum() > 500            # the scene really exercises blocks
        cs = np.asarray(s.color).reshape(-1, 3, 512).transpose(1, 0, 2)
        cp = np.asarray(p.color).reshape(-1, 3, 512).transpose(1, 0, 2)
        # half-res sampling may differ from the gather path by one full-res
        # pixel on this ramp (0.8/px); a misaligned window is off by ~26+
        assert np.abs(cs[:, m] - cp[:, m]).max() < 2.0
        np.testing.assert_allclose(np.asarray(p.tsdf)[m],
                                   np.asarray(s.tsdf)[m], atol=1e-3)


class TestAutoPatchRows:
    @pytest.mark.slow
    def test_small_slab_matches_default_bitwise(self):
        """auto_patch_rows shrinks the depth-slab M dimension (the dominant
        selection-dot cost) to the workload's projected v-spans; because
        the skip set is unchanged, the result is BIT-IDENTICAL to the
        PATCH_ROWS default — same selections, same math, fewer MACs."""
        from otslam_tpu.kernels.tsdf_pallas import (auto_max_active,
                                                    auto_patch_rows)

        depths, colors, exts = scene()
        vol0 = make_block_volume(CFG)
        ma = auto_max_active(vol0, depths, exts, INTR)
        pr = auto_patch_rows(vol0, depths, exts, INTR, ma, interpret=True)
        assert pr % 8 == 0 and 16 <= pr < 48  # genuinely smaller than H=48
        p_small = integrate_frames_pallas(
            make_block_volume(CFG), depths, colors, exts, INTR,
            max_active=ma, interpret=True, patch_rows=pr)
        p_def = integrate_frames_pallas(
            make_block_volume(CFG), depths, colors, exts, INTR,
            max_active=ma, interpret=True)
        np.testing.assert_array_equal(np.asarray(p_small.weight),
                                      np.asarray(p_def.weight))
        np.testing.assert_array_equal(np.asarray(p_small.tsdf),
                                      np.asarray(p_def.tsdf))
        np.testing.assert_array_equal(np.asarray(p_small.color),
                                      np.asarray(p_def.color))

    @pytest.mark.slow
    def test_too_small_slab_falls_back_exactly(self):
        """A hand-forced undersized slab must route uncovered pairs through
        the exact fallback — zero lost integrations, same weights."""
        depths, colors, exts = scene()
        s = integrate_frames_sparse(make_block_volume(CFG), depths, colors,
                                    exts, INTR, max_active=64)
        p = integrate_frames_pallas(make_block_volume(CFG), depths, colors,
                                    exts, INTR, max_active=64,
                                    interpret=True, patch_rows=16,
                                    near_field="fallback")
        np.testing.assert_array_equal(np.asarray(s.weight),
                                      np.asarray(p.weight))


class TestDepthWin:
    """depth_win=128: the one-K-tile depth window at 32-grained lane starts
    (read from 4 lane-shifted depth copies — Mosaic only allows 128-aligned
    dynamic lane starts). Selection is one-hot, so whenever the coverage
    sets match, the result must be BIT-identical to the 256-lane default."""

    INTR_MID = PinholeIntrinsics(384, 288, 320.0, 320.0, 192.0, 144.0)
    CFG_MID = TSDFConfig(voxel_size=0.02, sdf_trunc=0.08, dims=(48, 48, 48),
                         origin=(-0.48, -0.48, 0.4))

    def _mid_scene(self, n=7):
        """Far-field planes seen from laterally-offset tilted poses: block
        u-spans are ~30-50 px, and the varied view geometry lands window
        starts on all four 32-lane phases (asserted below)."""
        depths, colors, exts = [], [], []
        for i in range(n):
            depths.append(np.full((288, 384), 1.05 + 0.03 * i, np.float32))
            colors.append(np.tile(np.linspace(
                0, 255, 384, dtype=np.float32)[None, :, None], (288, 1, 3)))
            th = 0.05 * (i - n / 2)
            E = np.eye(4, dtype=np.float32)
            E[:3, :3] = np.array(
                [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                 [-np.sin(th), 0, np.cos(th)]], np.float32)
            E[:3, 3] = [0.02 * i - 0.05, 0.015 * (i % 3), 0.01 * i]
            exts.append(E)
        return (jnp.asarray(np.stack(depths)), jnp.asarray(np.stack(colors)),
                jnp.asarray(np.stack(exts)))

    def test_all_window_phases_scheduled(self):
        """The fixture must actually exercise every shifted plane."""
        from otslam_tpu.kernels.tsdf_pallas import (
            _block_schedule, _pad_to_fpc, _win_planes)
        depths, colors, exts = self._mid_scene()
        vol0 = make_block_volume(self.CFG_MID)
        vm = (vol0.grid_blocks, vol0.origin, vol0.voxel_size, vol0.sdf_trunc)
        win, planes = _win_planes(128, depths.shape[2], depths.shape[1])
        assert (win, planes) == (128, 4)
        e2, d2 = _pad_to_fpc(exts, depths)
        sched = _block_schedule(vol0.created, d2, e2, self.INTR_MID, vm,
                                2048, 40, win, depths.shape[0], True, False,
                                planes)
        act, puf = np.asarray(sched[1]), np.asarray(sched[4])
        phases = set(np.unique(puf[act > 0] % 128).tolist())
        assert phases == {0, 32, 64, 96}

    @pytest.mark.slow
    def test_depth_win_128_matches_default_bitwise(self):
        from otslam_tpu.kernels.tsdf_pallas import (auto_depth_win,
                                                    near_fallback_counts)
        depths, colors, exts = self._mid_scene()
        vol0 = make_block_volume(self.CFG_MID)
        vm = (vol0.grid_blocks, vol0.origin, vol0.voxel_size, vol0.sdf_trunc)
        assert auto_depth_win(vol0, depths, exts, self.INTR_MID, 2048,
                              interpret=True) == 128
        assert int(np.sum(np.asarray(near_fallback_counts(
            vol0.created, depths, exts, self.INTR_MID, vm, 2048,
            interpret=True, depth_win=128)))) == 0
        p128 = integrate_frames_pallas(
            make_block_volume(self.CFG_MID), depths, colors, exts,
            self.INTR_MID, max_active=2048, interpret=True, depth_win=128)
        p_def = integrate_frames_pallas(
            make_block_volume(self.CFG_MID), depths, colors, exts,
            self.INTR_MID, max_active=2048, interpret=True)
        np.testing.assert_array_equal(np.asarray(p128.weight),
                                      np.asarray(p_def.weight))
        np.testing.assert_array_equal(np.asarray(p128.tsdf),
                                      np.asarray(p_def.tsdf))
        np.testing.assert_array_equal(np.asarray(p128.color),
                                      np.asarray(p_def.color))

    @pytest.mark.slow
    def test_narrow_window_falls_back_exactly(self):
        """Blocks whose u-span fits 256 but not 128 lanes (the near scene's
        ~107 px spans) must route through the exact fallback under
        depth_win=128, and auto_depth_win must refuse the narrow window."""
        from otslam_tpu.kernels.tsdf_pallas import DEPTH_WIN, auto_depth_win
        depths, colors, exts = TestNearField()._near_scene()
        intr, cfg = TestNearField.INTR_BIG, TestNearField.CFG_NEAR
        vol0 = make_block_volume(cfg)
        assert auto_depth_win(vol0, depths, exts, intr, 512,
                              interpret=True) == DEPTH_WIN
        s = integrate_frames_sparse(make_block_volume(cfg), depths, colors,
                                    exts, intr, max_active=512)
        p = integrate_frames_pallas(make_block_volume(cfg), depths, colors,
                                    exts, intr, max_active=512,
                                    interpret=True, depth_win=128,
                                    near_field="fallback")
        np.testing.assert_array_equal(np.asarray(s.weight),
                                      np.asarray(p.weight))
        m = np.asarray(s.weight) > 0
        np.testing.assert_allclose(np.asarray(p.tsdf)[m],
                                   np.asarray(s.tsdf)[m], atol=1e-3)

    def test_full_color_combination_rejected(self):
        depths, colors, exts = scene()
        with pytest.raises(ValueError, match="color_res"):
            integrate_frames_pallas(
                make_block_volume(CFG), depths, colors, exts, INTR,
                max_active=64, interpret=True, depth_win=128,
                color_res="full")

    def test_two_plane_schedule(self):
        """depth_planes=2 (64-grain starts, one extra shifted copy): the
        wide 7-view mid scene's ~50-65 px corner spans overflow its
        ~63 px guarantee for some pairs, so auto_depth_config must reject
        it in favor of planes=4; its scheduled starts are 64-grained."""
        from otslam_tpu.kernels.tsdf_pallas import (
            _block_schedule, _pad_to_fpc, _win_planes, auto_depth_config,
            near_fallback_counts)
        depths, colors, exts = self._mid_scene()
        vol0 = make_block_volume(self.CFG_MID)
        vm = (vol0.grid_blocks, vol0.origin, vol0.voxel_size, vol0.sdf_trunc)
        assert auto_depth_config(vol0, depths, exts, self.INTR_MID, 2048,
                                 interpret=True) == (128, 4)
        # p2 costs extra skips here (that's why auto rejects it)
        assert int(np.sum(np.asarray(near_fallback_counts(
            vol0.created, depths, exts, self.INTR_MID, vm, 2048,
            interpret=True, depth_win=128, depth_planes=2)))) > 0
        win, planes = _win_planes(128, depths.shape[2], depths.shape[1], 2)
        assert (win, planes) == (128, 2)
        e2, d2 = _pad_to_fpc(exts, depths)
        sched = _block_schedule(vol0.created, d2, e2, self.INTR_MID, vm,
                                2048, 40, win, depths.shape[0], True, False,
                                planes)
        act, puf = np.asarray(sched[1]), np.asarray(sched[4])
        assert set(np.unique(puf[act > 0] % 64).tolist()) == {0}

    @pytest.mark.slow
    def test_two_plane_covered_scene_bitwise(self):
        """On a narrow 2-view scene the 64-grain window covers every pair:
        auto_depth_config prefers the cheaper planes=2, and the result is
        BIT-identical to the default window (one-hot selection)."""
        from otslam_tpu.kernels.tsdf_pallas import auto_depth_config
        depths, colors, exts = self._mid_scene(n=2)
        vol0 = make_block_volume(self.CFG_MID)
        assert auto_depth_config(vol0, depths, exts, self.INTR_MID, 2048,
                                 interpret=True) == (128, 2)
        p2 = integrate_frames_pallas(
            make_block_volume(self.CFG_MID), depths, colors, exts,
            self.INTR_MID, max_active=2048, interpret=True, depth_win=128,
            depth_planes=2)
        p_def = integrate_frames_pallas(
            make_block_volume(self.CFG_MID), depths, colors, exts,
            self.INTR_MID, max_active=2048, interpret=True)
        np.testing.assert_array_equal(np.asarray(p2.weight),
                                      np.asarray(p_def.weight))
        np.testing.assert_array_equal(np.asarray(p2.tsdf),
                                      np.asarray(p_def.tsdf))
        np.testing.assert_array_equal(np.asarray(p2.color),
                                      np.asarray(p_def.color))

    def test_non_8_multiple_height_knob_logic(self):
        """The shifted-plane select is a dynamic sublane start plane*H +
        pvf whose 8-alignment promise needs 8 | H — for other heights
        depth_win=128 must quietly become the classic 256 window (win=128
        at 128-grain starts would skip nearly every pair)."""
        from otslam_tpu.kernels.tsdf_pallas import DEPTH_WIN, _win_planes
        assert _win_planes(128, 384, 288) == (128, 4)
        assert _win_planes(128, 384, 100) == (min(DEPTH_WIN, 384), 1)
        assert _win_planes(None, 384, 100) == (min(DEPTH_WIN, 384), 1)

    @pytest.mark.slow
    def test_non_8_multiple_height_falls_back_e2e(self):
        # end-to-end at H=100: same result as an explicit classic window
        intr = PinholeIntrinsics(256, 100, 120.0, 120.0, 128.0, 50.0)
        cfg = TSDFConfig(voxel_size=0.02, sdf_trunc=0.08, dims=(32, 32, 32),
                         origin=(-0.32, -0.32, 0.2))
        depths = jnp.asarray(np.full((1, 100, 256), 0.62, np.float32))
        colors = jnp.asarray(np.full((1, 100, 256, 3), 90.0, np.float32))
        exts = jnp.asarray(np.eye(4, dtype=np.float32))[None]
        p128 = integrate_frames_pallas(
            make_block_volume(cfg), depths, colors, exts, intr,
            max_active=256, interpret=True, depth_win=128)
        p_def = integrate_frames_pallas(
            make_block_volume(cfg), depths, colors, exts, intr,
            max_active=256, interpret=True)
        np.testing.assert_array_equal(np.asarray(p128.weight),
                                      np.asarray(p_def.weight))
        np.testing.assert_array_equal(np.asarray(p128.tsdf),
                                      np.asarray(p_def.tsdf))


class TestColorRows:
    """auto_color_rows shrinks the half-res color window (the color slab
    dot's M/3) to the workload's projected half-res v-spans — the same
    zero-extra-fallbacks construction as auto_patch_rows."""

    @pytest.mark.slow
    def test_small_color_window_matches_default_bitwise(self):
        from otslam_tpu.kernels.tsdf_pallas import auto_color_rows

        intr = TestDepthWin.INTR_MID
        cfg = TestDepthWin.CFG_MID
        depths, colors, exts = TestDepthWin()._mid_scene()
        vol0 = make_block_volume(cfg)
        cr = auto_color_rows(vol0, depths, exts, intr, 2048, interpret=True)
        assert cr % 8 == 0 and 16 <= cr < 64  # genuinely smaller than 64
        p_small = integrate_frames_pallas(
            make_block_volume(cfg), depths, colors, exts, intr,
            max_active=2048, interpret=True, color_rows=cr)
        p_def = integrate_frames_pallas(
            make_block_volume(cfg), depths, colors, exts, intr,
            max_active=2048, interpret=True)
        np.testing.assert_array_equal(np.asarray(p_small.weight),
                                      np.asarray(p_def.weight))
        np.testing.assert_array_equal(np.asarray(p_small.tsdf),
                                      np.asarray(p_def.tsdf))
        np.testing.assert_array_equal(np.asarray(p_small.color),
                                      np.asarray(p_def.color))

    @pytest.mark.slow
    def test_too_small_color_window_falls_back_exactly(self):
        """An undersized color window must actually ROUTE pairs to the
        fallback (asserted via near_fallback_counts — the mid scene's
        ~24 half-res-row spans overflow 16 rows) and the fallback must
        keep weight, tsdf, AND color exact."""
        from otslam_tpu.kernels.tsdf_pallas import near_fallback_counts
        intr = TestDepthWin.INTR_MID
        cfg = TestDepthWin.CFG_MID
        depths, colors, exts = TestDepthWin()._mid_scene(n=2)
        vol0 = make_block_volume(cfg)
        vm = (vol0.grid_blocks, vol0.origin, vol0.voxel_size, vol0.sdf_trunc)
        assert int(np.sum(np.asarray(near_fallback_counts(
            vol0.created, depths, exts, intr, vm, 2048, interpret=True,
            color_rows=16)))) > 0
        s = integrate_frames_sparse(make_block_volume(cfg), depths, colors,
                                    exts, intr, max_active=2048)
        p = integrate_frames_pallas(make_block_volume(cfg), depths, colors,
                                    exts, intr, max_active=2048,
                                    interpret=True, color_rows=16,
                                    near_field="fallback")
        np.testing.assert_array_equal(np.asarray(s.weight),
                                      np.asarray(p.weight))
        m = np.asarray(s.weight) > 0
        np.testing.assert_allclose(np.asarray(p.tsdf)[m],
                                   np.asarray(s.tsdf)[m], atol=1e-3)
        cs = np.asarray(s.color).reshape(-1, 3, 512).transpose(1, 0, 2)
        cp = np.asarray(p.color).reshape(-1, 3, 512).transpose(1, 0, 2)
        assert np.abs(cs[:, m] - cp[:, m]).max() < 4.1  # one half-res pixel
        # of this 384-px gradient (255/383*2*3 color steps) + quantization


@pytest.mark.slow
class TestColorWindowSkew:
    """Parallax-skewed blocks vs the half-res color row window.

    Frames 17-19 of a VGA capture circle around a cube see far-side blocks
    (created by earlier poses) whose projected v-span midpoint sits several
    rows away from the block-center projection. The pre-round-3
    center-anchored 64-row color window clipped up to 2 half-rows of such
    pairs even though the depth slab covered them — those voxels
    accumulated WEIGHT with ZERO color for the frame (a color bias the
    parity suites never hit at small image sizes). The span-midpoint
    anchor plus the color-window condition in the coverage test keep color
    selection exact; this fixture self-checks that the old formula would
    still clip it."""

    INTR_VGA = PinholeIntrinsics(640, 480, 565.6009, 565.6009, 320.5, 240.5)

    @staticmethod
    def _circle_frames(intr, count, n=48):
        """Analytic cube viewed from a capture circle (the bench.py
        workload: eye radius 1.2 m, z=0.2, looking at a 0.4 m cube)."""
        rays = np.asarray(intr.pixel_rays())
        lo = np.array([-0.2, -0.2, 0.0])
        hi = np.array([0.2, 0.2, 0.4])
        depths, colors, exts = [], [], []
        for i in range(count):
            ang = 2 * np.pi * i / n
            eye = np.array([1.2 * np.cos(ang), 1.2 * np.sin(ang), 0.2])
            fwd = -eye / np.linalg.norm(eye)
            up = np.array([0.0, 0.0, -1.0])
            right = np.cross(up, fwd)
            right /= np.linalg.norm(right)
            down = np.cross(fwd, right)
            R = np.stack([right, down, fwd], axis=1)
            dirs = rays @ R.T
            with np.errstate(divide="ignore", invalid="ignore"):
                t1 = (lo - eye) / dirs
                t2 = (hi - eye) / dirs
            tmin = np.minimum(t1, t2).max(-1)
            tmax = np.maximum(t1, t2).min(-1)
            hit = (tmax > tmin) & (tmin > 0.1)
            depths.append(np.where(hit, tmin, 0.0).astype(np.float32))
            colors.append(np.full((intr.height, intr.width, 3), 128.0,
                                  np.float32))
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = R
            T[:3, 3] = eye
            exts.append(np.linalg.inv(T).astype(np.float32))
        return np.stack(depths), np.stack(colors), np.stack(exts)

    @staticmethod
    def _old_center_anchor_violations(vol, depths, exts, intr):
        """Integrated (frame, block) pairs whose half-res color rows the
        pre-round-3 center-projection pvh window would clip."""
        import jax

        from otslam_tpu.kernels.tsdf_block import BLOCK, _active_blocks
        from otslam_tpu.kernels.tsdf_pallas import (_corner_bounds,
                                                    _cumulative_or)

        nb = vol.num_blocks
        band, vis = jax.vmap(
            lambda d, e: _active_blocks(vol, d, e, intr))(depths, exts)
        created = _cumulative_or(band) | jnp.asarray(vol.created)[:nb][None]
        active = np.asarray(created & vis)
        H, W = intr.height, intr.width
        pr, win, cr = 128, 256, 64
        vm = (vol.grid_blocks, vol.origin, vol.voxel_size, vol.sdf_trunc)
        by, bz = vol.grid_blocks[1], vol.grid_blocks[2]
        side = BLOCK * vol.voxel_size
        viol = 0
        for f in range(active.shape[0]):
            idn = np.nonzero(active[f])[0]
            if idn.size == 0:
                continue
            bounds = _corner_bounds(vm, jnp.asarray(idn), exts[f], intr)
            umin, umax, vmin, vmax, nbeh = (np.asarray(x) for x in bounds)
            v_lo = np.clip(np.floor(vmin) - 1, 0, H - 1)
            v_hi = np.clip(np.ceil(vmax) + 1, 0, H - 1)
            u_lo = np.clip(np.floor(umin) - 1, 0, W - 1)
            u_hi = np.clip(np.ceil(umax) + 1, 0, W - 1)
            off = ((umax < -0.5) | (umin >= W - 0.5)
                   | (vmax < -0.5) | (vmin >= H - 0.5))
            ix = idn // (by * bz)
            iy = (idn // bz) % by
            iz = idn % bz
            ctr = np.stack([vol.origin[0] + ix * side,
                            vol.origin[1] + iy * side,
                            vol.origin[2] + iz * side], -1) + side / 2
            E = np.asarray(exts[f])
            q = ctr @ E[:3, :3].T + E[:3, 3]
            z = np.maximum(q[:, 2], 1e-3)
            uc = intr.fx * q[:, 0] / z + intr.cx
            vc = intr.fy * q[:, 1] / z + intr.cy
            pvf = np.clip(np.round(vc).astype(int) - pr // 2, 0, H - pr) & ~7
            puf = np.clip((np.round(uc).astype(int) - win // 2 + 64) & ~127,
                          0, W - win)
            covered = ((u_lo >= puf) & (u_hi < puf + win)
                       & (v_lo >= pvf) & (v_hi < pvf + pr))
            inter = (nbeh == 0) & ~off & covered
            pvh_old = np.clip(np.round(vc / 2).astype(int) - cr // 2,
                              0, H // 2 - cr) & ~7
            ok = (((v_lo // 2).astype(int) >= pvh_old)
                  & ((v_hi // 2).astype(int) < pvh_old + cr))
            viol += int((inter & ~ok).sum())
        return viol

    def test_skewed_blocks_color_parity(self):
        from otslam_tpu.kernels.tsdf_block import BlockTSDFVolume
        from otslam_tpu.kernels.tsdf_pallas import (auto_max_active,
                                                    near_fallback_counts)

        intr = self.INTR_VGA
        cfg = TSDFConfig()            # reference parameters, 256^3 @ 1 cm
        d, c, e = self._circle_frames(intr, 20)
        prefix = integrate_frames_sparse(
            make_block_volume(cfg), jnp.asarray(d[:17]), jnp.asarray(c[:17]),
            jnp.asarray(e[:17]), intr, max_active=1024)
        prefix2 = BlockTSDFVolume(
            jnp.array(prefix.tsdf), jnp.array(prefix.weight),
            jnp.array(prefix.color), jnp.array(prefix.created),
            prefix.origin, prefix.voxel_size, prefix.sdf_trunc,
            prefix.grid_blocks)
        depths = jnp.asarray(d[17:])
        colors = jnp.asarray(c[17:])
        exts = jnp.asarray(e[17:])

        # fixture self-check: the old center-anchored window clips here
        assert self._old_center_anchor_violations(
            prefix, depths, exts, intr) >= 1

        # the reworked schedule covers every pair — skip mode is exact
        ma = int(auto_max_active(prefix, depths, exts, intr))
        vm = (prefix.grid_blocks, prefix.origin, prefix.voxel_size,
              prefix.sdf_trunc)
        counts = np.asarray(near_fallback_counts(
            prefix.created, depths, exts, intr, vm, ma, interpret=True))
        assert counts.max() == 0

        s = integrate_frames_sparse(prefix, depths, colors, exts, intr,
                                    max_active=ma)
        p = integrate_frames_pallas(prefix2, depths, colors, exts, intr,
                                    max_active=ma, interpret=True,
                                    near_field="skip")
        ws, wp = np.asarray(s.weight), np.asarray(p.weight)
        m = (ws > 0) & (wp > 0)
        assert m.sum() > 10000
        cs = np.asarray(s.color).reshape(-1, 3, 512).transpose(1, 0, 2)
        cp = np.asarray(p.color).reshape(-1, 3, 512).transpose(1, 0, 2)
        # constant-128 color field: any clipped frame contribution shows
        # up as a tens-of-units running-mean drop; exact selection is 0
        assert np.abs(cs[:, m] - cp[:, m]).max() < 1.0


@pytest.mark.slow
class TestFuzzParity:
    """Seeded random-geometry fuzz of the sparse-vs-Pallas contract: smooth
    random depth fields with invalid holes, random small camera motion,
    frame counts that exercise the FPC chunk padding (n % FPC != 0). The
    fixed-scene tests above pin the contract at one geometry; this guards
    the schedule/windowing corners (straddling spans, multi-chunk unions)
    at arbitrary ones."""

    def _random_batch(self, seed):
        r = np.random.default_rng(seed)
        n = int(r.integers(3, 11))          # crosses the FPC=8 boundary
        H, W = 48, 64
        us, vs = np.meshgrid(np.arange(W), np.arange(H))
        depths, exts = [], []
        for i in range(n):
            fx, fy = r.uniform(1.0, 4.0, 2)
            ph = r.uniform(0, 2 * np.pi, 2)
            d = (0.5 + 0.08 * np.sin(2 * np.pi * fx * us / W + ph[0])
                 * np.cos(2 * np.pi * fy * vs / H + ph[1])).astype(np.float32)
            # invalid holes (sensor dropouts)
            hole = r.random((H, W)) < 0.03
            d[hole] = 0.0
            depths.append(d)
            th = r.uniform(-0.12, 0.12)
            ax = r.integers(0, 3)
            c, s = np.cos(th), np.sin(th)
            R = np.eye(3, dtype=np.float32)
            i0, i1 = [k for k in range(3) if k != ax]
            R[i0, i0] = c; R[i1, i1] = c; R[i0, i1] = -s; R[i1, i0] = s
            E = np.eye(4, dtype=np.float32)
            E[:3, :3] = R
            E[:3, 3] = r.uniform(-0.03, 0.03, 3).astype(np.float32)
            exts.append(E)
        colors = r.uniform(0, 255, (n, H, W, 3)).astype(np.float32)
        return (jnp.asarray(np.stack(depths)), jnp.asarray(colors),
                jnp.asarray(np.stack(exts)))

    @pytest.mark.parametrize("seed", [11, 23, 47])
    def test_sparse_vs_pallas(self, seed):
        depths, colors, exts = self._random_batch(seed)
        s = integrate_frames_sparse(make_block_volume(CFG), depths, colors,
                                    exts, INTR, max_active=256)
        p = integrate_frames_pallas(make_block_volume(CFG), depths, colors,
                                    exts, INTR, max_active=256,
                                    interpret=True)
        ws, wp = np.asarray(s.weight), np.asarray(p.weight)
        ts, tp = np.asarray(s.tsdf), np.asarray(p.tsdf)
        observed = (ws > 0) | (wp > 0)
        assert observed.sum() > 1000, "fuzz scene must integrate real volume"
        frac_diff = (ws != wp).sum() / max(observed.sum(), 1)
        assert frac_diff < 0.015
        same = (ws == wp) & (ws > 0)
        np.testing.assert_allclose(tp[same], ts[same], atol=1e-3)
        assert np.array_equal(np.asarray(s.created), np.asarray(p.created))


class TestSmemCapacityFallback:
    """Schedules beyond the 1 MiB SMEM budget must route to the XLA
    block-sparse path instead of failing the remote compile (observed: a
    ~3 m full_room table-group object needed ~9.9k active rows = 1.58 MiB
    of scalar-prefetch schedules and broke `reconstruct` on the chip)."""

    def test_oversized_max_active_falls_back_exactly(self):
        from otslam_tpu.kernels.tsdf_pallas import smem_max_active

        depths, colors, exts = scene()
        big = smem_max_active() + 8
        # interpret=False on CPU would die inside pallas_call — the gate
        # must intercept BEFORE any kernel is built, returning the sparse
        # path's exact result
        p = integrate_frames_pallas(make_block_volume(CFG), depths, colors,
                                    exts, INTR, max_active=big,
                                    interpret=False)
        s = integrate_frames_sparse(make_block_volume(CFG), depths, colors,
                                    exts, INTR, max_active=big)
        np.testing.assert_array_equal(np.asarray(p.tsdf), np.asarray(s.tsdf))
        np.testing.assert_array_equal(np.asarray(p.weight),
                                      np.asarray(s.weight))

    def test_cap_is_sane(self):
        from otslam_tpu.kernels.tsdf_pallas import FPC, smem_max_active

        a = smem_max_active()
        assert a % 8 == 0
        # fits the budget with slack; bigger than the bench workload's 896
        assert 4 * (a * (1 + 5 * FPC) + FPC * 12) <= 1_000_000
        assert a >= 4096
