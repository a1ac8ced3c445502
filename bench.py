"""Headline benchmark: VGA RGB-D frames TSDF-fused per second per chip.

Generates a synthetic object-scan sequence (cube viewed from a capture
circle, rendered analytically), fuses it with the block-sparse Pallas path at
the reference configuration (1 cm voxels, 4 cm truncation, 256^3 grid,
640x480 frames), and prints one JSON line. Baseline = the BASELINE.json
north-star target of 500 frames/s/chip (the reference publishes no
throughput numbers; its Open3D CPU path measures ~10 f/s class).
"""

import json
import time

import numpy as np


def _make_frames(intr, n):
    rays = np.asarray(intr.pixel_rays())
    lo = np.array([-0.2, -0.2, 0.0])
    hi = np.array([0.2, 0.2, 0.4])
    depths, colors, exts = [], [], []
    for i in range(n):
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
        colors.append(np.full((intr.height, intr.width, 3), 128.0, np.float32))
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = eye
        exts.append(np.linalg.inv(T).astype(np.float32))
    return (np.stack(depths), np.stack(colors), np.stack(exts))


def main():
    import jax
    import jax.numpy as jnp

    from otslam_tpu.config import TSDFConfig
    from otslam_tpu.core.camera import PinholeIntrinsics
    from otslam_tpu.kernels.tsdf_block import make_block_volume
    from otslam_tpu.kernels.tsdf_pallas import (auto_color_rows,
                                                auto_depth_win,
                                                auto_max_active,
                                                auto_patch_rows,
                                                integrate_frames_pallas)

    on_tpu = jax.devices()[0].platform != "cpu"
    intr = PinholeIntrinsics(width=640, height=480, fx=565.6009, fy=565.6009,
                             cx=320.5, cy=240.5)
    cfg = TSDFConfig()  # 256^3 @ 1 cm, trunc 4 cm (reference parameters)
    n = 384 if on_tpu else 4

    d, c, e = _make_frames(intr, n)
    depths = jnp.asarray(d)
    colors = jnp.asarray(c)
    exts = jnp.asarray(e)
    # capacity + slab height sized to the workload (exact bounds from the
    # scheduling pass: auto_patch_rows shrinks the selection dots' M to the
    # capture circle's projected v-spans at zero extra fallbacks)
    vol0 = make_block_volume(cfg)
    max_active = auto_max_active(vol0, depths, exts, intr)
    depth_win = auto_depth_win(vol0, depths, exts, intr, max_active,
                               interpret=not on_tpu)
    patch_rows = auto_patch_rows(vol0, depths, exts, intr, max_active,
                                 interpret=not on_tpu, depth_win=depth_win)
    color_rows = auto_color_rows(vol0, depths, exts, intr, max_active,
                                 interpret=not on_tpu, depth_win=depth_win,
                                 patch_rows=patch_rows)
    from otslam_tpu.kernels.tsdf_pallas import near_fallback_counts

    def measure(dw, cr):
        # far-field workloads (this capture circle) have zero uncovered
        # pairs, making near_field="skip" exact — verified here, untimed —
        # and free of the fallback mode's mid-pipeline host sync
        counts = np.asarray(near_fallback_counts(
            vol0.created, depths, exts, intr,
            (vol0.grid_blocks, vol0.origin, vol0.voxel_size,
             vol0.sdf_trunc),
            max_active, interpret=not on_tpu, patch_rows=patch_rows,
            depth_win=dw, color_rows=cr))
        near_field = "skip" if counts.max() == 0 else "fallback"

        def run():
            vol = integrate_frames_pallas(
                make_block_volume(cfg), depths, colors, exts, intr,
                max_active=max_active, interpret=not on_tpu,
                near_field=near_field, patch_rows=patch_rows,
                depth_win=dw, color_rows=cr)
            return vol.tsdf

        r = run()                            # warmup/compile
        _ = np.asarray(r[:2, 0])
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            r = run()
            _ = np.asarray(r[:2, 0])
            best = min(best, time.time() - t0)
        return n / best

    # the auto knobs are a coverage construction, not a timing one — time
    # the auto config AGAINST the legacy window geometry and report the
    # measured winner (auto-tuning, robust to silicon surprises)
    configs = {(depth_win, color_rows): measure(depth_win, color_rows)}
    if (depth_win, color_rows) != (None, None):
        configs[(None, None)] = measure(None, None)
    (dw_best, cr_best), fps = max(configs.items(), key=lambda kv: kv[1])
    out = {
        "metric": "vga_frames_fused_per_sec",
        "value": round(fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 500.0, 3),
        "fusion_config": {
            "patch_rows": patch_rows, "depth_win": dw_best or 256,
            "color_rows": cr_best or 64, "max_active": int(max_active),
            "alternates": {f"dw{k[0] or 256}_cr{k[1] or 64}": round(v, 1)
                           for k, v in configs.items()},
        },
    }
    # secondary metric inside the same single JSON line (ICP has no published
    # reference throughput; recorded for round-over-round tracking)
    try:
        import bench_icp

        icp = bench_icp.measure()
        out["icp_iterations_per_sec"] = icp["value"]
        out["icp_unit"] = icp["unit"]
    except Exception as e:  # never let the secondary break the headline line
        out["icp_error"] = repr(e)[:120]
    try:
        pt = measure_perception_ticks()
        out["perception_ticks_per_sec"] = pt
        out["perception_unit"] = "ticks/s (1440 beams, 512^2 map, K=64)"
    except Exception as e:
        out["perception_error"] = repr(e)[:120]
    try:
        me = measure_mesh_extract(depths[:16], colors[:16], exts[:16],
                                  intr, cfg)
        out["mesh_extracts_per_sec"] = me
        out["mesh_unit"] = "extractions/s (256^3 marching tetrahedra)"
    except Exception as exc:
        out["mesh_error"] = repr(exc)[:120]
    print(json.dumps(out))


def measure_mesh_extract(d, c, e, intr, cfg) -> float:
    """Mesh-extraction throughput: marching tetrahedra over the full 256^3
    dense volume (the reconstruct pipeline's extract stage,
    reconstruct_rgbd.py:111-112 equivalent). One jitted dispatch per
    extraction; the active-cell compaction uses the top_k pattern
    (kernels/marching.py)."""
    import jax
    import jax.numpy as jnp

    from otslam_tpu.kernels.marching import auto_max_cells, extract_mesh_soup
    from otslam_tpu.kernels.tsdf import integrate_frames, make_volume

    vol = make_volume(cfg)
    vol = integrate_frames(vol, jnp.asarray(d), jnp.asarray(c),
                           jnp.asarray(e), intr)
    _ = np.asarray(vol.tsdf[:2, 0, 0])
    # capacity sized to the workload (exact bound, untimed — mirrors
    # auto_max_active for the fusion metric)
    mc = auto_max_cells(vol)

    def run():
        return extract_mesh_soup(vol, max_cells=mc)

    _, _, mask = run()
    _ = np.asarray(mask[:2])
    best = float("inf")
    for _i in range(5):
        t0 = time.time()
        _, _, mask = run()
        _ = np.asarray(mask[:2])
        best = min(best, time.time() - t0)
    return round(1.0 / best, 1)


def measure_perception_ticks(k: int = 64) -> float:
    """Closed-loop perception throughput: K full ticks (raycast 1440 beams ->
    windowed diff -> evidence grids -> compaction) fused into one dispatch
    (mapping/perception.py) — the amortized-RTT path for missions on the
    remote chip."""
    import jax.numpy as jnp

    from otslam_tpu.config import ChangeDetectConfig, LidarConfig
    from otslam_tpu.mapping.perception import perception_ticks
    from otslam_tpu.sim.world import Box, Scene

    lidar = LidarConfig()
    cfg = ChangeDetectConfig()
    scene = Scene(objects=(Box((1.5, 0.5, 0.15), (0.5, 0.4, 0.3), 0.3,
                               (0.7, 0.6, 0.4), "box"),))
    grid = scene.occupancy_grid(0.05)
    n = lidar.num_beams
    inc = (lidar.angle_max - lidar.angle_min) / n
    angles = jnp.asarray(lidar.angle_min + np.arange(n) * inc, jnp.float32)
    rng = np.random.default_rng(0)
    reals = jnp.asarray(rng.uniform(0.5, 8.0, (k, n)).astype(np.float32))
    poses = jnp.asarray(
        np.stack([np.linspace(-1, 1, k), np.linspace(1, 0, k),
                  np.linspace(-1.5, -1.0, k)], axis=1).astype(np.float32))
    dts = jnp.full((k,), 0.2, jnp.float32)
    gh, gw = cfg.grid_cells
    new_g = jnp.zeros((gh, gw), jnp.float32)
    gone_g = jnp.zeros((gh, gw), jnp.float32)

    def run():
        return perception_ticks(
            grid.data, float(grid.resolution), float(grid.origin[0]),
            float(grid.origin[1]), new_g, gone_g, reals, poses, dts,
            angles, cfg, float(lidar.range_max))

    b = run()
    _ = np.asarray(b.added_cnt)          # sync
    best = float("inf")
    for _i in range(3):
        t0 = time.time()
        b = run()
        _ = np.asarray(b.added_cnt)
        best = min(best, time.time() - t0)
    return round(k / best, 1)


if __name__ == "__main__":
    main()
