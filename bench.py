"""Headline benchmark: VGA RGB-D frames TSDF-fused per second per chip.

Generates a synthetic object-scan sequence (cube viewed from a capture
circle, rendered analytically), fuses it with the block-sparse Pallas path at
the reference configuration (1 cm voxels, 4 cm truncation, 256^3 grid,
640x480 frames; workload contract:
/root/reference/3d_model/reconstruct_rgbd_filter.py:91-105), and streams
JSON lines. Baseline = the BASELINE.json north-star target of 500
frames/s/chip (the reference publishes no throughput numbers; its Open3D
CPU path measures ~10 f/s class).

Output contract (round 4 — the driver captures stdout's tail, so the LAST
complete line must always parse):
  * every printed line is a FULL snapshot record with metric/value/unit/
    vs_baseline, flushed the moment each measurement lands — a kill at any
    point leaves the best-known state in the tail;
  * the first line is emitted immediately (status "probing"), seeded from
    the committed known-good record BENCH_TUNED.json with "cached" marks;
  * an unreachable device yields a diagnostic + cached-numbers line in
    ~3 minutes instead of a bare zero;
  * each metric (fusion, icp, perception, mesh) runs in its OWN
    timeout-bounded child process — one stalled remote compile costs one
    metric, not the line. "measured" lists the metrics that ran fresh.

The healthy path measures ONE fusion config, read from BENCH_TUNED.json
(the tuned window knobs recorded by the last full run). Set
OTSLAM_BENCH_FULL=1 to re-run the legacy/auto window A/B instead.
Set OTSLAM_BENCH_PLATFORM=cpu to force the CPU path (the bare
JAX_PLATFORMS env var is unreliable on this image).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
TUNED_PATH = os.path.join(_HERE, "BENCH_TUNED.json")
HISTORY_PATH = os.path.join(_HERE, "BENCH_HISTORY.jsonl")
BASELINE_FPS = 500.0

# Physical ceilings per metric (units/s). Derived from minimum HBM traffic
# on a v5e (~819 GB/s): fusion streams >=(640*480*4 depth + color) ~5 MB per
# VGA frame -> <170k f/s; ICP streams both 50k clouds -> <700k iters/s;
# a perception tick reads the 208^2 map + 1440 beams -> well under 1M/s;
# mesh extraction reads a 256^3 f32 volume (67 MB) -> <13k/s. Rates above
# these are measurement failures (the round-4 45M iters/s class), never
# fast kernels — a fresh record violating one must not replace the
# known-good record (VERDICT r4 #2).
PLAUSIBILITY_CEILINGS = {
    "value": 170_000.0,
    "icp_iterations_per_sec": 700_000.0,
    "perception_ticks_per_sec": 1_000_000.0,
    "mesh_extracts_per_sec": 13_000.0,
    "mesh_block_extracts_per_sec": 13_000.0,
    "mesh_batch_extracts_per_sec": 13_000.0,
}
# A fresh metric sharply below the known-good record (e.g. <0.5x) is more
# likely relay weather or a regression than a new truth — keep the old
# record and let BENCH_HISTORY.jsonl carry the evidence. Override with
# OTSLAM_BENCH_FORCE_TUNED=1 after an investigated, real regression.
PLAUSIBILITY_FLOOR_FRAC = 0.5


def record_plausible(rec: dict, old: dict | None,
                     force: bool = False) -> tuple[bool, str]:
    """Gate for refreshing BENCH_TUNED.json (pure, unit-tested in
    tests/test_bench_guard.py). Returns (ok, reason)."""
    for key, ceiling in PLAUSIBILITY_CEILINGS.items():
        v = rec.get(key)
        if v is None:
            return False, f"{key} missing"
        try:
            v = float(v)
        except (TypeError, ValueError):
            return False, f"{key} non-numeric: {v!r}"
        if not (0.0 < v < float("inf")) or v != v:
            return False, f"{key} non-finite or non-positive: {v!r}"
        if v > ceiling:
            return False, (f"{key}={v} above physical ceiling {ceiling}")
        if old is not None and not force:
            ov = old.get(key)
            if isinstance(ov, (int, float)) and ov > 0 \
                    and v < PLAUSIBILITY_FLOOR_FRAC * ov:
                return False, (f"{key}={v} below {PLAUSIBILITY_FLOOR_FRAC}x "
                               f"known-good {ov} (set OTSLAM_BENCH_FORCE_"
                               f"TUNED=1 if this regression is real)")
    return True, "ok"

# keys a full record carries, copied from the cached record at startup and
# overwritten as fresh measurements land
_METRIC_KEYS = {
    "fusion": ("value", "vs_baseline", "fusion_config"),
    "icp": ("icp_iterations_per_sec", "icp_unit", "icp_config"),
    "perception": ("perception_ticks_per_sec", "perception_unit"),
    "mesh": ("mesh_extracts_per_sec", "mesh_unit",
             "mesh_block_extracts_per_sec", "mesh_block_unit",
             "mesh_batch_extracts_per_sec", "mesh_batch_unit"),
}


def _frame_poses(n):
    """Host-side capture-circle poses: per-frame (R, eye, extrinsic)."""
    Rs, eyes, exts = [], [], []
    for i in range(n):
        ang = 2 * np.pi * i / n
        eye = np.array([1.2 * np.cos(ang), 1.2 * np.sin(ang), 0.2])
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 0.0, -1.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd], axis=1)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = eye
        Rs.append(R.astype(np.float32))
        eyes.append(eye.astype(np.float32))
        exts.append(np.linalg.inv(T).astype(np.float32))
    return np.stack(Rs), np.stack(eyes), np.stack(exts)


def _make_frames(intr, n):
    """Synthetic cube-scan frames, rendered ON DEVICE from the (tiny)
    per-frame poses: the analytic ray-box render is a few jnp ops, and
    shipping it instead of ~2 GB of rendered VGA frames keeps the
    benchmark viable on slow-relay sessions (a round-5 session measured
    the host->device frame upload alone exceeding the 25-min child
    budget). Same geometry/workload contract as the original host
    renderer (reconstruct_rgbd_filter.py:91-105 configuration)."""
    import jax
    import jax.numpy as jnp

    Rs, eyes, exts = _frame_poses(n)
    rays = jnp.asarray(np.asarray(intr.pixel_rays()), jnp.float32)

    @jax.jit
    def render(Rs, eyes):
        lo = jnp.array([-0.2, -0.2, 0.0], jnp.float32)
        hi = jnp.array([0.2, 0.2, 0.4], jnp.float32)

        def one(R, eye):
            dirs = rays @ R.T                      # (H, W, 3)
            t1 = (lo - eye) / dirs
            t2 = (hi - eye) / dirs
            tmin = jnp.minimum(t1, t2).max(-1)
            tmax = jnp.maximum(t1, t2).min(-1)
            hit = (tmax > tmin) & (tmin > 0.1)
            return jnp.where(hit, tmin, 0.0).astype(jnp.float32)

        return jax.vmap(one)(Rs, eyes)

    depths = render(jnp.asarray(Rs), jnp.asarray(eyes))
    colors = jnp.full((n, intr.height, intr.width, 3), 128.0, jnp.float32)
    return depths, colors, jnp.asarray(exts)


def _init_platform():
    """Force the requested platform BEFORE any device query (the bare
    JAX_PLATFORMS env var is unreliable on this image). Returns jax."""
    plat = os.environ.get("OTSLAM_BENCH_PLATFORM")
    import jax

    if plat:
        jax.config.update("jax_platforms", plat)
        from otslam_tpu._compile_cache import configure_compile_cache

        configure_compile_cache(plat)
    return jax


def _child_setup(n_frames: int | None = None):
    """Per-child device/platform init + the fusion workload (n_frames
    None = the full benchmark batch: 384 on TPU, 4 in interpret mode)."""
    jax = _init_platform()
    import jax.numpy as jnp

    from otslam_tpu.config import TSDFConfig
    from otslam_tpu.core.camera import PinholeIntrinsics

    on_tpu = jax.devices()[0].platform != "cpu"
    intr = PinholeIntrinsics(width=640, height=480, fx=565.6009, fy=565.6009,
                             cx=320.5, cy=240.5)
    cfg = TSDFConfig()  # 256^3 @ 1 cm, trunc 4 cm (reference parameters)
    n = n_frames or (384 if on_tpu else 4)
    d, c, e = _make_frames(intr, n)
    return (on_tpu, intr, cfg, n, jnp.asarray(d), jnp.asarray(c),
            jnp.asarray(e))


def fusion_child(mode: str) -> None:
    """Measure one fusion config and print a JSON line.

    mode "tuned": window knobs come from OTSLAM_BENCH_FUSION_CFG (the
    committed BENCH_TUNED.json record) — no search passes, the healthy
    fast path. mode "auto": workload-sized window-knob search. mode
    "legacy": the 256-lane / 64-row defaults.
    """
    on_tpu, intr, cfg, n, depths, colors, exts = _child_setup()

    from otslam_tpu.kernels.tsdf_block import make_block_volume
    from otslam_tpu.kernels.tsdf_pallas import (auto_color_rows,
                                                auto_depth_config,
                                                auto_max_active,
                                                auto_patch_rows,
                                                integrate_frames_pallas,
                                                near_fallback_counts)

    vol0 = make_block_volume(cfg)
    tuned = None
    if mode == "tuned":
        tuned = json.loads(os.environ.get("OTSLAM_BENCH_FUSION_CFG", "null"))
        if not tuned:
            mode = "auto"  # no committed record yet: fall back to the search
    if tuned:
        max_active = int(tuned["max_active"])
        patch_rows = int(tuned["patch_rows"])
        depth_win = tuned["depth_win"] or None
        if depth_win == 256:
            depth_win = None  # stored legacy default
        color_rows = tuned["color_rows"] or None
        if color_rows == 64:
            color_rows = None
        depth_planes = int(tuned.get("depth_planes", 4))
    else:
        # capacity + slab geometry sized to the workload (exact bounds from
        # the scheduling pass; each knob keeps the coverage skip set
        # unchanged, so shrinking the dots costs zero extra fallbacks)
        max_active = auto_max_active(vol0, depths, exts, intr)
        patch_rows = auto_patch_rows(vol0, depths, exts, intr, max_active,
                                     interpret=not on_tpu)
        depth_planes = 4
        if mode == "auto":
            depth_win, depth_planes = auto_depth_config(
                vol0, depths, exts, intr, max_active, interpret=not on_tpu)
            color_rows = auto_color_rows(vol0, depths, exts, intr, max_active,
                                         interpret=not on_tpu,
                                         depth_win=depth_win,
                                         patch_rows=patch_rows,
                                         depth_planes=depth_planes)
        else:
            depth_win = None
            color_rows = None
    # far-field workloads (this capture circle) have zero uncovered pairs,
    # making near_field="skip" exact — verified here every run (untimed;
    # also guards a stale tuned record against kernel changes) — and free
    # of the fallback mode's mid-pipeline host sync
    counts = np.asarray(near_fallback_counts(
        vol0.created, depths, exts, intr,
        (vol0.grid_blocks, vol0.origin, vol0.voxel_size, vol0.sdf_trunc),
        max_active, interpret=not on_tpu, patch_rows=patch_rows,
        depth_win=depth_win, color_rows=color_rows,
        depth_planes=depth_planes))
    near_field = "skip" if counts.max() == 0 else "fallback"

    def run():
        vol = integrate_frames_pallas(
            make_block_volume(cfg), depths, colors, exts, intr,
            max_active=max_active, interpret=not on_tpu,
            near_field=near_field, patch_rows=patch_rows,
            depth_win=depth_win, color_rows=color_rows,
            depth_planes=depth_planes)
        return vol.tsdf

    r = run()                            # warmup/compile
    _ = np.asarray(r[:2, 0])
    reps = []
    for _ in range(5):
        t0 = time.time()
        r = run()
        _ = np.asarray(r[:2, 0])
        reps.append(time.time() - t0)
    print(json.dumps({
        "fps": round(n / min(reps), 1), "patch_rows": patch_rows,
        "depth_win": depth_win or 256, "color_rows": color_rows or 64,
        "depth_planes": depth_planes, "max_active": int(max_active),
        "near_field": near_field,
        "rep_spread_s": [round(t, 4) for t in reps]}), flush=True)


def icp_child() -> None:
    _init_platform()
    import bench_icp

    icp = bench_icp.measure()
    out = {"icp_iterations_per_sec": icp["value"], "icp_unit": icp["unit"]}
    if "icp_config" in icp:
        out["icp_config"] = icp["icp_config"]
    print(json.dumps(out), flush=True)


def perception_child() -> None:
    _init_platform()
    out = {"perception_ticks_per_sec": measure_perception_ticks(),
           "perception_unit": "ticks/s (1440 beams, 208^2 map, K=64)"}
    print(json.dumps(out), flush=True)


def mesh_child() -> None:
    """Mesh-extraction metrics (dense, block-sparse sustained, batched).
    Only the 16 mesh-seed frames are generated (the full fusion batch is
    ~2 GB of host->device transfer this child never uses)."""
    on_tpu, intr, cfg, n, depths, colors, exts = _child_setup(n_frames=16)
    out = {}
    out["mesh_extracts_per_sec"] = measure_mesh_extract(
        depths, colors, exts, intr, cfg)
    out["mesh_unit"] = "extractions/s (256^3 marching tetrahedra)"
    blk, batched = measure_mesh_block(depths, colors, exts, intr, cfg)
    out["mesh_block_extracts_per_sec"] = blk
    out["mesh_block_unit"] = "extractions/s (256^3 grid, created blocks only)"
    out["mesh_batch_extracts_per_sec"] = batched
    out["mesh_batch_unit"] = "extractions/s (8 volumes per dispatch)"
    print(json.dumps(out), flush=True)


def _run_child(mode: str, timeouts=(240, 240), env=None):
    """Run `python bench.py --child MODE`, retrying once on a stall/timeout
    (the persistent compile cache makes the retry cheap for everything the
    first attempt finished compiling). Returns the child's parsed JSON, or
    {"error": ...} if both attempts fail."""
    err = "unknown"
    child_env = dict(os.environ, **(env or {}))
    for t in timeouts:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", mode],
                capture_output=True, text=True, timeout=t,
                cwd=_HERE, env=child_env)
        except subprocess.TimeoutExpired:
            err = f"timeout after {t}s (stalled compile?)"
            continue
        lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        if proc.returncode == 0 and lines:
            return json.loads(lines[-1])
        err = (proc.stderr.strip().splitlines() or ["no output"])[-1][:200]
    return {"error": err}


def probe_child() -> None:
    """Fast device-reachability probe: one tiny computation end to end."""
    jax = _init_platform()
    import jax.numpy as jnp

    d = jax.devices()[0]
    assert float((jnp.ones((8, 128)) * 2).sum()) == 2048.0
    print(json.dumps({"platform": d.platform}), flush=True)


def _load_tuned():
    try:
        with open(TUNED_PATH) as f:
            return json.load(f)
    except Exception:
        return None


def _emit(snap):
    print(json.dumps(snap), flush=True)


def main():
    tuned = _load_tuned()
    snap = {"metric": "vga_frames_fused_per_sec", "value": 0.0,
            "unit": "frames/s/chip", "vs_baseline": 0.0,
            "status": "probing", "measured": []}
    if tuned:
        # seed every field from the committed known-good record so a kill
        # or dead relay still leaves real numbers (marked cached) in the tail
        for keys in _METRIC_KEYS.values():
            for k in keys:
                if k in tuned:
                    snap[k] = tuned[k]
        snap["cached"] = True
        snap["cached_from"] = tuned.get("recorded")
        snap["cached_metrics"] = sorted(_METRIC_KEYS)
    _emit(snap)

    # the axon relay has been observed fully down (even jax.devices() hangs);
    # first contact after an outage has taken 75-90 s idle and >110 s under
    # host CPU load — two bounded attempts (the first warms the relay), then
    # give up with the cached numbers + a diagnostic in ~4.5 min total.
    # OTSLAM_BENCH_PROBE_S widens the first attempt for known-flaky
    # sessions (round 5 observed successful contacts needing ~200 s).
    t_probe = time.time()
    probe_s = int(os.environ.get("OTSLAM_BENCH_PROBE_S", "170"))
    probe = _run_child("probe", timeouts=(probe_s, 100))
    if "error" in probe:
        snap["status"] = "device_unreachable"
        snap["device_unreachable"] = probe["error"]
        _emit(snap)
        _append_history(snap)
        return
    snap["platform"] = probe.get("platform")
    # session-health context so a reader can separate "slow tunnel day" from
    # a regression (VERDICT r4 weak #3): cold-probe latency + per-rep spreads
    snap["health"] = {"probe_s": round(time.time() - t_probe, 2)}

    def _landed(name):
        snap["measured"].append(name)
        cm = snap.get("cached_metrics")
        if cm and name in cm:
            cm.remove(name)
            if not cm:
                snap.pop("cached_metrics", None)
                snap.pop("cached", None)
                snap.pop("cached_from", None)

    # --- fusion (the headline metric) ---
    snap["status"] = "fusion"
    full = os.environ.get("OTSLAM_BENCH_FULL")
    results = []
    if full:
        # the auto-window search evaluates several schedule configs on
        # device; on a slow-relay session (first contact alone measured
        # ~390 s this round) the A/B needs the wide budget
        for mode in ("fusion-auto", "fusion-legacy"):
            r = _run_child(mode, timeouts=(1800, 900))
            r["mode"] = mode.split("-")[1]
            results.append(r)
    else:
        env = {}
        if tuned and "fusion_config" in tuned:
            env["OTSLAM_BENCH_FUSION_CFG"] = json.dumps(tuned["fusion_config"])
        r = _run_child("fusion-tuned", timeouts=(360, 300), env=env)
        r["mode"] = "tuned"
        results.append(r)
    candidates = [r for r in results if "fps" in r]
    if candidates:
        best = max(candidates, key=lambda r: r["fps"])
        snap["value"] = best["fps"]
        snap["vs_baseline"] = round(best["fps"] / BASELINE_FPS, 3)
        if "rep_spread_s" in best:
            snap.setdefault("health", {})["fusion_rep_spread_s"] = \
                best["rep_spread_s"]
        snap["fusion_config"] = {
            k: best[k] for k in ("patch_rows", "depth_win", "color_rows",
                                 "depth_planes", "max_active", "near_field")}
        if len(candidates) > 1:
            snap["fusion_config"]["alternates"] = {
                f"{r['mode']}_dw{r.get('depth_win')}p{r.get('depth_planes')}"
                f"_cr{r.get('color_rows')}": r["fps"] for r in candidates}
        _landed("fusion")
    else:
        snap["fusion_error"] = {r["mode"]: r.get("error") for r in results}
    _emit(snap)

    # --- secondary metrics, one child each ---
    for name, mode, keys in (
            ("icp", "icp", _METRIC_KEYS["icp"]),
            ("perception", "perception", _METRIC_KEYS["perception"]),
            ("mesh", "mesh", _METRIC_KEYS["mesh"])):
        snap["status"] = name
        r = _run_child(mode, timeouts=(300, 240))
        if "error" in r:
            snap[f"{name}_error"] = r["error"]
        else:
            snap.update(r)
            _landed(name)
        _emit(snap)

    snap["status"] = "complete"
    _emit(snap)
    _append_history(snap)

    # refresh the committed known-good record after a fully-fresh TPU run —
    # but ONLY through the plausibility gate: round 4's run wrote 45M ICP
    # iters/s into BENCH_TUNED.json unconditionally, poisoning every later
    # cached-fallback line (VERDICT r4 #2)
    if (snap.get("platform") not in (None, "cpu")
            and sorted(snap["measured"]) == sorted(_METRIC_KEYS)):
        rec = {"recorded": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
               "platform": snap["platform"]}
        for keys in _METRIC_KEYS.values():
            for k in keys:
                if k in snap:
                    rec[k] = snap[k]
        rec.get("fusion_config", {}).pop("alternates", None)
        maybe_refresh_tuned(rec)


def maybe_refresh_tuned(rec: dict, path: str = None) -> tuple[bool, str]:
    """Atomically replace the known-good record iff `rec` passes the
    plausibility gate against the current record. Returns (written, reason);
    a rejection is also printed to stderr so the session log shows why the
    record stayed put."""
    path = path or TUNED_PATH
    try:
        with open(path) as f:
            old = json.load(f)
    except Exception:
        old = None
    force = bool(os.environ.get("OTSLAM_BENCH_FORCE_TUNED"))
    ok, reason = record_plausible(rec, old, force=force)
    if not ok:
        print(f"bench: NOT refreshing {os.path.basename(path)}: {reason}",
              file=sys.stderr, flush=True)
        return False, reason
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    os.replace(tmp, path)
    return True, reason


def _append_history(snap: dict, path: str = None) -> None:
    """Every completed run (plausible or not) appends one line here so
    cross-session variance is observable (VERDICT r4 weak #3)."""
    try:
        with open(path or HISTORY_PATH, "a") as f:
            f.write(json.dumps(snap) + "\n")
    except OSError:
        pass


def measure_mesh_extract(d, c, e, intr, cfg, reps: int = 8) -> float:
    """Mesh-extraction throughput: marching tetrahedra over the full 256^3
    dense volume (the reconstruct pipeline's extract stage,
    reconstruct_rgbd.py:111-112 equivalent). `reps` dispatches run
    back-to-back with ONE final sync so the ~29 ms tunnel RTT amortizes
    (async dispatches pipeline; measured 40.5 ms single-shot vs 18.4 ms
    sustained at reps=8 for ~14 ms device time) — the same sustained
    framing the ICP and perception metrics use."""
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
        for _j in range(reps):
            _, _, mask = run()
        _ = np.asarray(mask[:2])
        best = min(best, time.time() - t0)
    return round(reps / best, 1)


def measure_mesh_block(d, c, e, intr, cfg, reps: int = 8) -> float:
    """Block-sparse mesh extraction: marching tetrahedra directly over the
    created blocks of the fused BlockTSDFVolume (the pipeline's actual
    extract stage for the sparse/pallas backends since round 3) — cost
    scales with the surface, not the 256^3 grid. Returns (sustained,
    batched): back-to-back single-volume dispatches, and `reps` volumes
    per dispatch via extract_meshes_block."""
    import jax.numpy as jnp

    from otslam_tpu.kernels.marching import (auto_mesh_block_config,
                                             extract_mesh_soup_block)
    from otslam_tpu.kernels.tsdf_block import (integrate_frames_sparse,
                                               make_block_volume)
    from otslam_tpu.kernels.tsdf_pallas import auto_max_active

    vol0 = make_block_volume(cfg)
    ma = auto_max_active(vol0, jnp.asarray(d), jnp.asarray(e), intr)
    vol = integrate_frames_sparse(vol0, jnp.asarray(d), jnp.asarray(c),
                                  jnp.asarray(e), intr, max_active=ma)
    _ = np.asarray(vol.tsdf[:2, 0])
    mb, mc = auto_mesh_block_config(vol)

    def run():
        return extract_mesh_soup_block(vol, mb, mc)

    _, _, mask = run()
    _ = np.asarray(mask[:2])
    best = float("inf")
    for _i in range(5):
        t0 = time.time()
        for _j in range(reps):
            _, _, mask = run()
        _ = np.asarray(mask[:2])
        best = min(best, time.time() - t0)
    sustained = round(reps / best, 1)

    # batched: all `reps` volumes in ONE dispatch (extract_meshes_block) —
    # the multi-object-scene framing; device-time-bound instead of
    # tunnel-dispatch-bound
    from otslam_tpu.kernels.marching import extract_meshes_block

    def run_b():
        return extract_meshes_block([vol] * reps, mb, mc)

    _, _, masks = run_b()
    _ = np.asarray(masks[:2, 0])
    bbest = float("inf")
    for _i in range(5):
        t0 = time.time()
        _, _, masks = run_b()
        _ = np.asarray(masks[:2, 0])
        bbest = min(bbest, time.time() - t0)
    return sustained, round(reps / bbest, 1)


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
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        mode = sys.argv[2]
        if mode == "fusion-auto":
            fusion_child("auto")
        elif mode == "fusion-legacy":
            fusion_child("legacy")
        elif mode == "fusion-tuned":
            fusion_child("tuned")
        elif mode == "icp":
            icp_child()
        elif mode == "perception":
            perception_child()
        elif mode == "mesh":
            mesh_child()
        elif mode == "probe":
            probe_child()
        else:
            raise SystemExit(f"unknown child mode {mode!r}")
    else:
        main()
