"""Occupancy-grid ray casting (the virtual scan).

Behavioral contract from virtual_scan_node.cpp:258-287: for each beam, step
along the ray in ``resolution``-sized increments (distance incremented
*before* the cell test), return the accumulated distance at the first cell
whose value is 100 (occupied), +inf if the ray leaves the map or exceeds
``range_max``.

TPU-native shape: all beams x all steps evaluated at once. The XLA path
(`raycast_grid`, the semantic reference) is one fused elementwise pass +
one flat gather into the grid + a gather-free first-hit reduction over the
step axis; the C++ hot loop (1440 beams x up-to-1000 steps at 5 Hz)
becomes a single device dispatch. The flat gather is the cost: TPU element
gathers run at ~90M elem/s, and 1440 x 160 samples/tick made the gather
~half the fused perception tick. `raycast_grid_fast` replaces it with
the package's one-hot-select idiom (the TSDF fusion kernel's): the grid
lives whole in VMEM, each kernel step loads a dynamic (row, lane)-aligned
window covering one 32-beam group's full ray extent, and the per-sample
cell values come from ONE one-hot row-select matmul on the MXU + a one-hot
column multiply-reduce on the VPU — zero gathers, with the first-hit
reduction done in-kernel (outputs are two small per-beam step keys).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@partial(jax.jit, static_argnames=("resolution", "range_max", "num_steps"))
def raycast_grid(grid_data: jnp.ndarray, resolution: float,
                 origin_x: float, origin_y: float,
                 robot_x: jnp.ndarray, robot_y: jnp.ndarray,
                 robot_yaw: jnp.ndarray, angles: jnp.ndarray,
                 range_max: float, num_steps: int | None = None) -> jnp.ndarray:
    """Cast one ray per angle through an occupancy grid.

    grid_data: (H, W) int8, row-major with row 0 at origin (ROS convention);
    angles: (N,) beam angles relative to the robot. Returns ranges (N,) f32
    with +inf for no-hit.
    """
    H, W = grid_data.shape
    if num_steps is None:
        # the C++ loop uses distances (k+1)*res for every k with k*res < max
        num_steps = -int(-range_max // resolution)
    ga = robot_yaw + angles                              # (N,)
    dists = (jnp.arange(num_steps, dtype=jnp.float32) + 1.0) * resolution  # (S,)
    cos_a = jnp.cos(ga)[:, None]
    sin_a = jnp.sin(ga)[:, None]
    rx = robot_x + dists[None, :] * cos_a                # (N, S)
    ry = robot_y + dists[None, :] * sin_a

    # truncating f32->i32 cast matches the C++ ``(int)((x - ox) / res)``
    # (virtual_scan_node.cpp:274-275): for sample points in (ox - res, ox)
    # the cast yields cell 0 (in bounds, tested) where floor would yield -1
    # (out of bounds, ray terminated) — same contract as evidence.world_to_key
    gx = ((rx - origin_x) / resolution).astype(jnp.int32)
    gy = ((ry - origin_y) / resolution).astype(jnp.int32)
    oob = (gx < 0) | (gx >= W) | (gy < 0) | (gy >= H)
    flat = jnp.clip(gy, 0, H - 1) * W + jnp.clip(gx, 0, W - 1)
    occ = jnp.take(grid_data.reshape(-1), flat) == 100
    occ = occ & ~oob

    stop = occ | oob
    # first stop along the ray; if it's a hit (not oob), range = dist there.
    # Gather-free: min-reductions over step keys instead of
    # argmax + take_along_axis (element gathers, ~90M elem/s on TPU)
    steps = jnp.arange(num_steps, dtype=jnp.int32)[None, :]
    first_stop = jnp.min(jnp.where(stop, steps, num_steps), axis=1)
    first_occ = jnp.min(jnp.where(occ, steps, num_steps), axis=1)
    return _ranges_from_keys(first_stop, first_occ, num_steps, resolution)


def _ranges_from_keys(first_stop, first_occ, num_steps: int,
                      resolution: float):
    """(first-stop step key, first-occupied step key) -> beam ranges."""
    hit = (first_stop < num_steps) & (first_occ == first_stop)
    rng = (first_stop.astype(jnp.float32) + 1.0) * resolution
    return jnp.where(hit, rng, jnp.inf)


# ---------------------------------------------------------------------------
# Pallas kernel: gather-free ray casting via windowed one-hot selection
# ---------------------------------------------------------------------------

_RAY_LANES = 256   # step lanes per beam (rays up to 256 steps; padded)
_RAY_SUB = 8       # beams per in-kernel one-hot dot (V = 8 * 256 = 2048)
_R_PLANES = 4      # row-shifted grid copies: row starts at 128//4=32 grain
_VMEM_GRID_BUDGET = 4 * 1024 * 1024  # bytes of VMEM for the resident grid


def _win_sizes(W: int, H: int, Wp: int, Hp: int, num_steps: int):
    """Static window dims sized to the ray extent: a single beam spans at
    most num_steps+2 cells along either axis (clipped into the map), plus
    alignment slack — 7 sublanes for the 8-grained column start, 31 lanes
    for the 32-grained row start (the kernel reads row windows from
    _R_PLANES lane-shifted grid copies, so starts need only be
    128//_R_PLANES-aligned). Small maps cap at the padded dims (the window
    is then the whole axis and the start is 0). The contiguous-lidar group
    fan adds <1 cell at production geometry (32 beams x 0.25deg); wild
    angle sets that exceed the window route to the XLA path via the traced
    fit flag, so sizing can only cost perf, never correctness."""
    g = 128 // _R_PLANES
    win_c = min(Wp, -(-(min(num_steps + 2, W) + 7) // 8) * 8)
    win_r = min(Hp, -(-(min(num_steps + 2, H) + g - 1) // 128) * 128)
    return win_c, win_r


def _make_ray_kernel(W: int, H: int, Wp: int, bpt: int, num_steps: int,
                     resolution: float, origin_x: float, origin_y: float,
                     win_c: int, win_r: int):
    """Kernel over beam groups: per group, load one (win_c, win_r) window
    of the TRANSPOSED grid (dynamic 8-aligned sublane / 32-grained lane
    starts from the scalar prefetch — the 32-grain comes from picking one
    of _R_PLANES lane-shifted grid copies stacked on the sublane axis),
    then per 8-beam sub-block select all 2048 sample cells with ONE
    one-hot matmul (rows) + one one-hot multiply-reduce (columns) and
    emit per-sample first-stop/first-occupied step keys. Sample layout is
    (1, SUB * LANES) — beams-major on the lane axis — so the selection dot
    needs no in-kernel reshapes or transposes."""
    S = num_steps
    L = _RAY_LANES
    V = _RAY_SUB * L
    res = resolution
    pg = 128 // _R_PLANES

    def kernel(r0_ref, c0_ref, pose_ref, cosa_ref, sina_ref,
               gt_ref, ks_out, ko_out):
        g = pl.program_id(0)
        r0 = r0_ref[g]                     # true row start, 32-grained
        c0 = pl.multiple_of(c0_ref[g], 8)
        px = pose_ref[0]
        py = pose_ref[1]
        # plane q holds the grid lane-shifted left by q*pg, so the
        # 128-aligned lane read r0b below lands the true 32-grained start
        r0b = pl.multiple_of((r0 // 128) * 128, 128)
        q = (r0 - r0b) // pg
        # slabT[ci, ri] = grid[r0 + ri, c0 + ci] (transposed grid resident
        # in VMEM; the transpose happens once outside — the kernel's lane
        # dim is grid rows)
        slab = gt_ref[pl.ds(pl.multiple_of(q * Wp + c0, 8), win_c),
                      pl.ds(r0b, win_r)]   # bf16

        li = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
        step = li % L                                   # step index per lane
        bsub = li // L                                  # beam-in-sub-block
        d = (step.astype(jnp.float32) + 1.0) * res
        iota_sub = jax.lax.broadcasted_iota(jnp.int32, (_RAY_SUB, V), 0)
        exp_mask = (iota_sub == bsub).astype(jnp.float32)   # (SUB, V)

        for sb in range(bpt // _RAY_SUB):
            b0 = g * bpt + sb * _RAY_SUB
            # broadcast the sub-block's 8 cos/sin scalars across each
            # beam's 256 lanes (scalar * one-hot rows — no gathers)
            ca = jnp.zeros((1, V), jnp.float32)
            sa = jnp.zeros((1, V), jnp.float32)
            for b in range(_RAY_SUB):
                ca = ca + cosa_ref[b0 + b] * exp_mask[b:b + 1]
                sa = sa + sina_ref[b0 + b] * exp_mask[b:b + 1]

            x = px + d * ca
            y = py + d * sa
            # truncating cast == the C++ (int)((x - ox) / res) contract
            gx = ((x - origin_x) / res).astype(jnp.int32)
            gy = ((y - origin_y) / res).astype(jnp.int32)
            valid = step < S
            oob = ((gx < 0) | (gx >= W) | (gy < 0) | (gy >= H)) & valid

            lr = gy - r0                                 # window row
            lc = gx - c0                                 # window column
            iota_r = jax.lax.broadcasted_iota(jnp.int32, (win_r, V), 0)
            ohr = (iota_r == lr).astype(jnp.bfloat16)    # (win_r, V)
            M1 = jax.lax.dot_general(
                slab, ohr, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)     # (win_c, V)
            iota_c = jax.lax.broadcasted_iota(jnp.int32, (win_c, V), 0)
            ohc = (iota_c == lc).astype(jnp.float32)
            val = jnp.sum(M1 * ohc, axis=0, keepdims=True)   # (1, V)

            occ = (val == 100.0) & ~oob & valid
            stop = occ | oob
            ks = jnp.where(stop, step, S)
            ko = jnp.where(occ, step, S)
            # outputs are (G, 1, lanes) with (1, 1, lanes) blocks — Mosaic
            # requires the last two block dims (div 8, div 128) or equal to
            # the array's, which a (1, lanes) block of a (G, lanes) array
            # violates (the 3-D trick from the fusion kernel)
            ks_out[0, 0:1, sb * V:(sb + 1) * V] = ks
            ko_out[0, 0:1, sb * V:(sb + 1) * V] = ko

    return kernel


@partial(jax.jit, static_argnames=("W", "H", "resolution", "origin_x",
                                   "origin_y", "num_steps", "interpret"))
def _raycast_pallas_keys(gt_pad: jnp.ndarray, W: int, H: int,
                         resolution: float,
                         origin_x: float, origin_y: float,
                         robot_x, robot_y, robot_yaw, angles,
                         num_steps: int, interpret: bool = False):
    """(first_stop, first_occ) step keys per beam via the Pallas kernel,
    plus the per-group window fit flag (False anywhere -> caller must use
    the XLA path; window sizes are static, spans are workload data).
    W, H are the TRUE grid dims; gt_pad is the prepared (see
    prepare_raycast_grid) stack of _R_PLANES lane-shifted padded
    transposed bf16 grid copies."""
    B = angles.shape[0]
    bpt = 32 if B % 32 == 0 else 8
    G = B // bpt
    S = num_steps
    res = resolution

    ga = robot_yaw + angles
    cosa = jnp.cos(ga).astype(jnp.float32)
    sina = jnp.sin(ga).astype(jnp.float32)

    # per-beam sample extent from the ray endpoints (monotone along the
    # ray), reduced per group, floor-bounded (conservative vs the
    # truncating cast), clipped into the grid
    d0, d1 = res, S * res
    xe = jnp.stack([robot_x + d0 * cosa, robot_x + d1 * cosa])
    ye = jnp.stack([robot_y + d0 * sina, robot_y + d1 * sina])
    fx = jnp.floor((xe - origin_x) / res).astype(jnp.int32)   # (2, B)
    fy = jnp.floor((ye - origin_y) / res).astype(jnp.int32)
    fx_min = jnp.clip(jnp.min(fx.reshape(2, G, bpt), axis=(0, 2)), 0, W - 1)
    fx_max = jnp.clip(jnp.max(fx.reshape(2, G, bpt), axis=(0, 2)), 0, W - 1)
    fy_min = jnp.clip(jnp.min(fy.reshape(2, G, bpt), axis=(0, 2)), 0, H - 1)
    fy_max = jnp.clip(jnp.max(fy.reshape(2, G, bpt), axis=(0, 2)), 0, H - 1)

    Wp, Hp = gt_pad.shape[0] // _R_PLANES, gt_pad.shape[1]
    win_c, win_r = _win_sizes(W, H, Wp, Hp, S)
    pg = 128 // _R_PLANES
    c0 = jnp.minimum(fx_min & ~7, Wp - win_c)
    r0 = jnp.minimum(fy_min & ~(pg - 1), Hp - win_r)
    fit = jnp.all((fx_max < c0 + win_c) & (fy_max < r0 + win_r))

    pose = jnp.stack([jnp.asarray(robot_x, jnp.float32),
                      jnp.asarray(robot_y, jnp.float32)])

    kernel = _make_ray_kernel(W, H, Wp, bpt, S, res, origin_x, origin_y,
                              win_c, win_r)
    vsub = _RAY_SUB * _RAY_LANES
    lanes = (bpt // _RAY_SUB) * vsub
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, 1, lanes), lambda g, *_: (g, 0, 0)),
                   pl.BlockSpec((1, 1, lanes), lambda g, *_: (g, 0, 0))],
    )
    out_shape = [jax.ShapeDtypeStruct((G, 1, lanes), jnp.int32),
                 jax.ShapeDtypeStruct((G, 1, lanes), jnp.int32)]
    ks, ko = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
    )(r0, c0, pose, cosa, sina, gt_pad)
    # (G, sub-blocks * 8 beams * 256 lanes) -> (B, LANES), min over steps
    ks = ks.reshape(B, _RAY_LANES)
    ko = ko.reshape(B, _RAY_LANES)
    return jnp.min(ks, axis=1), jnp.min(ko, axis=1), fit


def prepare_raycast_grid(grid_data: jnp.ndarray):
    """_R_PLANES lane-shifted padded transposed bf16 copies of an occupancy
    grid, stacked on the sublane axis — plane p holds the grid shifted left
    by p*(128//_R_PLANES) lanes, giving the kernel 32-grained row-window
    starts from 128-aligned reads (compute once per map; loop-invariant
    under jit/scan). Pad/shift-fill values are 0 (never occupied) and the
    kernel bounds-tests against the TRUE dims, so padding never changes
    results."""
    H, W = grid_data.shape
    Wp = -(-W // 8) * 8
    Hp = -(-H // 128) * 128
    gt = jnp.zeros((Wp, Hp), jnp.bfloat16)
    gt = gt.at[:W, :H].set(grid_data.T.astype(jnp.bfloat16))
    pg = 128 // _R_PLANES
    return jnp.concatenate(
        [jnp.pad(gt[:, p * pg:], ((0, 0), (0, p * pg)))
         for p in range(_R_PLANES)], axis=0)


@partial(jax.jit, static_argnames=("resolution", "origin_x", "origin_y",
                                   "range_max", "num_steps", "interpret"))
def _raycast_fast_device(grid_data, gt_pad, resolution: float,
                         origin_x: float, origin_y: float,
                         robot_x, robot_y, robot_yaw, angles,
                         range_max: float, num_steps: int, interpret: bool):
    """Kernel keys + fit-routed ranges as ONE jitted program (an eager
    keys-then-cond pair costs two ~29 ms tunnel dispatches per K=1 call)."""
    H, W = grid_data.shape
    fs, fo, fit = _raycast_pallas_keys(
        gt_pad, W, H, resolution, origin_x, origin_y,
        robot_x, robot_y, robot_yaw, angles, num_steps,
        interpret=interpret)
    return jax.lax.cond(
        fit,
        lambda: _ranges_from_keys(fs, fo, num_steps, resolution),
        lambda: raycast_grid(grid_data, resolution, origin_x, origin_y,
                             robot_x, robot_y, robot_yaw, angles,
                             range_max, num_steps))


def raycast_grid_fast(grid_data: jnp.ndarray, resolution: float,
                      origin_x: float, origin_y: float,
                      robot_x, robot_y, robot_yaw, angles,
                      range_max: float, num_steps: int | None = None,
                      gt_pad: jnp.ndarray | None = None,
                      impl: str = "auto",
                      interpret: bool = False) -> jnp.ndarray:
    """raycast_grid with the gather-free Pallas path when eligible.

    Exact-parity contract with raycast_grid (tested): the kernel runs the
    same per-sample arithmetic; when a beam group's sample extent exceeds
    the static window (wild/non-contiguous angle sets), the traced fit
    flag routes the WHOLE call to the XLA path via lax.cond, so results
    never depend on the window assumption. impl: "auto" picks Pallas on
    TPU for eligible shapes; "xla"/"pallas" force a path (pallas
    interprets off-TPU).

    gt_pad must come from prepare_raycast_grid on THIS map (the caller
    owns coherence when caching it across calls — VirtualScanner
    invalidates on set_map); a shape mismatch is rejected, same-shape
    staleness cannot be detected here.
    """
    if impl not in ("auto", "xla", "pallas"):
        raise ValueError(f"unknown impl {impl!r}: use auto/xla/pallas")
    H, W = grid_data.shape
    if num_steps is None:
        num_steps = -int(-range_max // resolution)
    B = angles.shape[0]
    on_tpu = jax.default_backend() != "cpu"
    eligible = (num_steps <= _RAY_LANES and B % 8 == 0
                and 2 * _R_PLANES * (-(-W // 8) * 8)
                * (-(-H // 128) * 128) <= _VMEM_GRID_BUDGET)
    if impl == "pallas" and not eligible:
        raise ValueError(
            f"pallas raycast ineligible: steps {num_steps} > {_RAY_LANES}, "
            f"beams {B} % 8 != 0, or grid exceeds the VMEM budget")
    use_pallas = impl == "pallas" or (impl == "auto" and on_tpu and eligible)
    if not use_pallas:
        return raycast_grid(grid_data, resolution, origin_x, origin_y,
                            robot_x, robot_y, robot_yaw, angles, range_max,
                            num_steps)
    if gt_pad is None:
        gt_pad = prepare_raycast_grid(grid_data)
    else:
        want = (_R_PLANES * (-(-W // 8) * 8), -(-H // 128) * 128)
        if tuple(gt_pad.shape) != want:
            raise ValueError(
                f"gt_pad shape {tuple(gt_pad.shape)} does not match this "
                f"grid's prepared shape {want} — stale prepare_raycast_grid "
                f"result?")
    return _raycast_fast_device(
        grid_data, gt_pad, resolution, origin_x, origin_y,
        robot_x, robot_y, robot_yaw, angles, range_max, num_steps,
        interpret or not on_tpu)
