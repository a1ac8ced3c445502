"""Secondary benchmark: ICP correspondence+solve iterations per second.

Point-to-point ICP at eval scale (50k source x 50k target points, the
eval-script working set) with a fixed iteration count; reports iterations/s.
(The driver's headline metric lives in bench.py; run this manually.)
"""

import json
import time

import numpy as np


def measure() -> dict:
    """Run the ICP benchmark and return its metric dict (used by bench.py to
    embed the secondary metric in the driver's single JSON line)."""
    import jax
    import jax.numpy as jnp

    from otslam_tpu.kernels.icp import icp_point_to_point

    on_tpu = jax.devices()[0].platform != "cpu"
    n = 50_000 if on_tpu else 2_000
    # enough iterations that the ~29 ms tunnel RTT is amortized out of the
    # per-iteration rate (the micro-benchmark trap, CLAUDE.md): at 20 iters
    # the fixed dispatch cost alone under-reported the device rate by ~25%
    iters = 60 if on_tpu else 20
    rng = np.random.default_rng(0)
    src = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    th = 0.02
    R = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
                  [0, 0, 1]], np.float32)
    dst = (src @ R.T + np.array([0.01, -0.02, 0.005], np.float32))

    # windowed NN: exact for every inlier (radius = inlier threshold, see
    # kernels/nn.nn_distance_radius), traced-fit fallback otherwise —
    # sized from the concrete clouds on the host
    from otslam_tpu.kernels.nn import auto_nn_window
    window, axis = auto_nn_window(src, dst, 0.3)

    def run(iters_, **kw):
        res = icp_point_to_point(
            jnp.asarray(src), jnp.asarray(dst), threshold=0.3,
            max_iterations=iters_, relative_fitness=0.0, relative_rmse=0.0,
            chunk=4096, **kw)
        return res

    def timed(iters_, **kw):
        res = run(iters_, **kw)
        _ = float(res.inlier_rmse)
        best = float("inf")
        for _i in range(3):
            t0 = time.time()
            res = run(iters_, **kw)
            _ = float(res.inlier_rmse)
            best = min(best, time.time() - t0)
        return best, res

    if on_tpu:
        # marginal (two-point) rate: a single timed run carries the fixed
        # ~29 ms tunnel RTT + dispatch, which at windowed-NN speed would be
        # ~25% of the wall clock — the micro-benchmark trap (CLAUDE.md).
        # The slope between two iteration counts is the device throughput.
        lo = iters // 4
        kw = {"nn_window": window, "nn_axis": axis}
        t_lo, _ = timed(lo, **kw)
        t_hi, res = timed(iters, **kw)
        windowed_rate = round((iters - lo) / max(t_hi - t_lo, 1e-6), 1)
        f_lo, _ = timed(lo)
        f_hi, _res_full = timed(iters)
        full_rate = round((iters - lo) / max(f_hi - f_lo, 1e-6), 1)
    else:
        # off-TPU nn_distance_radius falls back to the exact path: the two
        # configs are the same computation, measure once (no tunnel RTT to
        # subtract on the local backend)
        t, res = timed(iters)
        windowed_rate = full_rate = round(int(res.iterations) / t, 1)
    value = max(windowed_rate, full_rate)

    return {
        "metric": "icp_iterations_per_sec",
        "value": value,
        "unit": f"iters/s at {n}x{n} points (marginal)",
        "final_rmse_m": round(float(res.inlier_rmse), 6),
        "icp_config": {"nn_window": window, "nn_axis": axis,
                       "windowed": windowed_rate, "full_scan": full_rate},
    }


def main():
    print(json.dumps(measure()))


if __name__ == "__main__":
    main()
