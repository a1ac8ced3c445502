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

    def run():
        res = icp_point_to_point(
            jnp.asarray(src), jnp.asarray(dst), threshold=0.3,
            max_iterations=iters, relative_fitness=0.0, relative_rmse=0.0,
            chunk=4096)
        return res

    res = run()
    _ = float(res.inlier_rmse)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        res = run()
        done_iters = int(res.iterations)
        _ = float(res.inlier_rmse)
        best = min(best, time.time() - t0)

    return {
        "metric": "icp_iterations_per_sec",
        "value": round(done_iters / best, 1),
        "unit": f"iters/s at {n}x{n} points",
        "final_rmse_m": round(float(res.inlier_rmse), 6),
    }


def main():
    print(json.dumps(measure()))


if __name__ == "__main__":
    main()
