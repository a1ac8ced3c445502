"""otslam_tpu — a TPU-native selective 3D mapping framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of OTSLAM
(object-triggered 3D SLAM, reference: TakiRyo/object-triggered-3D-SLAM):
a service robot keeps a lightweight 2D occupancy map, detects objects and
object-level *changes* with a 2D LiDAR, navigates to each object, triggers
targeted RGB-D captures, TSDF-fuses only those captures into per-object 3D
models, and merges the 2D map with the 3D object clouds into a hybrid map.

Layer map (mirrors SURVEY.md):
  core/         camera model, SE(3)/frames, occupancy-grid types, PLY/PGM/YAML io
  kernels/      JAX/Pallas compute kernels (backproject, TSDF, raycast, diff, ...)
  pipeline/     dataset reader + frame->TSDF->point-cloud reconstruction
  mapping/      virtual scan, change detection, selective merge, hybrid map
  mission/      tracker, visiting points, goal queue, manager FSM (host-side)
  sim/          analytic scene/sensor simulator (replaces Gazebo as the fixture)
  eval/         accuracy/completeness metrics, ICP, eval scenarios
  distributed/  device-mesh sharding of fusion/eval workloads
"""

__version__ = "0.1.0"

import jax as _jax

# TPU MXU f32 matmuls round inputs to bf16 by default — a ~0.4% relative
# error that silently corrupts SE(3) compositions, point transforms, and
# least-squares solves (measured: 3e-3 rad rotation floor in ICP). Geometry
# here is precision-critical and the small-K matmuls gain nothing from bf16,
# so default to full precision; hot kernels that *want* bf16 cast their
# inputs explicitly and are unaffected.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: compiles through the remote-TPU tunnel cost
# minutes (the fused K-tick perception program measured ~50 s, Pallas fusion
# kernels longer), and every CLI invocation is a fresh process. The cache
# verifiably round-trips through the axon plugin, turning cold mission/bench
# starts into sub-second cache hits. Opt out with OTSLAM_NO_COMPILE_CACHE=1;
# JAX_COMPILATION_CACHE_DIR (read natively by JAX) takes precedence.
import os as _os

if not _os.environ.get("OTSLAM_NO_COMPILE_CACHE"):
    # Off-CPU only: pure-CPU sessions (pytest, JAX_PLATFORMS=cpu missions)
    # compile locally in sub-seconds AND XLA:CPU caches AOT machine code
    # keyed without the host's CPU features — an entry written on one box
    # loads on another with a "could lead to SIGILL" warning (observed when
    # this cache crossed machine images). The cache exists for the remote
    # TPU tunnel; keep CPU compiles out of it entirely.
    _plat = (getattr(_jax.config, "jax_platforms", None)
             or _os.environ.get("JAX_PLATFORMS", ""))
    if (_plat or "").strip().lower() != "cpu":
        if not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.expanduser("~/.cache/otslam_tpu/xla"))
        # threshold 0: through the tunnel even trivial eager ops pay a
        # remote compile round-trip (~0.3-0.5 s each; a mission issues
        # hundreds), so cache everything — entries are small and hits are
        # local reads.
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from otslam_tpu.config import OTSLAMConfig  # noqa: F401
