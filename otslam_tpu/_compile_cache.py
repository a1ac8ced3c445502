"""Persistent-compilation-cache policy, in one place.

Compiles through the remote-TPU tunnel cost minutes (the fused K-tick
perception program measured ~50 s, Pallas fusion kernels longer), and every
CLI invocation is a fresh process — so off-CPU sessions enable JAX's
persistent compilation cache with a zero-second threshold (through the
tunnel even trivial eager ops pay a ~0.3-0.5 s remote compile round-trip).

Pure-CPU sessions must stay OUT of the cache: they compile locally in
sub-seconds anyway, AND XLA:CPU caches AOT machine code keyed without the
host's CPU features — an entry written on one box loads on another with a
"could lead to SIGILL" warning (observed when this cache crossed machine
images). An *unresolved* platform (JAX_PLATFORMS unset — e.g. a dev box
without the axon plugin where JAX silently resolves to CPU) is treated as
CPU for the same reason: only an explicitly non-CPU platform opts in.

Env precedence: OTSLAM_NO_COMPILE_CACHE=1 disables everything here;
JAX_COMPILATION_CACHE_DIR (read natively by JAX) takes precedence over the
default directory and is never overridden.
"""

from __future__ import annotations

import os

CACHE_DIR = os.path.expanduser("~/.cache/otslam_tpu/xla")


def configure_compile_cache(platform: str | None) -> None:
    """Apply the cache policy for `platform` ("axon"/"tpu" enable, "cpu" or
    empty/None disable). Safe to call before or after backend init."""
    plat = (platform or "").strip().lower()
    if plat and plat != "cpu":
        enable_tpu_compile_cache()
    else:
        disable_cpu_compile_cache()


def enable_tpu_compile_cache() -> None:
    """Enable the persistent cache for a (remote-)TPU session, honoring the
    env opt-outs. Idempotent."""
    if os.environ.get("OTSLAM_NO_COMPILE_CACHE"):
        return
    import jax

    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def disable_cpu_compile_cache() -> None:
    """Keep a CPU session out of the persistent cache (cross-machine AOT
    SIGILL hazard + unbounded growth). A user-set JAX_COMPILATION_CACHE_DIR
    is an explicit request and is left alone. Idempotent."""
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", None)
