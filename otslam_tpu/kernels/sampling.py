"""Seeded uniform resampling of padded point sets.

Stands in for Open3D's ``mesh.sample_points_uniformly(n)`` used at
reconstruct_rgbd_filter.py:123 — downstream only ever consumes sampled point
clouds, so resampling the zero-crossing surface points (which are already
~uniform on the surface at voxel density) is statistically equivalent at the
metric level. Deterministic given the PRNG key.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_samples",))
def resample_points(key: jax.Array, points: jnp.ndarray, mask: jnp.ndarray,
                    num_samples: int, colors: jnp.ndarray | None = None,
                    normals: jnp.ndarray | None = None):
    """Uniformly sample ``num_samples`` valid rows (with replacement).

    Assumes valid rows are compacted to the front (as produced by the
    extraction kernels): row i valid iff i < count.
    """
    count = jnp.maximum(jnp.sum(mask.astype(jnp.int32)), 1)
    u = jax.random.uniform(key, (num_samples,))
    idx = jnp.minimum((u * count).astype(jnp.int32), count - 1)
    out = [jnp.take(points, idx, axis=0)]
    out.append(None if colors is None else jnp.take(colors, idx, axis=0))
    out.append(None if normals is None else jnp.take(normals, idx, axis=0))
    return tuple(out)
