"""Ray/box math. Spec: eg3d/training/volumetric_rendering/math_utils.py."""

from __future__ import annotations

import jax.numpy as jnp


def normalize_vecs(v, eps=0.0):
    """math_utils.py:33-37 (plain norm division, no eps in the reference)."""
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def get_ray_limits_box(rays_o, rays_d, box_side_length):
    """Slab-test intersection of rays with the centered cube
    (math_utils.py:46-98). Fully vectorized; no boolean indexing.

    rays_o, rays_d: (..., 3). Returns (tmin, tmax) of shape (..., 1);
    invalid rays get (-1, -2).
    """
    half = box_side_length / 2
    invdir = 1.0 / rays_d
    # For each axis: entering t at the near slab, exiting at the far slab.
    t_lo = (-half - rays_o) * invdir
    t_hi = (half - rays_o) * invdir
    t_near = jnp.minimum(t_lo, t_hi)
    t_far = jnp.maximum(t_lo, t_hi)

    tmin = jnp.max(t_near, axis=-1)
    tmax = jnp.min(t_far, axis=-1)
    is_valid = tmin <= tmax

    tmin = jnp.where(is_valid, tmin, -1.0)
    tmax = jnp.where(is_valid, tmax, -2.0)
    return tmin[..., None], tmax[..., None]


def linspace_batched(start, stop, num: int):
    """[num, *start.shape] evenly spaced, inclusive (math_utils.py:101-118)."""
    steps = jnp.arange(num, dtype=jnp.float32) / (num - 1)
    steps = steps.reshape((num,) + (1,) * start.ndim)
    return start[None] + steps * (stop - start)[None]
