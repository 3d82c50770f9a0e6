"""MipNeRF-style alpha compositing.

Spec: eg3d/training/volumetric_rendering/ray_marcher.py:25-57
(midpoint deltas, softplus(sigma - 1) activation, alpha compositing,
normalized depth composite, optional white background, [-1,1] scaling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def march_rays(colors, densities, depths, *, white_back: bool = False):
    """Composite samples along each ray.

    Args:
      colors:    (N, M, S, C)
      densities: (N, M, S, 1)
      depths:    (N, M, S, 1), sorted ascending along S.
      white_back: add (1 - total weight) to the composite color.

    Returns:
      (composite_rgb (N, M, C) scaled to [-1, 1],
       composite_depth (N, M, 1),
       weights (N, M, S-1, 1))
    """
    deltas = depths[:, :, 1:] - depths[:, :, :-1]
    colors_mid = (colors[:, :, :-1] + colors[:, :, 1:]) / 2
    densities_mid = (densities[:, :, :-1] + densities[:, :, 1:]) / 2
    depths_mid = (depths[:, :, :-1] + depths[:, :, 1:]) / 2

    # softplus with -1 bias initializes near-transparent (ray_marcher.py:33).
    densities_mid = jax.nn.softplus(densities_mid - 1.0)

    density_delta = densities_mid * deltas
    alpha = 1.0 - jnp.exp(-density_delta)

    # T_i = prod_{j<i} (1 - alpha_j + 1e-10); implemented as a cumprod over
    # the shifted transmittance, exactly as ray_marcher.py:41-42.
    alpha_shifted = jnp.concatenate(
        [jnp.ones_like(alpha[:, :, :1]), 1.0 - alpha + 1e-10], axis=-2
    )
    weights = alpha * jnp.cumprod(alpha_shifted, axis=-2)[:, :, :-1]

    composite_rgb = jnp.sum(weights * colors_mid, axis=-2)
    weight_total = jnp.sum(weights, axis=2)
    composite_depth = jnp.sum(weights * depths_mid, axis=-2) / weight_total

    composite_depth = jnp.nan_to_num(composite_depth, nan=jnp.inf)
    composite_depth = jnp.clip(composite_depth, jnp.min(depths), jnp.max(depths))

    if white_back:
        composite_rgb = composite_rgb + 1.0 - weight_total

    composite_rgb = composite_rgb * 2.0 - 1.0
    return composite_rgb, composite_depth, weights
