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


def march_rays_unsorted(colors, densities, depths, *, white_back: bool = False):
    """march_rays for UNSORTED samples, without shuffling the feature
    channels.

    Replaces the reference's sort-merge + march (renderer.py:157-167 +
    ray_marcher.py:25-57) for the coarse+fine union. Key algebra: the
    composite is a weighted SUM of midpoint colors, so
        sum_i w_i (c_s[i] + c_s[i+1]) / 2 = sum_j c_s[j] (w[j-1]+w[j])/2
    — only the scalar (depth, sigma) pair must be sorted to compute the
    weights; per-sample coefficients are then un-permuted (scalar
    gather) and applied to the ORIGINAL color order. On TPU this avoids
    a 32-wide-payload sort along a non-minor axis (~60 ms per render at
    128^2x96) in favor of last-axis scalar sorts (~2 ms). Exact up to
    fp summation order.

    Args/returns match march_rays; `weights` is returned in the SORTED
    domain (as the reference's post-sort weights are).
    """
    d = depths[..., 0]  # (N, M, S)
    order = jnp.argsort(d, axis=-1)
    d_sorted = jnp.take_along_axis(d, order, axis=-1)[..., None]
    s_sorted = jnp.take_along_axis(densities[..., 0], order, axis=-1)[..., None]

    deltas = d_sorted[:, :, 1:] - d_sorted[:, :, :-1]
    densities_mid = jax.nn.softplus(
        (s_sorted[:, :, :-1] + s_sorted[:, :, 1:]) / 2 - 1.0
    )
    depths_mid = (d_sorted[:, :, :-1] + d_sorted[:, :, 1:]) / 2

    alpha = 1.0 - jnp.exp(-densities_mid * deltas)
    alpha_shifted = jnp.concatenate(
        [jnp.ones_like(alpha[:, :, :1]), 1.0 - alpha + 1e-10], axis=-2
    )
    weights = alpha * jnp.cumprod(alpha_shifted, axis=-2)[:, :, :-1]  # (N,M,S-1,1)

    # coefficient of each sorted sample in the midpoint-color sum
    w = weights[..., 0]  # (N, M, S-1)
    zero = jnp.zeros_like(w[:, :, :1])
    wpad = jnp.concatenate([zero, w, zero], axis=-1)  # (N, M, S+1)
    coeff_sorted = 0.5 * (wpad[:, :, :-1] + wpad[:, :, 1:])  # (N, M, S)
    inv = jnp.argsort(order, axis=-1)
    coeff = jnp.take_along_axis(coeff_sorted, inv, axis=-1)[..., None]

    composite_rgb = jnp.sum(coeff * colors, axis=-2)
    weight_total = jnp.sum(weights, axis=2)
    composite_depth = jnp.sum(weights * depths_mid, axis=-2) / weight_total
    composite_depth = jnp.nan_to_num(composite_depth, nan=jnp.inf)
    composite_depth = jnp.clip(composite_depth, jnp.min(depths), jnp.max(depths))

    if white_back:
        composite_rgb = composite_rgb + 1.0 - weight_total

    composite_rgb = composite_rgb * 2.0 - 1.0
    return composite_rgb, composite_depth, weights
