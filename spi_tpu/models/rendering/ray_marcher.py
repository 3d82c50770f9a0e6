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


def _masked_place(onehot, values):
    """Place values[..., i] at slot j where onehot[..., i, j]; zero elsewhere,
    summed over i -> (..., S). A lane-axis permutation as a fusable
    compare-select-reduce (no sort/gather HLOs)."""
    return jnp.sum(jnp.where(onehot, values[..., None], 0.0), axis=-2)


def march_rays_merge(colors1, densities1, depths1, colors2, densities2, depths2,
                     *, white_back: bool = False):
    """march_rays over the union of TWO per-ray-sorted sample groups.

    Replaces the reference's unify_samples sort-merge (renderer.py:157-167)
    for the coarse+fine union. Both input groups are ascending along S by
    construction (stratified depths are jittered linspace; importance
    depths are the inverse CDF of SORTED uniforms — see sample_pdf), so
    the full sort degenerates to a two-list merge. On TPU, sort and
    take_along_axis along the lane (sample) axis lower catastrophically
    (~44 ms per 128^2 x 96 render, measured v5e — 20x the rest of the
    march combined); the merge instead computes each sample's merged RANK
    with one broadcast compare + sum, and applies that permutation (and
    its inverse, for the color coefficients) as masked reductions, which
    XLA fuses into VPU compare-select-add chains.

    Exactly march_rays(sort-merge of the groups) up to fp summation
    order; colors never leave their original layout (the weighted-sum
    algebra of march_rays_unsorted).
    """
    d1 = depths1[..., 0]  # (N, M, S1)
    d2 = depths2[..., 0]  # (N, M, S2)
    s1 = d1.shape[-1]
    s2 = d2.shape[-1]
    s = s1 + s2

    # Stable merge ranks: group-1 wins ties (strict < vs <=).
    r1 = jnp.arange(s1) + jnp.sum(
        (d2[..., None, :] < d1[..., :, None]), axis=-1
    )  # (N, M, S1)
    r2 = jnp.arange(s2) + jnp.sum(
        (d1[..., None, :] <= d2[..., :, None]), axis=-1
    )  # (N, M, S2)
    slots = jnp.arange(s)
    oh1 = r1[..., :, None] == slots  # (N, M, S1, S)
    oh2 = r2[..., :, None] == slots  # (N, M, S2, S)

    d_sorted = (_masked_place(oh1, d1) + _masked_place(oh2, d2))[..., None]
    sig_sorted = (
        _masked_place(oh1, densities1[..., 0]) + _masked_place(oh2, densities2[..., 0])
    )[..., None]

    deltas = d_sorted[:, :, 1:] - d_sorted[:, :, :-1]
    densities_mid = jax.nn.softplus(
        (sig_sorted[:, :, :-1] + sig_sorted[:, :, 1:]) / 2 - 1.0
    )
    depths_mid = (d_sorted[:, :, :-1] + d_sorted[:, :, 1:]) / 2

    alpha = 1.0 - jnp.exp(-densities_mid * deltas)
    alpha_shifted = jnp.concatenate(
        [jnp.ones_like(alpha[:, :, :1]), 1.0 - alpha + 1e-10], axis=-2
    )
    weights = alpha * jnp.cumprod(alpha_shifted, axis=-2)[:, :, :-1]  # (N,M,S-1,1)

    # Midpoint-color coefficient of each sorted slot (march_rays_unsorted
    # algebra), pulled back to each group's original order via the
    # inverse permutation (a masked reduce over slots).
    w = weights[..., 0]  # (N, M, S-1)
    zero = jnp.zeros_like(w[:, :, :1])
    wpad = jnp.concatenate([zero, w, zero], axis=-1)  # (N, M, S+1)
    coeff_sorted = 0.5 * (wpad[:, :, :-1] + wpad[:, :, 1:])  # (N, M, S)
    coeff1 = jnp.sum(jnp.where(oh1, coeff_sorted[..., None, :], 0.0), axis=-1)
    coeff2 = jnp.sum(jnp.where(oh2, coeff_sorted[..., None, :], 0.0), axis=-1)

    composite_rgb = jnp.sum(coeff1[..., None] * colors1, axis=-2) + jnp.sum(
        coeff2[..., None] * colors2, axis=-2
    )
    weight_total = jnp.sum(weights, axis=2)
    composite_depth = jnp.sum(weights * depths_mid, axis=-2) / weight_total
    composite_depth = jnp.nan_to_num(composite_depth, nan=jnp.inf)
    composite_depth = jnp.clip(
        composite_depth,
        jnp.minimum(jnp.min(depths1), jnp.min(depths2)),
        jnp.maximum(jnp.max(depths1), jnp.max(depths2)),
    )

    if white_back:
        composite_rgb = composite_rgb + 1.0 - weight_total

    composite_rgb = composite_rgb * 2.0 - 1.0
    return composite_rgb, composite_depth, weights
