"""Bilinear grid sampling (zeros padding, align_corners=False).

JAX has no grid_sample; the reference relies on torch's CUDA
implementation wrapped for 2nd-order grads
(eg3d/torch_utils/ops/grid_sample_gradfix.py:28-77). Here it is a
gather-based bilinear sample: four corner gathers from a channels-last
(H*W, C) table — the layout TPU gathers like (contiguous trailing dim) —
with out-of-bounds handled by weight masking (zeros padding). Autodiff
provides all gradient orders.

This op is the inner loop of triplane feature lookup
(eg3d/training/volumetric_rendering/renderer.py:55-65) and of the
depth-warp loss (spi/utils/rotate.py); a fused Pallas
project→sample→decode kernel can later replace the XLA path behind the
same API.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample(input, grid):  # noqa: A002 - mirror torch's arg name
    """torch.nn.functional.grid_sample(mode='bilinear', padding_mode='zeros',
    align_corners=False) equivalent.

    Args:
      input: (N, C, H, W).
      grid: (N, Ho, Wo, 2), last dim is (x, y) in [-1, 1].

    Returns:
      (N, C, Ho, Wo).
    """
    n, c, h, w = input.shape
    gn, ho, wo, two = grid.shape
    assert two == 2 and gn == n

    # Channels-last flat table: gathers pull contiguous C-vectors.
    table = jnp.transpose(input, (0, 2, 3, 1)).reshape(n, h * w, c)
    out = _sample_flat(table, grid.reshape(n, ho * wo, 2), h, w)
    return jnp.transpose(out.reshape(n, ho, wo, c), (0, 3, 1, 2))


def grid_sample_nhwc(table, coords, h: int, w: int):
    """Channels-last core: sample (N, H*W, C) tables at (N, P, 2) coords.

    Exposed for the triplane render path, which keeps everything
    channels-last to avoid NCHW<->NHWC transposes around the gather.
    """
    return _sample_flat(table, coords, h, w)


def quad_sample_nhwc(table, coords, h: int, w: int):
    """grid_sample_nhwc with the 'quad-row' gather layout.

    TPU gathers are latency-bound per index, not per byte: 786k random
    row-takes cost the same whether a row is 32 or 128 floats wide. So
    instead of 4 corner gathers per plane, each table row is widened to
    hold its full 2x2 bilinear footprint (row r || r+1 || r+W || r+W+1,
    channel-concatenated) and ONE take per plane retrieves all four
    corners — measured ~3.9x faster forward, ~2.7x with the scatter-add
    backward, than the 4-gather formulation on v5e.

    Semantics identical to grid_sample_nhwc (bilinear, zeros padding,
    align_corners=False). Costs 4x the table memory (built on the fly;
    XLA fuses the rolls into the concat).
    """
    n, hw, c = table.shape
    assert hw == h * w
    x = coords[..., 0]
    y = coords[..., 1]
    fx = ((x + 1.0) * w - 1.0) * 0.5
    fy = ((y + 1.0) * h - 1.0) * 0.5
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = fx - x0
    ty = fy - y0

    x0c = jnp.clip(x0, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    r = y0c * w + x0c  # (N, P)

    # Per-LANE weights: lane a of the quad row holds column x0c + a,
    # which is corner x0 when in range, corner x1 when x0 was clamped
    # up from -1, and a wrapped (invalid) texel otherwise. Assign each
    # lane the bilinear weight of the corner it actually equals — this
    # reproduces zeros-padding semantics exactly at every border.
    def lane_weights(base, t, lo_corner, size):
        lane0_col = base
        lane1_col = base + 1
        w_lane0 = (1 - t) * (lane0_col == lo_corner) + t * (lane0_col == lo_corner + 1)
        w_lane1 = (
            (1 - t) * (lane1_col == lo_corner) + t * (lane1_col == lo_corner + 1)
        ) * (lane1_col <= size - 1)
        return w_lane0, w_lane1

    wx0, wx1 = lane_weights(x0c, tx, x0, w)
    wy0, wy1 = lane_weights(y0c, ty, y0, h)
    w00 = (wx0 * wy0)[..., None]
    w01 = (wx1 * wy0)[..., None]
    w10 = (wx0 * wy1)[..., None]
    w11 = (wx1 * wy1)[..., None]

    quad = jnp.concatenate(
        [
            table,
            jnp.roll(table, -1, axis=1),
            jnp.roll(table, -w, axis=1),
            jnp.roll(table, -w - 1, axis=1),
        ],
        axis=2,
    )  # (N, HW, 4C)
    rows = jnp.take_along_axis(quad, r[..., None], axis=1)  # (N, P, 4C)
    return (
        rows[..., :c] * w00
        + rows[..., c : 2 * c] * w01
        + rows[..., 2 * c : 3 * c] * w10
        + rows[..., 3 * c :] * w11
    )


def _sample_flat(table, coords, h: int, w: int):
    """table: (N, H*W, C); coords: (N, P, 2) xy in [-1,1] -> (N, P, C)."""
    x = coords[..., 0]
    y = coords[..., 1]
    # align_corners=False: -1 maps to -0.5 px, +1 maps to (size-0.5) px.
    fx = ((x + 1.0) * w - 1.0) * 0.5
    fy = ((y + 1.0) * h - 1.0) * 0.5

    x0f = jnp.floor(fx)
    y0f = jnp.floor(fy)
    tx = fx - x0f
    ty = fy - y0f

    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    # Zeros padding: clamp the index for a safe gather, zero the weight
    # where the true index is out of bounds.
    def corner(xi, yi, wgt):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        flat = yc * w + xc  # (N, P)
        vals = jnp.take_along_axis(table, flat[..., None], axis=1)
        return vals * (wgt * valid)[..., None]

    w00 = (1.0 - tx) * (1.0 - ty)
    w01 = tx * (1.0 - ty)
    w10 = (1.0 - tx) * ty
    w11 = tx * ty

    return (
        corner(x0, y0, w00)
        + corner(x1, y0, w01)
        + corner(x0, y1, w10)
        + corner(x1, y1, w11)
    )
