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
