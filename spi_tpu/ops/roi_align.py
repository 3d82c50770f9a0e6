"""ROI-align (torchvision semantics, aligned=False) via bilinear gathers.

Needed by the BoxCX facial-region loss (spi/criteria/bbox_cx_loss.py:41-61
crops 80x80 mouth/eye regions with torchvision.ops.roi_align). The
torchvision adaptive sampling_ratio (-1) is data-dependent and thus not
jittable; a static sampling_ratio (default 2, the detectron standard) is
used instead — sub-pixel differences are negligible for a perceptual
loss over 80x80 crops.
"""

from __future__ import annotations

import jax.numpy as jnp


def roi_align(features, boxes, output_size: int, sampling_ratio: int = 2):
    """Crop-and-resize boxes from per-sample feature maps.

    Args:
      features: (N, C, H, W).
      boxes: (N, 4) as (x1, y1, x2, y2) in input pixel coordinates —
        one box per sample (the SPI usage; torchvision's batch-index
        column is implicit).
      output_size: side of the square output crop.
      sampling_ratio: sub-samples per bin side, averaged.

    Returns:
      (N, C, output_size, output_size).
    """
    n, c, h, w = features.shape
    s = sampling_ratio
    o = output_size

    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bin_w = (x2 - x1) / o
    bin_h = (y2 - y1) / o

    # Sub-sample grid: for output bin i, samples at
    # x1 + (i + (j + 0.5)/s) * bin_w  (aligned=False: no 0.5 px shift).
    i = jnp.arange(o, dtype=features.dtype)
    j = (jnp.arange(s, dtype=features.dtype) + 0.5) / s
    offs = (i[:, None] + j[None, :]).reshape(-1)  # (o*s,)

    xs = x1[:, None] + offs[None, :] * bin_w[:, None]  # (N, o*s)
    ys = y1[:, None] + offs[None, :] * bin_h[:, None]

    # Bilinear sample at continuous pixel coords (pixel centers at ints).
    vals = _bilinear_pixels(features, xs, ys)  # (N, C, o*s, o*s)
    vals = vals.reshape(n, c, o, s, o, s)
    return vals.mean(axis=(3, 5))


def _bilinear_pixels(features, xs, ys):
    """Sample (N,C,H,W) at the outer product of xs, ys pixel coords.

    xs, ys: (N, P). Returns (N, C, P_y, P_x) where P == P_y == P_x.
    torchvision roi_align clamps coordinates to the feature extent
    (border replication at edges, zero only for fully-outside boxes is
    not reproduced — SPI boxes are interior face regions).
    """
    n, c, h, w = features.shape
    p = xs.shape[1]

    xs = jnp.clip(xs, 0.0, w - 1.0)
    ys = jnp.clip(ys, 0.0, h - 1.0)

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    tx = (xs - x0)[:, None, None, :]  # (N,1,1,P)
    ty = (ys - y0)[:, None, :, None]  # (N,1,P,1)

    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)

    # Gather rows then columns (separable): (N,C,H,W) -> (N,C,P,W) -> (N,C,P,P)
    def take_rows(f, yi):
        return jnp.take_along_axis(f, yi[:, None, :, None], axis=2)

    def take_cols(f, xi):
        return jnp.take_along_axis(f, xi[:, None, None, :], axis=3)

    f_y0 = take_rows(features, y0)
    f_y1 = take_rows(features, y1)
    v00 = take_cols(f_y0, x0)
    v01 = take_cols(f_y0, x1)
    v10 = take_cols(f_y1, x0)
    v11 = take_cols(f_y1, x1)

    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return top * (1 - ty) + bot * ty
