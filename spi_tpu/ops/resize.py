"""Image resizing helpers matching torch.nn.functional.interpolate modes
used by the reference pipeline:

- bilinear (align_corners=False), with/without antialias — used by the
  superresolution input path (eg3d/training/superresolution.py:282-286),
  depth-map rescaling (spi/utils/rotate.py:107-115), and mask prep
  (spi/training/projectors/mirror_projector.py:76).
- area — used to pool 512->256 before VGG feature distance
  (spi/training/projectors/w_projector.py:49-50,84-85).

Both map to single fused XLA ops (general dot / reduce-window).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x, size: tuple[int, int], antialias: bool = False):
    """Bilinear resize of (N, C, H, W) to (N, C, *size), half-pixel centers
    (torch align_corners=False semantics)."""
    n, c, _, _ = x.shape
    return jax.image.resize(
        x, (n, c, size[0], size[1]), method="bilinear", antialias=antialias
    )


def resize_area(x, size: tuple[int, int]):
    """Area (average-pool) downsample of (N, C, H, W) to (N, C, *size).

    Matches torch mode='area' for integer downscale factors (the only
    case the reference exercises: 512 -> 256).
    """
    n, c, h, w = x.shape
    oh, ow = size
    assert h % oh == 0 and w % ow == 0, "resize_area requires integer factors"
    fh, fw = h // oh, w // ow
    x = x.reshape(n, c, oh, fh, ow, fw)
    return x.mean(axis=(3, 5))
