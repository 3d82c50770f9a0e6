"""Fused pad → zero-upsample → FIR filter → downsample for NCHW batches.

TPU-native replacement for the reference CUDA kernel
(eg3d/torch_utils/ops/upfirdn2d.cu; python spec at
eg3d/torch_utils/ops/upfirdn2d.py:120-213). Instead of a hand-written
kernel, the whole up-filter-down sequence is expressed as ONE depthwise
`lax.conv_general_dilated`: `lhs_dilation` performs the zero-upsample,
conv padding performs the (possibly negative) pad/crop, and
`window_strides` performs the downsample. XLA lowers this to a single
fused convolution; gradients of arbitrary order come from JAX autodiff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _parse_scaling(scaling) -> tuple[int, int]:
    if isinstance(scaling, int):
        scaling = [scaling, scaling]
    sx, sy = scaling
    assert sx >= 1 and sy >= 1
    return int(sx), int(sy)


def _parse_padding(padding) -> tuple[int, int, int, int]:
    if isinstance(padding, int):
        padding = [padding, padding]
    padding = list(padding)
    if len(padding) == 2:
        padx, pady = padding
        padding = [padx, padx, pady, pady]
    padx0, padx1, pady0, pady1 = padding
    return int(padx0), int(padx1), int(pady0), int(pady1)


def setup_filter(
    f,
    normalize: bool = True,
    flip_filter: bool = False,
    gain: float = 1.0,
    separable: bool | None = None,
) -> np.ndarray:
    """Prepare a 2D FIR filter for upfirdn2d (spec: upfirdn2d.py:52-101).

    Returns a numpy float32 array so the filter is a compile-time
    constant under jit (it is never trained).
    """
    if f is None:
        f = 1
    f = np.asarray(f, dtype=np.float32)
    assert f.ndim in [0, 1, 2]
    assert f.size > 0
    if f.ndim == 0:
        f = f[np.newaxis]

    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = np.outer(f, f)
    assert f.ndim == (1 if separable else 2)

    if normalize:
        f = f / f.sum()
    if flip_filter:
        f = np.flip(f, axis=tuple(range(f.ndim)))
    f = f * (gain ** (f.ndim / 2))
    return np.ascontiguousarray(f, dtype=np.float32)


def _get_filter_2d(f, gain: float, flip_filter: bool) -> np.ndarray:
    """Materialize the (possibly separable-1D) filter as a 2D kernel with
    total gain applied, flipped for true convolution unless flip_filter."""
    if f is None:
        f = np.ones([1, 1], dtype=np.float32)
    f = np.asarray(f, dtype=np.float32)
    assert f.ndim in [1, 2]
    if f.ndim == 1:
        f2 = np.outer(f, f)
    else:
        f2 = f
    f2 = f2 * float(gain)
    if not flip_filter:
        # XLA conv is cross-correlation; flipping yields true convolution,
        # matching the reference default (upfirdn2d.py:190-192).
        f2 = np.flip(f2, axis=(0, 1))
    return np.ascontiguousarray(f2, dtype=np.float32)


@functools.partial(
    jax.jit, static_argnames=("up", "down", "padding", "flip_filter", "gain")
)
def _upfirdn2d_jit(x, f2, *, up, down, padding, flip_filter, gain):
    del flip_filter, gain  # already folded into f2
    upx, upy = up
    downx, downy = down
    padx0, padx1, pady0, pady1 = padding
    n, c, h, w = x.shape
    fh, fw = f2.shape

    # Check the (virtually) upsampled buffer is at least filter-sized,
    # mirroring upfirdn2d.py:181-183.
    up_w = w * upx + padx0 + padx1
    up_h = h * upy + pady0 + pady1
    assert up_w >= fw and up_h >= fh, "upsampled buffer smaller than filter"

    kernel = jnp.tile(f2.astype(x.dtype)[None, None], (c, 1, 1, 1))
    # lhs_dilation inserts (up-1) zeros BETWEEN pixels; the reference
    # zero-upsample appends them AFTER each pixel, so the trailing edge
    # needs (up-1) extra zeros of padding to line up exactly.
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(downy, downx),
        padding=((pady0, pady1 + upy - 1), (padx0, padx1 + upx - 1)),
        lhs_dilation=(upy, upx),
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        # Depthwise FIR taps: exact for fp32, native single-pass for
        # bf16 (see ops.conv.conv_precision).
        precision=(lax.Precision.DEFAULT
                   if x.dtype == jnp.bfloat16 and kernel.dtype == jnp.bfloat16
                   else lax.Precision.HIGHEST),
    )
    return out


def upfirdn2d(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1.0):
    """Pad, upsample, FIR-filter, and downsample a batch of 2D images.

    Semantics match the reference spec (upfirdn2d.py:120-213):
      1. zero-upsample by `up` (N-1 zeros after each pixel)
      2. pad/crop by `padding` (negative pad crops)
      3. convolve with FIR filter `f` (valid region only)
      4. keep every `down`-th pixel

    Args:
      x: (N, C, H, W) array.
      f: 2D filter, 1D separable filter, or None (identity). Accepts
         numpy or jax arrays; treated as a constant (not differentiated).
      up, down: int or (x, y) pairs.
      padding: int, (x, y), or (x0, x1, y0, y1) w.r.t. the upsampled image.
      flip_filter: False = convolution, True = correlation.
      gain: overall scaling factor.
    """
    assert x.ndim == 4
    up = _parse_scaling(up)
    down = _parse_scaling(down)
    padding = _parse_padding(padding)
    f2 = _get_filter_2d(np.asarray(f) if f is not None else None, gain, flip_filter)
    return _upfirdn2d_jit(
        x,
        jnp.asarray(f2),
        up=up,
        down=down,
        padding=padding,
        flip_filter=flip_filter,
        gain=float(gain),
    )


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1.0):
    """Upsample with the given filter (spec: upfirdn2d.py:317-341)."""
    upx, upy = _parse_scaling(up)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _filter_size(f)
    p = [
        padx0 + (fw + upx - 1) // 2,
        padx1 + (fw - upx) // 2,
        pady0 + (fh + upy - 1) // 2,
        pady1 + (fh - upy) // 2,
    ]
    return upfirdn2d(
        x, f, up=up, padding=p, flip_filter=flip_filter, gain=gain * upx * upy
    )


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1.0):
    """Downsample with the given filter (spec: upfirdn2d.py:344-370)."""
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _filter_size(f)
    p = [
        padx0 + (fw - downx + 1) // 2,
        padx1 + (fw - downx) // 2,
        pady0 + (fh - downy + 1) // 2,
        pady1 + (fh - downy) // 2,
    ]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)


def _filter_size(f) -> tuple[int, int]:
    if f is None:
        return 1, 1
    f = np.asarray(f)
    if f.ndim == 1:
        return int(f.shape[0]), int(f.shape[0])
    return int(f.shape[1]), int(f.shape[0])
