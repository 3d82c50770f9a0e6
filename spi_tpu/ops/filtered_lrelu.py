"""Fused up-filter -> bias -> leaky-ReLU -> clamp -> down-filter.

Behavioral spec: eg3d/torch_utils/ops/filtered_lrelu.py:58-155 — the
StyleGAN3 alias-free nonlinearity. The reference's 1.8k-line CUDA
kernel exists to avoid materializing the up-sampled intermediate with
its sign-buffer trick; on TPU the composed form below is a handful of
XLA ops that the compiler fuses, so no custom kernel is warranted
(`_filtered_lrelu_ref`, filtered_lrelu.py:124-166, is the exact spec).

Only consumed by SG3-backbone checkpoints (SURVEY.md §2.1/§2.2:
`networks_stylegan3.py:354`; the shipped FFHQ EG3D checkpoints use the
SG2 backbone); provided for full L1-op parity.
"""

from __future__ import annotations

import math

import numpy as np

from spi_tpu.ops.bias_act import bias_act
from spi_tpu.ops.upfirdn2d import _parse_padding, upfirdn2d


def _filter_size(f):
    if f is None:
        return 1, 1
    f = np.asarray(f)
    if f.ndim == 1:
        return f.shape[0], f.shape[0]
    return f.shape[1], f.shape[0]  # (w, h)


def filtered_lrelu(
    x,
    fu=None,
    fd=None,
    b=None,
    up: int = 1,
    down: int = 1,
    padding=0,
    gain: float = math.sqrt(2.0),
    slope: float = 0.2,
    clamp: float | None = None,
    flip_filter: bool = False,
):
    """x: (N, C, H, W); fu/fd: up/down FIR filters (taps, 1D separable
    or 2D); b: (C,) bias. Returns (N, C, H', W') with
    H' = (H*up + py0+py1 - (fu_h-1) - (fd_h-1) + (down-1)) // down."""
    assert up >= 1 and down >= 1
    px0, px1, py0, py1 = _parse_padding(padding)
    fu_w, fu_h = _filter_size(fu)
    fd_w, fd_h = _filter_size(fd)

    n, c, in_h, in_w = x.shape
    out_w = (in_w * up + (px0 + px1) - (fu_w - 1) - (fd_w - 1) + (down - 1)) // down
    out_h = (in_h * up + (py0 + py1) - (fu_h - 1) - (fd_h - 1) + (down - 1)) // down

    x = bias_act(x, b)
    x = upfirdn2d(
        x, fu, up=up, padding=[px0, px1, py0, py1], gain=up**2,
        flip_filter=flip_filter,
    )
    x = bias_act(x, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x, fd, down=down, flip_filter=flip_filter)
    assert x.shape == (n, c, out_h, out_w), (x.shape, (n, c, out_h, out_w))
    return x
