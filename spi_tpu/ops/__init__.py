"""TPU-native primitive ops.

Each op here replaces a CUDA kernel or autograd hack in the reference
(eg3d/torch_utils/ops/*): implemented as pure-JAX functions that XLA
fuses onto the MXU/VPU, with Pallas fast paths where profiling shows
XLA leaves performance on the table. Autodiff (any order) is free via
JAX — no hand-written double-backward machinery is needed.
"""

from spi_tpu.ops.bias_act import activation_funcs, bias_act
from spi_tpu.ops.conv import conv2d, conv_transpose2d, conv2d_resample
from spi_tpu.ops.filtered_lrelu import filtered_lrelu
from spi_tpu.ops.grid_sample import grid_sample
from spi_tpu.ops.resize import resize_area, resize_bilinear
from spi_tpu.ops.upfirdn2d import (
    downsample2d,
    setup_filter,
    upfirdn2d,
    upsample2d,
)

__all__ = [
    "filtered_lrelu",
    "activation_funcs",
    "bias_act",
    "conv2d",
    "conv_transpose2d",
    "conv2d_resample",
    "grid_sample",
    "resize_area",
    "resize_bilinear",
    "setup_filter",
    "upfirdn2d",
    "upsample2d",
    "downsample2d",
]
