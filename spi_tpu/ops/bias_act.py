"""Fused bias + activation + gain + clamp.

TPU-native replacement for the reference CUDA kernel
(eg3d/torch_utils/ops/bias_act.cu; python spec `_bias_act_ref` at
eg3d/torch_utils/ops/bias_act.py:92-127). On TPU this needs no custom
kernel at all: the whole chain is elementwise, and XLA fuses it into the
producing matmul/conv epilogue. Gradients (any order) come from autodiff.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class _ActSpec:
    func: Callable
    def_alpha: float
    def_gain: float


# Activation table mirroring bias_act.py:23-33 (def_gain values included —
# they scale variance-preserving initializations throughout StyleGAN2).
activation_funcs: dict[str, _ActSpec] = {
    "linear": _ActSpec(lambda x, alpha: x, 0.0, 1.0),
    "relu": _ActSpec(lambda x, alpha: jax.nn.relu(x), 0.0, math.sqrt(2)),
    "lrelu": _ActSpec(lambda x, alpha: jax.nn.leaky_relu(x, alpha), 0.2, math.sqrt(2)),
    "tanh": _ActSpec(lambda x, alpha: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": _ActSpec(lambda x, alpha: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": _ActSpec(lambda x, alpha: jax.nn.elu(x), 0.0, 1.0),
    "selu": _ActSpec(lambda x, alpha: jax.nn.selu(x), 0.0, 1.0),
    "softplus": _ActSpec(lambda x, alpha: jax.nn.softplus(x), 0.0, 1.0),
    "swish": _ActSpec(lambda x, alpha: jax.nn.sigmoid(x) * x, 0.0, math.sqrt(2)),
}


def bias_act(x, b=None, dim=1, act="linear", alpha=None, gain=None, clamp=None,
             impl="xla"):
    """Add bias along `dim`, apply activation, scale by gain, clamp.

    Matches `_bias_act_ref` (bias_act.py:92-127). `clamp=None` disables
    clamping; `clamp >= 0` clips to [-clamp, clamp].

    `impl` mirrors the reference's 'cuda'|'ref' switch (bias_act.py:
    85-88): 'xla' (default) is the fusable elementwise chain — optimal
    in-graph, where XLA folds it into the producing conv/matmul
    epilogue; 'pallas' dispatches the explicit TPU kernel
    (ops/bias_act_pallas.py, custom first-order VJP), the path for
    standalone invocations and the scaffold for kernel experiments.
    On real TPUs impl='pallas' requires `x.shape[dim]` to be a multiple
    of 8 (Mosaic sublane-alignment of the row tiling); narrow-channel
    calls such as the 3-channel ToRGB must use 'xla'.
    """
    assert clamp is None or clamp >= 0
    if impl == "pallas":
        from spi_tpu.ops.bias_act_pallas import bias_act_pallas

        return bias_act_pallas(
            x, b, dim=dim, act=act, alpha=alpha, gain=gain, clamp=clamp
        )
    assert impl == "xla", impl
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)

    if b is not None:
        assert b.ndim == 1
        assert 0 <= dim < x.ndim
        assert b.shape[0] == x.shape[dim]
        x = x + b.reshape([-1 if i == dim else 1 for i in range(x.ndim)])

    x = spec.func(x, alpha)

    if gain != 1:
        x = x * gain
    if clamp is not None:
        x = jnp.clip(x, -clamp, clamp)
    return x
