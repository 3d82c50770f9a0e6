"""Pallas TPU kernel for fused bias + activation + gain + clamp.

The reference ships this op as a CUDA kernel with a reference twin
(eg3d/torch_utils/ops/bias_act.cu; `_bias_act_ref` at bias_act.py:92-127)
selected via `impl='cuda'|'ref'`. The TPU analog of that switch is
`impl='pallas'|'xla'` on spi_tpu.ops.bias_act: the XLA path (default)
lets the compiler fuse the elementwise chain into the producing
matmul/conv epilogue — which is optimal *in-graph* — while this module
provides the explicit-kernel path with a custom VJP (first-order; the
reference's second-order gradients matter only for the GAN
regularizers, which the XLA path serves via plain autodiff).

Layout: the bias axis is moved last and the tensor flattened to
(M, C) so bias sits on the lane dimension; the kernel tiles M across a
1-D grid. The backward kernel recomputes act'(x+b) from the saved input
(cheaper than saving the pre-activation) and applies the clamp mask
from the saved OUTPUT (grad = 0 where the forward clamped, matching the
CUDA kernel's grad rule, bias_act.cu backward).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _act(name: str, x, alpha: float):
    if name == "linear":
        return x
    if name == "relu":
        return jnp.maximum(x, 0.0)
    if name == "lrelu":
        return jnp.where(x >= 0, x, x * alpha)
    if name == "tanh":
        return jnp.tanh(x)
    if name == "sigmoid":
        return jax.nn.sigmoid(x)
    if name == "elu":
        return jnp.where(x >= 0, x, jnp.expm1(x))
    if name == "selu":
        lam, a = 1.0507009873554805, 1.6732632423543772
        return lam * jnp.where(x >= 0, x, a * jnp.expm1(x))
    if name == "softplus":
        return jax.nn.softplus(x)
    if name == "swish":
        return jax.nn.sigmoid(x) * x
    raise ValueError(name)


def _act_grad(name: str, x, y_act, alpha: float):
    """d act / d x, from input x and (pre-gain) activation y_act."""
    if name == "linear":
        return jnp.ones_like(x)
    if name == "relu":
        return (x >= 0).astype(x.dtype)
    if name == "lrelu":
        return jnp.where(x >= 0, 1.0, alpha).astype(x.dtype)
    if name == "tanh":
        return 1.0 - jnp.square(y_act)
    if name == "sigmoid":
        return y_act * (1.0 - y_act)
    if name == "elu":
        return jnp.where(x >= 0, 1.0, y_act + 1.0).astype(x.dtype)
    if name == "selu":
        lam, a = 1.0507009873554805, 1.6732632423543772
        return jnp.where(x >= 0, lam, y_act + lam * a).astype(x.dtype)
    if name == "softplus":
        return jax.nn.sigmoid(x)
    if name == "swish":
        s = jax.nn.sigmoid(x)
        return s * (1.0 + x * (1.0 - s))
    raise ValueError(name)


def _fwd_kernel(x_ref, b_ref, o_ref, *, act, alpha, gain, clamp):
    # f32 compute: Mosaic on v5e rejects bf16 vector comparisons
    # ("Target does not support this comparison"), and the op is
    # bandwidth-bound anyway — the VPU f32 math is free.
    # b_ref is (C, 1): rows of the x tile are (..., C)-ordered with tile
    # height C, so the bias broadcasts along lanes with NO transpose of
    # x anywhere (layout notes in bias_act_pallas).
    xb = (x_ref[:] + b_ref[:]).astype(jnp.float32)
    y = _act(act, xb, alpha)
    if gain != 1.0:
        y = y * gain
    if clamp is not None:
        y = jnp.clip(y, -clamp, clamp)
    o_ref[:] = y.astype(o_ref.dtype)


def _bwd_kernel(g_ref, x_ref, b_ref, dx_ref, *, act, alpha, gain, clamp):
    xb = (x_ref[:] + b_ref[:]).astype(jnp.float32)
    y_act = _act(act, xb, alpha)
    d = g_ref[:].astype(jnp.float32) * _act_grad(act, xb, y_act, alpha)
    if gain != 1.0:
        d = d * gain
    if clamp is not None:
        y = y_act * gain if gain != 1.0 else y_act
        d = jnp.where((y > -clamp) & (y < clamp), d, 0.0)
    dx_ref[:] = d.astype(dx_ref.dtype)


def _tile_l(l: int) -> int:
    for t in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if l % t == 0:
            return t
    return l


def _call_2d(kernel, outs, m, c, l, *args):
    """Tile a (M=rows*C, L) problem: tile height C (so row r of a tile is
    channel r, matching the (C, 1) bias block), lanes tiled by TL."""
    tl = _tile_l(l)
    grid = (m // c, l // tl)
    x_spec = pl.BlockSpec((c, tl), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((c, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    n_x = len(args) - 1  # trailing arg is the bias
    return pl.pallas_call(
        kernel,
        out_shape=outs,
        grid=grid,
        in_specs=[x_spec] * n_x + [b_spec],
        out_specs=x_spec,
        # CI runs on the CPU backend, where Mosaic can't compile;
        # interpret mode keeps the kernel testable there.
        interpret=jax.default_backend() != "tpu",
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _bias_act_2d(x2, b2, act, alpha, gain, clamp):
    m, l = x2.shape
    c = b2.shape[0]
    return _call_2d(
        functools.partial(_fwd_kernel, act=act, alpha=alpha, gain=gain, clamp=clamp),
        jax.ShapeDtypeStruct((m, l), x2.dtype), m, c, l, x2, b2,
    )


def _bias_act_2d_fwd(x2, b2, act, alpha, gain, clamp):
    return _bias_act_2d(x2, b2, act, alpha, gain, clamp), (x2, b2)


def _bias_act_2d_bwd(act, alpha, gain, clamp, res, g):
    x2, b2 = res
    m, l = x2.shape
    c = b2.shape[0]
    dx = _call_2d(
        functools.partial(_bwd_kernel, act=act, alpha=alpha, gain=gain, clamp=clamp),
        jax.ShapeDtypeStruct((m, l), x2.dtype), m, c, l, g, x2, b2,
    )
    db = jnp.sum(dx.reshape(m // c, c, l), axis=(0, 2))[:, None]
    return dx, db


_bias_act_2d.defvjp(_bias_act_2d_fwd, _bias_act_2d_bwd)


def bias_act_pallas(x, b=None, dim=1, act="linear", alpha=None, gain=None, clamp=None):
    """Pallas-kernel implementation of spi_tpu.ops.bias_act (same
    semantics as `_bias_act_ref`, bias_act.py:92-127).

    Layout: dims up to and including `dim` collapse into rows (so a row's
    channel is row % C) and trailing dims into lanes; the kernel tiles
    rows in multiples of C with a (C, 1) bias block — NO transposes in
    or out, the common NCHW dim=1 case is a pure reshape."""
    from spi_tpu.ops.bias_act import activation_funcs

    assert clamp is None or clamp >= 0
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)
    clamp = float(clamp) if clamp is not None else None

    if b is None:
        b = jnp.zeros((x.shape[dim],), x.dtype)
    assert b.ndim == 1 and b.shape[0] == x.shape[dim]

    # The grid tiles rows in blocks of height C at offsets i*C; on real
    # TPUs Mosaic requires dynamic block offsets on the sublane axis to
    # be 8-aligned, so C must be a multiple of 8 (CI exercises the
    # kernel through interpret mode, which would not catch this).
    if jax.default_backend() == "tpu" and x.shape[dim] % 8 != 0:
        raise ValueError(
            f"bias_act impl='pallas' on TPU requires the bias axis to be "
            f"a multiple of 8 sublanes, got C={x.shape[dim]} (dim={dim}). "
            f"Use impl='xla' for narrow-channel calls (e.g. 3-channel "
            f"ToRGB) or pad the channel axis.")

    lead = int(np_prod(x.shape[: dim + 1]))
    trail = int(np_prod(x.shape[dim + 1:]))
    x2 = x.reshape(lead, trail)
    out2 = _bias_act_2d(
        x2, b.astype(x.dtype).reshape(-1, 1), act, alpha, gain, clamp
    )
    return out2.reshape(x.shape)


def np_prod(shape) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out
