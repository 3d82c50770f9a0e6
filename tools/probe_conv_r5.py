"""Round-5 conv-path efficiency probes.

README round-4 numbers: SR 8XDC fwd+bwd 29 ms (theoretical MXU floor
~5 ms), LPIPS-VGG16 increment ~13 ms (floor ~1 ms). Candidate causes:
NCHW layout (XLA TPU prefers NHWC and may transpose around every
conv), Precision.HIGHEST on bf16/f32 inputs, fp32 paths.

Measures, on the shipped modules:
  1. SR 8XDC fwd and fwd+bwd (bf16) — baseline.
  2. LPIPS fwd+bwd at 512 -> 256 (bf16) — baseline.
  3. A standalone conv stack with SR-like shapes in NCHW/f32-HIGHEST,
     NCHW/bf16-default, NHWC/bf16 — isolates layout + precision cost.

python tools/probe_conv_r5.py
"""

from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from bench_util import bench_scan


def sr_probe():
    from spi_tpu.models.superresolution import Superresolution

    sr = Superresolution(variant="SuperresolutionHybrid8XDC", img_resolution=512)
    params = sr.init(jax.random.PRNGKey(0))
    bf = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
    params = bf(params)
    rgb = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 128, 128), jnp.bfloat16)
    feat = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 128, 128), jnp.bfloat16)
    ws = jax.random.normal(jax.random.PRNGKey(3), (1, 14, 512), jnp.bfloat16)

    def fwd(p, feat):
        return jnp.sum(sr(p, rgb, feat, ws).astype(jnp.float32))

    bench_scan("SR 8XDC fwd (bf16)", fwd, params, feat, perturb_arg=1)

    def fwdbwd(p, feat):
        g = jax.grad(fwd)(p, feat)
        return sum(jnp.sum(x).astype(jnp.float32) for x in jax.tree_util.tree_leaves(g))

    bench_scan("SR 8XDC fwd+bwd (bf16)", fwdbwd, params, feat, perturb_arg=1)


def lpips_probe():
    from spi_tpu.criteria.lpips import LPIPS

    lp = LPIPS(compute_dtype="bfloat16")
    p = lp.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 512, 512))
    y = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 512, 512))

    def fwd(p, x):
        return lp(p, x, y)

    bench_scan("LPIPS 512 fwd (bf16)", fwd, p, x, perturb_arg=1)

    def fwdbwd(p, x):
        return jnp.sum(jax.grad(lambda xx: lp(p, xx, y))(x).astype(jnp.float32))

    bench_scan("LPIPS 512 fwd+bwd wrt x (bf16)", fwdbwd, p, x, perturb_arg=1)


def layout_probe():
    """SR-like conv stack: 32->256 @256^2 + 256->256 + 256->128 @512^2."""
    from jax import lax

    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 8)

    def stack_nchw(x, ws, precision):
        w1, w2, w3 = ws
        y = lax.conv_general_dilated(
            x, w1, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=precision)
        y = jax.nn.leaky_relu(y, 0.2)
        y = lax.conv_general_dilated(
            y, w2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=precision)
        y = jax.nn.leaky_relu(y, 0.2)
        # 2x nearest up + conv (stand-in for the up-branch)
        y = jnp.repeat(jnp.repeat(y, 2, 2), 2, 3)
        y = lax.conv_general_dilated(
            y, w3, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"), precision=precision)
        return jnp.sum(y.astype(jnp.float32))

    def stack_nhwc(x, ws, precision):
        w1, w2, w3 = ws
        y = lax.conv_general_dilated(
            x, w1, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
        y = jax.nn.leaky_relu(y, 0.2)
        y = lax.conv_general_dilated(
            y, w2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
        y = jax.nn.leaky_relu(y, 0.2)
        y = jnp.repeat(jnp.repeat(y, 2, 1), 2, 2)
        y = lax.conv_general_dilated(
            y, w3, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
        return jnp.sum(y.astype(jnp.float32))

    x_nchw32 = jax.random.normal(ks[0], (1, 32, 256, 256), jnp.float32)
    ws_oihw32 = [
        jax.random.normal(ks[1], (256, 32, 3, 3), jnp.float32) * 0.05,
        jax.random.normal(ks[2], (256, 256, 3, 3), jnp.float32) * 0.02,
        jax.random.normal(ks[3], (128, 256, 3, 3), jnp.float32) * 0.02,
    ]

    def cast(tree, dt):
        return jax.tree_util.tree_map(lambda a: a.astype(dt), tree)

    for name, prec, dt in (
        ("f32 HIGHEST", jax.lax.Precision.HIGHEST, jnp.float32),
        ("f32 DEFAULT", jax.lax.Precision.DEFAULT, jnp.float32),
        ("bf16 HIGHEST", jax.lax.Precision.HIGHEST, jnp.bfloat16),
        ("bf16 DEFAULT", jax.lax.Precision.DEFAULT, jnp.bfloat16),
    ):
        x = x_nchw32.astype(dt)
        ws = cast(ws_oihw32, dt)
        fn = partial(stack_nchw, precision=prec)

        def fb(x, ws):
            return jnp.sum(jax.grad(lambda xx: fn(xx, ws))(x).astype(jnp.float32))

        bench_scan(f"stack NCHW {name} fwd+bwd", fb, x, ws)

    x_nhwc = jnp.transpose(x_nchw32, (0, 2, 3, 1)).astype(jnp.bfloat16)
    ws_hwio = [jnp.transpose(w, (2, 3, 1, 0)).astype(jnp.bfloat16) for w in ws_oihw32]
    fnh = partial(stack_nhwc, precision=jax.lax.Precision.DEFAULT)

    def fbh(x, ws):
        return jnp.sum(jax.grad(lambda xx: fnh(xx, ws))(x).astype(jnp.float32))

    bench_scan("stack NHWC bf16 DEFAULT fwd+bwd", fbh, x_nhwc, ws_hwio)


def main():
    print(f"devices: {jax.devices()}")
    layout_probe()
    sr_probe()
    lpips_probe()


if __name__ == "__main__":
    main()
