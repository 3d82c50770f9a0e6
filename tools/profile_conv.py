"""Locate the conv-path slowness: raw conv benchmarks across layouts,
dtypes, and the ops-layer wrappers (conv2d_resample, upfirdn2d,
modulated conv) at SR/LPIPS-like shapes."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def bench(name, fn, *args, n=None):
    # Per-call wall timing measures mostly axon-tunnel transport
    # (~80-90 ms/program); delegate to the scan-slope timer.
    from bench_util import bench_scan

    return bench_scan(name, fn, *args)


def conv_nchw(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )


def conv_nhwc(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)

    for res, ci, co in [(256, 128, 128), (512, 128, 64), (256, 64, 64)]:
        gflop = 2 * 9 * ci * co * res * res / 1e9
        for dt in (jnp.float32, jnp.bfloat16):
            x = jax.random.normal(k1, (1, ci, res, res), dt)
            w = jax.random.normal(k2, (co, ci, 3, 3), dt)
            t = bench(f"conv NCHW {res}^2 {ci}->{co} {dt.__name__} ({gflop:.1f} GF)",
                      conv_nchw, x, w)
            xh = jnp.transpose(x, (0, 2, 3, 1))
            wh = jnp.transpose(w, (2, 3, 1, 0))
            t2 = bench(f"conv NHWC {res}^2 {ci}->{co} {dt.__name__}", conv_nhwc, xh, wh)

    # ops-layer pieces at SR shapes
    from spi_tpu.ops import bias_act, conv2d_resample, setup_filter, upsample2d

    f = setup_filter([1, 3, 3, 1])
    x = jax.random.normal(k1, (1, 128, 256, 256), jnp.bfloat16)
    w = jax.random.normal(k2, (128, 128, 3, 3), jnp.bfloat16)
    bench("conv2d_resample up=1 256^2 128ch bf16", conv2d_resample, x, w)
    bench("conv2d_resample up=2 256^2 128ch bf16",
          lambda x, w: conv2d_resample(x, w, f=f, up=2, padding=1), x, w)
    bench("upsample2d 256->512 128ch bf16", lambda x: upsample2d(x, f), x)
    bench("bias_act lrelu 512^2 64ch bf16",
          lambda x, b: bias_act(x, b, act="lrelu"),
          jax.random.normal(k1, (1, 64, 512, 512), jnp.bfloat16),
          jnp.zeros((64,), jnp.bfloat16))

    # full SR synthesis-layer analog: modulated_conv2d
    from spi_tpu.models.stylegan2 import modulated_conv2d

    styles = jax.random.normal(k2, (1, 128), jnp.float32)
    bench("modulated_conv2d 256^2 128ch bf16",
          lambda x, w, s: modulated_conv2d(x, w, s, padding=1), x, w, styles)
    bench("modulated_conv2d up=2 256^2 128ch bf16",
          lambda x, w, s: modulated_conv2d(x, w, s, up=2, padding=1,
                                           resample_filter=f, flip_weight=False),
          x, w, styles)


if __name__ == "__main__":
    main()
