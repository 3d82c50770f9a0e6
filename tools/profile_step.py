"""Component-level timing of the SPI hot path on the real device.

Times fwd and fwd+bwd of: backbone synthesis (planes), volume render
(gather+MLP+march) at 128^2, superresolution, LPIPS — the pieces of one
stage-2 step — to locate the wall-clock. Not part of the test suite.
"""

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


def main():
    from spi_tpu.criteria.lpips import LPIPS
    from spi_tpu.models.triplane import ffhq512_128_config
    from spi_tpu.utils.camera import canonical_camera

    gen = ffhq512_128_config(compute_dtype="bfloat16")
    key = jax.random.PRNGKey(0)
    params = gen.init(key)
    ws = jnp.zeros((1, gen.num_ws, gen.w_dim), jnp.float32)
    c = canonical_camera()
    rng = jax.random.PRNGKey(1)

    # planes
    def planes_fn(p, ws):
        return gen._planes_nhwc(p, ws)

    planes = jax.jit(planes_fn)(params, ws)
    bench("backbone planes fwd", planes_fn, params, ws)
    bench(
        "backbone planes fwd+bwd",
        lambda p, w: jax.grad(lambda p, w: planes_fn(p, w).astype(jnp.float32).sum())(p, w),
        params,
        ws,
    )

    # render at 128^2 from fixed planes
    from spi_tpu.models.rendering import sample_rays

    def render_fn(planes, dec_params, c):
        cam2world = c[:, :16].reshape(-1, 4, 4)
        intrinsics = c[:, 16:25].reshape(-1, 3, 3)
        ro, rd = sample_rays(cam2world, intrinsics, gen.neural_rendering_resolution)
        rgb, depth, wsum = gen.renderer(
            jax.random.PRNGKey(2),
            planes,
            lambda f, d: gen.decoder(dec_params, f, d),
            ro,
            rd,
        )
        return rgb

    dec_params = params["decoder"]
    bench("render 128^2 fwd", render_fn, planes, dec_params, c)
    bench(
        "render 128^2 fwd+bwd",
        lambda pl, dp, c: jax.grad(
            lambda pl, dp: render_fn(pl, dp, c).astype(jnp.float32).sum()
        )(pl, dp),
        planes,
        dec_params,
        c,
    )

    # full synthesis
    def synth_fn(p, ws, c):
        return gen.synthesis(p, rng, ws, c)["image"]

    img = jax.jit(synth_fn)(params, ws, c)
    bench("full synthesis fwd", synth_fn, params, ws, c)
    bench(
        "full synthesis fwd+bwd",
        lambda p, w, c: jax.grad(
            lambda p: synth_fn(p, w, c).astype(jnp.float32).sum()
        )(p),
        params,
        ws,
        c,
    )

    # superresolution only
    feat = jnp.zeros((1, 32, 128, 128), jnp.bfloat16)
    raw = jnp.zeros((1, 3, 128, 128), jnp.bfloat16)

    def sr_fn(p, raw, feat, ws):
        return gen.superresolution(p["superresolution"], raw, feat, ws)

    bench("superres fwd", sr_fn, params, raw, feat, ws)
    bench(
        "superres fwd+bwd",
        lambda p, r, f, w: jax.grad(
            lambda p: sr_fn(p, r, f, w).astype(jnp.float32).sum()
        )(p),
        params,
        raw,
        feat,
        ws,
    )

    # LPIPS
    lp = LPIPS()
    lpp = lp.init(jax.random.PRNGKey(3))
    tgt = jnp.zeros((1, 3, 512, 512), jnp.float32)
    bench("lpips fwd", lambda a, b: lp(lpp, a, b), img, tgt)
    bench(
        "lpips(synth) fwd+bwd",
        lambda p, w, c, t: jax.grad(
            lambda p: lp(lpp, synth_fn(p, w, c), t).sum()
        )(p),
        params,
        ws,
        c,
        tgt,
    )


if __name__ == "__main__":
    main()
