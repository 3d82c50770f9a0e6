"""A/B the single-camera render policies on the real device.

Compares full-synthesis fwd+bwd across (chunked, remat) combinations to
pick the default for the stage-1/recon hot path. Not part of the suite.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def bench_scan(name, step_fn, carry, consts, n=20):
    scan = jax.jit(
        lambda c, k: jax.lax.scan(lambda cc, s: (step_fn(cc, s, k), 0.0), c,
                                  jnp.arange(n))[0]
    )
    t0 = time.time()
    out = scan(carry, consts)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    out = scan(carry, consts)
    jax.block_until_ready(out)
    per = (time.time() - t0) / n
    print(f"{name}: {per * 1e3:.1f} ms/step (compile {compile_s:.0f}s)", flush=True)
    return per


def main():
    from spi_tpu.models.rendering.renderer import RenderingOptions
    from spi_tpu.models.triplane import ffhq512_128_config

    from spi_tpu.utils.camera import canonical_camera

    key = jax.random.PRNGKey(0)
    c = canonical_camera()
    rng = jax.random.PRNGKey(1)

    variants = {
        "unchunked, no remat": dict(unchunked=True, remat=False),
        "chunked,   remat   ": dict(unchunked=False, remat=True),
        "chunked,   no remat": dict(unchunked=False, remat=False),
    }
    params = None
    for name, v in variants.items():
        gen = ffhq512_128_config(
            compute_dtype="bfloat16",
            remat_renderer=v["remat"],
            remat_sr=v["remat"],
            rendering=RenderingOptions(
                depth_resolution=48,
                depth_resolution_importance=48,
                ray_start=2.25,
                ray_end=3.3,
                unchunked_single_camera=v["unchunked"],
            ),
        )
        if params is None:
            params = gen.init(key)
        ws = jnp.zeros((1, gen.num_ws, gen.w_dim), jnp.float32)

        def synth_loss(p, c, gen=gen, ws=ws):
            return gen.synthesis(p, rng, ws, c, noise_mode="const")[
                "image"
            ].astype(jnp.float32).sum()

        def step(carry, s, consts, synth_loss=synth_loss):
            g = jax.grad(synth_loss)(carry, consts)
            return jax.tree_util.tree_map(lambda a, b: a - 0.0 * b, carry, g)

        bench_scan(f"synthesis fwd+bwd 1cam [{name}]", step, params, c)


if __name__ == "__main__":
    main()
