"""Lean on-device probe of the two hottest programs.

Times (a) full 1-camera synthesis fwd+bwd (the stage-1/stage-2 recon
core) and (b) the same plus LPIPS with precomputed target features —
used to validate the unchunked single-camera render path and the
loop-invariant target-feature hoist. Much faster to compile than
tools/profile_step.py; not part of the test suite.
"""

from __future__ import annotations

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
    from spi_tpu.criteria.lpips import LPIPS
    from spi_tpu.models.triplane import ffhq512_128_config
    from spi_tpu.utils.camera import canonical_camera

    gen = ffhq512_128_config(compute_dtype="bfloat16")
    key = jax.random.PRNGKey(0)
    params = gen.init(key)
    ws = jnp.zeros((1, gen.num_ws, gen.w_dim), jnp.float32)
    c = canonical_camera()
    rng = jax.random.PRNGKey(1)

    lp = LPIPS(compute_dtype="bfloat16")
    lpp = lp.init(jax.random.PRNGKey(3))
    tgt = jnp.zeros((1, 3, 512, 512), jnp.float32)

    # (a) synthesis fwd+bwd wrt G params, 1 camera
    def synth_loss(p, c):
        return gen.synthesis(p, rng, ws, c, noise_mode="const")["image"].astype(
            jnp.float32
        ).sum()

    def step_a(carry, s, consts):
        p = carry
        g = jax.grad(synth_loss)(p, consts)
        return jax.tree_util.tree_map(lambda a, b: a - 0.0 * b, p, g)

    bench_scan("synthesis fwd+bwd (1 cam)", step_a, params, c)

    # (b) synthesis + LPIPS(precomputed target feats) fwd+bwd
    tf = lp.features(lpp, tgt)

    def full_loss(p, consts):
        c, lpp, tf, tgt = consts
        img = gen.synthesis(p, rng, ws, c, noise_mode="const")["image"]
        return lp(lpp, img, tgt, y_feats=tf)

    def step_b(carry, s, consts):
        p = carry
        g = jax.grad(full_loss)(p, consts)
        return jax.tree_util.tree_map(lambda a, b: a - 0.0 * b, p, g)

    bench_scan("synth+LPIPS(pre-feats) fwd+bwd", step_b, params, (c, lpp, tf, tgt))

    # (c) same but recomputing target features per step (old behavior)
    def full_loss_old(p, consts):
        c, lpp, tgt = consts
        img = gen.synthesis(p, rng, ws, c, noise_mode="const")["image"]
        return lp(lpp, img, tgt)

    def step_c(carry, s, consts):
        p = carry
        g = jax.grad(full_loss_old)(p, consts)
        return jax.tree_util.tree_map(lambda a, b: a - 0.0 * b, p, g)

    bench_scan("synth+LPIPS(per-step feats) fwd+bwd", step_c, params, (c, lpp, tgt))


if __name__ == "__main__":
    main()
