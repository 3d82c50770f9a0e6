"""Decompose the stage-2 RotBbox step cost by toggling loss branches.

Times the REAL tune while_loop (coaches._build_tune_fn) at two step
counts and reports the slope, for: recon-only (PTI), +rot, +depth, full.
Run on the real device: python tools/profile_tune.py
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from spi_tpu.criteria.lpips import LPIPS
from spi_tpu.models.triplane import ffhq512_128_config
from spi_tpu.training import coaches
from spi_tpu.utils.camera import canonical_camera

gen = ffhq512_128_config(compute_dtype="bfloat16")
key = jax.random.PRNGKey(0)
kg, kl, kt = jax.random.split(key, 3)
g_params = gen.init(kg)
lpips = LPIPS(compute_dtype="bfloat16")
lpips_params = lpips.init(kl)
target = jax.random.normal(kt, (1, 3, 512, 512), jnp.float32).clip(-1, 1)
camera = canonical_camera()
ws = jnp.zeros((1, gen.num_ws, gen.w_dim), jnp.float32)
rng = jax.random.PRNGKey(5)

VARIANTS = {
    "recon only (PTI)": dict(rot_lambda=0.0, mirror_rot_lambda=0.0, depth_lambda=0.0, tv_lambda=0.0),
    "recon + rot": dict(rot_lambda=0.1, mirror_rot_lambda=0.0, depth_lambda=0.0, tv_lambda=0.0),
    "recon + depth": dict(rot_lambda=0.0, mirror_rot_lambda=0.0, depth_lambda=1.0, tv_lambda=0.0),
    "full RotBbox (no mirror/cx)": dict(rot_lambda=0.1, mirror_rot_lambda=0.0, depth_lambda=1.0, tv_lambda=0.0),
}

def time_variant(name, kw):
    def run_n(n):
        s = coaches.CoachSettings(num_steps=n, lpips_threshold=-1.0, **kw)
        run = coaches._build_tune_fn(gen, lpips, s, None)
        out = run(g_params, g_params, lpips_params, None, target, camera, ws, None, None, rng)
        jax.block_until_ready(out[0])  # compile + run
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            out = run(g_params, g_params, lpips_params, None, target, camera, ws, None, None, rng)
            jax.block_until_ready(out[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)
    t1 = run_n(8)
    t2 = run_n(40)
    print(f"{name:32s} {(t2-t1)/32*1e3:8.1f} ms/step  (t8={t1:.2f}s t40={t2:.2f}s)", flush=True)

for name, kw in VARIANTS.items():
    time_variant(name, kw)
