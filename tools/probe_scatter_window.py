"""Prototype: windowed matmul scatter-add vs XLA scatter on the real chip.

The triplane backward's dominant cost is the scatter-add of per-point
row gradients into the 256^2 plane table (~16 ns/index measured in
round 1; tools/profile_gather.py). This probes an alternative that
exploits the render's structure: points arrive as (ray, sample) in
depth-sorted order, so a chunk of consecutive samples from a tile of
adjacent rays lands in a small 2D bounding WINDOW of plane texels. Per
chunk, a one-hot matmul (MXU) densifies the chunk's contribution over
its window, and one dynamic-slice read-modify-write accumulates the
window into the plane — turning millions of latency-bound scattered
rows into thousands of dense (win x win x C) block updates.

Chunks whose footprint exceeds the static window would need a residual
pass in production; the probe reports how often that happens for
realistic render geometry (frontal + surrounding cameras).

Run on the real TPU: python tools/probe_scatter_window.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


H = W = 256
C = 32
QUAD = 4 * C  # quad-row payload width


def xla_scatter(rows, upd):
    z = jnp.zeros((H * W, QUAD), jnp.float32)
    return z.at[rows].add(upd.astype(jnp.float32))


def windowed_scatter_2d(ys, xs, upd, chunk: int, win: int):
    """ys/xs: (P,) int32 texel coords, chunked so `chunk` consecutive
    points mostly share a (win x win) texel window. upd: (P, QUAD).
    Out-of-window contributions are DROPPED (probe only — production
    needs a residual pass); returns (plane (H, W, QUAD), n_dropped)."""
    p = ys.shape[0]
    nchunks = p // chunk
    ys_c = ys.reshape(nchunks, chunk)
    xs_c = xs.reshape(nchunks, chunk)
    upd_c = upd.reshape(nchunks, chunk, QUAD)

    y0 = jnp.clip(jnp.min(ys_c, axis=1), 0, H - win)
    x0 = jnp.clip(jnp.min(xs_c, axis=1), 0, W - win)
    ly = ys_c - y0[:, None]
    lx = xs_c - x0[:, None]
    ok = (ly >= 0) & (ly < win) & (lx >= 0) & (lx < win)
    dropped = jnp.sum(~ok)
    loc = jnp.clip(ly, 0, win - 1) * win + jnp.clip(lx, 0, win - 1)

    def body(plane, args):
        yy, xx, loc_c, u, ok_c = args
        oh = (
            (loc_c[None, :] == jnp.arange(win * win, dtype=loc_c.dtype)[:, None])
            & ok_c[None, :]
        ).astype(jnp.bfloat16)
        e = jax.lax.dot(oh, u.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        e = e.reshape(win, win, QUAD)
        cur = jax.lax.dynamic_slice(plane, (yy, xx, 0), (win, win, QUAD))
        return jax.lax.dynamic_update_slice(plane, cur + e, (yy, xx, 0)), None

    plane = jnp.zeros((H, W, QUAD), jnp.float32)
    plane, _ = jax.lax.scan(body, plane, (y0, x0, loc, upd_c, ok))
    return plane, dropped


def realistic_coords(n_cams=1, yaw=0.0, n_rays=128, s=48):
    """Plane-1 style (x, z) texel coords for an n_rays^2 x s-sample
    render, points ordered as (ray-tile 8x8) x (sample-group 8)."""
    from spi_tpu.models.rendering import sample_rays
    from spi_tpu.utils import camera as cam

    if yaw == 0.0:
        c = cam.canonical_camera()
    else:
        c = cam.sample_surrounding_camera(
            jax.random.PRNGKey(7), cam.canonical_camera(), batch_size=1,
            yaw_range=yaw, pitch_range=0.4,
        )
    cam2world = jnp.tile(c[:, :16].reshape(-1, 4, 4), (n_cams, 1, 1))
    intr = jnp.tile(c[:, 16:25].reshape(-1, 3, 3), (n_cams, 1, 1))
    ro, rd = sample_rays(cam2world, intr, n_rays)
    depths = jnp.linspace(2.25, 3.3, s)
    pts = ro[:, :, None, :] + depths[None, None, :, None] * rd[:, :, None, :]
    t = n_rays // 8
    pts = pts.reshape(n_cams, t, 8, t, 8, s, 3)
    pts = jnp.transpose(pts, (0, 1, 3, 5, 2, 4, 6))  # n, ty, tx, sgroups.., 3
    pts = pts.reshape(-1, 3)
    x, z = pts[:, 0] * 2.0, pts[:, 2] * 2.0
    fx = jnp.clip(((x + 1) * W - 1) * 0.5, 0, W - 1).astype(jnp.int32)
    fz = jnp.clip(((z + 1) * H - 1) * 0.5, 0, H - 1).astype(jnp.int32)
    return fz, fx


def bench(name, fn, *args, perturb_arg=0):
    from bench_util import bench_scan

    return bench_scan(name, fn, *args, perturb_arg=perturb_arg)


def main():
    key = jax.random.PRNGKey(0)

    for yaw in (0.0, 0.7):
        ys, xs = realistic_coords(yaw=yaw)
        p = ys.shape[0]
        rows = ys * W + xs
        print(f"--- yaw={yaw}, points={p}")
        ysn, xsn = np.asarray(ys), np.asarray(xs)
        for chunk in (512, 1024, 2048):
            nc = p // chunk
            yc = ysn.reshape(nc, chunk)
            xc = xsn.reshape(nc, chunk)
            span = np.maximum(yc.max(1) - yc.min(1), xc.max(1) - xc.min(1))
            print(f"  chunk={chunk:5d}: span p50={int(np.median(span))} "
                  f"p95={int(np.percentile(span, 95))} max={int(span.max())}")

        upd = jax.random.normal(key, (p, QUAD), jnp.bfloat16)
        bench(f"xla scatter yaw={yaw}", xla_scatter, rows, upd, perturb_arg=1)
        for chunk, win in ((512, 32), (1024, 32), (1024, 64), (2048, 64)):
            fn = lambda y, x, u, ch=chunk, wi=win: windowed_scatter_2d(y, x, u, ch, wi)[0]
            bench(f"win2d scatter chunk={chunk} win={win} yaw={yaw}", fn, ys, xs, upd, perturb_arg=2)
            ndrop = jax.jit(
                lambda y, x, u, ch=chunk, wi=win: windowed_scatter_2d(y, x, u, ch, wi)[1]
            )(ys, xs, upd)
            print(f"    dropped: {int(ndrop)}/{p} ({100*int(ndrop)/p:.2f}%)")

    # correctness on the frontal case, ignoring dropped points
    ys, xs = realistic_coords(yaw=0.0)
    rows = ys * W + xs
    upd = jax.random.normal(key, (ys.shape[0], QUAD), jnp.bfloat16)
    plane, ndrop = jax.jit(lambda y, x, u: windowed_scatter_2d(y, x, u, 1024, 64))(ys, xs, upd)
    ref = jax.jit(xla_scatter)(rows, upd).reshape(H, W, QUAD)
    if int(ndrop) == 0:
        err = float(jnp.max(jnp.abs(plane - ref)))
        rel = err / float(jnp.max(jnp.abs(ref)))
        print(f"max |xla - win2d| = {err:.4f} (rel {rel:.2e}, bf16 matmul accum)")
    else:
        print(f"correctness check skipped ({int(ndrop)} dropped)")


if __name__ == "__main__":
    main()
