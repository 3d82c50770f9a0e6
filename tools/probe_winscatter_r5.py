"""Round-5 windowed one-hot MXU scatter prototype (run on the real TPU).

The gather-VJP scatter-add costs ~15.6 ns/row with XLA's generic
scatter (12.1 ms per 786k-row plane-pass) and is ~60% of the stage-2
step. This prototypes the replacement: exploit the ray-tile structure
of the render points — a (16x16 ray, 8 sample) tile's bilinear
footprints land in a small plane window — and turn the scatter into
per-tile one-hot MXU matmuls accumulated into a VMEM-resident table
across Pallas' (sequential) grid:

  K1: (64, 64*C) windows, dynamic row+col offsets (8-aligned)
  K2: (256, 48*C) full-row strips, dynamic col offset only
      (for the z-row planes of the importance pass, where per-tile
      z-spans are unbounded)

Layout designed for lane efficiency:
  - per-point scalars ride the LANE axis: fyx (T, 8, P) f32 with row 0
    = window-relative fy, row 1 = window-relative fx (dead points: -10)
  - gf arrives transposed (T, C, P)
  - By(win_h, ps) and G2^T(winW*C, ps) are hat-function evaluations of
    broadcasted iotas minus the coordinate lane-vectors (the bilinear
    hat relu(1-|d|) reproduces zeros-padding/border semantics exactly)
  - dWd += By @ G2T contracted on the lane axis (MXU (M,K)x(N,K))

python tools/probe_winscatter_r5.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench_util import bench_scan

H = W = 256
C = 32
TILE_P = 2048  # 16x16 rays x 8 samples
PS = 256       # MXU sub-chunk of the point axis


def _make_kernel(win_h: int, win_w: int, ps: int, out_h: int, c: int):
    dyn_rows = win_h != out_h

    def kernel(off_ref, fyx_ref, gft_ref, out_ref, dwd_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        dwd_ref[:] = jnp.zeros_like(dwd_ref)

        p = gft_ref.shape[2]
        dt = gft_ref.dtype
        io_y = jax.lax.broadcasted_iota(jnp.int32, (win_h, ps), 0).astype(jnp.float32)
        x_of = (jax.lax.broadcasted_iota(jnp.int32, (win_w * c, ps), 0)
                // c).astype(jnp.float32)

        def sub(i, _):
            s = i * ps
            fy = fyx_ref[0, 0:1, pl.ds(s, ps)]     # (1, PS)
            fx = fyx_ref[0, 1:2, pl.ds(s, ps)]
            gf = gft_ref[0, :, pl.ds(s, ps)]       # (C, PS)

            by = jnp.maximum(1.0 - jnp.abs(io_y - fy), 0.0).astype(dt)
            bx = jnp.maximum(1.0 - jnp.abs(x_of - fx), 0.0).astype(dt)
            g2t = bx * pltpu.repeat(gf, win_w, axis=0)  # (winW*C, PS)
            dwd_ref[:] += jax.lax.dot_general(
                by, g2t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=(jax.lax.Precision.HIGHEST
                           if dt == jnp.float32
                           else jax.lax.Precision.DEFAULT),
            )
            return 0

        jax.lax.fori_loop(0, p // ps, sub, 0)

        ox = pl.multiple_of(off_ref[t, 1] * c, 128)
        if dyn_rows:
            oy = pl.multiple_of(off_ref[t, 0], 8)
            out_ref[pl.ds(oy, win_h), pl.ds(ox, win_w * c)] += dwd_ref[:]
        else:
            out_ref[:, pl.ds(ox, win_w * c)] += dwd_ref[:]

    return kernel


def win_scatter(offsets, fyx, gft, *, win_h, win_w, out_h, out_w=W, c=C,
                ps=PS, interpret=False):
    """offsets (T,2) i32 [oy, ox]; fyx (T,8,P) f32 window-relative
    continuous coords (row0 fy, row1 fx); gft (T,C,P) -> (out_h, W*C)
    f32 accumulated bilinear splats."""
    t, _, p = fyx.shape
    kernel = _make_kernel(win_h, win_w, ps, out_h, c)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_h, out_w * c), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t,),
            in_specs=[
                pl.BlockSpec((1, 8, p), lambda i, off: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, gft.shape[1], p), lambda i, off: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((out_h, out_w * c), lambda i, off: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((win_h, win_w * c), jnp.float32)],
        ),
        interpret=interpret,
    )(offsets, fyx, gft)


def make_inputs(key, n_tiles, win_h, win_w, spread_h, spread_w, dtype,
                tile_p=None):
    tile_p = tile_p or TILE_P
    ks = jax.random.split(key, 6)
    if win_h == H:
        oy = jnp.zeros((n_tiles,), jnp.int32)
    else:
        oy = jax.random.randint(ks[0], (n_tiles,), 0, (H - win_h) // 8 + 1) * 8
    ox = jax.random.randint(ks[1], (n_tiles,), 0, (W - win_w) // 8 + 1) * 8
    offsets = jnp.stack([oy, ox], axis=1).astype(jnp.int32)
    fy = jax.random.uniform(ks[2], (n_tiles, tile_p)) * spread_h
    fx = jax.random.uniform(ks[3], (n_tiles, tile_p)) * spread_w
    fyx = jnp.zeros((n_tiles, 8, tile_p), jnp.float32)
    fyx = fyx.at[:, 0, :].set(fy).at[:, 1, :].set(fx)
    gft = jax.random.normal(ks[4], (n_tiles, C, tile_p), dtype)
    return offsets, fyx, gft


def reference(offsets, fyx, gft):
    offsets, fyx, gft = (np.asarray(a) for a in (offsets, fyx, gft))
    n_tiles, _, tile_p = fyx.shape
    want = np.zeros((H, W, C), np.float64)
    for t in range(n_tiles):
        oy, ox = offsets[t]
        for p_i in range(tile_p):
            fy = fyx[t, 0, p_i] + oy
            fx = fyx[t, 1, p_i] + ox
            y0, x0 = int(np.floor(fy)), int(np.floor(fx))
            ty, tx = fy - y0, fx - x0
            g = gft[t, :, p_i].astype(np.float64)
            for (yy, wy) in ((y0, 1 - ty), (y0 + 1, ty)):
                for (xx, wx) in ((x0, 1 - tx), (x0 + 1, tx)):
                    if 0 <= yy < H and 0 <= xx < W and wy * wx > 0:
                        want[yy, xx] += wy * wx * g
    return want


def check_correctness(interpret):
    args = make_inputs(jax.random.PRNGKey(0), 4, 64, 64, 56, 56, jnp.float32,
                       tile_p=512)
    out = win_scatter(*args, win_h=64, win_w=64, out_h=H, interpret=interpret)
    want = reference(*args)
    got = np.asarray(out).reshape(H, W, C)
    err = np.abs(want - got).max()
    print(f"K1 max abs err vs numpy: {err:.2e} (scale {np.abs(want).max():.2e})")

    args = make_inputs(jax.random.PRNGKey(3), 4, H, 48, H - 2, 40,
                       jnp.float32, tile_p=512)
    out = win_scatter(*args, win_h=H, win_w=48, out_h=H, interpret=interpret)
    want = reference(*args)
    got = np.asarray(out).reshape(H, W, C)
    err = np.abs(want - got).max()
    print(f"K2 max abs err vs numpy: {err:.2e} (scale {np.abs(want).max():.2e})")


def main():
    print(f"devices: {jax.devices()}")
    interpret = jax.default_backend() != "tpu"
    check_correctness(interpret)
    if interpret:
        print("(CPU interpret mode: skipping perf)")
        return

    n_tiles = 384  # one 786k-point plane-pass
    for name, win_h, win_w, spread in (
        ("K1 64x64", 64, 64, 56),
        ("K1 64x32", 64, 32, 24),
        ("K2 256x48", H, 48, 40),
    ):
        args = make_inputs(jax.random.PRNGKey(1), n_tiles, win_h, win_w,
                           spread if win_h != H else H - 2, spread,
                           jnp.bfloat16)
        fn = functools.partial(win_scatter, win_h=win_h, win_w=win_w, out_h=H)
        t = bench_scan(f"{name} bf16 786k", fn, *args, perturb_arg=2)
        print(f"   -> {t / (n_tiles * TILE_P) * 1e9:.2f} ns/row "
              f"(XLA scatter baseline ~15.5)")


if __name__ == "__main__":
    main()
