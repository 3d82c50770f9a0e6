"""Windowed bilinear splat: the triplane gather's backward, TPU-native.

The VJP of the triplane feature lookup must accumulate each sample
point's bilinear footprint into the plane gradient. XLA lowers that to
a generic scatter-add that costs ~15.6 ns per row on v5e — insensitive
to payload width, index locality, and OOB fraction (tools/
probe_scatter_r5*.py) — which made it ~60% of the SPI stage-2 tuning
step. There is no torch/CUDA counterpart to cite: the reference gets
this from cuDNN's grid_sampler backward
(eg3d/torch_utils/ops/grid_sample_gradfix.py:52-77).

This module replaces it with a Pallas kernel that exploits the render's
ray-tile structure: points from a (tile_v x tile_u ray, tile_s sample)
tile land in a small window of the plane, so the scatter becomes, per
tile, two bilinear one-hot evaluations and ONE MXU matmul accumulated
into a VMEM-resident output table across Pallas' sequential grid:

    By(win_h, ps)      = hat(iota_row - fy_lane)        VPU
    G2T(win_w*C, ps)   = hat(iota_row//C - fx_lane) * tile(gT)
    dWd(win_h, win_w*C) += By @ G2T^T                   MXU
    out[oy:, ox*C:]    += dWd     (8-aligned dynamic offsets)

where hat(d) = relu(1 - |d|) IS the bilinear kernel and reproduces the
zeros-padding/border semantics of ops.grid_sample exactly (a clamped
corner's weight collapses onto the surviving texel; fully out-of-range
points contribute nothing).

Measured on v5e (tools/probe_winscatter_r5.py): 3.4 ns/row for 64x64
windows, 5.3 ns/row for full-row strips — 3-4.5x over XLA's scatter,
with float32 exactness vs a float64 reference.

Two window modes cover the render's two passes:
  - K1 "local": (win, win) windows with dynamic row+col offsets; valid
    whenever the per-tile point spread is bounded (stratified/coarse
    depths, and the frontal plane of the importance pass).
  - K2 "strip": full-height rows x windowed cols (dynamic col offset
    only), for plane axes fed by the depth coordinate of IMPORTANCE
    samples, whose per-tile span is unbounded. The third plane reads
    (z, x) — depth on the lane axis — and is handled by running K2 on
    the transposed problem and transposing the (h, w, c) result back.

Exactness without shape games: offsets are computed from the per-tile
min of live points, and if ANY live footprint escapes its window
(extreme cameras), the whole plane-pass falls back to the plain XLA
4-corner scatter under a lax.cond — the result is always exact; only
the (rare) overflow case pays scatter cost.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PS = 256  # MXU sub-chunk of the tile point axis


@dataclasses.dataclass(frozen=True)
class RayGeom:
    """Static ray-bundle structure of one render pass.

    Points are ordered (view-major, then scanline rays, then samples):
    index = ((view * rays_h + vy) * rays_w + vx) * n_samples + s.
    `fine` marks importance-sampled depths (per-tile depth span
    unbounded -> strip windows for the depth-fed plane axes).
    """

    n_views: int
    rays_h: int
    rays_w: int
    n_samples: int
    fine: bool = False

    @property
    def n_points(self) -> int:
        return self.n_views * self.rays_h * self.rays_w * self.n_samples

    def tile_dims(self):
        """(tv, tu, ts) or None if no admissible tiling exists."""
        tv = min(16, self.rays_h)
        tu = min(16, self.rays_w)
        if self.rays_h % tv or self.rays_w % tu:
            return None
        for ts in (6, 8, 4, 3, 2, 1):
            if self.n_samples % ts == 0 and (tv * tu * ts) % _PS == 0:
                return tv, tu, ts
        return None


def geom_supported(geom, h: int, w: int, n_points: int) -> bool:
    """Static check: can the windowed splat serve this pass?"""
    if geom is None or h != 256 or w != 256:
        return False
    if geom.n_points != n_points:
        return False
    return geom.tile_dims() is not None


# ---------------------------------------------------------------------------
# Pallas kernel


def _splat_kernel(win_h: int, win_w: int, ps: int, out_h: int, c: int):
    dyn_rows = win_h != out_h

    def kernel(off_ref, fyx_ref, gft_ref, out_ref, dwd_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        dwd_ref[:] = jnp.zeros_like(dwd_ref)

        p = gft_ref.shape[2]
        dt = gft_ref.dtype
        io_y = jax.lax.broadcasted_iota(jnp.int32, (win_h, ps), 0).astype(
            jnp.float32
        )
        x_of = (
            jax.lax.broadcasted_iota(jnp.int32, (win_w * c, ps), 0) // c
        ).astype(jnp.float32)

        def sub(i, _):
            s = i * ps
            fy = fyx_ref[0, 0:1, pl.ds(s, ps)]  # (1, PS)
            fx = fyx_ref[0, 1:2, pl.ds(s, ps)]
            gf = gft_ref[0, :, pl.ds(s, ps)]  # (C, PS)

            by = jnp.maximum(1.0 - jnp.abs(io_y - fy), 0.0).astype(dt)
            bx = jnp.maximum(1.0 - jnp.abs(x_of - fx), 0.0).astype(dt)
            g2t = bx * pltpu.repeat(gf, win_w, axis=0)  # (winW*C, PS)
            dwd_ref[:] += jax.lax.dot_general(
                by,
                g2t,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                # bf16 hits the single-pass MXU either way; f32 (tests)
                # must not silently downcast to bf16 passes.
                precision=(
                    jax.lax.Precision.HIGHEST
                    if dt == jnp.float32
                    else jax.lax.Precision.DEFAULT
                ),
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


def _splat_pallas(offsets, fyx, gft, *, win_h, win_w, out_h, out_w,
                  interpret=False):
    """offsets (T, 2) i32 [oy, ox]; fyx (T, 8, P) f32 window-relative
    continuous coords (row 0 = fy, row 1 = fx; dead points < -1); gft
    (T, C, P) cotangents -> (out_h, out_w * C) f32 splat table."""
    t, _, p = fyx.shape
    c = gft.shape[1]
    kernel = _splat_kernel(win_h, win_w, _PS, out_h, c)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_h, out_w * c), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t,),
            in_specs=[
                pl.BlockSpec((1, 8, p), lambda i, off: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c, p), lambda i, off: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((out_h, out_w * c), lambda i, off: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((win_h, win_w * c), jnp.float32)],
        ),
        interpret=interpret,
    )(offsets, fyx, gft)


# ---------------------------------------------------------------------------
# XLA fallback (exact, scatter-based; taken only on window overflow)


def _splat_xla(fy, fx, g, h: int, w: int):
    """Plain 4-corner scatter-add splat. fy/fx (P,) f32 absolute texel
    coords; g (P, C) -> (h * w, C) f32."""
    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    ty = fy - y0
    tx = fx - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    out = jnp.zeros((h * w, g.shape[-1]), jnp.float32)
    gf = g.astype(jnp.float32)
    for dy, wy in ((0, 1.0 - ty), (1, ty)):
        for dx, wx in ((0, 1.0 - tx), (1, tx)):
            yy = y0 + dy
            xx = x0 + dx
            valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            idx = jnp.where(valid, yy * w + xx, h * w)  # OOB -> dropped
            out = out.at[idx].add((wy * wx)[:, None] * gf, mode="drop")
    return out


# ---------------------------------------------------------------------------
# Per-plane driver


def _align_down(v, m):
    return (v // m) * m


def _window_offsets(f, lo_ok, win: int, size: int, align: int = 8):
    """Per-tile window offsets along one axis + overflow flag.

    f: (T, P) absolute texel coords; lo_ok: (T, P) live mask.
    Returns offsets (T,) i32 and per-tile overflow (T,) bool.
    """
    lo = jnp.maximum(jnp.floor(f), 0.0)
    hi = jnp.minimum(jnp.floor(f) + 1.0, size - 1.0)
    big = jnp.float32(2 * size)
    lo_masked = jnp.where(lo_ok, lo, big)
    hi_masked = jnp.where(lo_ok, hi, -big)
    o = jnp.clip(
        _align_down(jnp.min(lo_masked, axis=1).astype(jnp.int32), align),
        0,
        size - win,
    )
    ovf = jnp.max(hi_masked, axis=1) > (o + win - 1).astype(jnp.float32)
    return o, ovf


def windowed_splat(fy_t, fx_t, g_t, h: int, w: int, *, win_h: int,
                   win_w: int, strip_rows: bool, interpret=False):
    """One plane-pass splat with window/strip kernel + overflow fallback.

    fy_t/fx_t: (T, P) absolute texel coords, tile-ordered; g_t:
    (T, P, C) cotangents. Returns (h * w, C) f32.
    """
    t, p = fy_t.shape
    c = g_t.shape[-1]
    live = (fy_t > -1) & (fy_t < h) & (fx_t > -1) & (fx_t < w)

    if strip_rows:
        oy = jnp.zeros((t,), jnp.int32)
        ovf_y = jnp.zeros((t,), bool)
        eff_win_h = h
    else:
        oy, ovf_y = _window_offsets(fy_t, live, win_h, h)
        eff_win_h = win_h
    # The kernel's dynamic lane offset is ox*C, which Mosaic requires to
    # be 128-aligned; sublane (row) offsets need 8-alignment.
    ox, ovf_x = _window_offsets(fx_t, live, win_w, w,
                                align=max(8, 128 // c))
    overflow = jnp.any(ovf_y | ovf_x)
    import os

    if os.environ.get("SPI_SPLAT_DEBUG"):
        jax.debug.print(
            "plane_splat overflow={o} (strip={s} win=({wh},{ww}) tiles={t})",
            o=overflow, s=strip_rows, wh=eff_win_h, ww=win_w, t=t,
        )

    dead = jnp.float32(-10.0)
    fyw = jnp.where(live, fy_t - oy[:, None].astype(jnp.float32), dead)
    fxw = jnp.where(live, fx_t - ox[:, None].astype(jnp.float32), dead)
    fyx = jnp.zeros((t, 8, p), jnp.float32)
    fyx = fyx.at[:, 0, :].set(fyw).at[:, 1, :].set(fxw)
    offsets = jnp.stack([oy, ox], axis=1)
    gft = jnp.swapaxes(g_t, 1, 2)  # (T, C, P)

    def fast(args):
        offsets, fyx, gft, _fy, _fx, _g = args
        out = _splat_pallas(
            offsets, fyx, gft, win_h=eff_win_h, win_w=win_w, out_h=h,
            out_w=w, interpret=interpret,
        )
        return out.reshape(h * w, gft.shape[1])

    def slow(args):
        _offsets, _fyx, _gft, fy, fx, g = args
        return _splat_xla(fy.reshape(-1), fx.reshape(-1),
                          g.reshape(-1, g.shape[-1]), h, w)

    return jax.lax.cond(
        overflow, slow, fast, (offsets, fyx, gft, fy_t, fx_t, g_t)
    )


def tile_order(x, geom: RayGeom, tv: int, tu: int, ts: int):
    """Reorder a point-major array (Ptot, ...) into (T, P, ...) tiles."""
    nv, rh, rw, s = geom.n_views, geom.rays_h, geom.rays_w, geom.n_samples
    rest = x.shape[1:]
    x = x.reshape(nv, rh // tv, tv, rw // tu, tu, s // ts, ts, *rest)
    x = jnp.moveaxis(x, (2, 4, 6), (4, 5, 6))  # (nv, RH, RW, S, tv, tu, ts)
    return x.reshape(nv * (rh // tv) * (rw // tu) * (s // ts),
                     tv * tu * ts, *rest)


def splat_planes(grids, g, geom: RayGeom, h: int, w: int, interpret=False):
    """d_planes for the triplane gather: (1, 3, P, 2) texel-space grids +
    (1, 3, P, C) cotangents -> (1, 3, h * w, C) f32.

    grids carry CONTINUOUS texel coords (fx, fy) per plane (the
    align_corners=False mapping applied by the caller). Plane axis
    order follows renderer.project_onto_planes: plane 0 (x, y),
    plane 1 (x, z), plane 2 (z, x).
    """
    tv, tu, ts = geom.tile_dims()
    c = g.shape[-1]
    outs = []
    for p_i in range(3):
        fx = tile_order(grids[0, p_i, :, 0], geom, tv, tu, ts)
        fy = tile_order(grids[0, p_i, :, 1], geom, tv, tu, ts)
        g_t = tile_order(g[0, p_i], geom, tv, tu, ts)
        if not geom.fine or p_i == 0:
            out = windowed_splat(fy, fx, g_t, h, w, win_h=64, win_w=64,
                                 strip_rows=False, interpret=interpret)
        elif p_i == 1:
            # rows <- z (importance depths: unbounded tile span) -> strip
            out = windowed_splat(fy, fx, g_t, h, w, win_h=h, win_w=48,
                                 strip_rows=True, interpret=interpret)
        else:
            # plane 2 reads (z, x): depth on the LANE axis. Solve the
            # transposed problem (rows <- z strip, cols <- x window) and
            # transpose the (h, w, c) table back.
            out = windowed_splat(fx, fy, g_t, w, h, win_h=w, win_w=48,
                                 strip_rows=True, interpret=interpret)
            out = jnp.swapaxes(out.reshape(w, h, c), 0, 1).reshape(h * w, c)
        outs.append(out)
    return jnp.stack(outs, axis=0)[None]
