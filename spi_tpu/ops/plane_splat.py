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

All three planes run through ONE kernel invocation (grid 3T with
per-plane output blocks — the per-call glue measured larger than the
kernel). The depth coordinate spreads furthest per tile, so it is
always mapped to the window ROW axis: plane 2 reads (z, x) with depth
on the lane axis and is solved TRANSPOSED, its table transposed back.
Coarse (stratified) passes use (64, 64) windows; importance passes
need ts=3 tiles and (112, 64) windows, which on v5e costs the whole
win back — the renderer keeps the XLA scatter for fine passes (the
fine support here stays for configs whose densities concentrate).

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
        """(tv, tu, ts) or None if no admissible tiling exists.

        Fine passes group fewer consecutive samples per tile (ts=3):
        importance depths are sorted per ray but spread with the sample
        count, and halving the group keeps the depth-axis span inside
        the widened 96-texel windows (splat_planes)."""
        tv = min(16, self.rays_h)
        tu = min(16, self.rays_w)
        if self.rays_h % tv or self.rays_w % tu:
            return None
        prefs = (3, 6, 4, 2, 8, 1) if self.fine else (6, 8, 4, 3, 2, 1)
        for ts in prefs:
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


def _splat_kernel(win_h: int, win_w: int, ps: int, out_h: int, c: int,
                  tiles_per_table: int):
    dyn_rows = win_h != out_h

    def kernel(off_ref, fyx_ref, gf_ref, out_ref, dwd_ref):
        t = pl.program_id(0)

        # One grid covers all tables (planes) back-to-back; the output
        # block index_map switches tables at multiples of
        # tiles_per_table, where the fresh block is zero-initialized.
        @pl.when(t % tiles_per_table == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        dwd_ref[:] = jnp.zeros_like(dwd_ref)

        p = gf_ref.shape[1]
        dt = gf_ref.dtype
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
            # gf arrives in its NATURAL (P, C) order; the (PS, C) ->
            # (C, PS) flip happens here as a 16 KB in-VMEM shuffle. An
            # XLA-side (T,P,C)->(T,C,P) relayout costs ~4 ms per
            # plane-pass — several times the whole kernel (measured).
            gf = jnp.swapaxes(gf_ref[0, pl.ds(s, ps), :], 0, 1)  # (C, PS)

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

        ox = pl.multiple_of(off_ref[1, t] * c, 128)
        if dyn_rows:
            oy = pl.multiple_of(off_ref[0, t], 8)
            out_ref[0, pl.ds(oy, win_h), pl.ds(ox, win_w * c)] += dwd_ref[:]
        else:
            out_ref[0, :, pl.ds(ox, win_w * c)] += dwd_ref[:]

    return kernel


def _splat_pallas(offsets, fyx, gf_t, *, win_h, win_w, out_h, out_w,
                  n_tables=1, interpret=False):
    """offsets (2, T) i32 [oy; ox] (T on the minor axis: SMEM pads the
    minor dimension to 128 lanes, so (T, 2) would cost T*512 bytes and
    blow the 1 MB SMEM for fine-pass tile counts); fyx (T, 8, P) f32 window-relative
    continuous coords (row 0 = fy, row 1 = fx; dead points < -1); gf_t
    (T, P, C) cotangents (natural point-major order) -> (n_tables,
    out_h, out_w * C) f32 splat tables. T covers all tables
    back-to-back (T % n_tables == 0)."""
    t, _, p = fyx.shape
    c = gf_t.shape[2]
    tpt = t // n_tables
    # Largest 128-multiple sub-chunk dividing P (<= 512): bigger K per
    # MXU call and fewer dwd read-modify-write passes (the dwd VMEM
    # traffic, not the matmul, bounds small-sub-chunk configs).
    ps = _PS
    for cand in (512, 384, 256, 128):
        if p % cand == 0:
            ps = cand
            break
    kernel = _splat_kernel(win_h, win_w, ps, out_h, c, tpt)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tables, out_h, out_w * c),
                                       jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t,),
            in_specs=[
                pl.BlockSpec((1, 8, p), lambda i, off: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p, c), lambda i, off: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, out_h, out_w * c),
                lambda i, off: (i // tpt, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((win_h, win_w * c), jnp.float32)],
        ),
        interpret=interpret,
    )(offsets, fyx, gf_t)


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
                   win_w: int, n_tables: int = 1, interpret=False):
    """Multi-table windowed splat with overflow fallback.

    fy_t/fx_t: (T, P) absolute texel coords, tile-ordered, T covering
    all `n_tables` tables back-to-back; g_t: (T, P, C) cotangents.
    Returns (n_tables, h * w, C) f32.
    """
    t, p = fy_t.shape
    c = g_t.shape[-1]
    tpt = t // n_tables
    live = (fy_t > -1) & (fy_t < h) & (fx_t > -1) & (fx_t < w)

    oy, ovf_y = _window_offsets(fy_t, live, win_h, h)
    # The kernel's dynamic lane offset is ox*C, which Mosaic requires to
    # be 128-aligned; sublane (row) offsets need 8-alignment.
    ox, ovf_x = _window_offsets(fx_t, live, win_w, w,
                                align=max(8, 128 // c))
    overflow = jnp.any(ovf_y | ovf_x)

    dead = jnp.float32(-10.0)
    fyw = jnp.where(live, fy_t - oy[:, None].astype(jnp.float32), dead)
    fxw = jnp.where(live, fx_t - ox[:, None].astype(jnp.float32), dead)
    # (T, 8, P): minor axis stays the point axis — a cheap, layout-
    # friendly stack (XLA keeps row-major; no relayout before the
    # kernel).
    fyx = jnp.stack(
        [fyw, fxw] + [jnp.zeros_like(fyw)] * 6, axis=1
    )
    offsets = jnp.stack([oy, ox], axis=0)  # (2, T): see _splat_pallas

    def fast(args):
        offsets, fyx, g_t, _fy, _fx = args
        out = _splat_pallas(
            offsets, fyx, g_t, win_h=win_h, win_w=win_w, out_h=h,
            out_w=w, n_tables=n_tables, interpret=interpret,
        )
        return out.reshape(n_tables, h * w, c)

    def slow(args):
        _offsets, _fyx, g, fy, fx = args
        outs = [
            _splat_xla(
                fy[k * tpt:(k + 1) * tpt].reshape(-1),
                fx[k * tpt:(k + 1) * tpt].reshape(-1),
                g[k * tpt:(k + 1) * tpt].reshape(-1, c), h, w,
            )
            for k in range(n_tables)
        ]
        return jnp.stack(outs, axis=0)

    import os

    _dbg = os.environ.get("SPI_SPLAT_DEBUG_PATH", "")
    args = (offsets, fyx, g_t, fy_t, fx_t)
    if _dbg == "nofallback":  # perf bisection only
        return fast(args)
    if _dbg == "nokernel":  # perf bisection only: marshaling cost alone
        return jnp.zeros((n_tables, h * w, c), jnp.float32) + jnp.float32(
            jnp.sum(offsets)
        ) * 0.0 + fyx[0, 0, 0] * 0.0 + g_t[0, 0, 0].astype(jnp.float32) * 0.0
    return jax.lax.cond(overflow, slow, fast, args)


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
    align_corners=False mapping applied by the caller). All three
    planes run through ONE kernel invocation (grid 3T, per-plane
    output blocks): the per-call glue (cond operands, barrier, kernel
    launch) measured larger than the kernel itself, so it is paid once.

    Window geometry: the depth coordinate spreads furthest per tile, so
    it is always mapped to the ROW axis — plane 2 reads (z, x) with z
    on the lane axis and is therefore solved TRANSPOSED (rows <- z)
    and its table transposed back. Coarse passes use (64, 64) windows;
    fine passes use ts=3 tiles (tile_dims) with (112, 64) windows — a
    sorted-uniform depth group escaping 112 texels is ~1e-6 per tile,
    and the lax.cond scatter fallback keeps those exact.
    """
    tv, tu, ts = geom.tile_dims()
    c = g.shape[-1]
    win_h, win_w = (112, 64) if geom.fine else (64, 64)
    geom3 = RayGeom(3 * geom.n_views, geom.rays_h, geom.rays_w,
                    geom.n_samples, geom.fine)
    # Per-plane (fx, fy) with plane 2 swapped (transposed problem).
    fx_all = jnp.concatenate(
        [grids[0, 0, :, 0], grids[0, 1, :, 0], grids[0, 2, :, 1]]
    )
    fy_all = jnp.concatenate(
        [grids[0, 0, :, 1], grids[0, 1, :, 1], grids[0, 2, :, 0]]
    )
    fx = tile_order(fx_all, geom3, tv, tu, ts)
    fy = tile_order(fy_all, geom3, tv, tu, ts)
    g_t = tile_order(g[0].reshape(-1, c), geom3, tv, tu, ts)
    # Materialize the tile reorder in canonical layout before the
    # kernel: letting XLA fuse the 7-D tile_order transpose into the
    # splat's consumers costs ~6 ms per plane-pass (strided access in
    # every consumer); behind a barrier the windowed splat runs at its
    # standalone speed (measured, v5e).
    fy, fx, g_t = jax.lax.optimization_barrier((fy, fx, g_t))
    out = windowed_splat(fy, fx, g_t, h, w, win_h=win_h, win_w=win_w,
                         n_tables=3, interpret=interpret)
    # un-transpose plane 2's table (rows were z, cols x_world)
    p2 = jnp.swapaxes(out[2].reshape(w, h, c), 0, 1).reshape(h * w, c)
    return jnp.stack([out[0], out[1], p2], axis=0)[None]
