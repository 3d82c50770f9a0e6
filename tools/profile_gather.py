"""Microbenchmarks for the triplane gather path on the real device.

Quantifies: quad-row gather fwd, its VJP (scatter-add backward), the
4-corner variant, and a Pallas dynamic_gather feasibility probe —
the data that decides whether a custom kernel can beat XLA's gather.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def bench(name, fn, *args, n=None):
    # Per-call wall timing measures mostly axon-tunnel transport
    # (~80-90 ms/program); delegate to the scan-slope timer.
    from bench_util import bench_scan

    return bench_scan(name, fn, *args)


def main():
    from spi_tpu.ops.grid_sample import grid_sample_nhwc, quad_sample_nhwc

    h = w = 256
    c = 32
    p = 16384 * 48  # one render pass
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    table = jax.random.normal(k1, (1, h * w, c), jnp.bfloat16)
    coords = jax.random.uniform(k2, (1, p, 2), jnp.float32, -1.0, 1.0)

    bench("quad_sample fwd (786k pts, 1 plane)", quad_sample_nhwc, table, coords, h, w)
    bench("4-corner sample fwd", grid_sample_nhwc, table, coords, h, w)

    def vjp_table(tab, co):
        out, pull = jax.vjp(lambda t: quad_sample_nhwc(t, co, h, w), tab)
        return pull(jnp.ones_like(out))[0]

    bench("quad_sample bwd wrt table (scatter)", vjp_table, table, coords)

    def vjp_both(tab, co):
        out, pull = jax.vjp(lambda t, cc: quad_sample_nhwc(t, cc, h, w), tab, co)
        return pull(jnp.ones_like(out))

    bench("quad_sample bwd wrt table+coords", vjp_both, table, coords)

    def vjp4_table(tab, co):
        out, pull = jax.vjp(lambda t: grid_sample_nhwc(t, co, h, w), tab)
        return pull(jnp.ones_like(out))[0]

    bench("4-corner bwd wrt table (scatter)", vjp4_table, table, coords)

    # raw take_along_axis row gather, quad width
    quad = jax.random.normal(k1, (h * w, 4 * c), jnp.bfloat16)
    rows = jax.random.randint(k2, (p,), 0, h * w)

    def take(qt, r):
        return jnp.take(qt, r, axis=0)

    bench("raw take 786k rows of 128 bf16", take, quad, rows)

    # raw scatter-add of 786k 128-wide rows into 65536
    upd = jax.random.normal(k1, (p, 4 * c), jnp.bfloat16)

    def scat(r, u):
        z = jnp.zeros((h * w, 4 * c), jnp.float32)
        return z.at[r].add(u.astype(jnp.float32))

    bench("raw scatter-add 786k rows -> 65536", scat, rows, upd)

    def scat_bf16(r, u):
        z = jnp.zeros((h * w, 4 * c), jnp.bfloat16)
        return z.at[r].add(u)

    bench("raw scatter-add bf16 accum", scat_bf16, rows, upd)

    # sorted variant: does indices_are_sorted change gather speed?
    rows_sorted = jnp.sort(rows)
    bench("raw take, sorted rows", take, quad, rows_sorted)

    def scat_sorted(r, u):
        z = jnp.zeros((h * w, 4 * c), jnp.float32)
        return z.at[r].add(u.astype(jnp.float32), indices_are_sorted=True)

    bench("raw scatter-add, sorted rows", scat_sorted, rows_sorted, upd)

    # segment_sum formulation of the scatter
    def seg(r, u):
        return jax.ops.segment_sum(
            u.astype(jnp.float32), r, num_segments=h * w,
            indices_are_sorted=False,
        )

    bench("segment_sum 786k -> 65536", seg, rows, upd)

    # --- Pallas dynamic_gather probe -------------------------------------
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        tile = 65536  # out shape must equal table shape for Mosaic gather

        def gather_kernel(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

        def pallas_gather(tab, idx2d):
            return pl.pallas_call(
                gather_kernel,
                out_shape=jax.ShapeDtypeStruct(tab.shape, tab.dtype),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(tab, idx2d)

        tab32 = jax.random.normal(k1, (tile, c), jnp.float32)
        idx2d = jnp.broadcast_to(
            jax.random.randint(k2, (tile, 1), 0, tile), (tile, c)
        )
        bench("pallas dynamic_gather 65536x32 f32", pallas_gather, tab32, idx2d)
    except Exception as e:  # noqa: BLE001
        print("pallas dynamic_gather probe FAILED:", repr(e)[:300])


if __name__ == "__main__":
    main()
