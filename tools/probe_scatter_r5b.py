"""Round-5 scatter probes, part 2.

Part 1 (probe_scatter_r5.py) established: XLA scatter costs ~15.5 ns per
row REGARDLESS of OOB (drop) rows, so compaction-free dedup is dead; and
cumsum over (786k, 32) is only 0.7 ms. Remaining candidates:

a) sorted-segment-reduce: sort_key_val cost (part 1's measurement was
   CSE'd away — the perturbation folded to zero) + searchsorted
   boundary cost. Pipeline: sort pairs -> permute payload (gather) ->
   cumsum -> gather at 65537 boundaries -> diff = dense output.
b) windowed block-scatter: scatter G window-updates of shape (win, 128)
   (or (2, 16, 128) 2-D windows) — wins iff XLA scatter cost is
   per-UPDATE, not per-element.

python tools/probe_scatter_r5b.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench_util import bench_scan

H = W = 256
C = 32
QUAD = 4 * C
P = 16384 * 48


def probe_sort():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    keys = jax.random.randint(k1, (P,), 0, H * W)
    idx = jnp.arange(P, dtype=jnp.int32)
    fdummy = jnp.ones((8,), jnp.float32)

    def sort_pairs(d, k, v):
        # real perturbation: int32(d*1e6) varies per scan step (1e6 + i)
        kk = k + (jnp.int32(d[0] * 1e6) % 7)
        return jax.lax.sort_key_val(kk, v)[1]

    bench_scan("sort_key_val 786k (i32,i32)", sort_pairs, fdummy, keys, idx)

    big_keys = jax.random.randint(k1, (6 * P,), 0, H * W)
    big_idx = jnp.arange(6 * P, dtype=jnp.int32)
    bench_scan("sort_key_val 4.7M (i32,i32)", sort_pairs, fdummy, big_keys, big_idx)

    skeys = jnp.sort(keys)

    def ssorted(d, sk):
        kk = jnp.int32(d[0] * 1e6) % 7
        q = jnp.arange(H * W + 1, dtype=jnp.int32) + kk * 0
        return jnp.searchsorted(sk, q)

    bench_scan("searchsorted 65537 in 786k", ssorted, fdummy, skeys)

    # full sorted-segment pipeline per plane-pass: sort pairs, permute
    # payload, cumsum, boundary gather + diff
    vals = jax.random.normal(k2, (P, QUAD), jnp.bfloat16)

    def seg_pipeline(d, k, v):
        kk = k + (jnp.int32(d[0] * 1e6) % 2)  # keep keys ~valid
        sk, perm = jax.lax.sort_key_val(kk, jnp.arange(P, dtype=jnp.int32))
        pv = jnp.take(v, perm, axis=0).astype(jnp.float32)
        cs = jnp.cumsum(pv, axis=0)
        cs = jnp.concatenate([jnp.zeros((1, QUAD), jnp.float32), cs], axis=0)
        bounds = jnp.searchsorted(sk, jnp.arange(H * W + 1, dtype=jnp.int32))
        seg = jnp.take(cs, bounds, axis=0)
        return seg[1:] - seg[:-1]  # (65536, QUAD) dense grads

    t = bench_scan("FULL sorted-seg pipeline 786k", seg_pipeline, fdummy, keys, vals)
    print(f"   -> vs 12.1 ms XLA scatter baseline")

    # correctness
    out = seg_pipeline(fdummy, keys, vals)
    want = jnp.zeros((H * W, QUAD), jnp.float32).at[keys].add(vals.astype(jnp.float32))
    err = float(jnp.max(jnp.abs(out - want)))
    scale = float(jnp.max(jnp.abs(want))) + 1e-9
    print(f"   max abs err {err:.3e} (max |want| {scale:.3e})")


def probe_block_scatter():
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)

    for win, g in ((8, P // 8), (16, P // 16), (32, P // 32)):
        starts = jax.random.randint(k1, (g, 1), 0, H * W - win)
        upd = jax.random.normal(k2, (g, win, QUAD), jnp.float32)

        def block_scat(s, u):
            dnums = jax.lax.ScatterDimensionNumbers(
                update_window_dims=(1, 2),
                inserted_window_dims=(),
                scatter_dims_to_operand_dims=(0,),
            )
            z = jnp.zeros((H * W, QUAD), jnp.float32)
            return jax.lax.scatter_add(
                z, s, u, dnums,
                indices_are_sorted=False, unique_indices=False,
            )

        t = bench_scan(
            f"block-scatter {g} x ({win},{QUAD})", block_scat, starts, upd,
            perturb_arg=1,
        )
        print(f"   -> {t / g * 1e9:.1f} ns/update, {t / (g * win) * 1e9:.2f} ns/row-equiv")

    # 2-D window variant: operand (256, 256, QUAD), updates (G, 2, 16, QUAD)
    g = P // 8
    ys = jax.random.randint(k1, (g,), 0, H - 2)
    xs = jax.random.randint(k2, (g,), 0, W - 16)
    starts2 = jnp.stack([ys, xs], axis=1)
    upd2 = jax.random.normal(k2, (g, 2, 16, QUAD), jnp.float32)

    def block_scat2(s, u):
        dnums = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2, 3),
            inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0, 1),
        )
        z = jnp.zeros((H, W, QUAD), jnp.float32)
        return jax.lax.scatter_add(
            z, s, u, dnums, indices_are_sorted=False, unique_indices=False
        )

    t = bench_scan(
        f"block-scatter2d {g} x (2,16,{QUAD})", block_scat2, starts2, upd2,
        perturb_arg=1,
    )
    print(f"   -> {t / g * 1e9:.1f} ns/update")


def main():
    print(f"devices: {jax.devices()}")
    probe_sort()
    probe_block_scatter()


if __name__ == "__main__":
    main()
