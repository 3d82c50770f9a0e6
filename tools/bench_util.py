"""Timing helper that is robust on the axon tunnel.

The tunnel adds ~80-90 ms of per-program round-trip overhead, so wall
timing one execution measures mostly transport. bench_scan times the
SAME op scanned n1 and n2 times inside one jit (inputs perturbed per
iteration so nothing can be cached or elided) and reports the slope
(T(n2) - T(n1)) / (n2 - n1) — pure per-iteration device time.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _scan_program(fn, args, perturb_arg, n):
    def step(carry, i):
        a = list(args)
        # Perturb the first array leaf of the chosen arg (which may be a
        # pytree, e.g. a params dict) so no iteration can be CSE'd away.
        leaves, treedef = jax.tree_util.tree_flatten(a[perturb_arg])
        x = leaves[0]
        leaves[0] = x * (1.0 + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype))
        a[perturb_arg] = jax.tree_util.tree_unflatten(treedef, leaves)
        out = fn(*a)
        s = sum(
            jnp.sum(leaf).astype(jnp.float32)
            for leaf in jax.tree_util.tree_leaves(out)
        )
        return carry + s, None

    return jax.jit(lambda: jax.lax.scan(step, jnp.float32(0.0), jnp.arange(n))[0])


def _time(prog, reps):
    out = prog()
    float(out)  # force full materialization on host
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(prog())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_scan(name, fn, *args, n1=5, n2=45, reps=3, perturb_arg=0):
    t1 = _time(_scan_program(fn, args, perturb_arg, n1), reps)
    t2 = _time(_scan_program(fn, args, perturb_arg, n2), reps)
    dt = (t2 - t1) / (n2 - n1)
    print(f"{name:54s} {dt * 1e3:9.3f} ms/iter")
    return dt
