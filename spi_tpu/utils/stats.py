"""Training statistics collection (moment accumulators).

Behavioral spec: eg3d/torch_utils/training_stats.py:57-211 — `report`
accumulates [count, sum, sum-of-squares] per name; a `Collector`
snapshots deltas and exposes mean/std; multi-process sync is an
all_reduce of the moment triples (:245-266).

TPU re-design: inside jit, stats are explicit pytrees (`empty_moments`,
`accumulate`, `cross_device_sum` with jax.lax.psum over the mesh axis)
— no global mutable registry on the device side. The host-side
`Collector` keeps the reference's report/as_dict surface for loop
logging (stats.jsonl cadence, training_loop.py:233-246)."""

from __future__ import annotations

import json
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def moments_of(x) -> jnp.ndarray:
    """-> [count, sum, sum(x^2)] float32 triple of a tensor."""
    x = jnp.asarray(x, jnp.float32)
    return jnp.stack([jnp.asarray(x.size, jnp.float32), jnp.sum(x), jnp.sum(x * x)])


def accumulate(moments: jnp.ndarray, x) -> jnp.ndarray:
    return moments + moments_of(x)


def cross_device_sum(moments_tree, axis_name: str):
    """psum the moment triples over a mesh axis (the TPU equivalent of
    training_stats._sync's all_reduce)."""
    return jax.tree_util.tree_map(
        lambda m: jax.lax.psum(m, axis_name), moments_tree
    )


def mean_std(moments) -> tuple[float, float]:
    m = np.asarray(moments, np.float64)
    if m[0] == 0:
        return float("nan"), float("nan")
    mean = m[1] / m[0]
    var = max(m[2] / m[0] - mean * mean, 0.0)
    return float(mean), float(var**0.5)


class Collector:
    """Host-side accumulator with the reference's report surface."""

    def __init__(self):
        self._moments: dict[str, np.ndarray] = {}

    def report(self, name: str, value):
        m = np.asarray(moments_of(jnp.asarray(value)))
        self._moments[name] = self._moments.get(name, np.zeros(3)) + m

    def update_from_tree(self, tree: dict):
        """Merge a {name: moments-triple} pytree produced on device."""
        for name, m in tree.items():
            self._moments[name] = self._moments.get(name, np.zeros(3)) + np.asarray(m)

    def mean(self, name: str) -> float:
        return mean_std(self._moments.get(name, np.zeros(3)))[0]

    def std(self, name: str) -> float:
        return mean_std(self._moments.get(name, np.zeros(3)))[1]

    def as_dict(self) -> dict[str, dict[str, float]]:
        out = {}
        for name, m in self._moments.items():
            mean, std = mean_std(m)
            out[name] = {"num": float(m[0]), "mean": mean, "std": std}
        return out

    def reset(self):
        self._moments.clear()

    def write_jsonl(self, path: str, **extra):
        """Append one stats line (training_loop.py:430-447 stats.jsonl)."""
        entry = {k: v for k, v in self.as_dict().items()}
        entry.update(extra)
        entry["timestamp"] = time.time()
        with open(path, "a") as f:
            f.write(json.dumps(entry) + "\n")


# -- profiling annotations (misc.profiled_function / record_function) -------


def profiled(name: str):
    """Decorator: wraps a function in jax.named_scope + profiler trace
    annotations (the TPU analog of torch.autograd.profiler
    record_function, eg3d/torch_utils/misc.py:102-107)."""

    def wrap(fn):
        import functools

        @functools.wraps(fn)
        def inner(*args, **kwargs):
            with jax.named_scope(name), jax.profiler.TraceAnnotation(name):
                return fn(*args, **kwargs)

        return inner

    return wrap
