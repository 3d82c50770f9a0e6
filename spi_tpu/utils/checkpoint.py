"""Pytree checkpointing.

Replaces the reference's three-tier torch pickling (SURVEY.md §5):
(a) pretrained weights — converted once by spi_tpu.convert into a flat
    npz + meta json;
(b) per-image latent cache (w pivots, embedding/<coach>/<name>.npz);
(c) final per-image artifacts {w, c, G params} (base_coach.py:204-217).

Flat npz with dotted keys keeps artifacts torch-free, mmap-friendly,
and diffable; orbax is available for sharded multi-host checkpoints but
is unnecessary at these sizes.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def flatten_pytree(tree, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        out[prefix + ".".join(parts)] = np.asarray(leaf)
    return out


def unflatten_to_nested(flat: dict[str, Any]) -> dict:
    """dotted keys -> nested dicts (lists are restored as dicts keyed by
    index strings; loaders that need real lists handle those locally)."""
    nested: dict = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = nested
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return nested


def save_pytree(path: str, tree, meta: dict | None = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = flatten_pytree(tree)
    np.savez(path, **flat)
    if meta is not None:
        with open(path + ".json", "w") as f:
            json.dump(meta, f, indent=2)


def load_pytree(path: str, like=None):
    """Load an npz saved by save_pytree. If `like` is given, values are
    restructured to exactly that pytree structure (paths must match)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    flat = {k: jnp.asarray(v) for k, v in data.items()}
    if like is None:
        return unflatten_to_nested(flat)

    def fill(path_parts, leaf):
        key = ".".join(path_parts)
        assert key in flat, f"missing key in checkpoint: {key}"
        assert flat[key].shape == leaf.shape, (
            f"shape mismatch for {key}: {flat[key].shape} vs {leaf.shape}"
        )
        return flat[key].astype(leaf.dtype)

    flat_like = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for path, leaf in flat_like[0]:
        parts = []
        for p in path:
            parts.append(str(p.key) if hasattr(p, "key") else str(getattr(p, "idx", p)))
        leaves.append(fill(parts, leaf))
    return jax.tree_util.tree_unflatten(flat_like[1], leaves)
