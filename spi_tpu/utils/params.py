"""Parameter-pytree utilities: named-leaf selection, trainability masks.

Replaces the reference's module-attribute surgery (named_buffers()
filtering at w_projector.py:45, requires_grad toggling at
base_coach.py:23-24) with explicit pytree operations.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def leaf_paths(tree) -> list[str]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return [_path_str(path) for path, _ in flat]


def map_with_path(fn: Callable[[str, Any], Any], tree):
    """tree_map where fn receives the dotted leaf path."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: fn(_path_str(path), leaf), tree
    )


def extract_noise(g_params) -> dict:
    """Pull the synthesis noise_const maps into a flat {path: array} dict
    (the stage-1 optimization variables, w_projector.py:45)."""
    out = {}

    def visit(path, leaf):
        if path.endswith("noise_const"):
            out[path] = leaf
        return leaf

    map_with_path(visit, g_params)
    return out


def replace_noise(g_params, noise: dict):
    """Substitute noise_const leaves by path."""
    return map_with_path(
        lambda path, leaf: noise[path] if path in noise else leaf, g_params
    )


def init_noise_like(rng, g_params) -> dict:
    """Fresh standard-normal noise maps (w_projector.py:58-60)."""
    noise = extract_noise(g_params)
    keys = jax.random.split(rng, len(noise))
    return {
        path: jax.random.normal(k, v.shape, v.dtype)
        for (path, v), k in zip(sorted(noise.items()), keys)
    }


def trainable_mask(g_params, *, exclude_suffixes=("noise_const", "w_avg")) -> Any:
    """Boolean mask pytree: True for leaves the G-stage optimizer updates.

    Mirrors torch's G.parameters() (buffers excluded) — noise_const and
    w_avg are buffers in the reference (base_coach.py:132-135).
    """
    return map_with_path(
        lambda path, leaf: not any(path.endswith(s) for s in exclude_suffixes),
        g_params,
    )


def tree_where(mask, a, b):
    """Select leaves: mask True -> a, False -> b (same structure)."""
    return jax.tree_util.tree_map(
        lambda m, x, y: x if m else y, mask, a, b,
        is_leaf=lambda v: isinstance(v, bool),
    )


def count_params(tree) -> int:
    return sum(int(jnp.size(x)) for x in jax.tree_util.tree_leaves(tree))
