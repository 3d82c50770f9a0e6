"""Noise-buffer autocorrelation regularizer.

Spec: spi/training/projectors/w_projector.py:90-99 — for each noise
image, sum over pyramid levels of squared mean(noise * roll(noise)) in
both axes, average-pooling 2x between levels until size <= 8.
"""

from __future__ import annotations

import jax.numpy as jnp


def noise_regularization(noise_tree) -> jnp.ndarray:
    """noise_tree: dict (or any pytree of 2D arrays) of noise_const maps."""
    import jax

    leaves = jax.tree_util.tree_leaves(noise_tree)
    reg = 0.0
    for v in leaves:
        noise = v[None, None]
        while True:
            reg = reg + jnp.square(jnp.mean(noise * jnp.roll(noise, 1, axis=3)))
            reg = reg + jnp.square(jnp.mean(noise * jnp.roll(noise, 1, axis=2)))
            if noise.shape[2] <= 8:
                break
            n, c, h, w = noise.shape
            noise = noise.reshape(n, c, h // 2, 2, w // 2, 2).mean(axis=(3, 5))
    return reg


def normalize_noise(noise_tree):
    """Zero-mean unit-variance renormalization applied after each step
    (w_projector.py:107-110)."""
    import jax

    def norm(v):
        v = v - v.mean()
        return v * jax.lax.rsqrt(jnp.mean(jnp.square(v)))

    return jax.tree_util.tree_map(norm, noise_tree)
