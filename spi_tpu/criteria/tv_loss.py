"""Density total-variation regularizer.

Spec: spi/criteria/tv_loss.py:9-19 — L1 between densities at 1000
uniform points in the box and at epsilon-perturbed points; plus the
(unused in SPI defaults) monotonic depth prior (:22-32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DENSITY_REG_P_DIST = 0.004


def tv_loss(rng, generator, params, ws, n_points: int = 1000):
    k1, k2, k3 = jax.random.split(rng, 3)
    initial = jax.random.uniform(k1, (ws.shape[0], n_points, 3)) * 2 - 1
    perturbed = initial + jax.random.normal(k2, initial.shape) * DENSITY_REG_P_DIST
    coords = jnp.concatenate([initial, perturbed], axis=1)
    directions = jax.random.normal(k3, coords.shape)
    _, sigma = generator.sample_mixed(params, ws, coords, directions)
    sigma_initial = sigma[:, :n_points]
    sigma_perturbed = sigma[:, n_points:]
    return jnp.mean(jnp.abs(sigma_initial - sigma_perturbed))


def monotonic_loss(rng, generator, params, ws, n_points: int = 2000, box_warp: float = 1.0):
    k1, k2 = jax.random.split(rng)
    initial = jax.random.uniform(k1, (ws.shape[0], n_points, 3)) * 2 - 1
    behind = initial + jnp.array([0.0, 0.0, -1.0]) * (1 / 256) * box_warp
    coords = jnp.concatenate([initial, behind], axis=1)
    directions = jax.random.normal(k2, coords.shape)
    _, sigma = generator.sample_mixed(params, ws, coords, directions)
    return jnp.mean(jax.nn.relu(sigma[:, :n_points] - sigma[:, n_points:])) * 10
