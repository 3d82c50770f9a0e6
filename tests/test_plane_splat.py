"""Windowed-splat backward (ops/plane_splat.py) correctness.

The Pallas kernels run in interpret mode on the CPU CI mesh; the same
code path compiles on TPU (perf numbers: tools/probe_winscatter_r5.py).
Reference = XLA autodiff of the quad-gather forward, which the windowed
path must reproduce exactly (modulo f32 summation order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spi_tpu.models.rendering import renderer as R
from spi_tpu.ops import plane_splat

H = W = 256
C = 8  # smaller than the production 32 to keep interpret mode quick


def _geom(fine):
    #  rays 16x16, 12 samples -> tiles (16,16,6): T=2, P=1536
    return plane_splat.RayGeom(
        n_views=1, rays_h=16, rays_w=16, n_samples=12, fine=fine
    )


def _tile_coherent_coords(key, geom, spread):
    """Point cloud with per-(sample-group) tile locality, mimicking a
    render's ray-tile structure: group centers + small jitter."""
    tv, tu, ts = geom.tile_dims()
    n_groups = geom.n_samples // ts
    k1, k2 = jax.random.split(key)
    centers = jax.random.uniform(
        k1, (n_groups, 3), minval=-0.35, maxval=0.35
    )
    pts = jax.random.uniform(
        k2,
        (geom.rays_h * geom.rays_w, n_groups, ts, 3),
        minval=-spread,
        maxval=spread,
    ) + centers[None, :, None, :]
    return pts.reshape(1, geom.n_points, 3)


def _grad_pair(planes, coords, geom):
    cot = jax.random.normal(
        jax.random.PRNGKey(7), (1, 3, coords.shape[1], C), jnp.float32
    )

    def loss(p, impl):
        out = R.sample_from_planes(p, coords, 1.0, geom=geom, impl=impl)
        return jnp.sum(out * cot)

    g_win = jax.grad(lambda p: loss(p, "windowed"))(planes)
    g_xla = jax.grad(lambda p: loss(p, "xla"))(planes)
    return g_win, g_xla


@pytest.fixture(scope="module")
def planes():
    return jax.random.normal(
        jax.random.PRNGKey(0), (1, 3, H * W, C), jnp.float32
    )


@pytest.mark.parametrize("fine", [False, True])
def test_windowed_matches_xla(planes, fine):
    coords = _tile_coherent_coords(jax.random.PRNGKey(1), _geom(fine), 0.05)
    g_win, g_xla = _grad_pair(planes, coords, _geom(fine))
    np.testing.assert_allclose(
        np.asarray(g_win), np.asarray(g_xla), rtol=1e-4, atol=1e-4
    )


def test_overflow_falls_back_exact(planes):
    # Points spread across the whole box: every K1 window overflows, the
    # lax.cond fallback must still produce the exact XLA gradient.
    geom = _geom(False)
    coords = jax.random.uniform(
        jax.random.PRNGKey(2), (1, geom.n_points, 3), minval=-0.49,
        maxval=0.49,
    )
    g_win, g_xla = _grad_pair(planes, coords, geom)
    np.testing.assert_allclose(
        np.asarray(g_win), np.asarray(g_xla), rtol=1e-4, atol=1e-4
    )


def test_border_and_outside_points(planes):
    # Points at/over the box border exercise the zeros-padding hat
    # semantics (clamped corners, dead points).
    geom = _geom(False)
    coords = _tile_coherent_coords(jax.random.PRNGKey(3), geom, 0.02)
    coords = coords.at[0, :200].set(
        jnp.array([0.499, 0.0, 0.0])  # grid edge
    )
    coords = coords.at[0, 200:400].set(
        jnp.array([0.75, 0.75, 0.75])  # outside the box entirely
    )
    g_win, g_xla = _grad_pair(planes, coords, geom)
    np.testing.assert_allclose(
        np.asarray(g_win), np.asarray(g_xla), rtol=1e-4, atol=1e-4
    )


def test_forward_unchanged(planes):
    geom = _geom(False)
    coords = _tile_coherent_coords(jax.random.PRNGKey(4), geom, 0.05)
    out_w = R.sample_from_planes(planes, coords, 1.0, geom=geom, impl="windowed")
    out_x = R.sample_from_planes(planes, coords, 1.0, geom=geom, impl="xla")
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(out_x))


def test_tile_order_roundtrip():
    geom = plane_splat.RayGeom(2, 4, 8, 6, fine=False)
    tv, tu, ts = 4, 8, 3
    x = jnp.arange(geom.n_points, dtype=jnp.int32)
    tiled = plane_splat.tile_order(x, geom, tv, tu, ts)
    assert tiled.shape == (geom.n_points // (tv * tu * ts), tv * tu * ts)
    # every point appears exactly once
    assert np.array_equal(
        np.sort(np.asarray(tiled).ravel()), np.asarray(x)
    )
    # points of one tile come from one view and one sample-group
    nv, rh, rw, s = 2, 4, 8, 6
    views = np.asarray(tiled) // (rh * rw * s)
    groups = (np.asarray(tiled) % s) // ts
    assert (views == views[:, :1]).all()
    assert (groups == groups[:, :1]).all()


def test_geom_supported():
    ok = plane_splat.RayGeom(1, 128, 128, 48, False)
    assert plane_splat.geom_supported(ok, 256, 256, ok.n_points)
    assert not plane_splat.geom_supported(ok, 128, 128, ok.n_points)
    assert not plane_splat.geom_supported(None, 256, 256, 10)
    odd = plane_splat.RayGeom(1, 7, 128, 48, False)  # 7 % tv != 0
    assert plane_splat.geom_supported(odd, 256, 256, odd.n_points) in (
        True,
        False,
    )  # no crash; decided by tiling
