"""Camera rays from cam2world + intrinsics.

Spec: eg3d/training/volumetric_rendering/ray_sampler.py:24-63 (OpenCV
camera conventions, pixel-center uv grid, intrinsics lift, cam2world
transform, normalized directions).
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_rays(cam2world, intrinsics, resolution: int):
    """Compute per-pixel ray origins and directions.

    Args:
      cam2world: (N, 4, 4).
      intrinsics: (N, 3, 3), normalized by image size.
      resolution: output image side (static).

    Returns:
      ray_origins (N, R*R, 3), ray_directions (N, R*R, 3) — row-major
      pixel order matching the reference's meshgrid+flip layout
      (x varies fastest).
    """
    n = cam2world.shape[0]
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    sk = intrinsics[:, 0, 1][:, None]

    # Pixel-center uv in [0,1): the reference builds ij meshgrid then
    # flips, yielding (x, y) pairs with x varying fastest per row.
    coords = (jnp.arange(resolution, dtype=jnp.float32) + 0.5) / resolution
    yy, xx = jnp.meshgrid(coords, coords, indexing="ij")
    x_cam = jnp.broadcast_to(xx.reshape(1, -1), (n, resolution * resolution))
    y_cam = jnp.broadcast_to(yy.reshape(1, -1), (n, resolution * resolution))
    z_cam = jnp.ones_like(x_cam)

    x_lift = (x_cam - cx + cy * sk / fy - sk * y_cam / fy) / fx * z_cam
    y_lift = (y_cam - cy) / fy * z_cam

    cam_rel = jnp.stack([x_lift, y_lift, z_cam, jnp.ones_like(z_cam)], axis=-1)
    world_rel = jnp.einsum("nij,npj->npi", cam2world, cam_rel)[..., :3]

    cam_locs = cam2world[:, :3, 3]
    ray_dirs = world_rel - cam_locs[:, None, :]
    ray_dirs = ray_dirs / jnp.linalg.norm(ray_dirs, axis=-1, keepdims=True)
    ray_origins = jnp.broadcast_to(cam_locs[:, None, :], ray_dirs.shape)
    return ray_origins, ray_dirs
