"""Depth-guided reprojection warping ("rotate").

Spec: spi/utils/rotate.py — unproject the target view's depth map to
world points, project into the source view, occlusion-test against the
source depth, and bilinearly sample source RGB. Provides the
pseudo-multi-view supervision for the RotBbox coach
(spi/training/coaches/rot_bbox_cx_coach.py:88-131).

Pure linear algebra + grid_sample; used inside stop_gradient in the
coach (the reference wraps it in torch.no_grad()).
"""

from __future__ import annotations

import jax.numpy as jnp

from spi_tpu.ops import resize_bilinear
from spi_tpu.ops.grid_sample import grid_sample
from spi_tpu.utils.camera import unpack_camera


def _uv_grid(n: int, resolution: int, dtype=jnp.float32):
    coords = (jnp.arange(resolution, dtype=dtype) + 0.5) / resolution
    yy, xx = jnp.meshgrid(coords, coords, indexing="ij")
    x = jnp.broadcast_to(xx.reshape(1, -1), (n, resolution * resolution))
    y = jnp.broadcast_to(yy.reshape(1, -1), (n, resolution * resolution))
    return x, y


def unproject(depth_map, cam2world, intrinsics, resolution: int):
    """Depth map -> homogeneous world points (rotate.py:5-29).

    depth_map: (N, R, R) or (N, R*R). Returns (N, R*R, 4).
    """
    n = cam2world.shape[0]
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    sk = intrinsics[:, 0, 1][:, None]

    x_cam, y_cam = _uv_grid(n, resolution, depth_map.dtype)
    z_cam = depth_map.reshape(n, -1)

    x_lift = (x_cam - cx + cy * sk / fy - sk * y_cam / fy) / fx * z_cam
    y_lift = (y_cam - cy) / fy * z_cam

    cam_rel = jnp.stack([x_lift, y_lift, z_cam, jnp.ones_like(z_cam)], axis=-1)
    return jnp.einsum("nij,npj->npi", cam2world, cam_rel)


def project(world_points, cam2world, intrinsics):
    """World points -> uv in [0,1] + camera-space depth (rotate.py:32-52)."""
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    sk = intrinsics[:, 0, 1][:, None]

    world2cam = jnp.linalg.inv(cam2world)
    cam_rel = jnp.einsum("nij,npj->npi", world2cam, world_points)
    x_lift = cam_rel[..., 0]
    y_lift = cam_rel[..., 1]
    z_cam = cam_rel[..., 2]

    y_uv = (y_lift / z_cam * fy) + cy
    x_uv = x_lift / z_cam * fx + sk * y_uv / fy - cy * sk / fy + cx
    return jnp.stack([x_uv, y_uv], axis=-1), z_cam


def _warp(depth1, ex1, in1, img2, depth2, ex2, in2, img2_mask=None, eps=6e-2):
    """Core reprojection (rotate.py:56-89).

    depth1: (N, R, R) target-view depth; img2: (N, C, R, R) source image;
    depth2: (N, R, R) source-view depth.
    Returns warped RGB (N, C, R, R) and validity mask (N, 1, R, R).
    """
    n, h, w = depth1.shape
    xyz = unproject(depth1, ex1, in1, resolution=h)
    uv, z = project(xyz, ex2, in2)

    grid = uv.reshape(n, h, w, 2) * 2.0 - 1.0
    in_bounds = (
        (grid[..., 0] >= -1) & (grid[..., 0] <= 1)
        & (grid[..., 1] >= -1) & (grid[..., 1] <= 1)
    ).astype(img2.dtype)

    new_depth = z.reshape(n, h, w)
    sampled_depth2 = grid_sample(depth2.reshape(n, 1, h, w), grid).reshape(n, h, w)

    depth_mask = (jnp.abs(sampled_depth2 - new_depth) < eps).astype(img2.dtype)
    depth_mask = (depth_mask * in_bounds)[:, None]

    new_rgb = grid_sample(img2, grid) * depth_mask

    if img2_mask is not None:
        new_mask = grid_sample(img2_mask.reshape(n, 1, h, w), grid)
        new_rgb = new_rgb * new_mask
        depth_mask = depth_mask * new_mask
    return new_rgb, depth_mask


def rotate(target_camera, target_depth, src_image, src_camera, src_depth,
           src_mask=None, eps=5e-2, depth_resolution: int = 128):
    """Warp the source image into the target views (rotate.py:92-116).

    target_camera: (N, 25); target_depth: (N, 1, d, d) neural depth;
    src_image: (N, C, R, R); src_camera: (N, 25); src_depth: (N, 1, d, d).
    Depths are bilinearly resized from `depth_resolution` to R.
    """
    n = src_image.shape[0]
    tex, tin = unpack_camera(target_camera)
    gex, gin = unpack_camera(src_camera)
    resolution = src_image.shape[-1]

    def fit_depth(d):
        d = d.reshape(n, 1, depth_resolution, depth_resolution)
        if depth_resolution != resolution:
            d = resize_bilinear(d, (resolution, resolution))
        return d.reshape(n, resolution, resolution)

    return _warp(
        fit_depth(target_depth), tex, tin,
        src_image, fit_depth(src_depth), gex, gin,
        img2_mask=src_mask, eps=eps,
    )


def rotate_with_confidence(target_camera, target_depth, src_image, src_camera,
                           src_depth, src_mask, confidence_eps=0.1,
                           depth_resolution: int = 128):
    """Cycle-consistency confidence masking (rotate.py:119-151)."""
    warp_img, warp_mask = rotate(
        target_camera, target_depth, src_image, src_camera, src_depth,
        src_mask=src_mask, depth_resolution=depth_resolution,
    )
    warp_img_rt, _ = rotate(
        src_camera, src_depth, warp_img, target_camera, target_depth,
        src_mask=warp_mask, depth_resolution=depth_resolution,
    )
    diff = jnp.abs(src_image - warp_img_rt)
    confidence = (jnp.sum(diff, axis=1, keepdims=True) < confidence_eps).astype(
        src_image.dtype
    )
    warp_confidence, warp_mask = rotate(
        target_camera, target_depth, confidence, src_camera, src_depth,
        src_mask=src_mask, depth_resolution=depth_resolution,
    )
    return warp_img, warp_img_rt, confidence, warp_confidence, warp_confidence * warp_img
