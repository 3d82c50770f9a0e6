"""Camera parameter construction and sampling.

Folds the reference's duplicated camera helpers into one module:
eg3d/camera_utils.py (pose samplers :22-117, create_cam2world_matrix
:118-139, FOV_to_intrinsics :140-149) and spi/utils/camera_utils.py
(canonical/surrounding/mirror cameras, yaw-dependent loss weights).

Cameras are 25-vectors: flattened 4x4 cam2world + flattened 3x3
normalized intrinsics (OpenCV convention), exactly the label format of
the preprocess pipeline (preprocess/process_camera.py:48-58).

All samplers are pure functions of an explicit PRNG key.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

# Canonical FFHQ-EG3D viewing geometry (spi/utils/camera_utils.py:233-240):
# radius 2.7, lookat (0, 0, 0.2), pitch offset -0.2, focal 4.2647 (normalized).
CANONICAL_RADIUS = 2.7
CANONICAL_LOOKAT = (0.0, 0.0, 0.2)
CANONICAL_PITCH = -0.2
CANONICAL_FOCAL = 4.2647


def normalize_vecs(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def create_cam2world_matrix(forward_vector, origin):
    """y-up, no-roll cam2world from forward direction + position
    (eg3d/camera_utils.py:118-139)."""
    forward_vector = normalize_vecs(forward_vector)
    up = jnp.broadcast_to(
        jnp.array([0.0, 1.0, 0.0], forward_vector.dtype), forward_vector.shape
    )
    right = -normalize_vecs(jnp.cross(up, forward_vector))
    up = normalize_vecs(jnp.cross(forward_vector, right))

    n = forward_vector.shape[0]
    rotation = jnp.broadcast_to(jnp.eye(4, dtype=forward_vector.dtype), (n, 4, 4))
    rotation = rotation.at[:, :3, :3].set(jnp.stack([right, up, forward_vector], axis=-1))
    translation = jnp.broadcast_to(jnp.eye(4, dtype=forward_vector.dtype), (n, 4, 4))
    translation = translation.at[:, :3, 3].set(origin)
    return translation @ rotation


def _spherical_origin(h, v, radius):
    """Azimuth/polar angles -> camera origin (eg3d/camera_utils.py:44-53)."""
    v = jnp.clip(v, 1e-5, math.pi - 1e-5)
    theta = h
    phi = jnp.arccos(1 - 2 * (v / math.pi))
    ox = radius * jnp.sin(phi) * jnp.cos(math.pi - theta)
    oz = radius * jnp.sin(phi) * jnp.sin(math.pi - theta)
    oy = radius * jnp.cos(phi)
    return jnp.concatenate([ox, oy, oz], axis=-1)


def lookat_pose(
    h,
    v,
    lookat_position,
    radius: float = CANONICAL_RADIUS,
):
    """cam2world for cameras at spherical (h, v) looking at a point
    (LookAtPoseSampler core, eg3d/camera_utils.py:58-96). h, v: (N, 1)."""
    origins = _spherical_origin(h, v, radius)
    lookat = jnp.asarray(lookat_position, origins.dtype)
    forward = normalize_vecs(lookat - origins)
    return create_cam2world_matrix(forward, origins)


def fov_to_intrinsics(fov_degrees: float) -> jnp.ndarray:
    """(3,3) normalized intrinsics from FOV (eg3d/camera_utils.py:140-149)."""
    focal = 1.0 / (math.tan(fov_degrees * 3.14159 / 360) * 1.414)
    return jnp.array([[focal, 0, 0.5], [0, focal, 0.5], [0, 0, 1]], jnp.float32)


def default_intrinsics() -> jnp.ndarray:
    return jnp.array(
        [[CANONICAL_FOCAL, 0, 0.5], [0, CANONICAL_FOCAL, 0.5], [0, 0, 1]], jnp.float32
    )


def pack_camera(cam2world, intrinsics) -> jnp.ndarray:
    """(N,4,4) + (3,3)|(N,3,3) -> (N,25)."""
    n = cam2world.shape[0]
    if intrinsics.ndim == 2:
        intrinsics = jnp.broadcast_to(intrinsics[None], (n, 3, 3))
    return jnp.concatenate(
        [cam2world.reshape(n, 16), intrinsics.reshape(n, 9)], axis=1
    )


def unpack_camera(camera):
    """(N,25) -> cam2world (N,4,4), intrinsics (N,3,3)."""
    return camera[:, :16].reshape(-1, 4, 4), camera[:, 16:25].reshape(-1, 3, 3)


def canonical_camera(yaw: float = 0.0, pitch: float = 0.0, batch_size: int = 1):
    """Frontal FFHQ camera (spi/utils/camera_utils.py:233-240)."""
    h = jnp.full((batch_size, 1), math.pi / 2 + yaw, jnp.float32)
    v = jnp.full((batch_size, 1), math.pi / 2 + CANONICAL_PITCH + pitch, jnp.float32)
    pose = lookat_pose(h, v, CANONICAL_LOOKAT)
    return pack_camera(pose, default_intrinsics())


def sample_camera(rng, batch_size=1, yaw_range=0.35, pitch_range=0.25):
    """Uniformly jittered lookat camera (spi/utils/camera_utils.py:159-166;
    uniform sample_mode of the SPI LookAtPoseSampler variant)."""
    kh, kv = jax.random.split(rng)
    h = jax.random.uniform(kh, (batch_size, 1)) * yaw_range + math.pi / 2
    v = jax.random.uniform(kv, (batch_size, 1)) * pitch_range + math.pi / 2 + CANONICAL_PITCH
    pose = lookat_pose(h, v, CANONICAL_LOOKAT)
    return pack_camera(pose, default_intrinsics())


def angle_to_rotation(yaw, pitch, roll=0.0):
    """Euler yaw/pitch/roll -> (3,3) rotation, traced (supports batched
    jnp scalars). Matches spi/utils/camera_utils.py:169-193 composition
    R = Y(yaw) @ X(pitch) @ Z(roll)."""
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    zero = jnp.zeros_like(cy)
    one = jnp.ones_like(cy)
    # Build per-element matrices via stacking (works for scalars and batches).
    ymat = jnp.stack([
        jnp.stack([cy, zero, sy], -1),
        jnp.stack([zero, one, zero], -1),
        jnp.stack([-sy, zero, cy], -1),
    ], -2)
    pmat = jnp.stack([
        jnp.stack([one, zero, zero], -1),
        jnp.stack([zero, cp, -sp], -1),
        jnp.stack([zero, sp, cp], -1),
    ], -2)
    rmat = jnp.stack([
        jnp.stack([cr, -sr, zero], -1),
        jnp.stack([sr, cr, zero], -1),
        jnp.stack([zero, zero, one], -1),
    ], -2)
    return ymat @ pmat @ rmat


def sample_surrounding_camera(rng, middle_camera, batch_size=1, yaw_range=0.1, pitch_range=0.1):
    """Perturb a camera's extrinsics by uniform yaw/pitch world rotations
    (spi/utils/camera_utils.py:196-211)."""
    ky, kp = jax.random.split(rng)
    y = (jax.random.uniform(ky, (batch_size,)) * 2 - 1) * yaw_range
    p = (jax.random.uniform(kp, (batch_size,)) * 2 - 1) * pitch_range
    rot = angle_to_rotation(y, p, jnp.zeros_like(y))  # (B, 3, 3)

    camera = jnp.broadcast_to(middle_camera, (batch_size, middle_camera.shape[-1]))
    ext, intr = unpack_camera(camera)
    new_top = jnp.einsum("bij,bjk->bik", rot, ext[:, :3])
    ext = ext.at[:, :3].set(new_top)
    return pack_camera(ext, intr)


def flip_yaw(pose):
    """Mirror a cam2world about the x=0 plane
    (spi/utils/camera_utils.py:336-343)."""
    signs = jnp.array(
        [
            [1, -1, -1, -1],
            [-1, 1, 1, 1],
            [-1, 1, 1, 1],
            [1, 1, 1, 1],
        ],
        pose.dtype,
    )
    return pose * signs[None]


def mirror_camera(camera):
    """Camera of the horizontally-flipped image
    (spi/utils/camera_utils.py:346-350)."""
    pose, intrinsics = unpack_camera(camera)
    return pack_camera(flip_yaw(pose), intrinsics)


def rotation_to_angle(matrix):
    """(…,3,3) -> (yaw, pitch, roll) (spi/utils/camera_utils.py:353-364)."""
    r11, r12, r13 = matrix[..., 0, 0], matrix[..., 0, 1], matrix[..., 0, 2]
    r23, r33 = matrix[..., 1, 2], matrix[..., 2, 2]
    pitch = jnp.arctan(-r23 / r33)
    yaw = jnp.arctan(r13 * jnp.cos(pitch) / r33)
    roll = jnp.arctan(-r12 / r11)
    return yaw, pitch, roll


_GAUSS_CONST = math.sqrt(2 * math.pi)


def _gauss(x, mean=0.0, std=0.25):
    return jnp.exp(-0.5 * jnp.square(x - mean) / (std * std)) / (std * _GAUSS_CONST)


def camera_yaw(camera):
    ext, _ = unpack_camera(camera)
    yaw, _, _ = rotation_to_angle(ext[:, :3, :3])
    return yaw


def cal_camera_weight(camera):
    """Yaw-dependent mirror-loss weight (spi/utils/camera_utils.py:387-401):
    0 for near-frontal (|yaw| < 0.2), rising toward profile views."""
    yaw = jnp.abs(camera_yaw(camera))
    w = (1.0 - _gauss(yaw, std=0.29) / 2.7) / 2.0
    return jnp.where(yaw < 0.2, 0.0, w)


def cal_camera_gauss_weight(camera):
    """Gaussian yaw weight for the adaptive yaw range
    (spi/utils/camera_utils.py:368-383)."""
    yaw = camera_yaw(camera)
    return _gauss(yaw, std=0.4) / 2.6


def check_front(camera, eps=0.1):
    """True for near-frontal cameras (spi/utils/camera_utils.py:425-429)."""
    ext, _ = unpack_camera(camera)
    r = ext[:, :3, :3]
    sy = jnp.sqrt(r[:, 0, 0] ** 2 + r[:, 1, 0] ** 2)
    y = jnp.arctan2(-r[:, 2, 0], sy)
    return jnp.abs(y) < eps


def orbit_cameras(num_frames: int, yaw_amplitude=0.7, pitch_amplitude=0.25):
    """Smooth orbit for turntable videos (spi/utils/video_utils.py:129-140
    style camera path)."""
    ts = np.linspace(0, 1, num_frames, endpoint=False)
    cams = []
    for t in ts:
        yaw = yaw_amplitude * math.sin(2 * math.pi * t)
        pitch = pitch_amplitude * math.cos(2 * math.pi * t) - CANONICAL_PITCH - 0.05
        cams.append(canonical_camera(yaw=yaw, pitch=pitch + CANONICAL_PITCH + 0.05 - CANONICAL_PITCH))
    return jnp.concatenate(cams, axis=0)
