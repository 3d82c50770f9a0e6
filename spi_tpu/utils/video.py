"""Turntable video rendering (spi/utils/video_utils.py:74-227).

Renders an orbit of cameras through the tuned generator; frames are
vmapped/batched on device, encoding happens host-side via imageio if
available (gated — ffmpeg is not guaranteed in every environment).
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

from spi_tpu.utils import camera as cam
from spi_tpu.utils.image import tensor2im


@functools.lru_cache(maxsize=8)
def _orbit_render_fn(generator):
    # Cached per generator config: re-jitting per video would recompile
    # the full synthesis for every exported orbit.
    @jax.jit
    def render(g_params, w, c):
        ws = jnp.broadcast_to(w, (c.shape[0],) + w.shape[1:])
        return generator.synthesis(
            g_params, jax.random.PRNGKey(0), ws, c, noise_mode="const"
        )["image"]

    return render


def render_orbit_frames(generator, g_params, w, num_frames: int = 60,
                        yaw_amplitude: float = 0.5, pitch_amplitude: float = 0.15,
                        batch: int = 4):
    """Render frames along a smooth camera orbit. Returns uint8 (T,H,W,3)."""
    import math

    cams = []
    for t in np.linspace(0, 1, num_frames, endpoint=False):
        yaw = yaw_amplitude * math.sin(2 * math.pi * t)
        pitch = pitch_amplitude * math.cos(2 * math.pi * t)
        cams.append(cam.canonical_camera(yaw=yaw, pitch=pitch))
    cams = jnp.concatenate(cams, axis=0)
    render = _orbit_render_fn(generator)

    frames = []
    for i in range(0, num_frames, batch):
        chunk = cams[i : i + batch]
        if chunk.shape[0] < batch:  # keep shapes static for the jit cache
            pad = batch - chunk.shape[0]
            chunk = jnp.concatenate([chunk, jnp.tile(chunk[-1:], (pad, 1))], axis=0)
            imgs = render(g_params, w, chunk)[: num_frames - i]
        else:
            imgs = render(g_params, w, chunk)
        for img in np.asarray(imgs):
            frames.append(np.asarray(tensor2im(img)))
    return np.stack(frames)


def render_orbit_video(generator, g_params, w, path: str, num_frames: int = 60,
                       fps: int = 30, yaw_amplitude: float = 0.5,
                       pitch_amplitude: float = 0.15):
    frames = render_orbit_frames(generator, g_params, w, num_frames=num_frames,
                                 yaw_amplitude=yaw_amplitude,
                                 pitch_amplitude=pitch_amplitude)
    try:
        import imageio.v2 as imageio

        imageio.mimwrite(path, list(frames), fps=fps)
    except Exception:
        # No mp4 encoder (ffmpeg) available: fall back to GIF (pillow
        # plugin, always present), then to raw frames as npz.
        try:
            import imageio.v2 as imageio

            gif = os.path.splitext(path)[0] + ".gif"
            imageio.mimwrite(gif, list(frames), duration=1000.0 / fps, loop=0)
        except Exception:
            np.savez(path + ".frames.npz", frames=frames)
    return frames
