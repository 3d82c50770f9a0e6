"""Render orbit videos / novel views / shapes from inversion artifacts.

Covers the reference's inference tooling: InferenceCoach's orbit video
(spi/training/coaches/inference_coach.py:41-44 via
spi/utils/video_utils.py:74-227) and the marching-cubes shape export
(video_utils.py gen_shapes + eg3d/shape_utils.py).

Input: a per-image inversion checkpoint npz ({w, c, G params} saved by
the pipeline, base_coach.py:204-217 layout) or a plain generator npz +
explicit w.

Usage:
    python -m spi_tpu.cli.run_video \
        --checkpoint out/checkpoints/<coach>/face0.npz \
        --output face0.mp4 [--frames 120] [--shape face0.ply]
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TPU-native orbit video rendering")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="inversion artifact npz with w/c/G entries")
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--yaw", type=float, default=0.5)
    p.add_argument("--pitch", type=float, default=0.15)
    p.add_argument("--shape", type=str, default=None,
                   help="also export a marching-tetrahedra PLY here")
    p.add_argument("--shape_resolution", type=int, default=128)
    p.add_argument("--fp32", action="store_true", default=False)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import numpy as np

    from spi_tpu.models.triplane import ffhq512_128_config
    from spi_tpu.utils.checkpoint import unflatten_to_nested
    from spi_tpu.utils.video import render_orbit_video

    flat = dict(np.load(args.checkpoint))
    nested = unflatten_to_nested(flat)
    assert "G" in nested and "w" in nested, (
        "expected an inversion artifact npz with G/w entries"
    )
    generator = ffhq512_128_config(
        compute_dtype="float32" if args.fp32 else "bfloat16"
    )
    g_params = nested["G"]
    w = jax.numpy.asarray(nested["w"])
    if w.ndim == 2:
        w = w[None]

    frames = render_orbit_video(
        generator, g_params, w, args.output,
        num_frames=args.frames, fps=args.fps,
        yaw_amplitude=args.yaw, pitch_amplitude=args.pitch,
    )
    print(f"wrote {len(frames)} frames -> {args.output}")

    if args.shape:
        from spi_tpu.utils.shape import extract_shape

        verts, faces = extract_shape(
            generator, g_params, w, path=args.shape,
            resolution=args.shape_resolution,
        )
        print(f"wrote shape ({len(verts)} verts, {len(faces)} faces) -> {args.shape}")


if __name__ == "__main__":
    main()
