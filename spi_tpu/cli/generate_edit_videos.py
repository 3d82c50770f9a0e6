"""Domain-interpolation editing videos (ZSSGAN tooling).

TPU-native rebuild of ZSSGAN/generate_videos.py:1-230: given a source w
latent and one or more fine-tuned (domain-adapted) StyleGAN2 generator
checkpoints, interpolate latent codes toward targets (explicit target
latents, InterfaceGAN boundary directions, or none) and optionally
blend generator WEIGHTS across consecutive domain checkpoints, then
render every frame and write per-domain + combined grid videos.

Differences from the reference, by design:
- frames are rendered in BATCHES through one jitted synthesis (the
  reference loops frame-by-frame with per-frame host sync);
- weight-space domain blending is a pytree lerp (tree_map) instead of
  in-place `param.data.copy_` mutation;
- the combined grid is composed in numpy and written with imageio — no
  ffmpeg subprocess dependency (falls back to GIF / raw npz like
  utils/video.py).

Usage:
    python -m spi_tpu.cli.generate_edit_videos \
        --ckpt out/pixar/checkpoint/final.npz out/sketch/checkpoint/final.npz \
        --out_dir out/videos --source_latent latents/latent000.npy \
        [--target_latents latents/] [--unedited_frames 40]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

SUGGESTED_DISTANCES = {
    "pose": (3.0, -3.0),
    "smile": (2.0, -2.0),
    "age": (4.0, -4.0),
    "gender": (3.0, -3.0),
    "hair_length": (None, -4.0),
    "beard": (2.0, None),
}


def project_code(latent_code: np.ndarray, boundary: np.ndarray, distance: float):
    """latent + distance * boundary (generate_videos.py:47-52)."""
    if boundary.ndim == 2:
        boundary = boundary.reshape(1, 1, -1)
    return latent_code + distance * boundary


def interpolate_forward_backward(source, target, alphas, dwell: int = 20):
    """source->target, dwell at target, target->source
    (generate_videos.py:95-99)."""
    forward = [a * target + (1 - a) * source for a in alphas]
    return forward + [target] * dwell + forward[::-1]


def build_latents(args, source_latent: np.ndarray) -> list[np.ndarray]:
    alphas = np.linspace(0, 1, num=20)
    if args.unedited_frames:
        return [source_latent] * args.unedited_frames
    if args.target_latents:
        latents = []
        for path in args.target_latents:
            if os.path.abspath(path) == os.path.abspath(args.source_latent):
                continue
            target = np.load(path, allow_pickle=True)
            latents.extend(
                interpolate_forward_backward(source_latent, target, alphas)
            )
        return latents
    # boundary mode
    latents = []
    directions = args.edit_directions or [
        "pose", "smile", "gender", "age", "hair_length"
    ]
    for direction in directions:
        boundary = np.load(
            os.path.join(args.boundary_dir, f"{direction}.npy"), allow_pickle=True
        ).astype(np.float32)
        for distance in SUGGESTED_DISTANCES[direction]:
            if distance:
                target = project_code(source_latent, boundary, distance)
                latents.extend(
                    interpolate_forward_backward(source_latent, target, alphas)
                )
    return latents


def lerp_trees(a, b, t: float):
    import jax

    return jax.tree_util.tree_map(lambda x, y: (1.0 - t) * x + t * y, a, b)


def render_frames(generator, params_list, latents, batch: int = 8):
    """Render all frames. With >1 checkpoints the generator weights are
    blended across consecutive domains over the timeline
    (generate_videos.py:62-87); frames inside one blend segment share
    weights, so they render as one batched jitted call."""
    import jax
    import jax.numpy as jnp

    from spi_tpu.utils.image import tensor2im

    @jax.jit
    def synth(params, ws):
        return generator.synthesis(params["synthesis"], ws, noise_mode="const")

    n = len(latents)
    ws = jnp.asarray(np.concatenate(latents, axis=0), jnp.float32)  # (n, L, C)
    segments = len(params_list) - 1
    frames = []
    if segments == 0:
        for i in range(0, n, batch):
            img = synth(params_list[0], ws[i : i + batch])
            frames.extend(np.asarray(tensor2im(img[j])) for j in range(img.shape[0]))
    else:
        seg_len = n / segments
        for i in range(n):
            mix_alpha = (i % seg_len) / seg_len
            seg = int(i // seg_len)
            params = lerp_trees(params_list[seg], params_list[seg + 1], mix_alpha)
            img = synth(params, ws[i : i + 1])
            frames.append(np.asarray(tensor2im(img[0])))
    return frames


def write_video(frames, path: str, fps: int):
    try:
        import imageio.v2 as imageio

        imageio.mimwrite(path, list(frames), fps=fps)
    except Exception:
        try:
            import imageio.v2 as imageio

            gif = os.path.splitext(path)[0] + ".gif"
            imageio.mimwrite(gif, list(frames), duration=1000.0 / fps, loop=0)
        except Exception:
            np.savez(path + ".frames.npz", frames=np.stack(frames))


def merge_grid(per_ckpt_frames: list[list[np.ndarray]]):
    """Square grid of the per-domain videos (generate_videos.py:157-193)."""
    k = len(per_ckpt_frames)
    side = int(k ** 0.5)
    if side * side != k:
        raise ValueError("Number of checkpoints cannot be arranged in a square grid")
    n = min(len(f) for f in per_ckpt_frames)
    combined = []
    for i in range(n):
        rows = [
            np.concatenate(
                [per_ckpt_frames[r * side + c][i] for c in range(side)], axis=1
            )
            for r in range(side)
        ]
        combined.append(np.concatenate(rows, axis=0))
    return combined


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="ZSSGAN domain-interpolation videos")
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--ckpt", type=str, nargs="+", required=True,
                   help="one or more domain-adapted generator npz checkpoints "
                        "(run_editing output)")
    p.add_argument("--base_ckpt", type=str, default=None,
                   help="full generator npz for weights the editing ckpts "
                        "omit (frozen layers); required when --ckpt holds "
                        "trainable-only trees")
    p.add_argument("--channel_multiplier", type=int, default=2)
    p.add_argument("--channel_max", type=int, default=512)
    p.add_argument("--latent_dim", type=int, default=512)
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--source_latent", type=str, required=True,
                   help=".npy with a (1, L, C) or (1, C) w latent")
    p.add_argument("--target_latents", nargs="+", type=str, default=None)
    p.add_argument("--edit_directions", nargs="+", type=str, default=None)
    p.add_argument("--boundary_dir", type=str, default="editing/interfacegan_boundaries")
    p.add_argument("--unedited_frames", type=int, default=0)
    p.add_argument("--fps", type=int, default=35)
    p.add_argument("--force", "-f", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax

    from spi_tpu.models.stylegan2 import Generator
    from spi_tpu.utils.checkpoint import load_pytree

    os.makedirs(args.out_dir, exist_ok=True)
    if not args.force and os.listdir(args.out_dir):
        raise SystemExit(
            "Output directory is not empty. Delete its contents or pass -f."
        )

    if (
        args.target_latents
        and len(args.target_latents) == 1
        and os.path.isdir(args.target_latents[0])
    ):
        args.target_latents = sorted(
            os.path.join(args.target_latents[0], f)
            for f in os.listdir(args.target_latents[0])
            if f.endswith(".npy")
        )

    channel_base = 32768 * args.channel_multiplier // 2
    generator = Generator(
        z_dim=args.latent_dim, c_dim=0, w_dim=args.latent_dim,
        img_resolution=args.size, img_channels=3, channel_base=channel_base,
        channel_max=args.channel_max,
    )

    base = None
    if args.base_ckpt:
        base = load_pytree(args.base_ckpt)

    def load_full(path):
        tree = load_pytree(path)
        if base is None:
            return tree
        # editing checkpoints store only the trainable subset; overlay
        merged = jax.tree_util.tree_map(lambda x: x, base)

        def overlay(dst, src):
            for k, v in src.items():
                if isinstance(v, dict) and isinstance(dst.get(k), dict):
                    overlay(dst[k], v)
                else:
                    dst[k] = v

        overlay(merged, tree)
        return merged

    params_list = [load_full(p) for p in args.ckpt]

    source_latent = np.load(args.source_latent, allow_pickle=True).astype(np.float32)
    if source_latent.ndim == 2:  # (1, C) -> broadcast over layers
        source_latent = np.repeat(
            source_latent[:, None, :], generator.num_ws, axis=1
        )
    latents = build_latents(args, source_latent)

    per_ckpt = []
    for idx, params in enumerate(params_list):
        sub = os.path.join(args.out_dir, str(idx))
        os.makedirs(sub, exist_ok=True)
        frames = render_frames(generator, [params], latents)
        per_ckpt.append(frames)
        write_video(frames, os.path.join(sub, "out.mp4"), args.fps)
        print(f"[{idx}] {len(frames)} frames -> {sub}/out.mp4")

    if len(params_list) > 1:
        # the reference's combined video: domain-blended weights over time
        blended = render_frames(generator, params_list, latents)
        write_video(blended, os.path.join(args.out_dir, "blended.mp4"), args.fps)
        combined = merge_grid(per_ckpt)
        write_video(combined, os.path.join(args.out_dir, "combined.mp4"), args.fps)
    else:
        write_video(per_ckpt[0], os.path.join(args.out_dir, "combined.mp4"), args.fps)
    print(f"done -> {args.out_dir}")


if __name__ == "__main__":
    main()
