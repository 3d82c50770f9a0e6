"""Generate a synthetic PTIDataset tree for weight-free smoke runs.

Produces the directory layout the inversion CLI consumes
(spi/data/images_dataset.py:102-198 semantics):

    <root>/crop/<name>/target.png   512^2 RGB image
    <root>/c/<name>/target.npy      25-dim camera label (canonical frontal)
    <root>/mask/<name>/target.npy   19-class parsing argmax map
    <root>/lm/<name>/target.npy     68x2 landmarks at 256 scale

Usage:
    python tools/make_smoke_data.py --root /tmp/smoke_data --n 1
    python -m spi_tpu.cli.run_inversion --data_root /tmp/smoke_data \
        --output_root /tmp/smoke_out --random_init \
        --first_inv_type mir --first_inv_steps 20 \
        --G_1_type RotBbox --G_1_step 20 \
        --pt_rot_lambda 0.1 --pt_mirror_rot_lambda 0.05 --pt_depth_lambda 1
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _canonical_camera_label() -> np.ndarray:
    """25-dim frontal FFHQ camera label: the exact output of
    spi_tpu.utils.camera.canonical_camera() (lookat radius 2.7 toward
    (0, 0, 0.2), CANONICAL_PITCH -0.2, fov-intrinsic 4.2647), inlined
    as constants so this tool needs no jax import."""
    cam2world = np.array(
        [
            [1.0, 0.0, 0.0, 0.0],
            [0.0, -0.9905138, -0.13741325, 0.34377462],
            [0.0, 0.13741325, -0.9905138, 2.6780252],
            [0.0, 0.0, 0.0, 1.0],
        ],
        np.float32,
    )
    K = np.array([4.2647, 0, 0.5, 0, 4.2647, 0.5, 0, 0, 1], np.float32)
    return np.concatenate([cam2world.reshape(-1), K])


def make_identity(root: str, name: str, seed: int) -> None:
    from PIL import Image

    for sub in ["crop", "c", "mask", "lm"]:
        os.makedirs(os.path.join(root, sub, name), exist_ok=True)

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:512, 0:512] / 511.0
    cx = 0.5 + rng.uniform(-0.03, 0.03)
    cy = 0.45 + rng.uniform(-0.03, 0.03)
    blob = np.exp(-(((xx - cx) ** 2) + (yy - cy) ** 2) / 0.05)
    img = np.stack(
        [0.6 + 0.3 * blob, 0.45 + 0.25 * blob, 0.4 + 0.2 * blob], -1
    ) + rng.normal(0, 0.01, (512, 512, 3))
    Image.fromarray((img.clip(0, 1) * 255).astype(np.uint8)).save(
        os.path.join(root, "crop", name, "target.png")
    )

    np.save(os.path.join(root, "c", name, "target.npy"), _canonical_camera_label())

    parse = np.zeros((512, 512), np.int64)
    parse[(((xx - cx) ** 2) / 0.08 + ((yy - cy) ** 2) / 0.12) < 1.0] = 1
    np.save(os.path.join(root, "mask", name, "target.npy"), parse)

    t = np.linspace(0, 2 * np.pi, 68, endpoint=False)
    lm = np.stack(
        [256 * cx + 60 * np.cos(t), 256 * cy * 1.15 + 75 * np.sin(t)], -1
    )
    np.save(os.path.join(root, "lm", name, "target.npy"), lm.astype(np.float32))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/smoke_data")
    ap.add_argument("--n", type=int, default=1)
    args = ap.parse_args()
    for i in range(args.n):
        make_identity(args.root, f"synth{i}", seed=i)
    print(f"wrote {args.n} identities under {args.root}")


if __name__ == "__main__":
    main()
