"""Standalone preprocess utilities (pure CPU).

Specs: preprocess/mirror_padding.py:17-38 (reflect-pad + distance-
blurred border), preprocess/video2frames.py:6-52 (frame dump at 512
with optional mirrored doubling), preprocess/
transform_into_goae_data_format.py:14-40 (GOAE label.json export).
"""

from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image


def mirror_padding(img: Image.Image, pad: int = 250, blur_sigma: float = 3.0):
    """Reflect-pad `pad` px on each side and progressively blur the
    padded border by distance from the valid region
    (mirror_padding.py:17-38)."""
    try:
        from scipy.ndimage import distance_transform_edt, gaussian_filter
    except ImportError as e:  # scipy is available in this image; guard anyway
        raise RuntimeError("mirror_padding requires scipy") from e

    arr = np.asarray(img.convert("RGB"), np.float32)
    h, w, _ = arr.shape
    padded = np.pad(arr, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")
    valid = np.zeros(padded.shape[:2], bool)
    valid[pad : pad + h, pad : pad + w] = True
    dist = distance_transform_edt(~valid)
    # blur strength grows with distance into the pad
    blurred = np.stack(
        [gaussian_filter(padded[..., c], sigma=blur_sigma * 3) for c in range(3)],
        axis=-1,
    )
    weight = np.clip(dist / pad, 0.0, 1.0)[..., None]
    out = padded * (1 - weight) + blurred * weight
    return Image.fromarray(np.clip(out, 0, 255).astype(np.uint8))


def video2frames(
    video_path: str,
    output_dir: str,
    size: int = 512,
    every: int = 1,
    mirror: bool = False,
    limit: int | None = None,
):
    """Dump video frames as jpgs at `size` (video2frames.py:6-52).
    With mirror=True each frame is also saved horizontally flipped."""
    import cv2

    os.makedirs(output_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    i = saved = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % every == 0:
            frame = cv2.resize(frame, (size, size))
            cv2.imwrite(os.path.join(output_dir, f"{saved:06d}.jpg"), frame)
            if mirror:
                cv2.imwrite(
                    os.path.join(output_dir, f"{saved:06d}_m.jpg"), frame[:, ::-1]
                )
            saved += 1
            if limit is not None and saved >= limit:
                break
        i += 1
    cap.release()
    return saved


def export_goae_format(spi_root: str, goae_root: str):
    """Repackage the SPI crop/ + c/ layout into the GOAE dataset format
    (transform_into_goae_data_format.py:14-40): images flat in one dir +
    label.json mapping filename -> 25-dim label list."""
    import shutil

    os.makedirs(goae_root, exist_ok=True)
    labels = []
    crop_root = os.path.join(spi_root, "crop")
    c_root = os.path.join(spi_root, "c")
    for name in sorted(os.listdir(crop_root)):
        img_path = os.path.join(crop_root, name, "target.jpg")
        c_path = os.path.join(c_root, name, "target.npy")
        if not (os.path.exists(img_path) and os.path.exists(c_path)):
            continue
        out_name = f"{name}.jpg"
        shutil.copy(img_path, os.path.join(goae_root, out_name))
        label = np.load(c_path).reshape(-1).tolist()
        labels.append([out_name, label])
    with open(os.path.join(goae_root, "label.json"), "w") as f:
        json.dump({"labels": labels}, f)
    return len(labels)
