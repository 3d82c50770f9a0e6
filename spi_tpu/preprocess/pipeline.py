"""Preprocess orchestration: image -> crop / camera / landmarks / mask.

Behavioral spec: preprocess/run_total.py:23-88 (per-image try/except
loop writing the input/ c/ crop/ lm/ mask/ tree), extract_camera.py:
51-156 (CameraExtractor), extract_landmark.py:25-36 (256-scale
landmarks npy), extract_mask.py:35-62 (BiSeNet argmax).

TPU design: the three networks (FAN landmarker, ResNet-50 3DMM
regressor, BiSeNet parser) run as jitted batch-1 programs; the camera
algebra is the pure-numpy spi_tpu.preprocess.camera_math. Outputs are
npz/npy/jpg — torch-free.
"""

from __future__ import annotations

import dataclasses
import os
import shutil
from typing import Any

import numpy as np
from PIL import Image

from spi_tpu.preprocess import camera_math as cm

Params = dict[str, Any]


@dataclasses.dataclass
class PreprocessModels:
    """Bundles the jitted perception programs (each may be None to skip
    the corresponding artifact)."""

    fan: Any = None  # (FAN, params)
    face_recon: Any = None  # (FaceReconNet, params)
    bisenet: Any = None  # (BiSeNet, params)
    # jitted callables built lazily ONCE per bundle: re-wrapping a fresh
    # jax.jit(lambda ...) per image would miss the trace cache and
    # recompile every network per call.
    _jitted: dict = dataclasses.field(default_factory=dict, repr=False)

    def jitted(self, name: str, build):
        fn = self._jitted.get(name)
        if fn is None:
            import jax

            fn = jax.jit(build())
            self._jitted[name] = fn
        return fn

    @classmethod
    def random_init(cls, key=None):
        """Random weights — pipeline smoke tests without checkpoints."""
        import jax

        from spi_tpu.models.perception.bisenet import BiSeNet
        from spi_tpu.models.perception.face_recon import FaceReconNet
        from spi_tpu.models.perception.fan import FAN

        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        fan = FAN()
        recon = FaceReconNet()
        bise = BiSeNet()
        return cls(
            fan=(fan, fan.init(k1)),
            face_recon=(recon, recon.init(k2)),
            bisenet=(bise, bise.init(k3)),
        )


def _to01(img: Image.Image) -> np.ndarray:
    arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
    return arr.transpose(2, 0, 1)[None]


def get_landmarks(models: PreprocessModels, img: Image.Image) -> np.ndarray:
    """68x2 landmarks in image pixel coords (extract_landmark.py:14-22)."""
    fan, params = models.fan

    def build():
        from spi_tpu.models.perception.fan import landmarks_from_image

        return lambda p, x: landmarks_from_image(fan, p, x)

    pts = models.jitted("landmarks", build)(params, _to01(img))
    return np.asarray(pts[0])


def get_3dmm_pose(models: PreprocessModels, img224: Image.Image):
    """aligned 224 image -> (angle (3,), trans (3,))
    (extract_3dmm.py:154-222 reduced to the pose outputs SPI consumes)."""
    net, params = models.face_recon
    coeffs = models.jitted("face_recon", lambda: net)(params, _to01(img224))
    split = net.split_coeff(coeffs)
    return np.asarray(split["angle"][0]), np.asarray(split["trans"][0])


def get_parsing(models: PreprocessModels, img512: Image.Image) -> np.ndarray:
    """512x512 crop -> (512, 512) int parsing map (extract_mask.py:35-62)."""
    net, params = models.bisenet

    def build():
        from spi_tpu.models.perception.bisenet import parse_faces

        return lambda p, x: parse_faces(net, p, x)

    out = models.jitted("parsing", build)(params, _to01(img512))
    return np.asarray(out[0]).astype(np.int64)


@dataclasses.dataclass
class CameraExtractor:
    """extract_camera.py:51-156: landmarks -> 3DMM pose -> crop + 25-dim
    camera label."""

    models: PreprocessModels

    def extract(self, img: Image.Image):
        """-> (crop512 PIL, label (25,), mirror label (25,), lm_raw)."""
        lm = get_landmarks(self.models, img)
        # the reference flips landmark y to math convention before align
        # (extract_landmark.py:19-21: lm[:,1] = H - 1 - lm[:,1])
        lm_flip = lm.copy()
        lm_flip[:, 1] = img.size[1] - 1 - lm_flip[:, 1]

        # align to 224 for the 3DMM net (extract_3dmm.py:163-178)
        _, img224, _, _ = cm.align_img(img, lm_flip, cm.LM3D_STD)
        angle, trans = get_3dmm_pose(self.models, img224)

        crop = cm.crop_for_eg3d(img, lm_flip, cm.LM3D_STD)
        cam = cm.cal_camera(angle, trans)
        label = cm.process_camera(cam["pose"], cam["intrinsics"])
        label_m = cm.mirror_label(label)
        return crop, label, label_m, lm


def run_total(
    input_dir: str,
    output_dir: str,
    models: PreprocessModels,
    names: list[str] | None = None,
    mirror: bool = False,
    verbose: bool = True,
):
    """Per-image preprocess loop (run_total.py:23-88): writes
    input/ c/ crop/ lm/ mask/ subtrees; per-image failures are caught
    and logged so one bad face never kills the batch (:87-88)."""
    subdirs = {k: os.path.join(output_dir, k) for k in ("input", "c", "crop", "lm", "mask")}
    for d in subdirs.values():
        os.makedirs(d, exist_ok=True)

    extractor = CameraExtractor(models)
    files = sorted(
        f for f in os.listdir(input_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    if names is not None:
        files = [f for f in files if os.path.splitext(f)[0] in names]

    results, failures = [], []
    for fname in files:
        name = os.path.splitext(fname)[0]
        try:
            src = os.path.join(input_dir, fname)
            img = Image.open(src).convert("RGB")
            shutil.copy(src, os.path.join(subdirs["input"], fname))

            crop, label, label_m, _ = extractor.extract(img)
            for d in ("c", "crop", "lm", "mask"):
                os.makedirs(os.path.join(subdirs[d], name), exist_ok=True)
            crop.save(os.path.join(subdirs["crop"], name, "target.jpg"))
            np.save(os.path.join(subdirs["c"], name, "target.npy"), label)
            if mirror:
                crop.transpose(Image.FLIP_LEFT_RIGHT).save(
                    os.path.join(subdirs["crop"], name, "target_m.jpg")
                )
                np.save(os.path.join(subdirs["c"], name, "target_m.npy"), label_m)

            # landmarks on the crop at 256 scale (extract_landmark.py:25-36)
            lm_crop = get_landmarks(models, crop)
            np.save(os.path.join(subdirs["lm"], name, "target.npy"), lm_crop / 2.0)

            if models.bisenet is not None:
                parsing = get_parsing(models, crop)
                np.save(os.path.join(subdirs["mask"], name, "target.npy"), parsing)

            results.append(name)
            if verbose:
                print(f"preprocessed {name}")
        except Exception as e:  # noqa: BLE001 — parity with run_total.py:87
            failures.append((name, repr(e)))
            if verbose:
                print(f"FAILED {name}: {e!r}")
    return results, failures
