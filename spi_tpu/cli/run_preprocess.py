"""Preprocess CLI: raw portraits -> crop/ c/ lm/ mask/ dataset tree.

Mirrors preprocess/run_total.py's interface. Network weights come from
npz conversions (spi_tpu.convert):
  fan.npz       2DFAN4 landmarks  (face_alignment release)
  facerecon.npz Deep3DFaceRecon epoch_20.pth (prefix net_recon.)
  bisenet.npz   face-parsing BiSeNet

Usage:
    python -m spi_tpu.cli.run_preprocess \
        --input_dir raw/ --output_dir data/ \
        --ckpt_dir checkpoints/preprocess [--mirror]
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TPU-native SPI preprocess")
    p.add_argument("--input_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--ckpt_dir", type=str, default="checkpoints/preprocess")
    p.add_argument("--mirror", action="store_true", default=False)
    p.add_argument("--random_init", action="store_true", default=False,
                   help="random perception weights (smoke runs only)")
    return p.parse_args(argv)


def load_models(ckpt_dir: str):
    import jax
    import numpy as np

    from spi_tpu.models.perception.bisenet import BiSeNet
    from spi_tpu.models.perception.face_recon import FaceReconNet
    from spi_tpu.models.perception.fan import FAN
    from spi_tpu.preprocess.pipeline import PreprocessModels
    from spi_tpu.utils.checkpoint import unflatten_to_nested

    def load(name, model, key):
        path = os.path.join(ckpt_dir, name)
        if os.path.exists(path):
            return model, unflatten_to_nested(dict(np.load(path)))
        print(f"warning: {path} missing; using random init")
        return model, model.init(key)

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    return PreprocessModels(
        fan=load("fan.npz", FAN(), k1),
        face_recon=load("facerecon.npz", FaceReconNet(), k2),
        bisenet=load("bisenet.npz", BiSeNet(), k3),
    )


def main(argv=None):
    args = parse_args(argv)
    from spi_tpu.preprocess.pipeline import PreprocessModels, run_total

    if args.random_init:
        models = PreprocessModels.random_init()
    else:
        models = load_models(args.ckpt_dir)
    results, failures = run_total(
        args.input_dir, args.output_dir, models, mirror=args.mirror
    )
    print(f"preprocessed {len(results)} images, {len(failures)} failures")
    for name, err in failures:
        print(f"  FAILED {name}: {err}")


if __name__ == "__main__":
    main()
