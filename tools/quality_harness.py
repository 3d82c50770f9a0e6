"""Golden quality-metric harness.

Runs one deterministic inversion (fixed synthetic image + fixed seed)
and compares the resulting L2 / LPIPS / ID metrics (+ mirrored
variants, base_coach.py:141-198 format) against a stored golden JSON
within a relative tolerance. The moment a real EG3D checkpoint is
converted, point --eg3d_ckpt at it and --golden at a fresh file to pin
reference-parity numbers; until then the harness runs with random
weights and proves end-to-end determinism.

Usage:
    # record goldens
    python tools/quality_harness.py --golden goldens/quality_tiny.json --write
    # verify within 1%
    python tools/quality_harness.py --golden goldens/quality_tiny.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_metrics(eg3d_ckpt: str | None, tiny: bool, steps: int) -> dict:
    import shutil

    import numpy as np

    import jax

    from spi_tpu.data.dataset import InversionSample
    from spi_tpu.models.triplane import ffhq512_128_config, tiny_test_config
    from spi_tpu.training.pipeline import InversionPipeline, PipelineConfig
    from spi_tpu.utils.camera import canonical_camera

    generator = (
        tiny_test_config(compute_dtype="float32") if tiny
        else ffhq512_128_config(compute_dtype="float32")
    )
    if eg3d_ckpt:
        from spi_tpu.utils.checkpoint import load_pytree

        g_params = load_pytree(
            eg3d_ckpt, like=generator.init(jax.random.PRNGKey(0))
        )
    else:
        g_params = generator.init(jax.random.PRNGKey(0))

    res = generator.img_resolution
    rng = np.random.default_rng(1234)
    yy, xx = np.mgrid[0:res, 0:res] / (res - 1)
    blob = np.exp(-(((xx - 0.5) ** 2) + (yy - 0.45) ** 2) / 0.05)
    img = np.stack([0.5 + 0.4 * blob, 0.3 + 0.4 * blob, 0.2 + 0.3 * blob])
    image = (np.clip(img + rng.normal(0, 0.005, img.shape), 0, 1) * 2 - 1)[None]

    out_root = tempfile.mkdtemp(prefix="spi_quality_")
    try:
        config = PipelineConfig(
            output_root=out_root,
            first_inv_type="mir",
            first_inv_steps=steps,
            G_1_type="RotBbox",
            G_1_step=steps,
            pt_rot_lambda=0.1,
            pt_mirror_rot_lambda=0.0,
            pt_depth_lambda=1.0,
            seed=0,
        )
        pipeline = InversionPipeline(generator, g_params, config)
        result = pipeline.invert_image(
            InversionSample(
                name="golden", image=image.astype(np.float32),
                camera=np.asarray(canonical_camera()),
            )
        )
        return {k: float(v) for k, v in result["metrics"].items()}
    finally:
        shutil.rmtree(out_root, ignore_errors=True)


def compare(metrics: dict, golden: dict, rtol: float) -> list[str]:
    failures = []
    for k, v in golden.items():
        if k not in metrics:
            failures.append(f"missing metric {k}")
            continue
        denom = max(abs(v), 1e-8)
        rel = abs(metrics[k] - v) / denom
        if rel > rtol:
            failures.append(f"{k}: got {metrics[k]:.6g}, golden {v:.6g} "
                            f"(rel {rel:.3%} > {rtol:.0%})")
    return failures


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--golden", required=True)
    ap.add_argument("--write", action="store_true",
                    help="record goldens instead of verifying")
    ap.add_argument("--eg3d_ckpt", default=None)
    ap.add_argument("--full", action="store_true",
                    help="full ffhq512 config (default: tiny)")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--rtol", type=float, default=0.01)
    args = ap.parse_args(argv)

    metrics = run_metrics(args.eg3d_ckpt, tiny=not args.full, steps=args.steps)
    if args.write:
        os.makedirs(os.path.dirname(args.golden) or ".", exist_ok=True)
        with open(args.golden, "w") as f:
            json.dump(metrics, f, indent=2, sort_keys=True)
        print(f"wrote goldens -> {args.golden}: {metrics}")
        return 0
    with open(args.golden) as f:
        golden = json.load(f)
    failures = compare(metrics, golden, args.rtol)
    if failures:
        print("QUALITY REGRESSION:\n  " + "\n  ".join(failures))
        return 1
    print(f"quality metrics within {args.rtol:.0%} of goldens: {metrics}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
