"""Benchmark: per-image SPI inversion wall-clock on one TPU chip.

Measures the two hot loops of the pipeline (SURVEY.md §3.1) on the real
device with the full FFHQ-512 architecture (random weights — wall-clock
is weight-independent):
  stage 1: one 'sg' projector step (synthesis fwd+bwd over (w, noise)
           + VGG feature distance + noise regularizer + Adam)
  stage 2: RotBbox steps amortized over the rot_bs=4 cadence (recon
           L2+LPIPS every step; rot-warp LPIPS + 4-camera depth anchor
           every 4th), gradients over the full ~31M-param generator.

Reports the extrapolated wall-clock for the reference workload
(500 stage-1 + 1000 stage-2 steps) vs the 120 s north-star target
(BASELINE.md): vs_baseline > 1 means faster than target.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def time_scan_steps(step_fn, carry, consts, n_steps: int):
    """Compile + run a scanned loop of step_fn(carry, step, consts),
    return seconds/step. `consts` (target image, perception/frozen
    params, ...) is a jit ARGUMENT pytree — closure-captured arrays
    would be embedded as XLA constants, ballooning the emitted MLIR by
    ~8 text bytes per weight (the full VGG16 alone is >100 MB) and
    OOMing the compile."""
    scan_n = jax.jit(
        lambda c, k: jax.lax.scan(lambda cc, s: step_fn(cc, s, k), c, jnp.arange(n_steps))[0]
    )
    out = scan_n(carry, consts)
    jax.block_until_ready(out)  # compile + first run
    t0 = time.time()
    out = scan_n(carry, consts)
    jax.block_until_ready(out)
    return (time.time() - t0) / n_steps


def main():
    import optax

    from spi_tpu.criteria.lpips import LPIPS
    from spi_tpu.criteria.noise_reg import noise_regularization, normalize_noise
    from spi_tpu.models.triplane import ffhq512_128_config
    from spi_tpu.training import coaches
    from spi_tpu.training.projectors import ProjectorSettings, vgg_feature_distance
    from spi_tpu.utils.camera import canonical_camera
    from spi_tpu.utils.params import extract_noise, replace_noise, trainable_mask

    generator = ffhq512_128_config(compute_dtype="bfloat16")
    key = jax.random.PRNGKey(0)
    kg, kl, kt = jax.random.split(key, 3)
    g_params = generator.init(kg)
    lpips = LPIPS(compute_dtype="bfloat16")
    lpips_params = lpips.init(kl)

    target = jax.random.normal(kt, (1, 3, 512, 512), jnp.float32).clip(-1, 1)
    camera = canonical_camera()
    settings = ProjectorSettings()

    # ---- stage 1 step -----------------------------------------------------
    noise0 = extract_noise(g_params)
    w0 = jnp.zeros((1, 1, generator.w_dim))
    opt1 = optax.scale_by_adam()
    p0 = {"w": w0, "noise": noise0}
    s1_carry = (p0, opt1.init(p0))

    from spi_tpu.ops import resize_area

    def s1_loss(p, rng, consts):
        g = replace_noise(consts["g"], p["noise"])
        ws = jnp.tile(p["w"], (1, generator.num_ws, 1))
        img = generator.synthesis(g, rng, ws, camera, noise_mode="const")["image"]
        x = resize_area(img, (256, 256))
        y = resize_area(consts["target"], (256, 256))
        dist = vgg_feature_distance(lpips, consts["lpips"], x, y)
        return dist + noise_regularization(p["noise"]) * settings.regularize_noise_weight

    def s1_step(carry, step, consts):
        p, opt_state = carry
        rng = jax.random.fold_in(jax.random.PRNGKey(7), step)
        grads = jax.grad(s1_loss)(p, rng, consts)
        updates, opt_state = opt1.update(grads, opt_state)
        p = jax.tree_util.tree_map(lambda a, u: a - 5e-3 * u, p, updates)
        p = {"w": p["w"], "noise": normalize_noise(p["noise"])}
        return (p, opt_state), None

    s1_consts = {"g": g_params, "lpips": lpips_params, "target": target}
    t_stage1 = time_scan_steps(s1_step, s1_carry, s1_consts, n_steps=8)

    # ---- stage 2 step (RotBbox cadence, amortized) -------------------------
    s = coaches.CoachSettings(mirror_rot_lambda=0.0)  # BoxCX needs landmarks
    ws_pivot = jnp.zeros((1, generator.num_ws, generator.w_dim))
    face_mask = jnp.ones((1, 1, 512, 512), jnp.float32)

    from spi_tpu.criteria.l2_loss import l2_loss
    from spi_tpu.utils import camera as cam
    from spi_tpu.utils import rotate as rot

    mask = trainable_mask(g_params)
    opt2 = optax.adam(s.learning_rate)

    def s2_loss(p, step, rng, consts):
        target = consts["target"]
        k_recon, k_rot, k_depth, k_r1, k_r2 = jax.random.split(rng, 5)
        # one backbone pass serves recon + every regularizer term
        planes = generator._planes_nhwc(p, ws_pivot)
        out = generator.synthesis_from_planes(p, k_recon, planes, ws_pivot, camera)
        loss = l2_loss(out["image"], target) + lpips(consts["lpips"], out["image"], target)

        def regs():
            cams = cam.sample_surrounding_camera(k_rot, camera, batch_size=s.rot_bs,
                                                 yaw_range=0.2, pitch_range=0.1)
            out_r = generator.synthesis_from_planes(p, k_r1, planes, ws_pivot, cams)
            warp_img, warp_mask = jax.lax.stop_gradient(rot.rotate(
                target_camera=cams, target_depth=out_r["image_depth"],
                src_image=jnp.tile(target, (s.rot_bs, 1, 1, 1)),
                src_camera=jnp.tile(camera, (s.rot_bs, 1)),
                src_depth=jnp.tile(out["image_depth"], (s.rot_bs, 1, 1, 1)),
                src_mask=jnp.tile(face_mask, (s.rot_bs, 1, 1, 1)),
                depth_resolution=generator.neural_rendering_resolution,
            ))
            total = lpips(consts["lpips"], out_r["image"] * warp_mask, warp_img) * 0.1 * s.rot_bs
            cams_d = cam.sample_camera(k_depth, batch_size=4, yaw_range=0.7, pitch_range=0.4)
            depth = generator.synthesis_from_planes(
                p, k_r2, planes, ws_pivot, cams_d, want_sr=False)["image_depth"]
            stable_planes = generator._planes_nhwc(consts["g_frozen"], ws_pivot)
            stable = jax.lax.stop_gradient(
                generator.synthesis_from_planes(
                    consts["g_frozen"], k_r2, stable_planes, ws_pivot, cams_d,
                    want_sr=False)["image_depth"]
            )
            return total + l2_loss(stable, depth)

        loss = loss + jax.lax.cond(step % s.rot_bs == 0, regs, lambda: 0.0)
        return loss

    s2_carry = (g_params, opt2.init(g_params))

    def s2_step(carry, step, consts):
        p, opt_state = carry
        rng = jax.random.fold_in(jax.random.PRNGKey(9), step)
        grads = jax.grad(s2_loss)(p, step, rng, consts)
        updates, opt_state = opt2.update(grads, opt_state, p)
        updates = jax.tree_util.tree_map(
            lambda m, u: u if m else jnp.zeros_like(u), mask, updates,
            is_leaf=lambda v: isinstance(v, bool),
        )
        import optax as _optax

        return (_optax.apply_updates(p, updates), opt_state), None

    s2_consts = {"g_frozen": g_params, "lpips": lpips_params, "target": target}
    t_stage2 = time_scan_steps(s2_step, s2_carry, s2_consts, n_steps=8)

    per_image_s = 500 * t_stage1 + 1000 * t_stage2

    # ---- real-pipeline sample (host overheads included) --------------------
    # One actual InversionPipeline.invert_image at reduced step counts
    # (identical jitted programs, shorter scan/while_loop), scaled to the
    # reference 500+1000 workload. Catches host-side dispatch, metric
    # renders and early-stop behavior the scan-slope extrapolation can't.
    pipe_scaled_s = None
    try:
        pipe_scaled_s = bench_real_pipeline(
            generator, g_params, s1_steps=50, s2_steps=100,
            t1=t_stage1, t2=t_stage2,
        )
    except Exception as e:  # keep the headline metric robust
        print(f"# real-pipeline bench failed: {type(e).__name__}: {e}",
              flush=True)

    target_s = 120.0
    result = {
        "metric": "per-image inversion wall-clock (500 sg + 1000 RotBbox steps)",
        "value": round(per_image_s, 2),
        "unit": "s",
        "vs_baseline": round(target_s / per_image_s, 3),
        "detail": {
            "stage1_s_per_step": round(t_stage1, 4),
            "stage2_s_per_step": round(t_stage2, 4),
            "pipeline_scaled_s": (
                round(pipe_scaled_s, 2) if pipe_scaled_s is not None else None
            ),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


def bench_real_pipeline(generator, g_params, s1_steps: int, s2_steps: int,
                        t1: float, t2: float):
    """Wall-clock one real InversionPipeline.invert_image (random
    weights, synthetic target) at s1_steps 'mir' + s2_steps RotBbox and
    project to the 500+1000 reference workload: the measured run gives
    the per-image FIXED costs (w-stats, embedding save, metric renders,
    artifacts — everything the scan-slope extrapolation can't see) as
    stageN_s - stepsN * tN, and the steps are extended at the scan-slope
    rates t1/t2. The first call compiles; the measurement reruns on a
    second image."""
    import shutil
    import tempfile

    import numpy as np

    from spi_tpu.data.dataset import InversionSample
    from spi_tpu.training.pipeline import InversionPipeline, PipelineConfig
    from spi_tpu.utils.camera import canonical_camera

    out_root = tempfile.mkdtemp(prefix="spi_bench_")
    try:
        config = PipelineConfig(
            output_root=out_root,
            first_inv_type="mir",
            first_inv_steps=s1_steps,
            G_1_type="RotBbox",
            G_1_step=s2_steps,
            pt_rot_lambda=0.1,
            pt_mirror_rot_lambda=0.0,  # BoxCX needs landmarks
            pt_depth_lambda=1.0,
            # With RANDOM lin-head weights the LPIPS scale is arbitrary
            # and the 0.05 early-stop can fire after one step, making
            # the scaled estimate nonsense; disable it for timing.
            lpips_threshold=-1.0,
        )
        pipeline = InversionPipeline(generator, g_params, config)
        rng = np.random.default_rng(0)

        def sample(i):
            img = np.tanh(
                rng.normal(0, 0.5, (1, 3, 512, 512))
            ).astype(np.float32)
            return InversionSample(
                name=f"bench{i}", image=img,
                camera=np.asarray(canonical_camera()),
            )

        pipeline.invert_image(sample(0))  # compile + warm caches
        t0 = time.time()
        r = pipeline.invert_image(sample(1))
        total = time.time() - t0
        tail = total - r["stage1_s"] - r["stage2_s"]  # metrics+artifacts
        fixed1 = max(r["stage1_s"] - s1_steps * t1, 0.0)
        fixed2 = max(r["stage2_s"] - max(r["steps_run"], 1) * t2, 0.0)
        print(
            f"# real pipeline: stage1={r['stage1_s']:.2f}s/{s1_steps} "
            f"(fixed {fixed1:.2f}s) stage2={r['stage2_s']:.2f}s/"
            f"{r['steps_run']} (fixed {fixed2:.2f}s) tail={tail:.2f}s",
            flush=True,
        )
        return 500 * t1 + fixed1 + 1000 * t2 + fixed2 + tail
    finally:
        shutil.rmtree(out_root, ignore_errors=True)


if __name__ == "__main__":
    main()
