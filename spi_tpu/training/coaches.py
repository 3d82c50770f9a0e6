"""Stage-2 generator tuning: PTI and SPI-RotBbox coaches.

Specs:
- SingleIDCoach / PTI (spi/training/coaches/pti_coach.py): per step,
  L2 + LPIPS reconstruction on the target camera; Adam(3e-4) over all G
  parameters; early stop at LPIPS <= 0.05.
- RotBboxCoach (spi/training/coaches/rot_bbox_cx_coach.py): adds, every
  `rot_bs`=4 steps, (a) rot loss = LPIPS(gen @ surrounding cams,
  depth-warped source), (b) mirror-rot loss = BoxCX on flipped mirror
  warps (gated on the yaw weight), (c) depth anchor loss vs the frozen
  original generator at random cameras, (d) density TV loss.

TPU redesign: the whole per-image tuning loop is ONE
`lax.while_loop` whose body is a fused loss+grad+Adam update over the
full generator pytree; the 4-step regularizer cadence is a `lax.cond`;
early stopping exits the while_loop (true early exit, not masked
no-ops). The reference's separate .backward() calls per loss term are a
single summed-gradient computation (mathematically identical).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from spi_tpu.criteria.bbox_cx import BoxCXLoss
from spi_tpu.criteria.l2_loss import l2_loss
from spi_tpu.criteria.lpips import LPIPS
from spi_tpu.criteria.tv_loss import tv_loss
from spi_tpu.models.triplane import TriPlaneGenerator
from spi_tpu.utils import camera as cam
from spi_tpu.utils import rotate as rot
from spi_tpu.utils.params import trainable_mask


@dataclasses.dataclass(frozen=True)
class CoachSettings:
    """Defaults mirror spi/configs/hyperparameters.py."""

    num_steps: int = 1000  # G_1_step
    learning_rate: float = 3e-4  # pti_learning_rate
    lpips_threshold: float = 0.05  # LPIPS_value_threshold
    l2_lambda: float = 1.0
    lpips_lambda: float = 1.0
    rot_lambda: float = 0.1
    mirror_rot_lambda: float = 0.05
    depth_lambda: float = 1.0
    tv_lambda: float = 0.0
    rot_bs: int = 4
    yaw_range: float = 0.2  # adapt_yaw_range default (coach :60-63)
    pitch_range: float = 0.1
    depth_yaw_range: float = 0.7
    depth_pitch_range: float = 0.4
    warp_eps: float = 5e-2
    # Every N steps, emit the current reconstruction through the
    # snapshot callback (global_config.py:7 log_snapshot=100 +
    # rot_bbox_cx_coach.py:153-154). 0 = off.
    log_snapshot: int = 0


def pti_settings(num_steps: int = 1000) -> CoachSettings:
    """PTI = reconstruction only (pti_coach.py:19-32)."""
    return CoachSettings(
        num_steps=num_steps, rot_lambda=0.0, mirror_rot_lambda=0.0,
        depth_lambda=0.0, tv_lambda=0.0,
    )


@dataclasses.dataclass(frozen=True)
class CoachInputs:
    """Per-image tensors the tuning loop consumes."""

    target: Any  # (1, 3, R, R) in [-1, 1]
    camera: Any  # (1, 25)
    w_pivot: Any  # (1, num_ws, C)
    face_mask: Any = None  # (1, 1, R, R) from parsing (mask_utils.py:4-24)
    landmarks: Any = None  # (1, 68, 2) at 256 scale


def tune_generator(
    generator: TriPlaneGenerator,
    g_params,  # fresh generator params WITH stage-1 noise substituted
    original_g_params,  # frozen copy for the depth anchor
    lpips: LPIPS,
    lpips_params,
    inputs: CoachInputs,
    rng,
    settings: CoachSettings = CoachSettings(),
    box_cx: BoxCXLoss | None = None,
    box_cx_params=None,
    snapshot_cb=None,
):
    """Run the stage-2 loop. Returns (tuned_params, (steps_run, last_lpips)).

    snapshot_cb(step, image), if given, receives the current
    reconstruction every settings.log_snapshot steps. Pass a STABLE
    callable (e.g. a bound method) — it is part of the compile cache key.
    """
    run = _build_tune_fn(generator, lpips, settings, box_cx, snapshot_cb)
    return run(
        g_params, original_g_params, lpips_params, box_cx_params,
        inputs.target, inputs.camera, inputs.w_pivot,
        inputs.face_mask, inputs.landmarks, rng,
    )


@functools.lru_cache(maxsize=16)
def _build_tune_fn(generator: TriPlaneGenerator, lpips: LPIPS,
                   settings: CoachSettings, box_cx: BoxCXLoss | None,
                   snapshot_cb=None):
    """Cached per (generator, lpips, settings, box_cx, snapshot_cb): the
    jitted while_loop program takes minutes to compile and must be reused
    across images, not re-traced per call."""
    s = settings
    opt = optax.adam(s.learning_rate)
    depth_res = generator.neural_rendering_resolution

    # Arrays enter the jitted program as ARGUMENTS — closure-captured
    # arrays become XLA constants and trigger pathological compile-time
    # constant folding of the perception subgraphs.
    @jax.jit
    def run(g_params, original_g_params, lpips_params, box_cx_params,
            target, camera, ws, face_mask, landmarks, rng):
        use_mirror_rot = (
            s.mirror_rot_lambda > 0 and box_cx is not None and landmarks is not None
        )
        mask = trainable_mask(g_params)
        camera_m = cam.mirror_camera(camera)
        image_m = jnp.flip(target, axis=3)
        weight_m = cam.cal_camera_weight(camera)[0]
        face_mask_m = jnp.flip(face_mask, axis=3) if face_mask is not None else None
        opt_state = opt.init(g_params)

        # The frozen generator's planes depend only on (params, ws) —
        # both fixed through the loop — so XLA hoists this out of the
        # while_loop (computed once per image).
        stable_planes = generator._planes_nhwc(original_g_params, ws)
        # The recon target is constant through the loop: compute its VGG
        # feature pyramid ONCE here (outside the while_loop body) instead
        # of per step — saves a full LPIPS-VGG forward (plus its remat
        # recompute in the backward) every tuning step.
        target_feats = jax.lax.stop_gradient(lpips.features(lpips_params, target))

        def recon_loss(p, planes, step_rng):
            out = generator.synthesis_from_planes(p, step_rng, planes, ws, camera)
            img = out["image"]
            loss = 0.0
            if s.l2_lambda > 0:
                loss += l2_loss(img, target) * s.l2_lambda
            lp = lpips(lpips_params, img, target, y_feats=target_feats)
            if s.lpips_lambda > 0:
                loss += lp * s.lpips_lambda
            return loss, (lp, out["image_depth"])

        def reg_losses(p, planes, gen_depth, step_rng):
            """The every-rot_bs-steps terms (rot_bbox_cx_coach.py:87-146)."""
            k_rot, k_rotm, k_depth, k_tv, k_r1, k_r2, k_r3 = jax.random.split(step_rng, 7)
            total = 0.0

            if s.rot_lambda > 0:
                cams = cam.sample_surrounding_camera(
                    k_rot, camera, batch_size=s.rot_bs,
                    yaw_range=s.yaw_range, pitch_range=s.pitch_range,
                )
                out = generator.synthesis_from_planes(p, k_r1, planes, ws, cams)
                warp_img, warp_mask = jax.lax.stop_gradient(
                    rot.rotate(
                        target_camera=cams,
                        target_depth=out["image_depth"],
                        src_image=jnp.tile(target, (s.rot_bs, 1, 1, 1)),
                        src_camera=jnp.tile(camera, (s.rot_bs, 1)),
                        src_depth=jnp.tile(gen_depth, (s.rot_bs, 1, 1, 1)),
                        src_mask=(
                            jnp.tile(face_mask, (s.rot_bs, 1, 1, 1))
                            if face_mask is not None else None
                        ),
                        eps=s.warp_eps,
                        depth_resolution=depth_res,
                    )
                )
                loss_rot = lpips(lpips_params, out["image"] * warp_mask, warp_img)
                total += loss_rot * s.rot_lambda * s.rot_bs

            if use_mirror_rot:
                cams_m = cam.sample_surrounding_camera(
                    k_rotm, camera_m, batch_size=s.rot_bs,
                    yaw_range=s.yaw_range, pitch_range=s.pitch_range,
                )
                out_m = generator.synthesis_from_planes(p, k_r2, planes, ws, cams_m)
                gen_depth_m = jnp.flip(gen_depth, axis=3)
                warp_img_m, warp_mask_m = jax.lax.stop_gradient(
                    rot.rotate(
                        target_camera=cams_m,
                        target_depth=out_m["image_depth"],
                        src_image=jnp.tile(image_m, (s.rot_bs, 1, 1, 1)),
                        src_camera=jnp.tile(camera_m, (s.rot_bs, 1)),
                        src_depth=jnp.tile(gen_depth_m, (s.rot_bs, 1, 1, 1)),
                        src_mask=(
                            jnp.tile(face_mask_m, (s.rot_bs, 1, 1, 1))
                            if face_mask_m is not None else None
                        ),
                        eps=s.warp_eps,
                        depth_resolution=depth_res,
                    )
                )
                flip_gen = jnp.flip(out_m["image"], axis=3)
                flip_warp_img = jnp.flip(warp_img_m, axis=3)
                flip_warp_mask = jnp.flip(warp_mask_m, axis=3)
                lm = jnp.tile(landmarks, (s.rot_bs, 1, 1))
                loss_rot_m = box_cx(
                    box_cx_params, flip_gen * flip_warp_mask, flip_warp_img, lm
                )
                # gate on yaw weight like `weight_m > 0` (coach :107)
                total += jnp.where(weight_m > 0, loss_rot_m, 0.0) * s.mirror_rot_lambda * s.rot_bs

            if s.depth_lambda > 0:
                cams_d = cam.sample_camera(
                    k_depth, batch_size=4,
                    yaw_range=s.depth_yaw_range, pitch_range=s.depth_pitch_range,
                )
                # depth-only renders: skip the superresolution CNN
                depth = generator.synthesis_from_planes(
                    p, k_r3, planes, ws, cams_d, want_sr=False
                )["image_depth"]
                stable = jax.lax.stop_gradient(
                    generator.synthesis_from_planes(
                        original_g_params, k_r3, stable_planes, ws, cams_d,
                        want_sr=False,
                    )["image_depth"]
                )
                total += l2_loss(stable, depth) * s.depth_lambda

            if s.tv_lambda > 0:
                total += tv_loss(k_tv, generator, p, ws) * s.tv_lambda

            return total

        has_reg = (
            s.rot_lambda > 0 or use_mirror_rot or s.depth_lambda > 0 or s.tv_lambda > 0
        )

        def total_loss(p, step, step_rng):
            k_recon, k_reg = jax.random.split(step_rng)
            # one backbone pass serves recon + every regularizer term
            planes = generator._planes_nhwc(p, ws)
            loss, (lp, gen_depth) = recon_loss(p, planes, k_recon)
            if has_reg:
                # The skip branch's zero is derived from `loss` (not a
                # literal 0.0) so that under shard_map both branches have
                # the same varying-manual-axes type (see JAX shard_map
                # scan-vma docs); XLA folds the multiply away.
                loss = loss + jax.lax.cond(
                    step % s.rot_bs == 0,
                    lambda: reg_losses(p, planes, gen_depth, k_reg),
                    lambda: loss * 0.0,
                )
            return loss, lp

        def cond_fn(carry):
            _, _, step, lp = carry
            return (step < s.num_steps) & (lp > s.lpips_threshold)

        def body_fn(carry):
            params, opt_state, step, lp_prev = carry
            # Per-lane activity flag: identical to cond_fn, so a scalar
            # run always has active=True. Under vmap (SPMD multi-image
            # inversion) the while_loop keeps iterating until EVERY lane's
            # cond is false; gating the update AND the step counter on the
            # lane's own cond makes extra iterations exact no-ops for
            # finished images.
            active = (step < s.num_steps) & (lp_prev > s.lpips_threshold)
            step_rng = jax.random.fold_in(rng, step)
            (_, lp), grads = jax.value_and_grad(total_loss, has_aux=True)(
                params, step, step_rng
            )

            if snapshot_cb is not None and s.log_snapshot > 0:
                # Mid-run image snapshots (rot_bbox_cx_coach.py:153-154):
                # a forward-only re-render every log_snapshot steps,
                # shipped to the host via debug.callback (async, does not
                # stall the device loop).
                def dump_snapshot():
                    img = generator.synthesis(
                        params, step_rng, ws, camera, noise_mode="const"
                    )["image"]
                    jax.debug.callback(snapshot_cb, step, img)

                jax.lax.cond(
                    step % s.log_snapshot == 0, dump_snapshot, lambda: None
                )
            # Early-stop semantics (coach :148-151): when THIS step's lpips is
            # already under threshold, skip the update (reference breaks before
            # optimizer.step()).
            updates, new_opt_state = opt.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(
                lambda m, u: u if m else jnp.zeros_like(u), mask, updates,
                is_leaf=lambda v: isinstance(v, bool),
            )
            apply = active & (lp > s.lpips_threshold)

            def do_apply():
                return optax.apply_updates(params, updates), new_opt_state

            def skip():
                return params, opt_state

            params2, opt_state2 = jax.lax.cond(apply, do_apply, skip)
            return (
                params2, opt_state2,
                step + active.astype(step.dtype),
                jnp.where(active, lp, lp_prev),
            )

        # Derive the init step/lpips slots from `target` (varying under
        # shard_map/vmap) rather than literals: while_loop carries must
        # keep fixed varying-manual-axes types across iterations, and
        # both slots become varying after one body step. XLA folds the
        # zero multiply away.
        vzero = jnp.sum(target[:, 0, 0, 0]) * 0.0
        init = (
            g_params, opt_state,
            vzero.astype(jnp.int32), jnp.float32(jnp.inf) + vzero,
        )
        params_final, _, steps_run, last_lp = jax.lax.while_loop(cond_fn, body_fn, init)
        return params_final, (steps_run, last_lp)

    return run
