"""Stage-1 latent projection: optimize (w, noise buffers) to reproduce
the target image.

Specs:
- 'sg'  : spi/training/projectors/w_projector.py (single w repeated to
          14, VGG16 feature distance at 256^2, noise autocorrelation
          regularizer x1e5, per-step noise renorm, cosine lr ramp,
          annealed w-noise).
- 'sgw+': spi/training/projectors/w_plus_projector.py (full 14x512 w+,
          LPIPS loss instead of raw VGG distance).
- 'mir' : spi/training/projectors/mirror_projector.py (batch-2 render at
          [c, mirror(c)], LPIPS + yaw-weighted mirror LPIPS).

TPU redesign: the whole optimization is ONE jit-compiled `lax.scan` over
steps; (w, noise, Adam state) is the scan carry; per-step randomness is
`fold_in`-derived. The reference's 500 eager torch steps become a single
XLA program.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from spi_tpu.criteria.lpips import LPIPS
from spi_tpu.criteria.noise_reg import noise_regularization, normalize_noise
from spi_tpu.models.triplane import TriPlaneGenerator
from spi_tpu.ops import resize_area
from spi_tpu.utils import camera as cam
from spi_tpu.utils.params import extract_noise, init_noise_like, replace_noise


@dataclasses.dataclass(frozen=True)
class ProjectorSettings:
    mode: str = "sg"  # 'sg' | 'sgw+' | 'mir'
    num_steps: int = 500
    w_avg_samples: int = 600
    initial_lr: float = 5e-3  # hyperparameters.first_inv_lr
    initial_noise_factor: float = 0.05
    lr_rampdown_length: float = 0.25
    lr_rampup_length: float = 0.05
    noise_ramp_length: float = 0.75
    regularize_noise_weight: float = 1e5


@functools.lru_cache(maxsize=16)
def _mapping_head_fn(generator: TriPlaneGenerator):
    # Cached per generator config: a fresh jax.jit(closure) per call
    # would recompile the mapping network for every image.
    @jax.jit
    def run(g_params, z, c):
        ws = generator.mapping(g_params, z, c)
        return ws[:, :1, :]

    return run


def compute_w_stats(generator: TriPlaneGenerator, g_params, camera, n_samples: int):
    """w_avg / w_std from fixed-seed z samples (w_projector.py:34-40;
    RandomState(123) kept for parity with the reference)."""
    z = np.random.RandomState(123).randn(n_samples, generator.z_dim).astype(np.float32)
    c = jnp.broadcast_to(camera[:1], (n_samples, camera.shape[-1]))

    w_samples = _mapping_head_fn(generator)(g_params, jnp.asarray(z), c)
    w_avg = jnp.mean(w_samples, axis=0, keepdims=True)  # (1, 1, C)
    w_std = float(jnp.sqrt(jnp.sum(jnp.square(w_samples - w_avg)) / n_samples))
    return w_avg, w_std


def _lr_schedule(step, settings: ProjectorSettings):
    """Cosine rampdown x linear rampup (w_projector.py:66-72)."""
    t = step / settings.num_steps
    lr_ramp = jnp.minimum(1.0, (1.0 - t) / settings.lr_rampdown_length)
    lr_ramp = 0.5 - 0.5 * jnp.cos(lr_ramp * math.pi)
    lr_ramp = lr_ramp * jnp.minimum(1.0, t / settings.lr_rampup_length)
    return settings.initial_lr * lr_ramp


def _w_noise_scale(step, w_std, settings: ProjectorSettings):
    t = step / settings.num_steps
    ramp = jnp.maximum(0.0, 1.0 - t / settings.noise_ramp_length) ** 2
    return w_std * settings.initial_noise_factor * ramp


def vgg_feature_distance(lpips: LPIPS, p_params, x, y, y_feats=None):
    """StyleGAN-projector feature distance (w_projector.py:48-51,80-87).

    The reference feeds 256^2 images to the NVIDIA torchscript VGG16 and
    takes the summed squared difference of its `return_lpips=True`
    embedding. That embedding is, per layer, the channel-unit-normalized
    activation scaled by sqrt(lin_l)/sqrt(H_l*W_l) and flattened — so the
    squared distance is EXACTLY the richzhang LPIPS value:
        sum_l mean_hw sum_c lin_lc (nf_x - nf_y)^2
    computed here from our VGG16 stack + lin heads (convert the
    torchscript vgg16.pt with `spi_tpu.convert nvidia_vgg16` to get the
    reference's weights; parity:
    tests/test_torch_parity_perception.py::TestSgOracle).
    """
    fx = lpips.features(p_params, x)
    fy = y_feats if y_feats is not None else lpips.features(p_params, y)
    total = 0.0
    for a, b, lin in zip(fx, fy, p_params["lin"]):
        per_pixel = jnp.einsum("nchw,c->nhw", jnp.square(a - b), lin)
        total = total + jnp.sum(jnp.mean(per_pixel, axis=(1, 2)))
    return total


def project(
    generator: TriPlaneGenerator,
    g_params,
    lpips: LPIPS,
    lpips_params,
    target,  # (1, 3, R, R) in [-1, 1]
    camera,  # (1, 25)
    rng,
    settings: ProjectorSettings = ProjectorSettings(),
    fg_mask=None,  # accepted for reference-signature parity; see below
    initial_w=None,
):
    """Run stage-1 projection. Returns (w_pivot (1, num_ws, C), noise_tree).

    The returned noise tree holds the OPTIMIZED noise_const buffers; the
    stage-2 coach must render with them (the reference mutates G's
    buffers in place, so stage 2 inherits them implicitly).

    `fg_mask` intentionally has no effect: the reference's mirror
    projector derives a dilated-background depth prior from it
    (mirror_projector.py:74-79,117-118) but never adds that `bg_loss`
    to the optimized loss (:120), so parity means accepting and
    ignoring it.
    """
    num_ws = generator.num_ws
    w_avg, w_std = compute_w_stats(generator, g_params, camera, settings.w_avg_samples)

    rng_noise_init, rng_steps = jax.random.split(rng)
    noise0 = init_noise_like(rng_noise_init, g_params)

    if settings.mode == "sg":
        w0 = w_avg if initial_w is None else initial_w  # (1, 1, C)
    else:
        w0 = (
            jnp.tile(w_avg, (1, num_ws, 1)) if initial_w is None else initial_w
        )  # (1, L, C)

    run = _build_project_fn(generator, lpips, settings)
    return run(
        g_params, lpips_params, target, camera, w0, noise0,
        jnp.float32(w_std), rng_steps,
    )


@functools.lru_cache(maxsize=16)
def _build_project_fn(generator: TriPlaneGenerator, lpips: LPIPS,
                      settings: ProjectorSettings):
    """Cached per (generator, lpips, settings): the jitted 500-step scan
    takes minutes to compile, and a fresh closure per image would repeat
    that compile for every image in a run."""
    num_ws = generator.num_ws

    # ALL arrays enter the jitted program as ARGUMENTS: anything captured
    # by closure becomes an XLA constant, and XLA then constant-folds the
    # whole target-feature subgraph at compile time (minutes of
    # single-threaded folding for the VGG stack).
    @jax.jit
    def run(g_params, lpips_params, target, camera, w0, noise0, w_std, rng_steps):
        # The projection target(s) are constant across the 500-step scan:
        # compute their VGG feature pyramids ONCE, outside the scan body,
        # so the per-step loss only runs VGG on the rendered image.
        if settings.mode == "mir":
            camera_m = cam.mirror_camera(camera)
            cameras = jnp.concatenate([camera, camera_m], axis=0)
            target_m = jnp.flip(target, axis=3)
            weight_m = cam.cal_camera_weight(camera_m)[0]
            target_feats = jax.lax.stop_gradient(
                lpips.features(lpips_params, target)
            )
            target_m_feats = jax.lax.stop_gradient(
                lpips.features(lpips_params, target_m)
            )
        elif settings.mode == "sg":
            y256 = target
            if y256.shape[-1] > 256:
                y256 = resize_area(y256, (256, 256))
            target_feats = jax.lax.stop_gradient(lpips.features(lpips_params, y256))
        else:
            target_feats = jax.lax.stop_gradient(lpips.features(lpips_params, target))

        def loss_fn(w, noise, step_rng, step):
            g = replace_noise(g_params, noise)
            w_noise = (
                jax.random.normal(step_rng, w.shape)
                * _w_noise_scale(step, w_std, settings)
            )
            ws = w + w_noise
            if settings.mode == "sg":
                ws = jnp.tile(ws, (1, num_ws, 1))

            render_rng = jax.random.fold_in(step_rng, 1)
            if settings.mode == "mir":
                # one backbone pass shared by the [c, mirror(c)] pair
                planes = generator._planes_nhwc(g, ws)
                out = generator.synthesis_from_planes(
                    g, render_rng, planes, ws, cameras
                )
                img = out["image"]
                dist = lpips(
                    lpips_params, img[:1], target, y_feats=target_feats
                ) + weight_m * lpips(
                    lpips_params, img[1:], target_m, y_feats=target_m_feats
                )
            else:
                out = generator.synthesis(g, render_rng, ws, camera, noise_mode="const")
                img = out["image"]
                if settings.mode == "sg":
                    # area-pool to 256 only when larger (w_projector.py:47-51)
                    x = img
                    if x.shape[-1] > 256:
                        x = resize_area(x, (256, 256))
                    dist = vgg_feature_distance(
                        lpips, lpips_params, x, None, y_feats=target_feats
                    )
                else:
                    dist = lpips(lpips_params, img, target, y_feats=target_feats)

            reg = noise_regularization(noise)
            return dist + reg * settings.regularize_noise_weight, dist

        opt = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
        params0 = {"w": w0, "noise": noise0}
        opt_state0 = opt.init(params0)

        def step_fn(carry, step):
            params, opt_state = carry
            step_rng = jax.random.fold_in(rng_steps, step)
            (loss, dist), grads = jax.value_and_grad(
                lambda p: loss_fn(p["w"], p["noise"], step_rng, step), has_aux=True
            )(params)
            updates, opt_state = opt.update(grads, opt_state)
            lr = _lr_schedule(step, settings)
            params = jax.tree_util.tree_map(lambda p, u: p - lr * u, params, updates)
            params = {"w": params["w"], "noise": normalize_noise(params["noise"])}
            return (params, opt_state), dist

        (params_final, _), dists = jax.lax.scan(
            step_fn, (params0, opt_state0), jnp.arange(settings.num_steps)
        )

        w = params_final["w"]
        if settings.mode == "sg":
            # w_projector.py:113 returns the single w repeated to all layers
            w = jnp.tile(w, (1, num_ws, 1))
        return w, params_final["noise"], dists

    return run
