"""EG3D GAN training: losses, SPMD step, EMA, ADA heuristic.

Behavioral spec: eg3d/training/training_loop.py (phase-based G/D
updates with lazy regularization :198-214, grad all_reduce :287-298,
G_ema lerp :305-316, ADA p adjustment :322-326). The companion
training/loss.py module is absent from the reference mirror; the loss
terms reconstructed here are the standard EG3D set its training loop
drives: non-saturating logistic G/D losses, lazy R1 on the dual
(image, image_raw) pair, and the triplane density TV regularizer
(the `density_reg` / 'l1' strategy of the released EG3D configs).

TPU re-design (SURVEY.md §2.7): the reference does manual flat-grad
`torch.distributed.all_reduce` over NCCL; here ONE jitted SPMD step
runs under shard_map over a `data` mesh axis — per-device microbatches,
`jax.lax.pmean` on gradients, replicated params — and XLA overlaps the
reductions with the backward.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from spi_tpu.models.discriminator import DualDiscriminator
from spi_tpu.models.triplane import TriPlaneGenerator

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class GANConfig:
    batch_per_device: int = 4
    g_lr: float = 0.0025
    d_lr: float = 0.002
    beta2: float = 0.99
    r1_gamma: float = 1.0
    r1_interval: int = 16
    density_reg: float = 0.25
    density_reg_p_dist: float = 0.004  # EG3D config: perturbation distance
    density_reg_interval: int = 4
    ema_kimg: float = 10.0
    ada_target: float = 0.6
    ada_interval: int = 4
    ada_kimg: float = 500.0
    style_mixing_prob: float = 0.0

    def ema_beta(self, total_batch: int) -> float:
        # training_loop.py:305-310: ema_nimg = ema_kimg * 1000; beta =
        # 0.5 ** (batch_size / max(ema_nimg, 1e-8))
        return 0.5 ** (total_batch / max(self.ema_kimg * 1000.0, 1e-8))


def logistic_g_loss(gen_logits):
    """Non-saturating G loss: softplus(-D(G(z)))."""
    return jnp.mean(jax.nn.softplus(-gen_logits))


def logistic_d_loss(real_logits, gen_logits):
    """D loss: softplus(D(G(z))) + softplus(-D(real))."""
    return jnp.mean(jax.nn.softplus(gen_logits)) + jnp.mean(
        jax.nn.softplus(-real_logits)
    )


@dataclasses.dataclass(frozen=True)
class GANTrainer:
    generator: TriPlaneGenerator
    discriminator: DualDiscriminator
    config: GANConfig = GANConfig()
    # ADA pipe: applied to BOTH real and generated pairs before D
    # (upstream EG3D StyleGAN2Loss.run_D; the vendored reference strips
    # training/loss.py, so upstream is the spec). None = no augmentation.
    augment: Any = None

    # -- loss pieces -------------------------------------------------------
    def _g_images(self, g_params, z, c, rng):
        ws = self.generator.mapping(g_params, z, c)
        k1, _ = jax.random.split(rng)
        return self.generator.synthesis(g_params, k1, ws, c, noise_mode="random"), ws

    def _augment_pair(self, rng, image, image_raw, p):
        """Apply the SAME per-sample augmentation to the full-res image
        and the raw neural render (run_D augments the 6-channel concat so
        one transform hits both; here the pipe's randomness is purely
        per-sample, so replaying one rng at both resolutions is the same
        joint transform)."""
        if self.augment is None:
            return image, image_raw
        return (
            self.augment(None, rng, image, p),
            self.augment(None, rng, image_raw, p),
        )

    def g_loss(self, g_params, d_params, z, c, rng, step, aug_p=0.0):
        cfg = self.config
        out, ws = self._g_images(g_params, z, c, rng)
        if self.augment is not None:
            k_aug = jax.random.fold_in(rng, 2)
            img, raw = self._augment_pair(k_aug, out["image"], out["image_raw"], aug_p)
            out = {**out, "image": img, "image_raw": raw}
        logits = self.discriminator(d_params, out, c)
        loss = logistic_g_loss(logits)

        def density_tv():
            # EG3D 'l1' density regularization: sigma at uniform points vs
            # epsilon-perturbed points (same formula as the SPI tv loss,
            # spi/criteria/tv_loss.py:9-19).
            kp, kd = jax.random.split(jax.random.fold_in(rng, 1))
            pts = (
                jax.random.uniform(kp, (z.shape[0], 1000, 3)) - 0.5
            ) * self.generator.rendering.box_warp
            offset = jax.random.normal(kd, pts.shape) * cfg.density_reg_p_dist
            dirs = jnp.zeros_like(pts)
            _, sigma_a = self.generator.sample_mixed(g_params, ws, pts, dirs)
            _, sigma_b = self.generator.sample_mixed(g_params, ws, pts + offset, dirs)
            # lazy-regularization gain: the term runs every
            # density_reg_interval steps and is scaled by that interval
            # (training_loop passes gain=phase.interval; r1() below
            # applies the same convention)
            return (
                jnp.mean(jnp.abs(sigma_a - sigma_b))
                * cfg.density_reg
                * cfg.density_reg_interval
            )

        if cfg.density_reg > 0:
            # false branch derives from `loss` so both branches share the
            # same device-varying type under shard_map (VMA check)
            loss = loss + jax.lax.cond(
                step % cfg.density_reg_interval == 0, density_tv, lambda: loss * 0.0
            )
        return loss, jax.lax.stop_gradient(jnp.mean(logits))

    def d_loss(self, d_params, g_params, real, z, c, rng, step, aug_p=0.0):
        cfg = self.config
        out, _ = self._g_images(g_params, z, c, rng)
        out = jax.tree_util.tree_map(jax.lax.stop_gradient, out)
        if self.augment is not None:
            img, raw = self._augment_pair(
                jax.random.fold_in(rng, 3), out["image"], out["image_raw"], aug_p
            )
            out = {**out, "image": img, "image_raw": raw}
        gen_logits = self.discriminator(d_params, out, c)

        real_raw = jax.lax.stop_gradient(
            _downsample_to(real, self.generator.neural_rendering_resolution)
        )
        k_aug_real = jax.random.fold_in(rng, 4)

        def real_logits_fn(img_pair):
            # Augmentation INSIDE: R1 penalizes gradients w.r.t. the raw
            # real images, flowing through the (differentiable) pipe —
            # matching upstream's run_D on a requires_grad real batch.
            image, image_raw = self._augment_pair(
                k_aug_real, img_pair[0], img_pair[1], aug_p
            )
            return self.discriminator(
                d_params, {"image": image, "image_raw": image_raw}, c
            )

        real_logits = real_logits_fn((real, real_raw))
        loss = logistic_d_loss(real_logits, gen_logits)

        def r1():
            # lazy R1 on both inputs of the dual discriminator
            grads = jax.grad(lambda pair: jnp.sum(real_logits_fn(pair)))(
                (real, real_raw)
            )
            penalty = sum(jnp.sum(jnp.square(g), axis=(1, 2, 3)) for g in grads)
            return jnp.mean(penalty) * (cfg.r1_gamma / 2) * cfg.r1_interval

        if cfg.r1_gamma > 0:
            loss = loss + jax.lax.cond(step % cfg.r1_interval == 0, r1, lambda: loss * 0.0)
        # ADA heuristic signal: E[sign(D(real))] (training_loop.py:322-326)
        rt = jnp.mean(jnp.sign(real_logits))
        return loss, jax.lax.stop_gradient(rt)

    # -- SPMD step ---------------------------------------------------------
    def optimizers(self):
        cfg = self.config
        # lazy-regularization lr/beta scaling (SG2 convention)
        g_mb = cfg.density_reg_interval / (cfg.density_reg_interval + 1)
        d_mb = cfg.r1_interval / (cfg.r1_interval + 1)
        g_opt = optax.adam(cfg.g_lr * g_mb, b1=0.0, b2=cfg.beta2**g_mb)
        d_opt = optax.adam(cfg.d_lr * d_mb, b1=0.0, b2=cfg.beta2**d_mb)
        return g_opt, d_opt

    def init_state(self, key):
        kg, kd = jax.random.split(key)
        g_params = self.generator.init(kg)
        d_params = self.discriminator.init(kd)
        g_opt, d_opt = self.optimizers()
        return {
            "g": g_params,
            "d": d_params,
            "g_ema": g_params,
            "g_opt": g_opt.init(g_params),
            "d_opt": d_opt.init(d_params),
            "step": jnp.zeros((), jnp.int32),
        }

    def make_step(self, mesh=None):
        """Returns step(state, real, z, c, rng) -> (state, metrics).

        With `mesh`, runs as shard_map over its 'data' axis: params
        replicated, (real, z, c, rng) sharded on the leading axis,
        gradients pmean'd over devices — the jax-native analog of
        training_loop.py:287-298."""
        g_opt, d_opt = self.optimizers()
        cfg = self.config

        def step_impl(state, real, z, c, rng, aug_p, axis_name=None):
            kd, kg = jax.random.split(jax.random.fold_in(rng, state["step"]))

            (d_l, rt), d_grads = jax.value_and_grad(self.d_loss, has_aux=True)(
                state["d"], state["g"], real, z, c, kd, state["step"], aug_p
            )
            if axis_name is not None:
                d_grads = jax.lax.pmean(d_grads, axis_name)
                rt = jax.lax.pmean(rt, axis_name)
            d_updates, d_opt_state = d_opt.update(d_grads, state["d_opt"], state["d"])
            d_params = optax.apply_updates(state["d"], d_updates)

            (g_l, fake_score), g_grads = jax.value_and_grad(self.g_loss, has_aux=True)(
                state["g"], d_params, z, c, kg, state["step"], aug_p
            )
            if axis_name is not None:
                g_grads = jax.lax.pmean(g_grads, axis_name)
            g_updates, g_opt_state = g_opt.update(g_grads, state["g_opt"], state["g"])
            g_params = optax.apply_updates(state["g"], g_updates)

            n_dev = 1 if axis_name is None else jax.lax.psum(1, axis_name)
            beta = cfg.ema_beta(cfg.batch_per_device * n_dev)
            g_ema = jax.tree_util.tree_map(
                lambda e, p: e * beta + p * (1 - beta), state["g_ema"], g_params
            )

            new_state = {
                "g": g_params, "d": d_params, "g_ema": g_ema,
                "g_opt": g_opt_state, "d_opt": d_opt_state,
                "step": state["step"] + 1,
            }
            metrics = {"loss_g": g_l, "loss_d": d_l, "rt": rt,
                       "fake_score": fake_score}
            if axis_name is not None:
                metrics = jax.lax.pmean(metrics, axis_name)
            return new_state, metrics

        if mesh is None:

            def local_step(state, real, z, c, rng, aug_p=0.0):
                return step_impl(state, real, z, c, rng, aug_p, axis_name=None)

            return jax.jit(local_step)

        from jax.sharding import PartitionSpec as P

        replicated = P()
        sharded = P("data")

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(replicated, sharded, sharded, sharded, sharded, replicated),
            out_specs=(replicated, replicated),
        )
        def sharded_step(state, real, z, c, rng, aug_p):
            return step_impl(state, real, z, c, rng[0], aug_p, axis_name="data")

        def entry(state, real, z, c, rng, aug_p=0.0):
            return sharded_step(state, real, z, c, rng, jnp.asarray(aug_p, jnp.float32))

        return jax.jit(entry)


def _downsample_to(img, size: int):
    from spi_tpu.models.discriminator import filtered_resizing

    return filtered_resizing(img, size)


def adjust_ada_p(p: float, rt: float, config: GANConfig, total_batch: int) -> float:
    """ADA probability update (training_loop.py:322-326): move p toward
    keeping E[sign(D_real)] at ada_target."""
    adjust = (
        jnp.sign(rt - config.ada_target)
        * (total_batch * config.ada_interval)
        / (config.ada_kimg * 1000)
    )
    return float(jnp.clip(p + adjust, 0.0, 1.0))
