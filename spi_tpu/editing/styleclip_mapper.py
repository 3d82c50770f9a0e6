"""StyleCLIP latent mapper (text-conditioned w+ edits), TPU-native.

Behavioral spec: ZSSGAN/mapper/latent_mappers.py:8-59 (Mapper: 4x
[PixelNorm -> EqualLinear(512) -> LeakyReLU]; LevelsMapper: separate
coarse (w 0:4) / medium (4:8) / fine (8:) mappers) and
ZSSGAN/mapper/styleclip_mapper.py (edit = w + 0.1 * mapper(w)), plus
the training objective of ZSSGAN/mapper/training/coach.py (CLIP
similarity + latent-L2 + ID losses).

TPU design: the mapper is a small param pytree; one jitted step
optimizes it with Adam over batches of w codes rendered through the
(frozen) generator and scored by CLIP against a fixed text prompt.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

Params = dict[str, Any]


def _pixel_norm(x, eps: float = 1e-8):
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + eps)


@dataclasses.dataclass(frozen=True)
class Mapper:
    """PixelNorm ONCE at the input, then depth x EqualLinear(dim,
    lr_mul=0.01, activation='fused_lrelu') (latent_mappers.py:8-28).

    EqualLinear stores weights pre-divided by lr_mul and applies the
    runtime scale lr_mul/sqrt(dim) (equalized lr with a 100x-damped
    effective step); fused_lrelu is leaky_relu(x + b, 0.2) * sqrt(2).
    """

    dim: int = 512
    depth: int = 4
    lr_mul: float = 0.01

    def init(self, key) -> Params:
        keys = jax.random.split(key, self.depth)
        return {
            str(i): {
                "weight": jax.random.normal(keys[i], (self.dim, self.dim))
                / self.lr_mul,
                "bias": jnp.zeros((self.dim,)),
            }
            for i in range(self.depth)
        }

    def __call__(self, params: Params, x):
        x = _pixel_norm(x)
        scale = self.lr_mul / jnp.sqrt(jnp.asarray(self.dim, jnp.float32))
        gain = jnp.sqrt(jnp.asarray(2.0, x.dtype))
        for i in range(self.depth):
            p = params[str(i)]
            x = x @ (p["weight"].T * scale) + p["bias"] * self.lr_mul
            x = jax.nn.leaky_relu(x, 0.2) * gain
        return x


@dataclasses.dataclass(frozen=True)
class LevelsMapper:
    """Independent mappers over coarse/medium/fine w+ slices
    (latent_mappers.py:31-59)."""

    dim: int = 512
    num_ws: int = 14
    use_coarse: bool = True
    use_medium: bool = True
    use_fine: bool = True

    @property
    def mapper(self) -> Mapper:
        return Mapper(dim=self.dim)

    def init(self, key) -> Params:
        ks = jax.random.split(key, 3)
        p = {}
        if self.use_coarse:
            p["course_mapping"] = self.mapper.init(ks[0])  # sic: upstream name
        if self.use_medium:
            p["medium_mapping"] = self.mapper.init(ks[1])
        if self.use_fine:
            p["fine_mapping"] = self.mapper.init(ks[2])
        return p

    def __call__(self, params: Params, w):
        """w: (N, num_ws, dim) -> delta of the same shape."""
        coarse = w[:, :4]
        medium = w[:, 4:8]
        fine = w[:, 8:]
        coarse = (
            self.mapper(params["course_mapping"], coarse)
            if self.use_coarse else jnp.zeros_like(coarse)
        )
        medium = (
            self.mapper(params["medium_mapping"], medium)
            if self.use_medium else jnp.zeros_like(medium)
        )
        fine = (
            self.mapper(params["fine_mapping"], fine)
            if self.use_fine else jnp.zeros_like(fine)
        )
        return jnp.concatenate([coarse, medium, fine], axis=1)


@dataclasses.dataclass(frozen=True)
class StyleCLIPSettings:
    lr: float = 0.5
    edit_scale: float = 0.1  # styleclip_mapper.py: w + 0.1 * mapper(w)
    id_lambda: float = 0.1
    latent_l2_lambda: float = 0.8
    batch: int = 2


@dataclasses.dataclass(frozen=True)
class StyleCLIPCoach:
    """Trains a LevelsMapper so G(w + 0.1*M(w)) matches a text prompt.

    `generator_render(g_params, rng, ws) -> image` abstracts over the
    2D/EG3D generator; `clip_loss` scores image vs target tokens
    (global CLIP loss); `id_loss(params, a, b)` optional identity term.
    """

    mapper: LevelsMapper
    settings: StyleCLIPSettings = StyleCLIPSettings()

    def optimizer(self):
        return optax.adam(self.settings.lr)

    def make_step(self, generator_render, clip_global_loss, id_loss=None):
        s = self.settings
        opt = self.optimizer()

        def loss_fn(m_params, g_params, clip_params, target_tokens,
                    id_params, ws, rng):
            delta = self.mapper(m_params, ws)
            ws_edit = ws + s.edit_scale * delta
            k1, k2 = jax.random.split(rng)
            img_edit = generator_render(g_params, k1, ws_edit)
            loss = clip_global_loss(clip_params, img_edit, target_tokens)
            # reference penalizes MSE(w_hat, w) = mean((edit_scale*delta)^2)
            # (coach.py:211 with w_hat = w + 0.1*mapper(w))
            loss = loss + s.latent_l2_lambda * jnp.mean(
                jnp.square(s.edit_scale * delta)
            )
            if id_loss is not None and s.id_lambda > 0:
                img_orig = jax.lax.stop_gradient(
                    generator_render(g_params, k2, ws)
                )
                loss = loss + s.id_lambda * id_loss(id_params, img_edit, img_orig)
            return loss

        def step(m_params, opt_state, g_params, clip_params, target_tokens,
                 id_params, ws, rng):
            loss, grads = jax.value_and_grad(loss_fn)(
                m_params, g_params, clip_params, target_tokens, id_params, ws, rng
            )
            updates, opt_state = opt.update(grads, opt_state, m_params)
            return optax.apply_updates(m_params, updates), opt_state, loss

        return jax.jit(step)
