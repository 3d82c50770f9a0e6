"""Twin-generator CLIP-guided domain editing (ZSSGAN / StyleGAN-NADA).

Behavioral spec: ZSSGAN/model/ZSSGAN_eg3d.py + ZSSGAN/train.py. A frozen
and a trainable copy of a (usually SPI-tuned) EG3D generator render the
same w codes at the canonical front camera; a weighted sum of per-CLIP-
model directional losses pulls the trainable render toward the target
text domain; only backbone synthesis conv layers receive gradients.

TPU re-design:
- The torch version toggles `requires_grad` on module objects
  (ZSSGAN_eg3d.py:57-85, 232-240); here trainability is an explicit
  boolean pytree mask applied to gradients (optax-style masking), so
  the whole step stays one compiled program.
- The reference's layer list is built positionally from
  `backbone.children()` with hardcoded index sets
  (ZSSGAN_eg3d.py:190-206); the equivalent selection here is by NAME:
  every `backbone.synthesis.b{res}.conv0/conv1` subtree (modulated
  convs + their affines + noise), excluding torgb, mapping, the NeRF
  decoder and superresolution — the set the index lists aim at.
- `determine_opt_layers` (ZSSGAN_eg3d.py:161-217) runs a short w-space
  optimization and ranks w slots; the reference computes the ranking
  then overrides it with all conv layers (:206). `rank_w_slots`
  reproduces the ranking; the default mask matches the shipped
  behavior (all conv layers).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from spi_tpu.editing.clip_loss import CLIPLossState, DirectionalCLIPLoss
from spi_tpu.models.triplane import TriPlaneGenerator
from spi_tpu.utils.camera import canonical_camera

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class EditingSettings:
    """CLI-surface knobs (ZSSGAN/options/train_options.py defaults)."""

    source_class: str = "photo"
    target_class: str = "sketch"
    lr: float = 0.002
    g_reg_every: int = 4  # only sets the SG2-style lr/beta scaling
    batch: int = 2
    iterations: int = 301
    truncation: float = 0.7  # EG3DGenerator.style default (ZSSGAN_eg3d.py:87)
    sample_truncation: float = 0.7
    auto_layer_iters: int = 0
    auto_layer_k: int = 0
    auto_layer_batch: int = 8
    lambda_direction: float = 1.0
    lambda_patch: float = 0.0
    lambda_global: float = 0.0
    lambda_manifold: float = 0.0
    lambda_texture: float = 0.0

    @property
    def g_reg_ratio(self) -> float:
        return self.g_reg_every / (self.g_reg_every + 1)

    @property
    def adam(self):
        """train.py:46-52: Adam(lr*r, betas=(0**r, 0.99**r))."""
        r = self.g_reg_ratio
        return optax.adam(self.lr * r, b1=0.0 ** r, b2=0.99 ** r)


def _path_names(path):
    out = []
    for p in path:
        out.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return out


def conv_mask(g_params: Params):
    """Boolean mask pytree selecting backbone synthesis conv params."""

    def f(path, _leaf):
        names = _path_names(path)
        return (
            len(names) >= 4
            and names[0] == "backbone"
            and names[1] == "synthesis"
            and names[3] in ("conv0", "conv1")
        )

    return jax.tree_util.tree_map_with_path(f, g_params)


@dataclasses.dataclass(frozen=True)
class TwinGeneratorTrainer:
    """Shared frozen/trainable twin-generator CLIP editing step.

    Subclasses supply `sample_w`, `render` and `grad_mask` (the 2D and
    EG3D variants differ only in those three); everything else — state
    precompute, the weighted multi-CLIP loss, the masked-gradient Adam
    step — is identical machinery (train.py:66-81)."""

    generator: Any
    clip_losses: dict  # name -> DirectionalCLIPLoss
    clip_weights: dict  # name -> float
    settings: EditingSettings = EditingSettings()

    def sample_w(self, frozen_params: Params, rng, batch: int, truncation=None):
        raise NotImplementedError

    def render(self, g_params: Params, rng, ws):
        raise NotImplementedError

    def grad_mask(self, trainable: Params):
        raise NotImplementedError

    def build_states(self, clip_params: dict, tokenizer) -> dict:
        """Precompute per-model text-direction state (host, once)."""
        s = self.settings
        return {
            name: loss.build_state(
                clip_params[name], tokenizer, s.source_class, s.target_class
            )
            for name, loss in self.clip_losses.items()
        }

    def clip_loss(self, clip_params, rng, frozen_img, trainable_img, states):
        """Sum over CLIP models (ZSSGAN_eg3d.py:255)."""
        total = 0.0
        for name, loss in self.clip_losses.items():
            total += self.clip_weights[name] * loss(
                clip_params[name], rng, frozen_img, trainable_img, states[name]
            )
        return total

    def make_step(self, frozen_params: Params):
        """Returns jitted step(trainable, opt_state, clip_params, states,
        rng) -> (trainable, opt_state, loss). `frozen_params` is closed
        over as a compile-time constant (it never changes)."""
        s = self.settings
        opt = s.adam

        def loss_fn(trainable, clip_params, states, rng):
            kz, kn1, kn2, kc = jax.random.split(rng, 4)
            ws = jax.lax.stop_gradient(self.sample_w(frozen_params, kz, s.batch))
            frozen_img = jax.lax.stop_gradient(self.render(frozen_params, kn1, ws))
            trainable_img = self.render(trainable, kn2, ws)
            return self.clip_loss(clip_params, kc, frozen_img, trainable_img, states)

        def step(trainable, opt_state, clip_params, states, rng):
            mask = self.grad_mask(trainable)
            loss, grads = jax.value_and_grad(loss_fn)(trainable, clip_params, states, rng)
            grads = jax.tree_util.tree_map(
                lambda m, g: g if m else jnp.zeros_like(g), mask, grads
            )
            updates, opt_state = opt.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, loss

        return jax.jit(step)

    def init_opt_state(self, trainable: Params):
        return self.settings.adam.init(trainable)


@dataclasses.dataclass(frozen=True)
class ZSSGANTrainer(TwinGeneratorTrainer):
    generator: TriPlaneGenerator

    def sample_w(self, frozen_params: Params, rng, batch: int, truncation=None):
        """z ~ N(0,I) -> frozen mapping with truncation
        (ZSSGAN_eg3d.py:87-91, 246)."""
        z = jax.random.normal(rng, (batch, self.generator.z_dim))
        c = jnp.tile(canonical_camera(), (batch, 1))
        psi = self.settings.truncation if truncation is None else truncation
        return self.generator.mapping(frozen_params, z, c, truncation_psi=psi)

    def render(self, g_params: Params, rng, ws):
        c = jnp.tile(canonical_camera(), (ws.shape[0], 1))
        return self.generator.synthesis(g_params, rng, ws, c, noise_mode="random")[
            "image"
        ]

    def grad_mask(self, trainable: Params):
        return conv_mask(trainable)

    def rank_w_slots(self, params, clip_params, states, rng, frozen_params):
        """determine_opt_layers' ranking (ZSSGAN_eg3d.py:161-188): run
        auto_layer_iters SGD steps on per-slot w codes against the
        global CLIP loss, return per-slot mean |delta w| (descending
        argsort gives the most edit-responsive slots)."""
        s = self.settings
        kz, kr = jax.random.split(rng)
        ws0 = self.sample_w(frozen_params, kz, s.auto_layer_batch)

        def global_loss(ws):
            img = self.render(params, kr, ws)
            total = 0.0
            for name, loss in self.clip_losses.items():
                total += self.clip_weights[name] * loss.global_loss(
                    clip_params[name], img, states[name].target_tokens
                )
            return total

        def body(ws, _):
            g = jax.grad(global_loss)(ws)
            return ws - 0.01 * g, None

        ws, _ = jax.lax.scan(body, ws0, None, length=s.auto_layer_iters)
        return jnp.mean(jnp.abs(ws - ws0), axis=(0, 2))  # (num_ws,)


def synthesis_mask(g_params: Params):
    """Boolean mask selecting EVERY backbone synthesis-block param
    (convs AND torgb) — ZSSGAN_IDE3D.get_training_layers returns all
    grandchildren of generator.synthesis (ZSSGAN_IDE3D.py:35-51),
    unlike the EG3D variant's conv-only index list."""

    def f(path, _leaf):
        names = _path_names(path)
        return (
            len(names) >= 2
            and names[0] == "backbone"
            and names[1] == "synthesis"
        )

    return jax.tree_util.tree_map_with_path(f, g_params)


@dataclasses.dataclass(frozen=True)
class IDE3DZSSGANTrainer(ZSSGANTrainer):
    """IDE3D-flavored twin-generator editing (ZSSGAN_IDE3D.py:325-499).

    The reference's IDE3DGenerator is NOT an architecture in the repo:
    it unpickles a persistence pickle whose class source ships inside
    the checkpoint (ZSSGAN_IDE3D.py:29-33) — code this framework will
    not execute (convert.py stub unpickler). What distinguishes the
    IDE3D ZSSGAN *training semantics* from the EG3D one is:
    - training layers = ALL synthesis-block children including ToRGB
      (ZSSGAN_IDE3D.py:49-51), vs the EG3D conv-only selection;
    - style() conditions mapping on the front camera with truncation
      0.7 and forward() passes noise_mode through, which the base
      ZSSGANTrainer already does (ZSSGAN_IDE3D.py:83-89).
    Those semantics are reproduced here over any generator with the
    TriPlaneGenerator interface; loading an actual IDE3D checkpoint
    additionally requires implementing the IDE3D architecture (a
    semantic-conditioned 3D GAN) and a converter for its pickle.
    """

    def grad_mask(self, trainable: Params):
        return synthesis_mask(trainable)
