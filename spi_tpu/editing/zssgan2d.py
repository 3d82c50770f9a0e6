"""Twin-generator CLIP editing over plain 2D StyleGAN2.

Behavioral spec: ZSSGAN/model/ZSSGAN.py (the pure-2D StyleGAN-NADA
variant driving rosinality's sg2_model.py) + ZSSGAN/train.py. The SPI
workflow edits EG3D (spi_tpu.editing.zssgan); this module provides the
same twin frozen/trainable directional-CLIP training for ordinary
2D StyleGAN2 checkpoints.

TPU design notes:
- reuses the framework's single StyleGAN2 implementation
  (spi_tpu.models.stylegan2.Generator) — the reference carries a
  second, rosinality-layout copy of the same network; weights from
  rosinality checkpoints are renamed by spi_tpu.convert.
- style mixing (ZSSGAN/utils/training_utils.py mixing_noise +
  sg2 2-latent forward) is implemented as index-conditional w blending.
- trainable set: synthesis conv params (mapping/torgb frozen), as the
  reference's get_training_layers/freeze machinery resolves to.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from spi_tpu.editing.zssgan import EditingSettings, TwinGeneratorTrainer, _path_names
from spi_tpu.models.stylegan2 import Generator

Params = dict[str, Any]


def conv_mask_2d(g_params: Params):
    """True on synthesis conv params (synthesis.b{res}.conv{0,1}.*) AND
    the learned constant input: the reference's default training set is
    get_all_layers()[1:3] + convs (ZSSGAN.py get_training_layers), whose
    [1:3] slice covers the ConstantInput — coarse-structure edits need
    its gradient."""

    def f(path, _leaf):
        names = _path_names(path)
        return len(names) >= 3 and names[0] == "synthesis" and (
            names[2] in ("conv0", "conv1") or names[-1] == "const"
        )

    return jax.tree_util.tree_map_with_path(f, g_params)


@dataclasses.dataclass(frozen=True)
class ZSSGAN2DTrainer(TwinGeneratorTrainer):
    """2D variant: differs from the EG3D trainer only in w sampling
    (style mixing, no camera conditioning), rendering (plain SG2
    synthesis) and the trainable mask; the step machinery lives in
    TwinGeneratorTrainer."""

    generator: Generator
    mixing_prob: float = 0.0  # --mixing (train.py mixing_noise)

    def sample_w(self, frozen_params: Params, rng, batch: int, truncation=None):
        """mixing_noise + mapping: with prob `mixing_prob` two z codes
        are mapped and crossed over at a random layer index."""
        kz1, kz2, kmix, kidx = jax.random.split(rng, 4)
        psi = self.settings.truncation if truncation is None else truncation
        c = jnp.zeros((batch, 0))
        z1 = jax.random.normal(kz1, (batch, self.generator.z_dim))
        w1 = self.generator.mapping(
            frozen_params["mapping"], z1, c, truncation_psi=psi
        )
        if self.mixing_prob <= 0:
            return w1
        z2 = jax.random.normal(kz2, (batch, self.generator.z_dim))
        w2 = self.generator.mapping(
            frozen_params["mapping"], z2, c, truncation_psi=psi
        )
        num_ws = self.generator.num_ws
        cross = jax.random.randint(kidx, (batch, 1, 1), 1, num_ws)
        layer = jnp.arange(num_ws)[None, :, None]
        mixed = jnp.where(layer < cross, w1, w2)
        use_mix = (
            jax.random.uniform(kmix, (batch, 1, 1)) < self.mixing_prob
        )
        return jnp.where(use_mix, mixed, w1)

    def render(self, g_params: Params, rng, ws):
        return self.generator.synthesis(
            g_params["synthesis"], ws, noise_mode="random", rng=rng
        )

    def grad_mask(self, trainable: Params):
        return conv_mask_2d(trainable)
