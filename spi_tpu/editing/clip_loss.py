"""CLIP losses for domain editing, TPU-native.

Behavioral spec: ZSSGAN/criteria/clip_loss.py. Re-designed for jit:
the torch class lazily computes and caches text directions on first
forward (clip_loss.py:180-181, 261-267); here all text-derived state is
precomputed into an explicit `CLIPLossState` pytree (text encoding runs
once, host-initiated), and the per-step image losses are pure functions
of (params, images, state, rng) — one fused XLA program per step.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from spi_tpu.editing.text_templates import (
    compose_text_with_templates,
    imagenet_templates,
    part_templates,
)
from spi_tpu.models.perception.clip import CLIP, preprocess_gan_output

Params = dict[str, Any]


def _normalize(x, eps: float = 0.0):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CLIPLossState:
    """Precomputed text-side quantities (all unit-normalized)."""

    target_direction: Any  # (1, D) mean template direction src->tgt
    src_text_features: Any  # (1, D) mean src template embedding
    target_text_features: Any  # (1, D) mean tgt template embedding
    target_tokens: Any  # (1, L) int32 tokens of "a {target}."
    patch_text_directions: Any  # (P, D) per part-template directions


@dataclasses.dataclass(frozen=True)
class DirectionalCLIPLoss:
    """One CLIP model's edit losses (clip_loss.py:294-312).

    `model` is the ViT/RN CLIP used for directional/global/patch terms;
    `cnn_model` (RN50 in the reference, clip_loss.py:67) serves only the
    texture loss and may be None.
    """

    model: CLIP
    lambda_direction: float = 1.0
    lambda_patch: float = 0.0
    lambda_global: float = 0.0
    lambda_manifold: float = 0.0
    lambda_texture: float = 0.0
    cnn_model: CLIP | None = None

    # -- encoders ----------------------------------------------------------
    def encode_image(self, params: Params, img, norm: bool = True):
        """img: GAN output (N,3,H,W) in [-1,1] -> (N, D) embedding."""
        x = preprocess_gan_output(img, self.model.image_resolution)
        feat = self.model.encode_image(params, x)
        return _normalize(feat) if norm else feat

    def encode_text(self, params: Params, tokens, norm: bool = True):
        feat = self.model.encode_text(params, jnp.asarray(tokens))
        return _normalize(feat) if norm else feat

    def template_features(self, params: Params, tokens):
        """Tokens of a full template set -> per-template unit embeddings
        (clip_loss.py:97-107)."""
        return self.encode_text(params, tokens)

    # -- state construction (run once, host-initiated) ---------------------
    def build_state(
        self,
        params: Params,
        tokenizer,
        source_class: str,
        target_class: str,
    ) -> CLIPLossState:
        """Precompute text directions for a (source, target) prompt pair.

        Mirrors compute_text_direction (clip_loss.py:117-124),
        set_text_features (:150-155) and the patch direction table
        (:261-267). Tokenization is host-side; encoding is jitted.
        """
        ctx = self.model.context_length

        # One jitted text encoder reused for every template batch: the
        # imagenet-template expansion makes ~32 encode calls of identical
        # shape, and eager per-op dispatch is pathologically slow on
        # remote-compiled backends.
        encode = jax.jit(self.template_features)

        def feats(texts):
            return encode(params, jnp.asarray(
                tokenizer.tokenize(texts, context_length=ctx)
            ))

        src = feats(compose_text_with_templates(source_class, imagenet_templates))
        tgt = feats(compose_text_with_templates(target_class, imagenet_templates))
        direction = _normalize(jnp.mean(tgt - src, axis=0, keepdims=True))

        # Per part sentence, the reference computes a full
        # compute_text_direction — i.e. each part sentence is expanded
        # through ALL imagenet templates and the mean difference is
        # normalized (clip_loss.py:261-267 -> :117-124).
        src_parts = compose_text_with_templates(source_class, part_templates)
        tgt_parts = compose_text_with_templates(target_class, part_templates)
        part_dirs = jnp.concatenate(
            [
                _normalize(
                    jnp.mean(
                        feats(compose_text_with_templates(tp, imagenet_templates))
                        - feats(compose_text_with_templates(sp, imagenet_templates)),
                        axis=0,
                        keepdims=True,
                    )
                )
                for sp, tp in zip(src_parts, tgt_parts)
            ],
            axis=0,
        )

        return CLIPLossState(
            target_direction=direction,
            src_text_features=_normalize(jnp.mean(src, axis=0, keepdims=True)),
            target_text_features=_normalize(jnp.mean(tgt, axis=0, keepdims=True)),
            target_tokens=jnp.asarray(
                tokenizer.tokenize([f"a {target_class}"], context_length=ctx)
            ),
            patch_text_directions=part_dirs,
        )

    def img2img_direction(self, params: Params, source_images, target_images):
        """compute_img2img_direction (clip_loss.py:126-148): mean target
        image embedding minus mean source embedding, unit-normalized.
        target_images: (M,3,H,W) in [-1,1]."""
        src = jnp.mean(self.encode_image(params, source_images), axis=0, keepdims=True)
        tgt = jnp.mean(self.encode_image(params, target_images), axis=0, keepdims=True)
        return _normalize(tgt - src)

    # -- per-step losses ---------------------------------------------------
    def directional_loss(self, params: Params, src_img, target_img, target_direction):
        """1 - cos(img edit direction, text direction) (clip_loss.py:178-193)."""
        src = self.encode_image(params, src_img)
        tgt = self.encode_image(params, target_img)
        edit = tgt - src
        # Degenerate identical images: nudge to keep the norm finite
        # (reference re-encodes target+1e-6, clip_loss.py:187-189).
        edit = edit + 1e-8
        edit = _normalize(edit)
        cos = jnp.sum(edit * target_direction, axis=-1)
        return jnp.mean(1.0 - cos)

    def global_loss(self, params: Params, img, tokens):
        """(1 - logits/100).mean() (clip_loss.py:195-204)."""
        x = preprocess_gan_output(img, self.model.image_resolution)
        logits, _ = self.model(params, x, jnp.asarray(tokens))
        return jnp.mean(1.0 - logits / 100.0)

    def manifold_loss(self, params: Params, src_img, target_img, state: CLIPLossState):
        """clip_angle_loss (clip_loss.py:157-173): L1 between image-pair
        cosine and text-pair cosine."""
        cos_text = state.target_text_features @ state.src_text_features.T
        src = self.encode_image(params, src_img)
        tgt = self.encode_image(params, target_img)
        # matched (i, i) pairs only: each trainable render vs ITS OWN
        # frozen render (clip_loss.py:164-166 batched (B,1,1) matmul),
        # not the N x M cross-image cosines.
        cos_img = jnp.clip(jnp.sum(tgt * src, axis=-1), -1.0, 1.0)
        return jnp.mean(jnp.abs(cos_img - jnp.squeeze(cos_text)))

    def _random_patches(self, rng, img, num_patches: int, size: int):
        """(N,3,H,W) -> (N*num_patches,3,size,size), random centers
        (clip_loss.py:206-234)."""
        n, c, h, w = img.shape
        half = size // 2
        kx, ky = jax.random.split(rng)
        cx = jax.random.randint(kx, (n * num_patches,), half, w - half)
        cy = jax.random.randint(ky, (n * num_patches,), half, h - half)
        batch_idx = jnp.repeat(jnp.arange(n), num_patches)

        def crop(bi, x0, y0):
            return jax.lax.dynamic_slice(
                img, (bi, 0, y0 - half, x0 - half), (1, c, size, size)
            )[0]

        return jax.vmap(crop)(batch_idx, cx, cy)

    def patch_directional_loss(
        self, params: Params, rng, src_img, target_img, state: CLIPLossState
    ):
        """patch_directional_loss (clip_loss.py:259-286): cosine distance
        of per-patch edit directions to part-template text directions,
        weighted by a softmax over text directions."""
        size = min(510, src_img.shape[-1] - 2)
        src_patches = self._random_patches(rng, src_img, 1, size)
        tgt_patches = self._random_patches(rng, target_img, 1, size)
        src = self.encode_image(params, src_patches)
        tgt = self.encode_image(params, tgt_patches)
        edit = _normalize(tgt - src + 1e-8)
        sims = jnp.einsum("nd,pd->np", edit, state.patch_text_directions)
        cos_dists = 1.0 - sims
        scores = cos_dists * jax.nn.softmax(sims, axis=-1)
        return jnp.mean(scores)

    def texture_loss(self, params_cnn: Params, texture_img, target_img):
        """cnn_feature_loss (clip_loss.py:288-292): MSE of RN50 embeddings."""
        assert self.cnn_model is not None, "texture loss needs cnn_model (RN50)"
        x = preprocess_gan_output(texture_img, self.cnn_model.image_resolution)
        y = preprocess_gan_output(target_img, self.cnn_model.image_resolution)
        fx = self.cnn_model.encode_image(params_cnn, x)
        fy = self.cnn_model.encode_image(params_cnn, y)
        return jnp.mean(jnp.square(fx - fy))

    def __call__(
        self,
        params: Params,
        rng,
        src_img,
        target_img,
        state: CLIPLossState,
        params_cnn: Params | None = None,
        texture_img=None,
    ):
        """Weighted sum mirroring CLIPLoss.forward (clip_loss.py:294-312)."""
        loss = 0.0
        if self.lambda_global:
            loss += self.lambda_global * self.global_loss(
                params, target_img, state.target_tokens
            )
        if self.lambda_patch:
            loss += self.lambda_patch * self.patch_directional_loss(
                params, rng, src_img, target_img, state
            )
        if self.lambda_direction:
            loss += self.lambda_direction * self.directional_loss(
                params, src_img, target_img, state.target_direction
            )
        if self.lambda_manifold:
            loss += self.lambda_manifold * self.manifold_loss(
                params, src_img, target_img, state
            )
        if self.lambda_texture and texture_img is not None:
            loss += self.lambda_texture * self.texture_loss(
                params_cnn, texture_img, target_img
            )
        return loss
