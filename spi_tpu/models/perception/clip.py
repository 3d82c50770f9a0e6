"""CLIP image/text encoders, TPU-native.

Behavioral spec: the OpenAI `clip` package consumed by the reference at
ZSSGAN/criteria/clip_loss.py:42,67 (models 'ViT-B/32', 'ViT-B/16' for
the directional loss and 'RN50' for the cnn texture loss). Re-designed
for TPU:

- Parameters are nested pytrees whose keys mirror the torch state_dict
  (visual.transformer.resblocks.{i}.attn.in_proj_weight, ...) so
  conversion from a released CLIP checkpoint is mechanical.
- All attention is batched jnp.einsum on fixed-length sequences (50/197
  visual tokens, 77 text tokens) — MXU-friendly static shapes.
- Runs fp32; CLIP checkpoints ship fp16 weights, the converter upcasts.

The three model configs the reference uses are provided as
`vit_b32()`, `vit_b16()`, `rn50()`.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from spi_tpu.ops import conv2d, resize_bilinear

Params = dict[str, Any]

# CLIP input normalization (applied after scaling images to [0,1]).
CLIP_MEAN = jnp.array([0.48145466, 0.4578275, 0.40821073], jnp.float32)
CLIP_STD = jnp.array([0.26862954, 0.26130258, 0.27577711], jnp.float32)


def clip_normalize(x01):
    """(N,3,H,W) in [0,1] -> CLIP-normalized."""
    return (x01 - CLIP_MEAN[None, :, None, None]) / CLIP_STD[None, :, None, None]


def preprocess_gan_output(img, resolution: int):
    """GAN output in [-1,1] at any square size -> CLIP input.

    Mirrors ZSSGAN/criteria/clip_loss.py:46-48: un-normalize to [0,1],
    resize to the CLIP resolution (Resize+CenterCrop on an already
    square image = plain resize), normalize.
    """
    x01 = img * 0.5 + 0.5
    x01 = resize_bilinear(x01, (resolution, resolution))
    return clip_normalize(x01)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def layer_norm(params: Params, x, eps: float = 1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * params["weight"] + params["bias"]


# ---------------------------------------------------------------------------
# Transformer (shared by visual and text towers)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ResidualAttentionBlock:
    width: int
    heads: int

    def init(self, key) -> Params:
        ks = jax.random.split(key, 4)
        w = self.width
        s = w ** -0.5
        return {
            "ln_1": {"weight": jnp.ones((w,)), "bias": jnp.zeros((w,))},
            "attn": {
                "in_proj_weight": jax.random.normal(ks[0], (3 * w, w)) * s,
                "in_proj_bias": jnp.zeros((3 * w,)),
                "out_proj": {
                    "weight": jax.random.normal(ks[1], (w, w)) * s,
                    "bias": jnp.zeros((w,)),
                },
            },
            "ln_2": {"weight": jnp.ones((w,)), "bias": jnp.zeros((w,))},
            "mlp": {
                "c_fc": {
                    "weight": jax.random.normal(ks[2], (4 * w, w)) * s,
                    "bias": jnp.zeros((4 * w,)),
                },
                "c_proj": {
                    "weight": jax.random.normal(ks[3], (w, 4 * w)) * s,
                    "bias": jnp.zeros((w,)),
                },
            },
        }

    def attention(self, params: Params, x, mask=None):
        """x: (N, L, W). Multi-head self-attention."""
        n, l, w = x.shape
        h = self.heads
        d = w // h
        qkv = x @ params["in_proj_weight"].T + params["in_proj_bias"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(n, l, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(n, l, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(n, l, h, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("nhqd,nhkd->nhqk", q, k) / jnp.sqrt(d).astype(x.dtype)
        if mask is not None:
            logits = logits + mask
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("nhqk,nhkd->nhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(n, l, w)
        return out @ params["out_proj"]["weight"].T + params["out_proj"]["bias"]

    def __call__(self, params: Params, x, mask=None):
        x = x + self.attention(params["attn"], layer_norm(params["ln_1"], x), mask)
        h = layer_norm(params["ln_2"], x)
        h = quick_gelu(h @ params["mlp"]["c_fc"]["weight"].T + params["mlp"]["c_fc"]["bias"])
        h = h @ params["mlp"]["c_proj"]["weight"].T + params["mlp"]["c_proj"]["bias"]
        return x + h


@dataclasses.dataclass(frozen=True)
class Transformer:
    width: int
    layers: int
    heads: int

    @property
    def block(self) -> ResidualAttentionBlock:
        return ResidualAttentionBlock(self.width, self.heads)

    def init(self, key) -> Params:
        keys = jax.random.split(key, self.layers)
        return {"resblocks": {str(i): self.block.init(keys[i]) for i in range(self.layers)}}

    def __call__(self, params: Params, x, mask=None):
        for i in range(self.layers):
            x = self.block(params["resblocks"][str(i)], x, mask)
        return x


# ---------------------------------------------------------------------------
# Vision transformer tower
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class VisionTransformer:
    input_resolution: int
    patch_size: int
    width: int
    layers: int
    heads: int
    output_dim: int

    @property
    def grid(self) -> int:
        return self.input_resolution // self.patch_size

    @property
    def transformer(self) -> Transformer:
        return Transformer(self.width, self.layers, self.heads)

    def init(self, key) -> Params:
        ks = jax.random.split(key, 4)
        w = self.width
        s = w ** -0.5
        n_tok = self.grid * self.grid + 1
        return {
            "conv1": {
                "weight": jax.random.normal(
                    ks[0], (w, 3, self.patch_size, self.patch_size)
                ) * s
            },
            "class_embedding": jax.random.normal(ks[1], (w,)) * s,
            "positional_embedding": jax.random.normal(ks[2], (n_tok, w)) * s,
            "ln_pre": {"weight": jnp.ones((w,)), "bias": jnp.zeros((w,))},
            "transformer": self.transformer.init(ks[3]),
            "ln_post": {"weight": jnp.ones((w,)), "bias": jnp.zeros((w,))},
            "proj": jax.random.normal(ks[3], (w, self.output_dim)) * s,
        }

    def __call__(self, params: Params, x):
        """x: (N, 3, R, R) CLIP-normalized -> (N, output_dim)."""
        n = x.shape[0]
        x = conv2d(x, params["conv1"]["weight"], stride=self.patch_size)
        x = x.reshape(n, self.width, -1).transpose(0, 2, 1)  # (N, grid^2, W)
        cls = jnp.broadcast_to(params["class_embedding"], (n, 1, self.width))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + params["positional_embedding"]
        x = layer_norm(params["ln_pre"], x)
        x = self.transformer(params["transformer"], x)
        x = layer_norm(params["ln_post"], x[:, 0, :])
        return x @ params["proj"]


# ---------------------------------------------------------------------------
# Modified ResNet tower (RN50) — used by the cnn texture loss
# (clip_loss.py:67,84-86,288-292)
# ---------------------------------------------------------------------------


def _bn(params: Params, x, eps: float = 1e-5):
    """Inference-mode BatchNorm with stored running stats."""
    scale = params["weight"] * jax.lax.rsqrt(params["running_var"] + eps)
    bias = params["bias"] - params["running_mean"] * scale
    return x * scale[None, :, None, None] + bias[None, :, None, None]


def _avg_pool(x, k: int):
    if k == 1:
        return x
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, k, k), (1, 1, k, k), "VALID"
    ) / (k * k)


@dataclasses.dataclass(frozen=True)
class Bottleneck:
    inplanes: int
    planes: int
    stride: int = 1

    expansion = 4

    def init(self, key) -> Params:
        ks = jax.random.split(key, 4)

        def bn(c):
            return {
                "weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
                "running_mean": jnp.zeros((c,)), "running_var": jnp.ones((c,)),
            }

        def cw(k, co, ci, kh):
            return jax.random.normal(k, (co, ci, kh, kh)) * jnp.sqrt(2.0 / (ci * kh * kh))

        p = {
            "conv1": {"weight": cw(ks[0], self.planes, self.inplanes, 1)},
            "bn1": bn(self.planes),
            "conv2": {"weight": cw(ks[1], self.planes, self.planes, 3)},
            "bn2": bn(self.planes),
            "conv3": {"weight": cw(ks[2], self.planes * 4, self.planes, 1)},
            "bn3": bn(self.planes * 4),
        }
        if self.stride > 1 or self.inplanes != self.planes * 4:
            p["downsample"] = {
                "0": {"weight": cw(ks[3], self.planes * 4, self.inplanes, 1)},
                "1": bn(self.planes * 4),
            }
        return p

    def __call__(self, params: Params, x):
        out = jax.nn.relu(_bn(params["bn1"], conv2d(x, params["conv1"]["weight"])))
        out = jax.nn.relu(_bn(params["bn2"], conv2d(out, params["conv2"]["weight"], padding=1)))
        out = _avg_pool(out, self.stride)
        out = _bn(params["bn3"], conv2d(out, params["conv3"]["weight"]))
        if "downsample" in params:
            x = _avg_pool(x, self.stride)
            x = _bn(params["downsample"]["1"], conv2d(x, params["downsample"]["0"]["weight"]))
        return jax.nn.relu(out + x)


@dataclasses.dataclass(frozen=True)
class AttentionPool2d:
    spacial_dim: int
    embed_dim: int
    num_heads: int
    output_dim: int

    def init(self, key) -> Params:
        ks = jax.random.split(key, 5)
        d = self.embed_dim
        s = d ** -0.5

        def lin(k, co, ci):
            return {"weight": jax.random.normal(k, (co, ci)) * s, "bias": jnp.zeros((co,))}

        return {
            "positional_embedding": jax.random.normal(
                ks[0], (self.spacial_dim ** 2 + 1, d)
            ) * s,
            "k_proj": lin(ks[1], d, d),
            "q_proj": lin(ks[2], d, d),
            "v_proj": lin(ks[3], d, d),
            "c_proj": lin(ks[4], self.output_dim, d),
        }

    def __call__(self, params: Params, x):
        """x: (N, C, H, W) -> (N, output_dim). Query = mean token."""
        n, c, h, w = x.shape
        x = x.reshape(n, c, h * w).transpose(0, 2, 1)  # (N, HW, C)
        x = jnp.concatenate([jnp.mean(x, axis=1, keepdims=True), x], axis=1)
        x = x + params["positional_embedding"]

        nh = self.num_heads
        d = c // nh
        q = x[:, :1] @ params["q_proj"]["weight"].T + params["q_proj"]["bias"]
        k = x @ params["k_proj"]["weight"].T + params["k_proj"]["bias"]
        v = x @ params["v_proj"]["weight"].T + params["v_proj"]["bias"]
        q = q.reshape(n, 1, nh, d).transpose(0, 2, 1, 3)
        k = k.reshape(n, -1, nh, d).transpose(0, 2, 1, 3)
        v = v.reshape(n, -1, nh, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("nhqd,nhkd->nhqk", q, k) / jnp.sqrt(d).astype(x.dtype)
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("nhqk,nhkd->nhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(n, c)
        return out @ params["c_proj"]["weight"].T + params["c_proj"]["bias"]


@dataclasses.dataclass(frozen=True)
class ModifiedResNet:
    layers: tuple[int, ...]
    output_dim: int
    heads: int
    input_resolution: int = 224
    width: int = 64

    def _stages(self):
        """[(name, Bottleneck list)] with torch naming layer1..layer4."""
        stages = []
        inplanes = self.width
        planes = self.width
        for si, n_blocks in enumerate(self.layers):
            stride = 1 if si == 0 else 2
            blocks = []
            for bi in range(n_blocks):
                blocks.append(Bottleneck(inplanes, planes, stride if bi == 0 else 1))
                inplanes = planes * 4
            stages.append((f"layer{si + 1}", blocks))
            planes *= 2
        return stages

    @property
    def attnpool(self) -> AttentionPool2d:
        return AttentionPool2d(
            self.input_resolution // 32, self.width * 32, self.heads, self.output_dim
        )

    def init(self, key) -> Params:
        ks = jax.random.split(key, 8)

        def bn(c):
            return {
                "weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
                "running_mean": jnp.zeros((c,)), "running_var": jnp.ones((c,)),
            }

        def cw(k, co, ci, kh):
            return jax.random.normal(k, (co, ci, kh, kh)) * jnp.sqrt(2.0 / (ci * kh * kh))

        w = self.width
        p = {
            "conv1": {"weight": cw(ks[0], w // 2, 3, 3)},
            "bn1": bn(w // 2),
            "conv2": {"weight": cw(ks[1], w // 2, w // 2, 3)},
            "bn2": bn(w // 2),
            "conv3": {"weight": cw(ks[2], w, w // 2, 3)},
            "bn3": bn(w),
            "attnpool": self.attnpool.init(ks[3]),
        }
        ki = 4
        for name, blocks in self._stages():
            bkeys = jax.random.split(ks[ki], len(blocks))
            p[name] = {str(i): b.init(bkeys[i]) for i, b in enumerate(blocks)}
            ki += 1
        return p

    def __call__(self, params: Params, x):
        x = jax.nn.relu(_bn(params["bn1"], conv2d(x, params["conv1"]["weight"], stride=2, padding=1)))
        x = jax.nn.relu(_bn(params["bn2"], conv2d(x, params["conv2"]["weight"], padding=1)))
        x = jax.nn.relu(_bn(params["bn3"], conv2d(x, params["conv3"]["weight"], padding=1)))
        x = _avg_pool(x, 2)
        for name, blocks in self._stages():
            for i, b in enumerate(blocks):
                x = b(params[name][str(i)], x)
        return self.attnpool(params["attnpool"], x)


# ---------------------------------------------------------------------------
# Full CLIP model
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CLIP:
    embed_dim: int
    # vision
    image_resolution: int
    vision_layers: Any  # int (ViT) or tuple (ResNet stage depths)
    vision_width: int
    vision_patch_size: int | None
    # text
    context_length: int
    vocab_size: int
    transformer_width: int
    transformer_heads: int
    transformer_layers: int

    @property
    def visual(self):
        if isinstance(self.vision_layers, tuple):
            return ModifiedResNet(
                layers=self.vision_layers,
                output_dim=self.embed_dim,
                heads=self.vision_width * 32 // 64,
                input_resolution=self.image_resolution,
                width=self.vision_width,
            )
        return VisionTransformer(
            input_resolution=self.image_resolution,
            patch_size=self.vision_patch_size,
            width=self.vision_width,
            layers=self.vision_layers,
            heads=self.vision_width // 64,
            output_dim=self.embed_dim,
        )

    @property
    def transformer(self) -> Transformer:
        return Transformer(
            self.transformer_width, self.transformer_layers, self.transformer_heads
        )

    def causal_mask(self):
        l = self.context_length
        mask = jnp.full((l, l), -jnp.inf)
        return jnp.triu(mask, k=1)

    def init(self, key) -> Params:
        ks = jax.random.split(key, 5)
        w = self.transformer_width
        return {
            "visual": self.visual.init(ks[0]),
            "transformer": self.transformer.init(ks[1]),
            "token_embedding": {
                "weight": jax.random.normal(ks[2], (self.vocab_size, w)) * 0.02
            },
            "positional_embedding": jax.random.normal(ks[3], (self.context_length, w))
            * 0.01,
            "ln_final": {"weight": jnp.ones((w,)), "bias": jnp.zeros((w,))},
            "text_projection": jax.random.normal(ks[4], (w, self.embed_dim))
            * w ** -0.5,
            "logit_scale": jnp.array(jnp.log(1 / 0.07), jnp.float32),
        }

    def encode_image(self, params: Params, image):
        """image: (N,3,R,R) CLIP-normalized -> (N, embed_dim)."""
        return self.visual(params["visual"], image)

    def encode_text(self, params: Params, tokens):
        """tokens: (N, context_length) int32 -> (N, embed_dim).

        Feature taken at each sequence's argmax token (the EOT token has
        the highest id in the CLIP vocabulary).
        """
        x = params["token_embedding"]["weight"][tokens]
        x = x + params["positional_embedding"]
        x = self.transformer(params["transformer"], x, self.causal_mask())
        x = layer_norm(params["ln_final"], x)
        eot = jnp.argmax(tokens, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        return x @ params["text_projection"]

    def __call__(self, params: Params, image, tokens):
        """-> (logits_per_image, logits_per_text), cosine * exp(logit_scale)."""
        img = self.encode_image(params, image)
        txt = self.encode_text(params, tokens)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(params["logit_scale"])
        logits_per_image = scale * img @ txt.T
        return logits_per_image, logits_per_image.T


def vit_b32() -> CLIP:
    return CLIP(
        embed_dim=512, image_resolution=224, vision_layers=12, vision_width=768,
        vision_patch_size=32, context_length=77, vocab_size=49408,
        transformer_width=512, transformer_heads=8, transformer_layers=12,
    )


def vit_b16() -> CLIP:
    return CLIP(
        embed_dim=512, image_resolution=224, vision_layers=12, vision_width=768,
        vision_patch_size=16, context_length=77, vocab_size=49408,
        transformer_width=512, transformer_heads=8, transformer_layers=12,
    )


def rn50() -> CLIP:
    return CLIP(
        embed_dim=1024, image_resolution=224, vision_layers=(3, 4, 6, 3),
        vision_width=64, vision_patch_size=None, context_length=77,
        vocab_size=49408, transformer_width=512, transformer_heads=8,
        transformer_layers=12,
    )


def tiny_test_clip() -> CLIP:
    """Miniature config for unit tests (structure-identical, ~100k params)."""
    return CLIP(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=16, context_length=16, vocab_size=256,
        transformer_width=64, transformer_heads=2, transformer_layers=2,
    )
