"""BiSeNet face parser (19 classes).

Spec: third_part/bisenet/bisenet.py + resnet.py — the SPI variant: a
ResNet-18 context path (the spatial path is replaced by the res3b1/
feat8 feature, bisenet.py forward comment), attention refinement at
1/16 and 1/32, feature fusion, and three output heads upsampled
bilinearly (align_corners=True) to input size; the face mask is the
argmax over head 0 restricted to face attributes (spi/utils/
mask_utils.py:4-24, preprocess/extract_mask.py:35-62).

Param keys mirror the torch state_dict (cp.resnet.conv1.weight, ...).
Inference-only BatchNorm (running stats from bisenet.pth).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from spi_tpu.ops import conv2d


def _bn_init(ch):
    return {
        "weight": jnp.ones((ch,), jnp.float32),
        "bias": jnp.zeros((ch,), jnp.float32),
        "running_mean": jnp.zeros((ch,), jnp.float32),
        "running_var": jnp.ones((ch,), jnp.float32),
    }


def _bn(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["running_var"] + eps)
    return x * (p["weight"] * inv)[None, :, None, None] + (
        p["bias"] - p["running_mean"] * p["weight"] * inv
    )[None, :, None, None]


def _conv_init(key, cin, cout, k):
    w = jax.random.normal(key, (cout, cin, k, k), jnp.float32)
    return w * jnp.sqrt(2.0 / (cout * k * k))


def _max_pool_3x3_s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), ((0, 0), (0, 0), (1, 1), (1, 1))
    )


def _resize_nearest(x, size):
    n, c, h, w = x.shape
    return jax.image.resize(x, (n, c, size[0], size[1]), method="nearest")


def _resize_bilinear_ac(x, size):
    """align_corners=True bilinear (torch semantics for the output heads)."""
    n, c, h, w = x.shape
    oh, ow = size
    ys = jnp.linspace(0.0, h - 1.0, oh)
    xs = jnp.linspace(0.0, w - 1.0, ow)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ty = (ys - y0)[None, None, :, None]
    tx = (xs - x0)[None, None, None, :]
    a = x[:, :, y0][:, :, :, x0]
    b = x[:, :, y0][:, :, :, x1]
    cc = x[:, :, y1][:, :, :, x0]
    d = x[:, :, y1][:, :, :, x1]
    top = a * (1 - tx) + b * tx
    bot = cc * (1 - tx) + d * tx
    return top * (1 - ty) + bot * ty


@dataclasses.dataclass(frozen=True)
class BiSeNet:
    n_classes: int = 19

    # -- init ---------------------------------------------------------------
    def init(self, key):
        return jax.jit(self._init_impl)(key)

    def _init_impl(self, key):
        keys = iter(jax.random.split(key, 64))

        def conv_bn_relu(cin, cout, k):
            return {
                "conv": {"weight": _conv_init(next(keys), cin, cout, k)},
                "bn": _bn_init(cout),
            }

        def basic_block(cin, cout, stride):
            p = {
                "conv1": {"weight": _conv_init(next(keys), cin, cout, 3)},
                "bn1": _bn_init(cout),
                "conv2": {"weight": _conv_init(next(keys), cout, cout, 3)},
                "bn2": _bn_init(cout),
            }
            if cin != cout or stride != 1:
                p["downsample"] = {
                    "0": {"weight": _conv_init(next(keys), cin, cout, 1)},
                    "1": _bn_init(cout),
                }
            return p

        resnet = {
            "conv1": {"weight": _conv_init(next(keys), 3, 64, 7)},
            "bn1": _bn_init(64),
            "layer1": {"0": basic_block(64, 64, 1), "1": basic_block(64, 64, 1)},
            "layer2": {"0": basic_block(64, 128, 2), "1": basic_block(128, 128, 1)},
            "layer3": {"0": basic_block(128, 256, 2), "1": basic_block(256, 256, 1)},
            "layer4": {"0": basic_block(256, 512, 2), "1": basic_block(512, 512, 1)},
        }

        def arm(cin, cout):
            return {
                "conv": conv_bn_relu(cin, cout, 3),
                "conv_atten": {"weight": _conv_init(next(keys), cout, cout, 1)},
                "bn_atten": _bn_init(cout),
            }

        return {
            "cp": {
                "resnet": resnet,
                "arm16": arm(256, 128),
                "arm32": arm(512, 128),
                "conv_head32": conv_bn_relu(128, 128, 3),
                "conv_head16": conv_bn_relu(128, 128, 3),
                "conv_avg": conv_bn_relu(512, 128, 1),
            },
            "ffm": {
                "convblk": conv_bn_relu(256, 256, 1),
                "conv1": {"weight": _conv_init(next(keys), 256, 64, 1)},
                "conv2": {"weight": _conv_init(next(keys), 64, 256, 1)},
            },
            "conv_out": {
                "conv": conv_bn_relu(256, 256, 3),
                "conv_out": {"weight": _conv_init(next(keys), 256, self.n_classes, 1)},
            },
            "conv_out16": {
                "conv": conv_bn_relu(128, 64, 3),
                "conv_out": {"weight": _conv_init(next(keys), 64, self.n_classes, 1)},
            },
            "conv_out32": {
                "conv": conv_bn_relu(128, 64, 3),
                "conv_out": {"weight": _conv_init(next(keys), 64, self.n_classes, 1)},
            },
        }

    # -- apply --------------------------------------------------------------
    @staticmethod
    def _cbr(p, x, padding):
        x = conv2d(x, p["conv"]["weight"], padding=padding)
        return jax.nn.relu(_bn(p["bn"], x))

    @staticmethod
    def _block(p, x, stride):
        r = conv2d(x, p["conv1"]["weight"], stride=stride, padding=1)
        r = jax.nn.relu(_bn(p["bn1"], r))
        r = conv2d(r, p["conv2"]["weight"], padding=1)
        r = _bn(p["bn2"], r)
        if "downsample" in p:
            x = conv2d(x, p["downsample"]["0"]["weight"], stride=stride)
            x = _bn(p["downsample"]["1"], x)
        return jax.nn.relu(x + r)

    def _resnet(self, p, x):
        x = conv2d(x, p["conv1"]["weight"], stride=2, padding=3)
        x = jax.nn.relu(_bn(p["bn1"], x))
        x = _max_pool_3x3_s2(x)
        for name, strides in [("layer1", (1, 1)), ("layer2", (2, 1)),
                              ("layer3", (2, 1)), ("layer4", (2, 1))]:
            for i, s in enumerate(strides):
                x = self._block(p[name][str(i)], x, s)
            if name == "layer2":
                feat8 = x
            elif name == "layer3":
                feat16 = x
        return feat8, feat16, x

    def _arm(self, p, x):
        feat = self._cbr(p["conv"], x, padding=1)
        atten = feat.mean(axis=(2, 3), keepdims=True)
        atten = conv2d(atten, p["conv_atten"]["weight"])
        atten = jax.nn.sigmoid(_bn(p["bn_atten"], atten))
        return feat * atten

    def __call__(self, params, x):
        """x: (N, 3, H, W) normalized. Returns (N, n_classes, H, W) logits
        from the main head (aux heads omitted at inference)."""
        h, w = x.shape[2:]
        cp = params["cp"]
        feat8, feat16, feat32 = self._resnet(cp["resnet"], x)

        avg = feat32.mean(axis=(2, 3), keepdims=True)
        avg = self._cbr(cp["conv_avg"], avg, padding=0)  # (N, 128, 1, 1)
        avg_up = jnp.broadcast_to(
            avg, avg.shape[:2] + feat32.shape[2:]
        )  # matches the 128-ch ARM output, not feat32's 512

        feat32_sum = self._arm(cp["arm32"], feat32) + avg_up
        feat32_up = _resize_nearest(feat32_sum, feat16.shape[2:])
        feat32_up = self._cbr(cp["conv_head32"], feat32_up, padding=1)

        feat16_sum = self._arm(cp["arm16"], feat16) + feat32_up
        feat16_up = _resize_nearest(feat16_sum, feat8.shape[2:])
        feat16_up = self._cbr(cp["conv_head16"], feat16_up, padding=1)

        # feature fusion of (spatial=feat8, context=feat16_up)
        ffm = params["ffm"]
        fcat = jnp.concatenate([feat8, feat16_up], axis=1)
        feat = self._cbr(ffm["convblk"], fcat, padding=0)
        atten = feat.mean(axis=(2, 3), keepdims=True)
        atten = jax.nn.relu(conv2d(atten, ffm["conv1"]["weight"]))
        atten = jax.nn.sigmoid(conv2d(atten, ffm["conv2"]["weight"]))
        feat = feat * atten + feat

        out = params["conv_out"]
        y = self._cbr(out["conv"], feat, padding=1)
        y = conv2d(y, out["conv_out"]["weight"])
        return _resize_bilinear_ac(y, (h, w))


# extract_mask.py normalization (ImageNet stats on [0,1] input)
PARSING_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
PARSING_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


def parse_faces(bisenet: BiSeNet, params, images01):
    """(N, 3, 512, 512) in [0,1] -> (N, H, W) int32 argmax parsing map
    (preprocess/extract_mask.py:35-62)."""
    x = (images01 - PARSING_MEAN[None, :, None, None]) / PARSING_STD[None, :, None, None]
    logits = bisenet(params, x)
    return jnp.argmax(logits, axis=1).astype(jnp.int32)
