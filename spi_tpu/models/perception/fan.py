"""FAN 68-point face landmark network, TPU-native.

Behavioral spec: the `face_alignment` package consumed by the reference
(preprocess/extract_landmark.py:10 `face_alignment.FaceAlignment(2D)`),
i.e. the 4-stack Face Alignment Network of Bulat & Tzimiropoulos 2017:
7x7/s2 stem -> ConvBlocks to 256ch at 64x64 -> 4 depth-4 hourglass
modules with intermediate supervision -> 68 heatmaps at 64x64, decoded
with the quarter-pixel offset rule.

Param keys mirror the torch state_dict of the released 2DFAN4 weights
(conv1, bn1, conv2..conv4 ConvBlocks, m{i} hourglasses with recursive
b1_{d}/b2_{d}/b2_plus_{d}/b3_{d} blocks, top_m_{i}, conv_last{i},
bn_end{i}, l{i}, bl{i}, al{i}).

Face detection: the upstream package runs an SFD detector first; SPI
feeds near-portrait inputs where the face spans the frame, so the
default crop here is the full image (center/scale from an optional
bbox, same transform math as face_alignment.utils.transform).
Input to the network: (N, 3, 256, 256) RGB in [0, 1].
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from spi_tpu.ops import conv2d

Params = dict[str, Any]


def _bn_init(c):
    return {
        "weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
        "running_mean": jnp.zeros((c,)), "running_var": jnp.ones((c,)),
    }


def _bn(p, x, eps=1e-5):
    scale = p["weight"] * jax.lax.rsqrt(p["running_var"] + eps)
    bias = p["bias"] - p["running_mean"] * scale
    return x * scale[None, :, None, None] + bias[None, :, None, None]


def _conv_init(key, cout, cin, k, bias=True):
    w = jax.random.normal(key, (cout, cin, k, k), jnp.float32)
    p = {"weight": w * jnp.sqrt(2.0 / (cin * k * k))}
    if bias:
        p["bias"] = jnp.zeros((cout,))
    return p


def _conv(p, x, stride=1, padding=0):
    y = conv2d(x, p["weight"], stride=stride, padding=padding)
    if "bias" in p:
        y = y + p["bias"][None, :, None, None]
    return y


def _avg_pool_2x2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    ) / 4.0


def _upsample_nearest_2x(x):
    n, c, h, w = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None], (n, c, h, 2, w, 2))
    return x.reshape(n, c, 2 * h, 2 * w)


@dataclasses.dataclass(frozen=True)
class ConvBlock:
    """FAN ConvBlock: 3 pre-activation convs producing out/2 + out/4 +
    out/4 channels, concatenated, plus (bn-relu-1x1) shortcut when
    channel counts differ."""

    in_planes: int
    out_planes: int

    def init(self, key) -> Params:
        ks = jax.random.split(key, 4)
        o = self.out_planes
        p = {
            "bn1": _bn_init(self.in_planes),
            "conv1": _conv_init(ks[0], o // 2, self.in_planes, 3, bias=False),
            "bn2": _bn_init(o // 2),
            "conv2": _conv_init(ks[1], o // 4, o // 2, 3, bias=False),
            "bn3": _bn_init(o // 4),
            "conv3": _conv_init(ks[2], o // 4, o // 4, 3, bias=False),
        }
        if self.in_planes != o:
            p["downsample"] = {
                "0": _bn_init(self.in_planes),
                "2": _conv_init(ks[3], o, self.in_planes, 1, bias=False),
            }
        return p

    def __call__(self, params: Params, x):
        out1 = _conv(params["conv1"], jax.nn.relu(_bn(params["bn1"], x)), padding=1)
        out2 = _conv(params["conv2"], jax.nn.relu(_bn(params["bn2"], out1)), padding=1)
        out3 = _conv(params["conv3"], jax.nn.relu(_bn(params["bn3"], out2)), padding=1)
        out = jnp.concatenate([out1, out2, out3], axis=1)
        if "downsample" in params:
            x = _conv(
                params["downsample"]["2"],
                jax.nn.relu(_bn(params["downsample"]["0"], x)),
            )
        return out + x


@dataclasses.dataclass(frozen=True)
class HourGlass:
    depth: int = 4
    features: int = 256

    def init(self, key) -> Params:
        block = ConvBlock(self.features, self.features)
        p = {}
        keys = jax.random.split(key, self.depth * 4)
        ki = 0
        for level in range(self.depth, 0, -1):
            p[f"b1_{level}"] = block.init(keys[ki]); ki += 1
            p[f"b2_{level}"] = block.init(keys[ki]); ki += 1
            if level == 1:
                p[f"b2_plus_{level}"] = block.init(keys[ki])
            ki += 1
            p[f"b3_{level}"] = block.init(keys[ki]); ki += 1
        return p

    def _forward(self, params: Params, level: int, inp):
        block = ConvBlock(self.features, self.features)
        up1 = block(params[f"b1_{level}"], inp)
        low1 = block(params[f"b2_{level}"], _avg_pool_2x2(inp))
        if level > 1:
            low2 = self._forward(params, level - 1, low1)
        else:
            low2 = block(params[f"b2_plus_{level}"], low1)
        low3 = block(params[f"b3_{level}"], low2)
        return up1 + _upsample_nearest_2x(low3)

    def __call__(self, params: Params, x):
        return self._forward(params, self.depth, x)


@dataclasses.dataclass(frozen=True)
class FAN:
    num_modules: int = 4
    num_landmarks: int = 68

    def init(self, key) -> Params:
        ks = jax.random.split(key, 4 + self.num_modules * 7)
        p = {
            "conv1": _conv_init(ks[0], 64, 3, 7),
            "bn1": _bn_init(64),
            "conv2": ConvBlock(64, 128).init(ks[1]),
            "conv3": ConvBlock(128, 128).init(ks[2]),
            "conv4": ConvBlock(128, 256).init(ks[3]),
        }
        hg = HourGlass()
        ki = 4
        for i in range(self.num_modules):
            p[f"m{i}"] = hg.init(ks[ki]); ki += 1
            p[f"top_m_{i}"] = ConvBlock(256, 256).init(ks[ki]); ki += 1
            p[f"conv_last{i}"] = _conv_init(ks[ki], 256, 256, 1); ki += 1
            p[f"bn_end{i}"] = _bn_init(256)
            p[f"l{i}"] = _conv_init(ks[ki], self.num_landmarks, 256, 1); ki += 1
            if i < self.num_modules - 1:
                p[f"bl{i}"] = _conv_init(ks[ki], 256, 256, 1); ki += 1
                p[f"al{i}"] = _conv_init(ks[ki], 256, self.num_landmarks, 1); ki += 1
        return p

    def __call__(self, params: Params, x):
        """x: (N,3,256,256) in [0,1] -> final (N,68,64,64) heatmaps."""
        x = jax.nn.relu(_bn(params["bn1"], _conv(params["conv1"], x, stride=2, padding=3)))
        x = _avg_pool_2x2(ConvBlock(64, 128)(params["conv2"], x))
        x = ConvBlock(128, 128)(params["conv3"], x)
        x = ConvBlock(128, 256)(params["conv4"], x)
        previous = x
        hg = HourGlass()
        out = None
        for i in range(self.num_modules):
            ll = hg(params[f"m{i}"], previous)
            ll = ConvBlock(256, 256)(params[f"top_m_{i}"], ll)
            ll = jax.nn.relu(_bn(params[f"bn_end{i}"], _conv(params[f"conv_last{i}"], ll)))
            out = _conv(params[f"l{i}"], ll)
            if i < self.num_modules - 1:
                previous = (
                    previous + _conv(params[f"bl{i}"], ll) + _conv(params[f"al{i}"], out)
                )
        return out


def decode_heatmaps(heatmaps):
    """(N,68,H,W) -> (N,68,2) landmark xy in heatmap pixels, with the
    face_alignment quarter-pixel offset toward the neighboring larger
    activation (utils.get_preds_fromhm)."""
    n, c, h, w = heatmaps.shape
    flat = heatmaps.reshape(n, c, h * w)
    idx = jnp.argmax(flat, axis=-1)
    ys = idx // w
    xs = idx % w

    def at(dy, dx):
        yy = jnp.clip(ys + dy, 0, h - 1)
        xx = jnp.clip(xs + dx, 0, w - 1)
        return jnp.take_along_axis(flat, (yy * w + xx)[..., None], axis=-1)[..., 0]

    dx = jnp.sign(at(0, 1) - at(0, -1)) * 0.25
    dy = jnp.sign(at(1, 0) - at(-1, 0)) * 0.25
    # face_alignment guards BOTH axes jointly (0 < p < 63) before
    # applying either nudge (utils.get_preds_fromhm)
    interior = (xs > 0) & (xs < w - 1) & (ys > 0) & (ys < h - 1)
    x = xs.astype(jnp.float32) + jnp.where(interior, dx, 0.0)
    y = ys.astype(jnp.float32) + jnp.where(interior, dy, 0.0)
    return jnp.stack([x, y], axis=-1)


def landmarks_from_image(fan: FAN, params: Params, image01, bbox=None):
    """image01: (N,3,S,S) in [0,1] (any square size; resized to 256).
    bbox: optional (N,4) [x0,y0,x1,y1] in image pixels — defaults to the
    full frame. Returns (N,68,2) landmarks in image pixel coords."""
    from spi_tpu.ops import resize_bilinear

    n, _, hh, ww = image01.shape
    x = resize_bilinear(image01, (256, 256))
    heat = fan(params, x)
    pts = decode_heatmaps(heat)  # 64x64 grid
    if bbox is None:
        scale = jnp.array([ww / 64.0, hh / 64.0], jnp.float32)
        return pts * scale[None, None]
    x0, y0, x1, y1 = [bbox[:, i] for i in range(4)]
    sx = (x1 - x0) / 64.0
    sy = (y1 - y0) / 64.0
    return jnp.stack(
        [pts[..., 0] * sx[:, None] + x0[:, None], pts[..., 1] * sy[:, None] + y0[:, None]],
        axis=-1,
    )
