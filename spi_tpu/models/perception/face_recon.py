"""3DMM coefficient regressor (Deep3DFaceRecon), TPU-native.

Behavioral spec: third_part/Deep3DFaceRecon_pytorch/models/networks.py
:69-105 (ReconNetWrapper: torchvision ResNet-50 backbone with
use_last_fc=False + seven 1x1-conv coefficient heads) and
models/bfm.py split_coeff (id 80 / exp 64 / tex 80 / angle 3 /
gamma 27 / trans 3). The SPI preprocess consumes only `angle` and
`trans` (preprocess/extract_camera.py:87-136); the full 257-coeff
split is exposed for parity.

Param keys mirror the torch state_dict
(backbone.conv1.weight, backbone.layer1.0.conv1.weight, ...,
final_layers.0.weight) so conversion from `epoch_20.pth` is mechanical.

Input: (N, 3, 224, 224) RGB in [0, 1] (facerecon_model.py feeds
im/255 without ImageNet normalization).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from spi_tpu.ops import conv2d

Params = dict[str, Any]

# (name, dim) of the seven final heads, concatenation order fixed by
# networks.py:85-93; split order by bfm.py split_coeff.
COEFF_SPLIT = (
    ("id", 80),
    ("exp", 64),
    ("tex", 80),
    ("angle", 3),
    ("gamma", 27),
    ("trans_xy", 2),
    ("trans_z", 1),
)


def _bn_init(c):
    return {
        "weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
        "running_mean": jnp.zeros((c,)), "running_var": jnp.ones((c,)),
    }


def _bn(p, x, eps=1e-5):
    scale = p["weight"] * jax.lax.rsqrt(p["running_var"] + eps)
    bias = p["bias"] - p["running_mean"] * scale
    return x * scale[None, :, None, None] + bias[None, :, None, None]


def _conv_init(key, cout, cin, k):
    w = jax.random.normal(key, (cout, cin, k, k), jnp.float32)
    return {"weight": w * jnp.sqrt(2.0 / (cin * k * k))}


def _max_pool_3x3_s2(x):
    x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), constant_values=-jnp.inf)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
    )


@dataclasses.dataclass(frozen=True)
class TorchvisionBottleneck:
    """torchvision ResNet Bottleneck: stride on conv2 (3x3)."""

    inplanes: int
    planes: int
    stride: int = 1

    def init(self, key) -> Params:
        ks = jax.random.split(key, 4)
        p = {
            "conv1": _conv_init(ks[0], self.planes, self.inplanes, 1),
            "bn1": _bn_init(self.planes),
            "conv2": _conv_init(ks[1], self.planes, self.planes, 3),
            "bn2": _bn_init(self.planes),
            "conv3": _conv_init(ks[2], self.planes * 4, self.planes, 1),
            "bn3": _bn_init(self.planes * 4),
        }
        if self.stride != 1 or self.inplanes != self.planes * 4:
            p["downsample"] = {
                "0": _conv_init(ks[3], self.planes * 4, self.inplanes, 1),
                "1": _bn_init(self.planes * 4),
            }
        return p

    def __call__(self, params: Params, x):
        out = jax.nn.relu(_bn(params["bn1"], conv2d(x, params["conv1"]["weight"])))
        out = jax.nn.relu(
            _bn(params["bn2"],
                conv2d(out, params["conv2"]["weight"], stride=self.stride, padding=1))
        )
        out = _bn(params["bn3"], conv2d(out, params["conv3"]["weight"]))
        if "downsample" in params:
            x = _bn(
                params["downsample"]["1"],
                conv2d(x, params["downsample"]["0"]["weight"], stride=self.stride),
            )
        return jax.nn.relu(out + x)


@dataclasses.dataclass(frozen=True)
class ResNet50Backbone:
    """torchvision resnet50 without the fc head; output pooled (N, 2048)."""

    stage_blocks: tuple[int, ...] = (3, 4, 6, 3)
    width: int = 64

    def _stages(self):
        stages = []
        inplanes = self.width
        planes = self.width
        for si, n in enumerate(self.stage_blocks):
            stride = 1 if si == 0 else 2
            blocks = []
            for bi in range(n):
                blocks.append(
                    TorchvisionBottleneck(inplanes, planes, stride if bi == 0 else 1)
                )
                inplanes = planes * 4
            stages.append((f"layer{si + 1}", blocks))
            planes *= 2
        return stages

    def init(self, key) -> Params:
        ks = jax.random.split(key, 1 + len(self.stage_blocks))
        p = {
            "conv1": _conv_init(ks[0], self.width, 3, 7),
            "bn1": _bn_init(self.width),
        }
        for (name, blocks), k in zip(self._stages(), ks[1:]):
            bkeys = jax.random.split(k, len(blocks))
            p[name] = {str(i): b.init(bk) for i, (b, bk) in enumerate(zip(blocks, bkeys))}
        return p

    def __call__(self, params: Params, x):
        x = conv2d(x, params["conv1"]["weight"], stride=2, padding=3)
        x = jax.nn.relu(_bn(params["bn1"], x))
        x = _max_pool_3x3_s2(x)
        for name, blocks in self._stages():
            for i, b in enumerate(blocks):
                x = b(params[name][str(i)], x)
        return jnp.mean(x, axis=(2, 3))  # adaptive avg pool to 1x1


@dataclasses.dataclass(frozen=True)
class FaceReconNet:
    """ResNet-50 -> 257 BFM coefficients."""

    backbone: ResNet50Backbone = ResNet50Backbone()
    feature_dim: int = 2048

    def init(self, key) -> Params:
        kb, = jax.random.split(key, 1)
        heads = {}
        for i, (_, dim) in enumerate(COEFF_SPLIT):
            # reference zero-inits the heads (networks.py:94-96)
            heads[str(i)] = {
                "weight": jnp.zeros((dim, self.feature_dim, 1, 1)),
                "bias": jnp.zeros((dim,)),
            }
        return {"backbone": self.backbone.init(kb), "final_layers": heads}

    def __call__(self, params: Params, x):
        """x: (N,3,224,224) in [0,1] -> (N, 257) raw coefficients."""
        feat = self.backbone(params["backbone"], x)
        outs = []
        for i, (_, dim) in enumerate(COEFF_SPLIT):
            head = params["final_layers"][str(i)]
            w = head["weight"].reshape(dim, self.feature_dim)
            outs.append(feat @ w.T + head["bias"])
        return jnp.concatenate(outs, axis=1)

    @staticmethod
    def split_coeff(coeffs):
        """(N, 257) -> dict with keys id/exp/tex/angle/gamma/trans
        (bfm.py split_coeff semantics; trans = trans_xy ++ trans_z)."""
        out = {}
        i = 0
        for name, dim in COEFF_SPLIT:
            out[name] = coeffs[:, i : i + dim]
            i += dim
        out["trans"] = jnp.concatenate([out.pop("trans_xy"), out.pop("trans_z")], axis=1)
        return out
