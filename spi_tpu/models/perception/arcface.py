"""ArcFace IR-SE50 backbone for the ID loss.

Spec: spi/criteria/id_loss/model_irse.py + helpers.py (InsightFace
IR-SE50): input conv 3->64 + BN + PReLU; 4 stages of bottleneck_IR_SE
units ([3,4,14,3], depths [64,128,256,512], stride-2 stage entries);
output BN -> flatten -> 512*7*7 FC -> BatchNorm1d -> L2 norm.

Inference-only: BatchNorm runs with stored statistics (leaves
`running_mean`/`running_var` in the params tree, converted from the
model_ir_se50.pth checkpoint). Dropout is identity at eval.

Param keys mirror the torch state_dict (input_layer.0.weight,
body.{i}.res_layer.{j}..., output_layer.3.weight, ...).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from spi_tpu.ops import conv2d

_STAGES = [  # (in_channel, depth, num_units)
    (64, 64, 3),
    (64, 128, 4),
    (128, 256, 14),
    (256, 512, 3),
]


def _units():
    """[(in_channel, depth, stride)] flattened body, matching
    helpers.get_blocks(50)."""
    units = []
    for in_ch, depth, n in _STAGES:
        units.append((in_ch, depth, 2))
        units.extend((depth, depth, 1) for _ in range(n - 1))
    return units


def _bn_init(ch):
    return {
        "weight": jnp.ones((ch,), jnp.float32),
        "bias": jnp.zeros((ch,), jnp.float32),
        "running_mean": jnp.zeros((ch,), jnp.float32),
        "running_var": jnp.ones((ch,), jnp.float32),
    }


def _bn_apply(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["running_var"] + eps)
    scale = (p["weight"] * inv)[None, :, None, None]
    shift = (p["bias"] - p["running_mean"] * p["weight"] * inv)[None, :, None, None]
    return x * scale + shift


def _prelu(p, x):
    a = p[None, :, None, None]
    return jnp.where(x >= 0, x, a * x)


def _conv_init(key, cin, cout, k):
    fan = cin * k * k
    return jax.random.normal(key, (cout, cin, k, k), jnp.float32) * jnp.sqrt(2.0 / fan)


@dataclasses.dataclass(frozen=True)
class IRSE50:
    embedding_size: int = 512

    def init(self, key):
        return jax.jit(self._init_impl)(key)

    def _init_impl(self, key):
        keys = iter(jax.random.split(key, 4 + 6 * len(_units())))
        p = {
            "input_layer": {
                "0": {"weight": _conv_init(next(keys), 3, 64, 3)},
                "1": _bn_init(64),
                "2": {"weight": jnp.full((64,), 0.25, jnp.float32)},  # PReLU
            },
            "body": {},
            "output_layer": {
                "0": _bn_init(512),
                "3": {
                    "weight": jax.random.normal(next(keys), (512, 512 * 7 * 7)) * 0.01,
                    "bias": jnp.zeros((512,), jnp.float32),
                },
                "4": _bn_init(512),  # BatchNorm1d(affine in ref ctor)
            },
        }
        for i, (cin, depth, stride) in enumerate(_units()):
            unit = {
                "res_layer": {
                    "0": _bn_init(cin),
                    "1": {"weight": _conv_init(next(keys), cin, depth, 3)},
                    "2": {"weight": jnp.full((depth,), 0.25, jnp.float32)},
                    "3": {"weight": _conv_init(next(keys), depth, depth, 3)},
                    "4": _bn_init(depth),
                    "5": {  # SEModule
                        "fc1": {"weight": _conv_init(next(keys), depth, depth // 16, 1)},
                        "fc2": {"weight": _conv_init(next(keys), depth // 16, depth, 1)},
                    },
                },
            }
            if cin != depth:
                unit["shortcut_layer"] = {
                    "0": {"weight": _conv_init(next(keys), cin, depth, 1)},
                    "1": _bn_init(depth),
                }
            p["body"][str(i)] = unit
        return p

    def __call__(self, params, x):
        """x: (N, 3, 112, 112) in [-1, 1] -> L2-normalized (N, 512)."""
        p = params["input_layer"]
        x = conv2d(x, p["0"]["weight"], padding=1)
        x = _bn_apply(p["1"], x)
        x = _prelu(p["2"]["weight"], x)

        for i, (cin, depth, stride) in enumerate(_units()):
            u = params["body"][str(i)]
            if cin == depth:
                # MaxPool2d(1, stride): stride-subsample
                shortcut = x[:, :, ::stride, ::stride]
            else:
                shortcut = conv2d(x, u["shortcut_layer"]["0"]["weight"], stride=stride)
                shortcut = _bn_apply(u["shortcut_layer"]["1"], shortcut)
            r = u["res_layer"]
            res = _bn_apply(r["0"], x)
            res = conv2d(res, r["1"]["weight"], padding=1)
            res = _prelu(r["2"]["weight"], res)
            res = conv2d(res, r["3"]["weight"], stride=stride, padding=1)
            res = _bn_apply(r["4"], res)
            # SE
            se = res.mean(axis=(2, 3), keepdims=True)
            se = conv2d(se, r["5"]["fc1"]["weight"])
            se = jax.nn.relu(se)
            se = conv2d(se, r["5"]["fc2"]["weight"])
            res = res * jax.nn.sigmoid(se)
            x = res + shortcut

        o = params["output_layer"]
        x = _bn_apply(o["0"], x)
        x = x.reshape(x.shape[0], -1)
        x = x @ o["3"]["weight"].T + o["3"]["bias"]
        # BatchNorm1d
        inv = jax.lax.rsqrt(o["4"]["running_var"] + 1e-5)
        x = (x - o["4"]["running_mean"]) * inv * o["4"]["weight"] + o["4"]["bias"]
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)
