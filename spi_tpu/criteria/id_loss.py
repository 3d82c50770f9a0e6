"""Identity loss / similarity via ArcFace IR-SE50.

Spec: spi/criteria/id_loss/id_loss.py — crop rows 35:223, cols 32:220
(face region of a 256^2 image), adaptive-avg-pool to 112^2, embed, and
use cosine similarity (1 - cos as the loss).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from spi_tpu.models.perception.arcface import IRSE50
from spi_tpu.ops import resize_bilinear


def _adaptive_avg_pool(x, out: int):
    """torch AdaptiveAvgPool2d semantics: bin i covers
    [floor(i*H/out), ceil((i+1)*H/out))."""
    n, c, h, w = x.shape
    if h == out and w == out:
        return x
    if h % out == 0 and w % out == 0:
        fh, fw = h // out, w // out
        return x.reshape(n, c, out, fh, out, fw).mean(axis=(3, 5))
    # Non-integer bins (188 -> 112): matches torch only approximately;
    # bilinear resize is the standard TPU-friendly stand-in.
    return resize_bilinear(x, (out, out))


@dataclasses.dataclass(frozen=True)
class IDLoss:
    facenet: IRSE50 = IRSE50()

    def init(self, key):
        return {"facenet": self.facenet.init(key)}

    def extract_feats(self, params, x):
        """x: (N, 3, 256, 256) in [-1, 1]."""
        x = x[:, :, 35:223, 32:220]
        x = _adaptive_avg_pool(x, 112)
        return self.facenet(params["facenet"], x)

    def similarity(self, params, x, y):
        fx = self.extract_feats(params, x)
        fy = self.extract_feats(params, y)
        return jnp.sum(fx * fy, axis=-1)

    def __call__(self, params, x, y):
        return jnp.mean(1.0 - self.similarity(params, x, y))
