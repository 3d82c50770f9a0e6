"""Facial-region contextual (CX) loss on landmark boxes.

Spec: spi/criteria/bbox_cx_loss.py — mouth/eye boxes from 68-point
landmarks (:20-37), roi_align 80x80 crops (:41-61), VGG19 conv2_1
features (:76-90), contextual loss (cosine distance -> relative
distance -> softmax CX -> -log max, :93-182). Used as the mirror-rot
loss in the RotBbox coach (rot_bbox_cx_coach.py:107-131).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from spi_tpu.models.perception.vgg import VGG19_CFG, VGGFeatures
from spi_tpu.ops import resize_bilinear
from spi_tpu.ops.roi_align import roi_align

_VGG_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
_VGG_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


def landmark_boxes(lm):
    """68-pt landmarks (N, 68, 2) at 256 scale -> [mouth, l_eye, r_eye]
    boxes (N, 4) as (x1, y1, x2, y2) (bbox_cx_loss.py:20-37; the nose box
    is computed there but unused by the CX loss)."""
    boxes = []
    for i, (lo, hi) in enumerate([(48, 68), (36, 42), (42, 48)]):
        pts = lm[:, lo:hi]
        pad = 15.0 if i > 0 else 8.0
        x1 = jnp.floor(jnp.min(pts[:, :, 0], axis=1)) - pad
        x2 = jnp.floor(jnp.max(pts[:, :, 0], axis=1)) + pad
        y1 = jnp.floor(jnp.min(pts[:, :, 1], axis=1)) - pad
        y2 = jnp.floor(jnp.max(pts[:, :, 1], axis=1)) + pad
        boxes.append(jnp.stack([x1, y1, x2, y2], axis=1))
    return boxes


def _cosine_distance(x, y):
    """(N, C, H, W) pairs -> (N, HW, HW) distances (bbox_cx_loss.py:93-115)."""
    y_mu = y.mean(axis=(0, 2, 3), keepdims=True)
    xc = x - y_mu
    yc = y - y_mu
    xn = xc / (jnp.linalg.norm(xc, axis=1, keepdims=True) + 1e-12)
    yn = yc / (jnp.linalg.norm(yc, axis=1, keepdims=True) + 1e-12)
    n, c = x.shape[:2]
    xn = xn.reshape(n, c, -1)
    yn = yn.reshape(n, c, -1)
    sim = jnp.einsum("ncp,ncq->npq", xn, yn)
    return 1.0 - sim


def _cx(dist, band_width):
    dist_min = jnp.min(dist, axis=2, keepdims=True)
    dist_tilde = jnp.clip(dist / (dist_min + 1e-5), -10.0, 10.0)
    w = jnp.exp((1.0 - dist_tilde) / band_width)
    return w / jnp.sum(w, axis=2, keepdims=True)


@dataclasses.dataclass(frozen=True)
class BoxCXLoss:
    band_width: float = 0.5

    @property
    def vgg(self) -> VGGFeatures:
        # VGG19 slice1 = features[0:6] -> output of conv2_1 (module idx 5).
        return VGGFeatures(cfg=VGG19_CFG, target_layers=(5,))

    def init(self, key):
        return {"vgg": self.vgg.init(key)}

    def __call__(self, params, x, y, lm):
        """x, y: (N, 3, R, R) images; lm: (N, 68, 2) landmarks at 256 scale."""
        if x.shape[-1] > 256:
            x = resize_bilinear(x, (256, 256))
        if y.shape[-1] > 256:
            y = resize_bilinear(y, (256, 256))
        x = (x - _VGG_MEAN[None, :, None, None]) / _VGG_STD[None, :, None, None]
        y = (y - _VGG_MEAN[None, :, None, None]) / _VGG_STD[None, :, None, None]

        loss = 0.0
        for box in landmark_boxes(lm):
            crop_x = roi_align(x, box, output_size=80)
            crop_y = roi_align(y, box, output_size=80)
            fx = self.vgg(params["vgg"], crop_x)[0]
            fy = self.vgg(params["vgg"], crop_y)[0]
            dist = _cosine_distance(fx, fy)
            cx = _cx(dist, self.band_width)
            cx = jnp.mean(jnp.max(cx, axis=1), axis=1)
            loss = loss + jnp.mean(-jnp.log(cx + 1e-5))
        return loss * 0.1


@dataclasses.dataclass(frozen=True)
class BoxLoss:
    """SmoothL1 variant over the same crops (bbox_cx_loss.py:185-221)."""

    @property
    def vgg(self) -> VGGFeatures:
        return VGGFeatures(cfg=VGG19_CFG, target_layers=(5,))

    def init(self, key):
        return {"vgg": self.vgg.init(key)}

    def __call__(self, params, x, y, lm):
        if x.shape[-1] > 256:
            x = resize_bilinear(x, (256, 256))
        if y.shape[-1] > 256:
            y = resize_bilinear(y, (256, 256))
        x = (x - _VGG_MEAN[None, :, None, None]) / _VGG_STD[None, :, None, None]
        y = (y - _VGG_MEAN[None, :, None, None]) / _VGG_STD[None, :, None, None]
        loss = 0.0
        for box in landmark_boxes(lm):
            fx = self.vgg(params["vgg"], roi_align(x, box, output_size=80))[0]
            fy = self.vgg(params["vgg"], roi_align(y, box, output_size=80))[0]
            loss = loss + _smooth_l1(fx, fy)
        return loss


def _smooth_l1(a, b, beta: float = 1.0):
    d = jnp.abs(a - b)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))
