"""LPIPS perceptual distance (VGG16 backbone).

Spec: spi/criteria/lpips/lpips.py:32-71 + networks.py:36-58,88-96:
- inputs in [-1, 1]; if larger than 256, bilinear-resize to 256
  (align_corners=False, no antialias)
- shift/scale with the LPIPS constants (mean [-.030,-.088,-.188],
  std [.458,.448,.450]) — equivalent to ImageNet normalization of the
  [0,1] image
- VGG16 activations at relu1_2, relu2_2, relu3_3, relu4_3, relu5_3,
  channel-unit-normalized
- squared difference -> 1x1 'lin' head -> spatial mean -> sum over
  layers and batch, divided by batch
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from spi_tpu.models.perception.vgg import VGG16_CFG, VGGFeatures
from spi_tpu.ops import resize_bilinear

_SHIFT = jnp.array([-0.030, -0.088, -0.188], jnp.float32)
_SCALE = jnp.array([0.458, 0.448, 0.450], jnp.float32)

def _normalize_activation(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=1, keepdims=True))
    return x / (norm + eps)


@dataclasses.dataclass(frozen=True)
class LPIPS:
    """params = {'net': vgg features pytree, 'lin': [(C_l,) weights]}."""

    max_size: int = 256
    # Rematerialize the VGG feature stack in the backward: its conv
    # activations (~0.4 GB per 256^2 image pair) otherwise stay live
    # across every loss term of a multi-camera SPI step.
    remat: bool = True
    # bf16 conv path (fp32 master weights / unit-normalization /
    # distance accumulation); perceptual distances tolerate it easily.
    compute_dtype: str = "float32"
    # Backbone config (torchvision layout). Defaults reproduce the
    # reference LPIPS-VGG16; toy configs (e.g. the multichip dryrun)
    # can swap in a few-conv net to keep XLA CPU compile time bounded.
    cfg: tuple = VGG16_CFG
    target_layers: tuple[int, ...] = (3, 8, 15, 22, 29)

    @property
    def net(self) -> VGGFeatures:
        return VGGFeatures(cfg=self.cfg, target_layers=self.target_layers)

    @property
    def n_channels(self) -> tuple[int, ...]:
        by_idx = {idx: cout for idx, kind, _, cout in self.net.module_list()}
        return tuple(by_idx[i] for i in self.target_layers)

    def init(self, key):
        knet, klin = jax.random.split(key)
        n_channels = self.n_channels
        lin_keys = jax.random.split(klin, len(n_channels))
        return {
            "net": self.net.init(knet),
            # lin heads are 1x1 convs without bias; stored as (C,) vectors.
            "lin": [
                jnp.abs(jax.random.normal(k, (c,), jnp.float32)) / c
                for k, c in zip(lin_keys, n_channels)
            ],
        }

    def features(self, params, x):
        """x in [-1,1], (N,3,H,W) -> list of unit-normalized activations."""
        if x.shape[-1] > self.max_size:
            x = resize_bilinear(x, (self.max_size, self.max_size))
        x = (x - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]

        dt = jnp.dtype(self.compute_dtype)

        def run_net(net_params, x):
            if dt != jnp.float32:
                net_params = jax.tree_util.tree_map(
                    lambda v: v.astype(dt), net_params
                )
                x = x.astype(dt)
            feats = self.net(net_params, x)
            # unit-normalize in fp32 (sum of squares over 512 channels)
            return [_normalize_activation(f.astype(jnp.float32)) for f in feats]

        if self.remat:
            run_net = jax.checkpoint(run_net)
        return run_net(params["net"], x)

    def __call__(self, params, x, y, mask=None, y_feats=None):
        """Perceptual distance, summed over batch / batch size
        (lpips.py:33-71). mask: optional (N,1,H,W) in [0,1], area-pooled to
        each feature resolution.

        y_feats: optional precomputed `features(params, y)` — pass it when
        y is constant across an optimization loop (the recon target) so
        its VGG stack isn't re-run (and remat-recomputed in the backward)
        every step. When given, y is ignored."""
        n = x.shape[0]
        fx = self.features(params, x)
        fy = y_feats if y_feats is not None else self.features(params, y)
        total = 0.0
        for f_x, f_y, lin in zip(fx, fy, params["lin"]):
            diff = jnp.square(f_x - f_y)
            if mask is not None:
                h = diff.shape[-1]
                m = _area_pool_to(mask, h)
                diff = diff * m
            # 1x1 conv with (C,) weights == channel-weighted sum.
            per_pixel = jnp.einsum("nchw,c->nhw", diff, lin)
            total = total + jnp.sum(jnp.mean(per_pixel, axis=(1, 2)))
        return total / n


def _area_pool_to(mask, size: int):
    n, c, h, w = mask.shape
    assert h % size == 0
    f = h // size
    return mask.reshape(n, c, size, f, size, f).mean(axis=(3, 5))
