"""VGG feature extractors (torchvision layout) for perceptual losses.

Used by:
- LPIPS-VGG16 (spi/criteria/lpips/networks.py:88-96: activations at
  torchvision `features` indices 3, 8, 15, 22, 29 — relu1_2..relu5_3 —
  channel-unit-normalized).
- The StyleGAN-projector VGG16 feature distance
  (spi/training/projectors/w_projector.py:48-51 via the NVIDIA
  torchscript vgg16.pt `return_lpips=True` embedding).
- VGG19 slices for the contextual BoxCX loss
  (spi/criteria/bbox_cx_loss.py:76-90).

Parameter pytrees mirror torchvision state_dict keys
(features.{i}.weight / .bias) so conversion is mechanical.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from spi_tpu.ops import conv2d

# torchvision VGG configs: channel progression, 'M' = 2x2 maxpool.
VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M")
VGG19_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M")


def _max_pool_2x2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    )


@dataclasses.dataclass(frozen=True)
class VGGFeatures:
    """Runs torchvision-layout VGG `features` and returns activations at
    the requested module indices (indices follow torchvision numbering,
    where each conv and relu is a module and pools count too)."""

    cfg: tuple = VGG16_CFG
    target_layers: tuple[int, ...] = (3, 8, 15, 22, 29)  # relu outputs

    def module_list(self):
        """[(torchvision_index, kind, in_ch, out_ch)] for conv/relu/pool."""
        mods = []
        idx = 0
        in_ch = 3
        for v in self.cfg:
            if v == "M":
                mods.append((idx, "pool", in_ch, in_ch))
                idx += 1
            else:
                mods.append((idx, "conv", in_ch, v))
                idx += 1
                mods.append((idx, "relu", v, v))
                idx += 1
                in_ch = v
        return mods

    def init(self, key):
        return jax.jit(self._init_impl)(key)

    def _init_impl(self, key):
        params = {}
        mods = self.module_list()
        convs = [m for m in mods if m[1] == "conv"]
        keys = jax.random.split(key, len(convs))
        for (idx, _, cin, cout), k in zip(convs, keys):
            # He-style init as a stand-in when pretrained weights are absent.
            w = jax.random.normal(k, (cout, cin, 3, 3), jnp.float32)
            w = w * jnp.sqrt(2.0 / (cin * 9))
            params[f"features.{idx}.weight"] = w
            params[f"features.{idx}.bias"] = jnp.zeros((cout,), jnp.float32)
        return params

    def __call__(self, params, x):
        """x: (N, 3, H, W) already normalized. Returns list of activations
        at target_layers (in order)."""
        outputs = []
        max_layer = max(self.target_layers)
        for idx, kind, _, _ in self.module_list():
            if kind == "conv":
                x = conv2d(x, params[f"features.{idx}.weight"], padding=1)
                x = x + params[f"features.{idx}.bias"][None, :, None, None]
            elif kind == "relu":
                x = jax.nn.relu(x)
            else:
                x = _max_pool_2x2(x)
            if idx in self.target_layers:
                outputs.append(x)
            if idx >= max_layer:
                break
        return outputs


# ImageNet normalization used by torchvision-pretrained VGG (inputs in [0,1]).
IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


def imagenet_normalize(x01):
    """(N,3,H,W) in [0,1] -> ImageNet-normalized."""
    return (x01 - IMAGENET_MEAN[None, :, None, None]) / IMAGENET_STD[None, :, None, None]
