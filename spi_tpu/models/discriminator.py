"""StyleGAN2 discriminator stack + EG3D dual discriminator, TPU-native.

Behavioral spec: eg3d/training/networks_stylegan2.py:557-795
(DiscriminatorBlock resnet architecture, MinibatchStdLayer,
DiscriminatorEpilogue, Discriminator facade) and
eg3d/training/dual_discriminator.py:21-200 (SingleDiscriminator,
filtered_resizing, DualDiscriminator concatenating the SR image with
the bilinear-antialias-upsampled raw neural render).

Only needed for EG3D GAN training (SURVEY.md §2.2: unused by the SPI
inversion CLI); fp16-per-resolution is dropped — TPU runs fp32/bf16
globally. Param keys mirror torch state_dict names.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from spi_tpu.ops import bias_act, conv2d_resample, resize_bilinear, setup_filter
from spi_tpu.ops.bias_act import activation_funcs
from spi_tpu.models.stylegan2 import FullyConnected, MappingNetwork

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ConvLayer:
    """Conv2dLayer (networks_stylegan2.py:135-190): normalized-weight
    conv with optional resampling + fused bias/activation."""

    in_channels: int
    out_channels: int
    kernel_size: int
    bias: bool = True
    activation: str = "linear"
    up: int = 1
    down: int = 1
    conv_clamp: float | None = None

    def init(self, key) -> Params:
        p = {
            "weight": jax.random.normal(
                key,
                (self.out_channels, self.in_channels, self.kernel_size, self.kernel_size),
                jnp.float32,
            )
        }
        if self.bias:
            p["bias"] = jnp.zeros((self.out_channels,), jnp.float32)
        return p

    def __call__(self, params: Params, x, gain: float = 1.0):
        weight_gain = 1 / math.sqrt(self.in_channels * self.kernel_size**2)
        w = params["weight"] * weight_gain
        f = setup_filter([1, 3, 3, 1])
        x = conv2d_resample(
            x, w, f=f, up=self.up, down=self.down,
            padding=self.kernel_size // 2, flip_weight=(self.up == 1),
        )
        act_gain = activation_funcs[self.activation].def_gain * gain
        clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(
            x, params.get("bias"), act=self.activation, gain=act_gain, clamp=clamp
        )


@dataclasses.dataclass(frozen=True)
class DiscriminatorBlock:
    """networks_stylegan2.py:557-645, resnet architecture."""

    in_channels: int  # 0 = first block (fromrgb)
    tmp_channels: int
    out_channels: int
    resolution: int
    img_channels: int
    activation: str = "lrelu"
    conv_clamp: float | None = 256.0

    @property
    def fromrgb(self) -> ConvLayer | None:
        if self.in_channels != 0:
            return None
        return ConvLayer(
            self.img_channels, self.tmp_channels, 1,
            activation=self.activation, conv_clamp=self.conv_clamp,
        )

    @property
    def conv0(self) -> ConvLayer:
        return ConvLayer(
            self.tmp_channels, self.tmp_channels, 3,
            activation=self.activation, conv_clamp=self.conv_clamp,
        )

    @property
    def conv1(self) -> ConvLayer:
        return ConvLayer(
            self.tmp_channels, self.out_channels, 3,
            activation=self.activation, down=2, conv_clamp=self.conv_clamp,
        )

    @property
    def skip(self) -> ConvLayer:
        return ConvLayer(self.tmp_channels, self.out_channels, 1, bias=False, down=2)

    def init(self, key) -> Params:
        ks = jax.random.split(key, 4)
        p = {}
        if self.fromrgb is not None:
            p["fromrgb"] = self.fromrgb.init(ks[0])
        p["conv0"] = self.conv0.init(ks[1])
        p["conv1"] = self.conv1.init(ks[2])
        p["skip"] = self.skip.init(ks[3])
        return p

    def __call__(self, params: Params, x, img):
        if self.fromrgb is not None:
            y = self.fromrgb(params["fromrgb"], img)
            x = x + y if x is not None else y
        y = self.skip(params["skip"], x, gain=math.sqrt(0.5))
        x = self.conv0(params["conv0"], x)
        x = self.conv1(params["conv1"], x, gain=math.sqrt(0.5))
        return y + x, None


def minibatch_stddev(x, group_size: int = 4, num_channels: int = 1):
    """MinibatchStdLayer (networks_stylegan2.py:648-676). Static shapes:
    group = min(group_size, N) resolved at trace time."""
    n, c, h, w = x.shape
    g = min(group_size, n)
    while n % g != 0:  # torch.min handles N not divisible implicitly; be safe
        g -= 1
    f = num_channels
    cc = c // f
    y = x.reshape(g, n // g, f, cc, h, w)
    y = y - y.mean(axis=0)
    y = jnp.sqrt(jnp.mean(jnp.square(y), axis=0) + 1e-8)
    y = y.mean(axis=(2, 3, 4))  # (n//g, F)
    y = y.reshape(-1, f, 1, 1)
    y = jnp.tile(y, (g, 1, h, w))
    return jnp.concatenate([x, y], axis=1)


@dataclasses.dataclass(frozen=True)
class DiscriminatorEpilogue:
    """networks_stylegan2.py:678-733."""

    in_channels: int
    cmap_dim: int
    resolution: int = 4
    img_channels: int = 3
    mbstd_group_size: int = 4
    mbstd_num_channels: int = 1
    activation: str = "lrelu"
    conv_clamp: float | None = 256.0

    @property
    def conv(self) -> ConvLayer:
        return ConvLayer(
            self.in_channels + self.mbstd_num_channels, self.in_channels, 3,
            activation=self.activation, conv_clamp=self.conv_clamp,
        )

    @property
    def fc(self) -> FullyConnected:
        return FullyConnected(
            self.in_channels * self.resolution**2, self.in_channels,
            activation=self.activation,
        )

    @property
    def out(self) -> FullyConnected:
        return FullyConnected(
            self.in_channels, 1 if self.cmap_dim == 0 else self.cmap_dim
        )

    def init(self, key) -> Params:
        ks = jax.random.split(key, 3)
        return {
            "conv": self.conv.init(ks[0]),
            "fc": self.fc.init(ks[1]),
            "out": self.out.init(ks[2]),
        }

    def __call__(self, params: Params, x, cmap=None):
        if self.mbstd_num_channels > 0:
            x = minibatch_stddev(
                x, self.mbstd_group_size, self.mbstd_num_channels
            )
        x = self.conv(params["conv"], x)
        x = self.fc(params["fc"], x.reshape(x.shape[0], -1))
        x = self.out(params["out"], x)
        if self.cmap_dim > 0:
            x = jnp.sum(x * cmap, axis=1, keepdims=True) / math.sqrt(self.cmap_dim)
        return x


@dataclasses.dataclass(frozen=True)
class Discriminator:
    """Single-image discriminator facade (networks_stylegan2.py:735-795 /
    dual_discriminator.py:21-80 SingleDiscriminator)."""

    c_dim: int
    img_resolution: int
    img_channels: int = 3
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: float | None = 256.0
    cmap_dim: int | None = None
    disc_c_noise: float = 0.0

    @property
    def block_resolutions(self) -> list[int]:
        log2 = int(math.log2(self.img_resolution))
        return [2**i for i in range(log2, 2, -1)]

    def _channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @property
    def _cmap_dim(self) -> int:
        if self.c_dim == 0:
            return 0
        return self.cmap_dim if self.cmap_dim is not None else self._channels(4)

    def block(self, res: int) -> DiscriminatorBlock:
        return DiscriminatorBlock(
            in_channels=self._channels(res) if res < self.img_resolution else 0,
            tmp_channels=self._channels(res),
            out_channels=self._channels(res // 2),
            resolution=res,
            img_channels=self.img_channels,
            conv_clamp=self.conv_clamp,
        )

    @property
    def mapping(self) -> MappingNetwork | None:
        if self.c_dim == 0:
            return None
        return MappingNetwork(
            z_dim=0, c_dim=self.c_dim, w_dim=self._cmap_dim,
            num_ws=None, w_avg_beta=None,
        )

    @property
    def b4(self) -> DiscriminatorEpilogue:
        return DiscriminatorEpilogue(
            self._channels(4), cmap_dim=self._cmap_dim,
            img_channels=self.img_channels, conv_clamp=self.conv_clamp,
        )

    def init(self, key) -> Params:
        n = len(self.block_resolutions)
        ks = jax.random.split(key, n + 2)
        p = {
            f"b{res}": self.block(res).init(k)
            for res, k in zip(self.block_resolutions, ks[:n])
        }
        if self.mapping is not None:
            p["mapping"] = self.mapping.init(ks[n])
        p["b4"] = self.b4.init(ks[n + 1])
        return p

    def __call__(self, params: Params, img, c, rng=None):
        x = None
        for res in self.block_resolutions:
            x, _ = self.block(res)(params[f"b{res}"], x, img if x is None else None)
        cmap = None
        if self.mapping is not None:
            cc = c
            if self.disc_c_noise > 0 and rng is not None:
                cc = c + jax.random.normal(rng, c.shape) * c.std(axis=0) * self.disc_c_noise
            cmap = self.mapping(params["mapping"], None, cc)
        return self.b4(params["b4"], x, cmap)


def filtered_resizing(image, size: int):
    """dual_discriminator.py:86-102, default 'antialiased' mode."""
    return resize_bilinear(image, (size, size), antialias=True)


@dataclasses.dataclass(frozen=True)
class DualDiscriminator(Discriminator):
    """EG3D dual discriminator (dual_discriminator.py:107-200): the SR
    image concatenated with the antialias-resized raw render -> a
    6-channel Discriminator."""

    img_channels: int = 6  # 3 (image) + 3 (resized image_raw)

    def __call__(self, params: Params, img: dict, c, rng=None):
        image_raw = filtered_resizing(img["image_raw"], img["image"].shape[-1])
        x = jnp.concatenate([img["image"], image_raw], axis=1)
        return Discriminator.__call__(self, params, x, c, rng=rng)
