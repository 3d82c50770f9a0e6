"""StyleGAN2 generator networks, TPU-native.

Behavioral spec: eg3d/training/networks_stylegan2.py (mapping network
:193-271, synthesis layers :276-464, synthesis network :469-524,
generator facade :529-552). Re-designed for TPU:

- Parameters are nested-dict pytrees (names mirror torch state_dict keys
  so checkpoint conversion is mechanical).
- modulated_conv2d uses the NON-fused formulation (scale activations
  before the conv, demodulate after): on TPU one big shared-weight conv
  on the MXU beats per-sample grouped convs, and in fp32 the two forms
  are algebraically identical (networks_stylegan2.py:69-79 is the spec).
- The fp16-per-resolution logic is dropped: inversion runs fp32
  (the reference forces .float() too, spi/training/projectors/
  w_projector.py:31); a global bf16 switch can be layered on later.
- Noise buffers (`noise_const`) live in the params pytree: stage-1
  inversion optimizes them (w_projector.py:45-61), so they must be
  first-class leaves, not hidden module state.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from spi_tpu.ops import bias_act, conv2d_resample, setup_filter, upsample2d
from spi_tpu.ops.bias_act import activation_funcs

Params = dict[str, Any]


def normalize_2nd_moment(x, axis=-1, eps=1e-8):
    """networks_stylegan2.py:28-29."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


# ---------------------------------------------------------------------------
# FullyConnectedLayer (networks_stylegan2.py:96-127)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class FullyConnected:
    in_features: int
    out_features: int
    bias: bool = True
    activation: str = "linear"
    lr_multiplier: float = 1.0
    bias_init: float = 0.0

    def init(self, key) -> Params:
        p = {
            "weight": jax.random.normal(
                key, (self.out_features, self.in_features), jnp.float32
            )
            / self.lr_multiplier
        }
        if self.bias:
            p["bias"] = jnp.full((self.out_features,), self.bias_init, jnp.float32)
        return p

    def __call__(self, params: Params, x):
        weight_gain = self.lr_multiplier / math.sqrt(self.in_features)
        w = params["weight"] * weight_gain
        x = x @ w.T
        b = params.get("bias")
        if b is not None and self.lr_multiplier != 1.0:
            b = b * self.lr_multiplier
        return bias_act(x, b, act=self.activation)


# ---------------------------------------------------------------------------
# modulated_conv2d (networks_stylegan2.py:34-91), non-fused formulation
# ---------------------------------------------------------------------------


def modulated_conv2d(
    x,
    weight,
    styles,
    noise=None,
    up=1,
    down=1,
    padding=0,
    resample_filter=None,
    demodulate=True,
    flip_weight=True,
):
    """Style-modulated convolution.

    x: (N, I, H, W); weight: (O, I, kh, kw); styles: (N, I).
    Equivalent to the reference's fused grouped-conv path in fp32, but
    executed as scale -> shared-weight conv -> scale, which maps to a
    single large MXU convolution regardless of batch size.
    """
    # named_scope mirrors the reference's profiled_function on
    # modulated_conv2d (networks_stylegan2.py:33) for jax.profiler traces.
    with jax.named_scope("modulated_conv2d"):
        dcoefs = None
        if demodulate:
            # sum_{i,k,k} (w_oik * s_i)^2 = sum_i (sum_kk w^2)_oi * s_i^2
            w2 = jnp.sum(jnp.square(weight), axis=(2, 3))  # (O, I)
            sigma2 = jnp.square(styles) @ w2.T  # (N, O)
            dcoefs = jax.lax.rsqrt(sigma2 + 1e-8)

        x = x * styles[:, :, None, None]
        x = conv2d_resample(
            x,
            weight,
            f=resample_filter,
            up=up,
            down=down,
            padding=padding,
            flip_weight=flip_weight,
        )
        if demodulate:
            x = x * dcoefs[:, :, None, None]
        if noise is not None:
            x = x + noise
        return x


# ---------------------------------------------------------------------------
# SynthesisLayer (networks_stylegan2.py:276-335)
# ---------------------------------------------------------------------------

_RESAMPLE_FILTER = setup_filter([1, 3, 3, 1])


@dataclasses.dataclass(frozen=True)
class SynthesisLayer:
    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = "lrelu"
    conv_clamp: float | None = 256.0

    @property
    def affine(self) -> FullyConnected:
        return FullyConnected(self.w_dim, self.in_channels, bias_init=1.0)

    def init(self, key) -> Params:
        ks = jax.random.split(key, 3)
        p: Params = {
            "affine": self.affine.init(ks[0]),
            "weight": jax.random.normal(
                ks[1],
                (self.out_channels, self.in_channels, self.kernel_size, self.kernel_size),
                jnp.float32,
            ),
            "bias": jnp.zeros((self.out_channels,), jnp.float32),
        }
        if self.use_noise:
            p["noise_const"] = jax.random.normal(
                ks[2], (self.resolution, self.resolution), jnp.float32
            )
            p["noise_strength"] = jnp.zeros((), jnp.float32)
        return p

    def __call__(self, params: Params, x, w, noise_mode="const", gain=1.0, rng=None):
        assert noise_mode in ("random", "const", "none")
        styles = self.affine(params["affine"], w)

        noise = None
        if self.use_noise and noise_mode == "random":
            assert rng is not None, "noise_mode='random' requires an rng key"
            noise = (
                jax.random.normal(
                    rng, (x.shape[0], 1, self.resolution, self.resolution), x.dtype
                )
                * params["noise_strength"]
            )
        if self.use_noise and noise_mode == "const":
            noise = params["noise_const"] * params["noise_strength"]

        flip_weight = self.up == 1
        x = modulated_conv2d(
            x,
            params["weight"],
            styles,
            noise=noise,
            up=self.up,
            padding=self.kernel_size // 2,
            resample_filter=_RESAMPLE_FILTER,
            flip_weight=flip_weight,
        )
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, params["bias"], act=self.activation, gain=act_gain, clamp=act_clamp)


# ---------------------------------------------------------------------------
# ToRGBLayer (networks_stylegan2.py:340-360)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ToRGBLayer:
    in_channels: int
    out_channels: int
    w_dim: int
    kernel_size: int = 1
    conv_clamp: float | None = 256.0

    @property
    def affine(self) -> FullyConnected:
        return FullyConnected(self.w_dim, self.in_channels, bias_init=1.0)

    def init(self, key) -> Params:
        ks = jax.random.split(key, 2)
        return {
            "affine": self.affine.init(ks[0]),
            "weight": jax.random.normal(
                ks[1],
                (self.out_channels, self.in_channels, self.kernel_size, self.kernel_size),
                jnp.float32,
            ),
            "bias": jnp.zeros((self.out_channels,), jnp.float32),
        }

    def __call__(self, params: Params, x, w):
        weight_gain = 1.0 / math.sqrt(self.in_channels * self.kernel_size**2)
        styles = self.affine(params["affine"], w) * weight_gain
        x = modulated_conv2d(x, params["weight"], styles, demodulate=False)
        return bias_act(x, params["bias"], clamp=self.conv_clamp)


# ---------------------------------------------------------------------------
# SynthesisBlock (networks_stylegan2.py:365-464) — 'skip' architecture,
# with the no-upsample variant used by superresolution
# (eg3d/training/superresolution.py:158-257) folded in via `up`.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SynthesisBlock:
    in_channels: int  # 0 = first block (learned const input)
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    is_last: bool
    architecture: str = "skip"
    conv_clamp: float | None = 256.0
    up: int = 2  # 1 => SynthesisBlockNoUp

    @property
    def num_conv(self) -> int:
        return 1 if self.in_channels == 0 else 2

    @property
    def num_torgb(self) -> int:
        return 1 if (self.is_last or self.architecture == "skip") else 0

    @property
    def conv0(self) -> SynthesisLayer | None:
        if self.in_channels == 0:
            return None
        return SynthesisLayer(
            self.in_channels,
            self.out_channels,
            w_dim=self.w_dim,
            resolution=self.resolution,
            up=self.up,
            conv_clamp=self.conv_clamp,
        )

    @property
    def conv1(self) -> SynthesisLayer:
        return SynthesisLayer(
            self.out_channels,
            self.out_channels,
            w_dim=self.w_dim,
            resolution=self.resolution,
            conv_clamp=self.conv_clamp,
        )

    @property
    def torgb(self) -> ToRGBLayer | None:
        if self.num_torgb == 0:
            return None
        return ToRGBLayer(
            self.out_channels, self.img_channels, w_dim=self.w_dim, conv_clamp=self.conv_clamp
        )

    def init(self, key) -> Params:
        ks = jax.random.split(key, 4)
        p: Params = {}
        if self.in_channels == 0:
            p["const"] = jax.random.normal(
                ks[0], (self.out_channels, self.resolution, self.resolution), jnp.float32
            )
        else:
            p["conv0"] = self.conv0.init(ks[1])
        p["conv1"] = self.conv1.init(ks[2])
        if self.torgb is not None:
            p["torgb"] = self.torgb.init(ks[3])
        return p

    def __call__(self, params: Params, x, img, ws, noise_mode="const", rng=None):
        """ws: (N, num_conv + num_torgb, w_dim)."""
        w_idx = 0

        def next_w():
            nonlocal w_idx
            w = ws[:, w_idx]
            w_idx += 1
            return w

        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)

        if self.in_channels == 0:
            x = jnp.tile(params["const"][None], (ws.shape[0], 1, 1, 1))
            x = self.conv1(params["conv1"], x, next_w(), noise_mode=noise_mode, rng=rngs[0])
        else:
            x = self.conv0(params["conv0"], x, next_w(), noise_mode=noise_mode, rng=rngs[0])
            x = self.conv1(params["conv1"], x, next_w(), noise_mode=noise_mode, rng=rngs[1])

        if img is not None and self.up > 1:
            img = upsample2d(img, _RESAMPLE_FILTER)
        if self.torgb is not None:
            y = self.torgb(params["torgb"], x, next_w())
            img = img + y if img is not None else y
        return x, img


# ---------------------------------------------------------------------------
# SynthesisNetwork (networks_stylegan2.py:469-524)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SynthesisNetwork:
    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: float | None = 256.0

    @property
    def block_resolutions(self) -> tuple[int, ...]:
        log2 = int(math.log2(self.img_resolution))
        return tuple(2**i for i in range(2, log2 + 1))

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    def block(self, res: int) -> SynthesisBlock:
        return SynthesisBlock(
            in_channels=self.channels(res // 2) if res > 4 else 0,
            out_channels=self.channels(res),
            w_dim=self.w_dim,
            resolution=res,
            img_channels=self.img_channels,
            is_last=(res == self.img_resolution),
            conv_clamp=self.conv_clamp,
        )

    @property
    def num_ws(self) -> int:
        n = 0
        for res in self.block_resolutions:
            b = self.block(res)
            n += b.num_conv
            if b.is_last:
                n += b.num_torgb
        return n

    def init(self, key) -> Params:
        ks = jax.random.split(key, len(self.block_resolutions))
        return {
            f"b{res}": self.block(res).init(k)
            for res, k in zip(self.block_resolutions, ks)
        }

    def __call__(self, params: Params, ws, noise_mode="const", rng=None):
        """ws: (N, num_ws, w_dim) -> (N, img_channels, R, R)."""
        x = img = None
        w_idx = 0
        rngs = (
            jax.random.split(rng, len(self.block_resolutions))
            if rng is not None
            else [None] * len(self.block_resolutions)
        )
        for res, brng in zip(self.block_resolutions, rngs):
            block = self.block(res)
            # Block consumes num_conv + num_torgb ws starting at w_idx; the
            # NEXT block starts at w_idx + num_conv (torgb w is shared with
            # the next block's first w — networks_stylegan2.py:503-512).
            block_ws = jax.lax.dynamic_slice_in_dim(
                ws, w_idx, block.num_conv + block.num_torgb, axis=1
            )
            x, img = block(params[f"b{res}"], x, img, block_ws, noise_mode=noise_mode, rng=brng)
            w_idx += block.num_conv
        return img


# ---------------------------------------------------------------------------
# MappingNetwork (networks_stylegan2.py:193-271)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MappingNetwork:
    z_dim: int
    c_dim: int
    w_dim: int
    num_ws: int | None
    num_layers: int = 8
    lr_multiplier: float = 0.01
    w_avg_beta: float | None = 0.998

    @property
    def embed_features(self) -> int:
        return self.w_dim if self.c_dim > 0 else 0

    def fc(self, idx: int) -> FullyConnected:
        features = (
            [self.z_dim + self.embed_features]
            + [self.w_dim] * (self.num_layers - 1)
            + [self.w_dim]
        )
        return FullyConnected(
            features[idx],
            features[idx + 1],
            activation="lrelu",
            lr_multiplier=self.lr_multiplier,
        )

    def init(self, key) -> Params:
        ks = jax.random.split(key, self.num_layers + 1)
        p: Params = {}
        if self.c_dim > 0:
            p["embed"] = FullyConnected(self.c_dim, self.embed_features).init(ks[0])
        for i in range(self.num_layers):
            p[f"fc{i}"] = self.fc(i).init(ks[i + 1])
        if self.num_ws is not None and self.w_avg_beta is not None:
            p["w_avg"] = jnp.zeros((self.w_dim,), jnp.float32)
        return p

    def __call__(self, params: Params, z, c, truncation_psi=1.0, truncation_cutoff=None):
        x = None
        if self.z_dim > 0:
            x = normalize_2nd_moment(z.astype(jnp.float32))
        if self.c_dim > 0:
            y = normalize_2nd_moment(
                FullyConnected(self.c_dim, self.embed_features)(
                    params["embed"], c.astype(jnp.float32)
                )
            )
            x = jnp.concatenate([x, y], axis=1) if x is not None else y

        for i in range(self.num_layers):
            x = self.fc(i)(params[f"fc{i}"], x)

        if self.num_ws is not None:
            x = jnp.tile(x[:, None], (1, self.num_ws, 1))

        if truncation_psi != 1.0:
            w_avg = params["w_avg"]
            if self.num_ws is None or truncation_cutoff is None:
                x = w_avg + truncation_psi * (x - w_avg)
            else:
                head = w_avg + truncation_psi * (x[:, :truncation_cutoff] - w_avg)
                x = jnp.concatenate([head, x[:, truncation_cutoff:]], axis=1)
        return x


# ---------------------------------------------------------------------------
# Generator facade (networks_stylegan2.py:529-552)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Generator:
    z_dim: int
    c_dim: int
    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512

    @property
    def synthesis(self) -> SynthesisNetwork:
        return SynthesisNetwork(
            w_dim=self.w_dim,
            img_resolution=self.img_resolution,
            img_channels=self.img_channels,
            channel_base=self.channel_base,
            channel_max=self.channel_max,
        )

    @property
    def num_ws(self) -> int:
        return self.synthesis.num_ws

    @property
    def mapping(self) -> MappingNetwork:
        return MappingNetwork(
            z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim, num_ws=self.num_ws
        )

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        return {
            "mapping": self.mapping.init(k1),
            "synthesis": self.synthesis.init(k2),
        }

    def __call__(self, params: Params, z, c, truncation_psi=1.0, noise_mode="const", rng=None):
        ws = self.mapping(params["mapping"], z, c, truncation_psi=truncation_psi)
        return self.synthesis(params["synthesis"], ws, noise_mode=noise_mode, rng=rng)
