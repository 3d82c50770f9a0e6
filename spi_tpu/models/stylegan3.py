"""StyleGAN3 (alias-free) generator networks, TPU-native.

Behavioral spec: eg3d/training/networks_stylegan3.py (SynthesisInput
:171-254, SynthesisLayer :258-396, SynthesisNetwork :400-489, Generator
:493-523). Needed only for SG3-backbone EG3D checkpoints; the shipped
FFHQ checkpoint uses the SG2 backbone (SURVEY.md §2.2).

TPU redesign notes:
- The alias-free nonlinearity is `spi_tpu.ops.filtered_lrelu` — the
  XLA-composed form of the reference's 1.8k-line CUDA kernel.
- modulated conv uses the same non-fused scale->conv->scale formulation
  as spi_tpu.models.stylegan2 (one shared-weight MXU conv per layer),
  with SG3's extra pre-normalization of weight/styles and the
  magnitude-EMA input gain folded into the activation scaling.
- Filter banks / layer geometry (cutoffs, sampling rates, paddings) are
  static numpy computed from the dataclass fields at trace time.
- magnitude_ema is a params leaf updated functionally (update_emas
  returns a new params tree instead of mutating a buffer).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from spi_tpu.models.stylegan2 import FullyConnected, MappingNetwork
from spi_tpu.ops import conv2d_resample, filtered_lrelu

Params = dict[str, Any]


def design_lowpass_filter(numtaps: int, cutoff: float, width: float, fs: float,
                          radial: bool = False):
    """Kaiser low-pass FIR design (networks_stylegan3.py:364-386).

    Returns a 1D separable filter, a 2D radial (jinc) filter, or None
    for the identity (numtaps == 1).
    """
    assert numtaps >= 1
    if numtaps == 1:
        return None
    import scipy.signal

    if not radial:
        f = scipy.signal.firwin(numtaps=numtaps, cutoff=cutoff, width=width, fs=fs)
        return np.asarray(f, dtype=np.float32)

    import scipy.special

    x = (np.arange(numtaps) - (numtaps - 1) / 2) / fs
    r = np.hypot(*np.meshgrid(x, x))
    with np.errstate(divide="ignore", invalid="ignore"):
        f = scipy.special.j1(2 * cutoff * (np.pi * r)) / (np.pi * r)
    # The reference relies on numtaps being even for radial filters
    # (r never hits 0); for odd taps fill the analytic r->0 limit
    # j1(2πc r)/(π r) -> c so the filter stays finite.
    if numtaps % 2 == 1:
        mid = (numtaps - 1) // 2
        f[mid, mid] = cutoff
    beta = scipy.signal.kaiser_beta(scipy.signal.kaiser_atten(numtaps, width / (fs / 2)))
    w = np.kaiser(numtaps, beta)
    f = f * np.outer(w, w)
    f = f / np.sum(f)
    return np.asarray(f, dtype=np.float32)


def modulated_conv2d_sg3(x, weight, styles, input_gain=None, demodulate=True,
                         padding=0):
    """SG3-flavored modulated conv (networks_stylegan3.py:26-67), in the
    non-fused scale->shared-conv->scale form (fp32-identical)."""
    if demodulate:
        weight = weight * jax.lax.rsqrt(
            jnp.mean(jnp.square(weight), axis=(1, 2, 3), keepdims=True)
        )
        styles = styles * jax.lax.rsqrt(jnp.mean(jnp.square(styles)))

    dcoefs = None
    if demodulate:
        w2 = jnp.sum(jnp.square(weight), axis=(2, 3))  # (O, I)
        sigma2 = jnp.square(styles) @ w2.T  # (N, O)
        dcoefs = jax.lax.rsqrt(sigma2 + 1e-8)

    scale = styles
    if input_gain is not None:
        scale = scale * input_gain
    x = x * scale[:, :, None, None].astype(x.dtype)
    x = conv2d_resample(x, weight.astype(x.dtype), padding=padding)
    if dcoefs is not None:
        x = x * dcoefs[:, :, None, None].astype(x.dtype)
    return x


# ---------------------------------------------------------------------------
# SynthesisInput (networks_stylegan3.py:171-254)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SynthesisInput:
    w_dim: int
    channels: int
    size: int
    sampling_rate: float
    bandwidth: float

    @property
    def affine(self) -> FullyConnected:
        return FullyConnected(self.w_dim, 4)

    def init(self, key) -> Params:
        kf, kp, kw = jax.random.split(key, 3)
        # Random frequencies from a uniform 2D disc, scaled to bandwidth.
        freqs = jax.random.normal(kf, (self.channels, 2), jnp.float32)
        radii = jnp.sqrt(jnp.sum(jnp.square(freqs), axis=1, keepdims=True))
        freqs = freqs / (radii * jnp.exp(jnp.square(radii)) ** 0.25)
        freqs = freqs * self.bandwidth
        phases = jax.random.uniform(kp, (self.channels,), jnp.float32) - 0.5
        return {
            "weight": jax.random.normal(kw, (self.channels, self.channels), jnp.float32),
            # affine: weight_init=0, bias_init=(1,0,0,0) — identity transform
            "affine": {
                "weight": jnp.zeros((4, self.w_dim), jnp.float32),
                "bias": jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32),
            },
            "transform": jnp.eye(3, dtype=jnp.float32),
            "freqs": freqs,
            "phases": phases,
        }

    def __call__(self, params: Params, w):
        n = w.shape[0]
        transforms = params["transform"][None]  # (1, 3, 3)
        freqs = jnp.broadcast_to(params["freqs"][None], (n,) + params["freqs"].shape)
        phases = jnp.broadcast_to(params["phases"][None], (n,) + params["phases"].shape)

        # Learned rotation/translation (applied inversely to the grid).
        t = self.affine(params["affine"], w)  # (N, 4) = (r_c, r_s, t_x, t_y)
        t = t / jnp.linalg.norm(t[:, :2], axis=1, keepdims=True)
        zeros = jnp.zeros((n,), t.dtype)
        ones = jnp.ones((n,), t.dtype)
        m_r = jnp.stack(
            [t[:, 0], -t[:, 1], zeros, t[:, 1], t[:, 0], zeros, zeros, zeros, ones],
            axis=1,
        ).reshape(n, 3, 3)
        m_t = jnp.stack(
            [ones, zeros, -t[:, 2], zeros, ones, -t[:, 3], zeros, zeros, ones],
            axis=1,
        ).reshape(n, 3, 3)
        transforms = m_r @ m_t @ transforms  # (N, 3, 3)

        phases = phases + jnp.einsum("ncd,nde->nce", freqs, transforms[:, :2, 2:])[..., 0]
        freqs = jnp.einsum("ncd,nde->nce", freqs, transforms[:, :2, :2])

        # Dampen out-of-band frequencies introduced by the transform.
        amplitudes = jnp.clip(
            1
            - (jnp.linalg.norm(freqs, axis=2) - self.bandwidth)
            / (self.sampling_rate / 2 - self.bandwidth),
            0.0,
            1.0,
        )

        # Pixel-center sampling grid in [-0.5, 0.5] * size/sampling_rate
        # (torch affine_grid, align_corners=False).
        half = 0.5 * self.size / self.sampling_rate
        coords = (jnp.arange(self.size, dtype=jnp.float32) * 2 + 1) / self.size - 1
        gx = jnp.broadcast_to(coords[None, :], (self.size, self.size)) * half
        gy = jnp.broadcast_to(coords[:, None], (self.size, self.size)) * half
        grid = jnp.stack([gx, gy], axis=-1)  # (H, W, 2)

        # Fourier features: sin(2π (g·f + phase)) * amplitude.
        x = jnp.einsum("hwd,ncd->nhwc", grid, freqs) + phases[:, None, None, :]
        x = jnp.sin(x * (2 * jnp.pi))
        x = x * amplitudes[:, None, None, :]

        weight = params["weight"] / math.sqrt(self.channels)
        x = x @ weight.T
        return jnp.transpose(x, (0, 3, 1, 2))  # (N, C, H, W)


# ---------------------------------------------------------------------------
# SynthesisLayer (networks_stylegan3.py:258-396)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SG3SynthesisLayer:
    w_dim: int
    is_torgb: bool
    is_critically_sampled: bool
    in_channels: int
    out_channels: int
    in_size: int
    out_size: int
    in_sampling_rate: int
    out_sampling_rate: int
    in_cutoff: float
    out_cutoff: float
    in_half_width: float
    out_half_width: float
    conv_kernel: int = 3
    filter_size: int = 6
    lrelu_upsampling: int = 2
    use_radial_filters: bool = False
    conv_clamp: float | None = 256.0
    magnitude_ema_beta: float = 0.999

    def __post_init__(self):
        if self.is_torgb:
            object.__setattr__(self, "conv_kernel", 1)

    @property
    def tmp_sampling_rate(self) -> int:
        return max(self.in_sampling_rate, self.out_sampling_rate) * (
            1 if self.is_torgb else self.lrelu_upsampling
        )

    @property
    def up_factor(self) -> int:
        return int(round(self.tmp_sampling_rate / self.in_sampling_rate))

    @property
    def down_factor(self) -> int:
        return int(round(self.tmp_sampling_rate / self.out_sampling_rate))

    @property
    def up_taps(self) -> int:
        return self.filter_size * self.up_factor if (
            self.up_factor > 1 and not self.is_torgb
        ) else 1

    @property
    def down_taps(self) -> int:
        return self.filter_size * self.down_factor if (
            self.down_factor > 1 and not self.is_torgb
        ) else 1

    @functools.cached_property
    def up_filter(self):
        return design_lowpass_filter(
            numtaps=self.up_taps, cutoff=self.in_cutoff,
            width=self.in_half_width * 2, fs=self.tmp_sampling_rate,
        )

    @functools.cached_property
    def down_filter(self):
        return design_lowpass_filter(
            numtaps=self.down_taps, cutoff=self.out_cutoff,
            width=self.out_half_width * 2, fs=self.tmp_sampling_rate,
            radial=self.use_radial_filters and not self.is_critically_sampled,
        )

    @property
    def padding(self) -> list[int]:
        # networks_stylegan3.py:322-328
        pad_total = (self.out_size - 1) * self.down_factor + 1
        pad_total -= (self.in_size + self.conv_kernel - 1) * self.up_factor
        pad_total += self.up_taps + self.down_taps - 2
        pad_lo = (pad_total + self.up_factor) // 2
        pad_hi = pad_total - pad_lo
        return [int(pad_lo), int(pad_hi), int(pad_lo), int(pad_hi)]

    @property
    def affine(self) -> FullyConnected:
        return FullyConnected(self.w_dim, self.in_channels, bias_init=1.0)

    def init(self, key) -> Params:
        ka, kw = jax.random.split(key)
        return {
            "affine": self.affine.init(ka),
            "weight": jax.random.normal(
                kw,
                (self.out_channels, self.in_channels, self.conv_kernel, self.conv_kernel),
                jnp.float32,
            ),
            "bias": jnp.zeros((self.out_channels,), jnp.float32),
            "magnitude_ema": jnp.ones((), jnp.float32),
        }

    def __call__(self, params: Params, x, w):
        input_gain = jax.lax.rsqrt(params["magnitude_ema"])
        styles = self.affine(params["affine"], w)
        if self.is_torgb:
            styles = styles / math.sqrt(self.in_channels * self.conv_kernel**2)

        x = modulated_conv2d_sg3(
            x, params["weight"], styles,
            input_gain=input_gain,
            demodulate=not self.is_torgb,
            padding=self.conv_kernel - 1,
        )

        gain = 1.0 if self.is_torgb else math.sqrt(2.0)
        slope = 1.0 if self.is_torgb else 0.2
        x = filtered_lrelu(
            x, fu=self.up_filter, fd=self.down_filter, b=params["bias"].astype(x.dtype),
            up=self.up_factor, down=self.down_factor, padding=self.padding,
            gain=gain, slope=slope, clamp=self.conv_clamp,
        )
        assert x.shape[2] == self.out_size and x.shape[3] == self.out_size
        return x

    def updated_magnitude_ema(self, params: Params, x) -> Params:
        """Functional analog of update_emas (networks_stylegan3.py:336-340)."""
        cur = jnp.mean(jnp.square(x.astype(jnp.float32)))
        ema = cur + self.magnitude_ema_beta * (params["magnitude_ema"] - cur)
        return {**params, "magnitude_ema": ema}


# ---------------------------------------------------------------------------
# SynthesisNetwork (networks_stylegan3.py:400-489)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SG3SynthesisNetwork:
    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    num_layers: int = 14
    num_critical: int = 2
    first_cutoff: float = 2.0
    first_stopband: float = 2**2.1
    last_stopband_rel: float = 2**0.3
    margin_size: int = 10
    output_scale: float = 0.25
    use_radial_filters: bool = False

    @property
    def num_ws(self) -> int:
        return self.num_layers + 2

    @functools.cached_property
    def _schedule(self):
        """Per-layer (cutoff, stopband, sampling_rate, half_width, size,
        channels) — networks_stylegan3.py:430-443."""
        last_cutoff = self.img_resolution / 2
        last_stopband = last_cutoff * self.last_stopband_rel
        exponents = np.minimum(
            np.arange(self.num_layers + 1) / (self.num_layers - self.num_critical), 1
        )
        cutoffs = self.first_cutoff * (last_cutoff / self.first_cutoff) ** exponents
        stopbands = (
            self.first_stopband * (last_stopband / self.first_stopband) ** exponents
        )
        sampling_rates = np.exp2(
            np.ceil(np.log2(np.minimum(stopbands * 2, self.img_resolution)))
        )
        half_widths = np.maximum(stopbands, sampling_rates / 2) - cutoffs
        sizes = sampling_rates + self.margin_size * 2
        sizes[-2:] = self.img_resolution
        channels = np.rint(
            np.minimum((self.channel_base / 2) / cutoffs, self.channel_max)
        )
        channels[-1] = self.img_channels
        return cutoffs, stopbands, sampling_rates, half_widths, sizes, channels

    @property
    def input(self) -> SynthesisInput:
        cutoffs, _, sampling_rates, _, sizes, channels = self._schedule
        return SynthesisInput(
            w_dim=self.w_dim, channels=int(channels[0]), size=int(sizes[0]),
            sampling_rate=float(sampling_rates[0]), bandwidth=float(cutoffs[0]),
        )

    def layer(self, idx: int) -> SG3SynthesisLayer:
        cutoffs, _, rates, half_widths, sizes, channels = self._schedule
        prev = max(idx - 1, 0)
        is_torgb = idx == self.num_layers
        return SG3SynthesisLayer(
            w_dim=self.w_dim,
            is_torgb=is_torgb,
            is_critically_sampled=idx >= self.num_layers - self.num_critical,
            in_channels=int(channels[prev]),
            out_channels=int(channels[idx]),
            in_size=int(sizes[prev]),
            out_size=int(sizes[idx]),
            in_sampling_rate=int(rates[prev]),
            out_sampling_rate=int(rates[idx]),
            in_cutoff=float(cutoffs[prev]),
            out_cutoff=float(cutoffs[idx]),
            in_half_width=float(half_widths[prev]),
            out_half_width=float(half_widths[idx]),
            use_radial_filters=self.use_radial_filters,
        )

    def layer_name(self, idx: int) -> str:
        layer = self.layer(idx)
        return f"L{idx}_{layer.out_size}_{layer.out_channels}"

    def init(self, key) -> Params:
        ks = jax.random.split(key, self.num_layers + 2)
        p: Params = {"input": self.input.init(ks[0])}
        for idx in range(self.num_layers + 1):
            p[self.layer_name(idx)] = self.layer(idx).init(ks[idx + 1])
        return p

    def __call__(self, params: Params, ws, noise_mode="const", rng=None):
        del noise_mode, rng  # SG3 has no per-layer noise (':331 unused')
        x = self.input(params["input"], ws[:, 0].astype(jnp.float32))
        for idx in range(self.num_layers + 1):
            x = self.layer(idx)(
                params[self.layer_name(idx)], x, ws[:, idx + 1].astype(jnp.float32)
            )
        if self.output_scale != 1:
            x = x * self.output_scale
        return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Generator facade (networks_stylegan3.py:493-523)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SG3Generator:
    z_dim: int
    c_dim: int
    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    mapping_layers: int = 2

    @property
    def synthesis(self) -> SG3SynthesisNetwork:
        return SG3SynthesisNetwork(
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
            z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim,
            num_ws=self.num_ws, num_layers=self.mapping_layers,
        )

    def init(self, key) -> Params:
        k1, k2 = jax.random.split(key)
        return {"mapping": self.mapping.init(k1), "synthesis": self.synthesis.init(k2)}

    def __call__(self, params: Params, z, c, truncation_psi=1.0, noise_mode="const",
                 rng=None):
        ws = self.mapping(params["mapping"], z, c, truncation_psi=truncation_psi)
        return self.synthesis(params["synthesis"], ws, noise_mode=noise_mode, rng=rng)
