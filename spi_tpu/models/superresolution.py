"""Superresolution networks (128 -> 512 etc.).

Spec: eg3d/training/superresolution.py. The shipped FFHQ-512 checkpoint
uses SuperresolutionHybrid8XDC (:264-290): two StyleGAN2 synthesis
blocks (32->256 @256, 256->128 @512) fed the last w repeated 3x. The
4X/2X/8X variants reuse the same blocks with a no-upsample first block
(SynthesisBlockNoUp, :158-257 — our SynthesisBlock with up=1).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from spi_tpu.models.stylegan2 import Params, SynthesisBlock
from spi_tpu.ops import resize_bilinear


@dataclasses.dataclass(frozen=True)
class Superresolution:
    """Generic two-block SR network covering the Hybrid variants.

    torch class name (for checkpoint conversion) is recorded in
    `variant`; block configs are derived from it.
    """

    variant: str  # e.g. 'SuperresolutionHybrid8XDC'
    img_resolution: int
    channels: int = 32
    sr_antialias: bool = True
    w_dim: int = 512
    # Clamp on the internal block widths. None (default) keeps the exact
    # reference widths (superresolution.py:41,73,106,276) — required for
    # checkpoint conversion. Toy/test configs (e.g. the multichip dryrun,
    # which runs on the XLA CPU backend) set a small value: the SR convs
    # are the dominant FLOPs of a toy-shape synthesis and full-width
    # blocks make the dryrun's execution minutes long on CPU.
    channel_max: int | None = None

    def _clamp(self, ch: int) -> int:
        return ch if self.channel_max is None else min(ch, self.channel_max)

    def __post_init__(self):
        # The output resolution is fixed by the variant's block stack
        # (block1 always upsamples 2x from block0's resolution); a
        # mismatched img_resolution would silently render at the
        # architecture's resolution while callers size buffers to
        # img_resolution.
        expected = 2 * self.block0.resolution
        if self.img_resolution != expected:
            raise ValueError(
                f"{self.variant} outputs {expected}^2, but img_resolution="
                f"{self.img_resolution}"
            )

    @property
    def input_resolution(self) -> int:
        return {
            "SuperresolutionHybrid8XDC": 128,
            "SuperresolutionHybrid8X": 128,
            "SuperresolutionHybrid4X": 128,
            "SuperresolutionHybrid2X": 64,
        }[self.variant]

    @property
    def block0(self) -> SynthesisBlock:
        if self.variant == "SuperresolutionHybrid8XDC":
            return SynthesisBlock(
                self.channels, self._clamp(256), w_dim=self.w_dim, resolution=256,
                img_channels=3, is_last=False, conv_clamp=None, up=2,
            )
        if self.variant == "SuperresolutionHybrid8X":
            return SynthesisBlock(
                self.channels, self._clamp(128), w_dim=self.w_dim, resolution=256,
                img_channels=3, is_last=False, conv_clamp=None, up=2,
            )
        if self.variant == "SuperresolutionHybrid4X":
            return SynthesisBlock(
                self.channels, self._clamp(128), w_dim=self.w_dim, resolution=128,
                img_channels=3, is_last=False, conv_clamp=None, up=1,
            )
        if self.variant == "SuperresolutionHybrid2X":
            return SynthesisBlock(
                self.channels, self._clamp(128), w_dim=self.w_dim, resolution=64,
                img_channels=3, is_last=False, conv_clamp=None, up=1,
            )
        raise ValueError(self.variant)

    @property
    def block1(self) -> SynthesisBlock:
        out_res = self.img_resolution
        in_ch = self.block0.out_channels
        # reference block1 widths: 64 everywhere except the DC variant
        # (superresolution.py:41,73,106,276)
        out_ch = self._clamp(128 if self.variant == "SuperresolutionHybrid8XDC" else 64)
        return SynthesisBlock(
            in_ch, out_ch, w_dim=self.w_dim, resolution=out_res,
            img_channels=3, is_last=True, conv_clamp=None, up=2,
        )

    def init(self, key) -> Params:
        k0, k1 = jax.random.split(key)
        return {"block0": self.block0.init(k0), "block1": self.block1.init(k1)}

    def __call__(self, params: Params, rgb, x, ws, noise_mode="none", rng=None):
        """rgb: (N, 3, r, r); x: (N, C, r, r); ws: (N, L, 512)."""
        ws = jnp.tile(ws[:, -1:, :], (1, 3, 1))

        if x.shape[-1] != self.input_resolution:
            x = resize_bilinear(
                x, (self.input_resolution, self.input_resolution), antialias=self.sr_antialias
            )
            rgb = resize_bilinear(
                rgb, (self.input_resolution, self.input_resolution), antialias=self.sr_antialias
            )

        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        x, rgb = self.block0(params["block0"], x, rgb, ws, noise_mode=noise_mode, rng=rngs[0])
        _, rgb = self.block1(params["block1"], x, rgb, ws, noise_mode=noise_mode, rng=rngs[1])
        return rgb
