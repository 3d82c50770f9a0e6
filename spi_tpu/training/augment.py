"""ADA augmentation pipeline for discriminator inputs, TPU-native.

Behavioral spec: eg3d/training/augment.py (AugmentPipe). The reference
composes pixel blits, a general geometric affine, a 4x4 color
transform, wavelet-filtered amplification, additive noise and cutout,
all gated by a shared probability `p` adjusted by the ADA heuristic
(training_loop.py:322-326).

This implementation covers the transforms the released EG3D configs
enable (the 'blit+geom+color' groups plus cutout): xflip, 90-degree
rotations, integer/fractional translation, isotropic+anisotropic
scaling, arbitrary rotation — composed into ONE 2x3 affine applied with
a single grid_sample — and brightness/contrast/lumaflip/hue/saturation
as ONE 4x4 color matrix. The wavelet `imgfilter` group and additive
noise are intentionally omitted (off in the EG3D FFHQ configs); hooks
accept their flags and assert zero.

Everything is batched, shape-static and rng-explicit: one fused XLA
program per application.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

import numpy as np

from spi_tpu.ops import grid_sample

# sym2 wavelet lowpass (augment.py:34 wavelets['sym2'])
_SYM2 = np.array(
    [-0.12940952255092145, 0.22414386804185735, 0.836516303737469,
     0.48296291314469025]
)


def _make_fbank(num_bands: int = 4) -> np.ndarray:
    """4-band wavelet filter bank for the imgfilter group
    (augment.py:176-186): Bandpass(H(z), b_i) built from the sym2 QMF
    pair by repeated a-trous lowpass convolution + centered highpass."""
    hz_lo = _SYM2
    hz_hi = hz_lo * ((-1.0) ** np.arange(hz_lo.size))
    hz_lo2 = np.convolve(hz_lo, hz_lo[::-1]) / 2
    hz_hi2 = np.convolve(hz_hi, hz_hi[::-1]) / 2
    fbank = np.eye(num_bands, 1)
    for i in range(1, num_bands):
        # upsample taps 2x (insert zeros), drop the trailing zero
        fbank = np.dstack([fbank, np.zeros_like(fbank)]).reshape(
            fbank.shape[0], -1
        )[:, :-1]
        fbank = np.stack([np.convolve(row, hz_lo2) for row in fbank])
        lo = (fbank.shape[1] - hz_hi2.size) // 2
        fbank[i, lo : lo + hz_hi2.size] += hz_hi2
    return fbank.astype(np.float32)


_HZ_FBANK = _make_fbank()
# Expected power spectrum 1/f (augment.py:385)
_EXPECTED_POWER = np.array([10, 1, 1, 1], np.float32) / 13


def _rot2d(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    row0 = jnp.stack([c, -s, jnp.zeros_like(theta)], axis=-1)
    row1 = jnp.stack([s, c, jnp.zeros_like(theta)], axis=-1)
    row2 = jnp.stack(
        [jnp.zeros_like(theta), jnp.zeros_like(theta), jnp.ones_like(theta)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def _scale2d(sx, sy):
    z = jnp.zeros_like(sx)
    o = jnp.ones_like(sx)
    return jnp.stack(
        [
            jnp.stack([sx, z, z], axis=-1),
            jnp.stack([z, sy, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def _translate2d(tx, ty):
    z = jnp.zeros_like(tx)
    o = jnp.ones_like(tx)
    return jnp.stack(
        [
            jnp.stack([o, z, tx], axis=-1),
            jnp.stack([z, o, ty], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


@dataclasses.dataclass(frozen=True)
class AugmentPipe:
    # blit group
    xflip: float = 1.0
    rotate90: float = 1.0
    xint: float = 1.0
    xint_max: float = 0.125
    # geom group
    scale: float = 1.0
    rotate: float = 1.0
    aniso: float = 1.0
    xfrac: float = 1.0
    scale_std: float = 0.2
    rotate_max: float = 1.0  # fraction of pi
    aniso_std: float = 0.2
    xfrac_std: float = 0.125
    # color group
    brightness: float = 1.0
    contrast: float = 1.0
    lumaflip: float = 1.0
    hue: float = 1.0
    saturation: float = 1.0
    brightness_std: float = 0.2
    contrast_std: float = 0.5
    hue_max: float = 1.0
    saturation_std: float = 1.0
    # cutout
    cutout: float = 0.0
    cutout_size: float = 0.5
    # imgfilter group: per-band wavelet amplification (augment.py:382-411)
    imgfilter: float = 0.0
    imgfilter_bands: tuple = (1.0, 1.0, 1.0, 1.0)
    imgfilter_std: float = 1.0
    # additive RGB noise (augment.py:417-421)
    noise: float = 0.0
    noise_std: float = 0.1

    def _gate(self, rng, p, prob, n):
        """Bernoulli(p * prob) per sample."""
        return jax.random.uniform(rng, (n,)) < p * prob

    def __call__(self, params_unused, rng, images, p):
        """images: (N,C,H,W) in [-1,1]; p: scalar probability. Returns
        augmented images (same shape). `params_unused` keeps the module
        signature uniform (the pipe is parameter-free)."""
        del params_unused
        n, c, h, w = images.shape
        keys = jax.random.split(rng, 16)

        # ---- geometric: accumulate one 3x3 matrix per sample ------------
        g = jnp.tile(jnp.eye(3)[None], (n, 1, 1))

        if self.xflip > 0:
            flip = self._gate(keys[0], p, self.xflip, n)
            sx = jnp.where(flip, -1.0, 1.0)
            g = _scale2d(sx, jnp.ones_like(sx)) @ g
        if self.rotate90 > 0:
            apply = self._gate(keys[1], p, self.rotate90, n)
            k = jax.random.randint(keys[2], (n,), 0, 4)
            theta = jnp.where(apply, k.astype(jnp.float32) * (math.pi / 2), 0.0)
            g = _rot2d(theta) @ g
        if self.xint > 0:
            apply = self._gate(keys[3], p, self.xint, n)
            t = (
                jax.random.uniform(keys[4], (n, 2), minval=-1.0, maxval=1.0)
                * self.xint_max
            )
            t = jnp.where(apply[:, None], jnp.round(t * jnp.array([w, h])), 0.0)
            g = _translate2d(2 * t[:, 0] / w, 2 * t[:, 1] / h) @ g
        if self.scale > 0:
            apply = self._gate(keys[5], p, self.scale, n)
            s = jnp.exp2(jax.random.normal(keys[6], (n,)) * self.scale_std)
            s = jnp.where(apply, s, 1.0)
            g = _scale2d(s, s) @ g
        if self.rotate > 0:
            apply = self._gate(keys[7], p, self.rotate, n)
            theta = (
                jax.random.uniform(keys[8], (n,), minval=-1.0, maxval=1.0)
                * math.pi
                * self.rotate_max
            )
            g = _rot2d(jnp.where(apply, theta, 0.0)) @ g
        if self.aniso > 0:
            apply = self._gate(keys[9], p, self.aniso, n)
            s = jnp.exp2(jax.random.normal(keys[10], (n,)) * self.aniso_std)
            s = jnp.where(apply, s, 1.0)
            g = _scale2d(s, 1.0 / s) @ g
        if self.xfrac > 0:
            apply = self._gate(keys[11], p, self.xfrac, n)
            t = jax.random.normal(keys[12], (n, 2)) * self.xfrac_std
            t = jnp.where(apply[:, None], t, 0.0)
            g = _translate2d(2 * t[:, 0], 2 * t[:, 1]) @ g

        # apply inverse affine via grid_sample (zeros padding)
        inv = jnp.linalg.inv(g)
        # half-pixel-center grid: identity affine == exact identity under
        # the align_corners=False grid_sample convention
        ys, xs = jnp.meshgrid(
            (jnp.arange(h) + 0.5) * 2.0 / h - 1.0,
            (jnp.arange(w) + 0.5) * 2.0 / w - 1.0,
            indexing="ij",
        )
        ones = jnp.ones_like(xs)
        base = jnp.stack([xs, ys, ones], axis=-1).reshape(-1, 3)  # (HW, 3)
        grid = jnp.einsum("nij,pj->npi", inv, base)[..., :2].reshape(n, h, w, 2)
        images = grid_sample(images, grid)

        # ---- color: one 4x4 matrix per sample ---------------------------
        m = jnp.tile(jnp.eye(4)[None], (n, 1, 1))
        v_axis = jnp.array([1.0, 1.0, 1.0, 0.0]) / math.sqrt(3)

        if self.brightness > 0:
            apply = self._gate(keys[13], p, self.brightness, n)
            # magnitude key must differ from the gate key: uniform and
            # normal on the SAME key consume identical bits, coupling the
            # applied magnitude to the Bernoulli gate (one-sided aug).
            b = jnp.where(
                apply,
                jax.random.normal(jax.random.fold_in(keys[13], 1), (n,))
                * self.brightness_std,
                0.0,
            )
            t = jnp.zeros((n, 4, 4)).at[:, 0, 3].set(b).at[:, 1, 3].set(b).at[:, 2, 3].set(b)
            m = (jnp.eye(4)[None] + t) @ m
        if self.contrast > 0:
            apply = self._gate(keys[14], p, self.contrast, n)
            cmul = jnp.exp2(
                jax.random.normal(jax.random.fold_in(keys[14], 1), (n,))
                * self.contrast_std
            )
            cmul = jnp.where(apply, cmul, 1.0)
            diag = jnp.concatenate(
                [jnp.tile(cmul[:, None], (1, 3)), jnp.ones((n, 1))], axis=1
            )
            m = jax.vmap(jnp.diag)(diag) @ m
        if self.lumaflip > 0:
            apply = self._gate(keys[15], p, self.lumaflip, n)
            sign = jnp.where(apply, 1.0, 0.0)
            house = jnp.eye(4)[None] - 2 * jnp.outer(v_axis, v_axis)[None] * sign[:, None, None]
            m = house @ m
        if self.hue > 0:
            k_hue = jax.random.fold_in(keys[15], 1)
            apply = self._gate(k_hue, p, self.hue, n)
            theta = (
                jax.random.uniform(jax.random.fold_in(k_hue, 2), (n,), minval=-1, maxval=1)
                * math.pi
                * self.hue_max
            )
            theta = jnp.where(apply, theta, 0.0)
            m = _rot3d_about(v_axis[:3], theta) @ m
        if self.saturation > 0:
            k_sat = jax.random.fold_in(keys[15], 3)
            apply = self._gate(k_sat, p, self.saturation, n)
            s = jnp.exp2(jax.random.normal(jax.random.fold_in(k_sat, 4), (n,)) * self.saturation_std)
            s = jnp.where(apply, s, 1.0)
            vv = jnp.outer(v_axis, v_axis)[None]
            m = (vv + (jnp.eye(4)[None] - vv) * s[:, None, None]) @ m

        flat = images.reshape(n, c, h * w)
        ones_row = jnp.ones((n, 1, h * w))
        rgb1 = jnp.concatenate([flat, ones_row], axis=1)  # (N, 4, HW)
        out = jnp.einsum("nij,njp->nip", m, rgb1)[:, :3]
        images = out.reshape(n, c, h, w)

        # ---- image-space filtering (augment.py:382-411) ------------------
        if self.imgfilter > 0:
            kf = jax.random.fold_in(rng, 77)
            num_bands = _HZ_FBANK.shape[0]
            assert len(self.imgfilter_bands) == num_bands
            expected = jnp.asarray(_EXPECTED_POWER)
            gain = jnp.ones((n, num_bands))
            for i, band_strength in enumerate(self.imgfilter_bands):
                ki = jax.random.fold_in(kf, i)
                t_i = jnp.exp2(
                    jax.random.normal(jax.random.fold_in(ki, 1), (n,))
                    * self.imgfilter_std
                )
                apply = (
                    jax.random.uniform(ki, (n,))
                    < self.imgfilter * p * band_strength
                )
                t_i = jnp.where(apply, t_i, 1.0)
                t = jnp.ones((n, num_bands)).at[:, i].set(t_i)
                t = t / jnp.sqrt(
                    jnp.sum(expected * jnp.square(t), axis=-1, keepdims=True)
                )
                gain = gain * t

            hz = gain @ jnp.asarray(_HZ_FBANK)  # (N, taps)
            images = filter_images(images, hz)

        # ---- additive RGB noise (augment.py:417-421) ----------------------
        if self.noise > 0:
            kn = jax.random.fold_in(rng, 88)
            sigma = jnp.abs(jax.random.normal(kn, (n, 1, 1, 1))) * self.noise_std
            apply = (
                jax.random.uniform(jax.random.fold_in(kn, 1), (n, 1, 1, 1))
                < self.noise * p
            )
            sigma = jnp.where(apply, sigma, 0.0)
            images = images + (
                jax.random.normal(jax.random.fold_in(kn, 2), images.shape)
                * sigma
            )

        # ---- cutout -----------------------------------------------------
        if self.cutout > 0:
            kc = jax.random.fold_in(rng, 99)
            apply = self._gate(kc, p, self.cutout, n)
            center = jax.random.uniform(jax.random.fold_in(kc, 1), (n, 2))
            size = self.cutout_size
            yy = jnp.linspace(0, 1, h)[None, :, None]
            xx = jnp.linspace(0, 1, w)[None, None, :]
            mask_y = jnp.abs(yy - center[:, 0][:, None, None]) >= size / 2
            mask_x = jnp.abs(xx - center[:, 1][:, None, None]) >= size / 2
            mask = (mask_y | mask_x).astype(images.dtype)
            mask = jnp.where(apply[:, None, None], mask, 1.0)
            images = images * mask[:, None]

        return images


def filter_images(images, hz):
    """Separable per-sample FIR filtering with reflect padding
    (augment.py:399-411 conv2d groups analog): one grouped conv per
    axis over a (1, N*C, H, W) layout.

    images: (N, C, H, W); hz: (N, taps) per-sample filter.
    Note torch's F.conv2d cross-correlates, so the reference applies
    hz reversed relative to a mathematical convolution; we match it by
    flipping the taps in our conv_general_dilated call (which also
    cross-correlates) — i.e. use the taps as-is.
    """
    n, c, h, w = images.shape
    taps = hz.shape[-1]
    pad = taps // 2
    x = images.reshape(1, n * c, h, w)
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
    hz_rows = jnp.tile(hz[:, None], (1, c, 1)).reshape(n * c, 1, 1, taps)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, hz_rows.shape, ("NCHW", "OIHW", "NCHW")
    )
    x = jax.lax.conv_general_dilated(
        x, hz_rows, (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=n * c,
    )
    hz_cols = hz_rows.reshape(n * c, 1, taps, 1)
    x = jax.lax.conv_general_dilated(
        x, hz_cols, (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=n * c,
    )
    return x.reshape(n, c, h, w)


def _rot3d_about(axis, theta):
    """Rodrigues rotation about `axis` embedded in a 4x4 color matrix."""
    x, y, z = axis
    zero = jnp.zeros_like(theta)
    k = jnp.stack(
        [
            jnp.stack([zero, -z + zero, y + zero], -1),
            jnp.stack([z + zero, zero, -x + zero], -1),
            jnp.stack([-y + zero, x + zero, zero], -1),
        ],
        -2,
    )
    eye = jnp.eye(3)[None]
    r = (
        eye
        + jnp.sin(theta)[:, None, None] * k
        + (1 - jnp.cos(theta))[:, None, None] * (k @ k)
    )
    out = jnp.tile(jnp.eye(4)[None], (theta.shape[0], 1, 1))
    return out.at[:, :3, :3].set(r)
