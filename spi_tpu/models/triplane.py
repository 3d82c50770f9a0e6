"""TriPlaneGenerator: EG3D generator facade.

Spec: eg3d/training/triplane.py. Pipeline (triplane.py:53-89):
camera 25-vec -> rays -> StyleGAN2 backbone -> 3x32-channel planes ->
importance-rendered 32-ch feature image + depth at the neural
resolution -> superresolution to the output resolution.

TPU redesign: one pure function per entry point; the PRNG key is
explicit (stratified/importance sampling jitter); planes are converted
to channels-last once per synthesis for gather-friendly triplane
lookup. `params` carries backbone, decoder and SR weights in
torch-state_dict-shaped nesting.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from spi_tpu.models.rendering import ImportanceRenderer, RenderingOptions, sample_rays
from spi_tpu.models.stylegan2 import (
    FullyConnected,
    Generator,
    MappingNetwork,
    Params,
    SynthesisNetwork,
)
from spi_tpu.models.superresolution import Superresolution


@dataclasses.dataclass(frozen=True)
class OSGDecoder:
    """2-layer softplus MLP 32 -> 64 -> 1+32 with MipNeRF sigmoid clamp
    (triplane.py:112-135)."""

    n_features: int = 32
    hidden_dim: int = 64
    output_dim: int = 32
    lr_multiplier: float = 1.0

    @property
    def fc0(self) -> FullyConnected:
        return FullyConnected(self.n_features, self.hidden_dim, lr_multiplier=self.lr_multiplier)

    @property
    def fc1(self) -> FullyConnected:
        return FullyConnected(
            self.hidden_dim, 1 + self.output_dim, lr_multiplier=self.lr_multiplier
        )

    def init(self, key) -> Params:
        k0, k1 = jax.random.split(key)
        # torch names: decoder.net.0 / decoder.net.2 (Sequential indices)
        return {"net": {"0": self.fc0.init(k0), "2": self.fc1.init(k1)}}

    def __call__(self, params: Params, sampled_features, ray_directions):
        """features: (N, M, C) already plane-aggregated; -> (rgb, sigma)."""
        del ray_directions  # OSGDecoder ignores view direction
        n, m, c = sampled_features.shape
        x = sampled_features.reshape(n * m, c)
        x = self.fc0(params["net"]["0"], x)
        x = jax.nn.softplus(x)
        x = self.fc1(params["net"]["2"], x)
        x = x.reshape(n, m, -1)
        rgb = jax.nn.sigmoid(x[..., 1:]) * (1 + 2 * 0.001) - 0.001
        sigma = x[..., 0:1]
        return rgb, sigma


@dataclasses.dataclass(frozen=True)
class TriPlaneGenerator:
    z_dim: int = 512
    c_dim: int = 25
    w_dim: int = 512
    img_resolution: int = 512
    img_channels: int = 3
    backbone_resolution: int = 256
    plane_channels: int = 32
    neural_rendering_resolution: int = 128
    rendering: RenderingOptions = RenderingOptions()
    sr_variant: str = "SuperresolutionHybrid8XDC"
    sr_antialias: bool = True
    sr_noise_mode: str = "none"  # rendering_kwargs['superresolution_noise_mode']
    # Width clamp for the SR blocks (Superresolution.channel_max). None
    # keeps reference widths; toy/test configs set a small value.
    sr_channel_max: int | None = None
    c_gen_conditioning_zero: bool = False
    c_scale: float = 1.0
    channel_base: int = 32768
    channel_max: int = 512
    # Rematerialize the volume-render core in the backward pass. The
    # renderer's per-sample tensors (rays x 96 samples x 32 features +
    # MLP hiddens + bilinear corner gathers) dominate activation memory
    # (~2 GB per differentiated synthesis at 128^2); storing them for a
    # multi-camera SPI step overflows a 16 GB v5e HBM. checkpointing
    # keeps only (planes, ray outputs) live and recomputes the render
    # inside the backward at ~1.3x step FLOPs.
    remat_renderer: bool = True
    # Same for the superresolution CNN: its 512^2 x 128-channel conv
    # activations are ~0.5 GB per image; checkpointing keeps only its
    # (raw render, ws) inputs alive across the multi-camera loss terms.
    remat_sr: bool = True
    # Compute dtype for the conv/gather/MLP-heavy subgraphs (backbone
    # synthesis, plane gather + decoder, superresolution): 'bfloat16'
    # doubles MXU throughput and halves HBM traffic on TPU. Parameters
    # stay fp32 (master weights); casts are inserted at call time, so
    # gradients come back fp32. Ray/camera math, the mapping network
    # and alpha compositing always run fp32 (the transmittance cumprod
    # and w statistics are precision-sensitive). Analog of the
    # reference's fp16-per-resolution blocks (networks_stylegan2.py:
    # 365-464), which inversion there disables; here bf16's range makes
    # it safe to keep on (validated by LPIPS parity tests vs fp32).
    compute_dtype: str = "float32"

    # -- submodules -------------------------------------------------------
    @property
    def backbone(self) -> Generator:
        return Generator(
            z_dim=self.z_dim,
            c_dim=self.c_dim,
            w_dim=self.w_dim,
            img_resolution=self.backbone_resolution,
            img_channels=self.plane_channels * 3,
            channel_base=self.channel_base,
            channel_max=self.channel_max,
        )

    @property
    def mapping_net(self) -> MappingNetwork:
        return self.backbone.mapping

    @property
    def synthesis_net(self) -> SynthesisNetwork:
        return self.backbone.synthesis

    @property
    def num_ws(self) -> int:
        return self.backbone.num_ws

    @property
    def decoder(self) -> OSGDecoder:
        return OSGDecoder(self.plane_channels, output_dim=self.plane_channels)

    @property
    def renderer(self) -> ImportanceRenderer:
        return ImportanceRenderer(self.rendering)

    @property
    def superresolution(self) -> Superresolution:
        return Superresolution(
            variant=self.sr_variant,
            img_resolution=self.img_resolution,
            channels=self.plane_channels,
            sr_antialias=self.sr_antialias,
            w_dim=self.w_dim,
            channel_max=self.sr_channel_max,
        )

    def init(self, key) -> Params:
        # One jitted program: eager init dispatches hundreds of ops.
        @jax.jit
        def _init(key):
            k0, k1, k2 = jax.random.split(key, 3)
            return {
                "backbone": self.backbone.init(k0),
                "decoder": self.decoder.init(k1),
                "superresolution": self.superresolution.init(k2),
            }

        return _init(key)

    # -- entry points (triplane.py:48-107) ---------------------------------
    def mapping(self, params: Params, z, c, truncation_psi=1.0, truncation_cutoff=None):
        if self.c_gen_conditioning_zero:
            c = jnp.zeros_like(c)
        return self.mapping_net(
            params["backbone"]["mapping"],
            z,
            c * self.c_scale,
            truncation_psi=truncation_psi,
            truncation_cutoff=truncation_cutoff,
        )

    def _cast(self, tree):
        dt = jnp.dtype(self.compute_dtype)
        if dt == jnp.float32:
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )

    def _planes_nhwc(self, params: Params, ws, noise_mode="const", rng=None):
        planes = self.synthesis_net(
            self._cast(params["backbone"]["synthesis"]),
            self._cast(ws),
            noise_mode=noise_mode,
            rng=rng,
        )  # (N, 96, H, W)
        n, c, h, w = planes.shape
        planes = planes.reshape(n, 3, self.plane_channels, h, w)
        return jnp.transpose(planes, (0, 1, 3, 4, 2)).reshape(
            n, 3, h * w, self.plane_channels
        )

    def synthesis(
        self,
        params: Params,
        rng,
        ws,
        c,
        neural_rendering_resolution: int | None = None,
        noise_mode: str = "const",
    ) -> dict[str, Any]:
        """ws: (N, num_ws, w_dim); c: (N, 25). Returns image / image_raw /
        image_depth (triplane.py:53-89)."""
        rng_rest, rng_noise = jax.random.split(rng)
        planes = self._planes_nhwc(
            params, ws, noise_mode=noise_mode,
            rng=rng_noise if noise_mode == "random" else None,
        )
        out = self.synthesis_from_planes(
            params, rng_rest, planes, ws, c,
            neural_rendering_resolution=neural_rendering_resolution,
        )
        return {
            "image": out["image"],
            "image_raw": out["image_raw"],
            "image_depth": out["image_depth"],
        }

    def synthesis_from_planes(
        self,
        params: Params,
        rng,
        planes,
        ws,
        c,
        neural_rendering_resolution: int | None = None,
        want_sr: bool = True,
    ) -> dict[str, Any]:
        """Render camera batch `c` from PRECOMPUTED planes.

        The backbone's plane synthesis depends only on ws, so multi-
        camera loss terms that share one latent (recon + rot + depth
        regularizers, SURVEY.md §2.7 'batched-view parallelism') can
        compute planes once and fan out renders. `planes`: (1|N, 3,
        HW, C); broadcast over the camera batch. `want_sr=False` skips
        the superresolution CNN for depth-only consumers
        (rot_bbox_cx_coach.py:133-141 uses image_depth alone).
        """
        res = neural_rendering_resolution or self.neural_rendering_resolution
        n = c.shape[0]
        cam2world = c[:, :16].reshape(-1, 4, 4)
        intrinsics = c[:, 16:25].reshape(-1, 3, 3)
        rng_render, rng_sr = jax.random.split(rng)
        ray_origins, ray_directions = sample_rays(cam2world, intrinsics, res)
        # planes with batch 1 stay UNbroadcast: the renderer merges the
        # camera batch into the point axis so the plane gather hits one
        # shared table (see sample_from_planes).

        dt = jnp.dtype(self.compute_dtype)

        def render(decoder_params, planes, ray_origins, ray_directions):
            def decode(feats, dirs):
                rgb, sigma = self.decoder(
                    self._cast(decoder_params), feats.astype(dt), dirs
                )
                return rgb.astype(jnp.float32), sigma.astype(jnp.float32)

            return self.renderer(
                rng_render, planes, decode, ray_origins, ray_directions,
                rays_w=res,
            )

        # Remat only pays off for MULTI-camera passes, where the live
        # per-sample tensors scale with the camera batch; a single-camera
        # render's VJP residuals (bilinear weights + row indices + MLP
        # hiddens, ~0.3 GB in bf16) fit comfortably, and skipping the
        # checkpoint avoids re-running the whole gather+decode+march
        # forward inside the backward of the most-executed programs
        # (stage-1 projection and the stage-2 recon term).
        if self.remat_renderer and n > 1:
            from spi_tpu.models.rendering.renderer import save_plane_feats_policy

            # Save the gathered plane features across the checkpoint
            # (remat everything else): the gathers are the latency-bound
            # part of the render, and a full remat re-runs them all in
            # the backward. See renderer._render_rays_inner.
            render = jax.checkpoint(render, policy=save_plane_feats_policy())
        feature_samples, depth_samples, _ = render(
            params["decoder"], planes, ray_origins, ray_directions
        )
        feature_image = jnp.transpose(feature_samples, (0, 2, 1)).reshape(
            n, feature_samples.shape[-1], res, res
        )
        depth_image = jnp.transpose(depth_samples, (0, 2, 1)).reshape(n, 1, res, res)
        rgb_image = feature_image[:, :3]
        out = {"image_raw": rgb_image, "image_depth": depth_image}
        if not want_sr:
            return out

        if ws.shape[0] != n:
            ws = jnp.broadcast_to(ws, (n,) + ws.shape[1:])

        @jax.named_scope("superresolution")
        def run_sr(sr_params, rgb, feat, ws):
            res_img = self.superresolution(
                self._cast(sr_params), self._cast(rgb), self._cast(feat),
                self._cast(ws),
                noise_mode=self.sr_noise_mode,
                rng=rng_sr if self.sr_noise_mode == "random" else None,
            )
            return res_img.astype(jnp.float32)

        if self.remat_sr and n > 1:  # same single-camera rationale as above
            run_sr = jax.checkpoint(run_sr)
        if n > 1 and self.sr_noise_mode != "random":
            # Per-camera map: the SR CNN's 512^2 x 128-ch activations at
            # batch n spill on v5e; sequential per-camera passes keep the
            # working set at batch-1 size (measured ~11% faster fwd+bwd
            # at batch 4 standalone). Skipped in 'random' noise mode
            # (GAN training), where per-camera mapping would reuse one
            # rng across the batch and correlate the SR noise.
            out["image"] = jax.lax.map(
                lambda args: run_sr(params["superresolution"], *[a[None] for a in args])[0],
                (rgb_image, feature_image, ws),
            )
        else:
            out["image"] = run_sr(params["superresolution"], rgb_image, feature_image, ws)
        return out

    def sample_mixed(self, params: Params, ws, coordinates, directions, noise_mode="const"):
        """Density probe at arbitrary points from ws (triplane.py:98-102);
        used by the TV loss and shape extraction."""
        planes = self._planes_nhwc(params, ws, noise_mode=noise_mode)

        def decode(feats, dirs):
            return self.decoder(params["decoder"], feats, dirs)

        return self.renderer.run_model(planes, decode, coordinates, directions)

    def forward(self, params: Params, rng, z, c, truncation_psi=1.0, noise_mode="const"):
        ws = self.mapping(params, z, c, truncation_psi=truncation_psi)
        return self.synthesis(params, rng, ws, c, noise_mode=noise_mode)


def ffhq512_128_config(**overrides) -> TriPlaneGenerator:
    """Architecture of the shipped ffhqrebalanced512-128.pkl checkpoint
    (spi/utils/load_utils.py:15-33 forces neural_rendering_resolution=128;
    rendering kwargs per the EG3D FFHQ config read at triplane.py:41-44)."""
    defaults = dict(
        z_dim=512,
        c_dim=25,
        w_dim=512,
        img_resolution=512,
        neural_rendering_resolution=128,
        rendering=RenderingOptions(
            depth_resolution=48,
            depth_resolution_importance=48,
            ray_start=2.25,
            ray_end=3.3,
            box_warp=1.0,
            white_back=False,
        ),
        sr_variant="SuperresolutionHybrid8XDC",
        sr_antialias=True,
        c_gen_conditioning_zero=False,
        c_scale=1.0,
    )
    defaults.update(overrides)
    return TriPlaneGenerator(**defaults)


def tiny_test_config(**overrides) -> TriPlaneGenerator:
    """Scaled-down generator (same architecture family) for smoke runs
    and CI: 128^2 output, 16^2 neural render, 4+4 depth samples. Used by
    `run_inversion --tiny` and the end-to-end CLI smoke test."""
    defaults = dict(
        z_dim=32,
        c_dim=25,
        w_dim=32,
        img_resolution=128,
        backbone_resolution=32,
        neural_rendering_resolution=16,
        rendering=RenderingOptions(depth_resolution=4, depth_resolution_importance=4),
        sr_variant="SuperresolutionHybrid2X",
        channel_base=1024,
        channel_max=64,
    )
    defaults.update(overrides)
    return TriPlaneGenerator(**defaults)
