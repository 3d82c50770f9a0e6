"""Cross-implementation parity: spi_tpu vs the reference torch code.

The reference's CUDA ops fall back to their pure-torch `_ref` twins on
CPU (SURVEY.md §3.5), so the ORIGINAL eg3d modules run here as golden
oracles: build them with random weights, copy the state_dict into the
spi_tpu pytree (names match by construction), and compare outputs.

Random sampling jitter is neutralized on both sides (torch.rand and
jax.random.uniform pinned to 0.5) for the full-synthesis test.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference/eg3d")

from spi_tpu.utils.checkpoint import unflatten_to_nested


RTOL = 2e-4
ATOL = 2e-4


def torch_sd_to_pytree(module, like=None):
    flat = {
        k: v.detach().numpy().astype(np.float32)
        for k, v in module.state_dict().items()
        if not k.endswith(("resample_filter", "num_batches_tracked"))
    }
    return unflatten_to_nested(flat)


class TestLayerParity:
    def test_fully_connected(self):
        from training.networks_stylegan2 import FullyConnectedLayer

        from spi_tpu.models.stylegan2 import FullyConnected

        ref = FullyConnectedLayer(8, 4, activation="lrelu", lr_multiplier=0.01,
                                  bias_init=1.0)
        mine = FullyConnected(8, 4, activation="lrelu", lr_multiplier=0.01,
                              bias_init=1.0)
        params = torch_sd_to_pytree(ref)
        x = np.random.default_rng(0).normal(size=(3, 8)).astype(np.float32)
        out_ref = ref(torch.from_numpy(x)).detach().numpy()
        out = np.asarray(mine(params, jnp.asarray(x)))
        np.testing.assert_allclose(out, out_ref, rtol=RTOL, atol=ATOL)

    def test_synthesis_layer_const_noise(self):
        from training.networks_stylegan2 import SynthesisLayer as RefLayer

        from spi_tpu.models.stylegan2 import SynthesisLayer

        ref = RefLayer(6, 5, w_dim=8, resolution=16, up=1, activation="lrelu")
        mine = SynthesisLayer(in_channels=6, out_channels=5, w_dim=8,
                              resolution=16, up=1, activation="lrelu")
        params = torch_sd_to_pytree(ref)
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 6, 16, 16)).astype(np.float32)
        w = rng.normal(size=(2, 8)).astype(np.float32)
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(w),
                      noise_mode="const").detach().numpy()
        out = np.asarray(mine(params, jnp.asarray(x), jnp.asarray(w),
                              noise_mode="const"))
        np.testing.assert_allclose(out, out_ref, rtol=1e-3, atol=1e-3)

    def test_synthesis_layer_upsample(self):
        from training.networks_stylegan2 import SynthesisLayer as RefLayer

        from spi_tpu.models.stylegan2 import SynthesisLayer

        ref = RefLayer(6, 5, w_dim=8, resolution=32, up=2, activation="lrelu")
        mine = SynthesisLayer(in_channels=6, out_channels=5, w_dim=8,
                              resolution=32, up=2, activation="lrelu")
        params = torch_sd_to_pytree(ref)
        rng = np.random.default_rng(2)
        x = rng.normal(size=(1, 6, 16, 16)).astype(np.float32)
        w = rng.normal(size=(1, 8)).astype(np.float32)
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(w),
                      noise_mode="const").detach().numpy()
        out = np.asarray(mine(params, jnp.asarray(x), jnp.asarray(w),
                              noise_mode="const"))
        np.testing.assert_allclose(out, out_ref, rtol=1e-3, atol=1e-3)

    def test_mapping_with_truncation(self):
        from training.networks_stylegan2 import MappingNetwork as RefMapping

        from spi_tpu.models.stylegan2 import MappingNetwork

        ref = RefMapping(z_dim=16, c_dim=25, w_dim=16, num_ws=6)
        mine = MappingNetwork(z_dim=16, c_dim=25, w_dim=16, num_ws=6)
        params = torch_sd_to_pytree(ref)
        rng = np.random.default_rng(3)
        z = rng.normal(size=(2, 16)).astype(np.float32)
        c = rng.normal(size=(2, 25)).astype(np.float32)
        out_ref = ref(torch.from_numpy(z), torch.from_numpy(c),
                      truncation_psi=0.7).detach().numpy()
        out = np.asarray(mine(params, jnp.asarray(z), jnp.asarray(c),
                              truncation_psi=0.7))
        np.testing.assert_allclose(out, out_ref, rtol=1e-3, atol=1e-3)

    def test_osg_decoder(self):
        from training.triplane import OSGDecoder as RefDecoder

        from spi_tpu.models.triplane import OSGDecoder

        ref = RefDecoder(32, {"decoder_lr_mul": 1, "decoder_output_dim": 32})
        mine = OSGDecoder(n_features=32)
        params = torch_sd_to_pytree(ref)
        rng = np.random.default_rng(4)
        feats = rng.normal(size=(1, 3, 50, 32)).astype(np.float32)
        out_ref = ref(torch.from_numpy(feats), None)
        rgb_ref = out_ref["rgb"].detach().numpy()
        sigma_ref = out_ref["sigma"].detach().numpy()
        rgb, sigma = mine(params, jnp.asarray(feats).mean(axis=1), None)
        np.testing.assert_allclose(np.asarray(rgb), rgb_ref, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sigma), sigma_ref, rtol=1e-3, atol=1e-4)

    def test_ray_sampler(self):
        from training.volumetric_rendering.ray_sampler import RaySampler

        from spi_tpu.models.rendering.ray_sampler import sample_rays

        from spi_tpu.preprocess import camera_math as cm

        camdat = cm.cal_camera(np.array([0.05, 0.2, 0.0]), np.array([0.0, 0.05, 0.1]))
        label = cm.process_camera(camdat["pose"], camdat["intrinsics"])
        c2w = torch.from_numpy(label[:16].reshape(1, 4, 4).astype(np.float32))
        intr = torch.from_numpy(label[16:].reshape(1, 3, 3).astype(np.float32))
        ref_o, ref_d = RaySampler()(c2w, intr, 16)
        o, d = sample_rays(jnp.asarray(c2w.numpy()), jnp.asarray(intr.numpy()), 16)
        np.testing.assert_allclose(np.asarray(o), ref_o.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(d), ref_d.numpy(), rtol=1e-4, atol=1e-5)

    def test_grid_sample_vs_torch(self):
        import torch.nn.functional as F

        from spi_tpu.ops.grid_sample import grid_sample

        rng = np.random.default_rng(5)
        x = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
        g = rng.uniform(-1.2, 1.2, size=(2, 5, 7, 2)).astype(np.float32)
        ref = F.grid_sample(torch.from_numpy(x), torch.from_numpy(g),
                            mode="bilinear", padding_mode="zeros",
                            align_corners=False).numpy()
        out = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(g)))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


class TestFullSynthesisParity:
    @pytest.fixture()
    def pinned_random(self, monkeypatch):
        """Pin stratified/importance jitter to 0.5 on both frameworks.

        The reference uses torch.rand_like for stratified jitter
        (renderer.py:180) and torch.rand for the inverse-CDF u draws
        (:237); spi_tpu uses jax.random.uniform for both."""

        def fake_rand_like(x, **kw):
            return torch.full_like(x, 0.5)

        def fake_rand(*shape, **kw):
            kw.pop("device", None)
            if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
                shape = tuple(shape[0])
            return torch.full(shape, 0.5, **kw)

        monkeypatch.setattr(torch, "rand_like", fake_rand_like)
        monkeypatch.setattr(torch, "rand", fake_rand)

        def fake_uniform(key, shape=(), dtype=jnp.float32, minval=0.0, maxval=1.0):
            return jnp.full(shape, 0.5, dtype) * (maxval - minval) + minval

        monkeypatch.setattr(jax.random, "uniform", fake_uniform)
        yield

    def test_triplane_synthesis_matches(self, pinned_random):
        from training.triplane import TriPlaneGenerator as RefG

        from spi_tpu.models.rendering.renderer import RenderingOptions
        from spi_tpu.models.triplane import TriPlaneGenerator

        rendering_kwargs = {
            "superresolution_module":
                "training.superresolution.SuperresolutionHybrid2X",
            "sr_antialias": True,
            "c_gen_conditioning_zero": False,
            "c_scale": 1.0,
            "ray_start": 2.25,
            "ray_end": 3.3,
            "box_warp": 1.0,
            "depth_resolution": 8,
            "depth_resolution_importance": 8,
            "disparity_space_sampling": False,
            "clamp_mode": "softplus",
            "white_back": False,
            "density_noise": 0.0,
            "superresolution_noise_mode": "none",
        }
        torch.manual_seed(0)
        # the reference SR blocks hardcode w_dim=512
        ref = RefG(z_dim=16, c_dim=25, w_dim=512, img_resolution=128,
                   img_channels=3, rendering_kwargs=rendering_kwargs,
                   channel_base=4096, channel_max=64)
        ref.neural_rendering_resolution = 32
        ref.eval()

        mine = TriPlaneGenerator(
            z_dim=16, c_dim=25, w_dim=512, img_resolution=128,
            backbone_resolution=256, neural_rendering_resolution=32,
            rendering=RenderingOptions(
                depth_resolution=8, depth_resolution_importance=8,
                ray_start=2.25, ray_end=3.3,
            ),
            sr_variant="SuperresolutionHybrid2X",
            channel_base=4096, channel_max=64,
        )
        params = torch_sd_to_pytree(ref)

        from spi_tpu.preprocess import camera_math as cm

        camdat = cm.cal_camera(np.array([0.0, 0.15, 0.0]), np.zeros(3))
        label = cm.process_camera(camdat["pose"], camdat["intrinsics"])
        c = label[None].astype(np.float32)

        rng = np.random.default_rng(7)
        ws = rng.normal(size=(1, mine.num_ws, 512)).astype(np.float32) * 0.3

        with torch.no_grad():
            out_ref = ref.synthesis(
                torch.from_numpy(ws), torch.from_numpy(c), noise_mode="const"
            )
        out = mine.synthesis(params, jax.random.PRNGKey(0), jnp.asarray(ws),
                             jnp.asarray(c), noise_mode="const")

        for k in ("image_raw", "image_depth", "image"):
            a = np.asarray(out[k])
            b = out_ref[k].numpy()
            rms = float(np.sqrt(np.mean((a - b) ** 2)))
            assert a.shape == b.shape, (k, a.shape, b.shape)
            assert rms < 5e-3, f"{k}: rms {rms}"

    @pytest.mark.slow
    def test_triplane_synthesis_matches_full_config(self, pinned_random):
        """The SHIPPED configuration end-to-end: 512^2 output, 128^2
        neural render, 48+48 depth samples, SuperresolutionHybrid8XDC
        (eg3d/training/triplane.py:40-44 + superresolution.py:264-290 +
        load_utils.py:31). Catches resolution-dependent wiring bugs
        (ray chunking, SR block stack, fp accumulation) the scaled-down
        test cannot."""
        from training.triplane import TriPlaneGenerator as RefG

        from spi_tpu.models.rendering.renderer import RenderingOptions
        from spi_tpu.models.triplane import TriPlaneGenerator

        rendering_kwargs = {
            "superresolution_module":
                "training.superresolution.SuperresolutionHybrid8XDC",
            "sr_antialias": True,
            "c_gen_conditioning_zero": False,
            "c_scale": 1.0,
            "ray_start": 2.25,
            "ray_end": 3.3,
            "box_warp": 1.0,
            "depth_resolution": 48,
            "depth_resolution_importance": 48,
            "disparity_space_sampling": False,
            "clamp_mode": "softplus",
            "white_back": False,
            "density_noise": 0.0,
            "superresolution_noise_mode": "none",
        }
        torch.manual_seed(0)
        ref = RefG(z_dim=512, c_dim=25, w_dim=512, img_resolution=512,
                   img_channels=3, rendering_kwargs=rendering_kwargs)
        ref.neural_rendering_resolution = 128
        ref.eval()

        mine = TriPlaneGenerator(
            z_dim=512, c_dim=25, w_dim=512, img_resolution=512,
            neural_rendering_resolution=128,
            rendering=RenderingOptions(
                depth_resolution=48, depth_resolution_importance=48,
                ray_start=2.25, ray_end=3.3,
            ),
            sr_variant="SuperresolutionHybrid8XDC",
        )
        params = torch_sd_to_pytree(ref)

        from spi_tpu.preprocess import camera_math as cm

        camdat = cm.cal_camera(np.array([0.0, 0.15, 0.0]), np.zeros(3))
        label = cm.process_camera(camdat["pose"], camdat["intrinsics"])
        c = label[None].astype(np.float32)

        rng = np.random.default_rng(11)
        ws = rng.normal(size=(1, mine.num_ws, 512)).astype(np.float32) * 0.3

        with torch.no_grad():
            out_ref = ref.synthesis(
                torch.from_numpy(ws), torch.from_numpy(c), noise_mode="const"
            )
        out = mine.synthesis(params, jax.random.PRNGKey(0), jnp.asarray(ws),
                             jnp.asarray(c), noise_mode="const")

        for k in ("image_raw", "image_depth", "image"):
            a = np.asarray(out[k])
            b = out_ref[k].numpy()
            rms = float(np.sqrt(np.mean((a - b) ** 2)))
            assert a.shape == b.shape, (k, a.shape, b.shape)
            assert rms < 1e-2, f"{k}: rms {rms}"
