"""Parity tests: spi_tpu StyleGAN3 (alias-free) nets vs the reference
torch implementation (eg3d/training/networks_stylegan3.py), which on
CPU runs through its pure-torch ref ops (SURVEY.md §3.5)."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
pytest.importorskip("scipy")

sys.path.insert(0, "/root/reference/eg3d")

from spi_tpu.utils.checkpoint import unflatten_to_nested


def torch_sd_to_pytree(module):
    flat = {
        k: v.detach().numpy().astype(np.float32)
        for k, v in module.state_dict().items()
    }
    return unflatten_to_nested(flat)


class TestSG3Filters:
    def test_separable_filter_matches(self):
        from training.networks_stylegan3 import SynthesisLayer as RefLayer

        from spi_tpu.models.stylegan3 import design_lowpass_filter

        ref = RefLayer.design_lowpass_filter(12, cutoff=2.0, width=6.0, fs=32)
        mine = design_lowpass_filter(12, cutoff=2.0, width=6.0, fs=32)
        np.testing.assert_allclose(mine, ref.numpy(), rtol=1e-6, atol=1e-7)

    def test_radial_filter_matches(self):
        from training.networks_stylegan3 import SynthesisLayer as RefLayer

        from spi_tpu.models.stylegan3 import design_lowpass_filter

        ref = RefLayer.design_lowpass_filter(12, cutoff=8.0, width=4.0, fs=64,
                                             radial=True)
        mine = design_lowpass_filter(12, cutoff=8.0, width=4.0, fs=64, radial=True)
        np.testing.assert_allclose(mine, ref.numpy(), rtol=1e-5, atol=1e-6)

    def test_identity_filter_is_none(self):
        from spi_tpu.models.stylegan3 import design_lowpass_filter

        assert design_lowpass_filter(1, cutoff=2.0, width=6.0, fs=32) is None


class TestSG3Input:
    def test_synthesis_input_parity(self):
        from training.networks_stylegan3 import SynthesisInput as RefInput

        from spi_tpu.models.stylegan3 import SynthesisInput

        torch.manual_seed(0)
        ref = RefInput(w_dim=16, channels=8, size=24, sampling_rate=16,
                       bandwidth=2)
        mine = SynthesisInput(w_dim=16, channels=8, size=24, sampling_rate=16,
                              bandwidth=2)
        params = torch_sd_to_pytree(ref)
        w = np.random.default_rng(0).normal(size=(2, 16)).astype(np.float32)
        out_ref = ref(torch.from_numpy(w)).detach().numpy()
        out = np.asarray(mine(params, jnp.asarray(w)))
        np.testing.assert_allclose(out, out_ref, rtol=2e-4, atol=2e-4)


class TestSG3Layer:
    def _pair(self, **kw):
        from training.networks_stylegan3 import SynthesisLayer as RefLayer

        from spi_tpu.models.stylegan3 import SG3SynthesisLayer

        defaults = dict(
            w_dim=16, is_torgb=False, is_critically_sampled=False,
            in_channels=6, out_channels=5, in_size=16, out_size=16,
            in_sampling_rate=16, out_sampling_rate=16,
            in_cutoff=4.0, out_cutoff=4.0,
            in_half_width=2.0, out_half_width=2.0,
        )
        defaults.update(kw)
        torch.manual_seed(1)
        ref = RefLayer(use_fp16=False, **defaults)
        mine = SG3SynthesisLayer(**defaults)
        return ref, mine

    def _check(self, ref, mine, n=2):
        params = torch_sd_to_pytree(ref)
        rng = np.random.default_rng(2)
        x = rng.normal(size=(n, mine.in_channels, mine.in_size, mine.in_size))
        x = x.astype(np.float32)
        w = rng.normal(size=(n, 16)).astype(np.float32)
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(w)).detach().numpy()
        out = np.asarray(mine(params, jnp.asarray(x), jnp.asarray(w)))
        assert out.shape == out_ref.shape
        np.testing.assert_allclose(out, out_ref, rtol=1e-3, atol=1e-3)

    def test_same_rate_layer(self):
        ref, mine = self._pair()
        self._check(ref, mine)

    def test_upsampling_layer(self):
        ref, mine = self._pair(out_size=32, out_sampling_rate=32, out_cutoff=8.0)
        self._check(ref, mine)

    def test_torgb_layer(self):
        ref, mine = self._pair(is_torgb=True, out_channels=3)
        self._check(ref, mine)


class TestSG3Network:
    CFG = dict(w_dim=16, img_resolution=32, img_channels=4,
               channel_base=2048, channel_max=32)
    NET_KW = dict(num_layers=6, num_critical=2)

    def test_layer_names_match_reference(self):
        from training.networks_stylegan3 import SynthesisNetwork as RefNet

        from spi_tpu.models.stylegan3 import SG3SynthesisNetwork

        torch.manual_seed(0)
        ref = RefNet(**self.CFG, **self.NET_KW)
        mine = SG3SynthesisNetwork(**self.CFG, **self.NET_KW)
        assert [mine.layer_name(i) for i in range(mine.num_layers + 1)] == (
            ref.layer_names
        )
        assert mine.num_ws == ref.num_ws

    def test_synthesis_network_parity(self):
        from training.networks_stylegan3 import SynthesisNetwork as RefNet

        from spi_tpu.models.stylegan3 import SG3SynthesisNetwork

        torch.manual_seed(0)
        ref = RefNet(**self.CFG, **self.NET_KW)
        mine = SG3SynthesisNetwork(**self.CFG, **self.NET_KW)
        params = torch_sd_to_pytree(ref)
        rng = np.random.default_rng(3)
        ws = rng.normal(size=(1, mine.num_ws, 16)).astype(np.float32)
        out_ref = ref(torch.from_numpy(ws)).detach().numpy()
        out = np.asarray(mine(params, jnp.asarray(ws)))
        assert out.shape == out_ref.shape
        np.testing.assert_allclose(out, out_ref, rtol=2e-3, atol=2e-3)

    def test_generator_runs(self):
        import jax

        from spi_tpu.models.stylegan3 import SG3Generator

        gen = SG3Generator(z_dim=16, c_dim=0, w_dim=16, img_resolution=32,
                           img_channels=4, channel_base=2048, channel_max=32)
        params = gen.init(jax.random.PRNGKey(0))
        z = jnp.zeros((1, 16), jnp.float32)
        img = gen(params, z, None)
        assert img.shape == (1, 4, 32, 32)
