"""Golden parity for the perception nets against the reference's own
torch implementations on CPU, with random weights transferred through
the convert name-mapping (state_dict -> unflatten_to_nested -> spi_tpu
pytree). Proves both the numerics AND the weight-conversion paths for
BiSeNet, Deep3DFaceRecon ResNet-50, and the LPIPS-VGG16 stack.

The reference modules import torchvision/kornia at module level but the
tested forward paths never call into them (bisenet.py:8 is vestigial;
networks.py:19 uses kornia only in RecogNetWrapper's resize_n_crop), so
minimal stub modules are installed. The torchvision.models.vgg16 stub
rebuilds the standard cfg-D `features` Sequential in plain torch —
identical architecture, random weights (no downloads in CI).
"""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

from spi_tpu.utils.checkpoint import unflatten_to_nested  # noqa: E402


def _install_stubs():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        models = types.ModuleType("torchvision.models")

        def _vgg16(pretrained=False, **kw):
            cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                   512, 512, 512, "M", 512, 512, 512, "M"]
            layers, cin = [], 3
            for v in cfg:
                if v == "M":
                    layers.append(nn.MaxPool2d(2, 2))
                else:
                    layers.append(nn.Conv2d(cin, v, 3, padding=1))
                    layers.append(nn.ReLU())
                    cin = v
            return types.SimpleNamespace(features=nn.Sequential(*layers))

        models.vgg16 = _vgg16
        tv.models = models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = models
    if "kornia" not in sys.modules:
        k = types.ModuleType("kornia")
        geo = types.ModuleType("kornia.geometry")

        def _unavailable(*a, **kw):
            raise RuntimeError("kornia stub: not available in CI")

        geo.warp_affine = _unavailable
        k.geometry = geo
        sys.modules["kornia"] = k
        sys.modules["kornia.geometry"] = geo


_install_stubs()
sys.path.insert(0, "/root/reference")


def _to_flat(module: nn.Module) -> dict:
    return {
        k: v.detach().numpy().astype(np.float32)
        for k, v in module.state_dict().items()
        if not k.endswith("num_batches_tracked")
    }


class TestBiSeNetParity:
    def test_matches_reference(self, monkeypatch):
        from third_part.bisenet import resnet as ref_resnet
        from third_part.bisenet.bisenet import BiSeNet as RefBiSeNet

        from spi_tpu.models.perception.bisenet import BiSeNet

        # Resnet18.init_weight downloads imagenet weights (resnet.py:83);
        # random init is fine for parity — zero egress in CI.
        monkeypatch.setattr(ref_resnet.Resnet18, "init_weight", lambda self: None)
        torch.manual_seed(0)
        ref = RefBiSeNet(19)
        ref.eval()
        params = unflatten_to_nested(_to_flat(ref))

        rng = np.random.default_rng(2)
        x = rng.normal(0, 1, (2, 3, 128, 128)).astype(np.float32)
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(x))[0].numpy()
        out = np.asarray(BiSeNet()(params, jnp.asarray(x)))
        assert out.shape == out_ref.shape
        np.testing.assert_allclose(out, out_ref, rtol=2e-2, atol=2e-3)


class TestFaceReconParity:
    def test_matches_reference(self):
        from third_part.Deep3DFaceRecon_pytorch.models import networks

        from spi_tpu.models.perception.face_recon import FaceReconNet

        torch.manual_seed(0)
        ref = networks.define_net_recon("resnet50")
        # heads are zero-initialized (networks.py:94-96) -> randomize so
        # the comparison actually exercises the head mapping
        for m in ref.final_layers:
            nn.init.normal_(m.weight, std=0.02)
            nn.init.normal_(m.bias, std=0.1)
        ref.eval()
        params = unflatten_to_nested(_to_flat(ref))

        rng = np.random.default_rng(3)
        x = rng.uniform(0, 1, (2, 3, 224, 224)).astype(np.float32)
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(x)).numpy()
        out = np.asarray(FaceReconNet()(params, jnp.asarray(x)))
        assert out.shape == out_ref.shape
        np.testing.assert_allclose(out, out_ref, rtol=2e-2, atol=2e-3)


class TestLPIPSParity:
    @pytest.fixture()
    def pair(self, monkeypatch):
        """Reference LPIPS(vgg) on CPU with random lin heads + my LPIPS
        loaded from its state_dict."""
        monkeypatch.setattr(nn.Module, "to", lambda self, *a, **k: self)

        from spi.criteria.lpips import lpips as ref_lpips_mod
        from spi.criteria.lpips.networks import LinLayers

        def _fake_state_dict(net_type="vgg", version="0.1"):
            torch.manual_seed(1)
            lin = LinLayers([64, 128, 256, 512, 512])
            sd = lin.state_dict()
            return {
                k: torch.rand_like(v) * 0.1 for k, v in sd.items()
            }

        monkeypatch.setattr(ref_lpips_mod, "get_state_dict", _fake_state_dict)
        torch.manual_seed(0)
        ref = ref_lpips_mod.LPIPS(net_type="vgg")
        ref.eval()

        from spi_tpu.criteria.lpips import LPIPS

        flat = _to_flat(ref)
        net = {
            k.replace("net.layers.", "features."): v
            for k, v in flat.items()
            if k.startswith("net.layers.")
        }
        lin = [
            flat[f"lin.{i}.1.weight"].reshape(-1)
            for i in range(5)
        ]
        mine = LPIPS()
        return ref, mine, {"net": net, "lin": [jnp.asarray(v) for v in lin]}

    def test_small_images(self, pair):
        ref, mine, params = pair
        rng = np.random.default_rng(4)
        x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
        y = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            d_ref = float(ref(torch.from_numpy(x), torch.from_numpy(y)))
        d = float(mine(params, jnp.asarray(x), jnp.asarray(y)))
        np.testing.assert_allclose(d, d_ref, rtol=1e-3)

    def test_sg_oracle_feature_distance(self, pair):
        """vgg_feature_distance == the NVIDIA torchscript's
        `return_lpips=True` squared embedding distance, which for one
        256^2 image equals the richzhang LPIPS value (w_projector.py:
        48-51,80-87 feeds area-pooled 256^2 images; the embedding is
        sqrt(lin)/sqrt(HW)-scaled unit-normalized activations)."""
        from spi_tpu.training.projectors import vgg_feature_distance

        ref, mine, params = pair
        rng = np.random.default_rng(6)
        x = rng.uniform(-1, 1, (1, 3, 256, 256)).astype(np.float32)
        y = rng.uniform(-1, 1, (1, 3, 256, 256)).astype(np.float32)
        with torch.no_grad():
            d_ref = float(ref(torch.from_numpy(x), torch.from_numpy(y)))
        d = float(vgg_feature_distance(mine, params, jnp.asarray(x), jnp.asarray(y)))
        np.testing.assert_allclose(d, d_ref, rtol=1e-3)

    def test_nvidia_vgg16_name_mapping(self):
        """convert.map_nvidia_vgg16_names round-trips a state_dict in the
        torchscript vgg16.pt layout into the LPIPS pytree naming."""
        from spi_tpu.convert import _LPIPS_CHANNELS, _NV_VGG16_INDEX, map_nvidia_vgg16_names

        rng = np.random.default_rng(7)
        flat = {}
        cin = 3
        for conv, _ in sorted(_NV_VGG16_INDEX.items(), key=lambda kv: kv[1]):
            cout = {"1": 64, "2": 128, "3": 256, "4": 512, "5": 512}[conv[4]]
            flat[f"layers.{conv}.weight"] = rng.normal(size=(cout, cin, 3, 3))
            flat[f"layers.{conv}.bias"] = rng.normal(size=(cout,))
            cin = cout
        for i, c in enumerate(_LPIPS_CHANNELS):
            flat[f"lpips.lin{i}.model.1.weight"] = rng.normal(size=(1, c, 1, 1))
        out = map_nvidia_vgg16_names(flat)
        for idx in _NV_VGG16_INDEX.values():
            assert out[f"features.{idx}.weight"].ndim == 4
            assert out[f"features.{idx}.bias"].ndim == 1
        for i, c in enumerate(_LPIPS_CHANNELS):
            assert out[f"lin.{i}"].shape == (c,)

    def test_resize_path_512(self, pair):
        """>256 inputs hit the bilinear downscale (lpips.py:37-39)."""
        ref, mine, params = pair
        rng = np.random.default_rng(5)
        x = rng.uniform(-1, 1, (1, 3, 512, 512)).astype(np.float32)
        y = rng.uniform(-1, 1, (1, 3, 512, 512)).astype(np.float32)
        with torch.no_grad():
            d_ref = float(ref(torch.from_numpy(x), torch.from_numpy(y)))
        d = float(mine(params, jnp.asarray(x), jnp.asarray(y)))
        np.testing.assert_allclose(d, d_ref, rtol=1e-3)
