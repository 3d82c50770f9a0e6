"""More cross-implementation parity oracles: the depth-warp ('rotate')
geometric core and the ArcFace IR-SE50 backbone, run against the
reference's own torch implementations on CPU.

(BiSeNet and Deep3DFaceRecon reference code need torchvision/kornia,
which this image lacks — those stay covered by structural tests.)
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/eg3d")

from spi_tpu.utils.checkpoint import unflatten_to_nested


@pytest.fixture()
def cpu_cuda(monkeypatch):
    """The reference's rotate() calls .cuda() unconditionally
    (spi/utils/rotate.py:102,108); identity it for the CPU oracle."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    yield


def _camera_label(yaw, pitch=0.0):
    from spi_tpu.preprocess import camera_math as cm

    camdat = cm.cal_camera(np.array([pitch, yaw, 0.0]), np.zeros(3))
    return cm.process_camera(camdat["pose"], camdat["intrinsics"]).astype(np.float32)


class TestRotateParity:
    def test_depth_warp_matches_reference(self, cpu_cuda):
        from spi.utils import rotate as ref_rotate

        from spi_tpu.utils import rotate as my_rotate

        n = 2
        res = 64
        d = 128  # reference hardcodes 128^2 depth maps
        rng = np.random.default_rng(0)
        src_image = rng.uniform(-1, 1, (n, 3, res, res)).astype(np.float32)
        # smooth plausible depths near the camera sphere radius 2.7
        base = 2.6 + 0.2 * rng.random((n, 1, d, d)).astype(np.float32)
        tgt_depth = base + 0.01
        src_depth = base
        src_cam = np.stack([_camera_label(0.0)] * n)
        tgt_cam = np.stack([_camera_label(0.25), _camera_label(-0.2)])
        src_mask = (rng.random((n, 1, res, res)) > 0.2).astype(np.float32)

        ref_img, ref_mask = ref_rotate.rotate(
            target_camera=torch.from_numpy(tgt_cam),
            target_depth=torch.from_numpy(tgt_depth),
            src_image=torch.from_numpy(src_image),
            src_camera=torch.from_numpy(src_cam),
            src_depth=torch.from_numpy(src_depth),
            src_mask=torch.from_numpy(src_mask),
        )
        my_img, my_mask = my_rotate.rotate(
            target_camera=jnp.asarray(tgt_cam),
            target_depth=jnp.asarray(tgt_depth),
            src_image=jnp.asarray(src_image),
            src_camera=jnp.asarray(src_cam),
            src_depth=jnp.asarray(src_depth),
            src_mask=jnp.asarray(src_mask),
        )
        ref_img = ref_img.detach().numpy()
        ref_mask = ref_mask.detach().numpy()
        a, b = np.asarray(my_img), ref_img
        # grid_sample borders + mask thresholds can differ on a handful
        # of pixels; demand near-exact agreement on 99.5%+
        close = np.isclose(a, b, atol=5e-3)
        assert close.mean() > 0.995, f"only {close.mean():.4f} close"
        am, bm = np.asarray(my_mask), ref_mask
        assert am.shape == bm.shape
        # the mask is continuous (bilinear-resampled source mask times a
        # thresholded depth test): compare by closeness, allowing the
        # handful of pixels where the |d1-d2|<EPS threshold flips
        assert np.isclose(am, bm, atol=5e-3).mean() > 0.99


class TestArcFaceParity:
    def test_irse50_matches_reference(self):
        from spi.criteria.id_loss.model_irse import Backbone

        from spi_tpu.models.perception.arcface import IRSE50

        torch.manual_seed(0)
        ref = Backbone(input_size=112, num_layers=50, drop_ratio=0.6, mode="ir_se")
        ref.eval()
        flat = {
            k: v.detach().numpy().astype(np.float32)
            for k, v in ref.state_dict().items()
            if not k.endswith("num_batches_tracked")
        }
        params = unflatten_to_nested(flat)
        mine = IRSE50()

        rng = np.random.default_rng(1)
        x = rng.uniform(-1, 1, (2, 3, 112, 112)).astype(np.float32)
        with torch.no_grad():
            out_ref = ref(torch.from_numpy(x)).numpy()
        out = np.asarray(mine(params, jnp.asarray(x)))
        assert out.shape == out_ref.shape
        np.testing.assert_allclose(out, out_ref, rtol=5e-3, atol=5e-3)


class TestFilteredLReLU:
    def test_matches_reference_ref_impl(self):
        """vs the reference's own _filtered_lrelu_ref on CPU."""
        from torch_utils.ops.filtered_lrelu import filtered_lrelu as ref_flrelu

        from spi_tpu.ops.filtered_lrelu import filtered_lrelu
        from spi_tpu.ops import setup_filter

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 4, 12, 12)).astype(np.float32)
        b = rng.normal(size=(4,)).astype(np.float32)
        fu = np.array([1.0, 3.0, 3.0, 1.0], np.float32)
        fu = fu / fu.sum()
        fd = fu.copy()

        ref = ref_flrelu(
            torch.from_numpy(x), fu=torch.from_numpy(fu),
            fd=torch.from_numpy(fd), b=torch.from_numpy(b),
            up=2, down=2, padding=3, gain=np.sqrt(2), slope=0.2,
            clamp=5.0, impl="ref",
        ).numpy()
        out = np.asarray(filtered_lrelu(
            jnp.asarray(x), fu=jnp.asarray(fu), fd=jnp.asarray(fd),
            b=jnp.asarray(b), up=2, down=2, padding=3, clamp=5.0,
        ))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_no_filters_identity_path(self):
        from torch_utils.ops.filtered_lrelu import filtered_lrelu as ref_flrelu

        from spi_tpu.ops.filtered_lrelu import filtered_lrelu

        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 2, 8, 8)).astype(np.float32)
        ref = ref_flrelu(torch.from_numpy(x), impl="ref").numpy()
        out = np.asarray(filtered_lrelu(jnp.asarray(x)))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
