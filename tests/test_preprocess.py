"""Tests for the preprocess stack: FAN landmarks, ResNet-50 3DMM
regressor, camera math, orchestrator, extras."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from spi_tpu.models.perception.face_recon import COEFF_SPLIT, FaceReconNet
from spi_tpu.models.perception.fan import FAN, decode_heatmaps, landmarks_from_image
from spi_tpu.preprocess import camera_math as cm


class TestFAN:
    @pytest.fixture(scope="class")
    def small_fan(self):
        fan = FAN(num_modules=1)
        return fan, fan.init(jax.random.PRNGKey(0))

    def test_heatmap_shapes(self, small_fan):
        fan, params = small_fan
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 256, 256))
        heat = fan(params, x)
        assert heat.shape == (1, 68, 64, 64)
        assert jnp.isfinite(heat).all()

    def test_decode_peak(self):
        heat = jnp.zeros((1, 2, 64, 64))
        heat = heat.at[0, 0, 10, 20].set(1.0)
        heat = heat.at[0, 0, 10, 21].set(0.5)  # pull +x
        heat = heat.at[0, 1, 40, 5].set(2.0)
        pts = decode_heatmaps(heat)
        np.testing.assert_allclose(pts[0, 0], [20.25, 10.0], atol=1e-5)
        np.testing.assert_allclose(pts[0, 1, 1], 40.0, atol=0.26)

    def test_decode_matches_get_preds_fromhm_oracle(self):
        """decode_heatmaps vs a numpy transcription of face_alignment's
        get_preds_fromhm (the upstream FAN decode: argmax + 0.25-px
        nudge toward the larger neighbor, interior points only). The
        face_alignment package isn't installable here; the algorithm is
        small enough to pin as an in-test oracle."""
        rng = np.random.default_rng(3)
        hm = rng.normal(0, 1, (2, 68, 64, 64)).astype(np.float32)

        def oracle(hm):
            n, c, h, w = hm.shape
            flat = hm.reshape(n, c, -1)
            idx = flat.argmax(-1)
            preds = np.stack([idx % w, idx // w], -1).astype(np.float64)
            for i in range(n):
                for j in range(c):
                    px, py = int(preds[i, j, 0]), int(preds[i, j, 1])
                    if 0 < px < w - 1 and 0 < py < h - 1:
                        diff = np.array([
                            hm[i, j, py, px + 1] - hm[i, j, py, px - 1],
                            hm[i, j, py + 1, px] - hm[i, j, py - 1, px],
                        ])
                        preds[i, j] += np.sign(diff) * 0.25
            return preds

        pts = np.asarray(decode_heatmaps(jnp.asarray(hm)))
        np.testing.assert_allclose(pts, oracle(hm), atol=1e-5)

    def test_landmarks_scaled_to_image(self, small_fan):
        fan, params = small_fan
        x = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 512, 512))
        pts = landmarks_from_image(fan, params, x)
        assert pts.shape == (1, 68, 2)
        assert (np.asarray(pts) >= 0).all() and (np.asarray(pts) < 512).all()


class TestFaceRecon:
    def test_coeff_dims(self):
        assert sum(d for _, d in COEFF_SPLIT) == 257

    def test_forward_and_split(self):
        net = FaceReconNet()
        params = net.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 224, 224))
        coeffs = net(params, x)
        assert coeffs.shape == (1, 257)
        split = net.split_coeff(coeffs)
        assert split["id"].shape == (1, 80)
        assert split["exp"].shape == (1, 64)
        assert split["angle"].shape == (1, 3)
        assert split["gamma"].shape == (1, 27)
        assert split["trans"].shape == (1, 3)
        # zero-initialized heads -> zero coefficients (reference init)
        np.testing.assert_allclose(coeffs, 0.0)


class TestCameraMath:
    def test_label_shape_and_radius(self):
        cam = cm.cal_camera(np.array([0.1, -0.2, 0.05]), np.array([0.0, 0.1, 0.2]))
        label = cm.process_camera(cam["pose"], cam["intrinsics"])
        assert label.shape == (25,)
        pose = label[:16].reshape(4, 4)
        np.testing.assert_allclose(np.linalg.norm(pose[:3, 3]), 2.7, rtol=1e-5)
        np.testing.assert_allclose(label[16], 2985.29 / 700, rtol=1e-6)

    def test_mirror_label_involution(self):
        cam = cm.cal_camera(np.array([0.1, 0.3, 0.0]), np.array([0.05, 0.0, 0.1]))
        label = cm.process_camera(cam["pose"], cam["intrinsics"])
        m = cm.mirror_label(label)
        mm = cm.mirror_label(m)
        np.testing.assert_allclose(mm, label, atol=1e-6)
        pose = label[:16].reshape(4, 4)
        pose_m = m[:16].reshape(4, 4)
        # yaw flips: camera x position negates
        np.testing.assert_allclose(pose_m[0, 3], -pose[0, 3], atol=1e-6)

    def test_rotation_orthonormal(self):
        r = cm.compute_rotation(np.array([0.2, -0.1, 0.3]))
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-10)


class TestOrchestrator:
    def test_run_total_smoke(self, tmp_path):
        from spi_tpu.preprocess.pipeline import PreprocessModels, run_total

        # tiny random models keep this fast; FAN with 1 module
        from spi_tpu.models.perception.fan import FAN

        models = PreprocessModels.random_init()
        fan = FAN(num_modules=1)
        models.fan = (fan, fan.init(jax.random.PRNGKey(3)))
        models.bisenet = None  # skip parsing for speed

        input_dir = tmp_path / "raw"
        input_dir.mkdir()
        rng = np.random.default_rng(0)
        img = Image.fromarray(rng.integers(0, 255, (640, 640, 3), np.uint8))
        img.save(input_dir / "face0.png")

        out = tmp_path / "data"
        results, failures = run_total(str(input_dir), str(out), models, verbose=False)
        # random landmarks may put the crop out of range; accept either
        # outcome but require the failure to be *captured*, not raised
        assert len(results) + len(failures) == 1
        if results:
            assert (out / "crop" / "face0" / "target.jpg").exists()
            label = np.load(out / "c" / "face0" / "target.npy")
            assert label.shape == (25,)
            lm = np.load(out / "lm" / "face0" / "target.npy")
            assert lm.shape == (68, 2)


class TestExtras:
    def test_mirror_padding(self):
        from spi_tpu.preprocess.extras import mirror_padding

        img = Image.fromarray(np.full((64, 64, 3), 128, np.uint8))
        out = mirror_padding(img, pad=16)
        assert out.size == (96, 96)

    def test_goae_export(self, tmp_path):
        from spi_tpu.preprocess.extras import export_goae_format

        (tmp_path / "crop" / "a").mkdir(parents=True)
        (tmp_path / "c" / "a").mkdir(parents=True)
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            tmp_path / "crop" / "a" / "target.jpg"
        )
        np.save(tmp_path / "c" / "a" / "target.npy", np.zeros(25, np.float32))
        n = export_goae_format(str(tmp_path), str(tmp_path / "goae"))
        assert n == 1
        import json

        with open(tmp_path / "goae" / "label.json") as f:
            data = json.load(f)
        assert data["labels"][0][0] == "a.jpg"
        assert len(data["labels"][0][1]) == 25


class TestShapeExtraction:
    def test_extract_shape_smoke(self, tmp_path):
        from spi_tpu.models.rendering.renderer import RenderingOptions
        from spi_tpu.models.triplane import TriPlaneGenerator
        from spi_tpu.utils.shape import extract_shape

        g = TriPlaneGenerator(
            z_dim=16, c_dim=25, w_dim=16, img_resolution=128,
            backbone_resolution=32, neural_rendering_resolution=16,
            rendering=RenderingOptions(depth_resolution=4, depth_resolution_importance=4),
            sr_variant="SuperresolutionHybrid2X",
            channel_base=512, channel_max=32,
        )
        params = g.init(jax.random.PRNGKey(0))
        ws = jnp.zeros((1, g.num_ws, g.w_dim))
        path = str(tmp_path / "shape.ply")
        verts, faces = extract_shape(
            g, params, ws, path=path, resolution=16, max_batch=1024
        )
        assert verts.shape[1] == 3
        import os

        assert os.path.exists(path)


class TestBiSeNetFull:
    def test_full_pipeline_parsing(self):
        """Full BiSeNet forward at 512 (the avg-pool context path had a
        channel-broadcast bug only visible at full depth)."""
        from spi_tpu.models.perception.bisenet import BiSeNet, parse_faces

        net = BiSeNet()
        params = net.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 128, 128))
        out = parse_faces(net, params, x)
        assert out.shape == (1, 128, 128)
        assert int(out.max()) < 19
