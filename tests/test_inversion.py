"""End-to-end inversion engine tests on a tiny generator config:
stage-1 projection (all three modes), stage-2 tuning (PTI + RotBbox),
criteria, and the depth-warp."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spi_tpu.criteria.bbox_cx import BoxCXLoss, landmark_boxes
from spi_tpu.criteria.lpips import LPIPS
from spi_tpu.criteria.noise_reg import noise_regularization, normalize_noise
from spi_tpu.models.rendering.renderer import RenderingOptions
from spi_tpu.models.triplane import TriPlaneGenerator
from spi_tpu.training import coaches, projectors
from spi_tpu.utils import camera as cam
from spi_tpu.utils import rotate
from spi_tpu.utils.params import extract_noise, replace_noise, trainable_mask


def tiny_config():
    return TriPlaneGenerator(
        z_dim=32,
        c_dim=25,
        w_dim=32,
        img_resolution=128,
        backbone_resolution=32,
        neural_rendering_resolution=16,
        rendering=RenderingOptions(depth_resolution=6, depth_resolution_importance=6),
        sr_variant="SuperresolutionHybrid2X",
        channel_base=1024,
        channel_max=64,
    )


@pytest.fixture(scope="module")
def setup():
    g = tiny_config()
    g_params = g.init(jax.random.PRNGKey(0))
    lpips = LPIPS()
    lpips_params = lpips.init(jax.random.PRNGKey(1))
    camera = cam.canonical_camera()
    target = jnp.tanh(
        jax.random.normal(jax.random.PRNGKey(2), (1, 3, 128, 128))
    )
    return g, g_params, lpips, lpips_params, target, camera


class TestNoiseUtils:
    def test_extract_replace_roundtrip(self, setup):
        g, g_params, *_ = setup
        noise = extract_noise(g_params)
        assert len(noise) > 0
        assert all(k.endswith("noise_const") for k in noise)
        zeroed = {k: jnp.zeros_like(v) for k, v in noise.items()}
        replaced = replace_noise(g_params, zeroed)
        n2 = extract_noise(replaced)
        assert all(float(jnp.abs(v).sum()) == 0 for v in n2.values())

    def test_normalize_noise(self):
        tree = {"a": jax.random.normal(jax.random.PRNGKey(0), (16, 16)) * 3 + 1}
        out = normalize_noise(tree)
        assert abs(float(out["a"].mean())) < 1e-5
        np.testing.assert_allclose(float(jnp.square(out["a"]).mean()), 1.0, rtol=1e-5)

    def test_noise_reg_positive(self):
        tree = {"a": jnp.ones((16, 16))}
        assert float(noise_regularization(tree)) > 0

    def test_trainable_mask_excludes_buffers(self, setup):
        g, g_params, *_ = setup
        mask = trainable_mask(g_params)
        flat = jax.tree_util.tree_flatten_with_path(mask)[0]
        noise_leaves = [v for p, v in flat if "noise_const" in str(p)]
        assert noise_leaves and not any(noise_leaves)


class TestProjectors:
    @pytest.mark.parametrize(
        "mode",
        ["sg",
         pytest.param("sgw+", marks=pytest.mark.slow),
         pytest.param("mir", marks=pytest.mark.slow)],
    )
    def test_project_runs_and_improves(self, setup, mode):
        g, g_params, lpips, lpips_params, target, camera = setup
        settings = projectors.ProjectorSettings(
            mode=mode, num_steps=6, w_avg_samples=8
        )
        fg = jnp.ones((1, 1, 128, 128))
        w, noise, dists = projectors.project(
            g, g_params, lpips, lpips_params, target, camera,
            jax.random.PRNGKey(3), settings, fg_mask=fg,
        )
        assert w.shape == (1, g.num_ws, g.w_dim)
        assert np.isfinite(np.asarray(w)).all()
        assert len(noise) > 0
        assert np.isfinite(np.asarray(dists)).all()


class TestCoach:
    def test_pti_updates_params_and_counts_steps(self, setup):
        g, g_params, lpips, lpips_params, target, camera = setup
        ws = jnp.zeros((1, g.num_ws, g.w_dim))
        settings = dataclasses.replace(
            coaches.pti_settings(num_steps=3), lpips_threshold=-1.0
        )
        tuned, (steps, lp) = coaches.tune_generator(
            g, g_params, g_params, lpips, lpips_params,
            coaches.CoachInputs(target=target, camera=camera, w_pivot=ws),
            jax.random.PRNGKey(0),
            settings,
        )
        assert int(steps) == 3
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).sum()), tuned, g_params
        )
        total = sum(jax.tree_util.tree_leaves(diff))
        assert total > 0
        # noise buffers must not move (buffer, not parameter)
        n0 = extract_noise(g_params)
        n1 = extract_noise(tuned)
        assert all(
            float(jnp.abs(n0[k] - n1[k]).sum()) == 0 for k in n0
        )

    def test_early_stop_on_lpips_threshold(self, setup):
        """Early-stop semantics (rot_bbox_cx_coach.py:148-151): a huge
        threshold stops after the first step without applying it."""
        g, g_params, lpips, lpips_params, target, camera = setup
        ws = jnp.zeros((1, g.num_ws, g.w_dim))
        settings = dataclasses.replace(
            coaches.pti_settings(num_steps=5), lpips_threshold=1e9
        )
        tuned, (steps, lp) = coaches.tune_generator(
            g, g_params, g_params, lpips, lpips_params,
            coaches.CoachInputs(target=target, camera=camera, w_pivot=ws),
            jax.random.PRNGKey(0),
            settings,
        )
        assert int(steps) == 1
        diff = sum(
            float(jnp.abs(a - b).sum())
            for a, b in zip(
                jax.tree_util.tree_leaves(tuned), jax.tree_util.tree_leaves(g_params)
            )
        )
        assert diff == 0.0

    @pytest.mark.slow
    def test_rotbbox_full_losses(self, setup):
        g, g_params, lpips, lpips_params, target, camera = setup
        ws = jnp.zeros((1, g.num_ws, g.w_dim))
        mask = jnp.ones((1, 1, 128, 128))
        lm = (
            jax.random.uniform(jax.random.PRNGKey(5), (1, 68, 2)) * 100 + 78
        )
        box_cx = BoxCXLoss()
        box_params = box_cx.init(jax.random.PRNGKey(6))
        tuned, (steps, lp) = coaches.tune_generator(
            g, g_params, g_params, lpips, lpips_params,
            coaches.CoachInputs(
                target=target, camera=camera, w_pivot=ws,
                face_mask=mask, landmarks=lm,
            ),
            jax.random.PRNGKey(0),
            # Disable the 0.05 early-stop: with RANDOM lin-head weights
            # the LPIPS scale is arbitrary and can land under the
            # threshold after one step (the reference breaks before
            # optimizer.step() the same way, rot_bbox_cx_coach.py:
            # 148-151), which would make the step-count assertion flaky.
            coaches.CoachSettings(
                num_steps=2, tv_lambda=0.25, lpips_threshold=-1.0
            ),
            box_cx=box_cx,
            box_cx_params=box_params,
        )
        assert int(steps) == 2
        assert np.isfinite(float(lp))


class TestRotate:
    def test_identity_warp(self):
        """Warping a view into itself with its own depth must reproduce the
        image where depth is consistent."""
        camera = cam.canonical_camera()
        img = jnp.tanh(jax.random.normal(jax.random.PRNGKey(0), (1, 3, 32, 32)))
        depth = jnp.full((1, 1, 16, 16), 2.7)
        warped, mask = rotate.rotate(
            target_camera=camera, target_depth=depth,
            src_image=img, src_camera=camera, src_depth=depth,
            depth_resolution=16,
        )
        m = np.asarray(mask)
        assert m.mean() > 0.5  # most pixels valid
        err = np.abs(np.asarray(warped - img * mask))
        assert err.max() < 0.15  # bilinear resampling tolerance

    def test_occlusion_masked(self):
        camera = cam.canonical_camera()
        camera2 = cam.canonical_camera(yaw=0.4)
        img = jnp.ones((1, 3, 32, 32))
        depth1 = jnp.full((1, 1, 16, 16), 2.7)
        depth2 = jnp.full((1, 1, 16, 16), 3.2)  # inconsistent depth
        _, mask = rotate.rotate(
            target_camera=camera2, target_depth=depth1,
            src_image=img, src_camera=camera, src_depth=depth2,
            depth_resolution=16,
        )
        assert np.asarray(mask).mean() < 0.1


class TestBoxCX:
    def test_landmark_boxes(self):
        lm = jnp.tile(jnp.array([[100.0, 120.0]]), (1, 68, 1))
        boxes = landmark_boxes(lm)
        assert len(boxes) == 3
        mouth = np.asarray(boxes[0][0])
        assert mouth[0] == 100 - 8 and mouth[2] == 100 + 8

    def test_loss_zero_for_identical(self):
        box_cx = BoxCXLoss()
        p = box_cx.init(jax.random.PRNGKey(0))
        img = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 256, 256))
        lm = jax.random.uniform(jax.random.PRNGKey(2), (1, 68, 2)) * 150 + 50
        loss_same = float(box_cx(p, img, img, lm))
        other = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 256, 256))
        loss_diff = float(box_cx(p, img, other, lm))
        assert loss_same < loss_diff


class TestLPIPSBf16:
    def test_close_to_fp32(self):
        import numpy as np

        from spi_tpu.criteria.lpips import LPIPS

        l32 = LPIPS()
        lbf = LPIPS(compute_dtype="bfloat16")
        p = l32.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 64, 64), minval=-1, maxval=1)
        y = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 64, 64), minval=-1, maxval=1)
        a = float(l32(p, x, y))
        b = float(lbf(p, x, y))
        assert abs(a - b) / max(abs(a), 1e-6) < 0.05


class TestPTIDatasetM:
    def test_mirror_fallback(self, tmp_path):
        import os

        import numpy as np
        from PIL import Image

        from spi_tpu.data.dataset import PTIDatasetM
        from spi_tpu.preprocess import camera_math as cm

        for d in ("crop/a", "c/a"):
            os.makedirs(tmp_path / d)
        img = np.zeros((512, 512, 3), np.uint8)
        img[:, :256] = 255  # left half white
        Image.fromarray(img).save(tmp_path / "crop/a/target.jpg")
        camdat = cm.cal_camera(np.array([0.0, 0.3, 0.0]), np.zeros(3))
        label = cm.process_camera(camdat["pose"], camdat["intrinsics"])
        np.save(tmp_path / "c/a/target.npy", label)

        ds = PTIDatasetM(
            source_root=str(tmp_path / "crop"), c_root=str(tmp_path / "c"),
        )
        assert len(ds) == 2
        orig = ds[0]
        mirr = ds[1]
        assert mirr.name == "a_m"
        # flipped image: white half moves right
        assert orig.image[0, 0, 0, 0] > 0.9 and mirr.image[0, 0, 0, 0] < -0.9
        pose = orig.camera[0, :16].reshape(4, 4)
        pose_m = mirr.camera[0, :16].reshape(4, 4)
        np.testing.assert_allclose(pose_m[0, 3], -pose[0, 3], atol=1e-6)
