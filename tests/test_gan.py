"""Tests for the GAN training stack: discriminator, losses, SPMD step,
augment pipe, dataset sampling, training stats."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spi_tpu.models.discriminator import (
    Discriminator,
    DualDiscriminator,
    filtered_resizing,
    minibatch_stddev,
)
from spi_tpu.models.rendering.renderer import RenderingOptions
from spi_tpu.models.triplane import TriPlaneGenerator
from spi_tpu.training.augment import AugmentPipe
from spi_tpu.training.gan import GANConfig, GANTrainer, adjust_ada_p


def tiny_generator():
    # NOTE: the 2X SR variant has fixed block resolutions -> 128^2 output
    return TriPlaneGenerator(
        z_dim=16, c_dim=25, w_dim=16, img_resolution=128,
        backbone_resolution=32, neural_rendering_resolution=16,
        rendering=RenderingOptions(depth_resolution=4, depth_resolution_importance=4),
        sr_variant="SuperresolutionHybrid2X",
        channel_base=512, channel_max=32,
    )


class TestDiscriminator:
    def test_single_unconditional(self):
        d = Discriminator(c_dim=0, img_resolution=32, channel_base=1024, channel_max=64)
        params = d.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 32, 32))
        out = d(params, x, jnp.zeros((4, 0)))
        assert out.shape == (4, 1)
        assert jnp.isfinite(out).all()

    def test_conditional_cmap(self):
        d = Discriminator(c_dim=25, img_resolution=32, channel_base=1024, channel_max=64)
        params = d.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
        c = jax.random.normal(jax.random.PRNGKey(2), (2, 25))
        out = d(params, x, c)
        assert out.shape == (2, 1)
        # conditioning must change the output
        out2 = d(params, x, c + 1.0)
        assert not np.allclose(out, out2)

    def test_dual_concat(self):
        d = DualDiscriminator(
            c_dim=25, img_resolution=32, channel_base=1024, channel_max=64
        )
        params = d.init(jax.random.PRNGKey(0))
        img = {
            "image": jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32)),
            "image_raw": jax.random.normal(jax.random.PRNGKey(2), (2, 3, 16, 16)),
        }
        out = d(params, img, jax.random.normal(jax.random.PRNGKey(3), (2, 25)))
        assert out.shape == (2, 1)

    def test_minibatch_stddev(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 4, 4))
        y = minibatch_stddev(x, group_size=2)
        assert y.shape == (4, 9, 4, 4)
        # group layout is reshape(G, N//G): samples 0 and 2 share a group
        np.testing.assert_allclose(y[0, 8], y[2, 8], rtol=1e-5)

    def test_filtered_resizing_shape(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 16, 16))
        assert filtered_resizing(x, 32).shape == (1, 3, 32, 32)


class TestGANTrainer:
    @pytest.fixture(scope="class")
    def trainer(self):
        gen = tiny_generator()
        disc = DualDiscriminator(
            c_dim=25, img_resolution=128, channel_base=1024, channel_max=32
        )
        cfg = GANConfig(batch_per_device=2, r1_interval=2, density_reg_interval=2)
        return GANTrainer(gen, disc, cfg)

    def test_single_device_step(self, trainer):
        from spi_tpu.utils.camera import canonical_camera

        state = trainer.init_state(jax.random.PRNGKey(0))
        step = trainer.make_step()
        b = 2
        real = jax.random.normal(jax.random.PRNGKey(1), (b, 3, 128, 128)).clip(-1, 1)
        z = jax.random.normal(jax.random.PRNGKey(2), (b, trainer.generator.z_dim))
        c = jnp.tile(canonical_camera(), (b, 1))
        state2, metrics = step(state, real, z, c, jax.random.PRNGKey(3))
        assert jnp.isfinite(metrics["loss_g"])
        assert jnp.isfinite(metrics["loss_d"])
        assert int(state2["step"]) == 1
        # params moved
        leaf0 = jax.tree_util.tree_leaves(state["g"])[5]
        leaf1 = jax.tree_util.tree_leaves(state2["g"])[5]
        assert not np.allclose(leaf0, leaf1)

    def test_multi_device_step(self, trainer):
        from jax.sharding import Mesh

        from spi_tpu.utils.camera import canonical_camera

        devices = np.array(jax.devices()[:4])
        mesh = Mesh(devices, ("data",))
        state = trainer.init_state(jax.random.PRNGKey(0))
        step = trainer.make_step(mesh=mesh)
        b = 4
        real = jax.random.normal(jax.random.PRNGKey(1), (b, 3, 128, 128)).clip(-1, 1)
        z = jax.random.normal(jax.random.PRNGKey(2), (b, trainer.generator.z_dim))
        c = jnp.tile(canonical_camera(), (b, 1))
        rngs = jax.random.split(jax.random.PRNGKey(3), b)
        state2, metrics = step(state, real, z, c, rngs)
        assert jnp.isfinite(metrics["loss_g"])
        assert jnp.isfinite(metrics["loss_d"])

    def test_ema_moves_slower(self, trainer):
        from spi_tpu.utils.camera import canonical_camera

        state = trainer.init_state(jax.random.PRNGKey(0))
        step = trainer.make_step()
        b = 2
        real = jax.random.normal(jax.random.PRNGKey(1), (b, 3, 128, 128)).clip(-1, 1)
        z = jax.random.normal(jax.random.PRNGKey(2), (b, trainer.generator.z_dim))
        c = jnp.tile(canonical_camera(), (b, 1))
        state2, _ = step(state, real, z, c, jax.random.PRNGKey(3))

        def delta(a, b):
            return sum(
                float(jnp.sum(jnp.abs(x - y)))
                for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
            )

        assert delta(state2["g_ema"], state["g"]) < delta(state2["g"], state["g"])

    def test_ada_adjust(self):
        cfg = GANConfig()
        p = adjust_ada_p(0.5, rt=1.0, config=cfg, total_batch=32)
        assert p > 0.5
        p = adjust_ada_p(0.5, rt=0.0, config=cfg, total_batch=32)
        assert p < 0.5


class TestAugmentPipe:
    def test_identity_at_p0(self):
        pipe = AugmentPipe()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16, 16))
        y = pipe(None, jax.random.PRNGKey(1), x, p=0.0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)

    def test_changes_at_p1(self):
        pipe = AugmentPipe()
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 16, 16))
        y = pipe(None, jax.random.PRNGKey(1), x, p=1.0)
        assert y.shape == x.shape
        assert jnp.isfinite(y).all()
        assert not np.allclose(np.asarray(y), np.asarray(x))

    def test_jits(self):
        pipe = AugmentPipe()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16, 16))
        f = jax.jit(lambda rng, x, p: pipe(None, rng, x, p))
        y = f(jax.random.PRNGKey(1), x, 0.5)
        assert jnp.isfinite(y).all()

    def test_imgfilter_noise_active(self):
        """imgfilter + noise groups (augment.py:382-421) run and change
        the image; at p=0 they are the identity."""
        pipe = AugmentPipe(
            xflip=0, rotate90=0, xint=0, scale=0, rotate=0, aniso=0,
            xfrac=0, brightness=0, contrast=0, lumaflip=0, hue=0,
            saturation=0, imgfilter=1.0, noise=1.0,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 16, 16))
        y0 = pipe(None, jax.random.PRNGKey(1), x, p=0.0)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(x), atol=1e-4)
        y1 = pipe(None, jax.random.PRNGKey(1), x, p=1.0)
        assert jnp.isfinite(y1).all()
        assert not np.allclose(np.asarray(y1), np.asarray(x), atol=1e-3)

    def test_fbank_matches_reference(self):
        """The wavelet filter bank equals the reference's Hz_fbank
        buffer (eg3d/training/augment.py:176-186)."""
        torch = pytest.importorskip("torch")
        import sys

        sys.path.insert(0, "/root/reference/eg3d")
        from training.augment import AugmentPipe as RefPipe

        from spi_tpu.training.augment import _HZ_FBANK

        ref = RefPipe()
        np.testing.assert_allclose(
            _HZ_FBANK, ref.Hz_fbank.numpy(), rtol=1e-6, atol=1e-7
        )

    def test_imgfilter_matches_reference_debug_percentile(self):
        """Deterministic imgfilter parity: the reference with
        debug_percentile=0.5 amplifies every band by exp2(erfinv(0))=1
        -> the combined filter is the power-normalized fbank sum; apply
        the same gains through filter_images and compare pixels."""
        torch = pytest.importorskip("torch")
        import sys

        sys.path.insert(0, "/root/reference/eg3d")
        from training.augment import AugmentPipe as RefPipe

        from spi_tpu.training.augment import _EXPECTED_POWER, _HZ_FBANK, filter_images

        ref = RefPipe(imgfilter=1.0)
        ref.p.copy_(torch.as_tensor(1.0))
        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, (2, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            y_ref = ref(torch.from_numpy(x), debug_percentile=0.5).numpy()

        n = x.shape[0]
        num_bands = _HZ_FBANK.shape[0]
        gain = np.ones((n, num_bands), np.float32)
        for i in range(num_bands):
            t = np.ones((n, num_bands), np.float32)  # t_i = exp2(0) = 1
            t /= np.sqrt((_EXPECTED_POWER * t ** 2).sum(-1, keepdims=True))
            gain *= t
        hz = gain @ _HZ_FBANK
        y = np.asarray(filter_images(jnp.asarray(x), jnp.asarray(hz)))
        np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-5)


class TestGanDataset:
    def test_folder_and_sampler(self, tmp_path):
        from PIL import Image

        from spi_tpu.data.gan_dataset import (
            ImageFolderDataset,
            batch_iterator,
            infinite_indices,
        )

        import json

        rng = np.random.default_rng(0)
        labels = []
        for i in range(3):
            img = Image.fromarray(rng.integers(0, 255, (16, 16, 3), np.uint8))
            img.save(tmp_path / f"img{i}.png")
            labels.append([f"img{i}.png", list(np.arange(25.0))])
        with open(tmp_path / "dataset.json", "w") as f:
            json.dump({"labels": labels}, f)

        ds = ImageFolderDataset(str(tmp_path), resolution=16)
        assert len(ds) == 3
        assert ds.label_dim == 25
        img, label = ds[0]
        assert img.shape == (3, 16, 16) and img.dtype == np.uint8
        assert label.shape == (25,)

        # rank striding covers disjoint work
        it0 = infinite_indices(3, rank=0, num_replicas=2, shuffle=False)
        it1 = infinite_indices(3, rank=1, num_replicas=2, shuffle=False)
        seq0 = [next(it0) for _ in range(3)]
        seq1 = [next(it1) for _ in range(3)]
        assert seq0 == [0, 2, 1]
        assert seq1 == [1, 0, 2]

        batch = next(batch_iterator(ds, 2))
        assert batch[0].shape == (2, 3, 16, 16)
        assert batch[0].min() >= -1.0 and batch[0].max() <= 1.0

    def test_xflip_mirrors_label(self, tmp_path):
        from PIL import Image

        from spi_tpu.data.gan_dataset import ImageFolderDataset

        import json

        img = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
        img.save(tmp_path / "a.png")
        from spi_tpu.preprocess import camera_math as cm

        cam = cm.cal_camera(np.array([0.0, 0.4, 0.0]), np.zeros(3))
        label = cm.process_camera(cam["pose"], cam["intrinsics"])
        with open(tmp_path / "dataset.json", "w") as f:
            json.dump({"labels": [["a.png", label.tolist()]]}, f)
        ds = ImageFolderDataset(str(tmp_path), xflip=True)
        assert len(ds) == 2
        _, l0 = ds[0]
        _, l1 = ds[1]
        np.testing.assert_allclose(l1[:16].reshape(4, 4)[0, 3],
                                   -l0[:16].reshape(4, 4)[0, 3], atol=1e-6)


class TestStats:
    def test_collector(self):
        from spi_tpu.utils.stats import Collector

        c = Collector()
        c.report("loss", jnp.array([1.0, 2.0, 3.0]))
        c.report("loss", jnp.array([4.0]))
        assert abs(c.mean("loss") - 2.5) < 1e-6
        d = c.as_dict()
        assert d["loss"]["num"] == 4

    def test_psum_moments(self):
        from spi_tpu.utils.stats import cross_device_sum, moments_of

        def f(x):
            return cross_device_sum({"v": moments_of(x)}, "i")

        xs = jnp.arange(8.0).reshape(4, 2)
        out = jax.vmap(f, axis_name="i")(xs)
        np.testing.assert_allclose(out["v"][0], out["v"][1])
        assert out["v"][0][0] == 8  # total count
