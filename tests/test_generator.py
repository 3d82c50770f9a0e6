"""Generator-stack tests: shapes, determinism, gradient flow, and
component-level numerics (run on a small generator config for speed;
the FFHQ-512 architecture is exercised for shapes only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spi_tpu.models.rendering import math_utils
from spi_tpu.models.rendering.ray_marcher import march_rays
from spi_tpu.models.rendering.ray_sampler import sample_rays
from spi_tpu.models.rendering.renderer import (
    RenderingOptions,
    project_onto_planes,
    sample_from_planes,
    sample_pdf,
)
from spi_tpu.models.stylegan2 import FullyConnected, Generator, MappingNetwork
from spi_tpu.models.triplane import TriPlaneGenerator, ffhq512_128_config
from spi_tpu.utils import camera as cam


def small_config(**kw):
    defaults = dict(
        z_dim=64,
        c_dim=25,
        w_dim=64,
        img_resolution=128,
        backbone_resolution=64,
        neural_rendering_resolution=32,
        rendering=RenderingOptions(depth_resolution=8, depth_resolution_importance=8),
        sr_variant="SuperresolutionHybrid2X",
        channel_base=2048,
        channel_max=128,
    )
    defaults.update(kw)
    return TriPlaneGenerator(**defaults)


class TestLayers:
    def test_fc_matches_manual(self):
        fc = FullyConnected(8, 4, lr_multiplier=0.01, bias_init=1.0)
        p = fc.init(jax.random.PRNGKey(0))
        x = jnp.ones((2, 8))
        y = fc(p, x)
        w = p["weight"] * (0.01 / np.sqrt(8))
        want = x @ w.T + p["bias"] * 0.01
        np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=1e-6)

    def test_mapping_broadcast_and_truncation(self):
        m = MappingNetwork(z_dim=32, c_dim=0, w_dim=32, num_ws=6)
        p = m.init(jax.random.PRNGKey(0))
        z = jax.random.normal(jax.random.PRNGKey(1), (3, 32))
        ws = m(p, z, None)
        assert ws.shape == (3, 6, 32)
        # full truncation collapses to w_avg
        ws_t = m(p, z, None, truncation_psi=0.0)
        np.testing.assert_allclose(
            np.asarray(ws_t), np.broadcast_to(np.asarray(p["w_avg"]), ws_t.shape), atol=1e-6
        )

    def test_backbone_shapes(self):
        g = Generator(z_dim=32, c_dim=0, w_dim=32, img_resolution=64,
                      img_channels=96, channel_base=2048, channel_max=128)
        assert g.num_ws == 10  # blocks at 4..64: 1+2*4 convs + 1 torgb
        p = g.init(jax.random.PRNGKey(0))
        z = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
        img = g(p, z, None)
        assert img.shape == (2, 96, 64, 64)
        assert np.isfinite(np.asarray(img)).all()


class TestRendering:
    def test_plane_projection_axes(self):
        pts = jnp.array([[[1.0, 2.0, 3.0]]])
        proj = np.asarray(project_onto_planes(pts))[0, :, 0]
        np.testing.assert_allclose(proj[0], [1.0, 2.0])  # (x, y)
        np.testing.assert_allclose(proj[1], [1.0, 3.0])  # (x, z)
        np.testing.assert_allclose(proj[2], [3.0, 1.0])  # (z, x)

    def test_sample_from_planes_center(self):
        # constant planes -> constant features anywhere strictly inside
        c = 4
        tables = jnp.ones((1, 3, 16 * 16, c)) * jnp.arange(1.0, c + 1)
        pts = jnp.array([[[0.1, -0.2, 0.05], [0.0, 0.0, 0.0]]])
        out = np.asarray(sample_from_planes(tables, pts, box_warp=1.0))
        assert out.shape == (1, 3, 2, c)
        np.testing.assert_allclose(out[0, :, 1], np.tile(np.arange(1.0, c + 1), (3, 1)), rtol=1e-5)

    def test_ray_limits_box(self):
        o = jnp.array([[[0.0, 0.0, -2.0], [0.0, 0.0, -2.0]]])
        d = jnp.array([[[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]]])
        tmin, tmax = math_utils.get_ray_limits_box(o, d, box_side_length=1.0)
        np.testing.assert_allclose(np.asarray(tmin)[0, 0, 0], 1.5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(tmax)[0, 0, 0], 2.5, atol=1e-5)
        # miss
        assert np.asarray(tmin)[0, 1, 0] == -1.0 and np.asarray(tmax)[0, 1, 0] == -2.0

    def test_ray_sampler_matches_camera_position(self):
        c = cam.canonical_camera()
        c2w, K = cam.unpack_camera(c)
        o, d = sample_rays(c2w, K, 8)
        assert o.shape == (1, 64, 3) and d.shape == (1, 64, 3)
        np.testing.assert_allclose(
            np.asarray(o[0, 0]), np.asarray(c2w[0, :3, 3]), rtol=1e-5
        )
        np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, rtol=1e-5)
        # central rays point roughly along camera forward (-z world here)
        fwd = np.asarray(c2w[0, :3, 2])
        mean_dir = np.asarray(d[0]).mean(0)
        assert np.dot(fwd, mean_dir / np.linalg.norm(mean_dir)) > 0.99

    def test_march_rays_opaque_surface(self):
        # very dense at one depth -> composite depth near that sample
        n, m, s = 1, 4, 16
        depths = jnp.broadcast_to(jnp.linspace(1.0, 2.0, s).reshape(1, 1, s, 1), (n, m, s, 1))
        colors = jnp.ones((n, m, s, 3)) * 0.8
        dens = jnp.full((n, m, s, 1), -10.0)
        dens = dens.at[:, :, 8].set(1000.0)
        rgb, depth, w = march_rays(colors, dens, depths)
        assert rgb.shape == (n, m, 3) and depth.shape == (n, m, 1)
        np.testing.assert_allclose(np.asarray(depth), depths[0, 0, 8, 0], atol=0.06)
        np.testing.assert_allclose(np.asarray(rgb), 0.8 * 2 - 1, atol=1e-3)

    def test_sample_pdf_concentrates(self):
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (4, 11))
        weights = jnp.zeros((4, 10)).at[:, 5].set(100.0)
        s = sample_pdf(jax.random.PRNGKey(0), bins, weights, 16)
        s = np.asarray(s)
        assert s.shape == (4, 16)
        assert ((s > 0.45) & (s < 0.65)).mean() > 0.9


class TestTriPlaneGenerator:
    @pytest.fixture(scope="class")
    def g_and_params(self):
        g = small_config()
        params = g.init(jax.random.PRNGKey(0))
        return g, params

    def test_synthesis_shapes_and_determinism(self, g_and_params):
        g, params = g_and_params
        c = cam.canonical_camera()
        ws = jnp.zeros((1, g.num_ws, g.w_dim))
        out = g.synthesis(params, jax.random.PRNGKey(1), ws, c)
        assert out["image"].shape == (1, 3, g.img_resolution, g.img_resolution)
        assert out["image_raw"].shape == (1, 3, 32, 32)
        assert out["image_depth"].shape == (1, 1, 32, 32)
        for v in out.values():
            assert np.isfinite(np.asarray(v)).all()
        out2 = g.synthesis(params, jax.random.PRNGKey(1), ws, c)
        np.testing.assert_array_equal(np.asarray(out["image"]), np.asarray(out2["image"]))

    def test_full_forward_jit(self, g_and_params):
        g, params = g_and_params
        c = cam.canonical_camera(batch_size=2)
        z = jax.random.normal(jax.random.PRNGKey(2), (2, g.z_dim))

        @jax.jit
        def fwd(params, z, c, rng):
            return g.forward(params, rng, z, c)["image"]

        img = fwd(params, z, c, jax.random.PRNGKey(3))
        assert img.shape == (2, 3, g.img_resolution, g.img_resolution)

    def test_gradients_reach_all_params(self, g_and_params):
        g, params = g_and_params
        c = cam.canonical_camera()
        ws = jnp.zeros((1, g.num_ws, g.w_dim))

        def loss(p):
            z = jnp.ones((1, g.z_dim)) * 0.1
            out = g.forward(p, jax.random.PRNGKey(0), z, c)
            return jnp.mean(out["image"] ** 2) + jnp.mean(out["image_depth"] ** 2)

        grads = jax.grad(loss)(params)
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        # Zero grads are expected for: w_avg (buffer), noise_const (scaled
        # by noise_strength == 0 at init), and the c-embedding when the
        # camera path is zeroed. Everything else must receive gradient.
        # superresolution noise_strength is unused under the default
        # sr_noise_mode='none'.
        expected_zero = ("w_avg", "noise_const", "superresolution")
        bad = [
            jax.tree_util.keystr(p)
            for p, g_ in flat
            if float(jnp.abs(g_).sum()) == 0
            and not any(s in jax.tree_util.keystr(p) for s in expected_zero)
        ]
        assert not bad, f"missing gradients: {bad[:10]}"

    def test_sample_mixed(self, g_and_params):
        g, params = g_and_params
        ws = jnp.zeros((1, g.num_ws, g.w_dim))
        pts = jax.random.uniform(jax.random.PRNGKey(1), (1, 100, 3), minval=-0.4, maxval=0.4)
        rgb, sigma = g.sample_mixed(params, ws, pts, pts)
        assert rgb.shape == (1, 100, g.plane_channels)
        assert sigma.shape == (1, 100, 1)

    def test_odd_camera_batch_matches_per_camera(self, g_and_params):
        """Batch-3 shared-plane render (pow2-normalized chunk + mapped SR)
        == stacking three single-camera renders."""
        import dataclasses

        g, params = g_and_params
        # force the chunked path even at the small test ray count
        g = dataclasses.replace(
            g, rendering=dataclasses.replace(g.rendering, ray_chunk=256)
        )
        ws = jnp.zeros((1, g.num_ws, g.w_dim))
        planes = g._planes_nhwc(params, ws)
        cams = cam.sample_camera(jax.random.PRNGKey(5), batch_size=3)
        rng = jax.random.PRNGKey(7)
        out = g.synthesis_from_planes(params, rng, planes, ws, cams)
        assert out["image"].shape[0] == 3
        assert np.isfinite(np.asarray(out["image"])).all()
        # Per-camera renders use different stratified-jitter draws (the
        # batch shape feeds the rng), so agreement is statistical, not
        # bitwise: same integrand, different 48-sample estimates.
        singles = [
            g.synthesis_from_planes(params, rng, planes, ws, cams[i : i + 1])["image"]
            for i in range(3)
        ]
        diff = np.abs(
            np.asarray(out["image"], np.float32)
            - np.asarray(jnp.concatenate(singles, axis=0), np.float32)
        )
        assert diff.mean() < 0.05 and diff.max() < 0.5, (diff.mean(), diff.max())

    def test_ffhq_architecture_counts(self):
        g = ffhq512_128_config()
        assert g.num_ws == 14
        assert g.backbone.synthesis.block_resolutions == (4, 8, 16, 32, 64, 128, 256)
        assert g.backbone.synthesis.channels(256) == 128
        assert g.superresolution.block0.out_channels == 256


class TestCameraUtils:
    def test_canonical_camera_radius(self):
        c = cam.canonical_camera()
        ext, K = cam.unpack_camera(c)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(ext[0, :3, 3])), 2.7, rtol=1e-5
        )
        np.testing.assert_allclose(np.asarray(K[0, 0, 0]), 4.2647, rtol=1e-6)

    def test_mirror_camera_involution(self):
        c = cam.sample_camera(jax.random.PRNGKey(0), batch_size=3)
        c_m = cam.mirror_camera(cam.mirror_camera(c))
        np.testing.assert_allclose(np.asarray(c_m), np.asarray(c), rtol=1e-6)

    def test_mirror_flips_yaw(self):
        c = cam.canonical_camera(yaw=0.3)
        y0 = float(cam.camera_yaw(c)[0])
        y1 = float(cam.camera_yaw(cam.mirror_camera(c))[0])
        np.testing.assert_allclose(y0, -y1, atol=1e-5)

    def test_camera_weight_frontal_zero(self):
        c = cam.canonical_camera(yaw=0.0)
        assert float(cam.cal_camera_weight(c)[0]) == 0.0
        c_side = cam.canonical_camera(yaw=0.6)
        assert float(cam.cal_camera_weight(c_side)[0]) > 0.1

    def test_surrounding_camera_perturbs(self):
        c = cam.canonical_camera()
        cs = cam.sample_surrounding_camera(jax.random.PRNGKey(0), c, batch_size=4, yaw_range=0.2)
        assert cs.shape == (4, 25)
        yaws = np.asarray(cam.camera_yaw(cs))
        assert np.abs(yaws).max() < 0.35 and np.abs(yaws).std() > 0


class TestMarchUnsorted:
    def test_matches_sorted_march(self):
        """march_rays_unsorted(shuffled samples) == march_rays(sorted)."""
        import numpy as np

        from spi_tpu.models.rendering.ray_marcher import (
            march_rays,
            march_rays_unsorted,
        )

        key = jax.random.PRNGKey(0)
        n, m, s, c = 2, 64, 24, 8
        depths = jnp.sort(
            jax.random.uniform(key, (n, m, s, 1), minval=2.0, maxval=3.0), axis=2
        )
        colors = jax.random.uniform(jax.random.PRNGKey(1), (n, m, s, c))
        dens = jax.random.normal(jax.random.PRNGKey(2), (n, m, s, 1))

        rgb_ref, depth_ref, w_ref = march_rays(colors, dens, depths)

        perm = jax.random.permutation(jax.random.PRNGKey(3), s)
        rgb, depth, w = march_rays_unsorted(
            colors[:, :, perm], dens[:, :, perm], depths[:, :, perm]
        )
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(depth), np.asarray(depth_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=1e-5)

    def test_white_back(self):
        import numpy as np

        from spi_tpu.models.rendering.ray_marcher import (
            march_rays,
            march_rays_unsorted,
        )

        depths = jnp.sort(jax.random.uniform(jax.random.PRNGKey(0), (1, 8, 12, 1)), axis=2)
        colors = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 12, 3))
        dens = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 12, 1))
        a = march_rays(colors, dens, depths, white_back=True)[0]
        b = march_rays_unsorted(colors, dens, depths, white_back=True)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestMarchMerge:
    def _groups(self, key, n=2, m=64, s1=12, s2=9, c=8):
        k = jax.random.split(key, 6)
        d1 = jnp.sort(jax.random.uniform(k[0], (n, m, s1, 1), minval=2.0, maxval=3.0), axis=2)
        d2 = jnp.sort(jax.random.uniform(k[1], (n, m, s2, 1), minval=2.0, maxval=3.0), axis=2)
        c1 = jax.random.uniform(k[2], (n, m, s1, c))
        c2 = jax.random.uniform(k[3], (n, m, s2, c))
        s1_ = jax.random.normal(k[4], (n, m, s1, 1))
        s2_ = jax.random.normal(k[5], (n, m, s2, 1))
        return (c1, s1_, d1), (c2, s2_, d2)

    def test_matches_sorted_march(self):
        """march_rays_merge(two sorted groups) == march_rays(sorted union)."""
        import numpy as np

        from spi_tpu.models.rendering.ray_marcher import march_rays, march_rays_merge

        (c1, s1, d1), (c2, s2, d2) = self._groups(jax.random.PRNGKey(0))
        # sorted-union reference via numpy argsort of the concat
        dcat = jnp.concatenate([d1, d2], axis=2)
        ccat = jnp.concatenate([c1, c2], axis=2)
        scat = jnp.concatenate([s1, s2], axis=2)
        order = np.argsort(np.asarray(dcat[..., 0]), axis=-1)
        take = lambda x: jnp.take_along_axis(x, jnp.asarray(order)[..., None], axis=2)
        rgb_ref, depth_ref, w_ref = march_rays(take(ccat), take(scat), take(dcat))

        rgb, depth, w = march_rays_merge(c1, s1, d1, c2, s2, d2)
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(depth), np.asarray(depth_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=1e-5)

    def test_white_back_and_grads(self):
        import numpy as np

        from spi_tpu.models.rendering.ray_marcher import march_rays, march_rays_merge

        (c1, s1, d1), (c2, s2, d2) = self._groups(jax.random.PRNGKey(7), m=16, c=3)
        a = march_rays_merge(c1, s1, d1, c2, s2, d2, white_back=True)[0]
        dcat = jnp.concatenate([d1, d2], axis=2)
        order = np.argsort(np.asarray(dcat[..., 0]), axis=-1)
        take = lambda x: jnp.take_along_axis(x, jnp.asarray(order)[..., None], axis=2)
        b = march_rays(
            take(jnp.concatenate([c1, c2], axis=2)),
            take(jnp.concatenate([s1, s2], axis=2)),
            take(dcat),
            white_back=True,
        )[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

        # gradient wrt densities flows and matches the sorted formulation
        ga = jax.grad(
            lambda s1: jnp.sum(march_rays_merge(c1, s1, d1, c2, s2, d2)[0])
        )(s1)
        assert np.isfinite(np.asarray(ga)).all() and np.abs(np.asarray(ga)).max() > 0

    def test_sample_pdf_nondet_sorted(self):
        """Non-det sample_pdf emits ascending samples with the right range."""
        import numpy as np

        from spi_tpu.models.rendering.renderer import sample_pdf

        r, b, i = 64, 12, 24
        bins = jnp.sort(jax.random.uniform(jax.random.PRNGKey(0), (r, b + 2)), axis=-1)
        weights = jax.random.uniform(jax.random.PRNGKey(1), (r, b))
        out = np.asarray(sample_pdf(jax.random.PRNGKey(2), bins, weights, i))
        assert (np.diff(out, axis=-1) >= 0).all()
        bn = np.asarray(bins)
        assert (out >= bn[:, :1] - 1e-6).all() and (out <= bn[:, b : b + 1] + 1e-6).all()


class TestQuadSample:
    def test_matches_grid_sample_nhwc(self):
        import numpy as np

        from spi_tpu.ops.grid_sample import grid_sample_nhwc, quad_sample_nhwc

        h = w = 16
        c = 8
        table = jax.random.normal(jax.random.PRNGKey(0), (2, h * w, c))
        # include out-of-bounds coords to exercise zeros padding
        coords = jax.random.uniform(
            jax.random.PRNGKey(1), (2, 100, 2), minval=-1.3, maxval=1.3
        )
        a = grid_sample_nhwc(table, coords, h, w)
        b = quad_sample_nhwc(table, coords, h, w)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_gradients_match(self):
        import numpy as np

        from spi_tpu.ops.grid_sample import grid_sample_nhwc, quad_sample_nhwc

        h = w = 8
        table = jax.random.normal(jax.random.PRNGKey(0), (1, h * w, 4))
        coords = jax.random.uniform(jax.random.PRNGKey(1), (1, 50, 2), minval=-1, maxval=1)
        g1 = jax.grad(lambda t: jnp.sum(jnp.sin(grid_sample_nhwc(t, coords, h, w))))(table)
        g2 = jax.grad(lambda t: jnp.sum(jnp.sin(quad_sample_nhwc(t, coords, h, w))))(table)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


class TestSamplePDF:
    def test_matches_searchsorted_reference(self):
        """Masked-reduction bracketing == searchsorted+gather reference."""
        import numpy as np

        from spi_tpu.models.rendering.renderer import sample_pdf

        r, b, i = 32, 12, 7
        key = jax.random.PRNGKey(0)
        bins = jnp.sort(jax.random.uniform(key, (r, b + 2)), axis=-1)
        weights = jax.random.uniform(jax.random.PRNGKey(1), (r, b))

        out = sample_pdf(jax.random.PRNGKey(2), bins, weights, i, det=True)

        # independent numpy reference (renderer.py:214-253 semantics)
        w = np.asarray(weights) + 1e-5
        pdf = w / w.sum(-1, keepdims=True)
        cdf = np.concatenate([np.zeros((r, 1)), np.cumsum(pdf, -1)], axis=-1)
        u = np.broadcast_to(np.linspace(0, 1, i), (r, i))
        ref = np.empty((r, i))
        bn = np.asarray(bins)
        for rr in range(r):
            inds = np.searchsorted(cdf[rr], u[rr], side="right")
            below = np.maximum(inds - 1, 0)
            above = np.minimum(inds, b)
            c0, c1 = cdf[rr][below], cdf[rr][above]
            b0, b1 = bn[rr][below], bn[rr][above]
            denom = np.where(c1 - c0 < 1e-5, 1.0, c1 - c0)
            ref[rr] = b0 + (u[rr] - c0) / denom * (b1 - b0)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


class TestBF16Compute:
    def test_close_to_fp32(self):
        import dataclasses

        import numpy as np

        g32 = small_config()
        gbf = dataclasses.replace(g32, compute_dtype="bfloat16")
        p = g32.init(jax.random.PRNGKey(0))
        ws = jax.random.normal(jax.random.PRNGKey(1), (1, g32.num_ws, g32.w_dim)) * 0.3
        c = cam.canonical_camera()
        o32 = g32.synthesis(p, jax.random.PRNGKey(2), ws, c)
        obf = gbf.synthesis(p, jax.random.PRNGKey(2), ws, c)
        for k in ("image", "image_raw", "image_depth"):
            assert obf[k].dtype == jnp.float32
            rms = float(jnp.sqrt(jnp.mean(jnp.square(o32[k] - obf[k]))))
            assert rms < 0.05, f"{k} rms {rms}"

    def test_grads_fp32_finite(self):
        import dataclasses

        gbf = dataclasses.replace(small_config(), compute_dtype="bfloat16")
        p = gbf.init(jax.random.PRNGKey(0))
        ws = jnp.zeros((1, gbf.num_ws, gbf.w_dim))
        c = cam.canonical_camera()
        g = jax.grad(
            lambda pp: jnp.mean(gbf.synthesis(pp, jax.random.PRNGKey(1), ws, c)["image"])
        )(p)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(l.dtype == jnp.float32 for l in leaves)
        assert all(bool(jnp.isfinite(l).all()) for l in leaves)


class TestSharedPlanesBatch:
    def test_matches_per_camera_synthesis(self):
        import numpy as np

        g = small_config()
        p = g.init(jax.random.PRNGKey(0))
        ws = jax.random.normal(jax.random.PRNGKey(1), (1, g.num_ws, g.w_dim)) * 0.3
        cams = cam.canonical_camera(batch_size=3)
        cams = cams.at[1, 3].add(0.01).at[2, 7].add(-0.01)

        planes = g._planes_nhwc(p, ws)
        rng = jax.random.PRNGKey(2)
        out_b = g.synthesis_from_planes(p, rng, planes, ws, cams)

        ws3 = jnp.tile(ws, (3, 1, 1))
        planes3 = g._planes_nhwc(p, ws3)
        out_ref = g.synthesis_from_planes(p, rng, planes3, ws3, cams)
        for k in ("image", "image_raw", "image_depth"):
            np.testing.assert_allclose(
                np.asarray(out_b[k]), np.asarray(out_ref[k]), atol=2e-4,
                err_msg=k,
            )

    def test_want_sr_false(self):
        g = small_config()
        p = g.init(jax.random.PRNGKey(0))
        ws = jnp.zeros((1, g.num_ws, g.w_dim))
        cams = cam.canonical_camera(batch_size=2)
        planes = g._planes_nhwc(p, ws)
        out = g.synthesis_from_planes(p, jax.random.PRNGKey(1), planes, ws, cams,
                                      want_sr=False)
        assert "image" not in out
        assert out["image_depth"].shape[0] == 2
