"""Tests for the domain-interpolation video tool
(cli/generate_edit_videos.py ~ ZSSGAN/generate_videos.py)."""

import os

import numpy as np

import jax

from spi_tpu.cli import generate_edit_videos as gev
from spi_tpu.models.stylegan2 import Generator


def test_interpolate_forward_backward():
    src = np.zeros((1, 2, 4), np.float32)
    tgt = np.ones((1, 2, 4), np.float32)
    alphas = np.linspace(0, 1, 5)
    frames = gev.interpolate_forward_backward(src, tgt, alphas, dwell=3)
    assert len(frames) == 5 + 3 + 5
    np.testing.assert_allclose(frames[0], src)
    np.testing.assert_allclose(frames[5], tgt)  # dwell
    np.testing.assert_allclose(frames[-1], src)


def test_project_code_boundary_broadcast():
    lat = np.zeros((1, 3, 8), np.float32)
    boundary = np.ones((1, 8), np.float32)
    out = gev.project_code(lat, boundary, 2.0)
    assert out.shape == (1, 3, 8)
    np.testing.assert_allclose(out, 2.0)


def test_merge_grid_shapes():
    k = 4
    frames = [[np.zeros((8, 8, 3), np.uint8)] * 3 for _ in range(k)]
    combined = gev.merge_grid(frames)
    assert len(combined) == 3
    assert combined[0].shape == (16, 16, 3)


def test_render_frames_blended_vs_single():
    gen = Generator(
        z_dim=16, c_dim=0, w_dim=16, img_resolution=16, img_channels=3,
        channel_base=256, channel_max=32,
    )
    p0 = gen.init(jax.random.PRNGKey(0))
    p1 = gen.init(jax.random.PRNGKey(1))
    w = np.asarray(
        jax.random.normal(jax.random.PRNGKey(2), (1, gen.num_ws, gen.w_dim))
    )
    latents = [w] * 4
    single = gev.render_frames(gen, [p0], latents)
    assert len(single) == 4 and single[0].shape == (16, 16, 3)
    blended = gev.render_frames(gen, [p0, p1], latents)
    assert len(blended) == 4
    # blend alpha 0 frame == pure p0 frame
    np.testing.assert_array_equal(blended[0], single[0])
    # later frames use interpolated weights -> differ from p0's render
    assert (blended[-1] != single[-1]).any()


def test_main_end_to_end(tmp_path):
    from spi_tpu.utils.checkpoint import save_pytree

    gen = Generator(
        z_dim=16, c_dim=0, w_dim=16, img_resolution=16, img_channels=3,
        channel_base=32768 // 2, channel_max=32,
    )
    params = gen.init(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "domain.npz")
    save_pytree(ckpt, params)
    lat = str(tmp_path / "latent.npy")
    np.save(lat, np.random.default_rng(0).normal(
        size=(1, gen.num_ws, 16)).astype(np.float32))
    out = str(tmp_path / "vid")

    gev.main([
        "--size", "16", "--channel_multiplier", "1", "--channel_max", "32",
        "--latent_dim", "16",
        "--ckpt", ckpt, "--out_dir", out,
        "--source_latent", lat, "--unedited_frames", "3", "-f",
    ])
    sub = os.path.join(out, "0")
    wrote = [f for f in os.listdir(sub) if f.startswith("out")]
    assert wrote, os.listdir(sub)
    assert any(
        f.startswith("combined") or f.startswith("out") for f in os.listdir(out)
    )
