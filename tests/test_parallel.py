"""Multi-device SPMD tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spi_tpu.criteria.lpips import LPIPS
from spi_tpu.models.rendering.renderer import RenderingOptions
from spi_tpu.models.triplane import TriPlaneGenerator
from spi_tpu.parallel.mesh import (
    data_mesh,
    index_tree,
    shard_batch,
    spmd_invert,
    stack_trees,
)
from spi_tpu.training import coaches, projectors
from spi_tpu.utils.camera import canonical_camera
from spi_tpu.utils.checkpoint import load_pytree, save_pytree
from spi_tpu.utils.params import init_noise_like, replace_noise


@pytest.fixture(scope="module")
def tiny():
    g = TriPlaneGenerator(
        z_dim=16, c_dim=25, w_dim=16, img_resolution=128,
        backbone_resolution=16, neural_rendering_resolution=8,
        rendering=RenderingOptions(depth_resolution=3, depth_resolution_importance=3),
        sr_variant="SuperresolutionHybrid2X", channel_base=512, channel_max=32,
    )
    return g, g.init(jax.random.PRNGKey(0))


def test_eight_devices_visible():
    assert len(jax.devices()) >= 8


def _spmd_inputs(g, g_params, b):
    """Batched inputs for spmd_invert: b images with per-image keys."""
    key = jax.random.PRNGKey(7)
    ki, kr = jax.random.split(key)
    targets = jnp.tanh(
        jax.random.normal(ki, (b, 1, 3, g.img_resolution, g.img_resolution))
    )
    cameras = jnp.tile(canonical_camera()[None], (b, 1, 1))
    w_avg, w_std = projectors.compute_w_stats(g, g_params, canonical_camera(), 4)
    w0s = jnp.tile(jnp.tile(w_avg, (1, g.num_ws, 1))[None], (b, 1, 1, 1))
    keys = jax.random.split(kr, 2 * b + 1)
    noise0s = stack_trees([init_noise_like(keys[i], g_params) for i in range(b)])
    rng_projs = jnp.stack([keys[b + i] for i in range(b)])
    rng_tunes = jax.random.split(keys[2 * b], b)
    w_stds = jnp.full((b,), w_std, jnp.float32)
    return targets, cameras, w0s, noise0s, w_stds, rng_projs, rng_tunes


def test_spmd_invert_matches_serial(tiny):
    """THE SPMD multi-image inversion program (stage-1 scan + stage-2
    while_loop, vmapped over images, image axis sharded over the mesh)
    produces per-image results matching the serial projector+coach path.

    Runs in the DEFAULT suite (2 devices, 2 images, 2+2 steps) so the
    flagship parallel path is never deselected; depth_resolution=3 also
    keeps the degenerate sample_pdf guard covered by default.
    """
    g, g_params = tiny
    lpips = LPIPS()
    lpips_params = lpips.init(jax.random.PRNGKey(1))
    b = 2
    mesh = data_mesh(2)
    proj_settings = projectors.ProjectorSettings(
        mode="mir", num_steps=2, w_avg_samples=4
    )
    coach_settings = coaches.CoachSettings(num_steps=2, lpips_threshold=-1.0)
    targets, cameras, w0s, noise0s, w_stds, rng_projs, rng_tunes = _spmd_inputs(
        g, g_params, b
    )

    run = spmd_invert(g, lpips, mesh, proj_settings, coach_settings)
    w_b, noise_b, g_b, steps_b, lp_b, dists_b = run(
        g_params, lpips_params, None,
        shard_batch(mesh, targets), shard_batch(mesh, cameras),
        shard_batch(mesh, w0s), shard_batch(mesh, noise0s),
        shard_batch(mesh, w_stds), shard_batch(mesh, rng_projs),
        shard_batch(mesh, rng_tunes), None, None,
    )
    assert w_b.shape[0] == b
    assert np.all(np.isfinite(np.asarray(lp_b)))
    assert np.all(np.asarray(steps_b) == coach_settings.num_steps)

    # Serial oracle for image 1: the exact per-image program.
    proj_run = projectors._build_project_fn(g, lpips, proj_settings)
    tune_run = coaches._build_tune_fn(g, lpips, coach_settings, None)
    i = 1
    w, noise, dists = proj_run(
        g_params, lpips_params, targets[i], cameras[i], w0s[i],
        index_tree(noise0s, i), w_stds[i], rng_projs[i],
    )
    tuned, (steps, lp) = tune_run(
        replace_noise(g_params, noise), g_params, lpips_params, None,
        targets[i], cameras[i], w, None, None, rng_tunes[i],
    )
    np.testing.assert_allclose(np.asarray(w_b[i]), np.asarray(w), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(lp_b[i]), np.asarray(lp), rtol=2e-3, atol=2e-4
    )
    serial_leaf = jax.tree_util.tree_leaves(tuned)[0]
    spmd_leaf = jax.tree_util.tree_leaves(index_tree(g_b, i))[0]
    np.testing.assert_allclose(
        np.asarray(spmd_leaf), np.asarray(serial_leaf), rtol=2e-3, atol=2e-4
    )


@pytest.mark.slow
def test_spmd_invert_eight_images_eight_devices(tiny):
    """One SPMD program inverts 8 images across all 8 mesh devices."""
    g, g_params = tiny
    lpips = LPIPS()
    lpips_params = lpips.init(jax.random.PRNGKey(1))
    b = 8
    mesh = data_mesh(8)
    proj_settings = projectors.ProjectorSettings(
        mode="mir", num_steps=2, w_avg_samples=4
    )
    coach_settings = coaches.CoachSettings(num_steps=2, lpips_threshold=-1.0)
    targets, cameras, w0s, noise0s, w_stds, rng_projs, rng_tunes = _spmd_inputs(
        g, g_params, b
    )
    run = spmd_invert(g, lpips, mesh, proj_settings, coach_settings)
    w_b, noise_b, g_b, steps_b, lp_b, _ = run(
        g_params, lpips_params, None,
        shard_batch(mesh, targets), shard_batch(mesh, cameras),
        shard_batch(mesh, w0s), shard_batch(mesh, noise0s),
        shard_batch(mesh, w_stds), shard_batch(mesh, rng_projs),
        shard_batch(mesh, rng_tunes), None, None,
    )
    assert w_b.shape[0] == b
    assert np.all(np.isfinite(np.asarray(lp_b)))
    some = jax.tree_util.tree_leaves(g_b)[0]
    assert some.shape[0] == b
    # Images received different targets -> tuned replicas differ. Check
    # across ALL leaves: individual leaves can legitimately be identical
    # (e.g. mapping params get zero gradient when tuning from a fixed
    # w-pivot, so the masked Adam update leaves them untouched).
    assert any(
        not np.allclose(np.asarray(leaf[0]), np.asarray(leaf[-1]))
        for leaf in jax.tree_util.tree_leaves(g_b)
    ), "all tuned replicas identical across images"


def test_checkpoint_roundtrip(tmp_path, tiny):
    g, params = tiny
    path = str(tmp_path / "ckpt.npz")
    save_pytree(path, {"G": params, "w": jnp.ones((1, g.num_ws, g.w_dim))})
    loaded = load_pytree(path, like={"G": params, "w": jnp.ones((1, g.num_ws, g.w_dim))})
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(loaded["G"])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_check_replica_consistency():
    import numpy as np

    from spi_tpu.parallel.mesh import check_replica_consistency

    good = {"a": np.ones((4, 3)), "b": {"c": np.zeros((4, 2, 2))}}
    assert check_replica_consistency(good) == []
    bad = {"a": np.ones((4, 3))}
    bad["a"][2, 1] = 5.0
    out = check_replica_consistency(bad)
    assert len(out) == 1 and out[0][1] == 2


def test_host_block():
    from spi_tpu.parallel.multihost import global_data_mesh, host_block

    assert host_block(4, 0) == "1/4"
    assert host_block(4, 3) == "4/4"
    # single-process CI: derives 1/1 from jax.process_*
    assert host_block() == "1/1"
    mesh = global_data_mesh()
    assert mesh.devices.size == len(jax.devices())


class TestMultihost:
    def test_work_stripe_matches_reference_block_arithmetic(self):
        """Mirror images_dataset.py:149-158: block = n//total + 1,
        stripe i covers [(i)*block, (i+1)*block) 0-based."""
        from spi_tpu.parallel.multihost import work_stripe

        for n in (1, 7, 8, 9, 100):
            for total in (1, 2, 3, 4, 8):
                stripes = [work_stripe(n, i, total) for i in range(total)]
                flat = [i for s in stripes for i in s]
                # full cover, no overlap, order preserved
                assert flat == list(range(n)), (n, total, stripes)
                block = n // total + 1
                for i, s in enumerate(stripes):
                    ref = list(range(n))[i * block:(i + 1) * block]
                    assert s == ref, (n, total, i)

    def test_host_work_stripe_single_process(self):
        from spi_tpu.parallel.multihost import host_work_stripe

        assert host_work_stripe(5) == [0, 1, 2, 3, 4]

    def test_aggregate_metrics_single_process(self):
        from spi_tpu.parallel.multihost import aggregate_metrics

        out = aggregate_metrics({"n": 4, "l2": 2.0, "lpips": 1.0})
        # Fixed METRIC_NAMES layout: missing names come back zero-filled
        # so every host's allgathered vector lines up.
        assert out["l2"] == 0.5 and out["lpips"] == 0.25
        assert out["id"] == 0.0 and out["l2_m"] == 0.0
        # Zero-work host: must still be callable with an empty dict.
        empty = aggregate_metrics({})
        assert set(empty) == {"id", "id_m", "l2", "l2_m", "lpips", "lpips_m"}
        assert all(v == 0.0 for v in empty.values())
