"""SPMD multi-image inversion over a device mesh.

Strategy (the TPU redesign of the reference's one-image-per-GPU shell
fan-out): batch B images, give every image its OWN generator replica
(stage-2 tunes per-image weights, so G gets a leading image axis), and
shard the image axis across the mesh's 'data' dimension with
`shard_map`. Each device then runs an independent per-image optimization
step; the only cross-device communication is a `psum` for aggregate
metrics — exactly the collective footprint the problem has.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spi_tpu.criteria.l2_loss import l2_loss
from spi_tpu.criteria.lpips import LPIPS
from spi_tpu.models.triplane import TriPlaneGenerator


def data_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(devices, (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place a pytree with a leading batch axis sharded across the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batched_tuning_step(
    generator: TriPlaneGenerator,
    lpips: LPIPS,
    mesh: Mesh,
    axis: str = "data",
):
    """Build a jitted SPMD step: one reconstruction-gradient Adam-free SGD
    update for B images at once, B sharded over the mesh.

    Inputs of the returned fn:
      g_params_b : generator pytree with leading axis B (per-image replicas)
      lpips_params : replicated
      ws (B, L, C), images (B, 3, R, R), cameras (B, 25), rngs (B, 2)
    Returns: (updated g_params_b, mean loss across the mesh).
    """

    def per_image_step(g_params, lpips_params, ws, image, camera, rng):
        def loss_fn(p):
            out = generator.synthesis(
                p, rng, ws[None], camera[None], noise_mode="const"
            )
            img = out["image"]
            return l2_loss(img, image[None]) + lpips(lpips_params, img, image[None])

        loss, grads = jax.value_and_grad(loss_fn)(g_params)
        new_params = jax.tree_util.tree_map(
            lambda p, g: p - 3e-4 * g, g_params, grads
        )
        return new_params, loss

    def sharded_step(g_params_b, lpips_params, ws_b, images_b, cameras_b, rngs_b):
        new_params, losses = jax.vmap(
            per_image_step, in_axes=(0, None, 0, 0, 0, 0)
        )(g_params_b, lpips_params, ws_b, images_b, cameras_b, rngs_b)
        mean_loss = jax.lax.pmean(jnp.mean(losses), axis_name=axis)
        return new_params, mean_loss

    wrapped = jax.shard_map(
        sharded_step,
        mesh=mesh,
        in_specs=(P(axis), P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P()),
    )
    return jax.jit(wrapped)


def psum_metrics(mesh: Mesh, axis: str = "data"):
    """Moment-triple metric reduction (the TPU analog of
    training_stats._sync, eg3d/torch_utils/training_stats.py:245-266)."""

    def reduce(values):
        def body(v):
            triple = jnp.stack([jnp.ones_like(v), v, jnp.square(v)])
            return jax.lax.psum(triple, axis_name=axis)

        return jax.shard_map(
            lambda v: body(v), mesh=mesh, in_specs=P(axis), out_specs=P()
        )(values)

    return reduce


def check_replica_consistency(params_per_device):
    """TPU analog of misc.check_ddp_consistency (eg3d/torch_utils/
    misc.py:181-192): verify every device's replica of a params pytree
    matches device 0's bit-for-bit. `params_per_device` has a leading
    device axis on every leaf (e.g. from jax.device_get of a replicated
    array). Returns the list of mismatching leaf paths."""
    import numpy as np

    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(params_per_device):
        arr = np.asarray(leaf)
        if arr.ndim == 0:
            continue
        ref = arr[0]
        for d in range(1, arr.shape[0]):
            if not np.array_equal(ref, arr[d]):
                bad.append((jax.tree_util.keystr(path), d))
                break
    return bad
