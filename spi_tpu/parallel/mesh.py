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


def stack_trees(trees):
    """Stack a list of same-structure pytrees along a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def index_tree(tree, i: int):
    """Slice image i out of a leading-batch-axis pytree."""
    return jax.tree_util.tree_map(lambda x: x[i], tree)


def spmd_invert(
    generator: TriPlaneGenerator,
    lpips: LPIPS,
    mesh: Mesh,
    proj_settings,
    coach_settings,
    box_cx=None,
    axis: str = "data",
):
    """Build THE jitted SPMD inversion program: the real stage-1
    projector `lax.scan` followed by the real stage-2 tuning
    `lax.while_loop`, vmapped over a leading image axis and sharded
    across the mesh's data dimension.

    This is the TPU-native replacement for the reference's shell-level
    fan-out (spi/data/images_dataset.py:149-158 `dataset_block` +
    one CUDA_VISIBLE_DEVICES process per shard, README.md:52,61): B
    images enter as one program, every image gets its own generator
    replica (stage 2 tunes per-image weights), and devices run their
    shard of images with zero cross-device communication — exactly the
    collective footprint the problem has.

    The stage-2 while_loop early-stops per image; under vmap the loop
    runs until every lane's cond is false, and finished lanes are exact
    no-ops (see coaches.body_fn `active` gating), so per-image results
    match the serial path bit-for-bit.

    Inputs of the returned fn (None where unused):
      g_params     : pretrained generator pytree (replicated)
      lpips_params, box_cx_params : replicated
      targets (B, 3, R, R), cameras (B, 25), w0s (B, 1|L, C),
      noise0s (B-leading noise tree), w_stds (B,),
      rng_projs (B, key), rng_tunes (B, key)  — the SAME per-image keys
        the serial InversionPipeline derives, so per-image results match
        the serial path exactly
      face_masks (B, 1, R, R) | None, landmarks (B, 68, 2) | None
    Returns per-image (B-leading): (w_pivot, stage-1 noise tree,
      tuned_g_params, steps_run, last_lpips, stage1 dists (B, num_steps)).
    """
    import dataclasses

    from spi_tpu.training import coaches, projectors
    from spi_tpu.utils.params import replace_noise

    # The windowed-splat backward (ops/plane_splat.py) accumulates into
    # a VMEM table across a sequential Pallas grid keyed on
    # program_id(0); under vmap the batching rule prepends a batch grid
    # dimension, which would break that accumulator. The vmapped SPMD
    # program keeps the XLA gather-VJP scatter.
    generator = dataclasses.replace(
        generator,
        rendering=dataclasses.replace(generator.rendering, plane_splat="xla"),
    )

    proj_run = projectors._build_project_fn(generator, lpips, proj_settings)
    tune_run = coaches._build_tune_fn(generator, lpips, coach_settings, box_cx)

    def per_image(g_params, lpips_params, box_cx_params, target, camera,
                  w0, noise0, w_std, rng_proj, rng_tune, face_mask, landmarks):
        w, noise, dists = proj_run(
            g_params, lpips_params, target, camera, w0, noise0, w_std, rng_proj
        )
        # Stage 2 renders with the stage-1 noise buffers substituted
        # (the reference mutates G's buffers in place during stage 1).
        g = replace_noise(g_params, noise)
        tuned, (steps, lp) = tune_run(
            g, g_params, lpips_params, box_cx_params,
            target, camera, w, face_mask, landmarks, rng_tune,
        )
        return w, noise, tuned, steps, lp, dists

    def sharded(g_params, lpips_params, box_cx_params, targets, cameras,
                w0s, noise0s, w_stds, rng_projs, rng_tunes, face_masks, landmarks):
        return jax.vmap(
            per_image,
            in_axes=(None, None, None, 0, 0, 0, 0, 0, 0, 0,
                     0 if face_masks is not None else None,
                     0 if landmarks is not None else None),
        )(g_params, lpips_params, box_cx_params, targets, cameras,
          w0s, noise0s, w_stds, rng_projs, rng_tunes, face_masks, landmarks)

    # check_vma=False: the program is embarrassingly parallel (no
    # collectives; every image's scan/while_loop is independent), and the
    # varying-manual-axes checker rejects benign literal constants inside
    # lax.cond/while_loop carries (e.g. rng fold_in step counters) that
    # mix replicated and per-shard values. Correctness is covered by the
    # serial-vs-SPMD parity test in tests/test_parallel.py.
    wrapped = jax.shard_map(
        sharded,
        mesh=mesh,
        in_specs=(P(), P(), P()) + (P(axis),) * 9,
        out_specs=(P(axis),) * 6,
        check_vma=False,
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
