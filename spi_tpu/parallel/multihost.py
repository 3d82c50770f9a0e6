"""Multi-host (multi-worker) execution.

The reference scales past one machine by hand-sharding the image list
(`dataset_block='i/N'`, spi/data/images_dataset.py:149-158) and
launching one process per GPU with CUDA_VISIBLE_DEVICES (README.md:52,
61); its GAN trainer uses torch.distributed NCCL
(eg3d/train.py subprocess spawn). The TPU-native equivalents:

- **Pod SPMD** (one logical program over all chips): call
  `initialize()` on every worker, build a global mesh with
  `global_data_mesh()`, and the existing `spmd_invert` / GAN
  `shard_map` programs run unchanged — XLA routes collectives over ICI
  within a slice and DCN across slices.
- **Embarrassing fan-out** (the reference's actual inversion pattern):
  `host_block()` gives each worker its `dataset_block` slice of the
  image worklist; no cross-host communication at all.

This module is exercised in CI only via `host_block` (CI is one
process); `initialize` is a thin wrapper over
`jax.distributed.initialize`, kept separate so the CLI entry points
stay importable without a coordinator.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the multi-worker runtime. On TPU pods (GKE/QR-managed) all
    arguments are discovered from the environment; pass them explicitly
    for manual bring-up. Must run before any other jax call."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_data_mesh(axis: str = "data"):
    """One-axis mesh over every chip in the job (all hosts). With
    jax.distributed initialized, jax.devices() is global; programs
    written with shard_map over this mesh (spmd_invert, gan training)
    scale to pods without modification."""
    from jax.sharding import Mesh

    import numpy as np

    return Mesh(np.asarray(jax.devices()), (axis,))


def host_block(n_hosts: int | None = None, host_id: int | None = None) -> str:
    """This worker's `dataset_block` string ('i/N', 1-based i) for
    embarrassing data-parallel inversion — the reference's shell-level
    sharding (images_dataset.py:149-158) derived from the process grid
    instead of hand-typed flags."""
    n = n_hosts if n_hosts is not None else jax.process_count()
    i = host_id if host_id is not None else jax.process_index()
    assert 0 <= i < n, (i, n)
    return f"{i + 1}/{n}"
