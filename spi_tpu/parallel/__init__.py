"""Device-mesh parallelism.

The reference's only parallelism is embarrassing data-parallel inversion
(one image per GPU process, shell-level sharding —
spi/data/images_dataset.py:149-158 + CUDA_VISIBLE_DEVICES) plus NCCL
all-reduce in the vendored GAN trainer (SURVEY.md §2.7). The TPU-native
equivalent is SPMD over a jax.sharding.Mesh: images batched along a
'data' axis with per-image generator replicas sharded alongside, and
XLA collectives (psum) for metric aggregation.
"""

from spi_tpu.parallel.mesh import (
    data_mesh,
    index_tree,
    replicate,
    shard_batch,
    spmd_invert,
    stack_trees,
)
from spi_tpu.parallel.multihost import (
    aggregate_metrics,
    host_work_stripe,
    work_stripe,
)

__all__ = [
    "data_mesh",
    "shard_batch",
    "replicate",
    "spmd_invert",
    "stack_trees",
    "index_tree",
    "aggregate_metrics",
    "host_work_stripe",
    "work_stripe",
]
