"""Multi-host (multi-process) scale-out for the inversion pipeline.

The reference scales past one GPU by hand: the user launches N
processes, each with `CUDA_VISIBLE_DEVICES=i` and `--dataset_block i/N`
(spi/data/images_dataset.py:149-158, README.md:52,61), and each process
works its stripe of the image list with zero communication. The
TPU-native equivalent formalizes the same embarrassing parallelism over
JAX's multi-process runtime:

- `initialize()` wraps `jax.distributed.initialize` (DCN control plane;
  no-op for single-process runs), after which `jax.devices()` spans all
  hosts and `jax.process_index()/process_count()` identify this host.
- `host_work_stripe()` reproduces `dataset_block` semantics from the
  process topology: host i of N takes stripe i/N of the worklist. Work
  distribution stays host-side (DCN), exactly mirroring the reference's
  shell-level sharding — per-image optimization needs no cross-host
  collectives (SURVEY.md §5 "Distributed communication backend").
- `aggregate_metrics()` reduces per-host metric means for the final
  metric_log.txt (base_coach.py:185-198 averages across images) with
  one `process_allgather` — the only cross-host communication in the
  whole pipeline, and it rides DCN once per run, not per step.

Within each host, images are further batched across that host's local
chips by `parallel.mesh.spmd_invert` (ICI). So the full scale-out story
is: DCN stripes the worklist across hosts; ICI shards a batch across a
host's chips; one program per host.
"""

from __future__ import annotations

from typing import Sequence


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize JAX's multi-process runtime.

    With no arguments, relies on the cluster environment (TPU pods set
    everything automatically; jax.distributed.initialize() reads it).
    Returns True if a multi-process runtime is active after the call.
    Safe to call in single-process runs: initialization errors in a
    1-process context leave JAX in its default single-process state.
    """
    import jax

    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            jax.distributed.initialize()
    except (RuntimeError, ValueError) as e:
        if jax.process_count() == 1:
            return False
        raise RuntimeError(f"jax.distributed.initialize failed: {e}") from e
    return jax.process_count() > 1


def work_stripe(n_items: int, index: int, total: int) -> list[int]:
    """Stripe index/total of range(n_items), 0-based, with the exact
    block arithmetic of the reference's `dataset_block`
    (images_dataset.py:149-158: block = n // total + 1, 1-based slicing
    [(i-1)*block : i*block]) so a multi-host run partitions a worklist
    identically to the reference's multi-process recipe."""
    assert 0 <= index < total, (index, total)
    block = n_items // total + 1
    start = min(index * block, n_items)
    end = min((index + 1) * block, n_items)
    return list(range(start, end))


def host_work_stripe(n_items: int) -> list[int]:
    """This host's stripe of an n_items worklist, from the process
    topology (process_index/process_count)."""
    import jax

    return work_stripe(n_items, jax.process_index(), jax.process_count())


def host_block(total: int | None = None, index: int | None = None) -> str:
    """This host's `dataset_block` string ("i/N", 1-based — the exact
    CLI argument of the reference's multi-process recipe,
    run_inversion.py:40 + images_dataset.py:149-158), derived from the
    process topology when not given. Plug it straight into
    PTIDataset(dataset_block=...) so each host loads only its stripe."""
    import jax

    if total is None:
        total = jax.process_count()
    if index is None:
        index = jax.process_index()
    assert 0 <= index < total, (index, total)
    return f"{index + 1}/{total}"


def global_data_mesh(axis: str = "data"):
    """1-D mesh over every device across ALL hosts (jax.devices() spans
    the whole job after initialize()); per-host batches placed with
    mesh.shard_batch land shards on local chips while the compiled
    program is identical on every host."""
    import jax
    from jax.sharding import Mesh

    return Mesh(jax.devices(), (axis,))


# The pipeline's per-image metric names (utils/metrics.py Metric.run +
# the mirrored variants added by InversionPipeline). Fixing the list
# here keeps the allgathered vector layout identical on every host —
# required for the collective below to line up even when a host
# processed zero images (and so has no local metric keys at all).
METRIC_NAMES = ("id", "id_m", "l2", "l2_m", "lpips", "lpips_m")


def aggregate_metrics(metrics: dict[str, float], counts_key: str = "n",
                      names: Sequence[str] = METRIC_NAMES):
    """All-gather per-host metric sums and combine into global means.

    `metrics` maps name -> per-host SUM over that host's images, plus
    `counts_key` -> number of images this host processed. Returns
    name -> global mean. Single-process: returns local means.

    EVERY process in the job must call this (it is a collective), with
    the same `names` — the vector layout is fixed by `names`, not by the
    local dict, so hosts with empty work stripes (metrics={} or just
    {counts_key: 0}) participate safely with zero-filled entries.
    """
    import jax
    import numpy as np

    names = tuple(names)
    # float32: JAX downcasts f64 anyway when x64 is disabled; be explicit
    # so every host ships the same dtype through process_allgather.
    local = np.array(
        [metrics.get(counts_key, 0.0)] + [metrics.get(k, 0.0) for k in names],
        np.float32)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        gathered = np.asarray(
            multihost_utils.process_allgather(local)
        )  # (n_processes, 1 + len(names))
        total = gathered.sum(axis=0)
    else:
        total = local
    n = max(total[0], 1.0)
    return {k: float(total[1 + i] / n) for i, k in enumerate(names)}
