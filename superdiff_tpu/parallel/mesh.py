"""Device mesh and sharding helpers.

The reference has **no** distributed code of any kind (SURVEY.md §2.4: single
process, single GPU, no DDP/NCCL). This module is the TPU-native capability
the north star mandates: a ``jax.sharding.Mesh`` over the slice, batch
sharded on the ``data`` axis, parameters replicated, gradient reduction
inserted by XLA (riding ICI) — plus a spare ``model`` axis so tensor-style
sharding can be layered on without re-plumbing callers.

Multi-host: call :func:`maybe_init_distributed` first on multi-host slices
(``jax.distributed.initialize``); single-host and CPU-simulated meshes work
without it.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_init_distributed() -> None:
    """Initialize jax.distributed on multi-host slices (no-op otherwise).

    Gated by ``SUPERDIFF_TPU_MULTIHOST=1`` (set by TPU VM launchers); safe
    to call unconditionally at CLI entry. On TPU pods
    ``jax.distributed.initialize()`` auto-detects coordinator/process
    topology from the TPU metadata; for other fabrics (or tests) the
    explicit triple can be passed via ``SUPERDIFF_TPU_COORDINATOR``,
    ``SUPERDIFF_TPU_NUM_PROCESSES`` and ``SUPERDIFF_TPU_PROCESS_ID``.
    Replaces nothing in the reference — it had no multi-host path
    (``src/slurm/submit_experiment.slurm:2`` is a 1-GPU job).
    """
    if os.environ.get("SUPERDIFF_TPU_MULTIHOST") != "1":
        return
    coord = os.environ.get("SUPERDIFF_TPU_COORDINATOR")
    if coord:
        nproc = os.environ.get("SUPERDIFF_TPU_NUM_PROCESSES")
        pid = os.environ.get("SUPERDIFF_TPU_PROCESS_ID")
        if nproc is None or pid is None:
            raise ValueError(
                "SUPERDIFF_TPU_COORDINATOR requires SUPERDIFF_TPU_NUM_"
                "PROCESSES and SUPERDIFF_TPU_PROCESS_ID to be set too")
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=int(nproc),
                                   process_id=int(pid))
    else:
        jax.distributed.initialize()


def make_mesh(num_devices: Optional[int] = None,
              model_parallelism: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ``(data, model)`` mesh over the first ``num_devices`` devices.

    ``model_parallelism=1`` (default) gives pure data parallelism — the
    deliverable for this model family (SURVEY.md §2.4); the model axis
    exists so attention/conv channel sharding can be enabled later without
    changing call sites.
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devs = devs[:num_devices]
    n = len(devs)
    if n % model_parallelism:
        raise ValueError(
            f"{n} devices not divisible by model_parallelism="
            f"{model_parallelism}")
    grid = np.asarray(devs).reshape(n // model_parallelism,
                                    model_parallelism)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis; rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch (pytree of arrays) sharded on the data axis.

    Single-process: a plain sharded ``device_put`` of the full batch.
    Multi-host (``jax.process_count() > 1``): ``batch`` is this process's
    LOCAL slice — 1/process_count of the global batch, produced by the
    DataModule's strided index shard — and is assembled into one global
    array via ``jax.make_array_from_process_local_data`` (each host
    uploads only its rows; the jitted step then sees the global batch).
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda a: jax.make_array_from_process_local_data(
                sh, np.asarray(a)), batch)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), batch)


def shard_sample(sample_fn, mesh: Mesh, with_logq: bool = False):
    """Jit a sampler with its batch sharded over the mesh's data axis.

    ``sample_fn(rng) -> x`` (or ``(x, logq)`` for SuperDiff, ``logq`` being
    ``(models, batch)``). Samplers are collective-free per sample — the scan
    partitions cleanly across the batch, each chip running its slice of
    every denoiser call; XLA needs only the out_shardings hint. SuperDiff
    log-densities are per-sample, so they shard with the batch too
    (SURVEY.md §5.8's TPU-native sharded-sampling mandate).
    """
    xs = batch_sharding(mesh)
    out_sh = (xs, NamedSharding(mesh, P(None, DATA_AXIS))) if with_logq \
        else xs
    return jax.jit(sample_fn, out_shardings=out_sh)
