"""Multi-process / multi-host launch (SURVEY §5 distributed row).

The reference scales by Lightning spawning one process per GPU under DDP
(main.py:66,104,129-131). The TPU equivalent is one process per HOST, each
owning its local chips, joined into one global device mesh:

    OBJCAVIT_COORDINATOR=host0:1234 \
    OBJCAVIT_NUM_PROCESSES=4 OBJCAVIT_PROCESS_ID=<p> python main.py -c cfg

``initialize_distributed()`` (called from main.py before any backend use)
reads that env — or explicit kwargs — and runs ``jax.distributed.initialize``;
``parallel.make_mesh`` then builds the mesh over the GLOBAL device list and
``shard_host_local_batch`` assembles global batches from per-process local
shards via ``jax.make_array_from_process_local_data``. On TPU pod slices
launched through the TPU runtime, jax auto-detects coordinator/process
topology and the env is unnecessary — leave it unset and
``jax.distributed.initialize()`` is still safe to call with no args there,
but we deliberately no-op instead: single-host (the reference's only tested
regime) must not pay a coordination-service round trip.

Semantics note (docs/MIGRATION.md "DDP recipe mapping"): the GLOBAL batch
stays ``basic.batch_size`` regardless of process/chip count — each process
loads rows ``[process_id::process_count]`` of every global batch
(DistributedSampler interleave). A reference N-GPU DDP run has global batch
``batch_size x N``; reproduce it here by setting
``basic.batch_size = ref_batch_size * N``.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

from objcavit_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)

ENV_COORDINATOR = "OBJCAVIT_COORDINATOR"
ENV_NUM_PROCESSES = "OBJCAVIT_NUM_PROCESSES"
ENV_PROCESS_ID = "OBJCAVIT_PROCESS_ID"


def resolve_distributed_args(env: Any = None) -> dict | None:
    """Env -> jax.distributed.initialize kwargs, or None for single-process.

    All three variables must be set together; a partial set is a
    configuration error and raises instead of silently running single-host.
    """
    env = os.environ if env is None else env
    raw = {
        "coordinator_address": env.get(ENV_COORDINATOR),
        "num_processes": env.get(ENV_NUM_PROCESSES),
        "process_id": env.get(ENV_PROCESS_ID),
    }
    n_set = sum(v is not None for v in raw.values())
    if n_set == 0:
        return None
    if n_set < 3:
        missing = [k for k, v in raw.items() if v is None]
        raise ValueError(
            f"partial multi-process config: set {ENV_COORDINATOR}, "
            f"{ENV_NUM_PROCESSES} and {ENV_PROCESS_ID} together "
            f"(missing: {missing})"
        )
    args = {
        "coordinator_address": raw["coordinator_address"],
        "num_processes": int(raw["num_processes"]),
        "process_id": int(raw["process_id"]),
    }
    if not 0 <= args["process_id"] < args["num_processes"]:
        raise ValueError(
            f"process_id {args['process_id']} outside "
            f"[0, {args['num_processes']})"
        )
    return args


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Join the multi-process run described by explicit args or the
    OBJCAVIT_* env. Must run before the first backend use (jax.devices()).
    Returns True when a distributed service was initialised, False on the
    degenerate single-process path (no env, no args) — which is a strict
    no-op, so existing single-host flows are untouched.
    """
    if coordinator_address is not None:
        args = {
            "coordinator_address": coordinator_address,
            "num_processes": int(num_processes),
            "process_id": int(process_id),
        }
    else:
        args = resolve_distributed_args()
    if args is None:
        return False
    import jax

    if os.environ.get("OBJCAVIT_CPU_GLOO"):
        # CPU multi-process testing (scripts/launch_multiprocess.py
        # --cpu-devices): cross-process CPU collectives need the gloo
        # backend configured before the first backend use; the platform
        # switch goes through jax.config because a site-level jax preimport
        # can make the JAX_PLATFORMS env var too late
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(**args)
    return True


def is_main_process() -> bool:
    """True on the process that owns run-dir writes (checkpoints,
    validation_output.txt, TensorBoard) — host 0, or always in a
    single-process run. The reference's Lightning rank-zero semantics."""
    import jax

    return jax.process_index() == 0


def process_local_indices(
    idxs: np.ndarray, process_id: int, process_count: int
) -> np.ndarray:
    """This process's rows of one GLOBAL batch: the [p::P] interleave
    (torch DistributedSampler semantics, what Lightning DDP uses for the
    reference's loaders). Disjoint and jointly covering across processes."""
    return idxs[process_id::process_count]


def shard_host_local_batch(mesh, batch: Any) -> Any:
    """Per-process data feeding: every process passes ITS OWN local shard
    (``global_rows / process_count`` leading rows, the process_local_indices
    interleave) and gets back the same global batch-sharded jax.Arrays the
    single-process ``shard_batch`` produces.

    Leaves whose global leading dim would not divide the mesh's data axis
    are treated as replicated — then every process must pass the SAME
    full-size array (mirrors shard_batch's replication fallback).
    """
    import jax

    pc = jax.process_count()
    if pc == 1:
        return shard_batch(mesh, batch)
    n_data = mesh.shape[DATA_AXIS]
    split = batch_sharding(mesh)
    repl = replicated_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1 and (x.shape[0] * pc) % n_data == 0:
            global_shape = (x.shape[0] * pc,) + x.shape[1:]
            return jax.make_array_from_process_local_data(
                split, x, global_shape
            )
        return jax.make_array_from_process_local_data(repl, x, x.shape)

    return jax.tree.map(put, batch)
