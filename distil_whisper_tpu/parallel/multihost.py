"""Multi-host helpers: distributed init + per-host data sharding.

The reference only calls ``jax.distributed.initialize()`` in one conversion
script (convert_train_state_to_hf.py:50); here it is first-class: every driver
can run on a multi-host TPU slice, with each host feeding its local shard of
the batch and GSPMD assembling global arrays
(``jax.make_array_from_process_local_data``).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def maybe_initialize_distributed(coordinator_address: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None,
                                 force: bool = False) -> bool:
    """Initialise jax.distributed when running multi-process (idempotent).

    On classic TPU pod VMs the pod is detected via TPU_WORKER_HOSTNAMES; on
    other orchestrators (GKE, slurm, ...) that variable is absent, so pass
    the arguments, set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID, or pass ``force=True`` (the CLIs' ``--distributed``):
    with ``force`` the function always attempts initialisation (letting
    ``jax.distributed`` auto-detect the cluster) and RAISES if the job comes
    up single-process — a misconfigured pod fails fast instead of silently
    training on one host.
    """
    import logging
    log = logging.getLogger("distil_whisper_tpu")
    if jax.process_count() > 1:
        return True  # already initialised
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    explicit = coordinator_address is not None
    in_tpu_pod = os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0
    if not (explicit or in_tpu_pod or force):
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes or _int_env("JAX_NUM_PROCESSES"),
            process_id=process_id or _int_env("JAX_PROCESS_ID"))
    except (RuntimeError, ValueError) as e:
        if jax.process_count() > 1:
            return True
        if force:
            raise RuntimeError(
                "--distributed was set but jax.distributed failed to "
                f"initialize ({e}); set JAX_COORDINATOR_ADDRESS / "
                "JAX_NUM_PROCESSES / JAX_PROCESS_ID (or run on a TPU pod "
                "with auto-detection)") from e
        log.warning("jax.distributed initialisation failed (%s); "
                    "continuing single-process", e)
        return False
    if force and jax.process_count() <= 1:
        raise RuntimeError(
            "--distributed was set but the job initialised with "
            "process_count=1 — the cluster env is not visible to this "
            "process (misconfigured pod/orchestrator)")
    log.info("jax.distributed initialised: process %d/%d, %d local + %d "
             "global devices", jax.process_index(), jax.process_count(),
             len(jax.local_devices()), len(jax.devices()))
    return True


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def host_local_batch_to_global(batch: Any, mesh) -> Any:
    """Assemble a global batch from per-host local shards.

    Each process holds ``global_batch / process_count`` rows; the result is a
    global jax.Array sharded over the mesh's 'data' axis.  Single-process
    setups fall back to a plain device_put.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        sharding = NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(put, batch)


def gather_rows(x: Any) -> np.ndarray:
    """Fetch a (possibly non-addressable) global array as numpy on every host.

    Single-process: a plain device_get.  Multi-process: an all-gather so each
    host sees the full batch (the GSPMD analogue of the reference's
    ``accelerator.gather_for_metrics``, run_pseudo_labelling.py:893-895).
    """
    if jax.process_count() == 1:
        return np.asarray(jax.device_get(x))
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def global_row_positions(mesh, local_rows: int) -> np.ndarray:
    """Global-row index of each of this host's local feed rows.

    ``host_local_batch_to_global`` places each process's rows wherever that
    process's devices sit along the mesh's 'data' axis — which is NOT
    guaranteed to be process-contiguous in process-index order on every TPU
    pod topology (``mesh_utils.create_device_mesh`` may reorder devices for
    ICI locality).  Slicing a ``gather_rows`` result by
    ``process_index * local_rows`` silently pairs rows across hosts wrongly
    on such meshes.  This helper measures the true mapping by pushing a tag
    vector through the identical placement path: ``result[j]`` is the global
    row index where this host's local row ``j`` landed, so
    ``gather_rows(global_out)[global_row_positions(mesh, local_rows)]``
    recovers exactly the rows this host fed, in feed order.

    Deterministic per (mesh, local_rows) — compute once, reuse per batch.
    """
    pi = jax.process_index()
    n = local_rows * jax.process_count()
    tags = (np.arange(local_rows, dtype=np.int32)
            + pi * local_rows)[:, None]
    gids = gather_rows(host_local_batch_to_global(tags, mesh)).ravel()
    inv = np.empty(n, np.int64)
    inv[gids] = np.arange(n)  # inv[tag] = global position of that tag
    return inv[pi * local_rows:(pi + 1) * local_rows]


def process_local_slice(n_items: int) -> slice:
    """Which slice of a globally-ordered dataset this host should feed."""
    per = n_items // max(jax.process_count(), 1)
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
