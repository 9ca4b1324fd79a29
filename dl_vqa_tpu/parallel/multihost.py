"""Multi-host (multi-process / DCN) scale-out tier.

The reference is hard-pinned to a single GPU
(``/root/reference/main.py:23`` sets ``CUDA_VISIBLE_DEVICES="0"``; no
``torch.distributed`` anywhere — SURVEY.md §2 'Parallelism strategies').
Within one process this framework already scales over ICI via the
('data', 'model', 'stage') mesh (:mod:`dl_vqa_tpu.parallel.mesh`). This
module adds the second tier the TPU way: several coordinated *processes*
(one per TPU host / slice), each seeing only its local chips, jointly
executing one global SPMD program. Gradient all-reduce crosses hosts
over DCN while tensor/pipeline axes stay inside each host's ICI domain —
``jax.devices()`` orders devices by process and the mesh keeps ``data``
outermost, so ``data`` is the only axis that straddles process
boundaries when each host holds ``model * stage`` devices.

Contract (the standard JAX multi-controller recipe):

* every process runs the SAME program (``python main.py ...``) with the
  coordination env vars set (see :func:`maybe_initialize`);
* meshes are built over ``jax.devices()`` — the GLOBAL device list;
* each process feeds only its own rows of every global batch:
  :func:`process_batch_slice` derives the contiguous row block this
  process owns under the batch sharding, ``Batcher(process_slice=...)``
  yields exactly those rows (the shuffle order is seed-shared, so all
  processes agree on the global batch composition), and
  ``pipeline._put`` assembles the global array with
  ``jax.make_array_from_process_local_data``;
* the jitted steps are UNCHANGED: XLA's SPMD partitioner inserts the
  cross-host collectives (DCN on pods; gloo on the CPU test fabric);
* metric scalars come out fully replicated, so every process may
  ``float()`` them, but only process 0 writes logs and checkpoints.

Validated with real multi-process coordination in
``tests/test_multihost.py``: two gloo-linked CPU processes with 4
virtual devices each run the full Batcher -> prefetch -> fused-train-step
-> eval pipeline and match the single-process 8-device run per step.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

__all__ = [
    "maybe_initialize",
    "initialize",
    "active",
    "is_coordinator",
    "barrier",
    "process_batch_slice",
    "process_dim0_block",
]

# Env names follow jax.distributed.initialize's keyword arguments. On
# managed platforms (Cloud TPU pods, SLURM, GKE) jax auto-detects and
# none of these are needed; set all three for manual launches.
_ENV_COORD = "JAX_COORDINATOR_ADDRESS"
_ENV_NPROC = "JAX_NUM_PROCESSES"
_ENV_PID = "JAX_PROCESS_ID"


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` pass-through (idempotent).

    Must run before the first backend query (``jax.devices()`` etc.) or
    the process will have initialized a single-process backend already.
    """
    # jax's own re-init errors vary by version ("should only be called
    # once", "must be called before any JAX calls") — ask, don't parse.
    if jax.distributed.is_initialized():
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def maybe_initialize(log=None) -> bool:
    """Join the multi-process cluster iff one is configured; return
    whether this run is multi-process.

    Manual launches set ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES``
    / ``JAX_PROCESS_ID`` (every process the same address, its own id);
    managed platforms need only ``JAX_COORDINATOR_ADDRESS=auto`` to opt in
    (jax's cluster plugins fill in the rest). Single-process runs leave
    the env unset and this is a no-op returning False.
    """
    coord = os.environ.get(_ENV_COORD, "")
    if not coord:
        return jax.process_count() > 1  # e.g. initialized by the caller
    if coord == "auto":
        # jax.distributed.initialize(coordinator_address=None) falls back
        # to the JAX_COORDINATOR_ADDRESS env var, so the literal "auto"
        # must not be visible while the cluster plugins auto-detect.
        del os.environ[_ENV_COORD]
        try:
            initialize()
        finally:
            os.environ[_ENV_COORD] = coord
    else:
        # Partial manual config is legal: managed platforms can supply
        # only the address and let jax auto-detect the process layout.
        nproc = os.environ.get(_ENV_NPROC)
        pid = os.environ.get(_ENV_PID)
        initialize(
            coordinator_address=coord,
            num_processes=int(nproc) if nproc else None,
            process_id=int(pid) if pid else None,
        )
    if log is not None:
        log(
            f"multihost: process {jax.process_index()}/{jax.process_count()}"
            f" with {jax.local_device_count()} local of"
            f" {jax.device_count()} global devices"
        )
    return jax.process_count() > 1


def active() -> bool:
    return jax.process_count() > 1


def is_coordinator() -> bool:
    """True on the process that owns logging/checkpoint writes."""
    return jax.process_index() == 0


def barrier(name: str) -> None:
    """Cross-process rendezvous (no-op in single-process runs). Used to
    sequence one-time filesystem work: the coordinator builds the offline
    caches, everyone else proceeds only after this returns."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def process_batch_slice(sharding, global_batch_size: int) -> Optional[slice]:
    """The contiguous block of rows this process must supply for a
    ``[global_batch_size, ...]`` array placed with ``sharding``.

    Derived from the sharding itself (not assumed): the union of the
    dim-0 index ranges of this process's addressable shards. Raises if
    that union is not contiguous — the mesh construction in
    :func:`dl_vqa_tpu.parallel.make_mesh` keeps ``data`` outermost over
    the process-ordered ``jax.devices()`` list precisely so it is.

    Returns ``None`` in single-process runs (feed full batches).
    """
    if jax.process_count() == 1:
        return None
    return process_dim0_block(sharding, (global_batch_size,))


def process_dim0_block(sharding, global_shape) -> slice:
    """The contiguous dim-0 row block this process owns for an array of
    ``global_shape`` placed with ``sharding`` — the single source of the
    "my rows" derivation used by the batch feeder (above) and the
    device-resident image-table uploads (:mod:`dl_vqa_tpu.data.
    device_cache`). Derived from the sharding itself: the union of the
    dim-0 index ranges of this process's addressable shards. Raises if
    that union is not contiguous — :func:`dl_vqa_tpu.parallel.make_mesh`
    keeps ``data`` outermost over the process-ordered ``jax.devices()``
    list precisely so it is."""
    n = int(global_shape[0])
    index_map = sharding.addressable_devices_indices_map(tuple(global_shape))
    starts = set()
    stops = set()
    rows = np.zeros(n, dtype=bool)
    for idx in index_map.values():
        s = idx[0]
        start = s.start or 0
        stop = s.stop if s.stop is not None else n
        starts.add(start)
        stops.add(stop)
        rows[start:stop] = True
    lo = min(starts)
    hi = max(stops)
    if int(rows.sum()) != hi - lo:
        raise ValueError(
            "this process's dim-0 shards are not a contiguous row block "
            f"(rows {sorted(starts)}..{sorted(stops)}); build the mesh "
            "with make_mesh() so the 'data' axis stays outermost over "
            "the process-ordered device list"
        )
    return slice(lo, hi)
