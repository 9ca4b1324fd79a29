"""Device-resident image cache policy (``tpu.device_image_cache``).

One implementation of the enable/budget/upload decision shared by every
entry point (main.py, evaluate_vqa.py, predict.py) — the policy lives
here so it cannot drift between them. See docs/PERF_NOTES.md
("End-to-end training data plane") for the measured rationale: on
relay-backed runtimes the per-batch host->device image transfer
(~147 MiB at ~40 MB/s) dominates the end-to-end step; uploading the
fp16 feature store once and gathering on device took a 187.7 s epoch
to 4.1 s.

Two table layouts (``tpu.device_image_cache_layout``):

* ``replicated`` (default) — every mesh device holds the full table;
  the in-step gather is a local HBM copy (~0.2 ms measured).
* ``sharded`` — table rows shard over the mesh's ``data`` axis, so
  CAPACITY SCALES WITH THE MESH (per-device bytes = total / data) at
  the price of a collective gather per step: XLA's SPMD partitioner
  lowers ``table[rows]`` over a dim-0-sharded operand to a masked
  local gather + all-reduce over 'data' — the gathered batch rides
  ICI once instead of the whole table occupying every HBM. The budget
  check charges per-DEVICE bytes, so 'auto' admits stores up to
  mesh-data x the budget. Losses are bit-identical to the replicated
  path (tests/test_sharding.py::test_device_cache_sharded_layout).

Multi-host runs upload through
``jax.make_array_from_process_local_data``: each process contributes
its addressable block (the full table for 'replicated'; only its own
contiguous row block for 'sharded' — per-host HOST memory scales down
with the process count too). Note the sharded layout's per-step gather
all-reduce crosses DCN when the 'data' axis straddles hosts — prefer
'replicated' on pods unless the table is HBM-bound (docs/SCALING.md).
"""

from __future__ import annotations

from typing import Dict, Optional

__all__ = ["cache_mode", "plan_image_tables", "BUDGET_BYTES"]

# Default HBM set-aside for resident feature tables in 'auto' mode;
# override per-run with ``tpu.device_image_cache_budget_gb``.
BUDGET_BYTES = 4 << 30


def cache_mode(cfg: dict) -> str:
    """Normalize ``tpu.device_image_cache`` to 'auto' | 'on' | 'off'.

    YAML (and our dotlist parser) reads bare ``on``/``off`` as booleans,
    so both spellings must work."""
    raw = cfg["tpu"].get("device_image_cache", "auto")
    if raw is True:
        return "on"
    if raw is False:
        return "off"
    if raw not in ("auto", "on", "off"):
        raise ValueError(
            f"tpu.device_image_cache must be 'auto', 'on', or 'off'; "
            f"got {raw!r}"
        )
    return raw


def _budget_bytes(cfg: dict) -> int:
    gb = cfg["tpu"].get("device_image_cache_budget_gb", 0)
    if gb < 0:
        raise ValueError(
            f"tpu.device_image_cache_budget_gb must be >= 0 (0 means the "
            f"default {BUDGET_BYTES >> 30} GiB); got {gb!r}"
        )
    return int(gb * 2**30) if gb else BUDGET_BYTES


def _layout(cfg: dict, mesh) -> str:
    raw = cfg["tpu"].get("device_image_cache_layout", "replicated")
    if raw not in ("replicated", "sharded"):
        raise ValueError(
            f"tpu.device_image_cache_layout must be 'replicated' or "
            f"'sharded'; got {raw!r}"
        )
    if raw == "sharded" and (mesh is None or mesh.shape.get("data", 1) < 2):
        return "replicated"  # nothing to shard over
    return raw


def plan_image_tables(
    cfg: dict,
    datasets: Dict[str, object],
    mesh=None,
    log=None,
) -> Dict[str, Optional[object]]:
    """Decide and perform the table uploads for the given datasets.

    Returns ``{name: device_array_or_None}`` matching ``datasets``.
    Datasets sharing one ``image_path`` share ONE uploaded table (and
    count once against the budget); datasets without an image cache
    (online mode) get None. 'auto' declines — with a log line — when the
    distinct stores exceed the per-device budget
    (``tpu.device_image_cache_budget_gb``, default 4); 'on' uploads
    regardless. ``mesh`` replicates the tables across its devices, or
    row-shards them over 'data' in the 'sharded' layout (see module
    docstring)."""
    import jax

    mode = cache_mode(cfg)
    out: Dict[str, Optional[object]] = {k: None for k in datasets}
    if mode == "off":
        return out

    layout = _layout(cfg, mesh)
    shards = mesh.shape["data"] if layout == "sharded" else 1
    distinct_nbytes: Dict[str, int] = {}
    for ds in datasets.values():
        if getattr(ds, "has_image_rows", False):
            distinct_nbytes[ds.image_path] = ds.image_store_nbytes
    total = sum(distinct_nbytes.values())
    if total == 0:
        return out
    budget = _budget_bytes(cfg)
    # Ceil, not floor: non-divisible row counts are zero-padded UP before
    # the sharded device_put, so each device really holds ceil-many rows.
    # (Residual row-granularity slack is < 1 row/device — ~0.3 MB for a
    # 224px fp16 row — against GiB-scale budgets.)
    per_device = -(-total // shards)
    if mode == "auto" and per_device > budget:
        if log:
            log(
                f"Image store ({per_device / 2**20:.0f} MiB/device, "
                f"layout={layout}) exceeds the device-cache budget "
                f"({budget / 2**20:.0f} MiB); using per-batch host "
                "transfer (tpu.device_image_cache=on to force, or "
                "device_image_cache_layout=sharded to split over the "
                "data mesh)"
            )
        return out

    if log:
        log(
            f"Device-resident image cache: uploading "
            f"{total / 2**20:.0f} MiB of image features"
            + (f" row-sharded over {shards} 'data' devices"
               if shards > 1 else "")
        )
    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        if layout == "sharded":
            sharding = NamedSharding(mesh, P("data", None, None, None))
        else:
            from dl_vqa_tpu.parallel import replicated

            sharding = replicated(mesh)
    uploaded: Dict[str, object] = {}
    for name, ds in datasets.items():
        if not getattr(ds, "has_image_rows", False):
            continue
        if ds.image_path not in uploaded:
            uploaded[ds.image_path] = _upload_table(ds, sharding, shards)
        out[name] = uploaded[ds.image_path]
    return out


def _upload_table(ds, sharding, shards):
    """Load + place one dataset's table under ``sharding``.

    Multi-process row-sharded uploads read ONLY this process's
    contiguous row block from the store (``features_nhwc_all(rows=...)``
    — the mesh keeps 'data' outermost and ``jax.devices()`` orders by
    process, so each process's rows are contiguous): per-host HOST
    memory scales with 1/process_count, which is the point of the
    sharded layout at pod-scale stores. Every other case loads the full
    table (a replicated layout needs it on every host anyway)."""
    import jax
    import numpy as np

    multi = jax.process_count() > 1
    n_rows = getattr(ds, "image_store_rows", None)
    if multi and shards > 1 and sharding is not None and n_rows:
        from dl_vqa_tpu.parallel import multihost

        probe = ds.features_nhwc_all(rows=slice(0, 1))
        padded = -(-n_rows // shards) * shards
        gshape = (padded,) + probe.shape[1:]
        block = multihost.process_dim0_block(sharding, gshape)
        start, stop = block.start, block.stop
        local = ds.features_nhwc_all(
            rows=slice(min(start, n_rows), min(stop, n_rows))
        )
        pad = (stop - start) - local.shape[0]
        if pad:
            # Tail padding rows (never indexed; batch rows come from the
            # dataset's id map) land in the last process's block.
            local = np.concatenate(
                [local, np.zeros((pad,) + local.shape[1:], local.dtype)]
            )
        return jax.make_array_from_process_local_data(
            sharding, local, gshape
        )

    host = ds.features_nhwc_all()
    if shards > 1 and host.shape[0] % shards:
        # Pad to a shardable row count; pad rows are never indexed.
        pad = shards - host.shape[0] % shards
        host = np.concatenate(
            [host, np.zeros((pad,) + host.shape[1:], host.dtype)]
        )
    return _upload(host, sharding)


def _upload(host, sharding):
    """Place a fully-materialized host table under ``sharding``.

    Single-process: a plain ``device_put``. Multi-process:
    ``device_put`` cannot populate non-addressable shards, so each
    process contributes its addressable block via
    ``jax.make_array_from_process_local_data`` — the full table for a
    replicated layout, its contiguous row block for a row-sharded one
    (fallback for table sources without ``image_store_rows``; the
    block-read path in :func:`_upload_table` avoids materializing
    ``host`` at all)."""
    import jax

    if sharding is None:
        return jax.device_put(host)
    if jax.process_count() == 1:
        return jax.device_put(host, sharding)
    from dl_vqa_tpu.parallel import multihost

    block = multihost.process_dim0_block(sharding, host.shape)
    start, stop = block.start, block.stop
    local = host if (start, stop) == (0, host.shape[0]) else host[start:stop]
    return jax.make_array_from_process_local_data(
        sharding, local, host.shape
    )
