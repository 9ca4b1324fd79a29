"""Device-resident image cache policy (``tpu.device_image_cache``).

One implementation of the enable/budget/upload decision shared by every
entry point (main.py, evaluate_vqa.py, predict.py) — the policy lives
here so it cannot drift between them. See docs/PERF_NOTES.md
("End-to-end training data plane") for the measured rationale: on
relay-backed runtimes the per-batch host->device image transfer
(~147 MiB at ~40 MB/s) dominates the end-to-end step; uploading the
fp16 feature store once and gathering on device took a 187.7 s epoch
to 4.1 s.
"""

from __future__ import annotations

from typing import Dict, Optional

__all__ = ["cache_mode", "plan_image_tables", "BUDGET_BYTES"]

# Conservative HBM set-aside for resident feature tables in 'auto' mode.
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
    distinct stores exceed :data:`BUDGET_BYTES`; 'on' uploads
    regardless. ``mesh`` replicates the tables across its devices."""
    import jax

    mode = cache_mode(cfg)
    out: Dict[str, Optional[object]] = {k: None for k in datasets}
    if mode == "off":
        return out

    distinct_nbytes: Dict[str, int] = {}
    for ds in datasets.values():
        if getattr(ds, "has_image_rows", False):
            distinct_nbytes[ds.image_path] = ds.image_store_nbytes
    total = sum(distinct_nbytes.values())
    if total == 0:
        return out
    if mode == "auto" and total > BUDGET_BYTES:
        if log:
            log(
                f"Image store ({total / 2**20:.0f} MiB) exceeds the "
                f"device-cache budget ({BUDGET_BYTES / 2**20:.0f} MiB); "
                "using per-batch host transfer "
                "(tpu.device_image_cache=on to force)"
            )
        return out

    if log:
        log(
            f"Device-resident image cache: uploading "
            f"{total / 2**20:.0f} MiB of image features"
        )
    sharding = None
    if mesh is not None:
        from dl_vqa_tpu.parallel import replicated

        sharding = replicated(mesh)
    uploaded: Dict[str, object] = {}
    for name, ds in datasets.items():
        if not getattr(ds, "has_image_rows", False):
            continue
        if ds.image_path not in uploaded:
            host = ds.features_nhwc_all()
            uploaded[ds.image_path] = (
                jax.device_put(host, sharding) if sharding is not None
                else jax.device_put(host)
            )
        out[name] = uploaded[ds.image_path]
    return out
