"""Config schema: a nested tree of expected types.

Mirrors the reference's hand-written schema
(``/root/reference/utils/config_schema.py:5-92``) and extends it with the
TPU-specific groups this framework adds (``tpu``). Validation semantics
match the reference's ``schema.Schema(...).validate`` usage: every key in
the schema must be present with the right type; extra keys are errors.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

__all__ = ["CFG_SCHEMA", "validate", "SchemaError"]


class SchemaError(ValueError):
    pass


_PATHS = {
    "pretrained_model_path": str,
    "base_path": str,
    "logs": str,
    "vocab_path": str,
}

_SPLIT_PATHS = {
    "vqaDataset": str,
    "questions": str,
    "answers": str,
    "imgs": str,
    "processed_imgs": str,
}

_PROFILE = {
    "paths": _PATHS,
    "train_paths": _SPLIT_PATHS,
    "val_paths": _SPLIT_PATHS,
}

CFG_SCHEMA: Dict[str, Any] = {
    "main": {
        "experiment_name_prefix": str,
        "seed": int,
        "num_workers": int,
        "use_full": bool,
        "start_from_pretrained_model": bool,
        "full": _PROFILE,
        "small": _PROFILE,
    },
    "train": {
        "text": {
            # 'lstm' (reference parity) or 'transformer' (BASELINE config 5)
            "encoder": str,
            "question_features": int,
            "embedding_features": int,
            "dropout": float,
            "num_lstm_layers": int,
            "bidirectional": bool,
            "num_heads": int,          # transformer variant only
            "num_layers": int,         # transformer variant only
            "max_positions": int,      # transformer variant only
        },
        "image": {
            # 'cnn' (reference parity) or 'vit' (patch transformer)
            "encoder": str,
            "kernel_size": int,
            "dropout": float,
            "num_channels": list,
            "stride": int,
            "do_skip_connection": bool,  # kept for config parity; inert (ref dead code)
            "patch_size": int,           # vit only
            "num_layers": int,           # vit only
            "num_heads": int,            # vit only
            # 'compute' | 'f8e4m3' (8-bit activation storage) | 'int8'
            # (W8A8 MXU convs; eval-only, auto-calibrated) — cnn only
            "store_dtype": str,
            # Mixture-of-Experts FFN (vit only): 0 = dense; > 0 makes
            # every block's MLP a sparse expert FFN (ops/moe.py), expert
            # weights sharded over tpu.mesh.expert.
            "moe_experts": int,
            "moe_top_k": int,            # experts per token (1 or 2)
            "moe_capacity_factor": float,
            "moe_aux_weight": float,     # load-balance loss weight
        },
        "attention": {
            # 'single' (reference parity), 'stacked' (SAN), 'co' (co-attention)
            "variant": str,
            "hidden_dim": int,
            "glimpses": int,
            "do_option": str,
            "dropout": float,
        },
        "classifier": {
            "hidden_dim": int,
            "dropout": float,
        },
        "max_answers": int,
        "image_size": int,
        "central_fraction": float,
        "n_epochs_stop": int,
        "num_epochs": int,
        "batch_size": int,
        "save_model": bool,
        "lr": {
            "lr_value": float,
            "lr_decay": int,
            "lr_gamma": float,
            "lr_step_size": int,
        },
    },
    "tpu": {
        "compute_dtype": str,        # 'float32' | 'bfloat16'
        "online_images": bool,       # decode JPEGs on the fly (no h5 cache)
        "native_loader": bool,       # C++ decode pipeline (native/)
        # offline h5 cache builder backend: 'auto' (native iff .so present
        # and >1 core — measured, see docs/PERF_NOTES.md "Offline cache
        # builder") | 'native' | 'pil' (serial, byte-identical to ref)
        "image_builder_backend": str,
        "mesh": {
            "data": int,             # -1 = all remaining devices
            "model": int,
            "stage": int,            # pipeline stages (>1 needs encoder=vit)
            "expert": int,           # MoE expert parallelism (moe_experts>0)
            "seq": int,              # ring-attention sequence parallelism
        },
        # microbatches for the pipeline schedule; 0 = one per stage
        "pipeline_microbatches": int,
        # ZeRO over the 'data' mesh axis: 0 = off, 1 = shard the Adam
        # moments, 3 = shard params too (FSDP). 2 is rejected: gradients
        # are temporaries inside the fused step (see parallel/mesh.py).
        "zero_stage": int,
        "remat": bool,
        "grad_accum_steps": int,     # >1: microbatch gradient accumulation
        # 'auto' | 'on' | 'off': keep the image feature store resident on
        # device; batches carry row indices, the step gathers on device.
        # bool accepted because YAML reads bare on/off as booleans.
        "device_image_cache": (str, bool),
        # per-DEVICE HBM budget for 'auto' (GiB); 0 = built-in default (4)
        "device_image_cache_budget_gb": (float, int),
        # 'replicated' (full table per device, local gather) | 'sharded'
        # (rows split over the 'data' mesh axis: capacity scales with the
        # mesh, gather becomes masked-local + all-reduce)
        "device_image_cache_layout": str,
        "checkpoint_backend": str,   # 'npz' (single file) | 'orbax' (async dir)
        # also write the rolling crash-recovery checkpoint every N batches
        # WITHIN an epoch (0 = epoch-end only); a restart then resumes the
        # interrupted epoch at the exact batch (see train/loop.py).
        "checkpoint_every_steps": int,
        "prefetch_depth": int,
        "use_pallas": bool,
        "debug_nans": bool,
        "prng_impl": str,            # 'rbg' (fast on TPU) | 'threefry2x32'
        "profile_dir": str,          # '' disables the jax.profiler trace
    },
}


def validate(
    cfg: Dict[str, Any],
    schema: Optional[Dict[str, Any]] = None,
    path: str = "",
) -> None:
    """Recursively validate ``cfg`` against the schema tree.

    Raises :class:`SchemaError` on missing keys, unexpected keys, or type
    mismatches. ``float`` slots accept ints (YAML '0' for a 0.0 field).
    """
    schema = CFG_SCHEMA if schema is None else schema
    missing = set(schema) - set(cfg)
    extra = set(cfg) - set(schema)
    if missing:
        raise SchemaError(f"Missing config keys at '{path}': {sorted(missing)}")
    if extra:
        raise SchemaError(f"Unexpected config keys at '{path}': {sorted(extra)}")
    for key, expected in schema.items():
        value = cfg[key]
        where = f"{path}.{key}" if path else key
        if isinstance(expected, dict):
            if not isinstance(value, dict):
                raise SchemaError(f"'{where}' must be a mapping")
            validate(value, expected, where)
        elif expected is float:
            if not isinstance(value, (int, float)) or isinstance(value, bool):
                raise SchemaError(f"'{where}' must be a number, got {value!r}")
        elif expected is int:
            if not isinstance(value, int) or isinstance(value, bool):
                raise SchemaError(f"'{where}' must be an int, got {value!r}")
        elif expected is bool:
            if not isinstance(value, bool):
                raise SchemaError(f"'{where}' must be a bool, got {value!r}")
        elif expected is list:
            if not isinstance(value, list):
                raise SchemaError(f"'{where}' must be a list, got {value!r}")
        elif expected is str:
            if not isinstance(value, str):
                raise SchemaError(f"'{where}' must be a string, got {value!r}")
        elif isinstance(expected, tuple):
            # Union of allowed types (e.g. (str, bool) for flags whose
            # YAML spelling 'on'/'off' parses as a boolean).
            if not isinstance(value, expected):
                names = "/".join(t.__name__ for t in expected)
                raise SchemaError(
                    f"'{where}' must be {names}, got {value!r}"
                )
        else:  # pragma: no cover - schema authoring error
            raise SchemaError(f"Bad schema entry at '{where}': {expected!r}")
