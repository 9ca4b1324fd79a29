"""Checkpoint save / restore.

Replaces the reference's ``torch.save({'epoch', 'model_state',
'optimizer_state'})`` (``/root/reference/utils/train_logger.py:95-112``)
with an npz-based pytree checkpoint (host-portable, no framework pickle),
plus interop:

* ``load_params`` transparently reads a reference ``model.pth`` (via
  :mod:`dl_vqa_tpu.utils.torch_import`) when pointed at one — this is the
  warm-start / accuracy-parity path (ref ``main.py:108-113``,
  ``evaluate_vqa.py:73-75``);
* full ``TrainState`` (params + Adam moments + step) round-trips for
  step-accurate resume.

Backend dispatch: any path ending in ``.orbax`` (or an existing Orbax
checkpoint directory) routes through
:mod:`dl_vqa_tpu.utils.orbax_backend` — async, atomic, sharding-aware
restores for multi-host scale. Select it per run with
``tpu.checkpoint_backend=orbax``; npz stays the default.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

__all__ = ["save_checkpoint", "save_checkpoint_async", "load_checkpoint",
           "load_params", "restore_state", "restore_state_meta",
           "wait_for_async_saves", "host_snapshot"]

_SEP = "|"


def _leaf_to_host(leaf) -> np.ndarray:
    """Fetch one leaf to host numpy, multi-process-safe.

    In a multihost run a model/stage-sharded leaf spans devices this
    process cannot address, and ``np.asarray`` on it raises. Such leaves
    are gathered with ``process_allgather`` — a COLLECTIVE, so in
    multihost runs every process must walk the same tree (see
    ``host_snapshot``; the train loop has non-coordinators mirror the
    coordinator's saves with it)."""
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable \
            and not leaf.is_fully_replicated:
        from jax.experimental import multihost_utils

        # tiled=True is REQUIRED for global non-fully-addressable inputs;
        # for them it returns the fully-replicated global value.
        return np.asarray(multihost_utils.process_allgather(leaf, tiled=True))
    return np.asarray(leaf)


def host_snapshot(state):
    """Gather a state/params tree to host numpy on every process.

    NPZ-BACKEND mirroring only: coordinator-gated npz save paths call
    this from NON-coordinator processes so they participate in the
    sharded-leaf gather collectives of the coordinator's
    ``save_checkpoint`` (identical leaf order: both walk the same
    pytree). Orbax saves must NOT be mirrored this way — an Orbax save
    is itself a global collective, so every process calls ``save``
    directly (see ``train/loop.py::_save_rolling``); pairing a
    coordinator-side Orbax save with host_snapshot elsewhere deadlocks
    the pod on mismatched collectives."""
    return jax.tree_util.tree_map(_leaf_to_host, state)


def _flatten(tree: Any):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    flat = {}
    for path, leaf in leaves_with_paths:
        key = _SEP.join(_path_str(p) for p in path)
        flat[key] = _leaf_to_host(leaf)
    return flat


def _path_str(entry) -> str:
    if hasattr(entry, "key"):
        return str(entry.key)
    if hasattr(entry, "idx"):
        return f"#{entry.idx}"
    if hasattr(entry, "name"):
        return str(entry.name)
    return str(entry)


def save_checkpoint(path: str, state, epoch: Optional[int] = None,
                    model_cfg=None, extra_meta: Optional[Dict] = None) -> None:
    """Save a TrainState (or bare params tree) to ``path`` (npz).

    ``extra_meta`` merges additional JSON-serializable entries into the
    checkpoint metadata (e.g. the dataset's ``max_question_length`` so the
    predictor can encode questions at the trained length)."""
    from dl_vqa_tpu.utils import orbax_backend

    if orbax_backend.is_orbax_path(path):
        orbax_backend.save(path, state, epoch=epoch, model_cfg=model_cfg,
                           extra_meta=extra_meta, block=True)
        return
    payload = _flatten(state)
    meta = {"epoch": epoch}
    if model_cfg is not None:
        import dataclasses

        meta["model_cfg"] = dataclasses.asdict(model_cfg)
    if extra_meta:
        meta.update(extra_meta)
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez(path, **payload)
    # np.savez appends .npz; normalize to the requested name.
    if not path.endswith(".npz") and os.path.exists(path + ".npz"):
        os.replace(path + ".npz", path)


_async_executor = None
_pending_save = None


def save_checkpoint_async(path: str, state, epoch: Optional[int] = None,
                          model_cfg=None,
                          extra_meta: Optional[Dict] = None) -> None:
    """Write a checkpoint off the training critical path.

    Device arrays are snapshotted to host numpy SYNCHRONOUSLY (so the
    donated/updated state can't race the write), then serialized and
    written by a background thread. A second call joins the previous
    write first, so at most one save is in flight and the rolling file is
    never written concurrently.
    """
    global _async_executor, _pending_save
    import concurrent.futures

    from dl_vqa_tpu.utils import orbax_backend

    if orbax_backend.is_orbax_path(path):
        # Orbax owns the snapshot + background write pipeline (and makes
        # the rolling overwrite atomic via its temp-dir + rename protocol).
        orbax_backend.save(path, state, epoch=epoch, model_cfg=model_cfg,
                           extra_meta=extra_meta, block=False)
        return
    if _async_executor is None:
        _async_executor = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt"
        )
    if _pending_save is not None:
        _pending_save.result()  # surface any previous write error

    snapshot = host_snapshot(state)
    _pending_save = _async_executor.submit(
        save_checkpoint, path, snapshot, epoch, model_cfg, extra_meta
    )


def wait_for_async_saves() -> None:
    """Block until any in-flight async checkpoint write finishes."""
    global _pending_save
    if _pending_save is not None:
        _pending_save.result()
        _pending_save = None
    from dl_vqa_tpu.utils import orbax_backend

    orbax_backend.wait()


def load_checkpoint(path: str) -> Tuple[Dict[str, np.ndarray], Dict]:
    """Load the flat array dict + meta from an npz (or Orbax) checkpoint."""
    from dl_vqa_tpu.utils import orbax_backend

    if orbax_backend.is_orbax_path(path):
        return orbax_backend.load_flat(path, sep=_SEP)
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files if k != "__meta__"}
        meta = (
            json.loads(bytes(data["__meta__"]).decode())
            if "__meta__" in data.files
            else {}
        )
    return flat, meta


def _legacy_stacked_leaf(flat: Dict[str, np.ndarray], key: str,
                         leaf) -> Optional[np.ndarray]:
    """Migrate a pre-round-3 list-of-layers checkpoint leaf.

    The ViT block stack used to be a LIST of per-layer dicts (flat keys
    like ``image|layers|#0|ln1|scale``); it is now stored stacked — one
    leaf per parameter with a leading ``[L, ...]`` axis
    (``models/vit.py:init_vit_image``). When the stacked key is missing,
    look for the legacy indexed keys at every possible path position and
    stack them. Returns None when no legacy layout matches (the caller
    raises its normal KeyError)."""
    shape = np.shape(leaf)
    if not shape:
        return None
    parts = key.split(_SEP)
    for pos in range(1, len(parts) + 1):
        probe = _SEP.join(parts[:pos] + ["#0"] + parts[pos:])
        if probe not in flat:
            continue
        keys = [
            _SEP.join(parts[:pos] + [f"#{i}"] + parts[pos:])
            for i in range(shape[0])
        ]
        if all(k in flat for k in keys):
            return np.stack([flat[k] for k in keys])
    return None


def _unflatten_into(template: Any, flat: Dict[str, np.ndarray]) -> Any:
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    copied = False  # copy-on-first-migration so the caller's dict is untouched
    for path, leaf in leaves_with_paths:
        key = _SEP.join(_path_str(p) for p in path)
        if key not in flat:
            legacy = _legacy_stacked_leaf(flat, key, leaf)
            if legacy is None:
                raise KeyError(f"Checkpoint missing leaf {key!r}")
            if not copied:
                flat = dict(flat)
                copied = True
            flat[key] = legacy
        value = flat[key]
        if tuple(value.shape) != tuple(np.shape(leaf)):
            raise ValueError(
                f"Shape mismatch for {key!r}: checkpoint {value.shape} vs "
                f"model {np.shape(leaf)}"
            )
        new_leaves.append(value)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def restore_state_meta(template_state, path: str):
    """Restore a full TrainState into the structure of ``template_state``.
    Returns (state, meta) with the FULL metadata dict — rolling
    crash-recovery checkpoints carry resume progress there
    (``best_eval_score``, ``epochs_no_improve``, ``epoch``) beyond the
    plain ``epoch`` tag. Orbax checkpoints restore sharding-aware:
    sharded template leaves come back placed shard-by-shard on device."""
    from dl_vqa_tpu.utils import orbax_backend

    if orbax_backend.is_orbax_path(path):
        return orbax_backend.restore(path, template=template_state)
    flat, meta = load_checkpoint(path)
    return _unflatten_into(template_state, flat), meta


def restore_state(template_state, path: str):
    """:func:`restore_state_meta`, returning just (state, epoch)."""
    state, meta = restore_state_meta(template_state, path)
    return state, meta.get("epoch")


def load_params(path: str, params_template: Optional[Dict] = None,
                with_meta: bool = False):
    """Load model params only. Accepts our npz checkpoints (full state or
    bare params) and reference ``.pth`` torch checkpoints.

    ``with_meta=True`` returns ``(params, meta)`` from the SAME read —
    callers that also want checkpoint metadata (e.g. the predictor's
    ``max_question_length``) must not pay a second full decompress /
    Orbax restore. Torch checkpoints have no meta ({})."""
    if path.endswith((".pth", ".pt")):
        from dl_vqa_tpu.utils.torch_import import load_torch_checkpoint

        params = load_torch_checkpoint(path)["params"]
        return (params, {}) if with_meta else params
    flat, meta = load_checkpoint(path)
    # Keep only the params subtree when given a full TrainState dump.
    param_keys = {k: v for k, v in flat.items() if k.startswith("params" + _SEP)}
    if param_keys:
        flat = {k[len("params" + _SEP):]: v for k, v in param_keys.items()}
    if params_template is not None:
        params = _unflatten_into(params_template, flat)
        return (params, meta) if with_meta else params
    # Rebuild a nested dict from flat keys.
    tree: Dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split(_SEP)
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return (tree, meta) if with_meta else tree
