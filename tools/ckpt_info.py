"""Checkpoint inspector — works on any checkpoint from any topology.

    python tools/ckpt_info.py <path> [--leaves] [--json]

Prints the backend (npz / Orbax / reference ``.pth``), the metadata
(epoch, resume progress, model config, calibration scales), parameter /
optimizer-state counts, and optionally the per-leaf shape table.

Reads are topology-independent: Orbax checkpoints written by a
multi-process pod restore here as host numpy regardless of the saved
device mesh (``utils/orbax_backend._restore_host`` — Orbax's default
restore replays the saved device ids and fails from a different
topology), and reference ``model.pth`` files go through the torch
bridge. Runs fine on a CPU-only box (``DL_VQA_PLATFORM=cpu``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load(path: str):
    """Return (backend, flat {dotted: ndarray}, meta)."""
    import numpy as np

    if path.endswith((".pth", ".pt")):
        # Pure-torch path: no jax import, no compile-cache setup needed.
        from dl_vqa_tpu.utils.torch_import import load_torch_blob

        state, meta = load_torch_blob(path)
        flat = {k: np.asarray(v) for k, v in state.items()}
        return "torch (.pth)", flat, meta

    from dl_vqa_tpu.utils.compile_cache import enable as _enable_compile_cache

    _enable_compile_cache()
    from dl_vqa_tpu.utils import checkpoint as ckpt

    flat, meta = ckpt.load_checkpoint(path)
    from dl_vqa_tpu.utils import orbax_backend

    backend = "orbax" if orbax_backend.is_orbax_path(path) else "npz"
    return backend, {k.replace("|", "."): v for k, v in flat.items()}, meta


def summarize(path: str, show_leaves: bool = False,
              as_json: bool = False) -> dict:
    backend, flat, meta = _load(path)
    param_leaves = {k: v for k, v in flat.items()
                    if k.startswith(("params.", "model."))
                    or backend.startswith("torch")}
    if not param_leaves:
        param_leaves = flat
    opt_leaves = {k: v for k, v in flat.items() if k.startswith("opt_state")}
    info = {
        "path": os.path.abspath(path),
        "backend": backend,
        "n_leaves": len(flat),
        "param_count": int(sum(
            v.size for k, v in param_leaves.items()
            if k not in opt_leaves
        )),
        "opt_state_count": int(sum(v.size for v in opt_leaves.values())),
        "total_bytes": int(sum(v.nbytes for v in flat.values())),
        "meta": meta,
    }
    if as_json:
        print(json.dumps(
            info if not show_leaves else dict(
                info, leaves={k: [list(v.shape), str(v.dtype)]
                              for k, v in sorted(flat.items())}
            ),
            default=str,
        ))
        return info
    print(f"checkpoint : {info['path']}")
    print(f"backend    : {backend}")
    print(f"leaves     : {info['n_leaves']}  "
          f"(params {info['param_count']:,}, "
          f"opt state {info['opt_state_count']:,}, "
          f"{info['total_bytes'] / 2**20:.1f} MiB)")
    for key, value in sorted(meta.items()):
        text = json.dumps(value, default=str)
        if len(text) > 100:
            text = text[:97] + "..."
        print(f"meta.{key:<22s}: {text}")
    if show_leaves:
        width = max(map(len, flat), default=0)
        for k, v in sorted(flat.items()):
            print(f"  {k:<{width}s}  {str(v.dtype):<10s} {tuple(v.shape)}")
    return info


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("path")
    ap.add_argument("--leaves", action="store_true",
                    help="print the per-leaf dtype/shape table")
    ap.add_argument("--json", action="store_true",
                    help="one JSON object instead of the text summary")
    args = ap.parse_args()
    summarize(args.path, show_leaves=args.leaves, as_json=args.json)
