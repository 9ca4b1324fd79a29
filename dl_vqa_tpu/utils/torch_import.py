"""Import reference PyTorch checkpoints into our param tree.

The reference saves ``{'epoch', 'model_state', 'optimizer_state'}`` via
``torch.save`` (``/root/reference/utils/train_logger.py:95-112``). This
module maps that ``model_state`` onto :mod:`dl_vqa_tpu.models.vqa` params:

* linear weights: torch ``[out, in]`` -> ours ``[in, out]``;
* conv weights: torch OIHW -> ours HWIO;
* LSTM: ``weight_ih_l0`` ``[4H, E]`` -> ``w_ih`` ``[E, 4H]`` (same for
  ``w_hh``); the two torch biases are summed into our single ``b``
  (mathematically identical);
* gate order (i, f, g, o) is shared, no permutation needed.

This is also how accuracy parity vs the reference is validated: load the
same checkpoint in both frameworks and compare logits/metrics.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["params_from_torch_state", "load_torch_checkpoint"]


def _to_np(tensor) -> np.ndarray:
    return np.asarray(tensor.detach().cpu().numpy(), dtype=np.float32)


def _linear(state: Dict, prefix: str) -> Dict[str, np.ndarray]:
    out = {"w": _to_np(state[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in state:
        out["b"] = _to_np(state[f"{prefix}.bias"])
    return out


def _conv(state: Dict, prefix: str) -> Dict[str, np.ndarray]:
    out = {"w": _to_np(state[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in state:
        out["b"] = _to_np(state[f"{prefix}.bias"])
    return out


def _lstm_direction(state: Dict, suffix: str) -> Dict[str, np.ndarray]:
    return {
        "w_ih": _to_np(state[f"text.lstm.weight_ih_l0{suffix}"]).T,
        "w_hh": _to_np(state[f"text.lstm.weight_hh_l0{suffix}"]).T,
        "b": _to_np(state[f"text.lstm.bias_ih_l0{suffix}"])
        + _to_np(state[f"text.lstm.bias_hh_l0{suffix}"]),
    }


def params_from_torch_state(state: Dict) -> Dict:
    """Map a reference ``model_state`` dict to a dl_vqa_tpu param tree."""
    params: Dict = {
        "text": {"embedding": _to_np(state["text.embedding.weight"])},
        "image": {},
        "attention": {
            "v_conv": _conv(state, "attention.v_conv"),
            "q_lin": _linear(state, "attention.q_lin"),
            "x_conv": _conv(state, "attention.x_conv"),
        },
        "classifier": {
            "lin1": _linear(state, "classifier.lin1"),
            "lin2": _linear(state, "classifier.lin2"),
        },
    }
    params["text"]["lstm_fwd"] = _lstm_direction(state, "")
    if "text.lstm.weight_ih_l0_reverse" in state:
        params["text"]["lstm_bwd"] = _lstm_direction(state, "_reverse")

    block = 0
    while f"image.conv{block}.weight" in state:
        params["image"][f"conv{block}"] = _conv(state, f"image.conv{block}")
        block += 1
    return params


def load_torch_blob(path: str):
    """Load a reference ``.pth`` and split it into ``(state_dict, meta)``.

    The reference saves ``{'epoch', 'model_state', 'optimizer_state'}``
    (ref ``train_logger.py:95-112``); bare ``state_dict`` files are also
    accepted (``meta`` is then empty). Single place for the blob
    convention so the import bridge and tools/ckpt_info.py can't drift."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model_state" in blob:
        meta = {
            k: v for k, v in blob.items()
            if k not in ("model_state", "optimizer_state")
            and not hasattr(v, "keys")
        }
        return blob["model_state"], meta
    return blob, {}


def load_torch_checkpoint(path: str) -> Dict:
    """Load a reference ``model.pth`` and return (params, epoch)."""
    state, meta = load_torch_blob(path)
    return {
        "params": params_from_torch_state(state),
        "epoch": meta.get("epoch"),
    }
