"""Export our param tree as a reference-format PyTorch checkpoint.

The exact inverse of :mod:`dl_vqa_tpu.utils.torch_import`: produces the
``{'epoch', 'model_state', 'optimizer_state'}`` blob the reference's
train logger writes (``/root/reference/utils/train_logger.py:95-112``)
with ``model_state`` keyed/laid-out exactly as the reference model
(``/root/reference/models/model.py``) registers its parameters, so a
checkpoint trained HERE can be loaded by the unmodified reference for
independent verification — or migrated back by users who keep both
stacks.

Layout mapping (inverse of torch_import, see its docstring):

* linear weights: ours ``[in, out]`` -> torch ``[out, in]``;
* conv weights: ours HWIO -> torch OIHW;
* LSTM: our fused bias ``b`` (= torch ``bias_ih + bias_hh``) exports as
  ``bias_ih_l0 = b``, ``bias_hh_l0 = 0`` — torch's LSTM adds the two,
  so the math is identical (the split is not recoverable and does not
  need to be).

Only the CNN/LSTM reference family round-trips (the reference has no
ViT/transformer/co-attention to export to).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["torch_state_from_params", "save_torch_checkpoint"]


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _linear(dst: Dict, prefix: str, p: Dict) -> None:
    dst[f"{prefix}.weight"] = _np(p["w"]).T
    if "b" in p:
        dst[f"{prefix}.bias"] = _np(p["b"])


def _conv(dst: Dict, prefix: str, p: Dict) -> None:
    # HWIO -> OIHW
    dst[f"{prefix}.weight"] = _np(p["w"]).transpose(3, 2, 0, 1)
    if "b" in p:
        dst[f"{prefix}.bias"] = _np(p["b"])


def _lstm_direction(dst: Dict, suffix: str, p: Dict) -> None:
    dst[f"text.lstm.weight_ih_l0{suffix}"] = _np(p["w_ih"]).T
    dst[f"text.lstm.weight_hh_l0{suffix}"] = _np(p["w_hh"]).T
    dst[f"text.lstm.bias_ih_l0{suffix}"] = _np(p["b"])
    dst[f"text.lstm.bias_hh_l0{suffix}"] = np.zeros_like(_np(p["b"]))


def torch_state_from_params(params: Dict) -> Dict[str, np.ndarray]:
    """Map a dl_vqa_tpu param tree to a reference ``model_state`` dict
    (numpy arrays; :func:`save_torch_checkpoint` tensorizes them)."""
    image = params.get("image", {})
    if ("patch_embed" in image or "blocks" in image
            or "lstm_fwd" not in params.get("text", {})
            or "v_conv" not in params.get("attention", {})):
        raise ValueError(
            "only the reference CNN/LSTM/single-attention family exports "
            "to the reference .pth format; the ViT, transformer-text, and "
            "stacked/co-attention variants have no reference counterpart"
        )
    state: Dict[str, np.ndarray] = {
        "text.embedding.weight": _np(params["text"]["embedding"]),
    }
    _lstm_direction(state, "", params["text"]["lstm_fwd"])
    if "lstm_bwd" in params["text"]:
        _lstm_direction(state, "_reverse", params["text"]["lstm_bwd"])
    for name, p in sorted(params["image"].items()):
        if name.startswith("conv"):
            _conv(state, f"image.{name}", p)
    _conv(state, "attention.v_conv", params["attention"]["v_conv"])
    _linear(state, "attention.q_lin", params["attention"]["q_lin"])
    _conv(state, "attention.x_conv", params["attention"]["x_conv"])
    _linear(state, "classifier.lin1", params["classifier"]["lin1"])
    _linear(state, "classifier.lin2", params["classifier"]["lin2"])
    return state


def save_torch_checkpoint(path: str, params: Dict,
                          epoch: int = 0) -> None:
    """Write a reference-format ``model.pth`` (torch.save blob with
    ``epoch`` / ``model_state`` / ``optimizer_state`` keys).

    ``optimizer_state`` is an empty dict: our Adam state is not
    layout-portable to torch's and the reference's eval/predict paths
    never read it (``/root/reference/evaluate_vqa.py`` loads
    ``model_state`` only).
    """
    import torch

    state = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in torch_state_from_params(params).items()
    }
    torch.save(
        {"epoch": epoch, "model_state": state, "optimizer_state": {}},
        path,
    )
