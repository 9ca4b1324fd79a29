"""int8 W8A8 for the ViT block matmuls (inference serving mode).

The ViT eval step's block matmuls (qkv / out projection / MLP pair) are
COMPUTE-bound at 35-50% MXU efficiency in bf16 (K=256 contractions —
docs/PERF_NOTES.md "ViT image-encoder family"), unlike the CNN stem's
bandwidth walls. The int8 MXU path runs at 2x the bf16 rate, and at
these shapes the requant epilogues fuse: the isolated MLP pair measured
**1.48x** (0.492 -> 0.332 ms/iter at B=512, S=196, D=256, F=1024 on
v5e — `experiments/probe_vit_int8_mlp.py`), where the CNN's conv
requant tax had eaten the same gain.

Scheme (mirrors ops/conv_int8): weights quantized per-output-channel
in-graph from the bf16/f32 params (checkpoint format unchanged);
activations quantized with STATIC per-site scales from a PTQ
calibration pass — 4 sites per block, in order:

  0. qkv input        (post-LN1, signed)
  1. out-proj input   (attention core output, signed)
  2. mlp_in input     (post-LN2, signed)
  3. mlp_out input    (post-relu hidden, non-negative)

``ImageConfig.quant_scales`` holds the flattened ``4 * num_layers``
amaxes (jit-static; calibration artifacts of a trained checkpoint, not
hyperparameters). The attention core itself (the Pallas flash kernel or
the XLA softmax path) and the patch-embed conv stay bf16. Inference
only: calibration needs trained weights, so ``train=True`` raises at
the model level (models/vqa.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "w8a8_linear",
    "calibrate_vit_scales",
    "with_calibrated_vit_scales",
]


def _quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8: ``w [in, out]`` ->
    ``(w_q int8, scale f32[out])`` with ``w ~= w_q * scale``."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=0)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    w_q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def w8a8_linear(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                s_in: float, dtype) -> jnp.ndarray:
    """``x @ w + b`` on the int8 MXU path.

    ``x [..., in]`` any float dtype; ``s_in`` the static calibrated amax
    of this site's input (values beyond it saturate at +-127 — the
    standard static-PTQ clip); ``w [in, out]`` bf16/f32 params quantized
    here (XLA hoists the quantization out of any surrounding loop since
    it depends only on the params). Returns ``[..., out]`` in ``dtype``
    with the f32 bias added (matching the bf16 path's f32-accumulate +
    bias structure).
    """
    # Rank-3 operands stay rank-3: collapsing to [B*S, D] for the int8
    # dot measured 43.3k -> 30.6k QA/s at the full model (the reshape
    # relayouts against the rank-3 Pallas-attention operands dominate —
    # the same boundary cost as the round-2 token-collapse negative
    # result, docs/PERF_NOTES.md).
    x_q = jnp.clip(
        jnp.round(x.astype(jnp.float32) * (127.0 / s_in)), -127, 127
    ).astype(jnp.int8)
    w_q, w_scale = _quantize_weight(w)
    acc = lax.dot_general(
        x_q, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (
        acc.astype(jnp.float32) * (w_scale * (s_in / 127.0)) + b
    ).astype(dtype)


def calibrate_vit_scales(params: dict, cfg, images: jnp.ndarray,
                         dtype=jnp.bfloat16) -> Tuple[float, ...]:
    """Per-site amaxes over ``images`` from the EXACT bf16 forward.

    Runs the model's own image encoder (``models/vit.apply_vit_image``)
    with an amax sink collecting the 4 per-block site maxima, in block
    order. Returns ``4 * num_layers`` python floats for
    ``ImageConfig.quant_scales``.
    """
    from dl_vqa_tpu.models.vit import apply_vit_image

    @jax.jit
    def amaxes(params_image, x):
        sink = []
        apply_vit_image(
            params_image, x, cfg.image.patch_size, cfg.image.num_heads,
            dropout=0.0, train=False, rng=None, dtype=dtype,
            use_pallas=cfg.use_pallas, amax_sink=sink,
        )
        return jnp.stack(sink)

    vals = np.asarray(jax.device_get(amaxes(params["image"], images)))
    if not np.all(np.isfinite(vals)) or np.any(vals <= 0):
        raise ValueError(
            f"vit int8 calibration produced non-positive/non-finite "
            f"amaxes {vals}; check the calibration batch and params"
        )
    expected = 4 * cfg.image.num_layers
    if len(vals) != expected:
        raise AssertionError(
            f"calibration collected {len(vals)} amaxes, expected "
            f"{expected} (4 per block)"
        )
    return tuple(float(v) for v in vals)


def with_calibrated_vit_scales(cfg, params: dict, images: jnp.ndarray,
                               dtype=jnp.bfloat16):
    """Calibrate the ViT W8A8 mode and return a ready-to-serve
    ModelConfig (``image.store_dtype='int8'`` + ``image.quant_scales``).
    One-call form for entry points, mirroring
    ``ops.conv_int8.with_calibrated_scales``."""
    import dataclasses

    scales = calibrate_vit_scales(params, cfg, images, dtype=dtype)
    return dataclasses.replace(
        cfg, image=dataclasses.replace(
            cfg.image, store_dtype="int8", quant_scales=scales
        )
    )
