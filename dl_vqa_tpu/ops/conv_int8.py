"""int8 (W8A8) CNN-stem inference mode: quantized conv blocks on the MXU.

The f8 activation-storage mode (ops/conv_fused.py, PERF_NOTES "f8
activation-storage stem") removed the stem's HBM wall; what remains of
the CNN eval step is the COMPUTE-bound conv1/conv2 pair (5.7 + 4.2 ms
of the 23.5 ms f8 step at batch 512). The v5e MXU runs s8xs8->s32 at
2x the bf16 rate; `experiments/probe_int8_conv.py` measured a real
integer conv chain at conv1 shapes at **1.31x** over bf16 (the requant
epilogue and unchanged memory traffic eat the rest of the 2x).

This module turns that probe into an opt-in serving mode
(``train.image.store_dtype: int8``): every conv block stores its
post-relu activations as int8 (same 8-bit pool/HBM traffic as the f8
mode), and the blocks whose input channel count is MXU-eligible
(cin >= 16, i.e. conv1/conv2 for the reference stack — conv0's cin=3
stays a bf16 conv) run the convolution itself in s8xs8->s32.

Quantization scheme (standard PTQ):

* weights: symmetric per-output-channel, ``w ~= w_q * (amax_co / 127)``,
  quantized in-graph from the bf16 params (the weight tensors are tiny —
  a few hundred KB — so this costs nothing per step and keeps the
  checkpoint format unchanged);
* activations: static per-block scale over the post-relu output,
  ``y ~= y_q * (s_block / 127)`` with ``y_q in [0, 127]`` (post-relu
  activations are non-negative; the sign bit is spent on the MXU's
  signed operand requirement). Scales come from a calibration pass
  (:func:`calibrate_stem_scales`) over sample batches with the exact
  bf16 stem; they are jit-STATIC (carried in ``ImageConfig.
  quant_scales``), so serving numerics are fixed at calibration time,
  not data-dependent per batch.

Like the f8 mode this changes numerics and is NOT eligible for
reference-parity runs (ref semantics: ``/root/reference/models/
model.py:72-84`` is plain f32). It is inference-only: there is no
straight-through training path (calibration needs trained weights);
the model wiring raises if ``train=True``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "quantize_weights_per_channel",
    "conv_relu_pool_w8a8",
    "quantize_relu_pool",
    "dequantize",
    "calibrate_stem_scales",
    "int8_stem_forward",
    "with_calibrated_scales",
]


def quantize_weights_per_channel(
    w: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 weight quantization.

    ``w`` is ``[K, K, Cin, Cout]``; returns ``(w_q int8, scale f32[Cout])``
    with ``w ~= w_q * scale``. Zero-valued channels get scale 1 to avoid
    0/0 (their quantized weights are all-zero either way).
    """
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=(0, 1, 2))
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    w_q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def quantize_relu_pool(y: jnp.ndarray, s_out: float) -> jnp.ndarray:
    """relu -> int8 quantize -> 2x2 maxpool, for a conv+bias output.

    ``y`` is the f32 conv+bias output; ``s_out`` the static calibrated
    post-relu amax for this block. Quantize-then-pool is exact relative
    to pool-then-quantize: round/clip are monotone non-decreasing, so
    they commute with the window max. Values above ``s_out`` (calibration
    is a sample, not a bound) saturate at 127.
    """
    q = jnp.clip(jnp.round(jax.nn.relu(y) * (127.0 / s_out)), 0, 127)
    q = q.astype(jnp.int8)
    return lax.reduce_window(
        q, jnp.int8(-128), lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def conv_relu_pool_w8a8(
    x_q: jnp.ndarray,   # [B, H, W, Cin] int8, x ~= x_q * (s_in / 127)
    s_in: float,        # static: calibrated amax of the block INPUT
    w: jnp.ndarray,     # [K, K, Cin, Cout] bf16/f32 params (quantized here)
    b: jnp.ndarray,     # [Cout] f32
    stride: int,
    s_out: float,       # static: calibrated amax of the block OUTPUT
) -> jnp.ndarray:
    """One W8A8 conv block: s8xs8->s32 conv, f32 requant epilogue,
    int8 activation store, int8 pool. Returns int8 ``[B, hp, wp, Cout]``.
    """
    w_q, w_scale = quantize_weights_per_channel(w)
    acc = lax.conv_general_dilated(
        x_q, w_q,
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    # Dequant: acc * (s_in/127) * w_scale, per output channel; then bias.
    y = acc.astype(jnp.float32) * (w_scale * (s_in / 127.0)) + b
    return quantize_relu_pool(y, s_out)


def dequantize(y_q: jnp.ndarray, s: float, dtype) -> jnp.ndarray:
    """int8 activations back to ``dtype``: ``y_q * (s / 127)``."""
    return (y_q.astype(jnp.float32) * (s / 127.0)).astype(dtype)


def int8_stem_forward(params_image: dict, x: jnp.ndarray,
                      scales: Tuple[float, ...], stride: int,
                      dtype) -> jnp.ndarray:
    """The full int8 CNN stem: conv0 in ``dtype`` (cin=3 cannot use the
    integer MXU path — sub-16 contraction dims pad to 128 lanes), blocks
    1.. in W8A8, output dequantized to ``dtype``.

    ``scales[i]`` is block i's calibrated post-relu amax; ``len(scales)``
    must equal the number of conv blocks.
    """
    n_blocks = len([k for k in params_image if k.startswith("conv")])
    if len(scales) != n_blocks:
        raise ValueError(
            f"image.quant_scales has {len(scales)} entries; the stem has "
            f"{n_blocks} conv blocks — recalibrate (calibrate_stem_scales)"
        )
    p0 = params_image["conv0"]
    out = lax.conv_general_dilated(
        x.astype(dtype), p0["w"].astype(dtype),
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y_q = quantize_relu_pool(out.astype(jnp.float32) + p0["b"], scales[0])
    for block in range(1, n_blocks):
        p = params_image[f"conv{block}"]
        y_q = conv_relu_pool_w8a8(
            y_q, scales[block - 1], p["w"], p["b"], stride, scales[block],
        )
    return dequantize(y_q, scales[-1], dtype)


def calibrate_stem_scales(params: dict, cfg, images: jnp.ndarray,
                          dtype=jnp.bfloat16) -> Tuple[float, ...]:
    """Per-block post-relu amax over ``images``, from the EXACT stem.

    Runs the bf16 reference conv blocks (ops/conv_fused.py semantics) on
    a calibration batch and returns one python float per block — the
    amax of that block's post-relu activations (measured post-pool,
    which has the same max: maxpool preserves the maximum). Feed the
    result to ``ImageConfig.quant_scales`` (jit-static), e.g.::

        scales = calibrate_stem_scales(params, cfg, sample_images)
        cfg = dataclasses.replace(
            cfg, image=dataclasses.replace(
                cfg.image, store_dtype="int8", quant_scales=scales))

    ``cfg`` here is the ModelConfig (uses ``image.stride`` and the conv
    block count from the params).
    """
    stride = cfg.image.stride

    @jax.jit
    def amaxes(params_image, x):
        out = []
        y = x.astype(dtype)
        n_blocks = len([k for k in params_image if k.startswith("conv")])
        for block in range(n_blocks):
            p = params_image[f"conv{block}"]
            conv = lax.conv_general_dilated(
                y, p["w"].astype(dtype),
                window_strides=(stride, stride),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            a = jax.nn.relu(conv.astype(jnp.float32) + p["b"])
            out.append(jnp.max(a))
            y = lax.reduce_window(
                a, -jnp.inf, lax.max,
                window_dimensions=(1, 2, 2, 1),
                window_strides=(1, 2, 2, 1),
                padding="VALID",
            ).astype(dtype)
        return jnp.stack(out)

    vals = np.asarray(jax.device_get(amaxes(params["image"], images)))
    if not np.all(np.isfinite(vals)) or np.any(vals <= 0):
        raise ValueError(
            f"calibration produced non-positive/non-finite amaxes {vals}; "
            "check the calibration batch and params"
        )
    return tuple(float(v) for v in vals)


def with_calibrated_scales(cfg, params: dict, images: jnp.ndarray,
                           dtype=jnp.bfloat16):
    """Calibrate the int8 stem and return a ready-to-serve ModelConfig.

    One-call form of the calibration flow for entry points: runs
    :func:`calibrate_stem_scales` on ``images`` (a representative
    ``[B, H, W, 3]`` sample) and returns ``cfg`` with
    ``image.store_dtype='int8'`` and ``image.quant_scales`` set.
    """
    import dataclasses

    scales = calibrate_stem_scales(params, cfg, images, dtype=dtype)
    return dataclasses.replace(
        cfg, image=dataclasses.replace(
            cfg.image, store_dtype="int8", quant_scales=scales
        )
    )
