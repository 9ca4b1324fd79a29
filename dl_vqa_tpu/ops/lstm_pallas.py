"""Pallas TPU kernel for the masked LSTM recurrence.

The XLA ``lax.scan`` path (:mod:`dl_vqa_tpu.ops.lstm`) re-reads the
recurrent weight matrix from HBM every timestep and pays a kernel-dispatch
boundary per step. This kernel runs the WHOLE scan as one Pallas program:

* grid = (T,) — TPU grid steps execute sequentially, so the recurrence
  carries (h, c) in VMEM scratch across grid steps (no HBM round trips);
* ``W_hh`` has a constant index map — Mosaic keeps it resident in VMEM
  for the whole scan (8 MB at H=1024/bf16) instead of T re-reads;
* the per-step input projection ``x @ W_ih + b`` is NOT in the kernel:
  it is one big MXU matmul over all timesteps, done outside in XLA
  (Pallas streams its [B, 4H] slice per grid step);
* variable length is a masked carry update (t < len), identical
  semantics to the packed-sequence reference (torch gate order i,f,g,o).

Matmul inputs are cast to ``W_hh``'s dtype (bf16 on the TPU path) with
f32 accumulation; the carry stays f32.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

__all__ = ["lstm_scan_pallas"]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def lstm_scan_pallas(x, lengths, params, interpret=False):
    """Masked LSTM scan on the Pallas TPU kernel; returns final (h, c).

    Differentiable: the backward pass recomputes through the XLA scan
    (identical recurrence), so training works transparently."""
    return _lstm_scan_pallas_impl(x, lengths, params, interpret)


def _lstm_fwd(x, lengths, params, interpret):
    return _lstm_scan_pallas_impl(x, lengths, params, interpret), (
        x, lengths, params,
    )


def _lstm_bwd(interpret, residuals, grads):
    from dl_vqa_tpu.ops.lstm import lstm_scan

    x, lengths, params = residuals
    _, vjp = jax.vjp(lambda x_, p_: lstm_scan(x_, lengths, p_), x, params)
    dx, dparams = vjp(grads)
    return dx, None, dparams


lstm_scan_pallas.defvjp(_lstm_fwd, _lstm_bwd)


def _lstm_kernel(xp_ref, whh_ref, len_ref, h_out_ref, c_out_ref, carry,
                 *, hidden, seq_len):
    import jax.experimental.pallas as pl

    t = pl.program_id(1)  # grid = (b_tiles, T); T iterates fastest

    @pl.when(t == 0)
    def _init():
        carry[:] = jnp.zeros_like(carry)

    h = carry[0]
    c = carry[1]
    gates = xp_ref[0].astype(jnp.float32) + jnp.dot(
        h.astype(whh_ref.dtype), whh_ref[:],
        preferred_element_type=jnp.float32,
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)

    keep = (t < len_ref[:]).astype(jnp.float32)  # [B, 1]
    carry[0] = keep * h_new + (1.0 - keep) * h
    carry[1] = keep * c_new + (1.0 - keep) * c

    @pl.when(t == seq_len - 1)
    def _emit():
        h_out_ref[:] = carry[0]
        c_out_ref[:] = carry[1]


def _lstm_scan_pallas_impl(
    x: jnp.ndarray,        # [B, T, E]
    lengths: jnp.ndarray,  # [B] int
    params: Dict[str, jnp.ndarray],
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked LSTM scan; returns final (h, c), each [B, H] f32.

    Drop-in equivalent of :func:`dl_vqa_tpu.ops.lstm.lstm_scan`.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w_ih, w_hh, b = params["w_ih"], params["w_hh"], params["b"]
    batch, seq_len, _ = x.shape
    hidden = w_hh.shape[0]

    # Input projection for every timestep: one big MXU matmul (XLA),
    # laid out time-major so each grid step's block is [1, B, 4H].
    x_proj = (
        jnp.dot(x.reshape(batch * seq_len, -1), w_ih,
                preferred_element_type=jnp.float32)
        .reshape(batch, seq_len, 4 * hidden)
        + b
    ).astype(x.dtype)
    x_proj = jnp.swapaxes(x_proj, 0, 1)  # [T, B, 4H]

    lengths_col = lengths.astype(jnp.int32).reshape(batch, 1)

    # Tile the batch so (W_hh resident + per-step activation slices +
    # carry) fit in VMEM; each batch tile replays the full time grid.
    b_tile = batch
    for cand in (128, 64, 32, 16, 8):
        if batch % cand == 0:
            b_tile = cand
            break
    b_tiles = batch // b_tile

    kernel = functools.partial(_lstm_kernel, hidden=hidden, seq_len=seq_len)
    h, c = pl.pallas_call(
        kernel,
        grid=(b_tiles, seq_len),
        out_shape=(
            jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((batch, hidden), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((1, b_tile, 4 * hidden), lambda bt, t: (t, bt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, 4 * hidden), lambda bt, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 1), lambda bt, t: (bt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((b_tile, hidden), lambda bt, t: (bt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, hidden), lambda bt, t: (bt, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((2, b_tile, hidden), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * seq_len * batch * hidden * 4 * hidden,
            bytes_accessed=x_proj.size * x_proj.dtype.itemsize
            + w_hh.size * w_hh.dtype.itemsize,
            transcendentals=4 * seq_len * batch * hidden,
        ),
        interpret=interpret,
    )(x_proj, w_hh.astype(x.dtype), lengths_col)
    return h, c
