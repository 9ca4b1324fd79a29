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

    Differentiable via saved per-step states: under AD the forward kernel
    additionally streams the pre-activation gates and the (h, c) carry
    sequences to HBM, and the backward consumes them directly — no
    forward recompute (the round-1 recompute backward cost two extra
    XLA scan passes per direction; see docs/PERF_NOTES.md)."""
    return _lstm_scan_pallas_impl(x, lengths, params, interpret)


def _lstm_fwd(x, lengths, params, interpret):
    (h, c), saved = _lstm_scan_pallas_impl(
        x, lengths, params, interpret, save_states=True
    )
    return (h, c), (x, lengths, params, saved)


def _lstm_bwd(interpret, residuals, grads):
    x, lengths, params, saved = residuals
    return _lstm_saved_state_bwd(x, lengths, params, saved, grads)


lstm_scan_pallas.defvjp(_lstm_fwd, _lstm_bwd)


def _lstm_saved_state_bwd(x, lengths, params, saved, grads):
    """LSTM backward from saved forward states (no recompute).

    ``saved`` holds time-major f32 ``gates_all [T, B, 4H]`` (pre-
    activation, incl. the recurrent term), ``c_all``/``h_all`` [T, B, H]
    (the post-update masked carries). Per step only elementwise math and
    one [B,4H]x[4H,H] matmul run inside the reverse scan; every weight
    gradient is ONE big MXU matmul outside it (dW_hh over the shifted
    carry sequence, dW_ih over the inputs), which is the TPU-friendly
    shape for these reductions.

    Masked-step semantics mirror the forward exactly: where t >= len the
    forward passed the carry through, so the backward routes (dh, dc)
    straight through and contributes zero to every gate/weight gradient.
    """
    gates_all, c_all, h_all = saved
    w_ih, w_hh = params["w_ih"], params["w_hh"]
    batch, seq_len, _ = x.shape
    hidden = w_hh.shape[0]
    dh_final, dc_final = grads

    zeros = jnp.zeros((1, batch, hidden), dtype=c_all.dtype)
    c_prev_all = jnp.concatenate([zeros, c_all[:-1]], axis=0)
    h_prev_all = jnp.concatenate([zeros, h_all[:-1]], axis=0)
    keep_t = (
        jnp.arange(seq_len, dtype=lengths.dtype)[:, None] < lengths[None, :]
    ).astype(jnp.float32)[..., None]  # [T, B, 1]
    w_hh_f = w_hh.astype(jnp.float32)

    def step(carry, inp):
        dh, dc = carry
        gates, c_t, c_prev, keep = inp
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = (jax.nn.sigmoid(z) for z in (i, f, o))
        g = jnp.tanh(g)
        tanh_c = jnp.tanh(c_t)
        dh_eff = dh * keep
        dc_tot = dc * keep + dh_eff * o * (1.0 - tanh_c * tanh_c)
        dgates = jnp.concatenate(
            [
                dc_tot * g * i * (1.0 - i),
                dc_tot * c_prev * f * (1.0 - f),
                dc_tot * i * (1.0 - g * g),
                dh_eff * tanh_c * o * (1.0 - o),
            ],
            axis=-1,
        )
        dh_prev = (1.0 - keep) * dh + jax.lax.dot_general(
            dgates, w_hh_f, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dc_prev = (1.0 - keep) * dc + dc_tot * f
        return (dh_prev, dc_prev), dgates

    init = (dh_final.astype(jnp.float32), dc_final.astype(jnp.float32))
    (_, _), dgates_all = jax.lax.scan(
        step, init, (gates_all, c_all, c_prev_all, keep_t), reverse=True
    )

    # Weight/bias/input grads as single large contractions (MXU).
    db = jnp.sum(dgates_all, axis=(0, 1))
    x_t = jnp.swapaxes(x, 0, 1).astype(jnp.float32)  # [T, B, E]
    dw_ih = jnp.einsum("tbe,tbg->eg", x_t, dgates_all,
                       preferred_element_type=jnp.float32)
    dw_hh = jnp.einsum("tbh,tbg->hg", h_prev_all, dgates_all,
                       preferred_element_type=jnp.float32)
    dx = jnp.swapaxes(
        jnp.einsum("tbg,eg->tbe", dgates_all,
                   w_ih.astype(jnp.float32),
                   preferred_element_type=jnp.float32),
        0, 1,
    ).astype(x.dtype)
    dparams = {
        "w_ih": dw_ih.astype(w_ih.dtype),
        "w_hh": dw_hh.astype(w_hh.dtype),
        "b": db.astype(params["b"].dtype),
    }
    return dx, None, dparams


def _lstm_kernel(xp_ref, whh_ref, len_ref, h_out_ref, c_out_ref, carry,
                 *, hidden, seq_len, save_refs=()):
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

    if save_refs:
        # AD mode: stream this step's pre-activation gates and post-
        # update carries to HBM for the saved-state backward.
        gates_ref, c_seq_ref, h_seq_ref = save_refs
        gates_ref[0] = gates
        c_seq_ref[0] = carry[1]
        h_seq_ref[0] = carry[0]

    @pl.when(t == seq_len - 1)
    def _emit():
        h_out_ref[:] = carry[0]
        c_out_ref[:] = carry[1]


def _lstm_kernel_save(xp_ref, whh_ref, len_ref, h_out_ref, c_out_ref,
                      gates_ref, c_seq_ref, h_seq_ref, carry,
                      *, hidden, seq_len):
    _lstm_kernel(
        xp_ref, whh_ref, len_ref, h_out_ref, c_out_ref, carry,
        hidden=hidden, seq_len=seq_len,
        save_refs=(gates_ref, c_seq_ref, h_seq_ref),
    )


def _lstm_scan_pallas_impl(
    x: jnp.ndarray,        # [B, T, E]
    lengths: jnp.ndarray,  # [B] int
    params: Dict[str, jnp.ndarray],
    interpret: bool = False,
    save_states: bool = False,
):
    """Masked LSTM scan; returns final (h, c), each [B, H] f32.

    Drop-in equivalent of :func:`dl_vqa_tpu.ops.lstm.lstm_scan`.
    With ``save_states=True`` (the AD forward) additionally returns
    time-major f32 ``(gates_all [T,B,4H], c_all [T,B,H], h_all
    [T,B,H])`` for the saved-state backward.
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
    # Save mode streams three extra per-step blocks, so it tiles at half
    # the width to stay inside the ~16 MB VMEM budget with Mosaic's
    # double buffering.
    b_tile = batch
    for cand in ((64, 32, 16, 8) if save_states else (128, 64, 32, 16, 8)):
        if batch % cand == 0:
            b_tile = cand
            break
    b_tiles = batch // b_tile

    common_in_specs = [
        pl.BlockSpec((1, b_tile, 4 * hidden), lambda bt, t: (t, bt, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hidden, 4 * hidden), lambda bt, t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b_tile, 1), lambda bt, t: (bt, 0),
                     memory_space=pltpu.VMEM),
    ]
    final_spec = pl.BlockSpec((b_tile, hidden), lambda bt, t: (bt, 0),
                              memory_space=pltpu.VMEM)
    final_shape = jax.ShapeDtypeStruct((batch, hidden), jnp.float32)
    cost = pl.CostEstimate(
        flops=2 * seq_len * batch * hidden * 4 * hidden,
        bytes_accessed=x_proj.size * x_proj.dtype.itemsize
        + w_hh.size * w_hh.dtype.itemsize,
        transcendentals=4 * seq_len * batch * hidden,
    )
    operands = (x_proj, w_hh.astype(x.dtype), lengths_col)

    if not save_states:
        kernel = functools.partial(_lstm_kernel, hidden=hidden,
                                   seq_len=seq_len)
        h, c = pl.pallas_call(
            kernel,
            grid=(b_tiles, seq_len),
            out_shape=(final_shape, final_shape),
            in_specs=common_in_specs,
            out_specs=(final_spec, final_spec),
            scratch_shapes=[pltpu.VMEM((2, b_tile, hidden), jnp.float32)],
            cost_estimate=cost,
            interpret=interpret,
        )(*operands)
        return h, c

    def seq_spec(width):
        return pl.BlockSpec((1, b_tile, width), lambda bt, t: (t, bt, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_lstm_kernel_save, hidden=hidden,
                               seq_len=seq_len)
    h, c, gates_all, c_all, h_all = pl.pallas_call(
        kernel,
        grid=(b_tiles, seq_len),
        out_shape=(
            final_shape,
            final_shape,
            jax.ShapeDtypeStruct((seq_len, batch, 4 * hidden), jnp.float32),
            jax.ShapeDtypeStruct((seq_len, batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((seq_len, batch, hidden), jnp.float32),
        ),
        in_specs=common_in_specs,
        out_specs=(
            final_spec,
            final_spec,
            seq_spec(4 * hidden),
            seq_spec(hidden),
            seq_spec(hidden),
        ),
        scratch_shapes=[pltpu.VMEM((2, b_tile, hidden), jnp.float32)],
        cost_estimate=cost,
        interpret=interpret,
    )(*operands)
    return (h, c), (gates_all, c_all, h_all)
