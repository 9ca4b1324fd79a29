"""Variable-length (bi-)LSTM as a masked ``lax.scan`` — TPU-native
replacement for ``pack_padded_sequence`` + ``nn.LSTM``.

The reference feeds a packed batch through a bidirectional LSTM and keeps
only the final CELL state of each direction
(``/root/reference/models/model.py:159-166``). Packed-sequence semantics:

* forward direction: state after consuming tokens ``0 .. len-1``;
* backward direction: state after consuming tokens ``len-1 .. 0`` —
  i.e. a forward scan over the *reversed valid prefix*;
* pad positions never touch the state.

TPU-first design choices:

* the input projection ``x @ W_ih + b`` for ALL timesteps is hoisted out
  of the scan into one big ``[B*T, E] x [E, 4H]`` matmul (MXU-friendly),
  so the sequential part is only the ``[B, H] x [H, 4H]`` recurrent
  matmul per step;
* variable length is handled by masking the carry update (no dynamic
  shapes, everything compiles to one static program);
* gate layout matches PyTorch (``i, f, g, o`` chunks) so reference
  checkpoints import directly.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "lstm_cell",
    "lstm_scan",
    "lstm_scan_outputs",
    "lstm_scan_outputs_final",
    "bilstm_token_states",
    "bilstm_tokens_and_final_cell",
    "reverse_valid_prefix",
    "bilstm_final_cell",
]


def lstm_cell(
    x_proj: jnp.ndarray,  # [B, 4H] = x @ W_ih + b (precomputed)
    h: jnp.ndarray,       # [B, H]
    c: jnp.ndarray,       # [B, H]
    w_hh: jnp.ndarray,    # [H, 4H]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One LSTM step with PyTorch gate order (i, f, g, o)."""
    gates = x_proj + jnp.dot(h, w_hh, preferred_element_type=jnp.float32)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def lstm_scan(
    x: jnp.ndarray,        # [B, T, E]
    lengths: jnp.ndarray,  # [B] int
    params: Dict[str, jnp.ndarray],  # w_ih [E,4H], w_hh [H,4H], b [4H]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run a masked forward LSTM; return final (h, c), each [B, H].

    "Final" means the state at step ``lengths[b] - 1`` for each sample —
    exactly the packed-sequence final state.
    """
    w_ih, w_hh, b = params["w_ih"], params["w_hh"], params["b"]
    batch, seq_len, _ = x.shape
    hidden = w_hh.shape[0]

    # Hoist the input projection: one MXU matmul for every timestep.
    x_proj = (
        jnp.dot(x.reshape(batch * seq_len, -1), w_ih,
                preferred_element_type=jnp.float32)
        .reshape(batch, seq_len, 4 * hidden)
        + b
    )
    x_proj_t = jnp.swapaxes(x_proj, 0, 1)  # time-major [T, B, 4H]
    step_mask = (
        jnp.arange(seq_len, dtype=lengths.dtype)[:, None] < lengths[None, :]
    )  # [T, B]

    def step(carry, inputs):
        h, c = carry
        xt, mask = inputs
        h_new, c_new = lstm_cell(xt, h, c, w_hh)
        keep = mask[:, None]
        return (jnp.where(keep, h_new, h), jnp.where(keep, c_new, c)), None

    init = (
        jnp.zeros((batch, hidden), dtype=x_proj.dtype),
        jnp.zeros((batch, hidden), dtype=x_proj.dtype),
    )
    (h_final, c_final), _ = jax.lax.scan(step, init, (x_proj_t, step_mask))
    return h_final, c_final


def lstm_scan_outputs(
    x: jnp.ndarray,        # [B, T, E]
    lengths: jnp.ndarray,  # [B] int
    params: Dict[str, jnp.ndarray],
) -> jnp.ndarray:
    """Masked LSTM scan returning the hidden state at EVERY step,
    [B, T, H]; pad positions carry the last valid state (callers mask)."""
    return lstm_scan_outputs_final(x, lengths, params)[0]


def lstm_scan_outputs_final(
    x: jnp.ndarray,        # [B, T, E]
    lengths: jnp.ndarray,  # [B] int
    params: Dict[str, jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked LSTM scan returning (per-step h [B, T, H], final c [B, H])
    from ONE scan — the final cell state is the scan carry that
    :func:`lstm_scan_outputs` would discard, so callers needing both
    (the 'co' attention text path) avoid re-running the serial
    recurrence. The final c is bit-identical to :func:`lstm_scan`'s
    (same masked cell updates in the same order)."""
    w_ih, w_hh, b = params["w_ih"], params["w_hh"], params["b"]
    batch, seq_len, _ = x.shape
    hidden = w_hh.shape[0]
    x_proj = (
        jnp.dot(x.reshape(batch * seq_len, -1), w_ih,
                preferred_element_type=jnp.float32)
        .reshape(batch, seq_len, 4 * hidden)
        + b
    )
    x_proj_t = jnp.swapaxes(x_proj, 0, 1)
    step_mask = (
        jnp.arange(seq_len, dtype=lengths.dtype)[:, None] < lengths[None, :]
    )

    def step(carry, inputs):
        h, c = carry
        xt, mask = inputs
        h_new, c_new = lstm_cell(xt, h, c, w_hh)
        keep = mask[:, None]
        h = jnp.where(keep, h_new, h)
        c = jnp.where(keep, c_new, c)
        return (h, c), h

    init = (
        jnp.zeros((batch, hidden), dtype=x_proj.dtype),
        jnp.zeros((batch, hidden), dtype=x_proj.dtype),
    )
    (_, c_final), hs = jax.lax.scan(step, init, (x_proj_t, step_mask))
    return jnp.swapaxes(hs, 0, 1), c_final  # [B, T, H], [B, H]


def bilstm_token_states(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    fwd_params: Dict[str, jnp.ndarray],
    bwd_params: Dict[str, jnp.ndarray],
) -> jnp.ndarray:
    """Per-token bi-LSTM states [B, T, 2H] (packed-LSTM output semantics:
    backward states re-aligned to original positions; pads zeroed)."""
    return bilstm_tokens_and_final_cell(x, lengths, fwd_params,
                                        bwd_params)[0]


def bilstm_tokens_and_final_cell(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    fwd_params: Dict[str, jnp.ndarray],
    bwd_params: Dict[str, jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(per-token states [B, T, 2H], final cells [c_fwd, c_bwd] [B, 2H])
    from TWO scans instead of the four that separate
    :func:`bilstm_token_states` + :func:`bilstm_final_cell` calls would
    run — each direction's final cell rides the same scan that emits its
    token states (the serial recurrence is the text path's bottleneck).
    Values are bit-identical to the separate calls."""
    seq_len = x.shape[1]
    h_fwd, c_fwd = lstm_scan_outputs_final(x, lengths, fwd_params)
    h_bwd_rev, c_bwd = lstm_scan_outputs_final(
        reverse_valid_prefix(x, lengths), lengths, bwd_params
    )
    # position t (original) was processed at step len-1-t of the reversed scan
    h_bwd = reverse_valid_prefix(h_bwd_rev, lengths)
    mask = (
        jnp.arange(seq_len, dtype=lengths.dtype)[None, :] < lengths[:, None]
    )
    tokens = jnp.concatenate([h_fwd, h_bwd], axis=-1)
    return tokens * mask[..., None], jnp.concatenate([c_fwd, c_bwd], axis=-1)


def reverse_valid_prefix(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse each sample's valid prefix: out[b, t] = x[b, len_b-1-t]
    for t < len_b (positions >= len_b hold clamped junk that the masked
    scan never reads into the carry)."""
    seq_len = x.shape[1]
    t = jnp.arange(seq_len, dtype=lengths.dtype)[None, :]          # [1, T]
    src = jnp.clip(lengths[:, None] - 1 - t, 0, seq_len - 1)        # [B, T]
    return jnp.take_along_axis(x, src[:, :, None], axis=1)


def bilstm_final_cell(
    x: jnp.ndarray,        # [B, T, E]
    lengths: jnp.ndarray,  # [B]
    fwd_params: Dict[str, jnp.ndarray],
    bwd_params: Dict[str, jnp.ndarray],
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Bidirectional LSTM final cell states, concatenated [c_fwd, c_bwd]
    -> [B, 2H] (layout of ref ``model.py:164-166``: the torch cell state
    ``[2, B, H]`` transposed and flattened, direction 0 = forward).

    ``use_pallas=True`` routes the recurrence through the Pallas TPU
    kernel (W_hh VMEM-resident, bf16 recurrent matmul) when running on
    TPU — measured ~20% faster than the XLA scan per direction."""
    scan = lstm_scan
    if use_pallas and jax.default_backend() == "tpu":
        from dl_vqa_tpu.ops.lstm_pallas import lstm_scan_pallas

        scan = lstm_scan_pallas
    _, c_fwd = scan(x, lengths, fwd_params)
    _, c_bwd = scan(reverse_valid_prefix(x, lengths), lengths, bwd_params)
    return jnp.concatenate([c_fwd, c_bwd], axis=-1)
