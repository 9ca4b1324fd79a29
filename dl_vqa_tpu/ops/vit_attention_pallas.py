"""Pallas TPU kernel for ViT self-attention (flash-style, VMEM-resident).

The XLA path (models/vit.py ``_attention``) materializes, per layer and
per step at reference scale (batch 512, 4 heads, S=196, D=64): the
q/k/v head split + [B,S,H,D]->[B,H,S,D] transposes (~1.9 ms), the
``[B,H,S,S]`` logits and softmax tensors (~2.8 ms), and the av product +
head re-merge (~1.6 ms) — all HBM round trips (ViT eval profile,
docs/PERF_NOTES.md).

This kernel consumes the PACKED qkv projection ``[B, S, 3*H*D]`` exactly
as the fused qkv matmul produces it and writes the merged ``[B, S, H*D]``
attention output — no splits, no transposes, and the weights never leave
VMEM. Heads are addressed as 64-lane slices (supported by Mosaic at
64-aligned offsets). S fits VMEM whole, so this is one-shot softmax
rather than the online-softmax recurrence of true FlashAttention — the
same O(S*D) HBM property, simpler code.

Mosaic constraints honored:
* no batched ``dot_general`` (not lowered) — static per-image/per-head
  loops inside the program, the image-chunk grid amortizing overhead;
* NT matmul via dimension_numbers (contract last dims), no transpose;
* head outputs merged with a lane-aligned concat, single store.

Backward recomputes through the XLA reference implementation (identical
math), like the LSTM kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["vit_attention_qkv_pallas", "vit_attention_qkv_reference"]


def vit_attention_qkv_reference(qkv, num_heads):
    """XLA reference on the packed layout: qkv [B, S, 3*H*D] (packed as
    q|k|v, each head-major) -> out [B, S, H*D]."""
    batch, seq, three_hd = qkv.shape
    dim = three_hd // 3
    head = dim // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(batch, seq, num_heads, head).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / (head ** 0.5)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    weights = (e / e.sum(axis=-1, keepdims=True)).astype(qkv.dtype)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", weights, v, preferred_element_type=jnp.float32
    )
    return out.transpose(0, 2, 1, 3).reshape(batch, seq, dim).astype(qkv.dtype)


def _attention_kernel(qkv_ref, out_ref, *, chunk, num_heads, head, scale):
    dim = num_heads * head
    for i in range(chunk):
        outs = []
        for h in range(num_heads):
            q = qkv_ref[i, :, h * head : (h + 1) * head]
            k = qkv_ref[i, :, dim + h * head : dim + (h + 1) * head]
            v = qkv_ref[i, :, 2 * dim + h * head : 2 * dim + (h + 1) * head]
            # NT matmul: contract the head dim of both operands.
            s = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            out = jnp.dot(
                e.astype(qkv_ref.dtype), v,
                preferred_element_type=jnp.float32,
            )
            # Normalize the [S, D] output instead of the [S, S] weights.
            outs.append((out / denom).astype(out_ref.dtype))
        out_ref[i] = jnp.concatenate(outs, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def vit_attention_qkv_pallas(qkv, num_heads, interpret=False):
    """Flash-style attention on the packed qkv layout:
    [B, S, 3*H*D] -> [B, S, H*D]; the [S, S] weights never leave VMEM.
    Differentiable (backward via the XLA reference)."""
    return _vit_attention_impl(qkv, num_heads, interpret)


def _vit_attention_fwd(qkv, num_heads, interpret):
    return _vit_attention_impl(qkv, num_heads, interpret), (qkv,)


def _vit_attention_bwd(num_heads, interpret, residuals, g):
    (qkv,) = residuals
    _, vjp = jax.vjp(
        lambda t: vit_attention_qkv_reference(t, num_heads), qkv
    )
    return vjp(g)


vit_attention_qkv_pallas.defvjp(_vit_attention_fwd, _vit_attention_bwd)


def _pick_chunk(batch: int, seq: int, dim: int, itemsize: int) -> int:
    """Images per program: amortize grid overhead while keeping the
    double-buffered qkv/out blocks + softmax scratch inside VMEM."""
    budget = 10 * 1024 * 1024
    s_pad = -(-seq // 128) * 128
    score = s_pad * s_pad * 4  # live softmax scratch per head (f32)
    for chunk in (16, 8, 4, 2, 1):
        if batch % chunk != 0:
            continue
        blocks = 2 * chunk * seq * 4 * dim * itemsize  # qkv in + out
        if 2 * blocks + 2 * score <= budget:
            return chunk
    return 1


def _vit_attention_impl(qkv, num_heads, interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, seq, three_hd = qkv.shape
    dim = three_hd // 3
    head = dim // num_heads
    scale = 1.0 / (head ** 0.5)
    chunk = _pick_chunk(batch, seq, dim, qkv.dtype.itemsize)

    kernel = functools.partial(
        _attention_kernel, chunk=chunk, num_heads=num_heads, head=head,
        scale=scale,
    )
    return pl.pallas_call(
        kernel,
        grid=(batch // chunk,),
        out_shape=jax.ShapeDtypeStruct((batch, seq, dim), qkv.dtype),
        in_specs=[
            pl.BlockSpec((chunk, seq, three_hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, seq, dim), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * num_heads * seq * seq * head,
            bytes_accessed=4 * batch * seq * dim * qkv.dtype.itemsize,
            transcendentals=batch * num_heads * seq * seq,
        ),
        interpret=interpret,
    )(qkv)
