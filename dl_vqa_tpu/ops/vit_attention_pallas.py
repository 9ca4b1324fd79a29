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

Two backward strategies are exported:

* :func:`vit_attention_qkv_pallas` — backward recomputes through the XLA
  reference implementation (identical math), like the LSTM kernel.
  Eval-dispatch default.
* :func:`vit_attention_qkv_pallas_fused_bwd` — same forward kernel, but
  the backward is a SECOND Pallas kernel (flash-style recompute): per
  image/head it recomputes the softmax from the saved qkv in VMEM and
  emits the packed dqkv with five MXU matmuls — none of the ``[B,H,S,S]``
  logits/exp/weights tensors, their cotangents, or the head-layout
  transposes ever touch HBM. This is the training-path kernel; the
  round-2 analysis projected an XLA-recompute backward to only tie XLA
  precisely because it re-materializes those tensors — the kernel
  doesn't.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "vit_attention_qkv_pallas",
    "vit_attention_qkv_pallas_fused_bwd",
    "vit_attention_qkv_reference",
]


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


def _attention_bwd_kernel(qkv_ref, g_ref, dqkv_ref, *, chunk, num_heads,
                          head, scale):
    """Flash-style attention backward: recompute the softmax per
    image/head from the saved packed qkv (all in VMEM), then the four
    gradient matmuls. Layouts mirror the forward kernel: head slices at
    64-aligned lane offsets, NT/TN contractions via dimension_numbers
    (no transposes materialized). Writes packed dqkv [chunk, S, 3*H*D].

    Math (z = q k^T * scale, w = softmax(z), out = w v, g = d(out)):
      dv = w^T g
      dw = g v^T
      dz = w * (dw - rowsum(dw * w))
      dq = scale * dz k ;  dk = scale * dz^T q
    """
    dim = num_heads * head
    for i in range(chunk):
        dqs, dks, dvs = [], [], []
        for h in range(num_heads):
            q = qkv_ref[i, :, h * head : (h + 1) * head]
            k = qkv_ref[i, :, dim + h * head : dim + (h + 1) * head]
            v = qkv_ref[i, :, 2 * dim + h * head : 2 * dim + (h + 1) * head]
            g = g_ref[i, :, h * head : (h + 1) * head]
            # Recompute the softmax exactly as the forward kernel did.
            s = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            w = (e / denom).astype(qkv_ref.dtype)
            # dv[k, d] = sum_q w[q, k] g[q, d]  (TN: contract dim 0)
            dv = jax.lax.dot_general(
                w, g,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # dw[q, k] = sum_d g[q, d] v[k, d]  (NT: contract last dims)
            dw = jax.lax.dot_general(
                g, v,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # Softmax backward in f32 on the VPU.
            wf = w.astype(jnp.float32)
            dz = (wf * (dw - jnp.sum(dw * wf, axis=-1, keepdims=True))
                  ).astype(qkv_ref.dtype)
            # dq[q, d] = scale * sum_k dz[q, k] k[k, d]
            dq = jax.lax.dot_general(
                dz, k,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            # dk[k, d] = scale * sum_q dz[q, k] q[q, d]  (TN)
            dk = jax.lax.dot_general(
                dz, q,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            dqs.append(dq.astype(dqkv_ref.dtype))
            dks.append(dk.astype(dqkv_ref.dtype))
            dvs.append(dv.astype(dqkv_ref.dtype))
        dqkv_ref[i] = jnp.concatenate(dqs + dks + dvs, axis=-1)


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


def _pick_chunk_bwd(batch: int, seq: int, dim: int, itemsize: int) -> int:
    """Images per backward program: the backward holds ~5 live [S, S] f32
    softmax/grad tensors per head plus three data blocks (qkv, g, dqkv),
    so its chunk is chosen against the same 10 MiB working budget."""
    budget = 10 * 1024 * 1024
    s_pad = -(-seq // 128) * 128
    score = s_pad * s_pad * 4 * 5  # s/e/w/dw/dz live per head (f32)
    for chunk in (16, 8, 4, 2, 1):
        if batch % chunk != 0:
            continue
        blocks = chunk * seq * (3 * dim + dim + 3 * dim) * itemsize
        if 2 * blocks + 2 * score <= budget:
            return chunk
    return 1


def _vit_attention_bwd_impl(qkv, g, num_heads, interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, seq, three_hd = qkv.shape
    dim = three_hd // 3
    head = dim // num_heads
    scale = 1.0 / (head ** 0.5)
    chunk = _pick_chunk_bwd(batch, seq, dim, qkv.dtype.itemsize)

    kernel = functools.partial(
        _attention_bwd_kernel, chunk=chunk, num_heads=num_heads, head=head,
        scale=scale,
    )
    return pl.pallas_call(
        kernel,
        grid=(batch // chunk,),
        out_shape=jax.ShapeDtypeStruct((batch, seq, three_hd), qkv.dtype),
        in_specs=[
            pl.BlockSpec((chunk, seq, three_hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, seq, dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, seq, three_hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            # 5 matmuls of 2*S*S*D flops per (image, head).
            flops=10 * batch * num_heads * seq * seq * head,
            bytes_accessed=7 * batch * seq * dim * qkv.dtype.itemsize,
            transcendentals=batch * num_heads * seq * seq,
        ),
        interpret=interpret,
    )(qkv, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def vit_attention_qkv_pallas_fused_bwd(qkv, num_heads, interpret=False):
    """Same forward kernel as :func:`vit_attention_qkv_pallas`, but the
    backward is a Pallas flash-recompute kernel (residual = packed qkv
    only; no [B,H,S,S] tensor ever reaches HBM in either direction).
    Training-path dispatch — see models/vit.py."""
    return _vit_attention_impl(qkv, num_heads, interpret)


def _vit_attention_fused_fwd(qkv, num_heads, interpret):
    return _vit_attention_impl(qkv, num_heads, interpret), (qkv,)


def _vit_attention_fused_bwd(num_heads, interpret, residuals, g):
    (qkv,) = residuals
    return (_vit_attention_bwd_impl(qkv, g, num_heads, interpret),)


vit_attention_qkv_pallas_fused_bwd.defvjp(
    _vit_attention_fused_fwd, _vit_attention_fused_bwd
)
