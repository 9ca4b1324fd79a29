"""Ring attention: sequence-parallel self-attention over a 'seq' mesh axis.

New scale-out capability beyond the reference (single GPU, no attention
at all — SURVEY.md §5 'Long-context / sequence parallelism: absent').
Built the TPU way:

* The token dimension is sharded over the ``'seq'`` mesh axis
  (``tpu.mesh.seq``); every device holds ``S / n`` query tokens and one
  ``S / n`` block of keys/values.
* Inside a ``shard_map``, the k/v block rotates around the ring with
  ``lax.ppermute`` (point-to-point over ICI) while each device folds the
  visiting block into its queries' softmax with the online (streaming)
  renormalization of flash attention — no device ever materializes the
  full ``[S, S]`` weights or the full k/v.
* The rotation is a ``lax.scan`` of exactly ``n`` static steps, so the
  whole ring is one compiled program and reverse-mode AD works out of
  the box (``ppermute`` has an exact transpose: the reverse ring).

At VQA scale (196 ViT tokens) this is a capability/memory lever, not a
speed one — attention here is a small fraction of the step (see
docs/PERF_NOTES.md) — but it is what makes longer-context variants
(448px images → 784 tokens, document-length questions) fit: per-device
attention memory scales as S/n.

Math note: softmax statistics accumulate in f32 regardless of the
compute dtype; the matmuls run in the input dtype with f32 accumulation
(matching the XLA attention path in models/vit.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["ring_attention_block", "ring_attention_qkv"]


def ring_attention_block(q, k, v, axis_name: str, scale: float):
    """Per-shard ring attention body (call inside ``shard_map``).

    Args:
      q, k, v: ``[B, H, S_local, Dh]`` — this device's query tokens and
        its resident k/v block (the same ``S_local = S / n`` slice).
      axis_name: the mesh axis forming the ring.
      scale: logit scale (``1 / sqrt(Dh)``).

    Returns ``[B, H, S_local, Dh]`` — exactly
    ``softmax(q @ k_full^T * scale) @ v_full`` for this device's queries.
    """
    n = lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    shape = q.shape[:-1]  # [B, H, S_local]

    def fold(m, l, o, k_blk, v_blk):
        """Fold one visiting k/v block into the online softmax state."""
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k_blk,
            preferred_element_type=jnp.float32,
        ) * scale
        m_blk = logits.max(axis=-1)
        m_new = jnp.maximum(m, m_blk)
        alpha = jnp.exp(m - m_new)          # rescale prior contributions
        p = jnp.exp(logits - m_new[..., None])
        l = l * alpha + p.sum(axis=-1)
        o = o * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v_blk.dtype), v_blk,
            preferred_element_type=jnp.float32,
        )
        return m_new, l, o

    def step(carry, _):
        m, l, o, k_blk, v_blk = carry
        m, l, o = fold(m, l, o, k_blk, v_blk)
        k_blk = lax.ppermute(k_blk, axis_name, perm)
        v_blk = lax.ppermute(v_blk, axis_name, perm)
        return (m, l, o, k_blk, v_blk), None

    init = (
        jnp.full(shape, -jnp.inf, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(q.shape, jnp.float32),
        k, v,
    )
    # n-1 rotate-and-fold steps in the scan, then fold the last visiting
    # block OUTSIDE it: a length-n scan would end with one more ppermute
    # pair whose result is discarded — a wasted ICI hop per layer per
    # step (and another in the transposed ring of the backward).
    (m, l, o, k_last, v_last), _ = lax.scan(step, init, None, length=n - 1)
    _, l, o = fold(m, l, o, k_last, v_last)
    return (o / l[..., None]).astype(q.dtype)


def ring_attention_qkv(
    qkv: jnp.ndarray,
    num_heads: int,
    mesh: Mesh,
    seq_axis: str = "seq",
    data_axis: Optional[str] = "data",
) -> jnp.ndarray:
    """Sequence-parallel attention on a packed qkv projection.

    ``qkv [B, S, 3D]`` enters sharded ``P(data_axis, seq_axis, None)``
    (any other placement is resharded by the shard_map boundary — e.g. a
    tensor-parallel qkv gathers its 'model' shards here, since every
    head needs its full feature slice). Output ``[B, S, D]`` leaves with
    the same batch/sequence sharding, merged heads.
    """
    dim3 = qkv.shape[-1]
    dim = dim3 // 3
    head = dim // num_heads
    scale = 1.0 / (head ** 0.5)
    has_data = data_axis is not None and data_axis in mesh.axis_names
    spec_in = P(data_axis if has_data else None, seq_axis, None)

    def body(qkv_blk):
        batch, s_local, _ = qkv_blk.shape
        q, k, v = jnp.split(qkv_blk, 3, axis=-1)

        def heads(t):
            return t.reshape(batch, s_local, num_heads, head).transpose(
                0, 2, 1, 3
            )

        out = ring_attention_block(
            heads(q), heads(k), heads(v), seq_axis, scale
        )
        return out.transpose(0, 2, 1, 3).reshape(batch, s_local, dim)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec_in,),
        out_specs=spec_in,
        check_vma=False,
    )(qkv)
