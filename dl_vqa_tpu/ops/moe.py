"""Mixture-of-Experts MLP with static GShard-style einsum dispatch.

New capability beyond the reference (which is a single-GPU dense model,
``/root/reference/models/model.py``): a sparsely-activated expert FFN for
the transformer blocks, built the TPU way —

* **Static shapes everywhere.** Routing is expressed as one-hot dispatch/
  combine tensors with a fixed per-expert ``capacity`` (tokens routed past
  capacity are dropped and ride the residual), so the whole layer is
  argmax + cumsum + three einsums: no ragged gathers, no data-dependent
  shapes, nothing XLA cannot tile onto the MXU.
* **Expert parallelism as a mesh axis.** Expert-major parameters
  (``w [E, ...]``) shard their leading dim over the ``'expert'`` mesh
  axis (``parallel/mesh.py``); the dispatch einsum's output is
  expert-major, so the SPMD partitioner inserts the all-to-all that moves
  each token group to its experts' devices — the TPU-native equivalent of
  the NCCL all-to-all in GPU MoE stacks, riding ICI.
* **f32 router.** Gate logits/softmax/cumsum run in f32 regardless of the
  compute dtype (bf16 routers mis-sort near-ties); only the big expert
  matmuls run in the model's compute dtype with f32 accumulation.

The algorithm is the standard top-k gating of GShard/Switch (Lepikhin et
al. 2020, Fedus et al. 2021): per slot, argmax over the not-yet-chosen
experts, position-in-expert by a cumulative sum over tokens, drop past
capacity, combine kept slots with their router probabilities (raw for
top-1 as in Switch, renormalized for top-k>=2 as in GShard — see
``top_k_gating``). The auxiliary load-balance loss is the Switch form
``E * sum_e f_e * P_e`` (f = fraction of tokens whose FIRST choice is e,
P = mean router probability of e), which is 1.0 at perfect balance.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from dl_vqa_tpu.models import initializers as init_lib

__all__ = ["init_moe_mlp", "moe_capacity", "top_k_gating", "moe_mlp"]


def moe_capacity(num_tokens: int, num_experts: int, top_k: int,
                 capacity_factor: float) -> int:
    """Per-expert token capacity: ``ceil(top_k * S * factor / E)``,
    at least 1."""
    return max(
        1, int(math.ceil(top_k * num_tokens * capacity_factor / num_experts))
    )


def init_moe_mlp(key, model_dim: int, hidden_dim: int,
                 num_experts: int) -> Dict:
    """Expert-major MoE FFN params.

    ``gate.w [D, E]`` (router; replicated — it is tiny), ``in.w
    [E, D, F]`` / ``in.b [E, F]`` / ``out.w [E, F, D]`` / ``out.b [E, D]``
    (leading expert axis, sharded over 'expert'; F additionally splits
    over 'model' — megatron within each expert). Same per-expert
    distributions as the dense MLP (torch kaiming-uniform fan-in)."""
    kg, k1, k2, k3, k4 = jax.random.split(key, 5)
    return {
        "gate": {
            "w": init_lib.uniform_fan_in(kg, (model_dim, num_experts),
                                         model_dim)
        },
        "in": {
            "w": init_lib.uniform_fan_in(
                k1, (num_experts, model_dim, hidden_dim), model_dim
            ),
            "b": init_lib.uniform_fan_in(
                k2, (num_experts, hidden_dim), model_dim
            ),
        },
        "out": {
            "w": init_lib.uniform_fan_in(
                k3, (num_experts, hidden_dim, model_dim), hidden_dim
            ),
            "b": init_lib.uniform_fan_in(
                k4, (num_experts, model_dim), hidden_dim
            ),
        },
    }


def top_k_gating(
    logits: jnp.ndarray, top_k: int, capacity: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """GShard top-k gating with capacity.

    Args:
      logits: router logits ``[G, S, E]`` (any float dtype; promoted to
        f32 internally).
      top_k: experts per token (1 = Switch, 2 = GShard default).
      capacity: max tokens per expert (per group).

    Returns ``(dispatch, combine, aux_loss)``:
      dispatch ``[G, S, E, C]`` f32 0/1 — token (g, s) occupies slot c of
        expert e;
      combine ``[G, S, E, C]`` f32 — dispatch scaled by the token's
        router probability: raw for ``top_k == 1`` (Switch — the task
        gradient must reach the router through the gate scale) and
        renormalized over the kept slots for ``top_k >= 2`` (GShard;
        kept slots sum to 1 per token);
      aux_loss — scalar Switch load-balance loss (1.0 at uniform).
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    num_experts = logits.shape[-1]
    if top_k > num_experts:
        raise ValueError(
            f"top_k={top_k} exceeds num_experts={num_experts}"
        )
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)  # [G, S, E]

    counts = jnp.zeros(probs.shape[:1] + probs.shape[2:], jnp.float32)
    remaining = probs
    dispatch = jnp.zeros(probs.shape + (capacity,), jnp.float32)
    gate_sum = jnp.zeros(probs.shape[:2], jnp.float32)
    slots = []
    aux = None
    for _ in range(top_k):
        idx = jnp.argmax(remaining, axis=-1)                    # [G, S]
        oh = jax.nn.one_hot(idx, num_experts, dtype=jnp.float32)
        if aux is None:
            # Switch balance loss from the FIRST choice: f_e = fraction of
            # tokens whose top expert is e (pre-capacity, so the loss sees
            # the imbalance the drops hide), P_e = mean router prob.
            frac = oh.mean(axis=(0, 1))
            mean_prob = probs.mean(axis=(0, 1))
            aux = num_experts * jnp.sum(frac * mean_prob)
        # Position of each token within its chosen expert: tokens earlier
        # in the group this slot, plus everything kept in earlier slots.
        pos_in_e = jnp.cumsum(oh, axis=1) - oh + counts[:, None, :]
        keep = oh * (pos_in_e < capacity)                       # [G, S, E]
        counts = counts + keep.sum(axis=1)
        pos = (pos_in_e * oh).sum(-1).astype(jnp.int32)         # [G, S]
        pos_oh = jax.nn.one_hot(pos, capacity, dtype=jnp.float32)
        slot_dispatch = keep[..., None] * pos_oh[:, :, None, :]
        gate = (probs * keep).sum(-1)                           # 0 if dropped
        dispatch = dispatch + slot_dispatch
        slots.append((slot_dispatch, gate))
        gate_sum = gate_sum + gate
        remaining = remaining * (1.0 - oh)
    if top_k == 1:
        # Switch semantics (Fedus et al. 2021 §2.2): scale the expert
        # output by the RAW router probability. Renormalizing a single
        # gate to g/(g+eps) ~= 1 would cancel the gate out of the forward
        # and leave the router with ~zero task gradient (measured 3.5e-6
        # vs 6.0 for top-2 on the same inputs) — the router would train
        # only on the aux balance loss and experts would never specialize.
        d, g = slots[0]
        combine = d * g[:, :, None, None]
        return dispatch, combine, aux
    # Renormalization epsilon: must be ADDED, not maximum(gate_sum, tiny).
    # A token dropped from all its top-k experts has gate_sum == 0; with
    # denom == float32 tiny the division's VJP computes -g/denom**2 and
    # tiny**2 underflows to 0 -> 0/0 -> NaN in the backward (the forward
    # is fine, which is why eval never sees it). 1e-9 keeps denom**2
    # comfortably normal while being negligible against any real
    # gate_sum (>= 1/E after softmax over the chosen expert).
    denom = gate_sum + 1e-9
    combine = sum(
        d * (g / denom)[:, :, None, None] for d, g in slots
    )
    return dispatch, combine, aux


def moe_mlp(
    x: jnp.ndarray,
    params: Dict,
    top_k: int,
    capacity_factor: float,
    dtype=jnp.float32,
    aux_sink: Optional[list] = None,
) -> jnp.ndarray:
    """Sparsely-activated expert FFN: ``x [G, S, D] -> [G, S, D]``.

    Each group's tokens are routed independently (group = image/sequence;
    capacity is per group, so routing never mixes batch elements and the
    result is batch-size invariant). Tokens dropped past capacity
    contribute 0 here and survive through the block's residual.

    ``aux_sink``, when given, receives the layer's scalar load-balance
    loss (a within-trace side channel; the caller folds it into the
    training objective — see ``train/steps._forward_loss``).
    """
    groups, tokens, model_dim = x.shape
    num_experts = params["in"]["w"].shape[0]
    capacity = moe_capacity(tokens, num_experts, top_k, capacity_factor)

    logits = jnp.einsum(
        "gsd,de->gse", x.astype(jnp.float32), params["gate"]["w"]
    )
    dispatch, combine, aux = top_k_gating(logits, top_k, capacity)
    if aux_sink is not None:
        aux_sink.append(aux)

    # Dispatch: [G, S, D] tokens -> [E, G, C, D] expert slots. The output
    # is expert-major while x is batch-sharded, so under a dp x ep mesh
    # the partitioner materializes this einsum as the all-to-all.
    xin = jnp.einsum(
        "gsec,gsd->egcd", dispatch.astype(dtype), x.astype(dtype)
    )
    h = jax.nn.relu(
        jnp.einsum("egcd,edf->egcf", xin, params["in"]["w"].astype(dtype),
                   preferred_element_type=jnp.float32)
        + params["in"]["b"][:, None, None, :]
    ).astype(dtype)
    y = (
        jnp.einsum("egcf,efd->egcd", h, params["out"]["w"].astype(dtype),
                   preferred_element_type=jnp.float32)
        + params["out"]["b"][:, None, None, :]
    ).astype(dtype)
    # Combine: back to token-major (the reverse all-to-all), scaled by the
    # router probabilities (raw top-1 / renormalized top-k, see
    # top_k_gating).
    return jnp.einsum("gsec,egcd->gsd", combine.astype(dtype), y)
