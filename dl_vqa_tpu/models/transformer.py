"""Transformer question encoder (BASELINE config 5 variant).

A pre-LN transformer over the embedded question tokens with a padding
mask, pooled by masked mean. Replaces the bi-LSTM when
``train.text.encoder: transformer``; output width is
``question_features`` (the model's ``TextConfig.output_features`` handles
the difference from the 2x bi-LSTM width).

TPU notes: fixed sequence length (compile-time pad), fused QKV projection
(one MXU matmul), attention logits masked additively, everything batched —
no ragged shapes anywhere.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from dl_vqa_tpu.models import initializers as init_lib

__all__ = ["init_transformer_text", "apply_transformer_text"]


def _layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                eps: float = 1e-5) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias).astype(
        x.dtype
    )


def init_transformer_text(key, num_tokens: int, embedding_features: int,
                          model_dim: int, num_heads: int,
                          num_layers: int, max_positions: int = 64) -> Dict:
    """Parameter tree: embedding, input proj, positional embedding,
    ``num_layers`` pre-LN blocks, final LN.

    ``max_positions`` sizes the learned positional table
    (``train.text.max_positions``); it must cover the dataset's
    ``max_question_length``."""
    keys = jax.random.split(key, 4 + 4 * num_layers)
    params: Dict = {
        "embedding": init_lib.embedding_params(
            keys[0], num_tokens, embedding_features
        ),
        "in_proj": init_lib.linear_params(
            keys[1], embedding_features, model_dim
        ),
        "pos": jax.random.normal(
            keys[2], (max_positions, model_dim), jnp.float32
        ) * 0.02,
        "final_ln": {
            "scale": jnp.ones(model_dim), "bias": jnp.zeros(model_dim)
        },
        "layers": [],
    }
    for layer in range(num_layers):
        k1, k2, k3, k4 = keys[3 + 4 * layer : 7 + 4 * layer]
        params["layers"].append(
            {
                "ln1": {"scale": jnp.ones(model_dim),
                        "bias": jnp.zeros(model_dim)},
                "qkv": init_lib.linear_params(k1, model_dim, 3 * model_dim),
                "out": init_lib.linear_params(k2, model_dim, model_dim),
                "ln2": {"scale": jnp.ones(model_dim),
                        "bias": jnp.zeros(model_dim)},
                "mlp_in": init_lib.linear_params(k3, model_dim, 4 * model_dim),
                "mlp_out": init_lib.linear_params(k4, 4 * model_dim, model_dim),
            }
        )
    return params


def _self_attention(x: jnp.ndarray, layer: Dict, mask: jnp.ndarray,
                    num_heads: int, dtype) -> jnp.ndarray:
    batch, seq, dim = x.shape
    head = dim // num_heads
    qkv = jnp.dot(x, layer["qkv"]["w"].astype(dtype),
                  preferred_element_type=jnp.float32) + layer["qkv"]["b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(batch, seq, num_heads, head).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(head)
    logits = jnp.where(mask[:, None, None, :], logits, -1e30)
    weights = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v.astype(dtype),
                     preferred_element_type=jnp.float32)
    out = out.transpose(0, 2, 1, 3).reshape(batch, seq, dim).astype(dtype)
    return (
        jnp.dot(out, layer["out"]["w"].astype(dtype),
                preferred_element_type=jnp.float32)
        + layer["out"]["b"]
    )


def apply_transformer_text(
    params: Dict,
    questions: jnp.ndarray,  # [B, T] int
    lengths: jnp.ndarray,    # [B]
    num_heads: int,
    dropout: float,
    train: bool,
    rng,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (pooled [B, D], tokens [B, T, D], valid_mask [B, T]).

    ``train.text.dropout`` applies at the standard pre-LN sites: after the
    embedding projection and on each sublayer's residual branch."""
    # Shared helpers from the top model (same inverted-dropout semantics
    # everywhere, incl. the loud failure on train=True without an rng).
    from dl_vqa_tpu.models.vqa import _dropout, _site_rng

    seq = questions.shape[1]
    if seq > params["pos"].shape[0]:
        raise ValueError(
            f"Question length {seq} exceeds the positional table size "
            f"{params['pos'].shape[0]}; raise train.text.max_positions to "
            f"at least the dataset's max_question_length and retrain."
        )
    mask = jnp.arange(seq)[None, :] < lengths[:, None]

    def site_rng(site):
        return _site_rng(rng, site)

    table = params["embedding"]
    x = jnp.take(table, questions, axis=0)
    x = x * (questions > 0)[..., None]
    x = (
        jnp.dot(x.astype(dtype), params["in_proj"]["w"].astype(dtype),
                preferred_element_type=jnp.float32)
        + params["in_proj"]["b"]
    )
    x = (x + params["pos"][:seq]).astype(dtype)
    x = _dropout(x, dropout, train, site_rng(0))

    for idx, layer in enumerate(params["layers"]):
        h = _layer_norm(x, layer["ln1"]["scale"], layer["ln1"]["bias"])
        att = _self_attention(h, layer, mask, num_heads, dtype).astype(dtype)
        x = x + _dropout(att, dropout, train, site_rng(2 * idx + 1))
        h = _layer_norm(x, layer["ln2"]["scale"], layer["ln2"]["bias"])
        h = jax.nn.relu(
            jnp.dot(h, layer["mlp_in"]["w"].astype(dtype),
                    preferred_element_type=jnp.float32)
            + layer["mlp_in"]["b"]
        ).astype(dtype)
        mlp = (
            jnp.dot(h, layer["mlp_out"]["w"].astype(dtype),
                    preferred_element_type=jnp.float32)
            + layer["mlp_out"]["b"]
        ).astype(dtype)
        x = x + _dropout(mlp, dropout, train, site_rng(2 * idx + 2))

    x = _layer_norm(x, params["final_ln"]["scale"], params["final_ln"]["bias"])
    tokens = x.astype(jnp.float32)
    denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1).astype(jnp.float32)
    pooled = (tokens * mask[..., None]).sum(axis=1) / denom
    return pooled, tokens, mask
