"""Attention fusion variants beyond the reference's single-pass attention.

* ``stacked`` — SAN-style stacked attention (BASELINE config 3): each
  glimpse refines the query with the previously attended image feature
  ("Stacked Attention Networks", Yang et al. 2016 — pattern only, written
  fresh). Output keeps the reference's contract: concatenated per-glimpse
  attended features [B, G*C].
* ``co`` — co-attention (BASELINE config 5): question-guided image
  attention (as in the base model) plus image-guided attention over the
  question TOKENS; the classifier consumes [v_attended, q_attended]
  instead of [v_attended, q_pooled].

Both variants plug into the same classifier input contract
(glimpses * image_channels + text_output_features) so the config schema
stays the reference's.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from dl_vqa_tpu.models import initializers as init_lib

__all__ = [
    "init_stacked_attention",
    "apply_stacked_attention",
    "init_co_attention",
    "apply_co_attention",
]


# ------------------------------------------------------------- stacked

def init_stacked_attention(key, v_features: int, q_features: int,
                           mid_features: int, glimpses: int,
                           do_option: str = "+") -> Dict:
    keys = jax.random.split(key, 2 + 2 * glimpses)
    # '|' fuses by concatenation, so the score conv reads 2*mid features
    # (same sizing rule as the 'single' and 'co' variants).
    x_in = 2 * mid_features if do_option == "|" else mid_features
    params: Dict = {
        "v_conv": init_lib.conv_params(keys[0], 1, v_features, mid_features,
                                       use_bias=False),
        "q_lin": init_lib.linear_params(keys[1], q_features, mid_features),
        "layers": [],
    }
    for g in range(glimpses):
        k_score, k_update = keys[2 + 2 * g : 4 + 2 * g]
        layer = {
            "score": init_lib.conv_params(k_score, 1, x_in, 1),
        }
        if g + 1 < glimpses:
            layer["update"] = init_lib.linear_params(
                k_update, v_features, mid_features
            )
        params["layers"].append(layer)
    return params


def apply_stacked_attention(params: Dict, v: jnp.ndarray, q: jnp.ndarray,
                            do_option: str, dropout_fn, dtype) -> jnp.ndarray:
    """v: [B, H, W, C] (L2-normalized), q: [B, Q] -> [B, G*C]."""
    batch, h, w, channels = v.shape
    v_flat = v.reshape(batch, h * w, channels).astype(jnp.float32)
    # Accumulate in f32 but STORE [B, S, mid] in the compute dtype — same
    # rationale as vqa.attention_logits: this projection (and the fused
    # relu tensor derived from it each glimpse) dominates the attention
    # stage's HBM traffic at reference scale.
    v_proj = jnp.einsum(
        "bhwc,cd->bhwd", dropout_fn(v, 0).astype(dtype),
        params["v_conv"]["w"][0, 0].astype(dtype),
        preferred_element_type=jnp.float32,
    ).reshape(batch, h * w, -1).astype(dtype)
    u = (
        jnp.dot(dropout_fn(q, 1).astype(dtype),
                params["q_lin"]["w"].astype(dtype),
                preferred_element_type=jnp.float32)
        + params["q_lin"]["b"]
    ).astype(dtype)

    glimpse_feats = []
    for g, layer in enumerate(params["layers"]):
        if do_option == "*":
            fused = jax.nn.relu(v_proj * u[:, None, :])
        elif do_option == "|":
            fused = jax.nn.relu(
                jnp.concatenate(
                    [v_proj, jnp.broadcast_to(u[:, None, :], v_proj.shape)],
                    axis=-1,
                )
            )
        else:  # '+'
            fused = jax.nn.relu(v_proj + u[:, None, :])
        scores = (
            jnp.einsum("bsd,do->bso", fused.astype(dtype),
                       layer["score"]["w"][0, 0].astype(dtype),
                       preferred_element_type=jnp.float32)
            + layer["score"]["b"]
        )[..., 0]
        weights = jax.nn.softmax(scores, axis=1)
        attended = jnp.einsum("bs,bsc->bc", weights, v_flat,
                              preferred_element_type=jnp.float32)
        glimpse_feats.append(attended)
        if "update" in layer:
            # Keep u in the compute dtype: a f32 u would re-promote the
            # next glimpse's fused tensor back to f32 storage.
            u = (
                u + jnp.dot(attended.astype(dtype),
                            layer["update"]["w"].astype(dtype),
                            preferred_element_type=jnp.float32)
                + layer["update"]["b"]
            ).astype(dtype)
    return jnp.concatenate(glimpse_feats, axis=1)


# ------------------------------------------------------------- co-attention

def init_co_attention(key, v_features: int, q_features: int,
                      token_features: int, mid_features: int, glimpses: int,
                      do_option: str) -> Dict:
    keys = jax.random.split(key, 6)
    x_in = 2 * mid_features if do_option == "|" else mid_features
    return {
        # image side (question-guided), mirrors the 'single' variant
        "v_conv": init_lib.conv_params(keys[0], 1, v_features, mid_features,
                                       use_bias=False),
        "q_lin": init_lib.linear_params(keys[1], q_features, mid_features),
        "x_conv": init_lib.conv_params(keys[2], 1, x_in, glimpses),
        # question side (image-guided attention over tokens)
        "vsum_lin": init_lib.linear_params(keys[3], v_features, mid_features),
        "tok_lin": init_lib.linear_params(keys[4], token_features,
                                          mid_features),
        "tok_out": init_lib.linear_params(keys[5], token_features, q_features),
    }


def apply_co_attention(
    params: Dict,
    v: jnp.ndarray,           # [B, H, W, C] L2-normalized
    q_pooled: jnp.ndarray,    # [B, Q]
    q_tokens: jnp.ndarray,    # [B, T, D]
    q_mask: jnp.ndarray,      # [B, T] bool
    do_option: str,
    dropout_fn,
    dtype,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (v_attended [B, G*C], q_attended [B, Q])."""
    # --- question-guided image attention (same math as 'single') -------
    v_in = dropout_fn(v, 0).astype(dtype)
    # f32 accumulation, compute-dtype storage (see vqa.attention_logits:
    # the [B, H, W, mid] projection and its fused relu dominate this
    # stage's HBM traffic at reference scale).
    v_proj = jnp.einsum("bhwc,cd->bhwd", v_in,
                        params["v_conv"]["w"][0, 0].astype(dtype),
                        preferred_element_type=jnp.float32).astype(dtype)
    q_proj = (
        jnp.dot(dropout_fn(q_pooled, 1).astype(dtype),
                params["q_lin"]["w"].astype(dtype),
                preferred_element_type=jnp.float32)
        + params["q_lin"]["b"]
    ).astype(dtype)[:, None, None, :]
    if do_option == "*":
        fused = jax.nn.relu(v_proj * q_proj)
    elif do_option == "|":
        fused = jax.nn.relu(
            jnp.concatenate(
                [v_proj, jnp.broadcast_to(q_proj, v_proj.shape)], axis=-1
            )
        )
    else:
        fused = jax.nn.relu(v_proj + q_proj)
    att = (
        jnp.einsum("bhwc,cg->bhwg", dropout_fn(fused, 2).astype(dtype),
                   params["x_conv"]["w"][0, 0].astype(dtype),
                   preferred_element_type=jnp.float32)
        + params["x_conv"]["b"]
    )
    # Same softmax-pool as the base model: route through the central
    # measured dispatch (ops/attention_pool) instead of re-deriving it.
    from dl_vqa_tpu.ops.attention_pool import attention_pool_fused

    v_att = attention_pool_fused(v, att)  # [B, G*C]

    # --- image-guided question attention over tokens --------------------
    v_mean = v.astype(jnp.float32).mean(axis=(1, 2))  # [B, C] summary
    guide = (
        jnp.dot(v_mean.astype(dtype), params["vsum_lin"]["w"].astype(dtype),
                preferred_element_type=jnp.float32)
        + params["vsum_lin"]["b"]
    )[:, None, :]
    tok_proj = (
        jnp.dot(q_tokens.astype(dtype), params["tok_lin"]["w"].astype(dtype),
                preferred_element_type=jnp.float32)
        + params["tok_lin"]["b"]
    )
    tok_scores = jax.nn.relu(tok_proj + guide).sum(axis=-1)  # [B, T]
    tok_scores = jnp.where(q_mask, tok_scores, -1e30)
    tok_weights = jax.nn.softmax(tok_scores, axis=1)
    q_att_tokens = jnp.einsum("bt,btd->bd", tok_weights,
                              q_tokens.astype(jnp.float32),
                              preferred_element_type=jnp.float32)
    q_att = (
        jnp.dot(q_att_tokens.astype(dtype),
                params["tok_out"]["w"].astype(dtype),
                preferred_element_type=jnp.float32)
        + params["tok_out"]["b"]
    )
    return v_att, q_att
