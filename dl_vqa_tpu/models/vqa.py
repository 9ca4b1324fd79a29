"""VqaNet — "Show, Ask, Attend, and Answer" as a functional JAX model.

Same computation as the reference top model
(``/root/reference/models/model.py:7-67``) but TPU-idiomatic:

* pure ``init(key, cfg) -> params`` / ``apply(params, cfg, ...) -> logits``
  over a plain dict pytree (pjit/shard-friendly, direct torch import);
* NHWC image layout end-to-end (TPU-native; the reference is NCHW);
* VALID-padding convs + 2x2 maxpool blocks, L2 channel normalization
  (+1e-12, ref ``model.py:56``);
* question path: embedding (id 0 -> zero vector) -> dropout -> tanh ->
  masked bi-LSTM, final CELL state per direction (ref ``model.py:164-166``);
* attention: 1x1 conv (no bias) on v, linear on q, q tiled over the grid,
  fused by ``do_option`` ('*' product / '+' sum / '|' channel concat),
  relu, 1x1 conv -> glimpse logits (ref ``model.py:183-195``);
* glimpse-wise spatial softmax pooling, concat, 2-layer MLP classifier
  (ref ``model.py:198-221``).

Mixed precision: matmuls/convs run in ``compute_dtype`` (bfloat16 on TPU),
normalization/softmax/logits accumulate in float32; params stay float32.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from dl_vqa_tpu.models import initializers as init_lib
from dl_vqa_tpu.models.configs import ModelConfig
from dl_vqa_tpu.ops.lstm import bilstm_final_cell

__all__ = ["init", "apply", "param_count", "summary"]

Params = Dict


# ---------------------------------------------------------------- dropout

def _dropout(x: jnp.ndarray, rate: float, train: bool,
             rng: Optional[jax.Array]) -> jnp.ndarray:
    """Inverted dropout with a uint8 mask source.

    ``bernoulli`` draws 32 random bits per element; one byte is enough for
    a keep/drop decision, so this draws uint8 and compares — 4x less RNG
    generation and mask-compare HBM traffic (worth ~3 ms/step on the
    reference-scale train step at batch 512 on v5e, where the biggest mask
    is the [B,26,26,1024] attention-hidden site). The keep probability is
    quantized to 1/256 and the inverted scale uses the SAME quantized
    value, so E[dropout(x)] == x exactly.
    """
    if not train or rate == 0.0:
        return x
    threshold = int(round((1.0 - rate) * 256.0))
    if threshold >= 256:
        return x
    if threshold <= 0:
        return jnp.zeros_like(x)
    keep_q = threshold / 256.0
    bits = jax.random.bits(rng, x.shape, dtype=jnp.uint8)
    mask = bits < jnp.uint8(threshold)
    return jnp.where(mask, x / keep_q, 0.0).astype(x.dtype)


def _site_rng(rng: Optional[jax.Array], site: int) -> Optional[jax.Array]:
    return None if rng is None else jax.random.fold_in(rng, site)


# ---------------------------------------------------------------- init

def init(key: jax.Array, cfg: ModelConfig) -> Params:
    """Initialize all parameters (fp32, torch-default distributions)."""
    keys = jax.random.split(key, 16)
    t, i, a, c = cfg.text, cfg.image, cfg.attention, cfg.classifier

    params: Params = {"text": {}, "image": {}, "attention": {}, "classifier": {}}

    # Text encoder
    if t.encoder == "lstm":
        if t.num_lstm_layers != 1:
            # The reference is also single-layer only (its config notes
            # 'needs change of code if >1'); fail loudly instead of
            # silently training a different architecture.
            raise NotImplementedError(
                f"num_lstm_layers={t.num_lstm_layers}; only 1 is supported"
            )
        params["text"]["embedding"] = init_lib.embedding_params(
            keys[0], cfg.num_tokens, t.embedding_features
        )
        params["text"]["lstm_fwd"] = init_lib.lstm_params(
            keys[1], t.embedding_features, t.question_features
        )
        if t.bidirectional:
            params["text"]["lstm_bwd"] = init_lib.lstm_params(
                keys[2], t.embedding_features, t.question_features
            )
    elif t.encoder == "transformer":
        from dl_vqa_tpu.models.transformer import init_transformer_text

        params["text"] = init_transformer_text(
            keys[0], cfg.num_tokens, t.embedding_features,
            t.question_features, t.num_heads, t.num_layers,
            max_positions=t.max_positions,
        )
    else:
        raise NotImplementedError(f"text encoder {t.encoder!r}")

    # Image encoder
    if i.encoder == "cnn":
        if i.moe_experts > 0:
            # MoE is a ViT-block feature; silently training a dense CNN
            # under a config that says "MoE" would misreport capacity.
            raise ValueError(
                f"image.moe_experts={i.moe_experts} requires "
                "image.encoder='vit' (the cnn stack has no MLP blocks "
                "to sparsify)"
            )
        # len(num_channels)-1 conv blocks (reference architecture).
        # The init key layout reserves keys[3..9] for conv blocks
        # (attention starts at keys[10]); deeper stacks would silently
        # draw correlated weights, so reject them loudly.
        if len(i.num_channels) - 1 > 7:
            raise ValueError(
                f"image.num_channels has {len(i.num_channels)} entries "
                f"({len(i.num_channels) - 1} conv blocks); at most 7 "
                "blocks are supported"
            )
        for block in range(len(i.num_channels) - 1):
            params["image"][f"conv{block}"] = init_lib.conv_params(
                keys[3 + block], i.kernel_size,
                i.num_channels[block], i.num_channels[block + 1],
            )
    elif i.encoder == "vit":
        from dl_vqa_tpu.models.vit import init_vit_image

        params["image"] = init_vit_image(
            keys[3], cfg.image_size, i.patch_size, i.output_channels,
            i.num_layers, moe_experts=i.moe_experts,
        )
    else:
        raise NotImplementedError(f"image encoder {i.encoder!r}")

    # Attention fusion
    v_features = i.output_channels
    q_features = t.output_features
    if a.variant == "single":
        x_in = 2 * a.hidden_dim if a.do_option == "|" else a.hidden_dim
        params["attention"]["v_conv"] = init_lib.conv_params(
            keys[10], 1, v_features, a.hidden_dim, use_bias=False
        )
        params["attention"]["q_lin"] = init_lib.linear_params(
            keys[11], q_features, a.hidden_dim
        )
        params["attention"]["x_conv"] = init_lib.conv_params(
            keys[12], 1, x_in, a.glimpses
        )
    elif a.variant == "stacked":
        from dl_vqa_tpu.models.fusion import init_stacked_attention

        params["attention"] = init_stacked_attention(
            keys[10], v_features, q_features, a.hidden_dim, a.glimpses,
            do_option=a.do_option,
        )
    elif a.variant == "co":
        from dl_vqa_tpu.models.fusion import init_co_attention

        params["attention"] = init_co_attention(
            keys[10], v_features, q_features, q_features, a.hidden_dim,
            a.glimpses, a.do_option,
        )
    else:
        raise NotImplementedError(f"attention variant {a.variant!r}")

    # Classifier
    combined = a.glimpses * v_features + q_features
    params["classifier"]["lin1"] = init_lib.linear_params(
        keys[13], combined, c.hidden_dim
    )
    params["classifier"]["lin2"] = init_lib.linear_params(
        keys[14], c.hidden_dim, cfg.max_answers
    )
    return params


# ---------------------------------------------------------------- submodules

def image_encoder(params: Params, cfg: ModelConfig, images: jnp.ndarray,
                  train: bool, rng, dtype,
                  pipeline_ctx=None, aux_sink=None,
                  seq_ctx=None) -> jnp.ndarray:
    """Image feature grid [B, g, g, C] (NHWC).

    'cnn': conv->relu->maxpool blocks + trailing dropout (ref
    ``model.py:72-84``), each block through :func:`dl_vqa_tpu.ops.
    conv_fused.conv_relu_pool` (XLA path by measurement).
    'vit': patch transformer (new family; see models/vit.py); its block
    stack optionally runs pipeline-parallel (``pipeline_ctx``)."""
    if cfg.image.encoder == "vit":
        int8_scales = None
        if cfg.image.store_dtype == "int8":
            # W8A8 block matmuls (ops/vit_int8.py) — inference serving
            # mode, static PTQ scales calibrated from trained weights.
            if train:
                raise ValueError(
                    "image.store_dtype='int8' is inference-only: its "
                    "static activation scales are calibrated FROM "
                    "trained weights (ops.vit_int8.calibrate_vit_scales)."
                    " Train with store_dtype='compute' and switch at "
                    "serving time."
                )
            if cfg.image.moe_experts > 0:
                raise ValueError(
                    "image.store_dtype='int8' does not support MoE "
                    "blocks (no W8A8 path for the expert einsums)"
                )
            expected = 4 * cfg.image.num_layers
            if len(cfg.image.quant_scales) != expected:
                raise ValueError(
                    f"image.quant_scales has "
                    f"{len(cfg.image.quant_scales)} entries; the vit "
                    f"W8A8 mode needs {expected} (4 per block) — "
                    "calibrate with ops.vit_int8.with_calibrated_"
                    "vit_scales"
                )
            int8_scales = cfg.image.quant_scales
        elif cfg.image.store_dtype != "compute":
            raise ValueError(
                f"image.store_dtype={cfg.image.store_dtype!r} is a CNN-stem "
                "serving mode (quantized conv-output storage); the vit "
                "encoder supports 'compute' or 'int8' (W8A8 block matmuls)"
            )
        from dl_vqa_tpu.models.vit import apply_vit_image

        moe = (
            (cfg.image.moe_top_k, cfg.image.moe_capacity_factor)
            if cfg.image.moe_experts > 0 else None
        )
        return apply_vit_image(
            params["image"], images, cfg.image.patch_size,
            cfg.image.num_heads, cfg.image.dropout, train, rng, dtype,
            use_pallas=cfg.use_pallas, pipeline_ctx=pipeline_ctx,
            moe=moe, aux_sink=aux_sink, seq_ctx=seq_ctx,
            int8_scales=int8_scales,
        )
    if pipeline_ctx is not None:
        raise ValueError(
            "tpu.mesh.stage > 1 (pipeline parallelism) requires "
            "train.image.encoder=vit — the cnn stack has no repeated "
            "layer structure to stage"
        )
    if seq_ctx is not None:
        raise ValueError(
            "tpu.mesh.seq > 1 (sequence parallelism) requires "
            "train.image.encoder=vit — the cnn stack has no token "
            "dimension to shard"
        )

    from dl_vqa_tpu.ops.conv_fused import conv_relu_pool

    if cfg.image.store_dtype == "compute":
        store_dtype = None
    elif cfg.image.store_dtype == "f8e4m3":
        store_dtype = jnp.float8_e4m3fn
    elif cfg.image.store_dtype == "int8":
        from dl_vqa_tpu.ops.conv_int8 import int8_stem_forward

        if train:
            raise ValueError(
                "image.store_dtype='int8' is inference-only: its static "
                "activation scales are calibrated FROM trained weights "
                "(ops.conv_int8.calibrate_stem_scales). Train with "
                "store_dtype='compute' and switch at serving time."
            )
        if not cfg.image.quant_scales:
            raise ValueError(
                "image.store_dtype='int8' needs calibrated activation "
                "scales: run ops.conv_int8.calibrate_stem_scales on sample "
                "batches and set them via dataclasses.replace(cfg.image, "
                "quant_scales=...)"
            )
        x = int8_stem_forward(
            params["image"], images, cfg.image.quant_scales,
            cfg.image.stride, dtype,
        )
        return _dropout(x, cfg.image.dropout, train, _site_rng(rng, 0))
    else:
        raise ValueError(
            f"image.store_dtype={cfg.image.store_dtype!r}; expected "
            "'compute', 'f8e4m3' or 'int8'"
        )

    x = images.astype(dtype)
    for block in range(len(cfg.image.num_channels) - 1):
        p = params["image"][f"conv{block}"]
        x = conv_relu_pool(
            x, p["w"].astype(dtype), p["b"], stride=cfg.image.stride,
            store_dtype=store_dtype,
        )
    return _dropout(x, cfg.image.dropout, train, _site_rng(rng, 0))


def text_encoder(params: Params, cfg: ModelConfig, questions: jnp.ndarray,
                 lengths: jnp.ndarray, train: bool, rng, dtype) -> jnp.ndarray:
    """Pooled question features [B, output_features] (fp32).

    LSTM path: embed -> dropout -> tanh -> masked bi-LSTM final cell
    state, ref ``model.py:134-166``."""
    pooled, _, _ = encode_text(params, cfg, questions, lengths, train, rng,
                               dtype, need_tokens=False)
    return pooled


def encode_text(params: Params, cfg: ModelConfig, questions: jnp.ndarray,
                lengths: jnp.ndarray, train: bool, rng, dtype,
                need_tokens: bool = False):
    """(pooled [B, F], tokens [B, T, F] | None, mask [B, T] | None)."""
    if cfg.text.encoder == "transformer":
        from dl_vqa_tpu.models.transformer import apply_transformer_text

        pooled, tokens, mask = apply_transformer_text(
            params["text"], questions, lengths, cfg.text.num_heads,
            cfg.text.dropout, train, _site_rng(rng, 1), dtype,
        )
        return pooled, (tokens if need_tokens else None), mask

    table = params["text"]["embedding"]
    embedded = jnp.take(table, questions, axis=0)
    # id 0 is <unknown>/pad: torch's padding_idx keeps that row at zero.
    embedded = embedded * (questions > 0)[..., None]
    embedded = _dropout(embedded, cfg.text.dropout, train, _site_rng(rng, 1))
    embedded = jnp.tanh(embedded).astype(dtype)

    tokens = mask = pooled = None
    if need_tokens:
        # The final cell states ride the SAME scans that emit the token
        # states (two scans total, not four — the serial recurrence is
        # this path's bottleneck); values are bit-identical to the
        # separate pooled-only scans below.
        from dl_vqa_tpu.ops.lstm import (
            bilstm_tokens_and_final_cell,
            lstm_scan_outputs_final,
        )

        seq = questions.shape[1]
        mask = jnp.arange(seq)[None, :] < lengths[:, None]
        if cfg.text.bidirectional:
            tokens, pooled = bilstm_tokens_and_final_cell(
                embedded, lengths,
                params["text"]["lstm_fwd"], params["text"]["lstm_bwd"],
            )
        else:
            hs, pooled = lstm_scan_outputs_final(
                embedded, lengths, params["text"]["lstm_fwd"]
            )
            tokens = hs * mask[..., None]

    if pooled is None:
        if cfg.text.bidirectional:
            pooled = bilstm_final_cell(
                embedded, lengths,
                params["text"]["lstm_fwd"], params["text"]["lstm_bwd"],
                use_pallas=cfg.use_pallas,
            )
        else:
            from dl_vqa_tpu.ops.lstm import lstm_scan

            _, pooled = lstm_scan(
                embedded, lengths, params["text"]["lstm_fwd"]
            )
    return pooled, tokens, mask


def attention_logits(params: Params, cfg: ModelConfig, v: jnp.ndarray,
                     q: jnp.ndarray, train: bool, rng, dtype) -> jnp.ndarray:
    """Glimpse attention logits [B, H, W, G], ref ``model.py:183-195``."""
    a = cfg.attention
    pa = params["attention"]
    v_in = _dropout(v, a.dropout, train, _site_rng(rng, 2)).astype(dtype)
    # 1x1 conv == per-pixel matmul over channels. Accumulate in f32 but
    # STORE the [B, H, W, hidden] projection in the compute dtype: at
    # reference scale this tensor is 1.4 GB in f32 and the fused-relu /
    # dropout passes over it dominate the attention stage's HBM traffic.
    v_proj = jnp.einsum(
        "bhwc,cd->bhwd", v_in, pa["v_conv"]["w"][0, 0].astype(dtype),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    q_in = _dropout(q, a.dropout, train, _site_rng(rng, 3)).astype(dtype)
    q_proj = (
        jnp.dot(q_in, pa["q_lin"]["w"].astype(dtype),
                preferred_element_type=jnp.float32)
        + pa["q_lin"]["b"]
    ).astype(dtype)
    q_tiled = q_proj[:, None, None, :]  # broadcast over the spatial grid
    if a.do_option == "*":
        fused = jax.nn.relu(v_proj * q_tiled)
    elif a.do_option == "+":
        fused = jax.nn.relu(v_proj + q_tiled)
    elif a.do_option == "|":
        fused = jax.nn.relu(
            jnp.concatenate(
                [v_proj, jnp.broadcast_to(q_tiled, v_proj.shape)], axis=-1
            )
        )
    else:
        raise ValueError(f"Unknown do_option {a.do_option!r}")
    fused = _dropout(fused, a.dropout, train, _site_rng(rng, 4)).astype(dtype)
    return (
        jnp.einsum("bhwc,cg->bhwg", fused, pa["x_conv"]["w"][0, 0].astype(dtype),
                   preferred_element_type=jnp.float32)
        + pa["x_conv"]["b"]
    )


def attention_pool(v: jnp.ndarray, att: jnp.ndarray) -> jnp.ndarray:
    """Softmax over spatial positions per glimpse, weighted feature sum,
    glimpse concat -> [B, G*C] (ref ``model.py:208-221``). Routed through
    the central dispatch in :mod:`dl_vqa_tpu.ops.attention_pool` (XLA by
    measurement; a Pallas kernel is available)."""
    from dl_vqa_tpu.ops.attention_pool import attention_pool_fused

    return attention_pool_fused(v, att)


def classifier(params: Params, cfg: ModelConfig, x: jnp.ndarray,
               train: bool, rng, dtype) -> jnp.ndarray:
    """drop -> lin -> relu -> drop -> lin (ref ``model.py:198-205``)."""
    c = cfg.classifier
    p = params["classifier"]
    x = _dropout(x, c.dropout, train, _site_rng(rng, 5)).astype(dtype)
    x = jax.nn.relu(
        jnp.dot(x, p["lin1"]["w"].astype(dtype),
                preferred_element_type=jnp.float32) + p["lin1"]["b"]
    )
    x = _dropout(x, c.dropout, train, _site_rng(rng, 6)).astype(dtype)
    return (
        jnp.dot(x, p["lin2"]["w"].astype(dtype),
                preferred_element_type=jnp.float32)
        + p["lin2"]["b"]
    )


# ---------------------------------------------------------------- top level

def apply(
    params: Params,
    cfg: ModelConfig,
    images: jnp.ndarray,     # [B, H, W, 3] float (NHWC)
    questions: jnp.ndarray,  # [B, T] int
    lengths: jnp.ndarray,    # [B] int
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    pipeline_ctx=None,
    aux_sink: Optional[list] = None,
    seq_ctx=None,
) -> jnp.ndarray:
    """Forward pass -> answer logits [B, max_answers] (fp32).

    Mirrors ref ``model.py:53-67``: encode image, L2-normalize channels,
    encode question, attend, pool, concat [v, q], classify.

    ``pipeline_ctx`` (a :class:`dl_vqa_tpu.parallel.pipeline.
    PipelineContext`) runs the ViT block stack pipeline-parallel over
    the mesh's 'stage' axis (``tpu.mesh.stage``). ``seq_ctx`` (a
    :class:`dl_vqa_tpu.parallel.sequence.SequenceContext`) shards the
    ViT token dimension over the 'seq' axis with ring attention
    (``tpu.mesh.seq``; mutually exclusive with ``pipeline_ctx``).

    ``aux_sink``: an optional caller-owned list that MoE layers append
    their scalar load-balance losses to (a within-trace side channel —
    the values are traced scalars and must be consumed inside the same
    jit trace; see ``train/steps._forward_loss``). Plain dense configs
    never touch it.
    """
    if train and rng is None:
        raise ValueError("train=True requires a dropout rng")

    if images.dtype == jnp.uint8:
        # Online pipeline (BASELINE config 2): raw decoded pixels arrive
        # uint8; ImageNet normalization runs on device, fused by XLA into
        # the first conv's input read.
        from dl_vqa_tpu.data.images import IMAGENET_MEAN, IMAGENET_STD

        images = (
            images.astype(compute_dtype) / 255.0
            - jnp.asarray(IMAGENET_MEAN, dtype=compute_dtype)
        ) / jnp.asarray(IMAGENET_STD, dtype=compute_dtype)

    v = image_encoder(params, cfg, images, train, rng, compute_dtype,
                      pipeline_ctx=pipeline_ctx, aux_sink=aux_sink,
                      seq_ctx=seq_ctx)
    v = v.astype(jnp.float32)
    v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)

    variant = cfg.attention.variant
    q, tokens, mask = encode_text(
        params, cfg, questions, lengths, train, rng, compute_dtype,
        need_tokens=(variant == "co"),
    )
    q = q.astype(jnp.float32)

    def dropout_fn(x, site):
        return _dropout(x, cfg.attention.dropout, train,
                        _site_rng(rng, 10 + site))

    if variant == "single":
        att = attention_logits(params, cfg, v, q, train, rng, compute_dtype)
        pooled = attention_pool(v, att)
        q_for_classifier = q
    elif variant == "stacked":
        from dl_vqa_tpu.models.fusion import apply_stacked_attention

        pooled = apply_stacked_attention(
            params["attention"], v, q, cfg.attention.do_option, dropout_fn,
            compute_dtype,
        )
        q_for_classifier = q
    elif variant == "co":
        from dl_vqa_tpu.models.fusion import apply_co_attention

        pooled, q_for_classifier = apply_co_attention(
            params["attention"], v, q, tokens, mask,
            cfg.attention.do_option, dropout_fn, compute_dtype,
        )
    else:
        raise NotImplementedError(f"attention variant {variant!r}")

    combined = jnp.concatenate([pooled, q_for_classifier], axis=1)
    return classifier(params, cfg, combined, train, rng, compute_dtype)


# ---------------------------------------------------------------- reporting

def param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def summary(params: Params) -> str:
    """Per-subnet parameter counts (the reference prints the same split,
    ref ``main_utils.py:29-39``)."""
    parts = {
        name: sum(x.size for x in jax.tree_util.tree_leaves(sub))
        for name, sub in params.items()
    }
    total = sum(parts.values())
    detail = ", ".join(
        f"{n.capitalize()}: {c}" for n, c in sorted(parts.items())
    )
    return f"Total params: {total} ({detail})"
