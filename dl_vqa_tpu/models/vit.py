"""ViT image encoder (``train.image.encoder: vit``).

A patch-transformer alternative to the reference's CNN stem — a new model
family, not a port. TPU rationale: the CNN's 224px stride-1 stem is
HBM-bandwidth-bound (see docs/PERF_NOTES.md); a ViT is all large matmuls
(patch embed has contraction dim patch*patch*3 = 768, attention and MLP
run at the model dim), so it maps straight onto the MXU with no oversized
intermediates.

Output is a spatial FEATURE GRID ``[B, g, g, D]`` (g = image_size /
patch_size), slotting into the same L2-norm + glimpse-attention +
classifier pipeline as the CNN — every attention variant and the text
encoders compose with it unchanged.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from dl_vqa_tpu.models import initializers as init_lib
from dl_vqa_tpu.models.transformer import _layer_norm

__all__ = ["init_vit_image", "apply_vit_image"]


def init_vit_image(key, image_size: int, patch_size: int, model_dim: int,
                   num_layers: int, moe_experts: int = 0) -> Dict:
    """ViT image-encoder params. The block stack is STORED stacked (every
    leaf carries a leading ``[L, ...]`` layer axis) rather than as a list:
    the pipeline executor's ``shard_map`` consumes exactly that form with
    the leading axis sharded over 'stage', and stacking at init (outside
    jit) is what lets the TrainState hold the stack with that placement —
    stacking per-layer tp-sharded tensors INSIDE the jitted step forced
    the SPMD partitioner into involuntary full rematerialization of the
    concatenates (replicate-then-repartition every step). The sequential
    path statically indexes the stack (``tree_map(lambda l: l[i], ...)``),
    which XLA folds away — identical math and fusion to a list.

    ``moe_experts > 0`` makes EVERY block's MLP a mixture-of-experts FFN
    (ops/moe.py; same hidden width 4*D per expert) — every layer keeps
    the same param structure, so the stacked storage and the sharding
    rules apply unchanged (expert leaves become ``[L, E, ...]``)."""
    grid = image_size // patch_size
    keys = jax.random.split(key, 2 + 4 * num_layers)
    params: Dict = {
        # Patch embedding as a linear on flattened patches [P*P*3, D].
        "patch_embed": init_lib.linear_params(
            keys[0], patch_size * patch_size * 3, model_dim
        ),
        "pos": jax.random.normal(
            keys[1], (grid * grid, model_dim), jnp.float32
        ) * 0.02,
        "final_ln": {
            "scale": jnp.ones(model_dim), "bias": jnp.zeros(model_dim)
        },
    }
    layers = []
    for layer in range(num_layers):
        k1, k2, k3, k4 = keys[2 + 4 * layer : 6 + 4 * layer]
        block = {
            "ln1": {"scale": jnp.ones(model_dim),
                    "bias": jnp.zeros(model_dim)},
            "qkv": init_lib.linear_params(k1, model_dim, 3 * model_dim),
            "out": init_lib.linear_params(k2, model_dim, model_dim),
            "ln2": {"scale": jnp.ones(model_dim),
                    "bias": jnp.zeros(model_dim)},
        }
        if moe_experts > 0:
            from dl_vqa_tpu.ops.moe import init_moe_mlp

            block["moe"] = init_moe_mlp(
                k3, model_dim, 4 * model_dim, moe_experts
            )
        else:
            block["mlp_in"] = init_lib.linear_params(
                k3, model_dim, 4 * model_dim
            )
            block["mlp_out"] = init_lib.linear_params(
                k4, 4 * model_dim, model_dim
            )
        layers.append(block)
    from dl_vqa_tpu.parallel.pipeline import stack_layers

    params["layers"] = stack_layers(layers)
    return params


# Training-path attention-kernel default. ON by measurement (v5e,
# batch 512, full fused train step): the Pallas flash backward
# (ops/vit_attention_pallas.py:vit_attention_qkv_pallas_fused_bwd)
# took the ViT train step 6,993.5 -> 8,968.6 samples/s/chip (+28%) —
# see docs/PERF_NOTES.md "Round-3 flash-attention backward". The
# round-2 recompute-through-XLA backward had measured -9%; keeping the
# whole [S, S] recompute in VMEM is what flipped the sign.
TRAIN_ATTENTION_KERNEL = True


def _attention(x, layer, num_heads, dtype, use_pallas=False,
               fused_bwd=False, seq_ctx=None, int8_scales=None,
               amax_sink=None):
    """Self-attention with the weights tensor kept in the compute dtype.

    At 196 patch tokens x batch 512 the [B, H, S, S] weights are the
    ViT's dominant HBM traffic; an f32 softmax materializes 315 MB per
    layer. Keeping logits/weights in ``dtype`` (exp and the denominator
    accumulate in f32) measured +15% eval throughput on v5e with no
    extra precision loss beyond the model's bf16 compute.

    ``use_pallas=True`` (the measured TPU default via ``cfg.use_pallas``)
    routes the core attention through the packed-qkv Pallas kernel
    (:mod:`dl_vqa_tpu.ops.vit_attention_pallas`): no head split/transpose
    materializations and the [S, S] weights never leave VMEM — measured
    30.6k -> 42.2k QA pairs/s/chip on the ViT eval bench (v5e, batch
    512). The XLA path below is the reference (CPU, and the kernel's
    backward).

    ``int8_scales`` (a per-layer ``(s_qkv_in, s_attn_out)`` pair from
    ``image.quant_scales``) runs the qkv and out projections on the
    int8 MXU path (ops/vit_int8.py; the attention core stays ``dtype``).
    ``amax_sink`` collects the two sites' input amaxes instead
    (calibration pass)."""
    batch, seq, dim = x.shape
    head = dim // num_heads
    if amax_sink is not None:
        amax_sink.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
    if int8_scales is not None:
        from dl_vqa_tpu.ops.vit_int8 import w8a8_linear

        qkv = w8a8_linear(x, layer["qkv"]["w"], layer["qkv"]["b"],
                          int8_scales[0], jnp.float32)
    else:
        qkv = jnp.dot(x, layer["qkv"]["w"].astype(dtype),
                      preferred_element_type=jnp.float32) + layer["qkv"]["b"]

    if seq_ctx is not None:
        # Sequence parallelism (tpu.mesh.seq): tokens are sharded over
        # the 'seq' axis and the attention runs as a ppermute ring with
        # online softmax (ops/ring_attention.py) — takes precedence over
        # the single-device Pallas kernel, which needs the full S.
        from dl_vqa_tpu.ops.ring_attention import ring_attention_qkv

        out = ring_attention_qkv(
            qkv.astype(dtype), num_heads, seq_ctx.mesh,
            seq_axis=seq_ctx.seq_axis, data_axis=seq_ctx.data_axis,
        )
    elif use_pallas and jax.default_backend() == "tpu" and head % 64 == 0:
        from dl_vqa_tpu.ops.vit_attention_pallas import (
            vit_attention_qkv_pallas,
            vit_attention_qkv_pallas_fused_bwd,
        )

        kernel = (vit_attention_qkv_pallas_fused_bwd if fused_bwd
                  else vit_attention_qkv_pallas)
        out = kernel(qkv.astype(dtype), num_heads)
    else:
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.astype(dtype).reshape(
                batch, seq, num_heads, head
            ).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (head ** 0.5)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp((logits - m).astype(jnp.float32)).astype(dtype)
        denom = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        weights = e / denom.astype(dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(batch, seq, dim)
    out = out.astype(dtype)
    if amax_sink is not None:
        amax_sink.append(jnp.max(jnp.abs(out.astype(jnp.float32))))
    if int8_scales is not None:
        from dl_vqa_tpu.ops.vit_int8 import w8a8_linear

        return w8a8_linear(out, layer["out"]["w"], layer["out"]["b"],
                           int8_scales[1], jnp.float32)
    return (
        jnp.dot(out, layer["out"]["w"].astype(dtype),
                preferred_element_type=jnp.float32)
        + layer["out"]["b"]
    )


def _patch_embed_conv(x, embed: Dict, patch_size: int, dtype) -> jnp.ndarray:
    """Stride-P conv patch embed (measured default on v5e): XLA's conv
    emitter gathers the patches implicitly (im2col inside the MXU
    pipeline), skipping the explicit [B, gh, P, gw, P, 3] transpose that
    costs two relayout copies of the image tensor (~1.2 ms of the 12.1 ms
    ViT eval step at batch 512; see docs/PERF_NOTES.md). The kernel is
    the SAME patch_embed weight viewed as [P, P, 3, D] — a row-major
    match with the matmul path's flattened (p_row, p_col, chan) ordering,
    so the two paths are equivalent up to one compute-dtype rounding of
    the pre-bias activation: the conv emits its MXU f32 accumulator in
    the compute dtype (no preferred_element_type — see below), while the
    matmul path keeps f32 through the bias add, so in bf16 the paths can
    differ by one bf16 ulp (exact in f32; asserted either way in
    tests/test_variants.py::test_patch_embed_conv_matches_matmul)."""
    batch, h, w, _ = x.shape
    gh, gw = h // patch_size, w // patch_size
    kernel = embed["w"].astype(dtype).reshape(patch_size, patch_size, 3, -1)
    # No preferred_element_type: the conv VJP rejects mixed-dtype
    # operand/cotangent pairs, and the MXU accumulates in f32 internally
    # regardless; the f32 bias add below restores the matmul path's
    # output dtype.
    out = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(patch_size, patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out.reshape(batch, gh * gw, -1) + embed["b"]


def _patch_embed_matmul(x, embed: Dict, patch_size: int, dtype) -> jnp.ndarray:
    """Explicit patchify + matmul: [B, gh, P, gw, P, 3] -> [B, gh*gw,
    P*P*3] @ [P*P*3, D]. Reference path for CPU and equivalence tests."""
    batch, h, w, _ = x.shape
    gh, gw = h // patch_size, w // patch_size
    x = x.reshape(batch, gh, patch_size, gw, patch_size, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
        batch, gh * gw, patch_size * patch_size * 3
    )
    return (
        jnp.dot(x, embed["w"].astype(dtype),
                preferred_element_type=jnp.float32)
        + embed["b"]
    )


def apply_vit_block(layer: Dict, x: jnp.ndarray, num_heads: int,
                    dtype=jnp.float32, use_pallas: bool = False,
                    dropout: float = 0.0, train: bool = False,
                    rngs=(None, None), fused_bwd: bool = False,
                    moe=None, aux_sink=None, seq_ctx=None,
                    int8_scales=None, amax_sink=None) -> jnp.ndarray:
    """One pre-LN transformer block (attention + MLP with residuals).

    Shared by the sequential stack in :func:`apply_vit_image` and the
    pipeline-parallel executor (:func:`dl_vqa_tpu.parallel.pipeline.
    pipeline_apply`) — identical math in both schedules. ``rngs`` are the
    two residual-dropout keys (attention site, MLP site);
    ``fused_bwd`` selects the Pallas flash backward for the attention
    kernel (training path).

    When the layer carries a ``"moe"`` param group (``image.moe_experts
    > 0``), the MLP runs as a mixture-of-experts FFN (ops/moe.py);
    ``moe = (top_k, capacity_factor)`` supplies the routing knobs and
    ``aux_sink`` collects the per-layer load-balance loss."""
    from dl_vqa_tpu.models.vqa import _dropout

    hld = _layer_norm(x, layer["ln1"]["scale"], layer["ln1"]["bias"])
    att = _attention(hld, layer, num_heads, dtype,
                     use_pallas=use_pallas,
                     fused_bwd=fused_bwd, seq_ctx=seq_ctx,
                     int8_scales=(int8_scales[:2] if int8_scales else None),
                     amax_sink=amax_sink).astype(dtype)
    x = x + _dropout(att, dropout, train, rngs[0])
    hld = _layer_norm(x, layer["ln2"]["scale"], layer["ln2"]["bias"])
    if "moe" in layer:
        from dl_vqa_tpu.ops.moe import moe_mlp

        if moe is None:
            # The params say MoE but the config didn't supply routing
            # knobs (image.moe_experts unset/0 on a MoE checkpoint).
            # Guessing defaults here would silently route differently
            # than training did — wrong logits with no error anywhere.
            raise ValueError(
                "layer params contain a 'moe' group but no MoE routing "
                "config was provided — the checkpoint was trained with "
                "image.moe_experts > 0; evaluate/serve it with a config "
                "that sets image.moe_experts (and the trained "
                "moe_top_k / moe_capacity_factor)"
            )
        top_k, capacity_factor = moe
        mlp = moe_mlp(hld, layer["moe"], top_k, capacity_factor, dtype,
                      aux_sink=aux_sink).astype(dtype)
    else:
        if amax_sink is not None:
            amax_sink.append(jnp.max(jnp.abs(hld.astype(jnp.float32))))
        if int8_scales is not None:
            from dl_vqa_tpu.ops.vit_int8 import w8a8_linear

            hld = jax.nn.relu(
                w8a8_linear(hld, layer["mlp_in"]["w"],
                            layer["mlp_in"]["b"], int8_scales[2],
                            jnp.float32)
            )
            if amax_sink is not None:
                amax_sink.append(jnp.max(jnp.abs(hld)))
            mlp = w8a8_linear(hld, layer["mlp_out"]["w"],
                              layer["mlp_out"]["b"], int8_scales[3],
                              dtype)
        else:
            hld = jax.nn.relu(
                jnp.dot(hld, layer["mlp_in"]["w"].astype(dtype),
                        preferred_element_type=jnp.float32)
                + layer["mlp_in"]["b"]
            ).astype(dtype)
            if amax_sink is not None:
                amax_sink.append(jnp.max(jnp.abs(hld.astype(jnp.float32))))
            mlp = (
                jnp.dot(hld, layer["mlp_out"]["w"].astype(dtype),
                        preferred_element_type=jnp.float32)
                + layer["mlp_out"]["b"]
            ).astype(dtype)
    return x + _dropout(mlp, dropout, train, rngs[1])


def _pipelined_blocks(layers, x, num_heads, dtype, use_pallas, dropout,
                      train, rng, ctx, fused_bwd=False):
    """Run the block stack through the GPipe executor: per-layer dropout
    keys ride inside the stacked layer pytree (same site ids as the
    sequential loop), the batch splits into ``ctx.num_microbatches``.

    ``layers`` arrives ALREADY stacked (leading ``[L, ...]`` axis, from
    :func:`init_vit_image`) with device placements matching the
    executor's in_specs — no parameter stacking happens inside the jitted
    step. Only the (tiny, freshly-derived) dropout keys are stacked here;
    they carry no prior sharding, so the partitioner places them freely."""
    from dl_vqa_tpu.models.vqa import _site_rng
    from dl_vqa_tpu.parallel.pipeline import pipeline_apply

    batch = x.shape[0]
    m = ctx.num_microbatches
    if batch % m != 0:
        raise ValueError(
            f"batch {batch} does not split into {m} pipeline microbatches"
        )
    num_layers = jax.tree_util.tree_leaves(layers)[0].shape[0]
    with_rng = train and dropout > 0.0 and rng is not None
    if with_rng:
        stacked = dict(layers, _rngs=jnp.stack([
            jnp.stack([_site_rng(rng, 21 + 2 * idx),
                       _site_rng(rng, 22 + 2 * idx)])
            for idx in range(num_layers)
        ]))
    else:
        stacked = dict(layers)

    def fn(layer, t, mb_index):
        layer = dict(layer)
        keys = layer.pop("_rngs", None)
        rngs = (None, None)
        if keys is not None:
            # Fold the microbatch number in so microbatches draw DISTINCT
            # dropout masks (the stacked keys alone would repeat the same
            # mask for every microbatch — they share shapes and keys).
            rngs = (jax.random.fold_in(keys[0], mb_index),
                    jax.random.fold_in(keys[1], mb_index))
        return apply_vit_block(layer, t, num_heads, dtype,
                               use_pallas=use_pallas, dropout=dropout,
                               train=train, rngs=rngs, fused_bwd=fused_bwd)

    xm = x.reshape((m, batch // m) + x.shape[1:])
    xm = pipeline_apply(fn, stacked, xm, ctx.mesh,
                        stage_axis=ctx.stage_axis, data_axis=ctx.data_axis,
                        with_index=True)
    return xm.reshape((batch,) + x.shape[1:])


def apply_vit_image(params: Dict, images: jnp.ndarray, patch_size: int,
                    num_heads: int, dropout: float, train: bool, rng,
                    dtype=jnp.float32, use_pallas: bool = False,
                    pipeline_ctx=None, moe=None,
                    aux_sink=None, seq_ctx=None,
                    int8_scales=None, amax_sink=None) -> jnp.ndarray:
    """images [B, H, W, 3] -> feature grid [B, g, g, D].

    ``pipeline_ctx`` routes the block stack through the GPipe executor
    (``tpu.mesh.stage``): identical block math (same ``apply_vit_block``
    and the same per-layer dropout site keys), microbatched over the
    stage axis. With dropout off the pipelined and sequential paths are
    numerically identical up to reduction order; with dropout on, each
    microbatch folds its index into the layer keys (distinct masks per
    microbatch), a different but equally valid stream than the
    sequential full-batch draw."""
    from dl_vqa_tpu.models.vqa import _dropout, _site_rng

    batch, h, w, _ = images.shape
    gh, gw = h // patch_size, w // patch_size
    x = images[:, : gh * patch_size, : gw * patch_size, :].astype(dtype)
    if jax.default_backend() == "tpu":
        x = _patch_embed_conv(x, params["patch_embed"], patch_size, dtype)
    else:
        x = _patch_embed_matmul(x, params["patch_embed"], patch_size, dtype)
    if gh * gw > params["pos"].shape[0]:
        raise ValueError(
            f"Patch grid {gh}x{gw} ({gh * gw} tokens) exceeds the "
            f"positional table size {params['pos'].shape[0]}; the model was "
            f"initialized for image_size/patch_size = "
            f"{int(params['pos'].shape[0] ** 0.5)} patches per side."
        )
    x = (x + params["pos"][: gh * gw]).astype(dtype)
    x = _dropout(x, dropout, train, _site_rng(rng, 20))

    # Kernel dispatch (both defaults measured on v5e, batch 512):
    # * eval: always the Pallas kernel (30.6k -> 42.2k QA/s).
    # * train: the kernel with the Pallas flash backward when
    #   TRAIN_ATTENTION_KERNEL says so. The earlier XLA-recompute
    #   backward netted -9% (6,540 -> 5,980 samples/s) and stayed off;
    #   the flash backward keeps the whole recompute in VMEM.
    fused = train and TRAIN_ATTENTION_KERNEL
    kernel_ok = use_pallas and (not train or fused)
    if int8_scales is not None and pipeline_ctx is not None:
        raise NotImplementedError(
            "image.store_dtype='int8' (ViT W8A8) does not compose with "
            "tpu.mesh.stage > 1: the GPipe executor's homogeneous layer "
            "stack cannot carry per-layer static scales"
        )
    if seq_ctx is not None:
        if pipeline_ctx is not None:
            raise NotImplementedError(
                "tpu.mesh.seq > 1 does not compose with tpu.mesh.stage "
                "> 1: the GPipe executor's shard_map cannot nest the "
                "ring-attention shard_map"
            )
        if seq_ctx.seq_axis not in seq_ctx.mesh.axis_names:
            raise ValueError(
                f"seq_ctx mesh {dict(seq_ctx.mesh.shape)} has no "
                f"'{seq_ctx.seq_axis}' axis — build it with "
                "make_mesh(..., seq=N) for N > 1 (the axis is only "
                "materialized when > 1), or drop seq_ctx"
            )
        n_seq = seq_ctx.mesh.shape[seq_ctx.seq_axis]
        if x.shape[1] % n_seq != 0:
            raise ValueError(
                f"{x.shape[1]} patch tokens do not shard over the "
                f"{n_seq}-way '{seq_ctx.seq_axis}' axis; choose "
                f"image_size/patch_size so the grid divides it"
            )
        from jax.sharding import NamedSharding, PartitionSpec as _P

        # Establish the token sharding once; LN/MLP/projections are
        # token-local and keep it under GSPMD, attention rides the ring.
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(seq_ctx.mesh,
                             _P(seq_ctx.data_axis, seq_ctx.seq_axis, None))
        )
    if pipeline_ctx is not None:
        if "moe" in params["layers"]:
            raise NotImplementedError(
                "image.moe_experts > 0 does not compose with "
                "tpu.mesh.stage > 1 yet: the GPipe executor's shard_map "
                "cannot carry the expert axis or the aux-loss side "
                "channel. Use a dp x expert x model mesh instead."
            )
        x = _pipelined_blocks(params["layers"], x, num_heads, dtype,
                              kernel_ok, dropout, train, rng, pipeline_ctx,
                              fused_bwd=fused)
    else:
        stacked = params["layers"]
        num_layers = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        for idx in range(num_layers):
            # Static index into the stacked [L, ...] params — XLA folds
            # the slice, so this unrolls and fuses exactly like a list.
            layer = jax.tree_util.tree_map(lambda l: l[idx], stacked)
            x = apply_vit_block(
                layer, x, num_heads, dtype,
                use_pallas=kernel_ok,
                dropout=dropout, train=train,
                rngs=(_site_rng(rng, 21 + 2 * idx),
                      _site_rng(rng, 22 + 2 * idx)),
                fused_bwd=fused,
                moe=moe, aux_sink=aux_sink, seq_ctx=seq_ctx,
                int8_scales=(
                    tuple(int8_scales[4 * idx: 4 * idx + 4])
                    if int8_scales is not None else None
                ),
                amax_sink=amax_sink,
            )

    x = _layer_norm(x, params["final_ln"]["scale"], params["final_ln"]["bias"])
    dim = x.shape[-1]
    return x.reshape(batch, gh, gw, dim)
