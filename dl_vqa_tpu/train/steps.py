"""Jitted train / eval steps.

One XLA program per step — forward, soft-CE loss, backward, and the Adam
update are fused by the compiler (BASELINE config 4), with the VQA metric
computed on device. This removes every per-batch host sync the reference
pays (numpy loss gather ``train.py:195-206``, python-loop metric
``train_utils.py:12-25``).

LR schedule preserved exactly: ``lr * 0.5 ** (iteration / 50000)``
applied per iteration (ref ``train.py:31-35``), Adam with torch-default
betas/eps (ref ``train.py:55``).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from dl_vqa_tpu.models import vqa
from dl_vqa_tpu.models.configs import ModelConfig
from dl_vqa_tpu.ops.vqa_metrics import (
    soft_cross_entropy,
    vqa_accuracy_by_type,
    vqa_accuracy_sum,
)
from dl_vqa_tpu.train.state import TrainState

__all__ = ["make_optimizer", "make_train_step", "make_eval_step", "lr_schedule"]

LR_HALFLIFE = 50_000.0


def lr_schedule(initial_lr: float) -> Callable:
    """The reference's per-iteration halving law (train.py:31-35)."""

    def schedule(count):
        return initial_lr * 0.5 ** (count.astype(jnp.float32) / LR_HALFLIFE)

    return schedule


def make_optimizer(initial_lr: float) -> optax.GradientTransformation:
    return optax.adam(
        learning_rate=lr_schedule(initial_lr), b1=0.9, b2=0.999, eps=1e-8
    )


def _forward_loss(
    params: Dict,
    cfg: ModelConfig,
    batch: Dict,
    train: bool,
    rng: Optional[jax.Array],
    compute_dtype,
    pipeline_ctx=None,
    seq_ctx=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Returns (loss, score_sum, logits, moe_aux) — the single forward
    used by both the train and eval steps. ``moe_aux`` is the layer-mean
    MoE load-balance loss (None for dense configs; informational in
    eval, folded into ``loss`` in training).

    Images come either in-batch (``batch["images"]``) or via the
    device-resident cache (``batch["image_table"]`` gathered at
    ``batch["image_rows"]`` — ``tpu.device_image_cache``; the gather is
    an on-device HBM copy, removing the per-batch host->device image
    transfer)."""
    images = batch.get("images")
    if images is None:
        images = batch["image_table"][batch["image_rows"]]
    moe_sink = [] if cfg.image.moe_experts > 0 else None
    logits = vqa.apply(
        params, cfg,
        images, batch["questions"], batch["lengths"],
        train=train, rng=rng, compute_dtype=compute_dtype,
        pipeline_ctx=pipeline_ctx, aux_sink=moe_sink, seq_ctx=seq_ctx,
    )
    mask = batch.get("mask")
    loss = soft_cross_entropy(
        logits, batch["answer_indices"], batch["answer_values"], mask
    )
    aux = None
    if moe_sink:
        # MoE load-balance loss, mean over layers so the weight is
        # depth-independent; folded into the objective in training only
        # — the eval loss stays the task loss (comparable across
        # dense/MoE configs). Returned separately either way so the
        # trainer can surface expert balance (1.0 == uniform).
        aux = sum(moe_sink) / len(moe_sink)
        if train:
            loss = loss + cfg.image.moe_aux_weight * aux
    score = vqa_accuracy_sum(
        logits, batch["answer_indices"], batch["answer_values"], mask
    )
    return loss, score, logits, aux


def make_train_step(
    cfg: ModelConfig,
    tx: optax.GradientTransformation,
    compute_dtype=jnp.bfloat16,
    in_shardings=None,
    out_shardings=None,
    remat: bool = False,
    jit: bool = True,
    accum_steps: int = 1,
    pipeline_ctx=None,
    seq_ctx=None,
):
    """Build the jitted fused train step.

    ``train_step(state, batch, rng) -> (state, metrics)``; the state is
    donated so the update happens in place on device. ``remat=True``
    rematerializes the forward during backward (trades FLOPs for HBM —
    for bigger batches / deeper conv stacks). ``jit=False`` returns the
    raw step function for embedding in a larger traced program (e.g. the
    on-device benchmark loop in ``bench.py``).

    ``accum_steps > 1`` (``tpu.grad_accum_steps``) splits each batch into
    that many microbatches and accumulates gradients in a ``lax.scan``
    before ONE optimizer update — activation memory scales with the
    microbatch while the update sees the full batch's (averaged)
    gradient, numerically matching the unaccumulated step up to
    reduction order. The batch size must divide evenly; each microbatch
    draws its own dropout fold.
    """

    def step_fn(state: TrainState, batch: Dict, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)

        has_moe = cfg.image.moe_experts > 0

        def grads_of(params, mb, mb_rng):
            def loss_fn(p):
                loss, score, _, aux = _forward_loss(
                    p, cfg, mb, True, mb_rng, compute_dtype, pipeline_ctx,
                    seq_ctx,
                )
                return loss, (score, aux if has_moe else jnp.zeros(()))

            if remat:
                loss_fn = jax.checkpoint(loss_fn)
            return jax.value_and_grad(loss_fn, has_aux=True)(params)

        if accum_steps == 1:
            (loss, (score, moe_aux)), grads = grads_of(
                state.params, batch, step_rng
            )
        else:
            # The device image table is batch-INVARIANT: it must not be
            # split into microbatches (its rows are a different axis than
            # the batch; splitting would crash on non-divisible tables or
            # silently clamp the gathers).
            batch = dict(batch)
            image_table = batch.pop("image_table", None)
            batch_size = jax.tree_util.tree_leaves(batch)[0].shape[0]
            if batch_size % accum_steps != 0:
                raise ValueError(
                    f"batch size {batch_size} does not split into "
                    f"tpu.grad_accum_steps={accum_steps} microbatches"
                )
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((accum_steps, -1) + x.shape[1:]), batch
            )
            micro_size = batch_size // accum_steps
            has_mask = "mask" in batch

            def body(carry, xs):
                g_acc, l_acc, s_acc, a_acc, n_acc = carry
                mb, idx = xs
                if image_table is not None:
                    mb = dict(mb, image_table=image_table)
                (l, (s, a)), g = grads_of(
                    state.params, mb, jax.random.fold_in(step_rng, idx)
                )
                # Per-micro loss/grads are normalized by the MICRO's real
                # count (the loss clamps an all-padded micro's denom to
                # 1). Averaging those means would misweight a padded
                # final batch whose real samples land unevenly across
                # micros, so rescale back to sum form here and normalize
                # ONCE by the whole batch's real count below.
                if has_mask:
                    n = mb["mask"].sum().astype(jnp.float32)
                else:
                    n = jnp.float32(micro_size)
                scale = jnp.maximum(n, 1.0)
                g_acc = jax.tree_util.tree_map(
                    lambda a, gi: a + gi * scale.astype(gi.dtype), g_acc, g
                )
                return (g_acc, l_acc + l * scale, s_acc + s,
                        a_acc + a * scale, n_acc + n), None

            init = (
                jax.tree_util.tree_map(jnp.zeros_like, state.params),
                jnp.zeros(()), jnp.zeros(()), jnp.zeros(()), jnp.zeros(()),
            )
            (g_sum, l_sum, score, a_sum, n_total), _ = jax.lax.scan(
                body, init, (micro, jnp.arange(accum_steps))
            )
            denom = jnp.maximum(n_total, 1.0)
            grads = jax.tree_util.tree_map(
                lambda g: g / denom.astype(g.dtype), g_sum
            )
            loss = l_sum / denom
            moe_aux = a_sum / denom

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        metrics = {"loss": loss, "score": score}
        if has_moe:
            # Expert balance observability: 1.0 == perfectly uniform
            # routing; a drift upward means expert collapse.
            metrics["moe_aux"] = moe_aux
        return new_state, metrics

    if not jit:
        return step_fn
    kwargs = {}
    if in_shardings is not None:
        kwargs["in_shardings"] = in_shardings
    if out_shardings is not None:
        kwargs["out_shardings"] = out_shardings
    return jax.jit(step_fn, donate_argnums=(0,), **kwargs)


def make_eval_step(
    cfg: ModelConfig,
    compute_dtype=jnp.bfloat16,
    in_shardings=None,
    with_breakdown: bool = False,
    pipeline_ctx=None,
    seq_ctx=None,
):
    """Build the jitted eval step: ``eval_step(params, batch) -> (loss,
    score_sum)`` — only scalars leave the device per batch.

    ``with_breakdown=True`` additionally returns per-answer-type
    (yes/no, number, other) score sums and counts, each [3]."""

    def step_fn(params: Dict, batch: Dict):
        loss, score, logits, _ = _forward_loss(
            params, cfg, batch, False, None, compute_dtype, pipeline_ctx,
            seq_ctx,
        )
        if with_breakdown:
            sums, counts = vqa_accuracy_by_type(
                logits, batch["answer_indices"], batch["answer_values"],
                batch["answer_types"], batch.get("mask"),
            )
            return loss, score, sums, counts
        return loss, score

    kwargs = {}
    if in_shardings is not None:
        kwargs["in_shardings"] = in_shardings
    return jax.jit(step_fn, **kwargs)
