"""Soft-target cross-entropy loss and the VQA accuracy metric, fully
on-device (jit-traced, zero host syncs).

Replaces the reference's per-batch host round-trips: the numpy index
surgery in the loss (``/root/reference/train.py:195-206``) and the
python-loop sparse lookup in the metric
(``/root/reference/utils/train_utils.py:12-25``) both become vectorized
gathers over the dense padded answer encoding ``(indices, values)`` that
the dataset already materializes.

Semantics preserved exactly:

* loss: for each sample, every unique ground-truth answer ``a`` with
  annotator count ``n_a`` contributes ``-log p(a) * n_a / 10``; the batch
  loss is the sum divided by the batch size;
* accuracy: ``min(count_of_argmax_answer * 0.3, 1)`` per sample
  (the reference's 0.3 coefficient, not the official 1/3), summed over
  the batch;
* answer indices are 1-based with 0 = padding.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["soft_cross_entropy", "vqa_accuracy_sum", "vqa_batch_stats"]


def soft_cross_entropy(
    logits: jnp.ndarray,          # [B, A] float
    answer_indices: jnp.ndarray,  # [B, K] int, 1-based, 0 = pad
    answer_values: jnp.ndarray,   # [B, K] int annotator counts, 0 = pad
    sample_mask: jnp.ndarray | None = None,  # [B] bool, False = padded sample
) -> jnp.ndarray:
    """Soft-target NLL, summed over answers, divided by batch size.

    ``batch size`` follows the reference: the number of REAL samples when a
    mask is given (partial final batch), else ``B``.
    """
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    gathered = jnp.take_along_axis(
        log_probs, jnp.maximum(answer_indices - 1, 0), axis=-1
    )  # [B, K]
    weights = answer_values.astype(jnp.float32) / 10.0
    weights = jnp.where(answer_indices > 0, weights, 0.0)
    per_sample = -(gathered * weights).sum(axis=-1)  # [B]
    if sample_mask is not None:
        per_sample = jnp.where(sample_mask, per_sample, 0.0)
        denom = jnp.maximum(sample_mask.sum(), 1)
    else:
        denom = per_sample.shape[0]
    return per_sample.sum() / denom


def vqa_accuracy_sum(
    logits: jnp.ndarray,          # [B, A]
    answer_indices: jnp.ndarray,  # [B, K]
    answer_values: jnp.ndarray,   # [B, K]
    sample_mask: jnp.ndarray | None = None,  # [B]
) -> jnp.ndarray:
    """Sum over the batch of ``min(0.3 * agreeing_count, 1)`` where
    ``agreeing_count`` is the annotator count of the argmax answer."""
    predicted = jnp.argmax(logits, axis=-1)  # [B], 0-based answer id
    hits = (answer_indices - 1) == predicted[:, None]
    hits = jnp.logical_and(hits, answer_indices > 0)
    agreeing = jnp.where(hits, answer_values, 0).sum(axis=-1)  # [B]
    score = jnp.clip(agreeing.astype(jnp.float32) * 0.3, None, 1.0)
    if sample_mask is not None:
        score = jnp.where(sample_mask, score, 0.0)
    return score.sum()


def vqa_accuracy_by_type(
    logits: jnp.ndarray,          # [B, A]
    answer_indices: jnp.ndarray,  # [B, K]
    answer_values: jnp.ndarray,   # [B, K]
    answer_types: jnp.ndarray,    # [B] int: 0=yes/no, 1=number, 2=other
    sample_mask: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-answer-type accuracy sums and counts, both [3] — the official
    VQA benchmark's yes/no / number / other breakdown (a capability the
    reference lacks). All on device (segment sums, no host loop)."""
    predicted = jnp.argmax(logits, axis=-1)
    hits = jnp.logical_and(
        (answer_indices - 1) == predicted[:, None], answer_indices > 0
    )
    agreeing = jnp.where(hits, answer_values, 0).sum(axis=-1)
    score = jnp.clip(agreeing.astype(jnp.float32) * 0.3, None, 1.0)
    ones = jnp.ones_like(score)
    if sample_mask is not None:
        score = jnp.where(sample_mask, score, 0.0)
        ones = jnp.where(sample_mask, ones, 0.0)
    sums = jax.ops.segment_sum(score, answer_types, num_segments=3)
    counts = jax.ops.segment_sum(ones, answer_types, num_segments=3)
    return sums, counts


def vqa_batch_stats(
    logits: jnp.ndarray,
    answer_indices: jnp.ndarray,
    answer_values: jnp.ndarray,
    sample_mask: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(loss, score_sum) for one batch — the jitted equivalent of the
    reference's ``run_batch`` outputs."""
    loss = soft_cross_entropy(logits, answer_indices, answer_values, sample_mask)
    score = vqa_accuracy_sum(logits, answer_indices, answer_values, sample_mask)
    return loss, score
