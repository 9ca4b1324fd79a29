"""Soft cross-entropy and VQA accuracy semantics (closed-form goldens per
ref train.py:190-206 and train_utils.py:12-25)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dl_vqa_tpu.ops.vqa_metrics import (
    soft_cross_entropy,
    vqa_accuracy_sum,
    vqa_batch_stats,
)


def _log_softmax(x):
    x = x - x.max(axis=-1, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))


def test_soft_ce_closed_form():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 5)).astype(np.float32)
    # sample 0: answer id 2 (count 4), id 5 (count 6); sample 1: id 1 (count 10)
    indices = np.array([[2, 5], [1, 0]], dtype=np.int32)
    values = np.array([[4, 6], [10, 0]], dtype=np.int32)

    nll = -_log_softmax(logits)
    expected = (
        nll[0, 1] * 0.4 + nll[0, 4] * 0.6 + nll[1, 0] * 1.0
    ) / 2.0  # 1-based ids re-based; weights count/10; mean over batch

    actual = float(
        soft_cross_entropy(jnp.asarray(logits), jnp.asarray(indices),
                           jnp.asarray(values))
    )
    assert actual == pytest.approx(expected, rel=1e-6)


def test_soft_ce_ignores_padding_slots():
    logits = jnp.asarray(np.random.default_rng(1).standard_normal((1, 4)),
                         dtype=jnp.float32)
    dense = soft_cross_entropy(
        logits, jnp.array([[2, 0, 0]]), jnp.array([[10, 0, 0]])
    )
    tight = soft_cross_entropy(logits, jnp.array([[2]]), jnp.array([[10]]))
    assert float(dense) == pytest.approx(float(tight), rel=1e-7)


def test_accuracy_clamp_and_coefficient():
    # argmax -> answer id 3 (1-based), counts: 1 -> 0.3; 3 -> 0.9; 4 -> 1.0 (clamped)
    logits = jnp.asarray(np.eye(5, dtype=np.float32)[[2, 2, 2]] * 10)
    indices = jnp.array([[3], [3], [3]])
    for count, expected in [(1, 0.3), (3, 0.9), (4, 1.0)]:
        values = jnp.array([[count]] * 3)
        score = float(vqa_accuracy_sum(logits, indices, values))
        assert score == pytest.approx(3 * expected, rel=1e-6)


def test_accuracy_zero_when_prediction_not_annotated():
    logits = jnp.asarray(np.eye(5, dtype=np.float32)[[0]] * 10)  # predicts id 1
    score = float(vqa_accuracy_sum(logits, jnp.array([[4]]), jnp.array([[10]])))
    assert score == 0.0


def test_accuracy_padding_slot_not_counted():
    # prediction = answer 0 (0-based) = vocab id 1; a padding slot (index 0)
    # must never match even though 0 - 1 == -1 != prediction... and a
    # corrupted value in a padded slot must not leak in.
    logits = jnp.asarray(np.eye(5, dtype=np.float32)[[0]] * 10)
    indices = jnp.array([[1, 0]])
    values = jnp.array([[2, 7]])  # the 7 sits in a padded slot
    score = float(vqa_accuracy_sum(logits, indices, values))
    assert score == pytest.approx(0.6, rel=1e-6)


def test_sample_mask_for_partial_batches():
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((4, 6)).astype(np.float32)
    indices = np.array([[1], [2], [3], [4]], dtype=np.int32)
    values = np.array([[10], [10], [10], [10]], dtype=np.int32)
    mask = np.array([True, True, True, False])

    loss_masked, score_masked = vqa_batch_stats(
        jnp.asarray(logits), jnp.asarray(indices), jnp.asarray(values),
        jnp.asarray(mask),
    )
    loss_real, score_real = vqa_batch_stats(
        jnp.asarray(logits[:3]), jnp.asarray(indices[:3]),
        jnp.asarray(values[:3]),
    )
    assert float(loss_masked) == pytest.approx(float(loss_real), rel=1e-6)
    assert float(score_masked) == pytest.approx(float(score_real), rel=1e-6)


def test_accuracy_by_type():
    from dl_vqa_tpu.ops.vqa_metrics import vqa_accuracy_by_type

    # 4 samples: types [0, 0, 1, 2]; predictions hit answers with counts
    # [10, 0(miss), 2, 4] -> scores [1.0, 0, 0.6, 1.0]
    logits = jnp.asarray(np.eye(5, dtype=np.float32)[[0, 1, 2, 3]] * 10)
    indices = jnp.array([[1], [4], [3], [4]])
    values = jnp.array([[10], [10], [2], [4]])
    types = jnp.array([0, 0, 1, 2])
    sums, counts = vqa_accuracy_by_type(logits, indices, values, types)
    np.testing.assert_allclose(np.asarray(sums), [1.0, 0.6, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(counts), [2.0, 1.0, 1.0])

    # padded sample excluded from both sum and count
    mask = jnp.array([True, True, True, False])
    sums, counts = vqa_accuracy_by_type(logits, indices, values, types, mask)
    np.testing.assert_allclose(np.asarray(sums), [1.0, 0.6, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(counts), [2.0, 1.0, 0.0])
