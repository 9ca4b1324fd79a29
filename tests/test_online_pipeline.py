"""Online JPEG pipeline vs the offline h5 cache: identical model inputs
(BASELINE config 2 parity)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dl_vqa_tpu.data import synthetic
from dl_vqa_tpu.data.dataset import VQADataset
from dl_vqa_tpu.data.online import JpegLoader, OnlineBatcher
from dl_vqa_tpu.data.pipeline import Batcher


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("vqa_online")
    return synthetic.make_synthetic_corpus(
        str(root), n_train=16, n_val=12, n_images=5, image_size=64,
        max_answers=15,
    )


def test_online_batch_matches_h5_cache(corpus):
    """uint8 decode + on-device normalize must equal the fp16 h5 cache
    content within fp16 rounding (same PIL arithmetic)."""
    from dl_vqa_tpu.data.images import IMAGENET_MEAN, IMAGENET_STD

    val = VQADataset(
        data_paths=corpus["val_paths"], other_paths=corpus["paths"]
    )
    loader = JpegLoader(
        os.path.join(corpus["paths"]["base_path"], "val2014"),
        image_size=64, central_fraction=0.875,
    )
    online = OnlineBatcher(val, batch_size=4, loader=loader)
    offline = Batcher(val, batch_size=4)

    ob = next(iter(online))
    fb = next(iter(offline))
    assert ob["images"].dtype == np.uint8
    np.testing.assert_array_equal(ob["questions"], fb["questions"])

    normalized = (
        ob["images"].astype(np.float32) / 255.0 - IMAGENET_MEAN
    ) / IMAGENET_STD
    # h5 path went through fp16 storage; tolerance is fp16 quantization.
    np.testing.assert_allclose(normalized, fb["images"], atol=2e-3)


def test_model_accepts_uint8_images(corpus):
    from dl_vqa_tpu.models import ModelConfig, vqa
    from dl_vqa_tpu.models.configs import (
        AttentionConfig, ClassifierConfig, ImageConfig, TextConfig,
    )

    cfg = ModelConfig(
        text=TextConfig(question_features=16, embedding_features=8,
                        dropout=0.0),
        image=ImageConfig(num_channels=(3, 4, 6), dropout=0.0),
        attention=AttentionConfig(hidden_dim=12, glimpses=2, dropout=0.0),
        classifier=ClassifierConfig(hidden_dim=16, dropout=0.0),
        max_answers=15, image_size=64, num_tokens=30,
    )
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    questions = jnp.asarray(rng.integers(0, 30, (2, 5)), dtype=jnp.int32)
    lengths = jnp.array([5, 3], dtype=jnp.int32)

    logits_u8 = vqa.apply(params, cfg, jnp.asarray(u8), questions, lengths)

    from dl_vqa_tpu.data.images import IMAGENET_MEAN, IMAGENET_STD
    normalized = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    logits_f32 = vqa.apply(
        params, cfg, jnp.asarray(normalized), questions, lengths
    )
    np.testing.assert_allclose(
        np.asarray(logits_u8), np.asarray(logits_f32), atol=1e-4, rtol=1e-4
    )


def test_online_eval_equals_offline_eval(corpus):
    """Full eval pass through both pipelines -> same score/loss within
    fp16-cache tolerance."""
    from dl_vqa_tpu.models import ModelConfig, vqa
    from dl_vqa_tpu.models.configs import (
        AttentionConfig, ClassifierConfig, ImageConfig, TextConfig,
    )
    from dl_vqa_tpu.train import make_eval_step
    from dl_vqa_tpu.train.loop import evaluate

    val = VQADataset(
        data_paths=corpus["val_paths"], other_paths=corpus["paths"]
    )
    cfg = ModelConfig(
        text=TextConfig(question_features=16, embedding_features=8,
                        dropout=0.0),
        image=ImageConfig(num_channels=(3, 4, 6), dropout=0.0),
        attention=AttentionConfig(hidden_dim=12, glimpses=2, dropout=0.0),
        classifier=ClassifierConfig(hidden_dim=16, dropout=0.0),
        max_answers=len(val.answer_vocab), image_size=64,
        num_tokens=val.num_tokens,
    )
    params = vqa.init(jax.random.PRNGKey(1), cfg)
    eval_step = make_eval_step(cfg, compute_dtype=jnp.float32)

    loader = JpegLoader(
        os.path.join(corpus["paths"]["base_path"], "val2014"),
        image_size=64, central_fraction=0.875,
    )
    score_on, loss_on = evaluate(
        eval_step, params, OnlineBatcher(val, 4, loader)
    )
    score_off, loss_off = evaluate(eval_step, params, Batcher(val, 4))
    assert score_on == pytest.approx(score_off, abs=1e-6)
    assert loss_on == pytest.approx(loss_off, abs=1e-3)
