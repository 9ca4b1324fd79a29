"""ViT W8A8 serving mode (ops/vit_int8.py): int8 MXU block matmuls with
static PTQ scales. Measured 1.48x on the isolated MLP pair on v5e
(experiments/probe_vit_int8_mlp.py); these tests pin the math and the
calibrate->serve plumbing on CPU."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dl_vqa_tpu.models import ModelConfig, vqa
from dl_vqa_tpu.models.configs import (
    AttentionConfig,
    ClassifierConfig,
    ImageConfig,
    TextConfig,
)
from dl_vqa_tpu.ops.vit_int8 import (
    calibrate_vit_scales,
    w8a8_linear,
    with_calibrated_vit_scales,
)


def _vit_cfg(**image_kw):
    return ModelConfig(
        text=TextConfig(question_features=16, embedding_features=8,
                        dropout=0.0),
        image=ImageConfig(encoder="vit", num_channels=(3, 16), patch_size=8,
                          num_layers=2, num_heads=2, dropout=0.0,
                          **image_kw),
        attention=AttentionConfig(hidden_dim=16, glimpses=2, dropout=0.0),
        classifier=ClassifierConfig(hidden_dim=16, dropout=0.0),
        max_answers=16,
        image_size=32,
        num_tokens=32,
    )


def _inputs(cfg, batch=4, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.standard_normal(
            (batch, cfg.image_size, cfg.image_size, 3)
        ).astype(np.float32),
        rng.integers(0, cfg.num_tokens, (batch, 6)).astype(np.int32),
        rng.integers(1, 7, (batch,)).astype(np.int32),
    )


def test_w8a8_linear_close_to_f32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((16, 24)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(24) * 0.1, jnp.float32)
    s_in = float(jnp.max(jnp.abs(x)))
    got = w8a8_linear(x, w, b, s_in, jnp.float32)
    ref = x @ w + b
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_w8a8_linear_saturates_beyond_scale():
    """Inputs beyond the calibrated amax clip at +-127 (static PTQ
    semantics), not overflow."""
    x = jnp.asarray([[100.0, -100.0]], jnp.float32)
    w = jnp.eye(2, dtype=jnp.float32)
    b = jnp.zeros(2, jnp.float32)
    out = w8a8_linear(x, w, b, s_in=1.0, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), [[1.0, -1.0]], atol=1e-6)


def test_calibration_counts_and_positivity():
    cfg = _vit_cfg()
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    images, _, _ = _inputs(cfg, batch=8)
    scales = calibrate_vit_scales(params, cfg, jnp.asarray(images),
                                  dtype=jnp.float32)
    assert len(scales) == 4 * cfg.image.num_layers
    assert all(s > 0 for s in scales)


def test_int8_model_matches_bf16_closely():
    """The calibrated W8A8 forward tracks the f32 forward: per-site
    quantization is ~1% rel, so logits agree to a few percent and the
    answer ranking is essentially preserved on a calibrated
    distribution."""
    cfg = _vit_cfg()
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    images, questions, lengths = _inputs(cfg, batch=8, seed=1)

    cfg_int8 = with_calibrated_vit_scales(
        cfg, params, jnp.asarray(images), dtype=jnp.float32
    )
    assert cfg_int8.image.store_dtype == "int8"
    ref = vqa.apply(params, cfg, images, questions, lengths,
                    compute_dtype=jnp.float32)
    got = vqa.apply(params, cfg_int8, images, questions, lengths,
                    compute_dtype=jnp.float32)
    rel = float(
        jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref)
    )
    assert rel < 0.10, rel
    # ranking survives for most samples at this scale
    agree = float(
        (jnp.argmax(got, -1) == jnp.argmax(ref, -1)).mean()
    )
    assert agree >= 0.75, agree

    # jitted eval step builds and runs with the static scales
    from dl_vqa_tpu.train.steps import make_eval_step

    step = make_eval_step(cfg_int8, compute_dtype=jnp.float32)
    batch = {
        "images": images, "questions": questions, "lengths": lengths,
        "answer_indices": np.ones((8, 2), np.int32),
        "answer_values": np.ones((8, 2), np.int32),
        "mask": np.ones((8,), bool),
    }
    loss, score = step(params, jax.device_put(batch))
    assert np.isfinite(float(loss))


def test_int8_guards():
    cfg = _vit_cfg()
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    images, questions, lengths = _inputs(cfg)

    # no scales -> loud error
    bad = dataclasses.replace(
        cfg, image=dataclasses.replace(cfg.image, store_dtype="int8")
    )
    with pytest.raises(ValueError, match="quant_scales"):
        vqa.apply(params, bad, images, questions, lengths,
                  compute_dtype=jnp.float32)

    # training through the int8 path -> loud error
    good = with_calibrated_vit_scales(cfg, params, jnp.asarray(images),
                                      dtype=jnp.float32)
    with pytest.raises(ValueError, match="inference-only"):
        vqa.apply(params, good, images, questions, lengths, train=True,
                  rng=jax.random.PRNGKey(0), compute_dtype=jnp.float32)

    # f8 stem mode still rejected for the vit
    f8 = dataclasses.replace(
        cfg, image=dataclasses.replace(cfg.image, store_dtype="f8e4m3")
    )
    with pytest.raises(ValueError, match="CNN-stem"):
        vqa.apply(params, f8, images, questions, lengths,
                  compute_dtype=jnp.float32)

    # MoE + int8 -> loud error
    moe_cfg = _vit_cfg(moe_experts=4)
    moe_params = vqa.init(jax.random.PRNGKey(0), moe_cfg)
    moe_int8 = dataclasses.replace(
        moe_cfg,
        image=dataclasses.replace(
            moe_cfg.image, store_dtype="int8",
            quant_scales=tuple([1.0] * 8),
        ),
    )
    with pytest.raises(ValueError, match="MoE"):
        vqa.apply(moe_params, moe_int8, images, questions, lengths,
                  compute_dtype=jnp.float32)


def test_predictor_calibrates_vit_int8(tmp_path):
    """Predictor.calibrate_int8 dispatches to the ViT calibrator when the
    checkpoint's encoder is vit, and the calibrated forward serves."""
    from dl_vqa_tpu import config as config_mod
    from dl_vqa_tpu.data import synthetic
    from dl_vqa_tpu.data.dataset import VQADataset
    from dl_vqa_tpu.utils import checkpoint as ckpt
    from predict import Predictor
    import os

    profile = synthetic.make_synthetic_corpus(
        str(tmp_path / "data"), n_train=16, n_val=8, n_images=4,
        image_size=32, max_answers=12,
    )
    overrides = [
        "main.use_full=false",
        "train.max_answers=12",
        "train.image_size=32",
        "train.text.question_features=16",
        "train.text.embedding_features=8",
        "train.image.encoder=vit",
        "train.image.num_channels=[3, 16]",
        "train.image.patch_size=8",
        "train.image.num_layers=2",
        "train.image.num_heads=2",
        "train.image.store_dtype=int8",
        "train.attention.hidden_dim=12",
        "train.classifier.hidden_dim=16",
        "tpu.compute_dtype=float32",
        f"main.small.paths.vocab_path={profile['paths']['vocab_path']}",
        f"main.small.paths.pretrained_model_path={tmp_path}/model.ckpt",
    ]
    cfg = config_mod.compose("config_eval", overrides=overrides)
    ds = VQADataset(
        data_paths=profile["val_paths"], other_paths=profile["paths"]
    )
    # train-time config (compute) for init/save; serving flips to int8
    train_cfg = ModelConfig.from_cfg(cfg["train"], ds.num_tokens)
    train_cfg = dataclasses.replace(
        train_cfg,
        image=dataclasses.replace(train_cfg.image, store_dtype="compute"),
    )
    params = vqa.init(jax.random.PRNGKey(0), train_cfg)
    ckpt.save_checkpoint(str(tmp_path / "model.ckpt"), params,
                         model_cfg=train_cfg)

    predictor = Predictor(
        cfg, checkpoint_path=f"{tmp_path}/model.ckpt",
        vocab_path=profile["paths"]["vocab_path"],
        num_tokens=ds.num_tokens,
    )
    assert predictor.needs_int8_calibration
    img_dir = os.path.join(profile["paths"]["base_path"], "val2014")
    paths = [
        os.path.join(img_dir, f) for f in sorted(os.listdir(img_dir))[:3]
    ]
    predictor.calibrate_int8(predictor.load_images(paths))
    assert len(predictor.model_cfg.image.quant_scales) == 8
    results = predictor.predict([paths[0]], ["what color is the cat?"],
                                top_k=2)
    answers, probs = zip(*results[0])
    assert len(answers) == 2 and all(np.isfinite(p) for p in probs)
