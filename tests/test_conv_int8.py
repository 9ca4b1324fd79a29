"""int8 (W8A8) CNN-stem serving mode (ops/conv_int8).

The mode changes numerics by design (static PTQ quantization), so these
tests pin (a) the quantization algebra exactly, (b) the stem against the
exact bf16 stem within the int8 error envelope, and (c) the config/guard
surface (inference-only, calibrated scales required).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dl_vqa_tpu.ops.conv_int8 import (
    calibrate_stem_scales,
    conv_relu_pool_w8a8,
    dequantize,
    int8_stem_forward,
    quantize_relu_pool,
    quantize_weights_per_channel,
    with_calibrated_scales,
)


def _small_cfg(store_dtype="compute", quant_scales=()):
    from dl_vqa_tpu.models.configs import (
        AttentionConfig, ClassifierConfig, ImageConfig, ModelConfig,
        TextConfig,
    )

    return ModelConfig(
        text=TextConfig(question_features=16, embedding_features=8,
                        dropout=0.0),
        image=ImageConfig(num_channels=(3, 8, 16), dropout=0.0,
                          store_dtype=store_dtype,
                          quant_scales=quant_scales),
        attention=AttentionConfig(hidden_dim=16, glimpses=2, dropout=0.0),
        classifier=ClassifierConfig(hidden_dim=16, dropout=0.0),
        max_answers=32,
        image_size=32,
        num_tokens=64,
    )


# ------------------------------------------------------------ quant algebra

def test_weight_quantization_roundtrip(rng):
    """Per-output-channel symmetric quantization reconstructs weights
    within half an LSB of each channel's scale; zero channels survive."""
    w = rng.standard_normal((3, 3, 8, 16)).astype(np.float32)
    w[..., 3] = 0.0  # an all-zero output channel must not produce 0/0
    w_q, scale = quantize_weights_per_channel(jnp.asarray(w))
    assert w_q.dtype == jnp.int8
    recon = np.asarray(w_q, dtype=np.float32) * np.asarray(scale)
    lsb = np.asarray(scale)  # quantization step per channel
    assert np.all(np.abs(recon - w) <= 0.5 * lsb + 1e-7)
    assert np.all(np.asarray(w_q)[..., 3] == 0)
    # Scale hits the amax exactly on nonzero channels: amax = scale*127;
    # the zero channel gets the scale-1 convention.
    amax = np.abs(w).max(axis=(0, 1, 2))
    scale_np = np.asarray(scale)
    nonzero = amax > 0
    np.testing.assert_allclose(amax[nonzero], scale_np[nonzero] * 127.0,
                               rtol=1e-6)
    assert scale_np[~nonzero] == pytest.approx(1.0)


def test_quantize_then_pool_commutes(rng):
    """round/clip are monotone, so quantize->maxpool == maxpool->quantize
    (the kernel pools in int8 to halve pool HBM traffic)."""
    y = rng.standard_normal((2, 8, 8, 4)).astype(np.float32) * 3.0
    s = 2.5
    q_then_pool = np.asarray(quantize_relu_pool(jnp.asarray(y), s))
    pooled = jax.lax.reduce_window(
        jax.nn.relu(jnp.asarray(y)), -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
        padding="VALID",
    )
    pool_then_q = np.clip(
        np.round(np.asarray(pooled) * (127.0 / s)), 0, 127
    ).astype(np.int8)
    np.testing.assert_array_equal(q_then_pool, pool_then_q)


def test_w8a8_block_tracks_exact_block(rng):
    """One W8A8 conv block stays within the a8 quantization envelope of
    the exact f32 conv->relu->pool block."""
    cin, cout, s_in, s_out = 8, 16, 1.0, None
    x = np.clip(rng.standard_normal((2, 12, 12, cin)), 0, None)
    x = x.astype(np.float32)
    x_amax = float(x.max())
    x_q = jnp.asarray(
        np.clip(np.round(x * (127.0 / x_amax)), 0, 127).astype(np.int8)
    )
    w = (rng.standard_normal((3, 3, cin, cout)) * 0.1).astype(np.float32)
    b = (rng.standard_normal((cout,)) * 0.01).astype(np.float32)

    exact_conv = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    exact = jax.lax.reduce_window(
        jax.nn.relu(exact_conv + b), -jnp.inf, jax.lax.max,
        (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
    )
    s_out = float(jax.nn.relu(exact_conv + b).max())
    out_q = conv_relu_pool_w8a8(x_q, x_amax, jnp.asarray(w), jnp.asarray(b),
                                stride=1, s_out=s_out)
    assert out_q.dtype == jnp.int8
    out = np.asarray(dequantize(out_q, s_out, jnp.float32))
    # Error budget: input a8 (~x_amax/254 per element, ~3x3x8 accumulated)
    # + weight w8 + output a8 (s_out/254). Empirically well under 2% of
    # the output scale; assert 4% for slack.
    assert np.max(np.abs(out - np.asarray(exact))) < 0.04 * s_out


# ------------------------------------------------------- calibration + stem

def test_calibration_and_stem_close_to_exact(rng):
    """The full int8 stem (conv0 bf16, blocks 1.. W8A8) tracks the exact
    f32 stem within a few percent of each block's activation scale."""
    from dl_vqa_tpu.models import vqa

    cfg = _small_cfg()
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(rng.standard_normal((4, 32, 32, 3)),
                         dtype=jnp.float32)

    scales = calibrate_stem_scales(params, cfg, images, dtype=jnp.float32)
    assert len(scales) == len(cfg.image.num_channels) - 1
    assert all(isinstance(s, float) and s > 0 for s in scales)

    out = int8_stem_forward(params["image"], images, scales,
                            cfg.image.stride, jnp.float32)
    # Exact f32 stem for comparison.
    x = images
    for block in range(len(cfg.image.num_channels) - 1):
        p = params["image"][f"conv{block}"]
        conv = jax.lax.conv_general_dilated(
            x, p["w"].astype(jnp.float32), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = jax.lax.reduce_window(
            jax.nn.relu(conv + p["b"]), -jnp.inf, jax.lax.max,
            (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
        )
    err = np.max(np.abs(np.asarray(out) - np.asarray(x)))
    assert err < 0.05 * scales[-1], (err, scales)


def test_stem_scale_count_mismatch_raises(rng):
    from dl_vqa_tpu.models import vqa

    cfg = _small_cfg()
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    images = jnp.zeros((1, 32, 32, 3), jnp.float32)
    with pytest.raises(ValueError, match="recalibrate"):
        int8_stem_forward(params["image"], images, (1.0,),
                          cfg.image.stride, jnp.float32)


def test_calibration_rejects_degenerate_batch():
    from dl_vqa_tpu.models import vqa

    cfg = _small_cfg()
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    # An all-zero calibration batch gives amax 0 on some block -> loud.
    # (relu(0*w + b) can still be positive via bias, so zero out biases.)
    params = jax.tree_util.tree_map(jnp.zeros_like, params)
    with pytest.raises(ValueError, match="calibration"):
        calibrate_stem_scales(params, cfg,
                              jnp.zeros((1, 32, 32, 3), jnp.float32))


# ----------------------------------------------------------- model surface

def test_model_int8_mode_end_to_end(rng):
    """store_dtype='int8' + calibrated scales runs the full model and
    stays near the exact logits; missing scales and train=True fail
    loudly."""
    from dl_vqa_tpu.models import vqa

    cfg = _small_cfg()
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(rng.standard_normal((2, 32, 32, 3)),
                         dtype=jnp.float32)
    questions = jnp.asarray(rng.integers(1, 64, (2, 6)), dtype=jnp.int32)
    lengths = jnp.asarray([6, 3], dtype=jnp.int32)

    ref = vqa.apply(params, cfg, images, questions, lengths, train=False)

    cfg_int8 = with_calibrated_scales(cfg, params, images,
                                      dtype=jnp.float32)
    assert cfg_int8.image.store_dtype == "int8"
    out = vqa.apply(params, cfg_int8, images, questions, lengths,
                    train=False)
    assert np.all(np.isfinite(np.asarray(out)))
    assert float(jnp.abs(out - ref).max()) < 1.0  # same regime as f8 test

    cfg_noscales = _small_cfg(store_dtype="int8")
    with pytest.raises(ValueError, match="calibrate"):
        vqa.apply(params, cfg_noscales, images, questions, lengths,
                  train=False)

    with pytest.raises(ValueError, match="inference-only"):
        vqa.apply(params, cfg_int8, images, questions, lengths,
                  train=True, rng=jax.random.PRNGKey(0))


def test_int8_mode_is_jittable(rng):
    """quant_scales are static config: the int8 eval path traces under
    jit with cfg as a static argument (the serving entry points jit it)."""
    from dl_vqa_tpu.models import vqa

    cfg = _small_cfg()
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(rng.standard_normal((2, 32, 32, 3)),
                         dtype=jnp.float32)
    questions = jnp.asarray(rng.integers(1, 64, (2, 6)), dtype=jnp.int32)
    lengths = jnp.asarray([6, 3], dtype=jnp.int32)
    cfg_int8 = with_calibrated_scales(cfg, params, images,
                                      dtype=jnp.float32)

    @jax.jit
    def run(params, images, questions, lengths):
        return vqa.apply(params, cfg_int8, images, questions, lengths,
                         train=False)

    eager = vqa.apply(params, cfg_int8, images, questions, lengths,
                      train=False)
    np.testing.assert_allclose(np.asarray(run(params, images, questions,
                                              lengths)),
                               np.asarray(eager), rtol=1e-5, atol=1e-5)
