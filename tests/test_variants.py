"""Model variants: stacked attention (SAN), transformer text encoder,
co-attention fusion (BASELINE configs 3 and 5)."""

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
from dl_vqa_tpu.ops.lstm import bilstm_token_states

torch = pytest.importorskip("torch")


def _cfg(encoder="lstm", variant="single", do_option="+", max_answers=20,
         bidirectional=True):
    return ModelConfig(
        text=TextConfig(encoder=encoder, question_features=32,
                        embedding_features=16, dropout=0.0,
                        bidirectional=bidirectional, num_heads=4,
                        num_layers=2),
        image=ImageConfig(num_channels=(3, 4, 8), dropout=0.0),
        attention=AttentionConfig(variant=variant, hidden_dim=24, glimpses=2,
                                  do_option=do_option, dropout=0.0),
        classifier=ClassifierConfig(hidden_dim=16, dropout=0.0),
        max_answers=max_answers,
        image_size=32,
        num_tokens=40,
    )


def _batch(cfg, batch=4, seed=0):
    rng = np.random.default_rng(seed)
    questions = rng.integers(1, cfg.num_tokens, (batch, 7)).astype(np.int32)
    lengths = np.array([7, 3, 5, 1][:batch], dtype=np.int32)
    for i, l in enumerate(lengths):
        questions[i, l:] = 0
    return (
        jnp.asarray(rng.standard_normal(
            (batch, cfg.image_size, cfg.image_size, 3)), dtype=jnp.float32),
        jnp.asarray(questions),
        jnp.asarray(lengths),
    )


@pytest.mark.parametrize("encoder,variant", [
    ("lstm", "stacked"),
    ("lstm", "co"),
    ("transformer", "single"),
    ("transformer", "co"),
    ("transformer", "stacked"),
])
def test_variant_forward_shapes_and_grads(encoder, variant):
    cfg = _cfg(encoder=encoder, variant=variant)
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    images, questions, lengths = _batch(cfg)

    logits = vqa.apply(params, cfg, images, questions, lengths)
    assert logits.shape == (4, cfg.max_answers)
    assert bool(jnp.isfinite(logits).all())

    # jit + differentiable end to end
    def loss(p):
        out = vqa.apply(p, cfg, images, questions, lengths, train=True,
                        rng=jax.random.PRNGKey(1))
        return jnp.sum(out ** 2)

    grads = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    # at least one attention grad is nonzero
    att_leaves = jax.tree_util.tree_leaves(grads["attention"])
    assert any(float(jnp.abs(g).max()) > 0 for g in att_leaves)


def test_variant_10k_answers_classifier():
    cfg = _cfg(encoder="transformer", variant="co", max_answers=10_000)
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    images, questions, lengths = _batch(cfg)
    logits = vqa.apply(params, cfg, images, questions, lengths)
    assert logits.shape == (4, 10_000)


def test_bilstm_token_states_match_torch_packed_outputs():
    """Token-level bi-LSTM states must equal torch's packed outputs
    (zeros at pads) — the co-attention variant consumes these."""
    torch.manual_seed(0)
    batch, seq, emb, hid = 4, 9, 12, 16
    lengths = np.array([9, 2, 5, 7], dtype=np.int32)
    lstm = torch.nn.LSTM(emb, hid, bidirectional=True)
    x = torch.randn(batch, seq, emb)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        x, list(lengths), batch_first=True, enforce_sorted=False
    )
    out, _ = lstm(packed)
    expected, _ = torch.nn.utils.rnn.pad_packed_sequence(
        out, batch_first=True, total_length=seq
    )

    def p(suffix):
        return {
            "w_ih": jnp.asarray(
                getattr(lstm, f"weight_ih_l0{suffix}").detach().numpy().T),
            "w_hh": jnp.asarray(
                getattr(lstm, f"weight_hh_l0{suffix}").detach().numpy().T),
            "b": jnp.asarray(
                (getattr(lstm, f"bias_ih_l0{suffix}")
                 + getattr(lstm, f"bias_hh_l0{suffix}")).detach().numpy()),
        }

    actual = bilstm_token_states(
        jnp.asarray(x.numpy()), jnp.asarray(lengths), p(""), p("_reverse")
    )
    np.testing.assert_allclose(
        np.asarray(actual), expected.detach().numpy(), atol=1e-5, rtol=1e-5
    )


def test_stacked_attention_glimpses_differ():
    """The second glimpse must actually depend on the first (query
    refinement) — zeroing the update projection changes glimpse 2."""
    cfg = _cfg(variant="stacked")
    params = vqa.init(jax.random.PRNGKey(3), cfg)
    images, questions, lengths = _batch(cfg)

    base = vqa.apply(params, cfg, images, questions, lengths)
    cut = jax.tree_util.tree_map(lambda x: x, params)
    cut["attention"]["layers"][0]["update"]["w"] = jnp.zeros_like(
        cut["attention"]["layers"][0]["update"]["w"]
    )
    changed = vqa.apply(cut, cfg, images, questions, lengths)
    assert not np.allclose(np.asarray(base), np.asarray(changed))


def test_multilayer_lstm_rejected():
    cfg = _cfg()
    import dataclasses
    cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, num_lstm_layers=2)
    )
    with pytest.raises(NotImplementedError, match="num_lstm_layers"):
        vqa.init(jax.random.PRNGKey(0), cfg)


def test_transformer_dropout_active_in_train_mode():
    cfg = _cfg(encoder="transformer")
    import dataclasses
    cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, dropout=0.5)
    )
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    images, questions, lengths = _batch(cfg)
    t1 = vqa.apply(params, cfg, images, questions, lengths, train=True,
                   rng=jax.random.PRNGKey(1))
    t2 = vqa.apply(params, cfg, images, questions, lengths, train=True,
                   rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))
    e1 = vqa.apply(params, cfg, images, questions, lengths)
    e2 = vqa.apply(params, cfg, images, questions, lengths)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


@pytest.mark.parametrize("text_enc,att", [("lstm", "single"),
                                          ("transformer", "co")])
def test_vit_image_encoder(text_enc, att):
    import dataclasses
    cfg = _cfg(encoder=text_enc, variant=att)
    cfg = dataclasses.replace(
        cfg,
        image=dataclasses.replace(
            cfg.image, encoder="vit", patch_size=8, num_layers=2, num_heads=2,
            num_channels=(3, 16),  # model dim = 16
        ),
    )
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    images, questions, lengths = _batch(cfg)

    logits = vqa.apply(params, cfg, images, questions, lengths)
    assert logits.shape == (4, cfg.max_answers)
    assert bool(jnp.isfinite(logits).all())
    assert cfg.image.output_grid(cfg.image_size) == 4  # 32 / 8

    def loss(p):
        out = vqa.apply(p, cfg, images, questions, lengths, train=True,
                        rng=jax.random.PRNGKey(1))
        return jnp.sum(out ** 2)

    grads = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree_util.tree_leaves(grads["image"])
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_transformer_positional_table_sized_from_config():
    """max_positions sizes the learned positional table; questions past the
    cap fail with an actionable error, not an opaque broadcast (VERDICT r1)."""
    import dataclasses
    cfg = _cfg(encoder="transformer")
    cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, max_positions=80)
    )
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    assert params["text"]["pos"].shape[0] == 80

    # 70-token question: beyond the old hard-coded 64, within max_positions.
    batch = 2
    questions = jnp.ones((batch, 70), dtype=jnp.int32)
    lengths = jnp.array([70, 65], dtype=jnp.int32)
    images = jnp.zeros((batch, cfg.image_size, cfg.image_size, 3))
    logits = vqa.apply(params, cfg, images, questions, lengths)
    assert logits.shape == (batch, cfg.max_answers)

    # Past the table: clear ValueError naming the config knob.
    too_long = jnp.ones((batch, 81), dtype=jnp.int32)
    with pytest.raises(ValueError, match="max_positions"):
        vqa.apply(params, cfg, images, too_long,
                  jnp.array([81, 81], dtype=jnp.int32))


def test_vit_positional_table_overflow_is_actionable():
    import dataclasses
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg,
        image=dataclasses.replace(
            cfg.image, encoder="vit", patch_size=8, num_layers=1, num_heads=2,
            num_channels=(3, 16),
        ),
    )
    params = vqa.init(jax.random.PRNGKey(0), cfg)  # 32px -> 4x4 patch grid
    _, questions, lengths = _batch(cfg)
    big = jnp.zeros((4, 64, 64, 3))  # 8x8 grid > 16-entry table
    with pytest.raises(ValueError, match="positional table"):
        vqa.apply(params, cfg, big, questions, lengths)


def test_patch_embed_conv_matches_matmul():
    """The stride-P conv patch embed (TPU default) must be numerically
    interchangeable with the explicit patchify+matmul path, in both the
    forward and the gradient w.r.t. the shared patch_embed weight."""
    from dl_vqa_tpu.models.vit import (
        _patch_embed_conv,
        _patch_embed_matmul,
        init_vit_image,
    )

    params = init_vit_image(jax.random.PRNGKey(0), image_size=32,
                            patch_size=8, model_dim=16, num_layers=1)
    embed = params["patch_embed"]
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32, 3))

    a = _patch_embed_conv(x, embed, 8, jnp.float32)
    b = _patch_embed_matmul(x, embed, 8, jnp.float32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)

    def loss(fn, w):
        return jnp.sum(fn(x, {"w": w, "b": embed["b"]}, 8, jnp.float32) ** 2)

    ga = jax.grad(lambda w: loss(_patch_embed_conv, w))(embed["w"])
    gb = jax.grad(lambda w: loss(_patch_embed_matmul, w))(embed["w"])
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-4, atol=1e-4)


def test_patch_embed_conv_matches_matmul_bf16():
    """In bf16 the conv path emits its accumulator in compute dtype
    before the bias add while the matmul path keeps f32 through it (see
    the _patch_embed_conv docstring), so the paths agree only to ~one
    bf16 ulp of the pre-bias activation — assert that bound holds."""
    from dl_vqa_tpu.models.vit import (
        _patch_embed_conv,
        _patch_embed_matmul,
        init_vit_image,
    )

    params = init_vit_image(jax.random.PRNGKey(0), image_size=32,
                            patch_size=8, model_dim=16, num_layers=1)
    embed = params["patch_embed"]
    # apply_vit_image casts images to the compute dtype before the embed.
    x = jax.random.normal(
        jax.random.PRNGKey(1), (3, 32, 32, 3)
    ).astype(jnp.bfloat16)

    a = _patch_embed_conv(x, embed, 8, jnp.bfloat16).astype(np.float32)
    b = _patch_embed_matmul(x, embed, 8, jnp.bfloat16).astype(np.float32)
    # bf16 has 8 mantissa bits -> relative spacing 2^-8; allow a couple
    # of ulps of the activation scale.
    scale = float(np.max(np.abs(np.asarray(b)))) + 1e-6
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2 * scale / 256, rtol=2 / 256)
