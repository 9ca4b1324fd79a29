"""Pallas kernel equivalence tests, run in interpreter mode on CPU
(SURVEY.md §4 tier 5: kernel-vs-XLA-reference, no TPU needed in CI)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dl_vqa_tpu.ops.conv_fused import (
    conv_relu_pool,
    conv_relu_pool_pallas,
    conv_relu_pool_reference,
)
from dl_vqa_tpu.ops.lstm import lstm_scan
from dl_vqa_tpu.ops.lstm_pallas import lstm_scan_pallas


@pytest.mark.parametrize("h,cin,cout,k", [
    (64, 3, 8, 3),
    (37, 16, 32, 3),   # odd conv-output width -> padding path
    (24, 8, 16, 5),    # k=5
    (20, 32, 8, 3),
])
def test_conv_relu_pool_matches_reference(h, cin, cout, k, rng):
    x = jnp.asarray(rng.standard_normal((2, h, h, cin)), dtype=jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.1,
                    dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal(cout) * 0.1, dtype=jnp.float32)
    ref = conv_relu_pool_reference(x, w, b, 1)
    out = conv_relu_pool_pallas(x, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_conv_relu_pool_gradients_match(rng):
    x = jnp.asarray(rng.standard_normal((2, 20, 20, 16)), dtype=jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.1,
                    dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal(8) * 0.1, dtype=jnp.float32)

    def loss_fused(x, w, b):
        return jnp.sum(conv_relu_pool(x, w, b, use_pallas=True,
                                      interpret=True) ** 2)

    def loss_ref(x, w, b):
        return jnp.sum(conv_relu_pool_reference(x, w, b, 1) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, e in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=1e-4, rtol=1e-4)


def test_conv_dispatch_falls_back_off_tpu(rng):
    # On CPU without interpret, the fused path must route to XLA.
    x = jnp.asarray(rng.standard_normal((1, 12, 12, 16)), dtype=jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 8)) * 0.1,
                    dtype=jnp.float32)
    b = jnp.zeros(8, dtype=jnp.float32)
    out = conv_relu_pool(x, w, b, use_pallas=True)
    ref = conv_relu_pool_reference(x, w, b, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("batch,seq,emb,hid", [(16, 11, 16, 32), (8, 5, 8, 16)])
def test_lstm_pallas_matches_scan(batch, seq, emb, hid, rng):
    x = jnp.asarray(rng.standard_normal((batch, seq, emb)), dtype=jnp.float32)
    lengths = jnp.asarray(rng.integers(1, seq + 1, batch), dtype=jnp.int32)
    params = {
        "w_ih": jnp.asarray(rng.standard_normal((emb, 4 * hid)) * 0.1,
                            dtype=jnp.float32),
        "w_hh": jnp.asarray(rng.standard_normal((hid, 4 * hid)) * 0.1,
                            dtype=jnp.float32),
        "b": jnp.asarray(rng.standard_normal(4 * hid) * 0.1,
                         dtype=jnp.float32),
    }
    h_ref, c_ref = lstm_scan(x, lengths, params)
    h, c = lstm_scan_pallas(x, lengths, params, True)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref),
                               atol=1e-6, rtol=1e-6)


def test_lstm_pallas_gradients_match(rng):
    batch, seq, emb, hid = 8, 7, 8, 16
    x = jnp.asarray(rng.standard_normal((batch, seq, emb)), dtype=jnp.float32)
    lengths = jnp.asarray(rng.integers(1, seq + 1, batch), dtype=jnp.int32)
    params = {
        "w_ih": jnp.asarray(rng.standard_normal((emb, 4 * hid)) * 0.1,
                            dtype=jnp.float32),
        "w_hh": jnp.asarray(rng.standard_normal((hid, 4 * hid)) * 0.1,
                            dtype=jnp.float32),
        "b": jnp.asarray(rng.standard_normal(4 * hid) * 0.1,
                         dtype=jnp.float32),
    }

    def loss_p(x, p):
        h, c = lstm_scan_pallas(x, lengths, p, True)
        return jnp.sum(c ** 2) + jnp.sum(h)

    def loss_r(x, p):
        h, c = lstm_scan(x, lengths, p)
        return jnp.sum(c ** 2) + jnp.sum(h)

    gp = jax.grad(loss_p, argnums=(0, 1))(x, params)
    gr = jax.grad(loss_r, argnums=(0, 1))(x, params)
    for a, e in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=1e-5, rtol=1e-5)


# ------------------------------------------------------------- attention pool

def test_attention_pool_matches_reference(rng):
    from dl_vqa_tpu.ops.attention_pool import (
        attention_pool_pallas,
        attention_pool_reference,
    )

    v = jnp.asarray(rng.standard_normal((16, 6, 6, 32)), dtype=jnp.float32)
    att = jnp.asarray(rng.standard_normal((16, 6, 6, 2)), dtype=jnp.float32)
    ref = attention_pool_reference(v, att)
    out = attention_pool_pallas(v, att, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_attention_pool_gradients_match(rng):
    from dl_vqa_tpu.ops.attention_pool import (
        attention_pool_fused,
        attention_pool_reference,
    )

    v = jnp.asarray(rng.standard_normal((8, 4, 4, 16)), dtype=jnp.float32)
    att = jnp.asarray(rng.standard_normal((8, 4, 4, 2)), dtype=jnp.float32)

    def loss_p(v, att):
        return jnp.sum(
            attention_pool_fused(v, att, use_pallas=True, interpret=True) ** 2
        )

    def loss_r(v, att):
        return jnp.sum(attention_pool_reference(v, att) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1))(v, att)
    gr = jax.grad(loss_r, argnums=(0, 1))(v, att)
    for a, e in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=1e-5, rtol=1e-5)


# ------------------------------------------------- experimental stem kernels

@pytest.mark.parametrize("h,k", [(34, 3), (21, 3), (28, 5)])
def test_stem_patches_kernel_matches_reference(h, k, rng):
    from dl_vqa_tpu.ops.conv_fused import conv_relu_pool_stem

    x = jnp.asarray(rng.standard_normal((2, h, h, 3)), dtype=jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, 3, 8)) * 0.1,
                    dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal(8) * 0.1, dtype=jnp.float32)
    ref = conv_relu_pool_reference(x, w, b, 1)
    out = conv_relu_pool_stem(x, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_relu_maxpool_kernel_matches_reference(rng):
    from dl_vqa_tpu.ops.conv_fused import relu_maxpool_pallas

    x = jnp.asarray(rng.standard_normal((2, 30, 30, 16)), dtype=jnp.float32)
    w = jnp.asarray(np.eye(16)[None, None] * 1.0, dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal(16) * 0.1, dtype=jnp.float32)
    # reference: identity 1x1 conv then relu+pool == relu_maxpool on x
    ref = conv_relu_pool_reference(x, w, b, 1)
    out = relu_maxpool_pallas(x, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("shape", [(2, 30, 30, 16), (3, 21, 23, 8)])
def test_relu_maxpool_direct_kernel_matches_reference(rng, shape):
    """The round-5 in-kernel sub-tile-split pool variant (measured LOSS
    on v5e — kept experimental; see its docstring) must stay exact."""
    from dl_vqa_tpu.ops.conv_fused import relu_maxpool_pallas_direct

    c = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
    w = jnp.asarray(np.eye(c)[None, None] * 1.0, dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal(c) * 0.1, dtype=jnp.float32)
    ref = conv_relu_pool_reference(x, w, b, 1)
    out = relu_maxpool_pallas_direct(x, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("stride,h,w_", [(1, 13, 15), (2, 14, 14),
                                         (1, 21, 21)])
def test_fastgrad_conv_block_bit_identical_gradients(stride, h, w_, rng):
    """conv_relu_pool_fastgrad (the measured-default training backward)
    must be BIT-identical to plain autodiff of the reference impl — same
    select_and_scatter tie semantics, pooled-side relu gate exactness."""
    from dl_vqa_tpu.ops.conv_fused import conv_relu_pool_fastgrad

    x = jnp.asarray(rng.standard_normal((3, h, w_, 5)), dtype=jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 5, 8)) * 0.3,
                    dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal(8) * 0.1, dtype=jnp.float32)
    out_ref = conv_relu_pool_reference(x, w, b, stride)
    cot = jnp.asarray(rng.standard_normal(out_ref.shape), dtype=jnp.float32)

    np.testing.assert_array_equal(
        np.asarray(conv_relu_pool_fastgrad(x, w, b, stride)),
        np.asarray(out_ref),
    )

    def loss_fast(x, w, b):
        return (conv_relu_pool_fastgrad(x, w, b, stride) * cot).sum()

    def loss_ref(x, w, b):
        return (conv_relu_pool_reference(x, w, b, stride) * cot).sum()

    g_fast = jax.grad(loss_fast, argnums=(0, 1, 2))(x, w, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    # dx/dw go through the same conv transposes on the same cotangent:
    # bit-identical. db sums the same values in a different order (pooled
    # side vs full-size), so it matches to float rounding only.
    for a, e, name in zip(g_fast[:2], g_ref[:2], "x w".split()):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(e), err_msg=f"d{name} differs"
        )
    np.testing.assert_allclose(
        np.asarray(g_fast[2]), np.asarray(g_ref[2]), rtol=1e-5, atol=1e-6,
        err_msg="db differs beyond reduction-order rounding",
    )


def test_fastgrad_handles_dead_relu_windows(rng):
    """Pool windows whose max is exactly 0 (fully dead relu) must get zero
    gradient — the pooled-side gate's correctness hinges on this case."""
    from dl_vqa_tpu.ops.conv_fused import conv_relu_pool_fastgrad

    x = jnp.asarray(rng.standard_normal((2, 10, 10, 4)), dtype=jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 6)) * 0.2,
                    dtype=jnp.float32)
    b = jnp.full((6,), -100.0)  # every relu output is 0 -> no gradient

    def loss(x, w, b):
        return conv_relu_pool_fastgrad(x, w, b, 1).sum()

    gx, gw, gb = jax.grad(loss, argnums=(0, 1, 2))(x, w, b)
    assert float(jnp.abs(gx).max()) == 0.0
    assert float(jnp.abs(gw).max()) == 0.0
    assert float(jnp.abs(gb).max()) == 0.0


def test_dropout_u8_statistics_and_determinism(rng):
    """The u8-mask dropout must keep ~quantized-keep fraction, preserve the
    mean exactly in expectation (scale uses the same quantized keep), and
    be deterministic given the rng key."""
    from dl_vqa_tpu.models.vqa import _dropout

    x = jnp.ones((2048, 512))
    key = jax.random.PRNGKey(3)
    y1 = _dropout(x, 0.3, True, key)
    y2 = _dropout(x, 0.3, True, key)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    keep_frac = float((np.asarray(y1) != 0).mean())
    assert abs(keep_frac - 179 / 256) < 0.01       # quantized keep of 0.7
    assert abs(float(y1.mean()) - 1.0) < 0.01      # inverted scaling exact
    kept = np.asarray(y1)[np.asarray(y1) != 0]
    np.testing.assert_allclose(kept, 256 / 179, rtol=1e-6)

    # Degenerate rates: no-op and all-drop.
    np.testing.assert_array_equal(np.asarray(_dropout(x, 0.0, True, key)),
                                  np.asarray(x))
    assert float(jnp.abs(_dropout(x, 1.0, True, key)).max()) == 0.0
    np.testing.assert_array_equal(np.asarray(_dropout(x, 0.5, False, key)),
                                  np.asarray(x))


@pytest.mark.parametrize("b,s,h,d", [(4, 196, 4, 64), (2, 50, 2, 64)])
def test_vit_attention_qkv_kernel_matches_reference(b, s, h, d, rng):
    """Packed-qkv flash attention (the ViT eval path on TPU) must match
    the XLA reference in both values and gradients."""
    from dl_vqa_tpu.ops.vit_attention_pallas import (
        vit_attention_qkv_pallas,
        vit_attention_qkv_reference,
    )

    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * h * d)),
                      dtype=jnp.float32)
    ref = vit_attention_qkv_reference(qkv, h)
    out = vit_attention_qkv_pallas(qkv, h, True)
    assert out.shape == (b, s, h * d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    g_k = jax.grad(
        lambda t: jnp.sum(vit_attention_qkv_pallas(t, h, True) ** 2)
    )(qkv)
    g_r = jax.grad(
        lambda t: jnp.sum(vit_attention_qkv_reference(t, h) ** 2)
    )(qkv)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("b,s,h,d", [(4, 196, 4, 64), (2, 50, 2, 64)])
def test_vit_attention_fused_bwd_matches_reference(b, s, h, d, rng):
    """The Pallas flash backward (training-path kernel) must produce the
    same dqkv as the XLA reference VJP, on a NON-uniform cotangent (sum
    of squares exercises all of dq/dk/dv asymmetrically)."""
    from dl_vqa_tpu.ops.vit_attention_pallas import (
        vit_attention_qkv_pallas_fused_bwd,
        vit_attention_qkv_reference,
    )

    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * h * d)),
                      dtype=jnp.float32)
    out = vit_attention_qkv_pallas_fused_bwd(qkv, h, True)
    ref = vit_attention_qkv_reference(qkv, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    g_k = jax.grad(
        lambda t: jnp.sum(vit_attention_qkv_pallas_fused_bwd(t, h, True) ** 2)
    )(qkv)
    g_r = jax.grad(
        lambda t: jnp.sum(vit_attention_qkv_reference(t, h) ** 2)
    )(qkv)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                               atol=1e-4, rtol=1e-4)


def test_vit_attention_fused_bwd_vjp_cotangent(rng):
    """Direct VJP check with an arbitrary cotangent (not derived from a
    scalar loss) — the raw dqkv path the train step actually runs."""
    from dl_vqa_tpu.ops.vit_attention_pallas import (
        vit_attention_qkv_pallas_fused_bwd,
        vit_attention_qkv_reference,
    )

    b, s, h, d = 2, 196, 2, 64
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * h * d)),
                      dtype=jnp.float32)
    cot = jnp.asarray(rng.standard_normal((b, s, h * d)),
                      dtype=jnp.float32)
    _, vjp_k = jax.vjp(
        lambda t: vit_attention_qkv_pallas_fused_bwd(t, h, True), qkv
    )
    _, vjp_r = jax.vjp(
        lambda t: vit_attention_qkv_reference(t, h), qkv
    )
    np.testing.assert_allclose(np.asarray(vjp_k(cot)[0]),
                               np.asarray(vjp_r(cot)[0]),
                               atol=1e-4, rtol=1e-4)


def test_vit_attention_kernel_head_packing_is_not_mixed(rng):
    """Each head must attend independently: zeroing one head's qkv lanes
    must not change the other heads' outputs."""
    from dl_vqa_tpu.ops.vit_attention_pallas import vit_attention_qkv_pallas

    b, s, h, d = 2, 52, 2, 64
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * h * d)),
                      dtype=jnp.float32)
    out_full = np.asarray(vit_attention_qkv_pallas(qkv, h, True))
    dim = h * d
    killed = qkv
    for base in (0, dim, 2 * dim):  # zero head 0's q, k, v lanes
        killed = killed.at[:, :, base : base + d].set(0.0)
    out_killed = np.asarray(vit_attention_qkv_pallas(killed, h, True))
    np.testing.assert_array_equal(out_full[:, :, d:], out_killed[:, :, d:])
    assert not np.allclose(out_full[:, :, :d], out_killed[:, :, :d])


def test_lstm_pallas_save_mode_consistent(rng):
    """The AD forward (save_states=True) must emit the same finals as the
    eval kernel, and gradients must match XLA at an odd batch size where
    the batch tile falls back to the whole batch."""
    from dl_vqa_tpu.ops.lstm_pallas import _lstm_scan_pallas_impl

    batch, seq, emb, hid = 12, 5, 8, 16
    x = jnp.asarray(rng.standard_normal((batch, seq, emb)), dtype=jnp.float32)
    lengths = jnp.asarray(rng.integers(1, seq + 1, batch), dtype=jnp.int32)
    params = {
        "w_ih": jnp.asarray(rng.standard_normal((emb, 4 * hid)) * 0.1,
                            dtype=jnp.float32),
        "w_hh": jnp.asarray(rng.standard_normal((hid, 4 * hid)) * 0.1,
                            dtype=jnp.float32),
        "b": jnp.asarray(rng.standard_normal(4 * hid) * 0.1,
                         dtype=jnp.float32),
    }
    h0, c0 = _lstm_scan_pallas_impl(x, lengths, params, True)
    (h1, c1), (gates_all, c_all, h_all) = _lstm_scan_pallas_impl(
        x, lengths, params, True, save_states=True
    )
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), rtol=1e-6)
    assert gates_all.shape == (seq, batch, 4 * hid)
    # The final saved carry equals the emitted final state.
    np.testing.assert_allclose(np.asarray(c_all[-1]), np.asarray(c1),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(h_all[-1]), np.asarray(h1),
                               rtol=1e-6)

    def loss_p(x, p):
        h, c = lstm_scan_pallas(x, lengths, p, True)
        return jnp.sum(jnp.tanh(c)) + jnp.sum(h ** 2)

    def loss_r(x, p):
        h, c = lstm_scan(x, lengths, p)
        return jnp.sum(jnp.tanh(c)) + jnp.sum(h ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1))(x, params)
    gr = jax.grad(loss_r, argnums=(0, 1))(x, params)
    for a, e in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=1e-5, rtol=1e-5)


# ---------------------------------------------------- f8 activation storage

def test_quantstore_close_to_reference(rng):
    """The f8e4m3 storage path (opt-in inference mode) tracks the exact
    path within f8 quantization error: ~2^-3 relative (3 mantissa bits)
    on each pooled activation."""
    from dl_vqa_tpu.ops.conv_fused import conv_relu_pool_quantstore

    x = jnp.asarray(rng.standard_normal((2, 20, 20, 3)), dtype=jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 8)) * 0.1,
                    dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal(8) * 0.1, dtype=jnp.float32)
    ref = np.asarray(conv_relu_pool_reference(x, w, b, 1))
    out = np.asarray(conv_relu_pool_quantstore(x, w, b, 1))
    np.testing.assert_allclose(out, ref, rtol=0.0625, atol=1e-3)


def test_quantstore_exact_on_representable_values(rng):
    """Integers up to 16 are exact in f8e4m3, so a block whose relu
    outputs are small integers must be BIT-identical through the
    quantized store (max commutes with the monotone cast)."""
    from dl_vqa_tpu.ops.conv_fused import conv_relu_pool_quantstore

    x = jnp.asarray(
        rng.integers(-4, 9, (2, 8, 8, 1)).astype(np.float32)
    )
    w = jnp.ones((1, 1, 1, 1), dtype=jnp.float32)
    b = jnp.zeros(1, dtype=jnp.float32)
    ref = np.asarray(conv_relu_pool_reference(x, w, b, 1))
    out = np.asarray(conv_relu_pool_quantstore(x, w, b, 1))
    np.testing.assert_array_equal(out, ref)


def test_quantstore_dispatch_and_gradients(rng):
    """store_dtype routes the dispatch to the quantized path; gradients
    are the straight-through estimator — EXACTLY the unquantized block's
    gradients (XLA has no f8 reduce_window AD rule, and STE is the
    standard treatment for a quantized forward)."""
    from dl_vqa_tpu.ops.conv_fused import conv_relu_pool_quantstore

    x = jnp.asarray(rng.standard_normal((2, 12, 12, 3)), dtype=jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 4)) * 0.1,
                    dtype=jnp.float32)
    b = jnp.zeros(4, dtype=jnp.float32)
    out = conv_relu_pool(x, w, b, store_dtype=jnp.float8_e4m3fn)
    direct = conv_relu_pool_quantstore(x, w, b, 1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(direct))

    cot = jnp.asarray(rng.standard_normal(out.shape), dtype=jnp.float32)
    gq = jax.grad(
        lambda x_, w_, b_: (
            conv_relu_pool(x_, w_, b_, store_dtype=jnp.float8_e4m3fn) * cot
        ).sum(),
        argnums=(0, 1, 2),
    )(x, w, b)
    gr = jax.grad(
        lambda x_, w_, b_: (
            conv_relu_pool_reference(x_, w_, b_, 1) * cot
        ).sum(),
        argnums=(0, 1, 2),
    )(x, w, b)
    for a, e in zip(gq, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=1e-5, rtol=1e-5)


def test_model_store_dtype_config(rng):
    """image.store_dtype='f8e4m3' runs end-to-end and stays close to the
    parity path; an unknown value fails loudly."""
    import dataclasses

    from dl_vqa_tpu.models import vqa
    from dl_vqa_tpu.models.configs import (
        AttentionConfig, ClassifierConfig, ImageConfig, ModelConfig,
        TextConfig,
    )

    cfg = ModelConfig(
        text=TextConfig(question_features=16, embedding_features=8,
                        dropout=0.0),
        image=ImageConfig(num_channels=(3, 8, 16), dropout=0.0),
        attention=AttentionConfig(hidden_dim=16, glimpses=2, dropout=0.0),
        classifier=ClassifierConfig(hidden_dim=16, dropout=0.0),
        max_answers=32,
        image_size=32,
        num_tokens=64,
    )
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    images = jnp.asarray(rng.standard_normal((2, 32, 32, 3)),
                         dtype=jnp.float32)
    questions = jnp.asarray(rng.integers(1, 64, (2, 6)), dtype=jnp.int32)
    lengths = jnp.asarray([6, 3], dtype=jnp.int32)

    ref = vqa.apply(params, cfg, images, questions, lengths, train=False)
    cfg_f8 = dataclasses.replace(
        cfg, image=dataclasses.replace(cfg.image, store_dtype="f8e4m3")
    )
    out = vqa.apply(params, cfg_f8, images, questions, lengths, train=False)
    assert np.all(np.isfinite(np.asarray(out)))
    # Logits drift but stay in the same regime (quantized activations).
    assert float(jnp.abs(out - ref).max()) < 1.0

    cfg_bad = dataclasses.replace(
        cfg, image=dataclasses.replace(cfg.image, store_dtype="int4")
    )
    with pytest.raises(ValueError, match="store_dtype"):
        vqa.apply(params, cfg_bad, images, questions, lengths, train=False)


@pytest.mark.parametrize("h,w_", [(20, 20), (21, 23)])
def test_phases_pool_backward_matches_scatter(h, w_, rng, monkeypatch):
    """POOL_BACKWARD='phases' (4-phase dz-free routing) must reproduce
    the scatter backward's gradients, including first-max TIE routing —
    stressed with integer-valued inputs so windows contain exact
    positive ties."""
    from dl_vqa_tpu.ops import conv_fused
    from dl_vqa_tpu.ops.conv_fused import conv_relu_pool_fastgrad

    # Integer-valued tensors: conv outputs collide exactly -> real ties.
    x = jnp.asarray(rng.integers(-2, 3, (3, h, w_, 5)), dtype=jnp.float32)
    w = jnp.asarray(rng.integers(-1, 2, (3, 3, 5, 8)), dtype=jnp.float32)
    b = jnp.asarray(rng.integers(-1, 2, (8,)), dtype=jnp.float32)
    out = conv_relu_pool_fastgrad(x, w, b, 1)
    cot = jnp.asarray(rng.standard_normal(out.shape), dtype=jnp.float32)

    def grads():
        return jax.grad(
            lambda x_, w_, b_: (
                conv_relu_pool_fastgrad(x_, w_, b_, 1) * cot
            ).sum(),
            argnums=(0, 1, 2),
        )(x, w, b)

    monkeypatch.setattr(conv_fused, "POOL_BACKWARD", "scatter")
    g_scatter = grads()
    monkeypatch.setattr(conv_fused, "POOL_BACKWARD", "phases")
    g_phases = grads()

    # Misrouted ties would differ at O(cotangent); only summation-order
    # rounding is allowed (4 phase convs vs 1, f32 accumulation).
    for a, e, name in zip(g_phases, g_scatter, "x w b".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=1e-5, atol=1e-5,
            err_msg=f"d{name} differs beyond rounding",
        )

    # Forward is shared (phases only restructure the backward).
    np.testing.assert_array_equal(np.asarray(out), np.asarray(
        conv_relu_pool_fastgrad(x, w, b, 1)))
