"""Ring attention (ops/ring_attention.py) + the 'seq' mesh axis — new
sequence-parallel capability (SURVEY.md §5: absent in the reference)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from dl_vqa_tpu.models import ModelConfig, vqa
from dl_vqa_tpu.models.configs import (
    AttentionConfig,
    ClassifierConfig,
    ImageConfig,
    TextConfig,
)
from dl_vqa_tpu.ops.ring_attention import ring_attention_qkv
from dl_vqa_tpu.parallel import (
    SequenceContext,
    batch_sharding,
    make_mesh,
)
from dl_vqa_tpu.train.state import create_train_state
from dl_vqa_tpu.train.steps import make_eval_step, make_optimizer, make_train_step

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def _xla_attention(qkv, num_heads):
    """Reference full attention on the packed qkv (f32)."""
    batch, seq, dim3 = qkv.shape
    dim = dim3 // 3
    head = dim // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(batch, seq, num_heads, head).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (head ** 0.5)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
    return out.transpose(0, 2, 1, 3).reshape(batch, seq, dim)


def _qkv(batch=4, seq=16, dim=24, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.standard_normal((batch, seq, 3 * dim)), jnp.float32
    )


@pytest.mark.parametrize("n_seq", [2, 4])
def test_ring_matches_full_attention(n_seq):
    qkv = _qkv()
    mesh = make_mesh(data=2, model=1, seq=n_seq)
    out = ring_attention_qkv(qkv, num_heads=2, mesh=mesh)
    ref = _xla_attention(qkv, num_heads=2)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_ring_gradients_match_full_attention():
    qkv = _qkv(batch=2, seq=8, dim=8, seed=1)
    mesh = make_mesh(data=2, model=1, seq=4)
    cot = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 8, 8)), jnp.float32
    )

    def loss_ring(x):
        return jnp.sum(ring_attention_qkv(x, 2, mesh) * cot)

    def loss_ref(x):
        return jnp.sum(_xla_attention(x, 2) * cot)

    g_ring = jax.grad(loss_ring)(qkv)
    g_ref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(
        np.asarray(g_ring), np.asarray(g_ref), atol=1e-5, rtol=1e-5
    )


def test_ring_with_sharded_inputs():
    """Inputs already sharded P('data', 'seq', None) go straight through
    (no resharding surprises) and still match the full attention."""
    qkv = _qkv(seed=3)
    mesh = make_mesh(data=2, model=2, seq=2)
    sharded = jax.device_put(
        qkv, NamedSharding(mesh, P("data", "seq", None))
    )
    out = jax.jit(
        lambda x: ring_attention_qkv(x, 2, mesh)
    )(sharded)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_xla_attention(qkv, 2)),
        atol=1e-5, rtol=1e-5,
    )


# ------------------------------------------------------------ model level


def _vit_cfg():
    return ModelConfig(
        text=TextConfig(question_features=16, embedding_features=8,
                        dropout=0.0),
        image=ImageConfig(encoder="vit", num_channels=(3, 16), patch_size=8,
                          num_layers=2, num_heads=2, dropout=0.0),
        attention=AttentionConfig(hidden_dim=16, glimpses=2, dropout=0.0),
        classifier=ClassifierConfig(hidden_dim=16, dropout=0.0),
        max_answers=16,
        image_size=32,   # 4x4 = 16 patch tokens -> shards over seq=2/4
        num_tokens=32,
    )


def _batch(cfg, batch=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "images": rng.standard_normal(
            (batch, cfg.image_size, cfg.image_size, 3)
        ).astype(np.float32),
        "questions": rng.integers(0, cfg.num_tokens, (batch, 6)).astype(
            np.int32
        ),
        "lengths": rng.integers(1, 7, (batch,)).astype(np.int32),
        "answer_indices": rng.integers(1, 17, (batch, 2)).astype(np.int32),
        "answer_values": rng.integers(1, 10, (batch, 2)).astype(np.int32),
        "mask": np.ones((batch,), dtype=bool),
    }


def test_sequence_parallel_eval_matches_single_device():
    cfg = _vit_cfg()
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, seed=5)

    eval_ref = make_eval_step(cfg, compute_dtype=jnp.float32)
    l_ref, s_ref = eval_ref(params, jax.device_put(batch))

    mesh = make_mesh(data=2, model=2, seq=2)
    ctx = SequenceContext(mesh)
    eval_sp = make_eval_step(cfg, compute_dtype=jnp.float32, seq_ctx=ctx)
    sharded = {k: jax.device_put(v, batch_sharding(mesh))
               for k, v in batch.items()}
    l_sp, s_sp = eval_sp(params, sharded)

    assert float(l_ref) == pytest.approx(float(l_sp), rel=1e-5)
    assert float(s_ref) == pytest.approx(float(s_sp), rel=1e-5)


def test_sequence_parallel_train_step_matches_single_device():
    cfg = _vit_cfg()
    params = jax.tree_util.tree_map(
        np.asarray, vqa.init(jax.random.PRNGKey(0), cfg)
    )
    tx = make_optimizer(1e-3)
    batch = _batch(cfg, seed=6)
    rng = jax.random.PRNGKey(11)

    state1 = create_train_state(params, tx)
    step1 = make_train_step(cfg, tx, compute_dtype=jnp.float32)
    state1, m1 = step1(state1, jax.device_put(batch), rng)

    mesh = make_mesh(data=2, model=1, seq=4)
    ctx = SequenceContext(mesh)
    state8 = create_train_state(params, tx)
    step8 = make_train_step(cfg, tx, compute_dtype=jnp.float32, seq_ctx=ctx)
    sharded = {k: jax.device_put(v, batch_sharding(mesh))
               for k, v in batch.items()}
    state8, m8 = step8(state8, sharded, rng)

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)
    # The ring accumulates the softmax online (blockwise renormalization)
    # — a different but equally valid f32 reduction order than the
    # single-pass reference, and Adam's rsqrt amplifies the last-ulp
    # differences; hence the slightly wider tolerance than the dp test.
    for a, b in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(state8.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4
        )


def test_seq_axis_in_mesh():
    mesh = make_mesh(data=2, model=2, seq=2)
    assert mesh.shape == {"data": 2, "seq": 2, "model": 2}


def test_seq_rejects_cnn_and_pipeline():
    cnn_cfg = ModelConfig(
        text=TextConfig(question_features=16, embedding_features=8,
                        dropout=0.0),
        image=ImageConfig(num_channels=(3, 4, 8), dropout=0.0),
        attention=AttentionConfig(hidden_dim=16, glimpses=2, dropout=0.0),
        classifier=ClassifierConfig(hidden_dim=16, dropout=0.0),
        max_answers=16, image_size=32, num_tokens=32,
    )
    mesh = make_mesh(data=2, model=1, seq=2)
    ctx = SequenceContext(mesh)
    batch = _batch(cnn_cfg, batch=4)
    params = vqa.init(jax.random.PRNGKey(0), cnn_cfg)
    with pytest.raises(ValueError, match="token dimension"):
        vqa.apply(params, cnn_cfg, batch["images"], batch["questions"],
                  batch["lengths"], compute_dtype=jnp.float32, seq_ctx=ctx)

    from dl_vqa_tpu.parallel.pipeline import PipelineContext

    vit_cfg = _vit_cfg()
    params_v = vqa.init(jax.random.PRNGKey(0), vit_cfg)
    pmesh = make_mesh(data=2, model=1, stage=2)
    with pytest.raises(NotImplementedError, match="seq"):
        vqa.apply(params_v, vit_cfg, batch["images"], batch["questions"],
                  batch["lengths"], compute_dtype=jnp.float32,
                  seq_ctx=SequenceContext(pmesh, seq_axis="seq"),
                  pipeline_ctx=PipelineContext(pmesh, num_microbatches=2))


def test_seq_rejects_non_divisible_tokens():
    cfg = _vit_cfg()  # 16 tokens
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    # 16 tokens do not shard 3 ways — but mesh sizes are powers of two
    # here; use a 4x4 grid over seq=8? 16 % 8 == 0, so craft 2x... use
    # image_size 24 -> 3x3 = 9 tokens over seq=2.
    import dataclasses

    cfg9 = dataclasses.replace(cfg, image_size=24)
    params9 = vqa.init(jax.random.PRNGKey(0), cfg9)
    mesh = make_mesh(data=2, model=1, seq=2)
    batch = _batch(cfg9, batch=4)
    with pytest.raises(ValueError, match="patch tokens"):
        vqa.apply(params9, cfg9, batch["images"], batch["questions"],
                  batch["lengths"], compute_dtype=jnp.float32,
                  seq_ctx=SequenceContext(mesh))
    del params
