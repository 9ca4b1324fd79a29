"""Multi-device SPMD tests on the 8-virtual-CPU-device mesh
(SURVEY.md §4 distributed tier)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dl_vqa_tpu.models import ModelConfig, vqa
from dl_vqa_tpu.models.configs import (
    AttentionConfig,
    ClassifierConfig,
    ImageConfig,
    TextConfig,
)
from dl_vqa_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
)
from dl_vqa_tpu.train.state import create_train_state
from dl_vqa_tpu.train.steps import make_eval_step, make_optimizer, make_train_step

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def _cfg():
    return ModelConfig(
        text=TextConfig(question_features=16, embedding_features=8,
                        dropout=0.0),
        image=ImageConfig(num_channels=(3, 4, 8), dropout=0.0),
        attention=AttentionConfig(hidden_dim=16, glimpses=2, dropout=0.0),
        classifier=ClassifierConfig(hidden_dim=16, dropout=0.0),
        max_answers=16,
        image_size=32,
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


def test_mesh_shapes():
    mesh = make_mesh(data=-1, model=1)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=16, model=2)


def test_data_parallel_step_matches_single_device():
    """The dp-sharded train step must produce the same numbers as the
    single-device step (XLA all-reduce == torch-free NCCL equivalent)."""
    cfg = _cfg()
    # Host-side param copies: the train step donates its input state, and
    # device_put may alias an existing device buffer into the new layout.
    params = jax.tree_util.tree_map(
        np.asarray, vqa.init(jax.random.PRNGKey(0), cfg)
    )
    tx = make_optimizer(1e-3)
    batch = _batch(cfg)
    rng = jax.random.PRNGKey(7)

    mesh = make_mesh(data=8, model=1)
    bsh = batch_sharding(mesh)
    state2 = jax.device_put(create_train_state(params, tx), replicated(mesh))

    # single device
    state1 = create_train_state(params, tx)
    step1 = make_train_step(cfg, tx, compute_dtype=jnp.float32)
    state1, m1 = step1(state1, jax.device_put(batch), rng)
    step8 = make_train_step(cfg, tx, compute_dtype=jnp.float32)
    sharded = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    state2, m8 = step8(state2, sharded, rng)

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)
    assert float(m1["score"]) == pytest.approx(float(m8["score"]), rel=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(state2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        )


def test_tensor_parallel_eval_matches():
    """dp x tp (4x2) mesh with megatron-split classifier: same logits-level
    results as unsharded eval."""
    cfg = _cfg()
    params = vqa.init(jax.random.PRNGKey(1), cfg)
    batch = _batch(cfg, seed=2)

    eval_step = make_eval_step(cfg, compute_dtype=jnp.float32)
    l_ref, s_ref = eval_step(params, jax.device_put(batch))

    mesh = make_mesh(data=4, model=2)
    psh = param_shardings(params, mesh)
    params_tp = jax.device_put(params, psh)
    # check something actually got sharded over 'model'
    lin1_spec = psh["classifier"]["lin1"]["w"].spec
    assert lin1_spec == P(None, "model")

    bsh = batch_sharding(mesh)
    sharded = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    l_tp, s_tp = eval_step(params_tp, sharded)

    assert float(l_ref) == pytest.approx(float(l_tp), rel=1e-5)
    assert float(s_ref) == pytest.approx(float(s_tp), rel=1e-5)


def test_prefetch_to_device_with_sharding():
    from dl_vqa_tpu.data.pipeline import prefetch_to_device

    mesh = make_mesh(data=8, model=1)
    bsh = batch_sharding(mesh)
    batches = [
        {"x": np.full((16, 4), i, dtype=np.float32)} for i in range(5)
    ]
    seen = list(prefetch_to_device(iter(batches), bsh, depth=2))
    assert len(seen) == 5
    assert seen[3]["x"].sharding == bsh
    np.testing.assert_array_equal(np.asarray(seen[3]["x"]), batches[3]["x"])


def test_prefetch_propagates_producer_errors():
    from dl_vqa_tpu.data.pipeline import prefetch_to_device

    def gen():
        yield {"x": np.zeros(4)}
        raise RuntimeError("boom")

    it = prefetch_to_device(gen(), None, depth=2)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_prefetch_producer_exits_when_consumer_abandons():
    """Dropping the generator mid-epoch (e.g. the train step raised) must
    release the producer thread and its staged device batches instead of
    leaving it blocked forever on the bounded queue — multirun sweeps run
    many trials per process and would otherwise accumulate the leaks."""
    import time

    from dl_vqa_tpu.data.pipeline import prefetch_to_device

    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield {"x": np.full((4,), i, dtype=np.float32)}

    it = prefetch_to_device(gen(), None, depth=2)
    next(it)
    it.close()  # consumer abandons mid-iteration
    deadline = time.time() + 5.0
    count = len(produced)
    stable_since = time.time()
    while time.time() < deadline:
        time.sleep(0.1)
        if len(produced) != count:
            count = len(produced)
            stable_since = time.time()
        elif time.time() - stable_since > 1.0:
            break  # producer stopped pulling from the iterator
    assert time.time() < deadline, "producer still draining the iterator"
    assert len(produced) < 1000


def test_breakdown_eval_under_data_parallel_mesh():
    """Per-type segment sums must survive batch sharding (GSPMD handles
    the segment_sum collective)."""
    from dl_vqa_tpu.train.steps import make_eval_step

    cfg = _cfg()
    params = vqa.init(jax.random.PRNGKey(2), cfg)
    batch = _batch(cfg, batch=16, seed=5)
    batch["answer_types"] = np.array([0, 1, 2, 0] * 4, dtype=np.int32)

    eval_step = make_eval_step(cfg, compute_dtype=jnp.float32,
                               with_breakdown=True)
    l_ref, s_ref, sums_ref, counts_ref = eval_step(
        params, jax.device_put(batch)
    )

    mesh = make_mesh(data=8, model=1)
    bsh = batch_sharding(mesh)
    sharded = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    l_dp, s_dp, sums_dp, counts_dp = eval_step(params, sharded)

    np.testing.assert_allclose(np.asarray(sums_dp), np.asarray(sums_ref),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(counts_dp),
                                  np.asarray(counts_ref))
    assert float(l_dp) == pytest.approx(float(l_ref), rel=1e-5)


def test_tensor_parallel_vit_transformer_eval_matches():
    """ViT + transformer-text model under dp x tp: megatron-split qkv/mlp
    layers must reproduce the unsharded logits-level results."""
    import dataclasses

    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg,
        text=dataclasses.replace(cfg.text, encoder="transformer",
                                 num_heads=2, num_layers=1),
        image=dataclasses.replace(cfg.image, encoder="vit", patch_size=8,
                                  num_layers=1, num_heads=2,
                                  num_channels=(3, 16)),
    )
    params = vqa.init(jax.random.PRNGKey(3), cfg)
    batch = _batch(cfg, seed=4)

    eval_step = make_eval_step(cfg, compute_dtype=jnp.float32)
    l_ref, s_ref = eval_step(params, jax.device_put(batch))

    mesh = make_mesh(data=4, model=2)
    psh = param_shardings(params, mesh)
    # the megatron rules must actually bite on the vit/transformer layers
    # (the ViT stack is stored stacked: leading [L] layer axis, sharded
    # over 'stage' only when the mesh has that axis)
    assert psh["image"]["layers"]["qkv"]["w"].spec == P(None, None, "model")
    assert psh["image"]["layers"]["out"]["w"].spec == P(None, "model", None)
    assert psh["text"]["layers"][0]["mlp_in"]["w"].spec == P(None, "model")

    params_tp = jax.device_put(params, psh)
    bsh = batch_sharding(mesh)
    sharded = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    l_tp, s_tp = eval_step(params_tp, sharded)
    assert float(l_ref) == pytest.approx(float(l_tp), rel=1e-5)
    assert float(s_ref) == pytest.approx(float(s_tp), rel=1e-5)


def test_reference_scale_classifier_actually_sharded_on_model_axis():
    """At reference scale (3000 answers, 1024-hidden classifier) on a
    model=2 mesh the megatron split must actually land: lin1 column-sharded,
    lin2 row-sharded, embedding vocab-sharded — not silently replicated."""
    import dataclasses

    cfg = dataclasses.replace(
        _cfg(),
        classifier=ClassifierConfig(hidden_dim=1024, dropout=0.0),
        max_answers=3000,
        num_tokens=15_194,  # even: divides the model axis
    )
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(data=4, model=2)
    shardings = param_shardings(params, mesh)
    assert shardings["classifier"]["lin1"]["w"].spec == P(None, "model")
    assert shardings["classifier"]["lin2"]["w"].spec == P("model", None)
    assert shardings["text"]["embedding"].spec == P("model", None)


def test_non_divisible_tensor_parallel_dim_warns(caplog):
    """A big leaf quietly losing its 'model' split must warn loudly
    (VERDICT r1 #6); small leaves may replicate silently."""
    import dataclasses
    import logging as pylogging

    cfg = dataclasses.replace(
        _cfg(),
        classifier=ClassifierConfig(hidden_dim=1024, dropout=0.0),
        max_answers=3000,
        num_tokens=15_193,    # the actual reference vocab size — odd, so the
    )                         # embedding can't split its rows on model=2
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(data=4, model=2)
    with caplog.at_level(pylogging.WARNING, logger="dl_vqa_tpu.parallel.mesh"):
        shardings = param_shardings(params, mesh)
    assert shardings["text"]["embedding"].spec == P()
    warned = [r for r in caplog.records if "fallback to replication" in r.message]
    assert warned, "expected a tensor-parallel fallback warning"
    assert "text/embedding" in warned[0].getMessage()
    # The small cfg from _cfg() (16-answer classifier) must NOT warn.
    caplog.clear()
    small = vqa.init(jax.random.PRNGKey(0), _cfg())
    with caplog.at_level(pylogging.WARNING, logger="dl_vqa_tpu.parallel.mesh"):
        param_shardings(small, make_mesh(data=4, model=2))
    assert not [r for r in caplog.records if "fallback" in r.message]


def test_device_cache_sharded_layout():
    """'sharded' table layout (tpu.device_image_cache_layout): per-device
    table bytes = total / data-mesh size (capacity scales WITH the mesh
    instead of replicating against it), losses bit-identical to the
    replicated layout, and the 'auto' budget charges per-device bytes."""
    from dl_vqa_tpu.data.device_cache import plan_image_tables

    cfg = _cfg()
    mesh = make_mesh(data=8, model=1)
    n_rows = 21  # not divisible by 8: exercises the pad path (-> 24)
    rng_np = np.random.default_rng(3)
    feats = rng_np.standard_normal(
        (n_rows, cfg.image_size, cfg.image_size, 3)
    ).astype(np.float16)

    class _DS:
        has_image_rows = True
        image_path = "/tmp/fake_store.h5"
        image_store_nbytes = feats.nbytes

        def features_nhwc_all(self, dtype=np.float16):
            return feats.copy()

    def conf(layout, mode="on", budget_gb=0):
        return {"tpu": {"device_image_cache": mode,
                        "device_image_cache_layout": layout,
                        "device_image_cache_budget_gb": budget_gb}}

    table_r = plan_image_tables(conf("replicated"), {"d": _DS()},
                                mesh=mesh)["d"]
    table_s = plan_image_tables(conf("sharded"), {"d": _DS()},
                                mesh=mesh)["d"]
    assert table_s.shape[0] == 24  # padded up to a shardable row count
    assert {s.data.nbytes for s in table_s.addressable_shards} == {
        table_s.nbytes // 8
    }
    assert {s.data.shape[0] for s in table_r.addressable_shards} == {n_rows}

    # Same eval-step numbers through both layouts (XLA lowers the gather
    # over the dim-0-sharded table to masked local gather + all-reduce).
    params = jax.device_put(
        vqa.init(jax.random.PRNGKey(0), cfg), replicated(mesh)
    )
    step = make_eval_step(cfg, jnp.float32)
    batch = _batch(cfg)
    del batch["images"]
    batch["image_rows"] = rng_np.integers(0, n_rows, (16,)).astype(np.int32)
    bsh = batch_sharding(mesh)
    sharded_batch = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    out_r = step(params, dict(sharded_batch, image_table=table_r))
    out_s = step(params, dict(sharded_batch, image_table=table_s))
    assert float(out_r[0]) == float(out_s[0])
    assert float(out_r[1]) == float(out_s[1])

    # 'auto' budget is per-DEVICE: a budget that fits total/8 but not the
    # full store declines replicated and admits sharded.
    per_dev_fits = (feats.nbytes // 8 + 512) / 2**30
    assert plan_image_tables(conf("replicated", "auto", per_dev_fits),
                             {"d": _DS()}, mesh=mesh)["d"] is None
    assert plan_image_tables(conf("sharded", "auto", per_dev_fits),
                             {"d": _DS()}, mesh=mesh)["d"] is not None

    # A negative budget is a config error, not a silent always-decline.
    with pytest.raises(ValueError, match="device_image_cache_budget_gb"):
        plan_image_tables(conf("replicated", "auto", -4), {"d": _DS()},
                          mesh=mesh)


def test_int8_eval_under_dp_tp_mesh_matches():
    """The int8 W8A8 serving stem composes with dp x tp sharding: the
    in-graph weight quantization and static-scale requant are pure
    elementwise/conv ops, so the sharded eval reproduces the unsharded
    int8 results (exact: same quantized integer arithmetic)."""
    import dataclasses

    from dl_vqa_tpu.ops.conv_int8 import with_calibrated_scales

    cfg = _cfg()
    params = vqa.init(jax.random.PRNGKey(1), cfg)
    batch = _batch(cfg, seed=3)
    cfg_int8 = with_calibrated_scales(
        cfg, params, jnp.asarray(batch["images"][:4]), dtype=jnp.float32
    )
    assert cfg_int8.image.store_dtype == "int8"

    eval_step = make_eval_step(cfg_int8, compute_dtype=jnp.float32)
    l_ref, s_ref = eval_step(params, jax.device_put(batch))

    mesh = make_mesh(data=4, model=2)
    params_tp = jax.device_put(params, param_shardings(params, mesh))
    bsh = batch_sharding(mesh)
    sharded = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    l_tp, s_tp = eval_step(params_tp, sharded)

    assert float(l_ref) == pytest.approx(float(l_tp), rel=1e-5)
    assert float(s_ref) == pytest.approx(float(s_tp), rel=1e-5)
