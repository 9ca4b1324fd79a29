"""Pipeline-parallelism tests on the virtual 8-device CPU mesh
(SURVEY.md §4 tier 4: multi-device via forced host platform devices).

The executor (dl_vqa_tpu/parallel/pipeline.py) must be NUMERICALLY
equivalent — forward and gradients — to running the layer stack
sequentially on every microbatch, for any (data, stage) mesh shape and
microbatch count.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dl_vqa_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    pipeline_apply,
    stack_layers,
)


def _mlp_layers(rng, num_layers, dim):
    return [
        {
            "w": jnp.asarray(
                rng.standard_normal((dim, dim)) * 0.3, dtype=jnp.float32
            ),
            "b": jnp.asarray(
                rng.standard_normal(dim) * 0.1, dtype=jnp.float32
            ),
        }
        for _ in range(num_layers)
    ]


def _mlp_fn(layer, x):
    return jnp.tanh(x @ layer["w"] + layer["b"])


def _sequential(layers, x_mb, fn):
    out = []
    for m in range(x_mb.shape[0]):
        x = x_mb[m]
        for layer in layers:
            x = fn(layer, x)
        out.append(x)
    return jnp.stack(out)


@pytest.mark.parametrize("data,stage,micro", [
    (1, 4, 4),
    (2, 2, 3),   # microbatches not a multiple of stages
    (1, 2, 1),   # single microbatch (pure fill/drain)
    (4, 2, 8),
    (1, 8, 2),   # more stages than microbatches
])
def test_pipeline_matches_sequential(data, stage, micro, rng):
    num_layers, dim, mb = 8, 16, 6
    layers = _mlp_layers(rng, num_layers, dim)
    x = jnp.asarray(
        rng.standard_normal((micro, mb * data, dim)), dtype=jnp.float32
    )
    mesh = make_pipeline_mesh(data=data, stage=stage)
    out = pipeline_apply(_mlp_fn, stack_layers(layers), x, mesh)
    ref = _sequential(layers, x, _mlp_fn)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_gradients_match(rng):
    num_layers, dim, micro, mb = 4, 8, 3, 4
    layers = _mlp_layers(rng, num_layers, dim)
    stacked = stack_layers(layers)
    x = jnp.asarray(
        rng.standard_normal((micro, mb, dim)), dtype=jnp.float32
    )
    mesh = make_pipeline_mesh(data=1, stage=4)
    cot = jnp.asarray(rng.standard_normal(x.shape), dtype=jnp.float32)

    def loss_pipe(stacked_, x_):
        return (pipeline_apply(_mlp_fn, stacked_, x_, mesh) * cot).sum()

    def loss_seq(stacked_, x_):
        layers_ = [
            jax.tree_util.tree_map(lambda t: t[i], stacked_)
            for i in range(num_layers)
        ]
        return (_sequential(layers_, x_, _mlp_fn) * cot).sum()

    gp = jax.grad(loss_pipe, argnums=(0, 1))(stacked, x)
    gs = jax.grad(loss_seq, argnums=(0, 1))(stacked, x)
    for a, e in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=1e-4, rtol=1e-4)


def test_pipeline_vit_blocks(rng):
    """The real ViT block (models/vit.py) through the pipeline equals the
    sequential stack — the executor and the model share one block fn."""
    from dl_vqa_tpu.models.vit import apply_vit_block, init_vit_image

    num_layers, dim, heads = 4, 32, 4
    params = init_vit_image(
        jax.random.PRNGKey(0), image_size=32, patch_size=8,
        model_dim=dim, num_layers=num_layers,
    )
    micro, mb, seq = 2, 3, 16
    x = jnp.asarray(
        rng.standard_normal((micro, mb, seq, dim)), dtype=jnp.float32
    )
    fn = functools.partial(
        lambda layer, t: apply_vit_block(layer, t, heads)
    )
    mesh = make_pipeline_mesh(data=1, stage=2)
    # init_vit_image stores the block stack already stacked ([L, ...]).
    stacked = params["layers"]
    layer_list = [
        jax.tree_util.tree_map(lambda t: t[i], stacked)
        for i in range(num_layers)
    ]
    out = pipeline_apply(fn, stacked, x, mesh)
    ref = _sequential(layer_list, x, fn)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_jit_under_mesh(rng):
    """The executor composes with jit (one compiled program)."""
    layers = _mlp_layers(rng, 4, 8)
    stacked = stack_layers(layers)
    mesh = make_pipeline_mesh(data=2, stage=2)
    x = jnp.asarray(rng.standard_normal((3, 4, 8)), dtype=jnp.float32)

    @jax.jit
    def run(stacked_, x_):
        return pipeline_apply(_mlp_fn, stacked_, x_, mesh)

    np.testing.assert_allclose(
        np.asarray(run(stacked, x)),
        np.asarray(_sequential(layers, x, _mlp_fn)),
        atol=1e-5, rtol=1e-5,
    )


def test_pipeline_errors(rng):
    layers = _mlp_layers(rng, 4, 8)
    mesh = make_pipeline_mesh(data=1, stage=3)
    x = jnp.asarray(rng.standard_normal((2, 2, 8)), dtype=jnp.float32)
    with pytest.raises(ValueError, match="layers do not split"):
        pipeline_apply(_mlp_fn, stack_layers(layers), x, mesh)
    with pytest.raises(ValueError, match="needs"):
        make_pipeline_mesh(data=4, stage=4)


def _vit_cfg(dropout=0.0):
    from dl_vqa_tpu.models.configs import (
        AttentionConfig, ClassifierConfig, ImageConfig, ModelConfig,
        TextConfig,
    )

    return ModelConfig(
        text=TextConfig(question_features=16, embedding_features=8,
                        dropout=dropout),
        image=ImageConfig(encoder="vit", num_channels=(3, 32), patch_size=8,
                          num_layers=4, num_heads=2, dropout=dropout),
        attention=AttentionConfig(hidden_dim=16, glimpses=2,
                                  dropout=dropout),
        classifier=ClassifierConfig(hidden_dim=16, dropout=dropout),
        max_answers=16,
        image_size=32,
        num_tokens=40,
    )


def _vit_batch(rng, batch=8):
    import jax.numpy as jnp

    return {
        "images": jnp.asarray(
            rng.standard_normal((batch, 32, 32, 3)), dtype=jnp.float32
        ),
        "questions": jnp.asarray(rng.integers(1, 40, (batch, 6)),
                                 dtype=jnp.int32),
        "lengths": jnp.asarray(rng.integers(1, 7, (batch,)),
                               dtype=jnp.int32),
        "answer_indices": jnp.asarray(
            rng.integers(1, 17, (batch, 2)), dtype=jnp.int32
        ),
        "answer_values": jnp.asarray(
            rng.integers(0, 11, (batch, 2)), dtype=jnp.int32
        ),
        "mask": jnp.ones((batch,), dtype=bool),
    }


def test_full_model_pipeline_matches_sequential(rng):
    """vqa.apply(pipeline_ctx=...) == the sequential model (dropout off):
    the tpu.mesh.stage surface end-to-end at the model level."""
    from dl_vqa_tpu.models import vqa
    from dl_vqa_tpu.parallel import make_mesh
    from dl_vqa_tpu.parallel.pipeline import PipelineContext

    cfg = _vit_cfg()
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    batch = _vit_batch(rng)
    mesh = make_mesh(data=2, model=1, stage=2)
    ctx = PipelineContext(mesh, num_microbatches=2)

    ref = vqa.apply(params, cfg, batch["images"], batch["questions"],
                    batch["lengths"], train=False)
    out = vqa.apply(params, cfg, batch["images"], batch["questions"],
                    batch["lengths"], train=False, pipeline_ctx=ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pipelined_train_step_matches_sequential():
    """One fused train step with tpu.mesh.stage=2 reproduces the
    unpipelined update (dropout off so the paths are comparable).

    Uses a LOCAL rng (not the session fixture): the assertion tolerance
    is data-dependent (Adam divides by sqrt(v)+eps, amplifying the f32
    reduction-order difference between the microbatched and sequential
    grads on near-zero entries), so the batch must not change when
    unrelated tests are added/reordered around the shared fixture."""
    from dl_vqa_tpu.models import vqa
    from dl_vqa_tpu.parallel import make_mesh
    from dl_vqa_tpu.parallel.pipeline import PipelineContext
    from dl_vqa_tpu.train.state import create_train_state
    from dl_vqa_tpu.train.steps import make_optimizer, make_train_step

    cfg = _vit_cfg()
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(1e-3)
    batch = _vit_batch(np.random.default_rng(1234))
    key = jax.random.PRNGKey(3)

    def fresh():
        return create_train_state(
            jax.tree_util.tree_map(jnp.array, params), tx
        )

    ref_state, ref_metrics = make_train_step(
        cfg, tx, compute_dtype=jnp.float32
    )(fresh(), batch, key)

    mesh = make_mesh(data=4, model=1, stage=2)
    ctx = PipelineContext(mesh, num_microbatches=2)
    pp_state, pp_metrics = make_train_step(
        cfg, tx, compute_dtype=jnp.float32, pipeline_ctx=ctx
    )(fresh(), batch, key)

    assert np.isclose(float(pp_metrics["loss"]),
                      float(ref_metrics["loss"]), rtol=1e-5)
    # Post-Adam params, one step: grad reduction order differs between
    # the 2-microbatch sum and the single batch, and near-zero second
    # moments amplify that (observed up to ~5e-5 abs on bias entries).
    for a, e in zip(jax.tree_util.tree_leaves(pp_state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=1e-4, rtol=5e-4)


def test_pipelined_train_step_with_dropout_runs(rng):
    """Dropout draws per-microbatch masks in the pipelined path (a
    different but equally valid stream); the step must stay finite."""
    from dl_vqa_tpu.models import vqa
    from dl_vqa_tpu.parallel import make_mesh
    from dl_vqa_tpu.parallel.pipeline import PipelineContext
    from dl_vqa_tpu.train.state import create_train_state
    from dl_vqa_tpu.train.steps import make_optimizer, make_train_step

    cfg = _vit_cfg(dropout=0.2)
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(1e-3)
    mesh = make_mesh(data=2, model=1, stage=2)
    ctx = PipelineContext(mesh, num_microbatches=2)
    state, metrics = make_train_step(
        cfg, tx, compute_dtype=jnp.float32, pipeline_ctx=ctx
    )(create_train_state(params, tx), _vit_batch(rng), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_pipeline_rejects_cnn_encoder(rng):
    from dl_vqa_tpu.models import vqa
    from dl_vqa_tpu.models.configs import ModelConfig
    from dl_vqa_tpu.parallel import make_mesh
    from dl_vqa_tpu.parallel.pipeline import PipelineContext

    cfg = ModelConfig(num_tokens=40, max_answers=16, image_size=32)
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    batch = _vit_batch(rng, batch=2)
    ctx = PipelineContext(make_mesh(data=2, model=1, stage=2),
                          num_microbatches=2)
    with pytest.raises(ValueError, match="encoder=vit"):
        vqa.apply(params, cfg, batch["images"], batch["questions"],
                  batch["lengths"], train=False, pipeline_ctx=ctx)


def test_pipeline_with_index_delivers_microbatch_number(rng):
    """with_index=True: each microbatch's fn calls see the microbatch
    NUMBER riding the ring (the basis for per-microbatch dropout keys)."""
    layers = _mlp_layers(rng, 4, 8)
    mesh = make_pipeline_mesh(data=1, stage=2)
    x = jnp.asarray(rng.standard_normal((3, 2, 8)), dtype=jnp.float32)

    def fn(layer, t, mb_index):
        return t * 0.0 + mb_index.astype(jnp.float32)

    out = pipeline_apply(fn, stack_layers(layers), x, mesh, with_index=True)
    for m in range(3):
        np.testing.assert_array_equal(np.asarray(out[m]),
                                      np.full((2, 8), float(m)))


def test_make_mesh_rejects_oversubscribed_stage():
    from dl_vqa_tpu.parallel import make_mesh

    with pytest.raises(ValueError, match="needs"):
        make_mesh(data=-1, model=1, stage=16)  # 8 CPU devices available


def test_pipeline_rejects_nondivisible_microbatch(rng):
    layers = _mlp_layers(rng, 4, 8)
    mesh = make_pipeline_mesh(data=4, stage=2)
    x = jnp.asarray(rng.standard_normal((2, 6, 8)), dtype=jnp.float32)
    with pytest.raises(ValueError, match="does not shard"):
        pipeline_apply(_mlp_fn, stack_layers(layers), x, mesh)
