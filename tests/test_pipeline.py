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
    out = pipeline_apply(fn, stack_layers(params["layers"]), x, mesh)
    ref = _sequential(params["layers"], x, fn)
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
