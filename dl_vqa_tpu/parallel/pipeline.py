"""GPipe-style pipeline parallelism over a 'stage' mesh axis.

The reference is single-GPU (``/root/reference/main.py:23``); this module
is new scale-out capability built the TPU way: the repeated transformer
blocks (ViT image encoder, transformer question encoder) are partitioned
into contiguous stages over a mesh axis, and microbatches stream through
the stages inside a ``shard_map`` — activations move stage-to-stage with
``lax.ppermute`` over ICI, every stage computing each tick (the classic
GPipe schedule with fill/drain bubbles).

Design notes (TPU/XLA):

* The whole schedule is ONE ``lax.fori_loop`` of ``M + S - 1`` ticks —
  no data-dependent Python control flow, one compiled program.
* Stage-local layers are a stacked ``[L/S, ...]`` pytree consumed by a
  ``lax.scan`` — per-stage depth is a compile-time constant.
* ``shard_map`` keeps XLA's SPMD partitioner out of the schedule: the
  only cross-stage communication is the explicit ``ppermute`` ring, so
  activations ride ICI point-to-point exactly once per tick.
* Differentiable end-to-end (``ppermute``/``psum`` have exact
  transposes), so the same executor runs under ``jax.grad`` — verified
  against the sequential stack in tests/test_pipeline.py.

The model this pipelines is far below the scale where pp pays for real
(it exists for the mesh-completeness contract: dp x tp x pp compose);
the executor itself is written for the general case: any per-layer
``fn(layer_params, x) -> x`` with identically-structured layers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["stack_layers", "pipeline_apply", "make_pipeline_mesh",
           "PipelineContext"]


@dataclasses.dataclass(frozen=True)
class PipelineContext:
    """Runtime wiring for pipeline-parallel training/eval
    (``tpu.mesh.stage > 1``): the mesh carrying the stage axis plus the
    microbatch count. Passed through ``vqa.apply(pipeline_ctx=...)`` so
    the model stays a pure function of (params, config, batch)."""

    mesh: Mesh
    num_microbatches: int
    stage_axis: str = "stage"
    data_axis: str = "data"


def make_pipeline_mesh(
    data: int = 1,
    stage: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A pipeline mesh: delegates to :func:`parallel.mesh.make_mesh`
    (model=1) so tests exercise the same ('data', 'model', 'stage') mesh
    layout production builds — a separate 2-axis constructor here once
    let pipeline code be validated against a mesh shape main.py never
    makes."""
    from dl_vqa_tpu.parallel.mesh import make_mesh

    return make_mesh(data=data, model=1, stage=stage, devices=devices)


def stack_layers(layers: Sequence[Any]):
    """Stack a list of identically-structured per-layer pytrees into one
    pytree with a leading layer axis (the form both the pipeline and a
    plain ``lax.scan`` over layers consume)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def pipeline_apply(
    layer_fn: Callable[..., jnp.ndarray],
    stacked_layers: Any,
    x_microbatched: jnp.ndarray,
    mesh: Mesh,
    stage_axis: str = "stage",
    data_axis: Optional[str] = "data",
    with_index: bool = False,
) -> jnp.ndarray:
    """Run ``L`` stacked layers as a ``S``-stage pipeline over microbatches.

    Args:
      layer_fn: applies ONE layer: ``fn(layer_params, x) -> x`` (same
        shape in and out). Per-layer extras (e.g. a dropout rng) belong
        inside the stacked layer pytree. With ``with_index=True`` the
        signature is ``fn(layer_params, x, mb_index) -> x`` where
        ``mb_index`` is the (traced int32) microbatch number riding the
        ring alongside the activation — used e.g. to fold per-microbatch
        dropout keys so microbatches don't share masks.
      stacked_layers: pytree with leading layer axis ``L`` (from
        :func:`stack_layers`); ``L`` must divide evenly into the mesh's
        ``S = mesh.shape[stage_axis]`` stages.
      x_microbatched: ``[M, mb, ...]`` microbatched activations.
      mesh: mesh containing ``stage_axis`` (and optionally ``data_axis``,
        over which the microbatch BATCH dim is sharded).

    Returns ``[M, mb, ...]`` outputs — numerically the sequential stack
    applied to every microbatch (same op order per microbatch).
    """
    num_stages = mesh.shape[stage_axis]
    num_micro = x_microbatched.shape[0]
    layer_count = jax.tree_util.tree_leaves(stacked_layers)[0].shape[0]
    if layer_count % num_stages != 0:
        raise ValueError(
            f"{layer_count} layers do not split over {num_stages} stages"
        )
    if num_micro < 1:
        raise ValueError("need at least one microbatch")

    has_data = data_axis is not None and data_axis in mesh.axis_names
    if has_data and x_microbatched.shape[1] % mesh.shape[data_axis] != 0:
        raise ValueError(
            f"microbatch size {x_microbatched.shape[1]} does not shard "
            f"over the {mesh.shape[data_axis]}-way '{data_axis}' axis"
        )
    batch_spec = P(None, data_axis) if has_data else P(None)
    layer_spec = jax.tree_util.tree_map(
        lambda _: P(stage_axis), stacked_layers
    )

    def per_stage(local_layers, x_mb):
        stage = lax.axis_index(stage_axis)

        def run_local(x, mb_index):
            def body(carry, layer):
                if with_index:
                    return layer_fn(layer, carry, mb_index), None
                return layer_fn(layer, carry), None

            out, _ = lax.scan(body, x, local_layers)
            return out

        perm = [(i, (i + 1) % num_stages) for i in range(num_stages)]

        def tick(t, carry):
            x_in, idx_in, outputs = carry
            # Stage 0 feeds microbatch t (clamped in the drain phase —
            # those ticks' results never land anywhere).
            mb_t = jnp.clip(t, 0, num_micro - 1)
            feed = lax.dynamic_index_in_dim(x_mb, mb_t, keepdims=False)
            inp = jnp.where(stage == 0, feed, x_in)
            # The microbatch number rides the ring with its activation.
            idx = jnp.where(stage == 0,
                            jnp.asarray(mb_t, jnp.int32)[None], idx_in)
            out = run_local(inp, idx[0])
            # The last stage commits microbatch t-(S-1) once it is real.
            out_idx = jnp.clip(t - (num_stages - 1), 0, num_micro - 1)
            valid = jnp.logical_and(stage == num_stages - 1,
                                    t >= num_stages - 1)
            current = lax.dynamic_index_in_dim(
                outputs, out_idx, keepdims=False
            )
            outputs = lax.dynamic_update_index_in_dim(
                outputs, jnp.where(valid, out, current), out_idx, 0
            )
            x_next = lax.ppermute(out, stage_axis, perm)
            idx_next = lax.ppermute(idx, stage_axis, perm)
            return (x_next, idx_next, outputs)

        init = (jnp.zeros_like(x_mb[0]), jnp.zeros(1, jnp.int32),
                jnp.zeros_like(x_mb))
        _, _, outputs = lax.fori_loop(
            0, num_micro + num_stages - 1, tick, init
        )
        # Replicate the committed outputs from the last stage to all
        # stages (the out_spec below declares stage-replication).
        return lax.psum(
            jnp.where(stage == num_stages - 1, outputs,
                      jnp.zeros_like(outputs)),
            stage_axis,
        )

    return jax.shard_map(
        per_stage,
        mesh=mesh,
        in_specs=(layer_spec, batch_spec),
        out_specs=batch_spec,
        check_vma=False,
    )(stacked_layers, x_microbatched)
