"""Sequence parallelism context (``tpu.mesh.seq``).

The reference has no sequence parallelism (SURVEY.md §5: 'absent / not
applicable' — its questions are ~23 LSTM tokens). Here it is a
first-class mesh axis for the ViT token dimension: patch tokens shard
over ``'seq'``, token-local work (LN, MLP, projections) partitions for
free under GSPMD, and attention runs as a ``ppermute`` ring with online
softmax (:mod:`dl_vqa_tpu.ops.ring_attention`). See docs/SCALING.md.
"""

from __future__ import annotations

import dataclasses

from jax.sharding import Mesh

__all__ = ["SequenceContext"]


@dataclasses.dataclass(frozen=True)
class SequenceContext:
    """Runtime wiring for sequence-parallel attention: the mesh carrying
    the 'seq' axis. Passed through ``vqa.apply(seq_ctx=...)`` so the
    model stays a pure function of (params, config, batch)."""

    mesh: Mesh
    seq_axis: str = "seq"
    data_axis: str = "data"
