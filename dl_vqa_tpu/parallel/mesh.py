"""Device mesh construction and sharding rules.

The reference is single-GPU (``CUDA_VISIBLE_DEVICES="0"``,
``/root/reference/main.py:23``) with no distributed backend; scale-out here
is new capability, built the TPU way (SURVEY.md §2 'Parallelism
strategies'): a 2-D ``jax.sharding.Mesh`` with axes

* ``data``  — batch sharding (data parallelism; gradient all-reduce is
  inserted by the XLA SPMD partitioner and rides ICI);
* ``model`` — tensor parallelism for the wide layers (megatron-style
  column/row split of the classifier MLP, vocab-sharded embedding).

With ``model=1`` this degenerates to pure DP; with one device it is a
no-op. DCN/multi-slice is out of scope at this model size but the axis
names compose with a future outer mesh.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "param_shardings", "replicated",
           "state_shardings", "zero_spec"]


def make_mesh(
    data: int = -1,
    model: int = 1,
    stage: int = 1,
    expert: int = 1,
    seq: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data'[, 'seq'][, 'expert'], 'model'[, 'stage']) mesh.
    ``data=-1`` uses all devices left after the other axes. The 'stage'
    axis (pipeline parallelism, ``tpu.mesh.stage``), the 'expert' axis
    (MoE expert parallelism, ``tpu.mesh.expert``) and the 'seq' axis
    (ring-attention sequence parallelism, ``tpu.mesh.seq``) are only
    materialized when > 1 so existing two-axis meshes stay unchanged.
    'seq' and 'expert' sit next to 'data' in the device grid: their
    collectives (the ppermute ring, the MoE all-to-all) re-slice the
    data shards, so adjacency keeps them on near-neighbor ICI links."""
    devices = list(devices if devices is not None else jax.devices())
    model = max(model, 1)
    stage = max(stage, 1)
    expert = max(expert, 1)
    seq = max(seq, 1)
    if data == -1:
        data = len(devices) // (model * stage * expert * seq)
    n = data * model * stage * expert * seq
    if data < 1 or n > len(devices):
        raise ValueError(
            f"mesh {max(data, 0)}x{seq}x{expert}x{model}x{stage} "
            f"(data x seq x expert x model x stage) needs "
            f"{max(n, seq * expert * model * stage)} devices, "
            f"have {len(devices)}"
        )
    shape = [data]
    names = ["data"]
    if seq > 1:
        shape.append(seq)
        names.append("seq")
    if expert > 1:
        shape.append(expert)
        names.append("expert")
    shape.append(model)
    names.append("model")
    if stage > 1:
        shape.append(stage)
        names.append("stage")
    grid = np.asarray(devices[:n]).reshape(shape)
    return Mesh(grid, axis_names=tuple(names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def _divisible(leaf, spec: P, mesh: Mesh) -> bool:
    """device_put with an explicit sharding requires every sharded dim to
    divide evenly; fall back to replication otherwise (e.g. a vocab of 25
    rows on a model axis of 2)."""
    for dim, axis in enumerate(spec):
        if axis is None:
            continue
        if leaf.shape[dim] % mesh.shape[axis] != 0:
            return False
    return True


def _spec_for(path: str, leaf) -> P:
    """Tensor-parallel placement rules by parameter path.

    Megatron split of the classifier MLP: lin1 column-parallel (out dim on
    'model'), lin2 row-parallel (in dim on 'model'; XLA inserts the psum).
    The embedding table shards its vocab rows. Attention projections are
    column-split on their hidden dim. Transformer/ViT blocks follow the
    megatron pattern too: qkv and mlp_in column-parallel, out and mlp_out
    row-parallel. Everything else (LSTM, convs, biases of row-parallel
    layers) is replicated — they are small.
    """
    if "classifier/lin1/w" in path:
        return P(None, "model")
    if "classifier/lin1/b" in path:
        return P("model")
    if "classifier/lin2/w" in path:
        return P("model", None)
    if "text/embedding" in path:
        return P("model", None)
    if "attention/q_lin/w" in path or "attention/v_conv/w" in path:
        # 1x1 conv w is [1,1,in,out]; linear w is [in,out] — both split out.
        return P(*([None] * (leaf.ndim - 1)), "model")
    if "attention/q_lin/b" in path:
        return P("model")
    # MoE expert FFN (ops/moe.py): expert-major leaves split their
    # leading E over 'expert'; the per-expert hidden F additionally
    # splits over 'model' (megatron within each expert). The router
    # gate is tiny and replicates (default P()). MUST precede the
    # generic transformer rules: '/moe/out/w' would otherwise be
    # captured by the endswith('/out/w') row-parallel rule and lose its
    # expert-axis split (replicating every expert's out weights on
    # every device).
    if path.endswith("/moe/in/w"):
        return P("expert", None, "model")
    if path.endswith("/moe/in/b"):
        return P("expert", "model")
    if path.endswith("/moe/out/w"):
        return P("expert", "model", None)
    if path.endswith("/moe/out/b"):
        return P("expert", None)
    # Transformer / ViT blocks (text or image side).
    if path.endswith("/qkv/w") or path.endswith("/mlp_in/w"):
        return P(None, "model")       # column-parallel
    if path.endswith("/qkv/b") or path.endswith("/mlp_in/b"):
        return P("model")
    if path.endswith("/out/w") or path.endswith("/mlp_out/w"):
        return P("model", None)       # row-parallel (psum on output)
    return P()


# Leaves at least this large falling back to replication cost real HBM and
# lose real tensor parallelism — worth a loud warning. Biases and small
# projections replicate silently by design.
_WARN_FALLBACK_ELEMENTS = 65_536


def param_shardings(params: Dict, mesh: Mesh):
    """A NamedSharding pytree matching ``params``.

    Leaves whose tensor-parallel spec does not divide evenly fall back to
    replication; large ones (>= ``_WARN_FALLBACK_ELEMENTS`` elements) emit a
    warning naming the leaf and the offending dims, because a big layer
    quietly losing its 'model'-axis split defeats the point of tp. We warn
    rather than pad: padding would make parameter shapes depend on the mesh,
    breaking checkpoint portability and reference-``.pth`` interop. To fix a
    warned leaf, size the dim to a multiple of the model axis (e.g. round
    ``max_answers`` / the vocab up) or shrink ``tpu.mesh.model``.
    """
    fallbacks = []

    def walk(tree, prefix):
        if isinstance(tree, dict):
            return {k: walk(v, f"{prefix}/{k}") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            walked = [walk(v, f"{prefix}/{i}") for i, v in enumerate(tree)]
            return type(tree)(walked) if isinstance(tree, tuple) else walked
        spec = _spec_for(prefix, tree)
        if "/image/layers/" in prefix:
            # The ViT block stack is stored stacked ([L, ...] leading
            # layer axis, models/vit.py:init_vit_image); shard that axis
            # over 'stage' when the mesh pipelines, so the params already
            # sit where the GPipe shard_map's in_specs want them (no
            # in-jit restack/reshard — the source of the SPMD
            # involuntary-rematerialization warnings).
            lead = "stage" if "stage" in mesh.axis_names else None
            spec = P(lead, *spec)
        # Drop axes the mesh does not materialize (e.g. 'expert' on a
        # plain dp x tp mesh): that dim simply replicates.
        spec = P(*(a if a is None or a in mesh.axis_names else None
                   for a in spec))
        if not _divisible(tree, spec, mesh):
            if int(np.prod(tree.shape)) >= _WARN_FALLBACK_ELEMENTS:
                fallbacks.append((prefix, tuple(tree.shape), spec))
            spec = P()
        return NamedSharding(mesh, spec)

    shardings = walk(params, "")
    if fallbacks:
        details = "; ".join(
            f"{path} shape={shape} wanted {spec}"
            for path, shape, spec in fallbacks
        )
        logging.getLogger(__name__).warning(
            "tensor-parallel fallback to replication on mesh %s for: %s — "
            "make the sharded dim a multiple of the 'model' axis "
            "(round max_answers / vocab up) or reduce tpu.mesh.model",
            dict(mesh.shape), details,
        )
    return shardings


def zero_spec(spec: P, shape: Sequence[int], mesh: Mesh) -> P:
    """Add the 'data' axis to the best still-unsharded dim of ``spec``.

    This is the whole of ZeRO on a TPU mesh (tpu.zero_stage): annotate the
    optimizer moments (stage 1) and optionally the parameters (stage 3)
    as sharded over 'data' and let the XLA SPMD partitioner rewrite the
    dataflow — the gradient all-reduce becomes a reduce-scatter into the
    sharded Adam update, and the updated params are all-gathered (once per
    step for stage 1; at each use for stage 3). No NCCL-style bucketing /
    hook machinery as in torch ZeRO implementations: the partitioner
    derives the collectives from the placement (scaling-book recipe).

    Dim choice: the largest dim not already carrying a mesh axis whose
    size divides the 'data' axis evenly (ties: lowest index). Leaves with
    no such dim stay on ``spec`` (replicated over 'data') — correct, just
    unsharded; callers may warn on large ones.
    """
    if "data" not in mesh.axis_names:
        return spec
    n = mesh.shape["data"]
    if n <= 1:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    best = -1
    for dim, (axis, size) in enumerate(zip(entries, shape)):
        if axis is not None or size == 0 or size % n != 0:
            continue
        if best == -1 or size > shape[best]:
            best = dim
    if best == -1:
        return spec
    entries[best] = "data"
    return P(*entries)


def state_shardings(state, p_shardings, mesh: Mesh, zero_stage: int = 0):
    """Shardings for a full TrainState: params (and param-shaped optimizer
    moments, matched by dict-path suffix — Adam's mu/nu mirror the param
    tree) take the tensor-parallel layout; scalars replicate.

    ``zero_stage`` (tpu.zero_stage) additionally splits leaves over the
    'data' axis via :func:`zero_spec`: stage 1 shards the optimizer
    moments (Adam state = 2x params in f32 — the dominant train-state
    HBM after activations); stage 3 shards the parameters too (FSDP).
    Stage 2 does not exist here: gradients are temporaries inside the one
    fused jitted step, and the partitioner already places them."""
    rep = replicated(mesh)
    zero_fallbacks = []

    def for_leaf_path(path, leaf):
        keys = []
        for e in path:
            k = getattr(e, "key", None) or getattr(e, "name", None)
            if k is None:
                idx = getattr(e, "idx", None)  # list entries (layer stacks)
                k = str(idx) if idx is not None else None
            if k is not None:
                keys.append(k)
        found = None
        for start in range(len(keys)):
            node = p_shardings
            for k in keys[start:]:
                if isinstance(node, dict) and k in node:
                    node = node[k]
                elif isinstance(node, (list, tuple)) and str(k).isdigit() \
                        and int(k) < len(node):
                    node = node[int(k)]
                else:
                    node = None
                    break
            if node is not None and not isinstance(node, (dict, list, tuple)):
                found = node
                break
        sharding = found if found is not None else rep
        if zero_stage >= 1 and keys:
            in_scope = keys[0] == "opt_state" or (
                zero_stage >= 3 and keys[0] == "params"
            )
            # Flatten spec entries before the membership test: a dim
            # sharded over a tuple of axes like P(('stage', 'model'))
            # must match too, not only plain-string entries.
            spec_axes = set()
            for entry in sharding.spec or ():
                if isinstance(entry, str):
                    spec_axes.add(entry)
                elif entry is not None:
                    spec_axes.update(entry)
            if in_scope and keys[0] == "params" and "stage" in spec_axes:
                # Stage-sharded params travel through the GPipe shard_map,
                # whose in_specs declare them P('stage') with every other
                # dim REPLICATED (parallel/pipeline.py). Adding 'data' to a
                # free dim here would force an in-jit all-gather over
                # 'data' at every use — reintroducing the reshard the
                # stage placement exists to avoid and negating the FSDP
                # saving. They are already divided n_stage ways; their
                # Adam moments (opt_state) stay eligible: the optimizer
                # update runs outside the shard_map.
                in_scope = False
            shape = getattr(leaf, "shape", ())
            if in_scope and len(shape) > 0:
                zspec = zero_spec(sharding.spec, shape, mesh)
                if zspec != sharding.spec:
                    return NamedSharding(mesh, zspec)
                if int(np.prod(shape)) >= _WARN_FALLBACK_ELEMENTS:
                    zero_fallbacks.append(("/".join(keys), tuple(shape)))
        return sharding

    out = jax.tree_util.tree_map_with_path(for_leaf_path, state)
    if zero_fallbacks:
        details = "; ".join(f"{p} shape={s}" for p, s in zero_fallbacks)
        logging.getLogger(__name__).warning(
            "tpu.zero_stage=%d: no dim of these large leaves divides the "
            "'data' axis (%d) — they stay replicated over it: %s",
            zero_stage, mesh.shape.get("data", 1), details,
        )
    return out
