"""AOT serving artifacts: the jitted forward as a serialized program.

A deployment story the reference cannot offer (its ``model.pth`` needs
the full PyTorch model code to deserialize, ``/root/reference/
evaluate_vqa.py:72-78``): :func:`export_artifact` writes a directory
containing the serving forward as **serialized StableHLO**
(``jax.export``), the weights, and the decode metadata. A consumer
process loads it with :func:`load_artifact` and serves — no model code,
no config system, no Python retracing; the loader imports only jax +
numpy (guarded by ``tests/test_aot_export.py``, which asserts no
``dl_vqa_tpu.models``/``ops`` module gets imported). Because the
program is an ahead-of-time compiled artifact, serving numerics are
frozen at export time — config drift, dispatch-default changes, or
model-code edits cannot silently change a deployed model.

Layout of an artifact directory::

    meta.json            version, batch buckets, question/answer vocab,
                         preprocessing constants, export platforms
    params.npz           fp32 weights, keys are '/'-joined pytree paths
    forward_b{N}.jexp    serialized exported forward at batch N

The exported signature is ``(params, images[f32 B,H,W,3],
questions[i32 B,L], lengths[i32 B]) -> logits[f32 B,A]`` — weights stay
ARGUMENTS (not baked constants), so the StableHLO stays small (relay
compile-payload limits, docs/PERF_NOTES.md) and one artifact serves
many fine-tuned weight sets with the same topology.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

import numpy as np

__all__ = ["export_artifact", "load_artifact", "ServingArtifact",
           "ARTIFACT_VERSION"]

ARTIFACT_VERSION = 1


# ------------------------------------------------------------------ flatten

def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k in sorted(tree):
            out.update(_flatten(tree[k], f"{prefix}/{k}" if prefix else k))
        return out
    if isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}/{i}"))
        return out
    out[prefix] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    root: Dict = {}
    for key, value in flat.items():
        node = root
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [listify(node[str(i)]) for i in range(len(node))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


# ------------------------------------------------------------------ export

def export_artifact(
    path: str,
    params,
    forward,
    *,
    batch_sizes: Sequence[int],
    image_size: int,
    max_question_length: int,
    vocab: Dict,
    central_fraction: float = 0.875,
    platforms: Optional[Sequence[str]] = None,
    extra_meta: Optional[Dict] = None,
) -> None:
    """Export ``forward(params, images, questions, lengths) -> logits``
    at each batch bucket into the artifact directory ``path``.

    ``platforms`` defaults to the current backend; pass e.g.
    ``('tpu', 'cpu')`` for a multi-platform artifact (may be rejected if
    the traced program contains platform-specific custom calls — the
    Pallas kernels dispatch only on TPU, so a CPU export is always
    custom-call-free)."""
    import jax
    from jax import export as jax_export

    os.makedirs(path, exist_ok=True)
    params_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        params,
    )
    jitted = jax.jit(forward)
    exported_platforms = None
    for bs in batch_sizes:
        exp = jax_export.export(
            jitted,
            platforms=list(platforms) if platforms else None,
        )(
            params_spec,
            jax.ShapeDtypeStruct((bs, image_size, image_size, 3),
                                 np.float32),
            jax.ShapeDtypeStruct((bs, max_question_length), np.int32),
            jax.ShapeDtypeStruct((bs,), np.int32),
        )
        exported_platforms = list(exp.platforms)
        with open(os.path.join(path, f"forward_b{bs}.jexp"), "wb") as fd:
            fd.write(exp.serialize())

    np.savez(os.path.join(path, "params.npz"), **_flatten(params))
    meta = {
        "version": ARTIFACT_VERSION,
        "batch_sizes": sorted(int(b) for b in batch_sizes),
        "image_size": int(image_size),
        "central_fraction": float(central_fraction),
        "max_question_length": int(max_question_length),
        "platforms": exported_platforms,
        # Decode/encode tables: answer ids are 1-based (vocab.json
        # convention, ref preprocess_vocab.py); logits column c decodes
        # via answer_by_id[c + 1].
        "question_vocab": vocab["question"],
        "answer_vocab": vocab["answer"],
    }
    meta.update(extra_meta or {})
    with open(os.path.join(path, "meta.json"), "w") as fd:
        json.dump(meta, fd)


# ------------------------------------------------------------------ load

class ServingArtifact:
    """A loaded artifact: batched ``logits()`` + answer decoding.

    Deliberately depends on nothing but jax + numpy — deserializing the
    StableHLO IS the model. Inputs exceeding the largest exported batch
    bucket are split; smaller batches pad up to the nearest bucket (rows
    are independent in this model family, so padding changes nothing)."""

    def __init__(self, path: str):
        import jax
        from jax import export as jax_export

        with open(os.path.join(path, "meta.json")) as fd:
            self.meta = json.load(fd)
        if self.meta["version"] > ARTIFACT_VERSION:
            raise ValueError(
                f"artifact version {self.meta['version']} is newer than "
                f"this loader ({ARTIFACT_VERSION})"
            )
        backend = jax.default_backend()
        if backend not in self.meta["platforms"]:
            raise ValueError(
                f"artifact was exported for {self.meta['platforms']}, "
                f"current backend is {backend!r} — re-export with "
                f"platforms=({backend!r},)"
            )
        with np.load(os.path.join(path, "params.npz")) as z:
            self.params = _unflatten({k: z[k] for k in z.files})
        self._calls = {}
        for bs in self.meta["batch_sizes"]:
            with open(os.path.join(path, f"forward_b{bs}.jexp"), "rb") as fd:
                exp = jax_export.deserialize(fd.read())
            # jit the call so repeated serving batches hit the executable
            # cache instead of re-tracing the deserialized program.
            self._calls[bs] = jax.jit(exp.call)
        self.batch_sizes = self.meta["batch_sizes"]
        self.max_question_length = self.meta["max_question_length"]
        self.image_size = self.meta["image_size"]
        self.answer_by_id = {
            int(i): a for a, i in self.meta["answer_vocab"].items()
        }

    def _bucket(self, n: int) -> int:
        for bs in self.batch_sizes:
            if n <= bs:
                return bs
        return self.batch_sizes[-1]

    def logits(self, images, questions, lengths) -> np.ndarray:
        """[B,H,W,3] f32, [B,L] i32, [B] i32 -> [B, answers] f32, any B."""
        images = np.asarray(images, np.float32)
        questions = np.asarray(questions, np.int32)
        lengths = np.asarray(lengths, np.int32)
        n = images.shape[0]
        out = []
        start = 0
        while start < n:
            bs = self._bucket(n - start)
            take = min(bs, n - start)
            pad = bs - take

            def padded(x):
                if pad == 0:
                    return x[start:start + take]
                widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
                return np.pad(x[start:start + take], widths)

            block = self._calls[bs](
                self.params, padded(images), padded(questions),
                np.maximum(padded(lengths), 1),
            )
            out.append(np.asarray(block)[:take])
            start += take
        return np.concatenate(out, axis=0)

    def answers(self, images, questions, lengths):
        """argmax decode -> list of answer strings."""
        preds = self.logits(images, questions, lengths).argmax(axis=1)
        return [self.answer_by_id.get(int(p) + 1, "<unk>") for p in preds]


def load_artifact(path: str) -> ServingArtifact:
    return ServingArtifact(path)
