"""VQA 2.0 dataset: eager numpy encodings with fixed shapes.

Functional equivalent of the reference's ``VQA_dataset``
(``/root/reference/preprocessing/data_preprocessing.py:14-176``) with a
TPU-first representation: everything is materialized once as dense,
fixed-shape numpy arrays (questions padded to the dataset's max question
length, answers padded to the dataset's max number of unique answers), so
batches can be sliced and shipped to the device with zero per-sample
Python work.

Preserved reference semantics:

* integrity check: question/annotation alignment on ``question_id``,
  ``image_id``, ``data_type``, ``data_subtype`` (ref ``:117-128``);
* question encoding: zero-padded vector of vocab ids, id 0 = unknown/pad
  (ref ``:142-152``);
* answer encoding: unique 1-based vocab ids of the (up to 10) annotator
  answers + their counts, via ``np.unique`` (sorted ids) (ref ``:154-165``);
* ``answerable_only``: keep only samples with >= 1 in-vocab answer
  (ref ``:130-140``);
* ``num_tokens`` = len(question vocab) + 1 for the unknown token
  (ref ``:101-103``);
* images read from the h5 cache through an ``image_id -> row`` map built
  from the cache's ``ids`` dataset (ref ``:105-115``).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Tuple

import numpy as np

from dl_vqa_tpu.data import text as vqa_text

__all__ = ["VQADataset", "StaleImageCacheError", "encode_question",
           "encode_answers", "load_or_build_val_dataset"]


class StaleImageCacheError(RuntimeError):
    """The persisted npz dataset cache's image-row map (``h5_rows``) was
    built against a DIFFERENT h5 image store than the one on disk (the
    store was rebuilt: new images, different directory scan order, another
    machine). Using it would silently pair questions with the wrong
    images. Callers treat this like a stale cache: rebuild the dataset."""


def encode_question(
    tokens: List[str], vocab: Dict[str, int], max_len: int
) -> Tuple[np.ndarray, int]:
    """Encode one tokenized question to a zero-padded id vector + length."""
    vec = np.zeros(max_len, dtype=np.int32)
    for i, tok in enumerate(tokens):
        vec[i] = vocab.get(tok, 0)
    return vec, len(tokens)


def encode_answers(
    answers: List[str], vocab: Dict[str, int]
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Encode normalized answers to (unique 1-based ids, counts, n_unique)."""
    in_vocab = [vocab[a] for a in answers if a in vocab]
    if not in_vocab:
        return (
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.int64),
            0,
        )
    unique, counts = np.unique(in_vocab, return_counts=True)
    return unique.astype(np.int64), counts.astype(np.int64), len(unique)


class VQADataset:
    """Dense-encoded VQA split.

    Attributes (all fixed-shape numpy):
      questions       int32 [N, Lmax]   zero-padded question token ids
      question_lengths int32 [N]
      answer_indices  int32 [N, Kmax]   1-based answer vocab ids, 0 = pad
      answer_values   int32 [N, Kmax]   annotator counts, 0 = pad
      answer_lengths  int32 [N]         number of unique in-vocab answers
      image_ids       int64 [N]
      h5_rows         int64 [N]         row of each sample's image in the cache
    """

    def __init__(
        self,
        data_paths: dict,
        other_paths: dict,
        logger=None,
        answerable_only: bool = False,
        require_image_cache: bool = True,
    ):
        log = logger.write if logger is not None else (lambda *_: None)
        base_path = other_paths["base_path"]

        log("Opening files")
        with open(os.path.join(base_path, data_paths["questions"])) as fd:
            questions_json = json.load(fd)
        with open(os.path.join(base_path, data_paths["answers"])) as fd:
            answers_json = json.load(fd)
        with open(other_paths["vocab_path"]) as fd:
            vocab = json.load(fd)

        log("Checking integrity")
        self._check_integrity(questions_json, answers_json)

        self.vocab = vocab
        self.question_vocab = vocab["question"]
        self.answer_vocab = vocab["answer"]
        self.image_path = data_paths["processed_imgs"]
        self.answerable_only = answerable_only

        log("Preparing and encoding questions")
        tokenized = list(vqa_text.prepare_questions(questions_json))
        self.max_question_length = max(map(len, tokenized)) if tokenized else 0
        n = len(tokenized)
        self.questions = np.zeros((n, self.max_question_length), dtype=np.int32)
        self.question_lengths = np.zeros(n, dtype=np.int32)
        for i, toks in enumerate(tokenized):
            vec, length = encode_question(
                toks, self.question_vocab, self.max_question_length
            )
            self.questions[i] = vec
            self.question_lengths[i] = length

        log("Preparing and encoding answers")
        encoded = [
            encode_answers(a, self.answer_vocab)
            for a in vqa_text.prepare_answers(answers_json)
        ]
        # Official VQA answer types, for per-type accuracy reporting.
        type_codes = {"yes/no": 0, "number": 1}
        self.answer_types = np.array(
            [
                type_codes.get(ann.get("answer_type", "other"), 2)
                for ann in answers_json["annotations"]
            ],
            dtype=np.int32,
        )
        self.answer_lengths = np.array([e[2] for e in encoded], dtype=np.int32)
        k_max = max(int(self.answer_lengths.max()), 1) if n else 1
        self.answer_indices = np.zeros((n, k_max), dtype=np.int32)
        self.answer_values = np.zeros((n, k_max), dtype=np.int32)
        for i, (idx, val, k) in enumerate(encoded):
            self.answer_indices[i, :k] = idx
            self.answer_values[i, :k] = val

        log("Indexing images")
        self.question_ids = np.array(
            [q["question_id"] for q in questions_json["questions"]],
            dtype=np.int64,
        )
        self.image_ids = np.array(
            [q["image_id"] for q in questions_json["questions"]], dtype=np.int64
        )
        self.has_image_rows = bool(require_image_cache)
        if require_image_cache:
            self._image_id_to_row = self._build_image_row_map()
            self.h5_rows = np.array(
                [self._image_id_to_row[i] for i in self.image_ids.tolist()],
                dtype=np.int64,
            )
        else:
            # Online-image mode: JPEGs are decoded on the fly by image_id;
            # no h5 cache exists. h5_rows is a placeholder and
            # load_images_* refuse to use it (has_image_rows=False).
            self._image_id_to_row = None
            self.h5_rows = np.zeros(n, dtype=np.int64)

        if answerable_only:
            log("Filtering to answerable-only samples")
            keep = np.nonzero(self.answer_lengths > 0)[0]
            for name in self._ARRAY_FIELDS:
                setattr(self, name, getattr(self, name)[keep])

        self._h5 = None  # lazy per-process handle (safe across forks)
        self._features = None  # lazy memmap/h5 view of the image store

    # -- reference-compatible accessors ---------------------------------

    @property
    def num_tokens(self) -> int:
        return len(self.question_vocab) + 1

    def __len__(self) -> int:
        return len(self.questions)

    # -- internals -------------------------------------------------------

    @staticmethod
    def _check_integrity(questions_json: dict, answers_json: dict) -> None:
        qs, anns = questions_json["questions"], answers_json["annotations"]
        # zip() stops at the shorter side, so the count must be checked
        # explicitly or a truncated annotations file would pass and crash
        # later with an opaque length mismatch.
        assert len(qs) == len(anns), (
            f"Questions/annotations count mismatch: {len(qs)} questions "
            f"vs {len(anns)} annotations"
        )
        assert all(
            q["question_id"] == a["question_id"] for q, a in zip(qs, anns)
        ), "Questions not aligned with answers"
        assert all(
            q["image_id"] == a["image_id"] for q, a in zip(qs, anns)
        ), "Image id of question and answer don't match"
        assert questions_json["data_type"] == answers_json["data_type"], \
            "Mismatched data types"
        assert questions_json["data_subtype"] == answers_json["data_subtype"], \
            "Mismatched data subtypes"

    def _build_image_row_map(self) -> Dict[int, int]:
        import h5py

        with h5py.File(self.image_path, "r") as fd:
            ids = fd["ids"][()]
        # Fingerprint the id ordering the row map was built against, so a
        # persisted cache can detect a rebuilt/reordered h5 store (save()
        # records it; load() verifies it).
        self._h5_ids_meta = self._ids_fingerprint(ids)
        return {int(img_id): row for row, img_id in enumerate(ids)}

    @staticmethod
    def _ids_fingerprint(ids) -> Dict:
        import hashlib

        arr = np.ascontiguousarray(np.asarray(ids, dtype=np.int64))
        return {"n": int(arr.shape[0]),
                "sha1": hashlib.sha1(arr.tobytes()).hexdigest()}

    def _h5_handle(self):
        if self._h5 is None:
            import h5py

            self._h5 = h5py.File(self.image_path, "r")
        return self._h5

    def _features_view(self):
        """The image feature store, as a zero-copy ``np.memmap`` when the
        h5 dataset is contiguous and uncompressed (our cache builder's
        layout, and the reference's): batch gathers then run at
        page-cache speed via numpy fancy indexing instead of h5py's
        per-row read path — measured 1.4-3.0 s -> <0.1 s per 512-image
        batch on the at-scale corpus (1 host core), which took the
        end-to-end h5 training path from ~110 to device-bound
        samples/s. Chunked/compressed files fall back to the h5py
        dataset. The memmap maps pages lazily, so this works at any
        cache size (real VQA 2.0 train2014 is ~24 GB)."""
        if self._features is None:
            feats = self._h5_handle()["features"]
            if np.issubdtype(np.dtype(feats.dtype), np.integer):
                # The h5 contract is a PROCESSED float feature cache
                # (normalized CHW, the builder's/reference's fp16).
                # Silently float-converting raw integer pixels would skip
                # the model's uint8-gated normalization and train on
                # values ~100x out of range with no error.
                raise ValueError(
                    f"image feature store {self.image_path!r} has integer "
                    f"dtype {np.dtype(feats.dtype).name}: this is raw "
                    "pixel data, not a processed feature cache. Use the "
                    "online pipeline (tpu.online_images=true) for raw "
                    "images, or build the cache with "
                    "dl_vqa_tpu.data.images.preprocess_images"
                )
            if feats.chunks is None and feats.compression is None:
                offset = feats.id.get_offset()
                if offset is not None:
                    self._features = np.memmap(
                        self.image_path, dtype=feats.dtype, mode="r",
                        offset=offset, shape=feats.shape,
                    )
                    return self._features
            self._features = feats
        return self._features

    # -- image access ------------------------------------------------------

    @property
    def image_store_nbytes(self) -> int:
        """Device-side size of the full image feature store in bytes,
        WITHOUT loading it — the budget check for the device-resident
        cache. The uploaded table is ALWAYS fp16 (``features_nhwc_all``
        converts wider stores down — loudly — and narrower ones up), so
        the charge is a flat 2 bytes/element regardless of the h5 dtype:
        a float32 store lands as 2 bytes/element on device, and a uint8
        store also lands as 2 (charging its host itemsize of 1 would
        admit a table twice the budget)."""
        if not getattr(self, "has_image_rows", True):
            return 0
        feats = self._h5_handle()["features"]
        return int(np.prod(feats.shape)) * 2

    @property
    def image_store_rows(self) -> int:
        """Row count of the image store (cheap: shape query only)."""
        return int(self._features_view().shape[0])

    def features_nhwc_all(self, dtype=np.float16, rows=None) -> np.ndarray:
        """The image store as one [N, H, W, 3] array — the host side of
        the device-resident image cache (``tpu.device_image_cache``):
        uploaded once, batches then carry only row indices and the
        gather runs on device. On relay-backed runtimes the per-batch
        host->device image transfer (~147 MiB at ~40 MB/s) dominates
        the end-to-end step; a one-time upload removes it entirely.

        ``rows`` (a slice) loads only that contiguous row block —
        multi-host sharded uploads read each process's own block so
        per-host memory scales with 1/process_count."""
        feats = self._features_view()
        if np.dtype(feats.dtype).itemsize > np.dtype(dtype).itemsize:
            import warnings

            warnings.warn(
                f"image feature store {self.image_path!r} is "
                f"{np.dtype(feats.dtype).name}; downcasting to "
                f"{np.dtype(dtype).name} for the device-resident table "
                "(tpu.device_image_cache=off to keep full precision via "
                "per-batch host transfer)",
                stacklevel=2,
            )
        block = feats[:] if rows is None else feats[rows]
        return np.ascontiguousarray(
            np.asarray(block, dtype=dtype).transpose(0, 2, 3, 1)
        )

    def load_images_chw(self, sample_indices: np.ndarray,
                        dtype=np.float32) -> np.ndarray:
        """Load images for the given SAMPLE indices as [B,3,H,W]."""
        if not getattr(self, "has_image_rows", True):
            raise RuntimeError(
                "This dataset was built in online-image mode (no h5 row "
                "map); rebuild it with require_image_cache=True or use the "
                "online pipeline."
            )
        feats = self._features_view()
        rows = self.h5_rows[sample_indices]
        if isinstance(feats, np.memmap):
            # numpy fancy indexing handles unsorted/duplicate rows natively.
            return np.asarray(feats[rows], dtype=dtype)
        # h5py fancy indexing needs sorted unique rows; np.unique sorts
        # and return_inverse maps each original position back.
        unique_rows, inverse = np.unique(rows, return_inverse=True)
        loaded = np.asarray(feats[unique_rows.tolist()], dtype=dtype)
        return loaded[inverse]

    def load_images_nhwc(self, sample_indices: np.ndarray,
                         dtype=np.float16) -> np.ndarray:
        """Load images as [B,H,W,3] — the TPU-native layout. Defaults to
        fp16 (the cache's storage dtype): half the host work and
        host->device bytes; the model upcasts on device."""
        return np.ascontiguousarray(
            self.load_images_chw(sample_indices, dtype).transpose(0, 2, 3, 1)
        )

    # -- persistence (replaces the reference's whole-object pickle) --------

    _ARRAY_FIELDS = (
        "questions", "question_lengths", "answer_indices", "answer_values",
        "answer_lengths", "answer_types", "question_ids", "image_ids",
        "h5_rows",
    )

    def save(self, path: str) -> None:
        np.savez_compressed(
            path if path.endswith(".npz") else path + ".npz",
            meta=np.frombuffer(
                json.dumps(
                    {
                        "vocab": self.vocab,
                        "image_path": self.image_path,
                        "answerable_only": self.answerable_only,
                        "max_question_length": int(self.max_question_length),
                        "has_image_rows": getattr(self, "has_image_rows",
                                                  True),
                        # h5-store fingerprint the h5_rows map is valid
                        # against (None in online mode / legacy caches).
                        "h5_ids": getattr(self, "_h5_ids_meta", None),
                    }
                ).encode(),
                dtype=np.uint8,
            ),
            **{f: getattr(self, f) for f in self._ARRAY_FIELDS},
        )

    @classmethod
    def load(cls, path: str) -> "VQADataset":
        if not path.endswith(".npz"):
            path = path + ".npz"
        with np.load(path) as data:
            obj = cls.__new__(cls)
            meta = json.loads(bytes(data["meta"]).decode())
            obj.vocab = meta["vocab"]
            obj.question_vocab = obj.vocab["question"]
            obj.answer_vocab = obj.vocab["answer"]
            obj.image_path = meta["image_path"]
            obj.answerable_only = meta["answerable_only"]
            obj.max_question_length = meta["max_question_length"]
            obj.has_image_rows = meta.get("has_image_rows", True)
            obj._h5_ids_meta = meta.get("h5_ids")
            if (
                obj.has_image_rows
                and obj._h5_ids_meta
                and os.path.exists(obj.image_path)
            ):
                # Guard against a silently rebuilt h5 store: the cached
                # h5_rows index rows of the store AS IT WAS at build time;
                # a store with different ids/order would pair questions
                # with the wrong images with zero errors. (Caches written
                # before the fingerprint existed skip the check.)
                import h5py

                with h5py.File(obj.image_path, "r") as fd:
                    current = cls._ids_fingerprint(fd["ids"][()])
                if current != obj._h5_ids_meta:
                    raise StaleImageCacheError(
                        f"dataset cache {path!r} was built against a "
                        f"different image store than {obj.image_path!r} "
                        f"(ids fingerprint {obj._h5_ids_meta} vs "
                        f"{current}); rebuild the dataset cache"
                    )
            for f in cls._ARRAY_FIELDS:
                if f not in data:
                    raise KeyError(
                        f"Dataset cache {path!r} is missing {f!r} — it was "
                        "written by an older version; delete it to rebuild."
                    )
                setattr(obj, f, data[f])
            obj._image_id_to_row = None
            obj._h5 = None
            obj._features = None
            return obj

    @classmethod
    def cache_path(cls, configured_path: str) -> str:
        """Map the reference's ``*.pkl`` cache key to our npz file."""
        root, _ = os.path.splitext(configured_path)
        return root + ".npz"


def load_or_build_val_dataset(cfg, profile, logger=None, log=None,
                              require_image_cache=True):
    """Shared val-dataset load/build for the eval-style entry points
    (evaluate_vqa.py, predict.py --submission) so the guard logic cannot
    drift between them: builds the h5 image cache if absent (when
    required), and rebuilds the npz dataset cache when it was written by
    an older version (KeyError on load) or in online mode without the
    image-row map this caller needs."""
    from dl_vqa_tpu.data.images import preprocess_images

    log = log or (lambda *_: None)
    val_imgs = profile["val_paths"]["processed_imgs"]
    if require_image_cache and not os.path.exists(val_imgs):
        preprocess_images(
            other_paths=profile["paths"],
            data_paths=profile["val_paths"],
            image_size=cfg["train"]["image_size"],
            central_fraction=cfg["train"]["central_fraction"],
            processed_path=val_imgs,
            log=log,
            backend=cfg["tpu"]["image_builder_backend"],
        )

    cache = VQADataset.cache_path(profile["val_paths"]["vqaDataset"])
    dataset = None
    if os.path.exists(cache):
        try:
            dataset = VQADataset.load(cache)
        except (KeyError, StaleImageCacheError):
            dataset = None  # older version / rebuilt image store; rebuild
        if (dataset is not None and require_image_cache
                and not dataset.has_image_rows):
            dataset = None  # cache from online mode; rebuild with rows
    if dataset is None:
        dataset = VQADataset(
            data_paths=profile["val_paths"],
            other_paths=profile["paths"],
            logger=logger,
            answerable_only=False,
            require_image_cache=require_image_cache,
        )
        dataset.save(cache)
    return dataset
