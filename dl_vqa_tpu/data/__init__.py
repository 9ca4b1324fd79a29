"""Data layer: text normalization, vocab, datasets, image caches."""

from dl_vqa_tpu.data.text import (
    normalize_answer,
    normalize_question,
    prepare_answers,
    prepare_questions,
)
from dl_vqa_tpu.data.vocab import build_vocab, create_vocab, load_vocab

__all__ = [
    "normalize_answer",
    "normalize_question",
    "prepare_answers",
    "prepare_questions",
    "build_vocab",
    "create_vocab",
    "load_vocab",
]
