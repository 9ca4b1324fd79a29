"""Vocab construction ordering semantics (ref preprocess_vocab.py:9-31)."""

import os
import sys

import pytest

from dl_vqa_tpu.data import vocab as vocab_mod

REF_ROOT = "/root/reference"


def _reference_extract_vocab():
    if not os.path.isdir(REF_ROOT):
        return None
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    try:
        from preprocessing.preprocess_vocab import extract_vocab  # type: ignore
        return extract_vocab
    except Exception:
        return None


def test_count_descending_with_token_tiebreak():
    lists = [["b", "a", "a"], ["c", "c", "b"]]
    # counts: a=2, b=2, c=2 — ties broken by token DESCENDING
    vocab = vocab_mod.build_vocab(lists, start=1)
    assert vocab == {"c": 1, "b": 2, "a": 3}


def test_top_k_selection_then_resort():
    lists = [["x"] * 5, ["y"] * 3, ["z"] * 3, ["w"] * 1]
    vocab = vocab_mod.build_vocab(lists, top_k=3, start=1)
    # top 3 by count: x(5), then y/z tie at 3 (both kept); ids by (count, token) desc
    assert vocab == {"x": 1, "z": 2, "y": 3}


def test_start_offset_reserves_zero():
    vocab = vocab_mod.build_vocab([["hello"]], start=1)
    assert 0 not in vocab.values()


@pytest.mark.skipif(_reference_extract_vocab() is None, reason="reference not available")
def test_matches_reference_on_random_corpus():
    import random

    extract_vocab = _reference_extract_vocab()
    rng = random.Random(7)
    words = [f"w{i}" for i in range(30)]
    corpus = [
        [rng.choice(words) for _ in range(rng.randint(1, 12))]
        for _ in range(200)
    ]
    assert vocab_mod.build_vocab(corpus, start=1) == extract_vocab(corpus, start=1)
    assert vocab_mod.build_vocab(corpus, top_k=10, start=1) == extract_vocab(
        corpus, num_most_frequent=10, start=1
    )
