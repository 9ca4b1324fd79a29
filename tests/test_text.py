"""Text normalizer parity: golden pairs + cross-check against the PyTorch
reference implementation when it is present (SURVEY.md §4 unit tier)."""

import os
import sys

import pytest

from dl_vqa_tpu.data import text as vqa_text

REF_ROOT = "/root/reference"


def _reference_module():
    if not os.path.isdir(REF_ROOT):
        return None
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    try:
        from preprocessing import data_preprocessing  # type: ignore
        return data_preprocessing
    except Exception:
        return None


# -- questions ---------------------------------------------------------------

def test_question_tokenization():
    assert vqa_text.normalize_question("What is THE Dog doing?") == [
        "what", "is", "the", "dog", "doing",
    ]


def test_question_requires_question_mark():
    with pytest.raises(ValueError):
        vqa_text.normalize_question("no question mark")


def test_question_keeps_empty_tokens_from_double_space():
    # split(' ') — not split() — so double spaces yield empty tokens.
    assert vqa_text.normalize_question("what  is?") == ["what", "", "is"]


# -- answers -----------------------------------------------------------------

GOLDEN_ANSWERS = [
    ("yes", "yes"),
    ("Yes!", "yes"),
    ("two", "2"),
    ("none", "0"),
    ("a dog", "dog"),
    ("the red ball", "red ball"),
    ("dont know", "don't know"),
    ("isnt", "isn't"),
    ("1,000", "1000"),
    ("3.5", "3.5"),
    ("U.S.A.", "usa"),
    ("left-hand side", "left hand side"),
    ("semi-colon;", "semi colon"),
    ("ten", "10"),
    ("an apple a day", "apple day"),
    ("whats up", "what's up"),
    ("red, white and blue", "red white and blue"),
]


@pytest.mark.parametrize("raw,expected", GOLDEN_ANSWERS)
def test_answer_goldens(raw, expected):
    assert vqa_text.normalize_answer(raw) == expected


TRICKY_ANSWERS = [
    "yes", "no", "Two", "NONE", "a dog", "the red ball", "dont know",
    "1,000", "1,000,000.5", "3.50", "U.S.A.", "left-hand side",
    "semi-colon;", "an apple a day", "whats up", "red, white and blue",
    "he's here (maybe)", "x=y+z", "what?!", "50/50", "[brackets]",
    "quote\"inside", "back\\slash", "under_score", "tilde`quote",
    "mr. smith", "9.99 dollars", "1. first", "a.m.", "p.m .",
    "yall youre youve", "oclock", "maam", "somebody'd",
    "  spaced  out  ", "trailing space ", " leading",
    "comma,nospace", "comma, space", "space ,comma",
]


@pytest.mark.skipif(_reference_module() is None, reason="reference not available")
@pytest.mark.parametrize("raw", TRICKY_ANSWERS)
def test_answer_matches_reference(raw):
    ref = _reference_module()
    assert vqa_text.normalize_answer(raw) == ref.preprocess_answer(raw)


@pytest.mark.skipif(_reference_module() is None, reason="reference not available")
def test_punctuation_stage_matches_reference():
    ref = _reference_module()
    for raw in TRICKY_ANSWERS:
        assert vqa_text._strip_punctuation(raw) == ref.process_punctuation(raw)


@pytest.mark.skipif(_reference_module() is None, reason="reference not available")
def test_digit_article_stage_matches_reference():
    ref = _reference_module()
    for raw in TRICKY_ANSWERS:
        assert vqa_text._canonicalize_words(raw) == ref.process_digit_article(raw)


@pytest.mark.skipif(_reference_module() is None, reason="reference not available")
def test_question_generator_matches_reference():
    ref = _reference_module()
    qjson = {
        "questions": [
            {"question": "What IS the  Dog doing?"},
            {"question": "How many?"},
        ]
    }
    assert list(vqa_text.prepare_questions(qjson)) == list(
        ref.prepare_questions(qjson)
    )


@pytest.mark.skipif(_reference_module() is None, reason="reference not available")
def test_answer_normalizer_fuzz_parity():
    """500 random punctuation/digit/contraction-heavy strings must
    normalize identically to the reference."""
    import random

    ref = _reference_module()
    rng = random.Random(1234)
    alphabet = (
        list("abcdefghijklmnopqrstuvwxyz0123456789")
        + list(";/[]\"{}()=+\\_-><@`,?! .'")
        + ["dont", "cant", "youre", "one", "two", "ten", "a", "an", "the",
           "1,000", "3.5", "mr.", "oclock", "yall"]
    )
    for _ in range(500):
        n = rng.randint(1, 8)
        raw = " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            if rng.random() < 0.5 else rng.choice(alphabet)
            for _ in range(n)
        )
        assert vqa_text.normalize_answer(raw) == ref.preprocess_answer(raw), raw


@pytest.mark.skipif(_reference_module() is None, reason="reference not available")
def test_period_strip_count_quirk_matches_reference():
    """The reference passes re.UNICODE (== 32) as Pattern.sub's COUNT
    argument, so only the FIRST 32 period matches are stripped; an
    answer with more periods must normalize identically here."""
    ref = _reference_module()
    raw = "a" + "." * 40 + "b ...... yes"
    assert vqa_text.normalize_answer(raw) == ref.preprocess_answer(raw)
