"""Synthetic VQA 2.0-format data generator.

Stands in for the reference's ``small_data/`` mirror (its de-facto
integration-test harness, ref ``/root/reference/config/config.yaml:32-49``):
generates valid VQA-format question/annotation JSONs, COCO-named JPEGs,
and optionally the h5 image cache, so the full pipeline can be exercised
hermetically in tests and benchmarks.
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict, List, Tuple

import numpy as np

__all__ = ["generate_vqa_split", "generate_coco_images", "make_synthetic_corpus"]

_QUESTION_WORDS = [
    "what", "is", "the", "color", "of", "cat", "dog", "how", "many",
    "people", "are", "in", "picture", "on", "table", "wearing", "man",
    "woman", "doing", "this", "a", "red", "ball", "there",
]

_ANSWERS = [
    "yes", "no", "2", "red", "blue", "cat", "dog", "1", "3", "white",
    "green", "frisbee", "skateboard", "0", "black", "brown", "tennis",
    "pizza", "kitchen", "baseball",
]

# ---- learnable mode (opt-in): answers are a deterministic function of
# rendered image attributes + the question's type word, so training can
# actually CONVERGE on the corpus (the default mode's answers are random
# — any model sits at the answer prior, which is the right property for
# byte-stable fixtures but useless for accuracy-sensitive measurements
# like the f8-stem quantization delta, experiments/probe_f8_accuracy.py).

_COLOR_RGB = {
    "red": (200, 40, 40), "blue": (40, 60, 200), "green": (40, 180, 60),
    "white": (230, 230, 230), "black": (25, 25, 25), "brown": (140, 90, 40),
}
_COLOR_NAMES = sorted(_COLOR_RGB)
_FILLER = ["the", "in", "this", "picture", "a", "of", "there"]


def _image_attrs(image_id: int, seed: int) -> Dict[str, object]:
    """Deterministic render attributes for an image id — shared by the
    question/answer generator and the image renderer so they agree."""
    rng = random.Random((seed << 20) ^ image_id)
    return {
        "color": rng.choice(_COLOR_NAMES),
        "count": rng.randint(0, 3),
        "bright": rng.random() < 0.5,
    }


# ---- hard mode (learnable="hard"): a LOWER-ceiling task for accuracy-
# sensitivity measurements (VERDICT r4 item 3 — the 99.6%-ceiling easy
# task cannot surface quantization damage). Three properties matter:
#   * fine-grained classes whose pixel evidence is small relative to the
#     render noise (12 hue bins ~30 degrees apart under sigma~0.55-bin
#     hue jitter; 3 size bins with continuous sizes near the edges), so
#     the Bayes ceiling is well below 100% and activation precision in
#     the stem carries real information;
#   * more classes overall (12 hues + 9 counts + 3 sizes = 24 targets
#     vs the easy task's 12);
#   * lower annotator agreement (0.75 vs 0.9), softening the targets.

_HUE_BINS = 12
_HUE_NAMES = [f"hue{i}" for i in range(_HUE_BINS)]
_SIZE_EDGES = (0.055, 0.085)            # fractions of image height
_SIZE_NAMES = ("small", "medium", "large")
_HUE_NOISE = 0.75 / _HUE_BINS           # sigma of the rendered-hue jitter
_SIZE_NOISE = 0.008                     # sigma of the rendered-size jitter
_MAX_COUNT = 8


def _hard_image_attrs(image_id: int, seed: int) -> Dict[str, object]:
    rng = random.Random((seed << 21) ^ (image_id * 2654435761))
    hue_bin = rng.randrange(_HUE_BINS)
    # The RENDERED hue is jittered around the bin center; adjacent bins
    # genuinely overlap, capping attainable hue accuracy.
    hue = ((hue_bin + 0.5) / _HUE_BINS + rng.gauss(0.0, _HUE_NOISE)) % 1.0
    size_frac = rng.uniform(0.03, 0.115)
    size_bin = sum(size_frac > e for e in _SIZE_EDGES)
    return {
        "hue_bin": hue_bin,
        "hue": hue,
        "count": rng.randint(0, _MAX_COUNT),
        "size_frac": size_frac,
        # The RENDERED size is jittered too, so sizes near a bin edge
        # are genuinely ambiguous from pixels.
        "render_size_frac": max(0.015, size_frac + rng.gauss(0.0, _SIZE_NOISE)),
        "size_bin": size_bin,
        "layout_seed": rng.randrange(1 << 30),
    }


def _hard_qa(attrs: Dict[str, object], rng: random.Random):
    kind = rng.choice(("hue", "count", "size"))
    pre = " ".join(rng.choice(_FILLER) for _ in range(rng.randint(0, 2)))
    if kind == "hue":
        text, ans, atype = (
            "what shade is the background", _HUE_NAMES[attrs["hue_bin"]],
            "other",
        )
    elif kind == "count":
        text, ans, atype = (
            "how many squares", str(attrs["count"]), "number"
        )
    else:
        text, ans, atype = (
            "what size are the squares", _SIZE_NAMES[attrs["size_bin"]],
            "other",
        )
    full = (pre + " " + text).strip() + "?"
    return full, ans, atype


def _hard_neighbor(answer: str, rng: random.Random) -> str:
    """A plausible annotator confusion for a hard-task answer: the
    adjacent hue bin / count / size class (disagreeing annotators pick
    neighbors, not arbitrary words — this is what spreads the soft
    targets onto the confusable classes). At class-range boundaries the
    step REFLECTS (0 -> 1, 8 -> 7, small -> medium) so edge classes get
    the same effective disagreement rate as interior ones — a clamp
    would silently return the main answer and raise edge-class
    agreement above the documented 0.75."""
    step = rng.choice((-1, 1))
    if answer.startswith("hue"):
        return _HUE_NAMES[(int(answer[3:]) + step) % _HUE_BINS]
    if answer.isdigit():
        n = int(answer) + step
        if n < 0 or n > _MAX_COUNT:
            n = int(answer) - step
        return str(n)
    if answer in _SIZE_NAMES:
        i = _SIZE_NAMES.index(answer) + step
        if i < 0 or i >= len(_SIZE_NAMES):
            i = _SIZE_NAMES.index(answer) - step
        return _SIZE_NAMES[i]
    return answer


def _learnable_qa(attrs: Dict[str, object], rng: random.Random):
    """One (question_text, answer, answer_type) for an image."""
    kind = rng.choice(("color", "count", "bright"))
    pre = " ".join(rng.choice(_FILLER) for _ in range(rng.randint(0, 2)))
    if kind == "color":
        text, ans, atype = "what color is it", attrs["color"], "other"
    elif kind == "count":
        text, ans, atype = "how many squares", str(attrs["count"]), "number"
    else:
        text, ans = "is it bright", ("yes" if attrs["bright"] else "no")
        atype = "yes/no"
    full = (pre + " " + text).strip() + "?"
    return full, ans, atype


def generate_vqa_split(
    n_questions: int,
    n_images: int,
    seed: int = 0,
    data_subtype: str = "train2014",
    learnable: "bool | str" = False,
    attr_seed: int = 0,
) -> Tuple[dict, dict, List[int]]:
    """Return (questions_json, annotations_json, image_ids).

    ``learnable=True`` ties each answer to the image's rendered
    attributes (see :func:`_image_attrs`; ``attr_seed`` must match the
    renderer's seed) so a model can actually learn the corpus; the
    default keeps answers random (byte-stable fixtures, prior-level
    accuracy by construction)."""
    rng = random.Random(seed)
    image_ids = [1000 + i for i in range(n_images)]
    questions, annotations = [], []
    for qid in range(n_questions):
        image_id = rng.choice(image_ids)
        if learnable == "hard":
            attrs = _hard_image_attrs(image_id, attr_seed)
            text, main_answer, _ = _hard_qa(attrs, rng)
            if text.endswith("size are the squares?") and attrs["count"] == 0:
                # no squares rendered: a size question has no evidence;
                # ask the (answerable) count question instead
                text, main_answer = "how many squares?", "0"
            conc = 0.75  # lower agreement: softer targets, lower ceiling
        elif learnable:
            # answer_type is re-derived from the answer below, same as
            # the random branch (colors -> other, digits -> number).
            text, main_answer, _ = _learnable_qa(
                _image_attrs(image_id, attr_seed), rng
            )
            conc = 0.9  # annotator agreement; the 0.3-coeff metric's soft
        else:           # targets stay non-degenerate either way
            n_words = rng.randint(3, 9)
            text = " ".join(
                rng.choice(_QUESTION_WORDS) for _ in range(n_words)
            ) + "?"
            main_answer, conc = rng.choice(_ANSWERS), 0.6
        questions.append(
            {"question_id": qid, "image_id": image_id, "question": text}
        )
        def _disagreement():
            if learnable == "hard":
                return _hard_neighbor(main_answer, rng)
            return rng.choice(_ANSWERS)

        answers = [
            {
                "answer": main_answer if rng.random() < conc
                else _disagreement(),
                "answer_confidence": "yes",
                "answer_id": k + 1,
            }
            for k in range(10)
        ]
        if main_answer in ("yes", "no"):
            answer_type = "yes/no"
        elif main_answer.isdigit():
            answer_type = "number"
        else:
            answer_type = "other"
        annotations.append(
            {
                "question_id": qid,
                "image_id": image_id,
                "multiple_choice_answer": main_answer,
                "answers": answers,
                "question_type": "none of the above",
                "answer_type": answer_type,
            }
        )
    questions_json = {
        "info": {}, "task_type": "Open-Ended", "data_type": "mscoco",
        "data_subtype": data_subtype, "license": {}, "questions": questions,
    }
    annotations_json = {
        "info": {}, "data_type": "mscoco", "data_subtype": data_subtype,
        "license": {}, "annotations": annotations,
    }
    return questions_json, annotations_json, image_ids


def generate_coco_images(
    image_dir: str,
    image_ids: List[int],
    size: Tuple[int, int] = (320, 240),
    seed: int = 0,
    data_subtype: str = "train2014",
    learnable: "bool | str" = False,
    central_fraction: float = 0.875,
) -> None:
    """Write random JPEGs with COCO filenames into ``image_dir``.

    ``learnable=True`` renders each image from its deterministic
    attributes (:func:`_image_attrs`): a color-tinted noisy background
    whose brightness encodes the yes/no answer, with ``count`` gray
    squares drawn on it — so the answers generated by
    :func:`generate_vqa_split` are recoverable from pixels."""
    from PIL import Image

    os.makedirs(image_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    w, h = size
    for img_id in image_ids:
        if learnable == "hard":
            import colorsys

            attrs = _hard_image_attrs(img_id, seed)
            base = np.array(
                colorsys.hsv_to_rgb(attrs["hue"], 0.65, 0.75),
                dtype=np.float32,
            ) * 255.0
            arr = base[None, None, :] + rng.normal(
                0.0, 26.0, size=(h, w, 3)
            )
            sq = max(4, int(round(attrs["render_size_frac"] * h)))
            # Keep every square inside the region that SURVIVES the
            # image pipeline's resize(short side -> size/central_fraction)
            # + center-crop (ref preprocess_images.py:10-11): the visible
            # source region is a central_fraction * min(h, w) square —
            # otherwise border squares are cropped out and the count
            # label stops being recoverable from the training pixels.
            vis = central_fraction * min(h, w)
            mx = max(1, int((w - vis) / 2) + 1)
            my = max(1, int((h - vis) / 2) + 1)
            lay = np.random.default_rng(attrs["layout_seed"])
            for _ in range(attrs["count"]):
                # random placement WITH possible overlap/abutment:
                # occlusion makes counting genuinely hard
                y0 = int(lay.integers(my, max(my + 1, h - my - sq)))
                x0 = int(lay.integers(mx, max(mx + 1, w - mx - sq)))
                arr[y0:y0 + sq, x0:x0 + sq] = float(lay.integers(110, 146))
            arr = np.clip(arr, 0, 255).astype(np.uint8)
        elif learnable:
            attrs = _image_attrs(img_id, seed)
            base = np.array(_COLOR_RGB[attrs["color"]], dtype=np.float32)
            scale = 1.0 if attrs["bright"] else 0.45
            arr = base * scale + rng.normal(0.0, 18.0, size=(h, w, 3))
            arr = np.clip(arr, 0, 255).astype(np.uint8)
            sq = max(8, h // 6)
            for k in range(attrs["count"]):
                y0 = (h // 5) * (1 + (k % 2)) + (k // 2) * sq // 2
                x0 = (w // 5) * (1 + k)
                arr[y0:y0 + sq, x0:x0 + sq] = 128  # mid-gray: visible on
                # every background color at either brightness
        else:
            arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        name = f"COCO_{data_subtype}_{img_id:012d}.jpg"
        Image.fromarray(arr).save(os.path.join(image_dir, name))


def make_synthetic_corpus(
    root: str,
    n_train: int = 64,
    n_val: int = 32,
    n_images: int = 12,
    image_size: int = 224,
    central_fraction: float = 0.875,
    max_answers: int = 20,
    seed: int = 0,
    learnable: "bool | str" = False,
) -> Dict[str, str]:
    """Build a complete miniature VQA corpus under ``root``.

    Produces the exact on-disk artifacts the entry points expect:
    question/annotation JSONs, image dirs, the h5 caches, and vocab.json.
    Returns a dict of paths laid out like a config 'profile' group.
    ``learnable=True`` makes answers a deterministic function of image
    pixels + question words (see :func:`generate_coco_images`) so
    training can converge; the default keeps the byte-stable random
    corpus existing fixtures depend on.
    """
    from dl_vqa_tpu.data import images as image_cache
    from dl_vqa_tpu.data import vocab as vocab_mod

    os.makedirs(root, exist_ok=True)
    profile = {
        "paths": {
            "pretrained_model_path": os.path.join(root, "model.ckpt"),
            "base_path": root,
            "logs": os.path.join(root, "logs/"),
            "vocab_path": os.path.join(root, "vocab.json"),
        },
        "train_paths": {
            "vqaDataset": os.path.join(root, "vqaDataset_train.npz"),
            "questions": "train_questions.json",
            "answers": "train_annotations.json",
            "imgs": "train2014",
            "processed_imgs": os.path.join(root, "processed_train_images.h5"),
        },
        "val_paths": {
            "vqaDataset": os.path.join(root, "vqaDataset_val.npz"),
            "questions": "val_questions.json",
            "answers": "val_annotations.json",
            "imgs": "val2014",
            "processed_imgs": os.path.join(root, "processed_val_images.h5"),
        },
    }

    for split, n_q, subtype in (
        ("train", n_train, "train2014"),
        ("val", n_val, "val2014"),
    ):
        qs, anns, image_ids = generate_vqa_split(
            n_q, n_images, seed=seed + (0 if split == "train" else 1),
            data_subtype=subtype, learnable=learnable, attr_seed=seed,
        )
        with open(os.path.join(root, f"{split}_questions.json"), "w") as fd:
            json.dump(qs, fd)
        with open(os.path.join(root, f"{split}_annotations.json"), "w") as fd:
            json.dump(anns, fd)
        generate_coco_images(
            os.path.join(root, subtype), image_ids,
            seed=seed, data_subtype=subtype, learnable=learnable,
            central_fraction=central_fraction,
        )
        image_cache.preprocess_images(
            other_paths=profile["paths"],
            data_paths=profile[f"{split}_paths"],
            image_size=image_size,
            central_fraction=central_fraction,
            processed_path=profile[f"{split}_paths"]["processed_imgs"],
            log=lambda *_: None,
            # PIL pinned: fixture bytes must not depend on whether the
            # native .so happens to be buildable on this machine (the
            # exact-transform test and cross-machine goldens rely on it).
            backend="pil",
        )

    vocab_mod.create_vocab(
        data_base_path=root,
        data_paths=profile["train_paths"],
        vocab_path=profile["paths"]["vocab_path"],
        max_answers=max_answers,
    )
    return profile


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(
        description="Generate a hermetic miniature VQA corpus."
    )
    parser.add_argument("root")
    parser.add_argument("--n-train", type=int, default=64)
    parser.add_argument("--n-val", type=int, default=32)
    parser.add_argument("--n-images", type=int, default=12)
    parser.add_argument("--image-size", type=int, default=224)
    parser.add_argument("--max-answers", type=int, default=20)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--learnable", nargs="?", const=True, default=False,
                        choices=[True, False, "hard"],
                        help="answers derivable from pixels + question "
                             "words (training can converge); pass "
                             "'--learnable hard' for the lower-ceiling "
                             "fine-grained task")
    args = parser.parse_args()
    profile = make_synthetic_corpus(
        args.root, n_train=args.n_train, n_val=args.n_val,
        n_images=args.n_images, image_size=args.image_size,
        max_answers=args.max_answers, seed=args.seed,
        learnable=args.learnable,
    )
    print(f"corpus at {args.root}: vocab={profile['paths']['vocab_path']}")
