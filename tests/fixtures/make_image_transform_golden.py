"""Generate golden fixtures for the reference image transform.

The reference preprocessing (``/root/reference/preprocessing/
preprocess_images.py:8-15``) is torchvision's
``Resize(int(size/0.875)) -> CenterCrop(size) -> ToTensor -> Normalize``
over PIL images. This script writes ``image_transform_golden.npz``:
deterministic RGB inputs (committed as raw arrays so JPEG-decoder drift
can't perturb the check) plus the expected float16 CHW outputs.

Run under an environment WITH torchvision to produce authoritative goldens.
Without torchvision it falls back to the exact PIL calls torchvision's PIL
backend makes (``PIL.Image.resize(..., BILINEAR)`` on the shorter edge,
``crop`` with the int(round((d - c)/2)) box, /255, mean/std normalize) —
these were verified equivalent under torchvision 0.15 before the fallback
was written, and the fallback is intentionally independent of
``dl_vqa_tpu.data.images`` so the test is not self-referential.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "image_transform_golden.npz")


def make_inputs():
    """Odd, non-square sizes in both orientations to exercise the
    shorter-edge choice and the center-crop rounding."""
    rng = np.random.default_rng(20260816)
    cases = {}
    for name, (h, w) in {
        "tall_97x64": (97, 64),
        "wide_64x97": (64, 97),
        "odd_101x83": (101, 83),
    }.items():
        yy, xx = np.mgrid[0:h, 0:w]
        smooth = np.stack(
            [
                127 + 100 * np.sin(yy / 9.0) * np.cos(xx / 7.0),
                127 + 100 * np.cos(yy / 5.0),
                (yy * 255.0 / h + xx * 31.0 / w) % 256,
            ],
            axis=-1,
        )
        noise = rng.integers(0, 40, (h, w, 3))
        cases[name] = np.clip(smooth + noise, 0, 255).astype(np.uint8)
    return cases


def torchvision_transform(rgb: np.ndarray, size: int) -> np.ndarray:
    import torchvision.transforms as T

    t = T.Compose(
        [
            T.Resize(int(size / 0.875)),
            T.CenterCrop(size),
            T.ToTensor(),
            T.Normalize(mean=MEAN.tolist(), std=STD.tolist()),
        ]
    )
    return t(Image.fromarray(rgb)).numpy().astype(np.float16)


def pil_equivalent_transform(rgb: np.ndarray, size: int) -> np.ndarray:
    img = Image.fromarray(rgb)
    target = int(size / 0.875)
    w, h = img.size
    if w <= h:
        new_w, new_h = target, int(target * h / w)
    else:
        new_w, new_h = int(target * w / h), target
    img = img.resize((new_w, new_h), Image.BILINEAR)
    w, h = img.size
    left = int(round((w - size) / 2.0))
    top = int(round((h - size) / 2.0))
    img = img.crop((left, top, left + size, top + size))
    arr = np.asarray(img, dtype=np.float32) / 255.0
    arr = (arr - MEAN) / STD
    return arr.transpose(2, 0, 1).astype(np.float16)


def main() -> None:
    try:
        import torchvision  # noqa: F401

        transform, source = torchvision_transform, "torchvision"
    except ImportError:
        transform, source = pil_equivalent_transform, "pil-equivalent"

    payload = {"__source__": np.frombuffer(source.encode(), dtype=np.uint8)}
    for name, rgb in make_inputs().items():
        payload[f"in_{name}"] = rgb
        for size in (32, 64):
            payload[f"out_{name}_{size}"] = transform(rgb, size)
    np.savez_compressed(OUT, **payload)
    print(f"wrote {OUT} (source: {source})")


if __name__ == "__main__":
    main()
