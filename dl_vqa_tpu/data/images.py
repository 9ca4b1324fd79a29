"""Offline image cache builder.

Byte-compatible with the reference's h5 cache
(``/root/reference/preprocessing/preprocess_images.py:8-53``):

* per image: decode -> RGB -> bilinear resize of the SHORTER edge to
  ``int(image_size / central_fraction)`` (224/0.875 -> 256) -> center crop
  ``image_size`` -> scale to [0,1] -> ImageNet mean/std normalize;
* stored as float16 in datasets ``features [N,3,H,W]`` (CHW, matching the
  reference layout so either framework can read the cache) and
  ``ids [N] int32`` (COCO id parsed from the filename tail).

The resize/crop arithmetic matches torchvision's PIL backend exactly
because we call PIL the same way torchvision does (shorter-edge resize
with BILINEAR, integer center-crop box).

The TPU-native online path (decode on host, normalize+layout on device)
lives in :mod:`dl_vqa_tpu.data.pipeline`; this cache is the parity path.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

__all__ = [
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "preprocess_pil_image",
    "preprocess_images",
    "coco_id_from_filename",
]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def _resize_shorter_edge(img, target: int):
    """Resize so the shorter edge equals ``target`` (torchvision
    ``Resize(int)`` semantics), bilinear."""
    from PIL import Image

    w, h = img.size
    if w <= h:
        new_w = target
        new_h = int(target * h / w)
    else:
        new_h = target
        new_w = int(target * w / h)
    return img.resize((new_w, new_h), Image.BILINEAR)


def _center_crop(img, size: int):
    """Center crop to size x size (torchvision ``CenterCrop`` box math)."""
    w, h = img.size
    left = int(round((w - size) / 2.0))
    top = int(round((h - size) / 2.0))
    return img.crop((left, top, left + size, top + size))


def preprocess_pil_image(img, image_size: int, central_fraction: float) -> np.ndarray:
    """Full reference transform for one PIL image -> float32 CHW array."""
    img = img.convert("RGB")
    img = _resize_shorter_edge(img, int(image_size / central_fraction))
    img = _center_crop(img, image_size)
    arr = np.asarray(img, dtype=np.float32) / 255.0          # HWC in [0,1]
    arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    return arr.transpose(2, 0, 1)                             # CHW


def coco_id_from_filename(filename: str) -> int:
    """COCO id from e.g. ``COCO_train2014_000000000123.jpg`` -> 123
    (ref ``preprocess_images.py:47-48``)."""
    return int(filename.split("_")[-1].split(".")[0])


def list_jpgs(image_dir: str) -> List[str]:
    return [f for f in os.listdir(image_dir) if f.endswith(".jpg")]


def preprocess_images(
    other_paths: dict,
    data_paths: dict,
    image_size: int,
    central_fraction: float,
    processed_path: str,
    log=print,
) -> int:
    """Scan a COCO image dir and write the float16 h5 cache.

    Returns the number of images written. Opens the h5 file with an
    explicit ``'w'`` mode (the reference relied on a legacy h5py default,
    ref ``preprocess_images.py:39``).
    """
    import h5py
    from PIL import Image

    image_dir = os.path.join(other_paths["base_path"], data_paths["imgs"])
    filenames = list_jpgs(image_dir)
    n = len(filenames)
    log(f"Processing {n} images from {image_dir}")

    with h5py.File(processed_path, "w", libver="latest") as fd:
        features = fd.create_dataset(
            "features", shape=(n, 3, image_size, image_size), dtype="float16"
        )
        ids = fd.create_dataset("ids", shape=(n,), dtype="int32")
        for i, filename in enumerate(filenames):
            if i % 1000 == 0:
                log(f"Completed {i} images")
            with Image.open(os.path.join(image_dir, filename)) as img:
                features[i] = preprocess_pil_image(
                    img, image_size, central_fraction
                ).astype(np.float16)
            ids[i] = coco_id_from_filename(filename)
    return n
