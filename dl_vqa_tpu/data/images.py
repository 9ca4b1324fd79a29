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
    "normalize_uint8_chw",
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


def normalize_uint8_chw(u8_nhwc: np.ndarray) -> np.ndarray:
    """Vectorized tail of the reference transform: uint8 HWC (post
    resize+crop) -> float32 normalized CHW. Shared by both builder
    backends so they differ only in the decode/resample stage."""
    arr = u8_nhwc.astype(np.float32) / 255.0
    arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    return np.ascontiguousarray(arr.transpose(0, 3, 1, 2))


def preprocess_images(
    other_paths: dict,
    data_paths: dict,
    image_size: int,
    central_fraction: float,
    processed_path: str,
    log=print,
    backend: str = "auto",
    batch_size: int = 256,
    num_threads: int = 0,
) -> int:
    """Scan a COCO image dir and write the float16 h5 cache.

    Returns the number of images written. Opens the h5 file with an
    explicit ``'w'`` mode (the reference relied on a legacy h5py default,
    ref ``preprocess_images.py:39``).

    ``backend`` selects the decode/resample stage:

    * ``"native"`` — the C++ thread pool (``native/image_pipeline.cc``):
      batches of ``batch_size`` decoded/resized/cropped across
      ``num_threads`` threads (0 -> ``os.cpu_count()``), normalized
      vectorized, written as h5 slabs. This kills the reference's
      serial "couple of hours" build (ref ``README.md:14``). Numerics:
      within +-1 uint8 LSB of PIL pre-normalize (float vs fixed-point
      resampling taps), below the cache's own fp16 quantization.
    * ``"pil"`` — the original serial loop, byte-identical to the
      reference cache (torchvision-PIL arithmetic; the parity golden in
      ``tests/fixtures/image_transform_golden.npz`` pins it).
    * ``"auto"`` — native when the .so is available AND the host has
      >1 core; else PIL. Measured on the 1-core dev box: PIL 91
      images/s vs native 41 (PIL's SIMD libjpeg-turbo + fixed-point
      resampler wins single-threaded; the pool's win is parallelism) —
      see docs/PERF_NOTES.md "Offline cache builder".
    """
    import h5py
    from PIL import Image

    image_dir = os.path.join(other_paths["base_path"], data_paths["imgs"])
    filenames = list_jpgs(image_dir)
    n = len(filenames)

    if backend not in ("auto", "native", "pil"):
        raise ValueError(f"unknown builder backend: {backend!r}")
    use_native = False
    if backend == "auto" and (os.cpu_count() or 1) < 2:
        # Measured: PIL wins single-threaded. Decide BEFORE touching
        # native_available(), which may spend up to 120 s building the
        # .so only for the result to be discarded here.
        pass
    elif backend in ("auto", "native"):
        from dl_vqa_tpu.data import native_loader

        use_native = native_loader.native_available()
        if backend == "native" and not use_native:
            raise RuntimeError(
                "backend='native' requested but native/libvqa_image.so is "
                "unavailable (build with `make -C native`)"
            )
    log(f"Processing {n} images from {image_dir} "
        f"({'native thread pool' if use_native else 'PIL serial'})")

    with h5py.File(processed_path, "w", libver="latest") as fd:
        features = fd.create_dataset(
            "features", shape=(n, 3, image_size, image_size), dtype="float16"
        )
        ids = fd.create_dataset("ids", shape=(n,), dtype="int32")
        if use_native:
            from dl_vqa_tpu.data.native_loader import process_paths

            threads = num_threads or (os.cpu_count() or 1)
            for i0 in range(0, n, batch_size):
                slab = filenames[i0 : i0 + batch_size]
                u8 = process_paths(
                    [os.path.join(image_dir, f) for f in slab],
                    image_size, central_fraction, threads,
                )
                features[i0 : i0 + len(slab)] = normalize_uint8_chw(
                    u8
                ).astype(np.float16)
                ids[i0 : i0 + len(slab)] = [
                    coco_id_from_filename(f) for f in slab
                ]
                if (i0 // batch_size) % 4 == 0:
                    log(f"Completed {i0} images")
        else:
            for i, filename in enumerate(filenames):
                if i % 1000 == 0:
                    log(f"Completed {i} images")
                with Image.open(os.path.join(image_dir, filename)) as img:
                    features[i] = preprocess_pil_image(
                        img, image_size, central_fraction
                    ).astype(np.float16)
                ids[i] = coco_id_from_filename(filename)
    return n
