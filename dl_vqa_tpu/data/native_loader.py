"""ctypes bindings for the native (C++) image pipeline.

Drop-in replacement for :class:`dl_vqa_tpu.data.online.JpegLoader` backed
by ``native/libvqa_image.so`` (libjpeg decode + PIL-compatible
triangle-filter resize + center crop, internal thread pool). Build with
``make -C native``; :func:`load_native_library` also builds on demand when
a toolchain is present.

Numerics: within +-1 uint8 LSB of the PIL path (PIL uses fixed-point
resampling coefficients; we use float) — below the fp16 quantization of
the offline cache, so accuracy parity is unaffected.

When to use: on multi-core hosts feeding a chip at >10k images/s, where
the C++ thread pool scales past Python-side orchestration. On this
dev box (1 core) PIL's bundled libjpeg-turbo is ~7% faster — measured,
which is why the PIL loader stays the default (``tpu.native_loader``
opts in).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict

import numpy as np

__all__ = [
    "load_native_library",
    "NativeJpegLoader",
    "native_available",
    "process_paths",
]

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvqa_image.so")
_lib = None


def load_native_library(build_if_missing: bool = True):
    """Load (and optionally build) the shared library. Returns the ctypes
    handle or None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.vqa_decode_one.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_double,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.vqa_decode_one.restype = ctypes.c_int
    lib.vqa_process_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    lib.vqa_process_batch.restype = ctypes.c_int
    try:
        # Per-image failure reporting (added after the first .so release);
        # a stale binary without it falls back to the serial-probe rescue.
        lib.vqa_process_batch_status.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.vqa_process_batch_status.restype = ctypes.c_int
    except AttributeError:
        pass
    _lib = lib
    return lib


def native_available() -> bool:
    return load_native_library() is not None


def process_paths(paths, image_size: int, central_fraction: float,
                  num_threads: int) -> np.ndarray:
    """Decode+resize+crop an explicit list of JPEG paths through the C++
    thread pool -> uint8 [n, size, size, 3] (HWC, pre-normalize), in input
    order. Raises if the library is unavailable or any image fails.

    This is the batch primitive the offline cache builder
    (:func:`dl_vqa_tpu.data.images.preprocess_images`) runs on; the
    id-keyed :class:`NativeJpegLoader` below serves the online path.
    """
    lib = load_native_library()
    if lib is None:
        raise RuntimeError(
            "native image library unavailable; build with `make -C native`"
        )
    n = len(paths)
    out = np.empty((n, image_size, image_size, 3), dtype=np.uint8)
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    status = None
    if hasattr(lib, "vqa_process_batch_status"):
        status = np.zeros(n, dtype=np.uint8)
        failures = lib.vqa_process_batch_status(
            arr, n, image_size, central_fraction,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            num_threads,
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
    else:  # stale .so without per-image status
        failures = lib.vqa_process_batch(
            arr, n, image_size, central_fraction,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            num_threads,
        )
    if failures:
        # libjpeg hard-fails on files PIL decodes (CMYK/Adobe-transform
        # JPEGs, PNGs with a .jpg name). Rescue the failed slots through
        # the PIL reference transform so the native path stays a true
        # drop-in — a real decode failure (corrupt file) still raises,
        # via PIL. With the status array only the failed slots are
        # touched; without it (stale .so) each slot must be probed with
        # the per-image entry point, a near-full serial re-decode.
        from PIL import Image

        from dl_vqa_tpu.data.images import _center_crop, _resize_shorter_edge

        if status is not None:
            failed = np.nonzero(status)[0].tolist()
        else:
            failed = [
                i for i, p in enumerate(paths)
                if lib.vqa_decode_one(
                    os.fsencode(p), image_size, central_fraction,
                    out[i].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ) != 0
            ]
        for i in failed:
            with Image.open(paths[i]) as img:  # raises on truly bad files
                img = img.convert("RGB")
                img = _resize_shorter_edge(
                    img, int(image_size / central_fraction)
                )
                img = _center_crop(img, image_size)
                out[i] = np.asarray(img, dtype=np.uint8)
    return out


class NativeJpegLoader:
    """Same interface as :class:`dl_vqa_tpu.data.online.JpegLoader`, but
    decode/resize/crop run in C++ threads."""

    def __init__(self, image_dir: str, image_size: int,
                 central_fraction: float, num_threads: int = 8):
        if load_native_library() is None:
            raise RuntimeError(
                "native image library unavailable; build with `make -C native`"
            )
        self.image_size = image_size
        self.central_fraction = central_fraction
        self.num_threads = num_threads
        from dl_vqa_tpu.data.images import coco_id_from_filename

        self._path_by_id: Dict[int, str] = {}
        for fname in os.listdir(image_dir):
            if fname.endswith(".jpg"):
                img_id = coco_id_from_filename(fname)
                self._path_by_id[img_id] = os.path.join(image_dir, fname)

    def load_batch(self, image_ids: np.ndarray) -> np.ndarray:
        return process_paths(
            [self._path_by_id[int(i)] for i in image_ids],
            self.image_size, self.central_fraction, self.num_threads,
        )
