"""Online image pipeline: decode JPEGs on the fly instead of the h5 cache
(BASELINE config 2).

The reference pre-bakes every image into a float16 h5 file ("may take a
couple of hours", ref ``README.md:14``) and streams 300 KB/image of
float16 from disk. This pipeline instead:

* decodes + resizes + center-crops JPEGs on HOST THREADS (PIL, the exact
  arithmetic of the offline cache, so accuracy parity holds) into uint8;
* ships uint8 (150 KB/image — half the h5 bytes, 1/4 of fp32) to the
  device;
* normalizes (x/255 - mean)/std INSIDE the jitted step, fused by XLA
  into the first conv's input read (:func:`dl_vqa_tpu.models.vqa.apply`
  accepts uint8 images directly).

Decode of batch N+1 overlaps device compute of batch N via the standard
:func:`dl_vqa_tpu.data.pipeline.prefetch_to_device` wrapper.
"""

from __future__ import annotations

import concurrent.futures
import os
from typing import Dict

import numpy as np

from dl_vqa_tpu.data.dataset import VQADataset
from dl_vqa_tpu.data.images import (
    _center_crop,
    _resize_shorter_edge,
    coco_id_from_filename,
)
from dl_vqa_tpu.data.pipeline import Batcher

__all__ = ["JpegLoader", "OnlineBatcher"]


class JpegLoader:
    """Maps COCO image ids to JPEG files and decodes them to uint8
    [H, W, 3] with the reference resize/crop arithmetic."""

    def __init__(self, image_dir: str, image_size: int,
                 central_fraction: float, num_threads: int = 8):
        self.image_dir = image_dir
        self.image_size = image_size
        self.central_fraction = central_fraction
        self._path_by_id: Dict[int, str] = {}
        for fname in os.listdir(image_dir):
            if fname.endswith(".jpg"):
                img_id = coco_id_from_filename(fname)
                self._path_by_id[img_id] = os.path.join(image_dir, fname)
        self._pool = concurrent.futures.ThreadPoolExecutor(num_threads)

    def _decode_one(self, image_id: int) -> np.ndarray:
        from PIL import Image

        with Image.open(self._path_by_id[int(image_id)]) as img:
            img = img.convert("RGB")
            img = _resize_shorter_edge(
                img, int(self.image_size / self.central_fraction)
            )
            img = _center_crop(img, self.image_size)
            return np.asarray(img, dtype=np.uint8)  # HWC

    def load_batch(self, image_ids: np.ndarray) -> np.ndarray:
        """Decode a batch concurrently -> uint8 [B, H, W, 3]."""
        return np.stack(list(self._pool.map(self._decode_one, image_ids)))


class OnlineBatcher(Batcher):
    """A :class:`dl_vqa_tpu.data.pipeline.Batcher` whose images come from
    JPEGs (uint8 NHWC) instead of the h5 cache — shuffle/pad/mask
    semantics are inherited, only the image source differs."""

    def __init__(self, dataset: VQADataset, batch_size: int,
                 loader: JpegLoader, shuffle: bool = False, seed: int = 0,
                 process_slice=None):
        super().__init__(dataset, batch_size, shuffle=shuffle, seed=seed,
                         load_images=False, process_slice=process_slice)
        self.loader = loader

    def _finalize_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        batch["images"] = self.loader.load_batch(
            self.dataset.image_ids[batch.pop("indices")]
        )
        return batch
