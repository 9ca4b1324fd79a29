"""Host input pipeline: fixed-shape batches with device prefetch.

Replaces the reference's ``DataLoader(num_workers=5, pin_memory=True)``
(``/root/reference/main.py:122-132``) with a TPU-appropriate design:

* every batch has the SAME shape (the final partial batch is padded and
  carries a ``mask``), so the jitted step compiles once;
* images are gathered from the h5 cache per batch on the host (NHWC) —
  h5 reads for the next batch overlap device compute via a background
  prefetch thread;
* ``device_put`` with an explicit sharding lands each batch directly in
  its data-parallel layout (no gather-then-scatter).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator

import jax
import numpy as np

from dl_vqa_tpu.data.dataset import VQADataset

__all__ = ["Batcher", "prefetch_to_device"]


class Batcher:
    """Iterate fixed-shape numpy batches over a :class:`VQADataset`."""

    def __init__(
        self,
        dataset: VQADataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        load_images: bool = True,
        process_slice=None,
    ):
        """``batch_size`` is always the GLOBAL batch size. In multi-host
        runs each process constructs the same Batcher (same seed, so the
        shuffled order is identical everywhere) and passes its
        ``process_slice`` (from ``parallel.multihost.process_batch_slice``)
        to receive only its own contiguous row block of every global
        batch; ``prefetch_to_device`` then assembles the global array."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.load_images = load_images
        self.process_slice = process_slice
        self.seed = seed
        self._epoch = 0

    def __len__(self) -> int:
        return -(-len(self.dataset) // self.batch_size)  # ceil

    def epoch_order(self, epoch: int) -> np.ndarray:
        """The sample order for ``epoch``, derived STATELESSLY from
        ``(seed, epoch)`` — any epoch's order is reproducible in
        isolation, which is what makes mid-epoch crash recovery exact:
        a resumed run re-derives the interrupted epoch's order and skips
        the batches already consumed (``iter_epoch(epoch, start_batch)``)
        instead of replaying the RNG history that produced it. Multi-host
        runs stay in lockstep for the same reason (same seed, same
        epoch -> same order on every process)."""
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng([int(self.seed), int(epoch)]).shuffle(order)
        return order

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        epoch, self._epoch = self._epoch, self._epoch + 1
        return self.iter_epoch(epoch)

    def iter_epoch(
        self, epoch: int, start_batch: int = 0
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Iterate ``epoch``'s batches, skipping the first ``start_batch``
        (mid-epoch resume). Does not advance the ``__iter__`` counter."""
        n = len(self.dataset)
        order = self.epoch_order(epoch)
        bs = self.batch_size
        for start in range(start_batch * bs, n, bs):
            idx = order[start : start + bs]
            real = len(idx)
            if real < bs:  # pad final batch to the static shape
                idx = np.concatenate([idx, np.repeat(idx[-1], bs - real)])
            mask = np.arange(bs) < real
            if self.process_slice is not None:
                # Multi-host: yield only this process's rows of the
                # global batch (mask computed globally first, so padded
                # rows stay masked no matter which process holds them).
                idx = idx[self.process_slice]
                mask = mask[self.process_slice]
            batch = {
                "questions": self.dataset.questions[idx],
                "lengths": self.dataset.question_lengths[idx],
                "answer_indices": self.dataset.answer_indices[idx],
                "answer_values": self.dataset.answer_values[idx],
                "mask": mask,
                # sample indices (the reference's batch tuple carries the
                # index too, ref main.py 7-tuple); consumers may pop it.
                "indices": idx.astype(np.int32),
            }
            if hasattr(self.dataset, "answer_types"):
                batch["answer_types"] = self.dataset.answer_types[idx]
            if self.load_images:
                batch["images"] = self.dataset.load_images_nhwc(idx)
            elif getattr(self.dataset, "has_image_rows", False):
                # Device-resident image cache mode: ship only the h5 rows;
                # the step gathers images from the on-device table.
                batch["image_rows"] = self.dataset.h5_rows[idx].astype(
                    np.int32
                )
            yield self._finalize_batch(batch)

    def _finalize_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Subclass hook applied to every yielded batch (regardless of
        which iteration entry point produced it) — e.g. the online
        pipeline attaches freshly decoded JPEG images here."""
        return batch


def prefetch_to_device(
    iterator,
    sharding=None,
    depth: int = 2,
):
    """Wrap a host batch iterator with a background thread that stages
    ``depth`` batches ahead onto the device (double buffering by default).

    ``sharding`` may be a single sharding (applied to every array) or a
    dict keyed like the batch.
    """
    if depth < 1:
        for batch in iterator:
            yield _put(batch, sharding)
        return

    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()
    error_holder = []
    # Set when the consumer abandons the generator (e.g. the train step
    # raised mid-epoch): without it the producer would block forever on
    # the bounded q.put, pinning ``depth`` device-resident batches and
    # the thread — a real leak for multirun sweeps that run many trials
    # in one process.
    stop = threading.Event()

    def _put_or_stop(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in iterator:
                if not _put_or_stop(_put(batch, sharding)):
                    return
        except BaseException as e:  # propagate into the consumer
            error_holder.append(e)
        finally:
            _put_or_stop(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if error_holder:
                    raise error_holder[0]
                return
            yield item
    finally:
        stop.set()
        while True:  # drop any staged batches so the producer unblocks
            try:
                q.get_nowait()
            except queue.Empty:
                break


def _put(batch: Dict[str, np.ndarray], sharding) -> Dict:
    if sharding is None:
        return jax.device_put(batch)
    if isinstance(sharding, dict):
        return {k: _put_one(v, sharding.get(k)) for k, v in batch.items()}
    return {k: _put_one(v, sharding) for k, v in batch.items()}


def _put_one(value, sharding):
    if sharding is not None and not getattr(
        sharding, "is_fully_addressable", True
    ):
        # Multi-host: this process holds only its local rows (see
        # Batcher.process_slice); assemble the global array from every
        # process's contribution. device_put would require the full
        # global value on every host.
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(value)
        )
    return jax.device_put(value, sharding)
