"""ctypes bindings + dispatch loop for the native (C++) serving front.

``native/serve_front.cc`` moves the serving daemon's entire per-request
host path into C++ threads — HTTP accept/parse, JSON, base64, in-memory
JPEG decode + PIL-parity resize/crop, reference tokenization, bounded
queueing, batch coalescing, and response formatting. What remains in
Python is the one thing that must be Python: the JAX dispatch loop in
:class:`NativeFrontService`, which blocks in ``vqa_front_next_batch``
(ctypes releases the GIL around the call), runs ONE jitted forward per
batch, and hands the in-graph top-k back to C++.

The jitted forward takes the batch as **uint8** and normalizes on
device ((x/255 - mean)/std, the exact arithmetic of
``data.images.preprocess_pil_image``) — 4x fewer host->device bytes
than the Python front's pre-normalized float32 images — and returns
``lax.top_k`` of the softmax directly, so no [B, 3000] probability
matrix crosses back to the host.

Behavioral contract vs ``serve.BatchingService`` (tested in
tests/test_native_serve.py): same endpoints, same counter names, same
503/504/500 mapping, same bucket shapes. Documented deltas: JPEG-only
images (415 otherwise) and a static ``top_k`` cap (the in-graph top-k
width).

Build: ``make -C native`` -> ``native/libvqa_serve.so`` (built on
demand here, like :mod:`dl_vqa_tpu.data.native_loader`).
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = [
    "load_native_serve_library",
    "native_serve_available",
    "NativeFrontService",
]

_NATIVE_DIR = os.path.join(
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvqa_serve.so")
_lib = None


def load_native_serve_library(build_if_missing: bool = True):
    """Load (and optionally build) the serving front library. Returns the
    ctypes handle or None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True, capture_output=True, timeout=180,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    c = ctypes
    lib.vqa_front_start.argtypes = [
        c.c_char_p, c.c_int, c.c_int, c.c_double, c.c_int, c.c_int,
        c.c_int, c.c_int, c.c_int, c.c_double, c.c_int,
    ]
    lib.vqa_front_start.restype = c.c_int
    lib.vqa_front_port.restype = c.c_int
    lib.vqa_front_generation.restype = c.c_longlong
    lib.vqa_front_set_question_vocab.argtypes = [
        c.c_char_p, c.POINTER(c.c_int32), c.c_int,
    ]
    lib.vqa_front_set_question_vocab.restype = c.c_int
    lib.vqa_front_set_answers.argtypes = [c.c_char_p, c.c_int]
    lib.vqa_front_set_answers.restype = c.c_int
    lib.vqa_front_set_backend.argtypes = [c.c_char_p]
    lib.vqa_front_set_backend.restype = c.c_int
    lib.vqa_front_set_gauge.argtypes = [c.c_char_p, c.c_longlong]
    lib.vqa_front_set_gauge.restype = c.c_int
    lib.vqa_front_next_batch.argtypes = [
        c.c_longlong, c.POINTER(c.c_uint8), c.POINTER(c.c_int32),
        c.POINTER(c.c_int32), c.POINTER(c.c_int32), c.POINTER(c.c_int32),
        c.c_int,
    ]
    lib.vqa_front_next_batch.restype = c.c_longlong
    lib.vqa_front_complete.argtypes = [
        c.c_longlong, c.c_longlong, c.POINTER(c.c_int32),
        c.POINTER(c.c_float), c.c_int,
    ]
    lib.vqa_front_complete.restype = c.c_int
    lib.vqa_front_fail.argtypes = [c.c_longlong, c.c_longlong, c.c_char_p]
    lib.vqa_front_fail.restype = c.c_int
    lib.vqa_front_metrics_json.argtypes = [c.c_char_p, c.c_int]
    lib.vqa_front_tokenize.argtypes = [
        c.c_char_p, c.POINTER(c.c_int32), c.c_int,
    ]
    lib.vqa_front_tokenize.restype = c.c_int
    _lib = lib
    return lib


def native_serve_available() -> bool:
    return load_native_serve_library() is not None


def _i32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class NativeFrontService:
    """Owns one native front + the Python dispatch loop over a Predictor.

    One instance per process (the C++ side holds a process-global front);
    :meth:`stop` the previous instance before starting another.
    """

    def __init__(self, predictor, host: str = "127.0.0.1", port: int = 0,
                 max_batch: int = 64, batch_window_ms: float = 5.0,
                 max_queue: int = 0, request_timeout_s: float = 300.0,
                 topk_cap: int = 16, max_conns: int = 512):
        import jax

        self.lib = load_native_serve_library()
        if self.lib is None:
            raise RuntimeError(
                "native serving front unavailable; build with "
                "`make -C native`"
            )
        self.predictor = predictor
        self.max_batch = max_batch
        self.image_size = predictor.image_size
        self.max_question_length = predictor.max_question_length
        # The in-graph lax.top_k width can't exceed the answer vocab.
        self.topk_cap = min(topk_cap, predictor.model_cfg.max_answers)

        rc = self.lib.vqa_front_start(
            host.encode(), port, self.image_size,
            float(predictor.central_fraction), max_batch,
            int(batch_window_ms * 1000), max_queue,
            self.max_question_length, self.topk_cap,
            float(request_timeout_s), max_conns,
        )
        if rc != 0:
            detail = {
                2: f"cannot resolve host {host!r} (IPv4 only)",
                3: f"cannot bind {host}:{port} (port in use?)",
                4: "listen() failed",
                5: "another native front is still running in this "
                   "process; stop() it first",
            }.get(rc, "socket setup failed")
            raise RuntimeError(f"vqa_front_start failed (code {rc}): {detail}")
        # The C++ listener is live from here on: if the rest of setup
        # fails, stop it before propagating, or the orphan keeps the port
        # and blocks every retry with start code 5.
        try:
            self.port = int(self.lib.vqa_front_port())
            # Generation guard: every batch-side call names the front it
            # was built against, so a stale dispatch thread can never fill
            # buffers sized for a replaced front (C++ checks and refuses).
            self._gen = int(self.lib.vqa_front_generation())
            self._upload_vocab()
            self.lib.vqa_front_set_backend(jax.default_backend().encode())

            self._fwd = self._build_forward()
            self._stop = threading.Event()
            self._dispatch_thread: Optional[threading.Thread] = None

            # Reused handoff buffers (C++ copies into them in next_batch).
            self._images = np.zeros(
                (max_batch, self.image_size, self.image_size, 3),
                dtype=np.uint8,
            )
            self._questions = np.zeros(
                (max_batch, self.max_question_length), dtype=np.int32
            )
            self._lengths = np.ones(max_batch, dtype=np.int32)
            self._topks = np.zeros(max_batch, dtype=np.int32)
        except BaseException:
            self.lib.vqa_front_stop()
            raise

    # ------------------------------------------------------------- setup

    def _upload_vocab(self):
        p = self.predictor
        words = list(p.question_vocab.items())
        blob = "".join(w + "\n" for w, _ in words).encode()
        if b"\n" in b"".join(w.encode() for w, _ in words):
            raise ValueError("question vocab contains a newline")
        ids = np.asarray([i for _, i in words], dtype=np.int32)
        rc = self.lib.vqa_front_set_question_vocab(
            blob, _i32ptr(ids), len(words)
        )
        if rc != 0:
            raise RuntimeError(f"vqa_front_set_question_vocab failed ({rc})")

        # Answer line i corresponds to 1-based answer id i+1 (the decode
        # the Python front does via predictor.answer_by_id).
        n = p.model_cfg.max_answers
        answers = [p.answer_by_id.get(i + 1, "<unk>") for i in range(n)]
        if any("\n" in a for a in answers):
            raise ValueError("answer vocab contains a newline")
        rc = self.lib.vqa_front_set_answers(
            "".join(a + "\n" for a in answers).encode(), n
        )
        if rc != 0:
            raise RuntimeError(f"vqa_front_set_answers failed ({rc})")

    def _build_forward(self):
        import jax
        import jax.numpy as jnp

        from dl_vqa_tpu.data.images import IMAGENET_MEAN, IMAGENET_STD
        from dl_vqa_tpu.models import vqa

        p = self.predictor
        model_cfg = p.model_cfg
        dtype = p._compute_dtype
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        k = self.topk_cap

        def fwd(params, images_u8, questions, lengths):
            x = images_u8.astype(jnp.float32) / 255.0
            x = (x - mean) / std
            logits = vqa.apply(
                params, model_cfg, x, questions, lengths,
                train=False, compute_dtype=dtype,
            )
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            top_p, top_i = jax.lax.top_k(probs, k)
            # ONE output array: probs in [:, :k], indices BITCAST to f32
            # in [:, k:] (exact — they're small ints). Two outputs would
            # cost two device->host fetches per batch, and on a
            # relay-backed runtime each fetch is a ~30 ms round trip
            # (docs/PERF_NOTES.md gotchas) — measurable at low
            # concurrency where the fetch dominates the batch.
            idx_bits = jax.lax.bitcast_convert_type(
                top_i.astype(jnp.int32), jnp.float32
            )
            return jnp.concatenate([top_p, idx_bits], axis=1)

        return jax.jit(fwd)

    # ----------------------------------------------------------- dispatch

    def _bucket(self, n: int) -> int:
        size = 1
        while size < n:
            size *= 2
        return min(size, self.max_batch)

    def _run_forward(self, n: int):
        """Pad the first ``n`` handoff rows to the bucket shape and run
        the jitted forward -> (top_p, top_i) numpy [n, k]."""
        size = self._bucket(n)
        images = np.zeros(
            (size, self.image_size, self.image_size, 3), dtype=np.uint8
        )
        questions = np.zeros(
            (size, self.max_question_length), dtype=np.int32
        )
        lengths = np.ones(size, dtype=np.int32)
        images[:n] = self._images[:n]
        questions[:n] = self._questions[:n]
        lengths[:n] = self._lengths[:n]
        packed = np.asarray(self._fwd(
            self.predictor.params, images, questions, lengths
        ))  # [size, 2k] f32: one fetch (see _build_forward)
        k = self.topk_cap
        top_p = np.ascontiguousarray(packed[:n, :k])
        top_i = np.ascontiguousarray(packed[:n, k:]).view(np.int32)
        return top_p, top_i

    def _dispatch_loop(self):
        out_n = ctypes.c_int32(0)
        while not self._stop.is_set():
            batch_id = self.lib.vqa_front_next_batch(
                self._gen,
                self._images.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_uint8)
                ),
                _i32ptr(self._questions), _i32ptr(self._lengths),
                _i32ptr(self._topks), ctypes.byref(out_n), 500,
            )
            if batch_id == -2:
                return  # front stopped
            if batch_id < 0 or out_n.value == 0:
                continue
            try:
                top_p, top_i = self._run_forward(out_n.value)
                self.lib.vqa_front_complete(
                    self._gen, batch_id, _i32ptr(top_i),
                    top_p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    self.topk_cap,
                )
            except Exception as exc:  # noqa: BLE001 - report to clients
                self.lib.vqa_front_fail(
                    self._gen, batch_id,
                    f"{type(exc).__name__}: {exc}".encode(),
                )

    def start_dispatch(self):
        """Run the dispatch loop on a daemon thread (tests / library use;
        serve.py runs :meth:`dispatch_forever` in the foreground)."""
        self._dispatch_thread = threading.Thread(
            target=self._dispatch_loop, daemon=True
        )
        self._dispatch_thread.start()
        return self._dispatch_thread

    def dispatch_forever(self):
        self._dispatch_loop()

    # ------------------------------------------------------------- extras

    def warmup(self, block: bool = False):
        """Pre-compile every batch bucket ascending (XLA compiles per
        shape; through a relay runtime a cold bucket costs minutes —
        serve.BatchingService.warmup semantics, including the gauge)."""
        def run():
            size = 1
            warmed = 0
            while True:
                bucket = self._bucket(size)
                try:
                    images = np.zeros(
                        (bucket, self.image_size, self.image_size, 3),
                        dtype=np.uint8,
                    )
                    questions = np.zeros(
                        (bucket, self.max_question_length), dtype=np.int32
                    )
                    self._fwd(
                        self.predictor.params, images, questions,
                        np.ones(bucket, dtype=np.int32),
                    )
                except Exception:  # noqa: BLE001 - warmup must not die mute
                    import logging

                    logging.getLogger(__name__).exception(
                        "native-front warmup failed at bucket %d", bucket
                    )
                    return
                warmed += 1
                self.lib.vqa_front_set_gauge(b"warmed_buckets", warmed)
                if bucket == self.max_batch:
                    break
                size *= 2

        thread = threading.Thread(target=run, daemon=True)
        thread.start()
        if block:
            thread.join()
        return thread

    def metrics(self) -> dict:
        buf = ctypes.create_string_buffer(4096)
        self.lib.vqa_front_metrics_json(buf, len(buf))
        return json.loads(buf.value.decode())

    def tokenize(self, question: str) -> tuple:
        """Test hook: the C++ tokenizer's (ids, length) for one question."""
        ids = np.zeros(self.max_question_length, dtype=np.int32)
        n = self.lib.vqa_front_tokenize(
            question.encode(), _i32ptr(ids), self.max_question_length
        )
        if n < 0:
            raise RuntimeError(f"vqa_front_tokenize failed ({n})")
        return ids, n

    def stop(self):
        self._stop.set()
        self.lib.vqa_front_stop()
        if self._dispatch_thread is not None:
            self._dispatch_thread.join(timeout=5.0)
