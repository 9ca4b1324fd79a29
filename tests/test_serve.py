"""Serving daemon: HTTP batch inference, request coalescing, metrics."""

import base64
import json
import os
import threading
import time
import urllib.request

import pytest

import jax

from dl_vqa_tpu.data import synthetic
from dl_vqa_tpu.data.dataset import VQADataset


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from dl_vqa_tpu import config as config_mod
    from dl_vqa_tpu.models import ModelConfig, vqa
    from dl_vqa_tpu.utils import checkpoint as ckpt
    import serve

    root = tmp_path_factory.mktemp("serve")
    profile = synthetic.make_synthetic_corpus(
        str(root / "data"), n_train=24, n_val=12, n_images=5, image_size=32,
        max_answers=12,
    )
    overrides = [
        "main.use_full=false",
        "train.max_answers=12",
        "train.image_size=32",
        "train.text.question_features=16",
        "train.text.embedding_features=8",
        "train.image.num_channels=[3, 4, 6]",
        "train.attention.hidden_dim=12",
        "train.classifier.hidden_dim=16",
        "tpu.compute_dtype=float32",
        f"main.small.paths.vocab_path={profile['paths']['vocab_path']}",
        f"main.small.paths.pretrained_model_path={root}/model.ckpt",
    ]
    cfg = config_mod.compose("config_eval", overrides=overrides)
    ds = VQADataset(
        data_paths=profile["val_paths"], other_paths=profile["paths"]
    )
    model_cfg = ModelConfig.from_cfg(cfg["train"], ds.num_tokens)
    params = vqa.init(jax.random.PRNGKey(0), model_cfg)
    ckpt.save_checkpoint(str(root / "model.ckpt"), params,
                         model_cfg=model_cfg)

    httpd, service = serve.build_server(cfg, port=0, max_batch=8,
                                        batch_window_ms=30.0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"

    img_dir = os.path.join(profile["paths"]["base_path"], "val2014")
    jpeg = os.path.join(img_dir, sorted(os.listdir(img_dir))[0])
    with open(jpeg, "rb") as fd:
        image_b64 = base64.b64encode(fd.read()).decode()

    yield base, image_b64, service
    service.stop()
    httpd.shutdown()


def _post(base, path, payload):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


def test_healthz(server):
    base, _, _ = server
    with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
        payload = json.loads(resp.read())
    assert resp.status == 200 and payload["status"] == "ok"
    assert payload["backend"] == jax.default_backend()


def test_answer_endpoint(server):
    base, image_b64, _ = server
    status, payload = _post(base, "/v1/answer", {
        "image_b64": image_b64,
        "question": "what color is the cat?",
        "top_k": 3,
    })
    assert status == 200
    answers = payload["answers"]
    assert len(answers) == 3
    assert all(isinstance(a, str) and 0.0 <= p <= 1.0 for a, p in answers)
    probs = [p for _, p in answers]
    assert sorted(probs, reverse=True) == probs


def test_concurrent_requests_coalesce(server):
    base, image_b64, service = server
    before = service.metrics()
    results = [None] * 6

    def fire(i):
        results[i] = _post(base, "/v1/answer", {
            "image_b64": image_b64,
            "question": f"how many cats {i}?",
        })

    threads = [threading.Thread(target=fire, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(status == 200 for status, _ in results)
    after = service.metrics()
    new_requests = after["requests"] - before["requests"]
    new_batches = after["batches"] - before["batches"]
    assert new_requests == 6
    # Coalescing: 6 concurrent requests ran in fewer than 6 batches.
    assert new_batches < 6
    assert "latency_p50_ms" in after and "latency_p99_ms" in after


def test_bad_request_and_unknown_route(server):
    base, image_b64, _ = server
    status, payload = _post(base, "/v1/answer", {"question": "no image?"})
    assert status == 400 and "error" in payload
    status, _ = _post(base, "/nope", {})
    assert status == 404


def test_bucket_clamps_to_max_batch_and_stop_terminates():
    """A non-power-of-two --max-batch must never pad PAST the cap, and
    stop() must terminate an idle batcher thread (it polls the queue)."""
    import serve

    service = serve.BatchingService(predictor=None, max_batch=48,
                                    batch_window_ms=1.0)
    try:
        assert service._bucket(5) == 8
        assert service._bucket(33) == 48   # clamped, not 64
        assert service._bucket(48) == 48
    finally:
        service.stop()
    service.thread.join(timeout=2.0)
    assert not service.thread.is_alive()


def test_bounded_queue_backpressure():
    """When the bounded queue is full, submit raises ServiceOverloaded
    (HTTP 503), the 'rejected' counter increments, and accepted requests
    still complete once the batcher drains."""
    import numpy as np

    import serve

    class _BlockingPredictor:
        """Stalls the batcher so the queue actually fills."""

        max_question_length = 4

        def __init__(self):
            self.release = threading.Event()

        def encode_questions(self, qs):
            return (np.zeros((len(qs), 4), np.int32),
                    np.ones(len(qs), np.int32))

        def forward_probs(self, images, questions, lengths):
            self.release.wait(10.0)
            return np.full((len(images), 3), 1 / 3, np.float32)

        def top_k_from_probs(self, probs, k):
            return [["yes", 0.33]]

    pred = _BlockingPredictor()
    service = serve.BatchingService(pred, max_batch=1, batch_window_ms=0.0,
                                    max_queue=2)
    img = np.zeros((4, 4, 3), np.float32)
    results, errors = [], []

    def fire():
        try:
            results.append(service.submit(img, "q", 1, timeout_s=15.0))
        except serve.ServiceOverloaded as exc:
            errors.append(exc)

    try:
        # First submit is picked up by the batcher (and blocks in
        # forward_probs); then fill the 2-slot queue, then overflow it.
        threads = [threading.Thread(target=fire) for _ in range(5)]
        for t in threads:
            t.start()
            time.sleep(0.15)  # let the batcher drain deterministically
        overflow = [t for t in threads if t.is_alive()]
        assert len(errors) >= 1, "expected at least one overload rejection"
        pred.release.set()
        for t in threads:
            t.join(timeout=15.0)
        assert service.metrics()["rejected"] == len(errors)
        assert len(results) == 5 - len(errors)
        assert overflow is not None  # silence lint; timing documented above
    finally:
        pred.release.set()
        service.stop()


def test_warmup_compiles_every_bucket():
    """warmup() sweeps every batch bucket ascending (incl. a clamped
    non-power-of-two max) so no real request pays XLA compilation."""
    import numpy as np

    import serve

    calls = []

    class _CountingPredictor:
        image_size = 8
        max_question_length = 5

        def encode_questions(self, qs):
            return (np.zeros((len(qs), 5), np.int32),
                    np.ones(len(qs), np.int32))

        def forward_probs(self, images, questions, lengths):
            calls.append(images.shape)
            return np.full((len(images), 3), 1 / 3, np.float32)

        def top_k_from_probs(self, probs, k):
            return [["yes", 0.33]]

    service = serve.BatchingService(_CountingPredictor(), max_batch=48)
    try:
        # The key must exist (as 0) even before any warmup completes, so
        # monitoring consumers see a stable /metrics schema.
        assert service.metrics()["warmed_buckets"] == 0
        service.warmup(block=True)
    finally:
        service.stop()
    assert [c[0] for c in calls] == [1, 2, 4, 8, 16, 32, 48]
    assert all(c[1:] == (8, 8, 3) for c in calls)
    assert service.metrics()["warmed_buckets"] == 7


def test_int8_mode_requires_and_uses_calibration(tmp_path_factory):
    """train.image.store_dtype=int8: build_server refuses to start without
    --int8-calibration-dir (static scales are required before the first
    compile), and with one it calibrates at startup and serves answers."""
    from dl_vqa_tpu import config as config_mod
    from dl_vqa_tpu.models import ModelConfig, vqa
    from dl_vqa_tpu.utils import checkpoint as ckpt
    import serve

    root = tmp_path_factory.mktemp("serve_int8")
    profile = synthetic.make_synthetic_corpus(
        str(root / "data"), n_train=12, n_val=6, n_images=4, image_size=32,
        max_answers=12,
    )
    overrides = [
        "main.use_full=false",
        "train.max_answers=12",
        "train.image_size=32",
        "train.text.question_features=16",
        "train.text.embedding_features=8",
        "train.image.num_channels=[3, 4, 6]",
        "train.attention.hidden_dim=12",
        "train.classifier.hidden_dim=16",
        "train.image.store_dtype=int8",
        "tpu.compute_dtype=float32",
        f"main.small.paths.vocab_path={profile['paths']['vocab_path']}",
        f"main.small.paths.pretrained_model_path={root}/model.ckpt",
    ]
    cfg = config_mod.compose("config_eval", overrides=overrides)
    ds = VQADataset(
        data_paths=profile["val_paths"], other_paths=profile["paths"]
    )
    model_cfg = ModelConfig.from_cfg(cfg["train"], ds.num_tokens)
    # Checkpoints are trained/saved in the parity dtype; int8 is a
    # serving-time mode, so the saved model_cfg stays 'compute'.
    import dataclasses
    ckpt_cfg = dataclasses.replace(
        model_cfg,
        image=dataclasses.replace(model_cfg.image, store_dtype="compute"),
    )
    params = vqa.init(jax.random.PRNGKey(0), ckpt_cfg)
    ckpt.save_checkpoint(str(root / "model.ckpt"), params,
                         model_cfg=ckpt_cfg)

    with pytest.raises(SystemExit, match="int8-calibration-dir"):
        serve.build_server(cfg, port=0)

    img_dir = os.path.join(profile["paths"]["base_path"], "val2014")
    httpd, service = serve.build_server(
        cfg, port=0, max_batch=4, batch_window_ms=10.0,
        int8_calibration_dir=img_dir,
    )
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        jpeg = os.path.join(img_dir, sorted(os.listdir(img_dir))[0])
        with open(jpeg, "rb") as fd:
            image_b64 = base64.b64encode(fd.read()).decode()
        status, body = _post(base, "/v1/answer", {
            "image_b64": image_b64, "question": "what color is the cat?",
            "top_k": 2,
        })
        assert status == 200 and len(body["answers"]) == 2
    finally:
        service.stop()
        httpd.shutdown()
