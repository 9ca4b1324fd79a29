"""Native (C++) serving front: HTTP surface, batching, tokenizer parity.

Covers native/serve_front.cc + dl_vqa_tpu/utils/native_front.py against
the behavioral contract of the Python front (serve.BatchingService):
same endpoints, same answers as predict.Predictor, same counter names,
same 503/504 mapping. The C++ tokenizer is compared token-for-token
against predict.Predictor.encode_questions.

Skips when no native toolchain is available (the .so builds on demand).
"""

import base64
import json
import os
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax

from dl_vqa_tpu.data import synthetic
from dl_vqa_tpu.data.dataset import VQADataset
from dl_vqa_tpu.utils.native_front import native_serve_available

pytestmark = pytest.mark.skipif(
    not native_serve_available(),
    reason="native serving front unavailable (no toolchain)",
)


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    """(base_url, image_b64, service, predictor) on a live native front."""
    from dl_vqa_tpu import config as config_mod
    from dl_vqa_tpu.models import ModelConfig, vqa
    from dl_vqa_tpu.utils import checkpoint as ckpt
    from predict import Predictor
    import serve

    root = tmp_path_factory.mktemp("native_serve")
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
    ckpt.save_checkpoint(
        str(root / "model.ckpt"), params, model_cfg=model_cfg,
        extra_meta={"max_question_length": int(ds.max_question_length)},
    )

    service = serve.build_native_server(cfg, port=0, max_batch=8,
                                        batch_window_ms=30.0)
    service.start_dispatch()
    service.warmup(block=True)
    base = f"http://127.0.0.1:{service.port}"

    predictor = Predictor(
        cfg, checkpoint_path=str(root / "model.ckpt"),
        vocab_path=profile["paths"]["vocab_path"],
    )

    img_dir = os.path.join(profile["paths"]["base_path"], "val2014")
    jpeg = os.path.join(img_dir, sorted(os.listdir(img_dir))[0])
    with open(jpeg, "rb") as fd:
        jpeg_bytes = fd.read()
    image_b64 = base64.b64encode(jpeg_bytes).decode()

    yield base, image_b64, service, predictor, jpeg
    service.stop()


def _post(base, path, payload, timeout=60):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


def test_healthz_reports_native_front(stack):
    base = stack[0]
    with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
        payload = json.loads(resp.read())
    assert resp.status == 200 and payload["status"] == "ok"
    assert payload["backend"] == jax.default_backend()
    assert payload["front"] == "native"


def test_answer_matches_python_predictor(stack):
    """The full native path (JSON -> base64 -> C++ JPEG decode ->
    C++ tokenizer -> u8 in-graph normalize -> top-k) returns the same
    ranking as the Python Predictor path, with probabilities within
    decode-roundoff (the C++ resize is within +-1 u8 LSB of PIL)."""
    base, image_b64, _, predictor, jpeg = stack
    question = "what color is it?"
    status, payload = _post(base, "/v1/answer", {
        "image_b64": image_b64, "question": question, "top_k": 3,
    })
    assert status == 200, payload
    got = payload["answers"]
    assert len(got) == 3

    from PIL import Image

    with Image.open(jpeg) as img:
        image = predictor.preprocess_image(img)
    encoded, lengths = predictor.encode_questions([question])
    probs = predictor.forward_probs(image[None], encoded, lengths)
    want = predictor.top_k_from_probs(probs[0], 3)
    assert [a for a, _ in got] == [a for a, _ in want]
    np.testing.assert_allclose(
        [p for _, p in got], [p for _, p in want], atol=5e-3
    )


def test_concurrent_requests_coalesce(stack):
    base, image_b64, service, _, _ = stack
    before = service.metrics()
    n = 12
    statuses = []
    lock = threading.Lock()

    def one():
        status, _ = _post(base, "/v1/answer", {
            "image_b64": image_b64, "question": "what is this?",
        })
        with lock:
            statuses.append(status)

    threads = [threading.Thread(target=one) for _ in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert statuses == [200] * n
    after = service.metrics()
    assert after["batched_requests"] - before["batched_requests"] == n
    # Coalescing: the 30 ms window must have packed some requests
    # together (far fewer batches than requests).
    assert after["batches"] - before["batches"] < n


def test_bad_requests(stack):
    base, image_b64, _, _, _ = stack
    # non-string question
    assert _post(base, "/v1/answer",
                 {"question": 5, "image_b64": image_b64})[0] == 400
    # missing image
    assert _post(base, "/v1/answer", {"question": "hi?"})[0] == 400
    # invalid base64 (lone trailing character)
    assert _post(base, "/v1/answer",
                 {"question": "hi?", "image_b64": "x"})[0] == 400
    # valid base64, not a JPEG -> 415 (documented native-front delta)
    assert _post(base, "/v1/answer",
                 {"question": "hi?", "image_b64": "aGVsbG8="})[0] == 415
    # truncated JPEG body -> decode failure
    assert _post(base, "/v1/answer",
                 {"question": "hi?",
                  "image_b64": base64.b64encode(b"\xff\xd8\xff").decode()}
                 )[0] == 400
    # top_k below 1 / above the in-graph cap
    assert _post(base, "/v1/answer",
                 {"question": "hi?", "image_b64": image_b64,
                  "top_k": 0})[0] == 400
    assert _post(base, "/v1/answer",
                 {"question": "hi?", "image_b64": image_b64,
                  "top_k": 999})[0] == 400
    # top_k far outside int range: must 400, not hit UB double->int
    assert _post(base, "/v1/answer",
                 {"question": "hi?", "image_b64": image_b64,
                  "top_k": 1e300})[0] == 400
    # unknown routes
    assert _post(base, "/v1/other", {"question": "hi?"})[0] == 404
    try:
        urllib.request.urlopen(base + "/nope", timeout=30)
        assert False, "expected 404"
    except urllib.error.HTTPError as err:
        assert err.code == 404
    # malformed JSON body
    req = urllib.request.Request(
        base + "/v1/answer", data=b"{not json",
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 400"
    except urllib.error.HTTPError as err:
        assert err.code == 400


def test_unicode_question_and_escapes(stack):
    """JSON \\u escapes and UTF-8 bodies decode; unknown words map to
    id 0 on both paths, so the request still answers."""
    base, image_b64, _, _, _ = stack
    status, payload = _post(base, "/v1/answer", {
        "image_b64": image_b64,
        "question": "what éléphant \"quoted\"\tis this?",
    })
    assert status == 200 and payload["answers"]


def test_tokenizer_matches_python(stack):
    """C++ tokenizer == Predictor.encode_questions, token for token."""
    _, _, service, predictor, _ = stack
    cases = [
        "what color is it?",
        "What Color IS it?",          # ASCII lowering
        "no question mark",            # '?' appended
        "",                            # empty -> [''] -> id 0, length 1
        "a  b ?",                      # split on SINGLE spaces: '' tokens
        "zzz unknownword here?",       # OOV -> 0
        "trailing space ?",
        " leading?",
        "one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen fifteen sixteen seventeen?",  # clamps to max_len
    ]
    for q in cases:
        ids_c, n_c = service.tokenize(q)
        encoded, lengths = predictor.encode_questions([q])
        assert list(ids_c) == list(encoded[0]), q
        assert n_c == int(lengths[0]), q


def test_metrics_names_match_python_front(stack):
    base, _, service, _, _ = stack
    with urllib.request.urlopen(base + "/metrics", timeout=30) as resp:
        m = json.loads(resp.read())
    # Counter names are the BatchingService.stats contract.
    for key in ("requests", "batches", "batched_requests", "errors",
                "timeouts", "rejected", "mean_batch_size",
                "warmed_buckets"):
        assert key in m, key
    assert m["front"] == "native"
    assert m["warmed_buckets"] == 4  # buckets 1, 2, 4, 8
    assert m == service.metrics()


def test_decompression_bomb_rejected(stack):
    """A tiny JPEG whose SOF header declares 65535x65535 (a ~13 GB
    decode) must be refused at the header (400), never allocated —
    parity with PIL's DecompressionBombError on the Python front."""
    base, _, _, _, jpeg = stack
    with open(jpeg, "rb") as fd:
        data = bytearray(fd.read())
    # Patch the SOF0 frame header: FF C0 <len:2> <precision:1> <h:2> <w:2>.
    sof = data.find(b"\xff\xc0")
    assert sof > 0, "fixture JPEG has no baseline SOF0 marker"
    data[sof + 5:sof + 9] = b"\xff\xff\xff\xff"
    status, payload = _post(base, "/v1/answer", {
        "image_b64": base64.b64encode(bytes(data)).decode(),
        "question": "what is this?",
    })
    assert status == 400
    assert "decode failed" in payload["error"]


def test_vocab_is_write_once(stack):
    """Connection threads read the vocab lock-free, so the C++ side must
    refuse a re-upload on a live front instead of racing them."""
    service = stack[2]
    with pytest.raises(RuntimeError, match="set_question_vocab"):
        service._upload_vocab()


def test_dispatch_error_maps_to_500(stack):
    """A dispatch-side failure must 500 every request of the batch and
    count it in `errors` (serve.BatchingService parity)."""
    base, image_b64, service, _, _ = stack
    good = service._fwd
    try:
        def boom(*_a, **_k):
            raise RuntimeError("injected dispatch failure")

        service._fwd = boom
        status, payload = _post(base, "/v1/answer", {
            "image_b64": image_b64, "question": "what is this?",
        })
        assert status == 500
        assert "injected dispatch failure" in payload["error"]
        assert service.metrics()["errors"] >= 1
    finally:
        service._fwd = good


# Defined last: stops the shared front and starts a fresh one (the C++
# side holds one front per process and refuses to orphan a live one).
def test_backpressure_and_timeout(stack, tmp_path):
    base, image_b64, service, predictor, _ = stack
    service.stop()

    from dl_vqa_tpu.utils.native_front import NativeFrontService

    # No dispatch loop: requests can only queue (then time out) or be
    # rejected once the 2-deep queue fills.
    svc = NativeFrontService(
        predictor, port=0, max_batch=2, batch_window_ms=1.0,
        max_queue=2, request_timeout_s=1.5,
    )
    try:
        base2 = f"http://127.0.0.1:{svc.port}"
        statuses = []
        lock = threading.Lock()

        def one():
            status, _ = _post(base2, "/v1/answer", {
                "image_b64": image_b64, "question": "what is this?",
            }, timeout=30)
            with lock:
                statuses.append(status)

        threads = [threading.Thread(target=one) for _ in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        # Exactly 2 queue slots -> 2 requests time out (504); the other
        # 4 get an immediate 503 (modulo scheduling, at least one each).
        assert set(statuses) <= {503, 504}, statuses
        assert statuses.count(504) == 2, statuses
        assert statuses.count(503) == 4, statuses
        m = svc.metrics()
        assert m["timeouts"] == 2 and m["rejected"] == 4, m
    finally:
        svc.stop()


def test_init_failure_stops_the_listener(stack, monkeypatch):
    """If __init__ fails AFTER the C++ listener started (e.g. the jit
    build raises), the front must be stopped on the way out — otherwise
    the orphan holds the process slot and every retry fails with start
    code 5. Runs after the shared front is stopped (previous test)."""
    from dl_vqa_tpu.utils.native_front import NativeFrontService

    predictor = stack[3]
    monkeypatch.setattr(
        NativeFrontService, "_build_forward",
        lambda self: (_ for _ in ()).throw(RuntimeError("jit build boom")),
    )
    with pytest.raises(RuntimeError, match="jit build boom"):
        NativeFrontService(predictor, port=0)
    monkeypatch.undo()

    # The failed constructor must not have orphaned a live front.
    svc = NativeFrontService(predictor, port=0)
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{svc.port}/healthz", timeout=30
        ) as resp:
            assert resp.status == 200
    finally:
        svc.stop()


def test_hostname_resolution(stack):
    """--host localhost must work like it does on the Python front
    (getaddrinfo fallback), and a bad host must name the real problem."""
    from dl_vqa_tpu.utils.native_front import NativeFrontService

    predictor = stack[3]
    svc = NativeFrontService(predictor, host="localhost", port=0)
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{svc.port}/healthz", timeout=30
        ) as resp:
            assert resp.status == 200
    finally:
        svc.stop()

    with pytest.raises(RuntimeError, match="cannot resolve host"):
        NativeFrontService(predictor, host="no.such.host.invalid", port=0)
