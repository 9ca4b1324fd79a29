"""Load-test the serving daemon over loopback (docs/SERVING.md).

Drives `serve.py`'s HTTP stack (real ThreadingHTTPServer, real handler
decode path, real batcher) with concurrent closed-loop clients and
reports, per concurrency level: achieved QPS, mean coalesced batch
size, latency p50/p99, and error/timeout/503 counts. This bounds the
daemon's saturation behavior on this host — the single host core serves
HTTP, decodes JPEGs, AND feeds the device, so these numbers are a lower
bound for a production host (caveat recorded in SERVING.md).

Usage: python experiments/probe_serve_load.py [--seconds 10]
       [--levels 1,4,16,64] [--max-batch 32] [--window-ms 2]
"""

import argparse
import base64
import json
import os
import statistics
import sys
import threading
import time
import urllib.error
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(tmp_root: str, max_batch: int, window_ms: float,
          native: bool = False):
    import jax

    from dl_vqa_tpu import config as config_mod
    from dl_vqa_tpu.data import synthetic
    from dl_vqa_tpu.data.dataset import VQADataset
    from dl_vqa_tpu.models import ModelConfig, vqa
    from dl_vqa_tpu.utils import checkpoint as ckpt
    import serve

    data = os.path.join(tmp_root, "data")
    # Deterministic (seed=0) and tiny — cheap to (re)build every run.
    profile = synthetic.make_synthetic_corpus(
        data, n_train=24, n_val=12, n_images=5, image_size=64,
        max_answers=12,
    )
    overrides = [
        "main.use_full=false",
        "train.max_answers=12",
        "train.image_size=64",
        "train.text.question_features=16",
        "train.text.embedding_features=8",
        "train.image.num_channels=[3, 4, 6]",
        "train.attention.hidden_dim=12",
        "train.classifier.hidden_dim=16",
        f"main.small.paths.vocab_path={profile['paths']['vocab_path']}",
        f"main.small.paths.pretrained_model_path={tmp_root}/model.ckpt",
    ]
    cfg = config_mod.compose("config_eval", overrides=overrides)
    if not os.path.exists(os.path.join(tmp_root, "model.ckpt")):
        ds = VQADataset(
            data_paths=profile["val_paths"], other_paths=profile["paths"]
        )
        model_cfg = ModelConfig.from_cfg(cfg["train"], ds.num_tokens)
        params = vqa.init(jax.random.PRNGKey(0), model_cfg)
        ckpt.save_checkpoint(os.path.join(tmp_root, "model.ckpt"), params,
                             model_cfg=model_cfg,
                             extra_meta={"max_question_length":
                                         int(ds.max_question_length)})

    if native:
        # C++ front (serve.py --native-front): HTTP/JSON/base64/decode/
        # tokenize/batching in native threads, Python dispatch only.
        service = serve.build_native_server(
            cfg, port=0, max_batch=max_batch, batch_window_ms=window_ms
        )
        service.start_dispatch()
        httpd = None
        port = service.port
    else:
        httpd, service = serve.build_server(
            cfg, port=0, max_batch=max_batch, batch_window_ms=window_ms
        )
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        port = httpd.server_address[1]

    img_dir = os.path.join(profile["paths"]["base_path"], "val2014")
    jpeg = os.path.join(img_dir, sorted(os.listdir(img_dir))[0])
    with open(jpeg, "rb") as fd:
        image_b64 = base64.b64encode(fd.read()).decode()
    base = f"http://127.0.0.1:{port}"
    return base, image_b64, service, httpd


def post(base, image_b64, timeout=120.0):
    body = json.dumps({"image_b64": image_b64,
                       "question": "what color is it?"}).encode()
    req = urllib.request.Request(
        base + "/v1/answer", data=body,
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            resp.read()
            return resp.status
    except urllib.error.HTTPError as err:
        err.read()
        return err.code
    except Exception:  # noqa: BLE001 - socket timeout etc.
        return -1


def run_level(base, image_b64, concurrency: int, seconds: float):
    stop_at = time.perf_counter() + seconds
    counts = {200: 0, 503: 0, "other": 0}
    lats = []
    lock = threading.Lock()

    def client():
        while time.perf_counter() < stop_at:
            t0 = time.perf_counter()
            status = post(base, image_b64)
            dt = (time.perf_counter() - t0) * 1e3
            with lock:
                counts[status if status in counts else "other"] = (
                    counts.get(status if status in counts else "other", 0) + 1
                )
                if status == 200:
                    lats.append(dt)

    threads = [threading.Thread(target=client) for _ in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.perf_counter() - t0
    ok = counts[200]
    ordered = sorted(lats) or [0.0]
    return {
        "concurrency": concurrency,
        "qps": round(ok / elapsed, 1),
        "ok": ok,
        "rejected_503": counts[503],
        "other_errors": counts["other"],
        "p50_ms": round(statistics.median(ordered), 1),
        "p99_ms": round(ordered[min(len(ordered) - 1,
                                    int(0.99 * len(ordered)))], 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--levels", default="1,4,16,64")
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--window-ms", type=float, default=2.0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (script smoke test; the "
                    "env var is overridden by the TPU plugin, see "
                    "docs/PERF_NOTES.md gotchas)")
    ap.add_argument("--native", action="store_true",
                    help="drive the native C++ front (serve.py "
                    "--native-front) instead of the Python daemon")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    base, image_b64, service, httpd = build(
        "/tmp/dl_vqa_serve_load", args.max_batch, args.window_ms,
        native=args.native,
    )
    # Warm every batch bucket BEFORE measurement via the service's own
    # sweep — it walks the exact served `_bucket` shapes, including the
    # clamped final bucket of a non-power-of-two --max-batch (a burst
    # sweep over powers of two would miss it and pay XLA compilation
    # mid-measurement). One HTTP request then warms the HTTP+decode path.
    service.warmup(block=True)
    post(base, image_b64)
    print("warmup done; buckets compiled", flush=True)

    before = service.metrics()
    results = []
    for level in (int(x) for x in args.levels.split(",")):
        r = run_level(base, image_b64, level, args.seconds)
        after = service.metrics()
        batches = after["batches"] - before["batches"]
        batched = after["batched_requests"] - before["batched_requests"]
        r["mean_batch"] = round(batched / batches, 2) if batches else 0.0
        before = after
        results.append(r)
        print(json.dumps(r), flush=True)

    service.stop()
    if httpd is not None:
        httpd.shutdown()
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
