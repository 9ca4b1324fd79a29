"""bench.py harness under test (VERDICT r4 item 5).

Every bench mode runs a 2-step tiny-scale pass on CPU and must emit ONE
schema-valid JSON line — including the ``mfu`` field, which is null
off-TPU (utils/flops.device_peak_flops contract). The DL_VQA_BENCH_TINY
env hook shrinks the model; the measured code paths (staged pool,
on-device fori_loop, sharded mesh path when device_count > 1, PTQ
calibration, real host pipeline in --e2e) are the production ones.
"""

import json

import pytest

import bench


REQUIRED_KEYS = {"metric", "value", "unit", "vs_baseline", "mfu"}


@pytest.fixture()
def tiny_bench(monkeypatch):
    monkeypatch.setenv("DL_VQA_BENCH_TINY", "1")
    monkeypatch.setattr(bench, "BATCH_SIZE", 4)
    monkeypatch.setattr(bench, "POOL", 2)
    monkeypatch.setattr(bench, "ITERS", 2)
    monkeypatch.setattr(bench, "TRAIN_ITERS", 2)
    monkeypatch.setattr(bench, "CAL_BATCH", 4)
    return bench


def _run_and_parse(capsys, fn, **kwargs):
    fn(**kwargs)
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    assert len(lines) == 1, f"expected exactly one JSON line, got {lines}"
    payload = json.loads(lines[0])
    assert set(payload) == REQUIRED_KEYS
    assert isinstance(payload["value"], (int, float)) and payload["value"] > 0
    assert isinstance(payload["unit"], str) and payload["unit"]
    # Off-TPU the peak is unknown: mfu must be null, never a made-up number.
    assert payload["mfu"] is None
    return payload


@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        {"vit": True},
        {"f8_stem": True},
        {"int8_stem": True},
        {"vit": True, "moe": True},
        {"vit": True, "int8_vit": True},
    ],
    ids=["cnn", "vit", "f8-stem", "int8-stem", "moe", "int8-vit"],
)
def test_eval_mode_emits_schema_valid_json(tiny_bench, capsys, kwargs):
    payload = _run_and_parse(capsys, tiny_bench.main, **kwargs)
    assert payload["metric"] == "qa_pairs_per_sec_per_chip"
    # vs_baseline is round(value / baseline, 3): allow the rounding step.
    assert payload["vs_baseline"] == pytest.approx(
        payload["value"] / tiny_bench.BASELINE_QA_PER_SEC, abs=5.1e-4
    )


@pytest.mark.parametrize(
    "kwargs", [{}, {"vit": True}], ids=["cnn", "vit"]
)
def test_train_mode_emits_schema_valid_json(tiny_bench, capsys, kwargs):
    payload = _run_and_parse(capsys, tiny_bench.bench_train, **kwargs)
    assert payload["metric"] == "train_samples_per_sec_per_chip"
    assert payload["vs_baseline"] is None


def test_latency_mode_emits_schema_valid_json(tiny_bench, capsys):
    payload = _run_and_parse(capsys, tiny_bench.bench_latency, batch_size=4)
    assert payload["metric"] == "eval_latency_ms_per_batch"


def test_e2e_mode_emits_schema_valid_json(tiny_bench, capsys):
    # The CPU-size corpus root (/tmp/dl_vqa_e2e_512_64) is model-config
    # independent, so sharing it between tiny and default runs is safe.
    payload = _run_and_parse(capsys, tiny_bench.bench_e2e)
    assert payload["metric"] == "e2e_train_samples_per_sec"


@pytest.mark.parametrize(
    "kwargs",
    [
        {"f8_stem": True, "int8_stem": True},
        {"vit": True, "int8_stem": True},
        {"vit": True, "moe": True, "f8_stem": True},
        {"vit": True, "int8_vit": True, "moe": True},
    ],
    ids=["f8+int8", "vit+int8stem", "moe+f8", "int8vit+moe"],
)
def test_conflicting_flags_rejected(tiny_bench, kwargs):
    with pytest.raises(SystemExit):
        tiny_bench.build(**kwargs)


def test_profiler_trace_dir_written(tmp_path):
    """tpu.profile_dir produces a non-empty jax.profiler trace directory
    (train/loop.py brackets epoch 1 with start/stop_trace)."""
    import glob
    import os

    import jax
    import jax.numpy as jnp

    from dl_vqa_tpu.data import synthetic
    from dl_vqa_tpu.data.dataset import VQADataset
    from dl_vqa_tpu.data.pipeline import Batcher
    from dl_vqa_tpu.models import vqa
    from dl_vqa_tpu.train.loop import TrainParams, train
    from tests.test_train import _tiny_cfg

    profile = synthetic.make_synthetic_corpus(
        str(tmp_path / "data"), n_train=32, n_val=8, n_images=4,
        image_size=32, max_answers=12,
    )
    train_ds = VQADataset(data_paths=profile["train_paths"],
                          other_paths=profile["paths"],
                          answerable_only=True)
    val_ds = VQADataset(data_paths=profile["val_paths"],
                        other_paths=profile["paths"])
    cfg = _tiny_cfg(num_tokens=train_ds.num_tokens)

    class _Logger:
        exp_dir = str(tmp_path / "exp")

        def write(self, text, epoch=None, **kw):
            pass

        def write_epoch_statistics(self, **kw):
            pass

        def report_scalars(self, scalars, epoch):
            pass

        def report_scalars_same_plot(self, scalars, epoch):
            pass

        def save_model(self, state, epoch, model_cfg=None, extra_meta=None):
            pass

    os.makedirs(_Logger.exp_dir, exist_ok=True)
    trace_dir = str(tmp_path / "trace")
    tp = TrainParams(n_epochs_stop=50, num_epochs=2, lr=1e-3, lr_decay=0.0,
                     lr_gamma=0.0, lr_step_size=1, save_model=False,
                     max_answers=cfg.max_answers)
    train(
        cfg, vqa.init(jax.random.PRNGKey(0), cfg),
        Batcher(train_ds, 16, shuffle=True, seed=1),
        Batcher(val_ds, 8, shuffle=False),
        tp, _Logger(), compute_dtype=jnp.float32, profile_dir=trace_dir,
    )
    traces = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                       recursive=True)
    assert traces, f"no xplane trace written under {trace_dir}"
