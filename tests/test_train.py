"""Training engine: LR law, fused step learning, checkpoint resume,
end-to-end entry points on a synthetic corpus."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dl_vqa_tpu.models import ModelConfig, vqa
from dl_vqa_tpu.models.configs import (
    AttentionConfig,
    ClassifierConfig,
    ImageConfig,
    TextConfig,
)
from dl_vqa_tpu.train.state import create_train_state
from dl_vqa_tpu.train.steps import (
    lr_schedule,
    make_eval_step,
    make_optimizer,
    make_train_step,
)


def _tiny_cfg(num_tokens=30, max_answers=12):
    return ModelConfig(
        text=TextConfig(question_features=16, embedding_features=8,
                        dropout=0.0),
        image=ImageConfig(num_channels=(3, 4, 6), dropout=0.0),
        attention=AttentionConfig(hidden_dim=12, glimpses=2, dropout=0.0),
        classifier=ClassifierConfig(hidden_dim=16, dropout=0.0),
        max_answers=max_answers,
        image_size=32,
        num_tokens=num_tokens,
    )


def _tiny_batch(cfg, batch=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "images": jnp.asarray(
            rng.standard_normal((batch, cfg.image_size, cfg.image_size, 3)),
            dtype=jnp.float32,
        ),
        "questions": jnp.asarray(
            rng.integers(0, cfg.num_tokens, (batch, 6)), dtype=jnp.int32
        ),
        "lengths": jnp.asarray(rng.integers(1, 7, (batch,)), dtype=jnp.int32),
        "answer_indices": jnp.asarray(
            rng.integers(1, cfg.max_answers + 1, (batch, 2)), dtype=jnp.int32
        ),
        "answer_values": jnp.asarray(
            np.stack([np.full(batch, 7), np.full(batch, 3)], axis=1),
            dtype=jnp.int32,
        ),
        "mask": jnp.ones((batch,), dtype=bool),
    }


def test_lr_schedule_halving_law():
    sched = lr_schedule(5e-4)
    assert float(sched(jnp.array(0))) == pytest.approx(5e-4)
    assert float(sched(jnp.array(50_000))) == pytest.approx(2.5e-4, rel=1e-6)
    assert float(sched(jnp.array(25_000))) == pytest.approx(
        5e-4 * 0.5 ** 0.5, rel=1e-6
    )


def test_train_step_overfits_tiny_batch():
    cfg = _tiny_cfg()
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(3e-3)
    state = create_train_state(params, tx)
    step = make_train_step(cfg, tx, compute_dtype=jnp.float32)
    batch = _tiny_batch(cfg)
    rng = jax.random.PRNGKey(0)

    first_loss = None
    for _ in range(200):
        state, metrics = step(state, batch, rng)
        if first_loss is None:
            first_loss = float(metrics["loss"])
    final_loss = float(metrics["loss"])
    assert final_loss < first_loss * 0.5, (first_loss, final_loss)
    assert int(state.step) == 200
    # With a fixed batch the model should reach near-max accuracy: the
    # dominant answer has count 7 -> per-sample score min(.3*7,1)=1.
    assert float(metrics["score"]) >= 7.0


def test_eval_step_deterministic():
    cfg = _tiny_cfg()
    params = vqa.init(jax.random.PRNGKey(1), cfg)
    eval_step = make_eval_step(cfg, compute_dtype=jnp.float32)
    batch = _tiny_batch(cfg, seed=3)
    l1, s1 = eval_step(params, batch)
    l2, s2 = eval_step(params, batch)
    assert float(l1) == float(l2) and float(s1) == float(s2)


def test_checkpoint_roundtrip(tmp_path):
    from dl_vqa_tpu.utils import checkpoint as ckpt

    cfg = _tiny_cfg()
    params = vqa.init(jax.random.PRNGKey(2), cfg)
    tx = make_optimizer(1e-3)
    state = create_train_state(params, tx)
    step = make_train_step(cfg, tx, compute_dtype=jnp.float32)
    state, _ = step(state, _tiny_batch(cfg), jax.random.PRNGKey(0))

    path = str(tmp_path / "ckpt.npz")
    ckpt.save_checkpoint(path, state, epoch=4, model_cfg=cfg)

    template = create_train_state(vqa.init(jax.random.PRNGKey(9), cfg), tx)
    restored, epoch = ckpt.restore_state(template, path)
    assert epoch == 4
    assert int(restored.step) == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # params-only load from a full state dump
    loaded = ckpt.load_params(path, params)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(loaded)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    from dl_vqa_tpu.utils import checkpoint as ckpt

    cfg = _tiny_cfg()
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "p.npz")
    ckpt.save_checkpoint(path, params)

    other = vqa.init(jax.random.PRNGKey(0), _tiny_cfg(max_answers=9))
    with pytest.raises(ValueError, match="Shape mismatch"):
        ckpt.load_params(path, other)


def test_batcher_pads_final_batch():
    from dl_vqa_tpu.data.pipeline import Batcher

    class FakeDataset:
        questions = np.arange(10 * 4).reshape(10, 4).astype(np.int32)
        question_lengths = np.full(10, 4, dtype=np.int32)
        answer_indices = np.ones((10, 2), dtype=np.int32)
        answer_values = np.ones((10, 2), dtype=np.int32)

        def __len__(self):
            return 10

    b = Batcher(FakeDataset(), batch_size=4, load_images=False)
    batches = list(b)
    assert len(b) == 3 and len(batches) == 3
    assert batches[2]["questions"].shape == (4, 4)
    assert batches[2]["mask"].tolist() == [True, True, False, False]


def test_end_to_end_entrypoints(tmp_path, monkeypatch):
    """main.py + evaluate_vqa.py on a hermetic synthetic corpus (the
    reference's small_data mode, SURVEY.md §4)."""
    from dl_vqa_tpu.data import synthetic

    root = str(tmp_path / "data")
    synthetic.make_synthetic_corpus(
        root, n_train=32, n_val=16, n_images=6, image_size=32, max_answers=12
    )
    monkeypatch.chdir(tmp_path)

    overrides = [
        "main.use_full=false",
        f"main.small.paths.base_path={root}",
        f"main.small.paths.vocab_path={root}/vocab.json",
        f"main.small.paths.logs={tmp_path}/logs/",
        f"main.small.paths.pretrained_model_path={tmp_path}/model.ckpt",
        f"main.small.train_paths.questions=train_questions.json",
        f"main.small.train_paths.answers=train_annotations.json",
        f"main.small.train_paths.processed_imgs={root}/processed_train_images.h5",
        f"main.small.train_paths.vqaDataset={tmp_path}/ds_train.npz",
        f"main.small.val_paths.questions=val_questions.json",
        f"main.small.val_paths.answers=val_annotations.json",
        f"main.small.val_paths.processed_imgs={root}/processed_val_images.h5",
        f"main.small.val_paths.vqaDataset={tmp_path}/ds_val.npz",
        "train.num_epochs=2",
        "train.batch_size=8",
        "train.max_answers=12",
        "train.image_size=32",
        "train.text.question_features=16",
        "train.text.embedding_features=8",
        "train.image.num_channels=[3, 4, 6]",
        "train.attention.hidden_dim=12",
        "train.classifier.hidden_dim=16",
        "tpu.compute_dtype=float32",
    ]

    import sys
    sys.path.insert(0, "/root/repo")
    from dl_vqa_tpu import config as config_mod
    import main as train_main

    cfg = config_mod.compose("config", overrides=overrides)
    best = train_main.main(cfg)
    assert isinstance(best, float) and best >= 0.0

    # A best checkpoint must exist in the experiment dir.
    logs_root = str(tmp_path / "logs")
    ckpts = [
        os.path.join(dirpath, f)
        for dirpath, _, files in os.walk(logs_root)
        for f in files
        if f == "model.ckpt"
    ]
    assert ckpts, "no best checkpoint written"

    # Eval entry point consumes the checkpoint.
    import evaluate_vqa as eval_main

    eval_overrides = overrides + [
        f"main.small.paths.pretrained_model_path={ckpts[0]}",
    ]
    score = eval_main.evaluate_hw2(eval_overrides)
    assert isinstance(score, float) and 0.0 <= score <= 100.0

    # The int8 W8A8 serving mode auto-calibrates its activation scales
    # from the cached val images and evaluates the same checkpoint.
    score_int8 = eval_main.evaluate_hw2(
        eval_overrides + ["train.image.store_dtype=int8"]
    )
    assert isinstance(score_int8, float) and 0.0 <= score_int8 <= 100.0


def test_resume_equals_uninterrupted_training(tmp_path):
    """Crash-recovery guarantee: train 2 steps straight == train 1 step,
    checkpoint, restore, train 1 more (params + Adam moments + step)."""
    from dl_vqa_tpu.utils import checkpoint as ckpt

    cfg = _tiny_cfg()
    params = vqa.init(jax.random.PRNGKey(5), cfg)
    params = jax.tree_util.tree_map(np.asarray, params)  # host copies
    tx = make_optimizer(1e-3)
    rng = jax.random.PRNGKey(3)
    batch1 = _tiny_batch(cfg, seed=11)
    batch2 = _tiny_batch(cfg, seed=12)
    step = make_train_step(cfg, tx, compute_dtype=jnp.float32)

    # straight-through
    state_a = create_train_state(params, tx)
    state_a, _ = step(state_a, batch1, rng)
    state_a, ma = step(state_a, batch2, rng)

    # interrupted + resumed
    state_b = create_train_state(params, tx)
    state_b, _ = step(state_b, batch1, rng)
    path = str(tmp_path / "resume.npz")
    ckpt.save_checkpoint(path, state_b, epoch=0)
    template = create_train_state(
        jax.tree_util.tree_map(np.asarray, vqa.init(jax.random.PRNGKey(9), cfg)),
        tx,
    )
    state_b, _ = ckpt.restore_state(template, path)
    state_b, mb = step(state_b, batch2, rng)

    assert float(ma["loss"]) == pytest.approx(float(mb["loss"]), rel=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a.params),
        jax.tree_util.tree_leaves(state_b.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_load_params_from_torch_pth(tmp_path):
    """A reference-format .pth checkpoint loads through load_params
    (warm start / eval interop path, ref main.py:108-113)."""
    torch = pytest.importorskip("torch")
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        from models.model import VqaNet
    except Exception:
        pytest.skip("reference not importable")

    tcfg = {
        "text": {"question_features": 16, "embedding_features": 8,
                 "dropout": 0.0, "num_lstm_layers": 1, "bidirectional": True},
        "image": {"kernel_size": 3, "dropout": 0.0,
                  "num_channels": [3, 4, 6], "stride": 1,
                  "do_skip_connection": False},
        "attention": {"hidden_dim": 12, "glimpses": 2, "do_option": "+",
                      "dropout": 0.0},
        "classifier": {"hidden_dim": 16, "dropout": 0.0},
        "max_answers": 12,
    }
    ref_model = VqaNet(tcfg, embedding_tokens=30)
    path = str(tmp_path / "model.pth")
    torch.save(
        {"epoch": 3, "model_state": ref_model.state_dict(),
         "optimizer_state": {}},
        path,
    )

    from dl_vqa_tpu.utils.checkpoint import load_params

    cfg = _tiny_cfg()
    template = vqa.init(jax.random.PRNGKey(0), cfg)
    params = load_params(path, template)
    np.testing.assert_allclose(
        np.asarray(params["classifier"]["lin2"]["b"]),
        ref_model.classifier.lin2.bias.detach().numpy(),
        atol=1e-7,
    )


def test_async_checkpoint_roundtrip(tmp_path):
    """Async save must snapshot the state before the step mutates it and
    produce a loadable, correct checkpoint after wait."""
    from dl_vqa_tpu.utils import checkpoint as ckpt

    cfg = _tiny_cfg()
    params = jax.tree_util.tree_map(
        np.asarray, vqa.init(jax.random.PRNGKey(4), cfg)
    )
    tx = make_optimizer(1e-3)
    state = create_train_state(params, tx)
    step = make_train_step(cfg, tx, compute_dtype=jnp.float32)

    state, _ = step(state, _tiny_batch(cfg), jax.random.PRNGKey(0))
    snapshot_leaf = np.asarray(
        jax.tree_util.tree_leaves(state.params)[0]
    ).copy()

    path = str(tmp_path / "async.npz")
    ckpt.save_checkpoint_async(path, state, epoch=0)
    # keep training while the write is in flight (state gets donated)
    state, _ = step(state, _tiny_batch(cfg, seed=9), jax.random.PRNGKey(1))
    ckpt.wait_for_async_saves()

    template = create_train_state(
        jax.tree_util.tree_map(np.asarray, vqa.init(jax.random.PRNGKey(5), cfg)),
        tx,
    )
    restored, epoch = ckpt.restore_state(template, path)
    assert epoch == 0 and int(restored.step) == 1
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        snapshot_leaf,
    )


def test_grad_accumulation_matches_full_batch():
    """accum_steps=2/4 (tpu.grad_accum_steps) reproduces the
    unaccumulated update: per-micro losses/grads are rescaled to sum
    form and normalized once by the whole batch's real-sample count, so
    the result equals the full-batch loss/gradients up to reduction
    order (dropout=0 here so the paths are numerically comparable) —
    including a padded final batch whose real samples split unevenly
    across microbatches."""
    from dl_vqa_tpu.train.state import create_train_state
    from dl_vqa_tpu.train.steps import make_optimizer, make_train_step

    cfg = _tiny_cfg()
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(1e-3)
    batch = _tiny_batch(cfg, batch=8)
    rng = jax.random.PRNGKey(5)

    def fresh_state():
        # The jitted step donates the state, deleting its buffers — each
        # run needs its own copy.
        return create_train_state(
            jax.tree_util.tree_map(jnp.array, params), tx
        )

    ref_state, ref_metrics = make_train_step(
        cfg, tx, compute_dtype=jnp.float32
    )(fresh_state(), batch, rng)

    for accum in (2, 4):
        state, metrics = make_train_step(
            cfg, tx, compute_dtype=jnp.float32, accum_steps=accum
        )(fresh_state(), batch, rng)
        assert np.isclose(float(metrics["loss"]), float(ref_metrics["loss"]),
                          rtol=1e-5)
        assert np.isclose(float(metrics["score"]),
                          float(ref_metrics["score"]), rtol=1e-5)
        for a, e in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(ref_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                       atol=1e-5, rtol=1e-4)

    # Padded final batch whose real samples land UNEVENLY across micros:
    # with 5 real of 8 at accum 4, one micro is all-padding and the
    # others hold 2/2/1 — per-micro mean-loss averaging would weight the
    # lone sample 2x (and the padding micro 0) against the reference.
    masked = dict(batch, mask=jnp.asarray([True] * 5 + [False] * 3))
    ref_state, ref_metrics = make_train_step(
        cfg, tx, compute_dtype=jnp.float32
    )(fresh_state(), masked, rng)
    for accum in (2, 4):
        state, metrics = make_train_step(
            cfg, tx, compute_dtype=jnp.float32, accum_steps=accum
        )(fresh_state(), masked, rng)
        assert np.isclose(float(metrics["loss"]), float(ref_metrics["loss"]),
                          rtol=1e-5)
        assert np.isclose(float(metrics["score"]),
                          float(ref_metrics["score"]), rtol=1e-5)
        for a, e in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(ref_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                       atol=1e-5, rtol=1e-4)


def test_grad_accumulation_rejects_uneven_split():
    from dl_vqa_tpu.train.state import create_train_state
    from dl_vqa_tpu.train.steps import make_optimizer, make_train_step

    cfg = _tiny_cfg()
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(1e-3)
    step = make_train_step(cfg, tx, compute_dtype=jnp.float32, accum_steps=3)
    with pytest.raises(ValueError, match="does not split"):
        step(create_train_state(params, tx), _tiny_batch(cfg, batch=8),
             jax.random.PRNGKey(0))


def test_device_image_table_matches_inbatch_images():
    """tpu.device_image_cache: a step fed (image_table, image_rows)
    reproduces the step fed the gathered images in-batch exactly (the
    gather moves on device; values are identical)."""
    from dl_vqa_tpu.train.steps import make_eval_step

    cfg = _tiny_cfg()
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.standard_normal((5, cfg.image_size, cfg.image_size, 3)),
        dtype=jnp.float32,
    )
    rows = jnp.asarray(rng.integers(0, 5, 8), dtype=jnp.int32)
    batch = _tiny_batch(cfg, batch=8)

    step = make_eval_step(cfg, compute_dtype=jnp.float32)
    with_images = dict(batch, images=table[rows])
    loss_a, score_a = step(params, with_images)

    indirect = dict(batch)
    del indirect["images"]
    indirect["image_table"] = table
    indirect["image_rows"] = rows
    loss_b, score_b = step(params, indirect)
    assert float(loss_a) == float(loss_b)
    assert float(score_a) == float(score_b)


def test_batcher_emits_image_rows_without_images(tmp_path):
    from dl_vqa_tpu.data import synthetic
    from dl_vqa_tpu.data.dataset import VQADataset
    from dl_vqa_tpu.data.pipeline import Batcher

    profile = synthetic.make_synthetic_corpus(
        str(tmp_path / "c"), n_train=10, n_val=5, n_images=4, image_size=32,
    )
    ds = VQADataset(data_paths=profile["train_paths"],
                    other_paths=profile["paths"])
    batch = next(iter(Batcher(ds, 4, load_images=False)))
    assert "images" not in batch
    np.testing.assert_array_equal(
        batch["image_rows"], ds.h5_rows[batch["indices"]].astype(np.int32)
    )
    # And the table gather equals the per-batch loader.
    table = ds.features_nhwc_all()
    direct = ds.load_images_nhwc(batch["indices"])
    np.testing.assert_array_equal(table[batch["image_rows"]], direct)


def test_grad_accum_composes_with_device_image_table():
    """tpu.grad_accum_steps + tpu.device_image_cache: the table must not
    be microbatch-split (its 5 rows don't divide by 2, and splitting
    would clamp the gathers); the accumulated step matches the
    unaccumulated one exactly at dropout=0."""
    cfg = _tiny_cfg()
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(1e-3)
    rng_np = np.random.default_rng(0)
    table = jnp.asarray(
        rng_np.standard_normal((5, cfg.image_size, cfg.image_size, 3)),
        dtype=jnp.float32,
    )
    rows = jnp.asarray(rng_np.integers(0, 5, 8), dtype=jnp.int32)
    base = _tiny_batch(cfg, batch=8)
    del base["images"]
    batch = dict(base, image_table=table, image_rows=rows)
    key = jax.random.PRNGKey(2)

    def fresh():
        return create_train_state(
            jax.tree_util.tree_map(jnp.array, params), tx
        )

    ref_state, ref_m = make_train_step(
        cfg, tx, compute_dtype=jnp.float32
    )(fresh(), batch, key)
    acc_state, acc_m = make_train_step(
        cfg, tx, compute_dtype=jnp.float32, accum_steps=2
    )(fresh(), batch, key)
    assert np.isclose(float(acc_m["loss"]), float(ref_m["loss"]), rtol=1e-5)
    for a, e in zip(jax.tree_util.tree_leaves(acc_state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   atol=1e-5, rtol=1e-4)


def test_training_learns_on_learnable_corpus(tmp_path):
    """End-to-end learning signal: on the learnable synthetic corpus
    (answers derivable from pixels + question words) a few epochs of the
    real train loop must beat the answer-prior accuracy by a wide margin
    — guards against silent learning regressions that shape/parity tests
    cannot see (on TPU the same recipe reaches 99.6%+ at scale,
    experiments/probe_f8_accuracy.py)."""
    from dl_vqa_tpu.data import synthetic
    from dl_vqa_tpu.data.dataset import VQADataset
    from dl_vqa_tpu.data.pipeline import Batcher
    from dl_vqa_tpu.train.loop import evaluate

    root = str(tmp_path / "data")
    profile = synthetic.make_synthetic_corpus(
        root, n_train=512, n_val=128, n_images=24, image_size=32,
        max_answers=12, learnable=True,
    )
    train_ds = VQADataset(data_paths=profile["train_paths"],
                          other_paths=profile["paths"],
                          answerable_only=True)
    val_ds = VQADataset(data_paths=profile["val_paths"],
                        other_paths=profile["paths"])
    cfg = _tiny_cfg(num_tokens=train_ds.num_tokens)
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(2e-3)
    state = create_train_state(params, tx)
    step = make_train_step(cfg, tx, compute_dtype=jnp.float32)
    eval_step = make_eval_step(cfg, jnp.float32)
    rng = jax.random.PRNGKey(0)

    train_b = Batcher(train_ds, 64, shuffle=True)
    val_b = Batcher(val_ds, 64, shuffle=False)
    prior, _ = evaluate(eval_step, state.params, val_b)
    for _ in range(12):
        for batch in iter(train_b):
            state, _ = step(state, batch, rng)
    score, _ = evaluate(eval_step, state.params, val_b)
    # Answer prior on this corpus is ~10-20% (untrained model starts near
    # 0-20%); a learning model clears 45% within 12 epochs (measured:
    # ~13% -> 36% at 6 epochs, climbing).
    assert score > 45.0, f"no learning signal: {prior:.1f}% -> {score:.1f}%"
    assert score > prior + 20.0


def test_crash_recovery_resume_continues_run(tmp_path):
    """Restarting from the rolling last.ckpt CONTINUES the interrupted
    run: the epoch counter, best eval score, and early-stop counter are
    restored from the checkpoint metadata, so a worse post-resume epoch
    cannot under-report Metrics/BestAccuracy or re-run the whole epoch
    budget. (Checkpoints without resume metadata keep the reference's
    warm-start semantics — retrain from epoch 0.)"""
    import os

    from dl_vqa_tpu.data import synthetic
    from dl_vqa_tpu.data.dataset import VQADataset
    from dl_vqa_tpu.data.pipeline import Batcher
    from dl_vqa_tpu.train.loop import TrainParams, train
    from dl_vqa_tpu.utils import checkpoint as ckpt

    root = str(tmp_path / "data")
    profile = synthetic.make_synthetic_corpus(
        root, n_train=48, n_val=16, n_images=6, image_size=32,
        max_answers=12, learnable=True,
    )
    train_ds = VQADataset(data_paths=profile["train_paths"],
                          other_paths=profile["paths"],
                          answerable_only=True)
    val_ds = VQADataset(data_paths=profile["val_paths"],
                        other_paths=profile["paths"])
    cfg = _tiny_cfg(num_tokens=train_ds.num_tokens)

    class _Logger:
        def __init__(self, exp_dir):
            self.exp_dir = exp_dir
            self.epoch_lines = []
            self.saved_epochs = []

        def write(self, text, epoch=None, **kw):
            pass

        def write_epoch_statistics(self, **kw):
            self.epoch_lines.append(kw["epoch"])

        def report_scalars(self, scalars, epoch):
            pass

        def report_scalars_same_plot(self, scalars, epoch):
            pass

        def save_model(self, state, epoch, model_cfg=None, extra_meta=None):
            self.saved_epochs.append(epoch)

    def run(num_epochs, restore=None, seed=1):
        logger = _Logger(str(tmp_path))
        tp = TrainParams(n_epochs_stop=50, num_epochs=num_epochs, lr=1e-3,
                         lr_decay=0.0, lr_gamma=0.0, lr_step_size=1,
                         save_model=True, max_answers=cfg.max_answers)
        metrics = train(
            cfg, vqa.init(jax.random.PRNGKey(0), cfg),
            Batcher(train_ds, 16, shuffle=True),
            Batcher(val_ds, 16, shuffle=False),
            tp, logger, opt_restore_path=restore,
            compute_dtype=jnp.float32, seed=seed,
        )
        return metrics, logger

    m1, log1 = run(num_epochs=2)
    last = os.path.join(str(tmp_path), "last.ckpt")
    assert os.path.exists(last)
    meta = ckpt.load_checkpoint(last)[1]
    assert meta["epoch"] == 1 and "best_eval_score" in meta

    # Resume with a 3-epoch budget: exactly ONE more epoch runs (epoch 2)
    # and the best score carries over instead of resetting to 0.
    m2, log2 = run(num_epochs=3, restore=last)
    assert log2.epoch_lines == [2]
    assert m2["Metrics/BestAccuracy"] >= m1["Metrics/BestAccuracy"]


def test_legacy_vit_list_checkpoint_migrates_to_stacked(tmp_path):
    """Pre-round-3 ViT checkpoints stored the block stack as a LIST of
    per-layer dicts (flat keys 'image|layers|#i|...'); params are now
    stacked ([L, ...] leading axis). Loading a legacy checkpoint into
    the new template must stack the per-layer leaves transparently, for
    both bare params and full TrainState resumes."""
    from dl_vqa_tpu.models.configs import ImageConfig
    from dl_vqa_tpu.utils import checkpoint as ckpt
    from dl_vqa_tpu.utils.checkpoint import _SEP, _flatten

    cfg = ModelConfig(
        text=TextConfig(question_features=16, embedding_features=8,
                        dropout=0.0),
        image=ImageConfig(encoder="vit", patch_size=8, num_channels=(3, 32),
                          num_layers=3, num_heads=2, dropout=0.0),
        attention=AttentionConfig(hidden_dim=12, glimpses=2, dropout=0.0),
        classifier=ClassifierConfig(hidden_dim=16, dropout=0.0),
        max_answers=12, image_size=32, num_tokens=30,
    )
    params = vqa.init(jax.random.PRNGKey(3), cfg)
    flat = _flatten(params)

    # Synthesize the legacy layout: unstack every image|layers leaf.
    legacy = {}
    for key, value in flat.items():
        marker = f"image{_SEP}layers{_SEP}"
        if key.startswith(marker) or f"{_SEP}{marker}" in key:
            head, rest = key.split(marker, 1)
            for i in range(value.shape[0]):
                legacy[f"{head}{marker}#{i}{_SEP}{rest}"] = value[i]
        else:
            legacy[key] = value
    path = str(tmp_path / "legacy.ckpt")
    np.savez(path, **legacy)
    os.replace(path + ".npz", path)

    loaded = ckpt.load_params(path, params_template=params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Full TrainState resume (Adam moments share the layers subtree).
    tx = make_optimizer(1e-3)
    state = create_train_state(params, tx)
    legacy_state = {}
    for key, value in _flatten(state).items():
        marker = f"image{_SEP}layers{_SEP}"
        if marker in key and value.ndim >= 1:
            head, rest = key.split(marker, 1)
            for i in range(value.shape[0]):
                legacy_state[f"{head}{marker}#{i}{_SEP}{rest}"] = value[i]
        else:
            legacy_state[key] = value
    spath = str(tmp_path / "legacy_state.ckpt")
    np.savez(spath, **legacy_state)
    os.replace(spath + ".npz", spath)
    restored, _ = ckpt.restore_state(state, spath)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _make_tiny_corpus(tmp_path, n_train=48, n_val=16):
    from dl_vqa_tpu.data import synthetic
    from dl_vqa_tpu.data.dataset import VQADataset

    root = str(tmp_path / "data")
    profile = synthetic.make_synthetic_corpus(
        root, n_train=n_train, n_val=n_val, n_images=6, image_size=32,
        max_answers=12, learnable=True,
    )
    train_ds = VQADataset(data_paths=profile["train_paths"],
                          other_paths=profile["paths"],
                          answerable_only=True)
    val_ds = VQADataset(data_paths=profile["val_paths"],
                        other_paths=profile["paths"])
    return train_ds, val_ds


def test_batcher_epoch_order_stateless_and_resumable(tmp_path):
    """Epoch orders derive from (seed, epoch) alone: reproducible in
    isolation (no RNG history), distinct across epochs, and iterable from
    a mid-epoch batch offset — the data-plane contract behind exact
    mid-epoch crash recovery and multi-host lockstep."""
    from dl_vqa_tpu.data.pipeline import Batcher

    train_ds, _ = _make_tiny_corpus(tmp_path)
    b1 = Batcher(train_ds, 16, shuffle=True, seed=7)
    b2 = Batcher(train_ds, 16, shuffle=True, seed=7)

    # Stateless: same (seed, epoch) -> same order, no matter the history.
    np.testing.assert_array_equal(b1.epoch_order(3), b2.epoch_order(3))
    assert not np.array_equal(b1.epoch_order(3), b1.epoch_order(4))
    assert not np.array_equal(
        b1.epoch_order(3), Batcher(train_ds, 16, shuffle=True,
                                   seed=8).epoch_order(3)
    )

    # __iter__'s k-th full iteration is iter_epoch(k).
    first = [b["indices"].copy() for b in b1]
    second = [b["indices"].copy() for b in b1]
    for got, want in zip(first, b2.iter_epoch(0)):
        np.testing.assert_array_equal(got, want["indices"])
    for got, want in zip(second, b2.iter_epoch(1)):
        np.testing.assert_array_equal(got, want["indices"])
    assert not np.array_equal(first[0], second[0])

    # Mid-epoch offset yields exactly the tail of the full epoch.
    full = [b["indices"].copy() for b in b2.iter_epoch(5)]
    tail = [b["indices"].copy() for b in b2.iter_epoch(5, start_batch=1)]
    assert len(tail) == len(full) - 1
    for got, want in zip(tail, full[1:]):
        np.testing.assert_array_equal(got, want)


def test_mid_epoch_resume_equals_uninterrupted(tmp_path):
    """checkpoint_every_steps writes the rolling checkpoint WITHIN the
    epoch; a crash after it resumes the SAME epoch at the exact batch and
    the resumed run's reported epoch metrics and final weights are
    IDENTICAL to an uninterrupted run (stateless shuffle + step-keyed
    dropout + carried partial metric sums)."""
    from dl_vqa_tpu.data.pipeline import Batcher
    from dl_vqa_tpu.train.loop import TrainParams, train
    from dl_vqa_tpu.utils import checkpoint as ckpt

    train_ds, val_ds = _make_tiny_corpus(tmp_path)
    cfg = _tiny_cfg(num_tokens=train_ds.num_tokens)

    class _Logger:
        def __init__(self, exp_dir):
            self.exp_dir = exp_dir
            self.epoch_stats = []
            self.best_states = []

        def write(self, text, epoch=None, **kw):
            pass

        def write_epoch_statistics(self, **kw):
            self.epoch_stats.append(kw)

        def report_scalars(self, scalars, epoch):
            pass

        def report_scalars_same_plot(self, scalars, epoch):
            pass

        def save_model(self, state, epoch, model_cfg=None, extra_meta=None):
            self.best_states.append(
                jax.tree_util.tree_map(np.asarray, state.params)
            )

    class _CrashingBatcher(Batcher):
        """Raises after yielding ``crash_after`` batches of epoch 0."""

        crash_after = 2

        def iter_epoch(self, epoch, start_batch=0):
            inner = super().iter_epoch(epoch, start_batch)

            def gen():
                for i, b in enumerate(inner):
                    if epoch == 0 and start_batch + i >= self.crash_after:
                        raise RuntimeError("simulated crash")
                    yield b

            return gen()

    tp = TrainParams(n_epochs_stop=50, num_epochs=1, lr=1e-3, lr_decay=0.0,
                     lr_gamma=0.0, lr_step_size=1, save_model=True,
                     max_answers=cfg.max_answers)

    def run(batcher_cls, exp_dir, restore=None, every=0):
        logger = _Logger(str(exp_dir))
        os.makedirs(str(exp_dir), exist_ok=True)
        metrics = train(
            cfg, vqa.init(jax.random.PRNGKey(0), cfg),
            batcher_cls(train_ds, 16, shuffle=True, seed=1),
            Batcher(val_ds, 16, shuffle=False),
            tp, logger, opt_restore_path=restore,
            compute_dtype=jnp.float32, seed=1,
            checkpoint_every_steps=every,
        )
        return metrics, logger

    # Uninterrupted ground truth (3 batches of 16 over 48 samples).
    m_ref, log_ref = run(Batcher, tmp_path / "ref")

    # Crash after batch 2 of epoch 0; the in-epoch save at batch 2 must
    # already be on disk with the batch position + partial sums.
    crash_dir = tmp_path / "crash"
    with pytest.raises(RuntimeError, match="simulated crash"):
        run(_CrashingBatcher, crash_dir, every=2)
    ckpt.wait_for_async_saves()
    last = os.path.join(str(crash_dir), "last.ckpt")
    assert os.path.exists(last)
    meta = ckpt.load_checkpoint(last)[1]
    assert meta["epoch"] == 0 and meta["batch_in_epoch"] == 2
    assert "loss" in meta["epoch_accum"]

    # Resume: exactly one batch + eval runs, and everything the run
    # reports or saves matches the uninterrupted run bit-for-bit.
    m_res, log_res = run(Batcher, crash_dir, restore=last)
    assert len(log_res.epoch_stats) == 1
    ref_stats, res_stats = log_ref.epoch_stats[0], log_res.epoch_stats[0]
    assert res_stats["epoch"] == 0
    assert res_stats["train_loss"] == pytest.approx(
        ref_stats["train_loss"], rel=1e-6)
    assert res_stats["train_score"] == pytest.approx(
        ref_stats["train_score"], rel=1e-6)
    assert res_stats["eval_score"] == pytest.approx(
        ref_stats["eval_score"], rel=1e-6)
    assert m_res["Metrics/BestAccuracy"] == pytest.approx(
        m_ref["Metrics/BestAccuracy"], rel=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(log_ref.best_states[-1]),
        jax.tree_util.tree_leaves(log_res.best_states[-1]),
    ):
        np.testing.assert_array_equal(a, b)


def test_mid_epoch_resume_duck_typed_batcher_resets(tmp_path):
    """A batcher WITHOUT iter_epoch can't honor mid-epoch resume metadata;
    train() must warn, reset to batch 0, and drop the carried partial sums
    (applying them anyway would double-count the replayed batches)."""
    from dl_vqa_tpu.data.pipeline import Batcher
    from dl_vqa_tpu.train.loop import TrainParams, train
    from dl_vqa_tpu.utils import checkpoint as ckpt

    train_ds, val_ds = _make_tiny_corpus(tmp_path)
    cfg = _tiny_cfg(num_tokens=train_ds.num_tokens)
    tp = TrainParams(n_epochs_stop=50, num_epochs=1, lr=1e-3, lr_decay=0.0,
                     lr_gamma=0.0, lr_step_size=1, save_model=True,
                     max_answers=cfg.max_answers)

    class _Logger:
        def __init__(self, exp_dir):
            self.exp_dir = exp_dir
            self.lines = []
            self.epoch_stats = []

        def write(self, text, epoch=None, **kw):
            self.lines.append(str(text))

        def write_epoch_statistics(self, **kw):
            self.epoch_stats.append(kw)

        def report_scalars(self, scalars, epoch):
            pass

        def report_scalars_same_plot(self, scalars, epoch):
            pass

        def save_model(self, state, epoch, model_cfg=None, extra_meta=None):
            pass

    class _DuckBatcher:
        """Minimal batcher surface: no iter_epoch."""

        def __init__(self, inner):
            self._inner = inner
            self.dataset = inner.dataset
            self.batch_size = inner.batch_size
            self.batches_yielded = 0

        def __len__(self):
            return len(self._inner)

        def __iter__(self):
            for b in self._inner:
                self.batches_yielded += 1
                yield b

    # Build a genuinely mid-epoch checkpoint by crashing at batch 2.
    class _Crashing(Batcher):
        def iter_epoch(self, epoch, start_batch=0):
            inner = super().iter_epoch(epoch, start_batch)

            def gen():
                for i, b in enumerate(inner):
                    if start_batch + i >= 2:
                        raise RuntimeError("boom")
                    yield b

            return gen()

    exp2 = tmp_path / "crash"
    os.makedirs(str(exp2), exist_ok=True)
    with pytest.raises(RuntimeError, match="boom"):
        train(cfg, vqa.init(jax.random.PRNGKey(0), cfg),
              _Crashing(train_ds, 16, shuffle=True, seed=1),
              Batcher(val_ds, 16, shuffle=False), tp,
              _Logger(str(exp2)), compute_dtype=jnp.float32, seed=1,
              checkpoint_every_steps=2)
    ckpt.wait_for_async_saves()
    last = os.path.join(str(exp2), "last.ckpt")
    meta = ckpt.load_checkpoint(last)[1]
    assert meta["batch_in_epoch"] == 2

    # Resume with the duck-typed batcher: warn, replay the FULL epoch.
    duck = _DuckBatcher(Batcher(train_ds, 16, shuffle=True, seed=1))
    log3 = _Logger(str(tmp_path / "resume"))
    os.makedirs(log3.exp_dir, exist_ok=True)
    train(cfg, vqa.init(jax.random.PRNGKey(0), cfg), duck,
          Batcher(val_ds, 16, shuffle=False), tp, log3,
          opt_restore_path=last, compute_dtype=jnp.float32, seed=1)
    assert any("no iter_epoch" in ln for ln in log3.lines)
    assert duck.batches_yielded == 3  # full epoch, not the 1-batch tail


def test_checkpoint_every_steps_warns_without_save_model(tmp_path):
    """tpu.checkpoint_every_steps is gated on train.save_model; the
    combination must announce itself instead of silently writing nothing."""
    from dl_vqa_tpu.data.pipeline import Batcher
    from dl_vqa_tpu.train.loop import TrainParams, train

    train_ds, val_ds = _make_tiny_corpus(tmp_path)
    cfg = _tiny_cfg(num_tokens=train_ds.num_tokens)
    tp = TrainParams(n_epochs_stop=50, num_epochs=1, lr=1e-3, lr_decay=0.0,
                     lr_gamma=0.0, lr_step_size=1, save_model=False,
                     max_answers=cfg.max_answers)

    lines = []

    class _Logger:
        exp_dir = str(tmp_path / "nosave")

        def write(self, text, epoch=None, **kw):
            lines.append(str(text))

        def write_epoch_statistics(self, **kw):
            pass

        def report_scalars(self, scalars, epoch):
            pass

        def report_scalars_same_plot(self, scalars, epoch):
            pass

    os.makedirs(str(tmp_path / "nosave"), exist_ok=True)
    train(cfg, vqa.init(jax.random.PRNGKey(0), cfg),
          Batcher(train_ds, 16, shuffle=True, seed=1),
          Batcher(val_ds, 16, shuffle=False), tp, _Logger(),
          compute_dtype=jnp.float32, seed=1, checkpoint_every_steps=2)
    assert any("no effect" in ln and "save_model" in ln for ln in lines)
    assert not os.path.exists(os.path.join(str(tmp_path / "nosave"),
                                           "last.ckpt"))


def test_save_rolling_orbax_not_coordinator_gated(monkeypatch):
    """Orbax saves are global collectives: every process must call save.
    _save_rolling must route non-coordinators to save_checkpoint_async
    under the orbax backend (npz mirroring via host_snapshot would
    deadlock the pod on mismatched collectives) and to host_snapshot
    under npz."""
    from dl_vqa_tpu.train import loop as loop_mod
    from dl_vqa_tpu.utils import checkpoint as ckpt

    calls = []
    monkeypatch.setattr(
        ckpt, "save_checkpoint_async",
        lambda *a, **k: calls.append("save"),
    )
    monkeypatch.setattr(
        ckpt, "host_snapshot", lambda state: calls.append("snapshot")
    )

    class _L:
        exp_dir = "/tmp/x"

        def __init__(self, backend):
            self.checkpoint_backend = backend

    state = {"params": {}}
    loop_mod._save_rolling(_L("orbax"), state, 0, None, None, 0.0, 0,
                           is_coordinator=False)
    assert calls == ["save"]
    calls.clear()
    loop_mod._save_rolling(_L("npz"), state, 0, None, None, 0.0, 0,
                           is_coordinator=False)
    assert calls == ["snapshot"]
    calls.clear()
    loop_mod._save_rolling(_L("npz"), state, 0, None, None, 0.0, 0,
                           is_coordinator=True)
    assert calls == ["save"]


def test_resume_with_exhausted_epoch_budget_reports_metrics(tmp_path):
    """Restarting a COMPLETED run (restored epoch budget already spent)
    must return the restored metrics instead of an empty dict (main.py
    reads Metrics/BestAccuracy unconditionally)."""
    from dl_vqa_tpu.data.pipeline import Batcher
    from dl_vqa_tpu.train.loop import TrainParams, train
    from dl_vqa_tpu.utils import checkpoint as ckpt

    train_ds, val_ds = _make_tiny_corpus(tmp_path)
    cfg = _tiny_cfg(num_tokens=train_ds.num_tokens)
    tp = TrainParams(n_epochs_stop=50, num_epochs=1, lr=1e-3, lr_decay=0.0,
                     lr_gamma=0.0, lr_step_size=1, save_model=True,
                     max_answers=cfg.max_answers)

    class _Logger:
        def __init__(self, exp_dir):
            self.exp_dir = exp_dir
            self.lines = []

        def write(self, text, epoch=None, **kw):
            self.lines.append(str(text))

        def write_epoch_statistics(self, **kw):
            pass

        def report_scalars(self, scalars, epoch):
            pass

        def report_scalars_same_plot(self, scalars, epoch):
            pass

        def save_model(self, state, epoch, model_cfg=None, extra_meta=None):
            pass

    exp = tmp_path / "done"
    os.makedirs(str(exp), exist_ok=True)
    m1 = train(cfg, vqa.init(jax.random.PRNGKey(0), cfg),
               Batcher(train_ds, 16, shuffle=True, seed=1),
               Batcher(val_ds, 16, shuffle=False), tp, _Logger(str(exp)),
               compute_dtype=jnp.float32, seed=1)
    ckpt.wait_for_async_saves()
    last = os.path.join(str(exp), "last.ckpt")

    # Same num_epochs: start_epoch == num_epochs, the loop never runs.
    log2 = _Logger(str(tmp_path / "again"))
    os.makedirs(log2.exp_dir, exist_ok=True)
    m2 = train(cfg, vqa.init(jax.random.PRNGKey(1), cfg),
               Batcher(train_ds, 16, shuffle=True, seed=1),
               Batcher(val_ds, 16, shuffle=False), tp, log2,
               opt_restore_path=last, compute_dtype=jnp.float32, seed=1)
    assert m2["Metrics/BestAccuracy"] == pytest.approx(
        m1["Metrics/BestAccuracy"])
    assert m2["Metrics/LastAccuracy"] == pytest.approx(
        m1["Metrics/LastAccuracy"])
    assert m2["Metrics/LastLoss"] == pytest.approx(m1["Metrics/LastLoss"])
    assert any("epoch budget" in ln for ln in log2.lines)
