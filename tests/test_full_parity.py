"""Full-stack accuracy parity vs the PyTorch reference.

The BASELINE criterion is <=0.1% VQA-accuracy delta with the SAME
checkpoint and data. This test runs the complete eval path of BOTH
frameworks on an identical synthetic corpus and checkpoint:

* the reference side uses the reference's OWN ``VQA_dataset`` (reading
  our vocab.json / h5 cache, which are format-compatible) and its OWN
  ``VqaNet`` — loss/metric computed with the reference's run_batch
  semantics (re-derived in numpy; the reference's metric helper is
  CUDA-bound);
* our side loads the reference's state_dict through the torch-import
  bridge and runs the jitted eval step over the same batches.

Accuracies must agree exactly (both f32, same argmax).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference not available"
)
if REF_ROOT not in sys.path:
    sys.path.insert(0, REF_ROOT)

IMAGE_SIZE = 64
BATCH = 8


class _SilentLogger:
    def write(self, *a, **k):
        pass


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from dl_vqa_tpu.data import synthetic

    root = tmp_path_factory.mktemp("parity_corpus")
    return synthetic.make_synthetic_corpus(
        str(root), n_train=40, n_val=24, n_images=8, image_size=IMAGE_SIZE,
        max_answers=15,
    )


def _train_cfg(max_answers):
    return {
        "text": {
            "question_features": 32, "embedding_features": 16,
            "dropout": 0.0, "num_lstm_layers": 1, "bidirectional": True,
        },
        "image": {
            "kernel_size": 3, "dropout": 0.0,
            "num_channels": [3, 8, 12, 16], "stride": 1,
            "do_skip_connection": False,
        },
        "attention": {"hidden_dim": 24, "glimpses": 2, "do_option": "+",
                      "dropout": 0.0},
        "classifier": {"hidden_dim": 20, "dropout": 0.0},
        "max_answers": max_answers,
    }


def _reference_eval(corpus, tcfg, model):
    """Eval with the reference's dataset + model; loss/score via the
    reference's run_batch semantics (train.py:190-207, train_utils.py:25)."""
    from preprocessing.data_preprocessing import VQA_dataset  # reference

    ds = VQA_dataset(
        data_paths={
            "questions": "val_questions.json",
            "answers": "val_annotations.json",
            "processed_imgs": corpus["val_paths"]["processed_imgs"],
        },
        other_paths={
            "base_path": corpus["paths"]["base_path"],
            "vocab_path": corpus["paths"]["vocab_path"],
        },
        logger=_SilentLogger(),
        answerable_only=False,
    )
    model.eval()
    total_score, total_loss, n_batches = 0.0, 0.0, 0
    with torch.no_grad():
        for start in range(0, len(ds), BATCH):
            items = [ds[i] for i in range(start, min(start + BATCH, len(ds)))]
            v = torch.stack([it[0] for it in items])
            q = torch.stack([it[1] for it in items])
            a_idx = torch.stack([it[2] for it in items]).numpy()
            a_val = torch.stack([it[3] for it in items]).numpy()
            q_len = torch.tensor([it[6] for it in items])
            logits = model(v, q, q_len).numpy()

            log_probs = logits - logits.max(axis=1, keepdims=True)
            log_probs = log_probs - np.log(
                np.exp(log_probs).sum(axis=1, keepdims=True)
            )
            nll = -log_probs
            batch_loss = 0.0
            batch_score = 0.0
            for i in range(len(items)):
                pred = int(logits[i].argmax())
                agree = 0
                for k in range(a_idx.shape[1]):
                    if a_idx[i, k] > 0:
                        batch_loss += (
                            nll[i, a_idx[i, k] - 1] * a_val[i, k] / 10.0
                        )
                        if a_idx[i, k] - 1 == pred:
                            agree = a_val[i, k]
                batch_score += min(agree * 0.3, 1.0)
            total_loss += batch_loss / len(items)
            total_score += batch_score
            n_batches += 1
    return (
        total_score / len(ds) * 100.0,
        total_loss / n_batches,
        len(ds),
    )


def _our_eval(corpus, tcfg, state_dict, image_size=IMAGE_SIZE,
              compute_dtype=jnp.float32):
    from dl_vqa_tpu.data.dataset import VQADataset
    from dl_vqa_tpu.data.pipeline import Batcher
    from dl_vqa_tpu.models import ModelConfig, vqa
    from dl_vqa_tpu.train import make_eval_step
    from dl_vqa_tpu.train.loop import evaluate
    from dl_vqa_tpu.utils.torch_import import params_from_torch_state

    ds = VQADataset(
        data_paths=corpus["val_paths"], other_paths=corpus["paths"]
    )
    cfg = ModelConfig.from_cfg(
        {**tcfg, "image_size": image_size, "central_fraction": 0.875,
         "n_epochs_stop": 1, "num_epochs": 1, "batch_size": BATCH,
         "save_model": False,
         "lr": {"lr_value": 1e-3, "lr_decay": 15, "lr_gamma": 0.1,
                "lr_step_size": 3}},
        num_tokens=ds.num_tokens,
    )
    params = params_from_torch_state(state_dict)
    eval_step = make_eval_step(cfg, compute_dtype=compute_dtype)
    return evaluate(eval_step, params, Batcher(ds, BATCH))


@pytest.mark.parametrize("do_option,seed", [("+", 42), ("*", 43),
                                            ("|", 44)])
def test_same_checkpoint_same_accuracy(corpus, do_option, seed):
    from models.model import VqaNet  # the PyTorch reference
    from dl_vqa_tpu.data.dataset import VQADataset

    ds_probe = VQADataset(
        data_paths=corpus["val_paths"], other_paths=corpus["paths"]
    )
    tcfg = _train_cfg(max_answers=len(ds_probe.answer_vocab))
    tcfg["attention"]["do_option"] = do_option

    torch.manual_seed(seed)
    ref_model = VqaNet(tcfg, embedding_tokens=ds_probe.num_tokens)

    ref_score, ref_loss, n = _reference_eval(corpus, tcfg, ref_model)
    our_score, our_loss = _our_eval(corpus, tcfg, ref_model.state_dict())

    # BASELINE criterion is <=0.1% accuracy delta; f32 end-to-end should be
    # essentially exact.
    assert our_score == pytest.approx(ref_score, abs=1e-3), (
        ref_score, our_score,
    )
    assert our_loss == pytest.approx(ref_loss, rel=1e-4)


# ---------------------------------------------------------------------------
# Reference-scale parity (VERDICT r4 item 1)
# ---------------------------------------------------------------------------
# The small-shape tests above can't exercise where the real model lives:
# the 26x26 attention grid, the [3,64,128,256] conv stack, the H=1024
# bi-LSTM packed-cell-state extraction, and the 2560x1024 / 1024x3000
# classifier matmuls (ref config/config.yaml:60-84). This runs BOTH
# frameworks at the reference's exact shapes. Measured here on CPU
# (recorded in docs/PERF_NOTES.md "Reference-scale parity"): f32 max
# logit delta 4.8e-8, bf16 4.2e-4 (logit scale ~0.12), argmax identical.

REF_SCALE_IMAGE = 224
REF_SCALE_BATCH = 8


def _train_cfg_reference_scale():
    return {
        "text": {
            "question_features": 1024, "embedding_features": 300,
            "dropout": 0.0, "num_lstm_layers": 1, "bidirectional": True,
        },
        "image": {
            "kernel_size": 3, "dropout": 0.0,
            "num_channels": [3, 64, 128, 256], "stride": 1,
            "do_skip_connection": False,
        },
        "attention": {"hidden_dim": 1024, "glimpses": 2, "do_option": "+",
                      "dropout": 0.0},
        "classifier": {"hidden_dim": 1024, "dropout": 0.0},
        "max_answers": 3000,
    }


@pytest.fixture(scope="module")
def corpus_ref_scale(tmp_path_factory):
    from dl_vqa_tpu.data import synthetic

    root = tmp_path_factory.mktemp("parity_corpus_224")
    return synthetic.make_synthetic_corpus(
        str(root), n_train=24, n_val=16, n_images=4,
        image_size=REF_SCALE_IMAGE, max_answers=15,
    )


def test_reference_scale_logit_and_accuracy_parity(corpus_ref_scale):
    """Torch-vs-JAX agreement at the reference's REAL shapes: 224px,
    channels [3,64,128,256], H=1024 bi-LSTM, 3000-answer classifier.
    Done-criteria from the round-4 verdict: logit delta <=2e-5 f32 /
    <=1e-3 bf16, exact accuracy agreement."""
    from models.model import VqaNet  # the PyTorch reference
    from dl_vqa_tpu.data.dataset import VQADataset
    from dl_vqa_tpu.models import ModelConfig, vqa
    from dl_vqa_tpu.utils.torch_import import params_from_torch_state

    ds = VQADataset(
        data_paths=corpus_ref_scale["val_paths"],
        other_paths=corpus_ref_scale["paths"],
    )
    tcfg = _train_cfg_reference_scale()

    torch.manual_seed(7)
    ref_model = VqaNet(tcfg, embedding_tokens=ds.num_tokens)
    ref_model.eval()

    # --- direct logit comparison on one real-shape batch ----------------
    rng = np.random.default_rng(3)
    v = torch.tensor(
        rng.standard_normal(
            (REF_SCALE_BATCH, 3, REF_SCALE_IMAGE, REF_SCALE_IMAGE)
        ).astype(np.float32)
    )
    q = torch.tensor(
        rng.integers(0, ds.num_tokens, (REF_SCALE_BATCH, 23)).astype(np.int64)
    )
    q_len = torch.tensor([23, 20, 18, 15, 12, 9, 6, 3])
    with torch.no_grad():
        ref_logits = ref_model(v, q, q_len).numpy()

    cfg = ModelConfig.from_cfg(
        {**tcfg, "image_size": REF_SCALE_IMAGE, "central_fraction": 0.875,
         "n_epochs_stop": 1, "num_epochs": 1, "batch_size": REF_SCALE_BATCH,
         "save_model": False,
         "lr": {"lr_value": 1e-3, "lr_decay": 15, "lr_gamma": 0.1,
                "lr_step_size": 3}},
        num_tokens=ds.num_tokens,
    )
    params = params_from_torch_state(ref_model.state_dict())
    nhwc = jnp.asarray(v.numpy().transpose(0, 2, 3, 1))
    qj, lj = jnp.asarray(q.numpy()), jnp.asarray(q_len.numpy())

    ours32 = np.asarray(
        vqa.apply(params, cfg, nhwc, qj, lj, train=False,
                  compute_dtype=jnp.float32)
    )
    assert np.abs(ours32 - ref_logits).max() <= 2e-5
    np.testing.assert_array_equal(
        ours32.argmax(axis=1), ref_logits.argmax(axis=1)
    )

    ours16 = np.asarray(
        vqa.apply(params, cfg, nhwc, qj, lj, train=False,
                  compute_dtype=jnp.bfloat16),
        dtype=np.float32,
    )
    assert np.abs(ours16 - ref_logits).max() <= 1e-3
    np.testing.assert_array_equal(
        ours16.argmax(axis=1), ref_logits.argmax(axis=1)
    )

    # --- full eval-path accuracy agreement at reference scale -----------
    ref_score, ref_loss, _ = _reference_eval(
        corpus_ref_scale, tcfg, ref_model
    )
    our_score, our_loss = _our_eval(
        corpus_ref_scale, tcfg, ref_model.state_dict(),
        image_size=REF_SCALE_IMAGE,
    )
    assert our_score == pytest.approx(ref_score, abs=1e-3)
    assert our_loss == pytest.approx(ref_loss, rel=1e-4)

    # bf16 (the TPU serving dtype) must stay inside the BASELINE 0.1%
    # accuracy-delta contract on the same checkpoint/data.
    our_score16, _ = _our_eval(
        corpus_ref_scale, tcfg, ref_model.state_dict(),
        image_size=REF_SCALE_IMAGE, compute_dtype=jnp.bfloat16,
    )
    assert abs(our_score16 - ref_score) <= 0.1
