"""Probe: what do the quantized serving stems COST in accuracy?

Round 2 measured the f8 mode's throughput (17.3k -> 20.7k QA pairs/s/
chip, docs/PERF_NOTES.md "f8 activation-storage stem") but left its
accuracy delta unquantified ("outside the parity envelope"). This puts
a number beside the throughput number, on the largest data this
environment can produce: the at-scale synthetic corpus (20k train / 4k
val QA pairs, 1,500 distinct 224px images, 1000 answers). Round 3 adds
the int8 W8A8 mode (ops/conv_int8) to the same protocol.

Protocol (inference-mode quantization, which is what the serving config
does — `evaluate_vqa.py train.image.store_dtype=f8e4m3` on a checkpoint
trained in bf16):
  1. train the reference-scale parity model in bf16 to convergence
     (best-val early-stop window, same LR law as main.py),
  2. eval the SAME best params three ways: store_dtype=compute vs
     f8e4m3 vs int8 (the latter PTQ-calibrated on a train-image sample),
  3. report the accuracies and deltas.

Run on the real TPU: `python experiments/probe_f8_accuracy.py [epochs]`.
Result recorded in docs/PERF_NOTES.md and BASELINE.md.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dl_vqa_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()

from dl_vqa_tpu.data import synthetic
from dl_vqa_tpu.data.dataset import VQADataset
from dl_vqa_tpu.data.pipeline import Batcher
from dl_vqa_tpu.models import ModelConfig, vqa
from dl_vqa_tpu.train.loop import evaluate
from dl_vqa_tpu.train.state import create_train_state
from dl_vqa_tpu.train.steps import make_eval_step, make_optimizer, \
    make_train_step

BATCH = 512


def get_dataset(split: str, root: str) -> VQADataset:
    cache = os.path.join(root, f"ds_{split}.npz")
    if os.path.exists(VQADataset.cache_path(cache)):
        return VQADataset.load(VQADataset.cache_path(cache))
    ds = VQADataset(
        data_paths={
            "questions": f"{split}_questions.json",
            "answers": f"{split}_annotations.json",
            "processed_imgs": os.path.join(
                root, f"processed_{split}_images.h5"
            ),
            "vqaDataset": cache,
        },
        other_paths={
            "base_path": root,
            "vocab_path": os.path.join(root, "vocab.json"),
        },
        answerable_only=(split == "train"),
    )
    ds.save(cache)
    return ds


def main(epochs: int = 12, hard: bool = False) -> None:
    on_tpu = jax.default_backend() == "tpu"
    n_train, n_val, n_images, image_size = (
        (20_000, 4_000, 1_500, 224) if on_tpu else (512, 256, 64, 64)
    )
    # --hard (VERDICT r4 item 3): the LOWER-ceiling fine-grained task
    # (12 noisy hue bins, 0-8 occluding squares, continuous size bins,
    # 0.75 annotator agreement — synthetic.py "hard mode") so the
    # quantized modes are measured where accuracy has headroom to lose,
    # instead of against the easy task's 99.6% ceiling.
    task = "hard" if hard else True
    tag = "hard" if hard else "learnable"
    root = f"/tmp/dl_vqa_f8acc_{tag}_{n_train}_{image_size}"
    if not os.path.exists(os.path.join(root, "vocab.json")):
        print(f"building corpus at {root} ...", flush=True)
        # learnable: answers are a function of pixels + question
        # words, so training CONVERGES and the quantization delta is
        # measured against real accuracy, not the answer prior.
        synthetic.make_synthetic_corpus(
            root, n_train=n_train, n_val=n_val, n_images=n_images,
            image_size=image_size, max_answers=1000, learnable=task,
        )
    train_ds, val_ds = get_dataset("train", root), get_dataset("val", root)

    jax.config.update("jax_default_prng_impl", "rbg")
    cfg = ModelConfig(num_tokens=train_ds.num_tokens, max_answers=1000,
                      image_size=image_size)
    cfg_f8 = dataclasses.replace(
        cfg, image=dataclasses.replace(cfg.image, store_dtype="f8e4m3")
    )
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(5e-4)
    state = create_train_state(params, tx)
    step = make_train_step(cfg, tx, compute_dtype=jnp.bfloat16)
    eval_bf16 = make_eval_step(cfg, jnp.bfloat16)
    eval_f8 = make_eval_step(cfg_f8, jnp.bfloat16)
    rng = jax.random.PRNGKey(0)

    table = jax.device_put(train_ds.features_nhwc_all())
    val_table = jax.device_put(val_ds.features_nhwc_all())
    train_b = Batcher(train_ds, BATCH, shuffle=True, load_images=False)
    val_b = Batcher(val_ds, BATCH, shuffle=False, load_images=False)

    best_score, best_params = -1.0, params
    for epoch in range(epochs):
        t0 = time.perf_counter()
        for batch in iter(train_b):
            batch = dict(batch, image_table=table)
            state, metrics = step(state, batch, rng)
        score, loss = evaluate(eval_bf16, state.params, val_b,
                               image_table=val_table)
        print(f"epoch {epoch}: loss={float(metrics['loss']):.4f} "
              f"val={score:.3f}% ({time.perf_counter() - t0:.1f}s)",
              flush=True)
        if score > best_score:
            best_score, best_params = score, jax.device_get(state.params)

    acc_bf16, _ = evaluate(eval_bf16, best_params, val_b,
                           image_table=val_table)
    acc_f8, _ = evaluate(eval_f8, best_params, val_b, image_table=val_table)

    # int8 W8A8 mode: calibrate static activation scales from the TRAINED
    # best params on a spread of train images (the serving deployment's
    # calibration data is training-distribution data), then eval.
    from dl_vqa_tpu.ops.conv_int8 import with_calibrated_scales
    n_cal = min(len(train_ds), 256)
    cal_idx = np.linspace(0, len(train_ds) - 1, n_cal).astype(np.int64)
    cfg_int8 = with_calibrated_scales(
        cfg, best_params,
        jnp.asarray(train_ds.load_images_nhwc(cal_idx)),
    )
    eval_int8 = make_eval_step(cfg_int8, jnp.bfloat16)
    acc_int8, _ = evaluate(eval_int8, best_params, val_b,
                           image_table=val_table)
    print(json.dumps({
        "val_accuracy_bf16_store": round(acc_bf16, 3),
        "val_accuracy_f8e4m3_store": round(acc_f8, 3),
        "val_accuracy_int8_w8a8": round(acc_int8, 3),
        "delta_f8_pct_points": round(acc_f8 - acc_bf16, 3),
        "delta_int8_pct_points": round(acc_int8 - acc_bf16, 3),
        "int8_scales": [round(s, 4) for s in cfg_int8.image.quant_scales],
        "corpus": f"{tag}, {n_train} train / {n_val} val / "
                  f"{n_images} images @ {image_size}px, 1000 answers",
    }))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--hard"]
    main(int(args[0]) if args else 12, hard="--hard" in sys.argv)
