"""Probe: what does the ViT W8A8 mode COST in accuracy?

bench.py --int8-vit measured the throughput (a wash vs dense — see
docs/PERF_NOTES.md "int8 W8A8 ViT blocks"); this completes the story
with the end-task delta on converged weights, same protocol as the
CNN-stem quantization rows: train the dense ViT to convergence on the
learnable at-scale synthetic corpus, calibrate the W8A8 scales on
TRAIN-distribution images, eval the SAME best weights both ways.

Run on the real TPU: `python experiments/probe_vit_int8_accuracy.py
[epochs]`.
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
from dl_vqa_tpu.data.pipeline import Batcher
from dl_vqa_tpu.models import ModelConfig, vqa
from dl_vqa_tpu.ops.vit_int8 import with_calibrated_vit_scales
from dl_vqa_tpu.train.loop import evaluate
from dl_vqa_tpu.train.state import create_train_state
from dl_vqa_tpu.train.steps import make_eval_step, make_optimizer, \
    make_train_step

from probe_f8_accuracy import get_dataset

BATCH = 512


def main(epochs: int = 15) -> None:
    on_tpu = jax.default_backend() == "tpu"
    n_train, n_val, n_images, image_size = (
        (20_000, 4_000, 1_500, 224) if on_tpu else (512, 256, 64, 64)
    )
    root = f"/tmp/dl_vqa_f8acc_learnable_{n_train}_{image_size}"
    if not os.path.exists(os.path.join(root, "vocab.json")):
        print(f"building corpus at {root} ...", flush=True)
        synthetic.make_synthetic_corpus(
            root, n_train=n_train, n_val=n_val, n_images=n_images,
            image_size=image_size, max_answers=1000, learnable=True,
        )
    train_ds, val_ds = get_dataset("train", root), get_dataset("val", root)

    jax.config.update("jax_default_prng_impl", "rbg")
    base = ModelConfig(num_tokens=train_ds.num_tokens, max_answers=1000,
                      image_size=image_size)
    cfg = dataclasses.replace(
        base,
        image=dataclasses.replace(
            base.image, encoder="vit", patch_size=16, num_layers=4,
            num_heads=4, num_channels=(3, 256),
        ),
    )
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(5e-4)
    state = create_train_state(params, tx)
    step = make_train_step(cfg, tx, compute_dtype=jnp.bfloat16)
    eval_bf16 = make_eval_step(cfg, jnp.bfloat16)
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
        score, _ = evaluate(eval_bf16, state.params, val_b,
                            image_table=val_table)
        print(f"epoch {epoch}: loss={float(metrics['loss']):.4f} "
              f"val={score:.3f}% ({time.perf_counter() - t0:.1f}s)",
              flush=True)
        if score > best_score:
            best_score, best_params = score, jax.device_get(state.params)

    acc_bf16, _ = evaluate(eval_bf16, best_params, val_b,
                           image_table=val_table)
    # Calibrate on TRAIN-distribution images (serving protocol).
    n_cal = min(len(train_ds), 256)
    cal_idx = np.linspace(0, len(train_ds) - 1, n_cal).astype(np.int64)
    cfg_int8 = with_calibrated_vit_scales(
        cfg, best_params, jnp.asarray(train_ds.load_images_nhwc(cal_idx)),
    )
    eval_int8 = make_eval_step(cfg_int8, jnp.bfloat16)
    acc_int8, _ = evaluate(eval_int8, best_params, val_b,
                           image_table=val_table)
    print(json.dumps({
        "val_accuracy_bf16": round(acc_bf16, 3),
        "val_accuracy_int8_w8a8_vit": round(acc_int8, 3),
        "delta_pct_points": round(acc_int8 - acc_bf16, 3),
        "corpus": f"learnable, {n_train} train / {n_val} val / "
                  f"{n_images} images @ {image_size}px, 1000 answers",
        "epochs": epochs,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 15)
