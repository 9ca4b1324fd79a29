"""Probe: what does the ViT W8A8 mode COST in accuracy?

bench.py --int8-vit measured the throughput (a wash vs dense — see
docs/PERF_NOTES.md "int8 W8A8 ViT blocks"); this completes the story
with the end-task delta on converged weights, same protocol as the
CNN-stem quantization rows: train the dense ViT to convergence on the
learnable at-scale synthetic corpus (probe_moe_accuracy.load_corpus /
train_one — shared setup), calibrate the W8A8 scales on
TRAIN-distribution images, eval the SAME best weights both ways.

Run on the real TPU: `python experiments/probe_vit_int8_accuracy.py
[epochs]`. Measured (round 3, 15 epochs): 99.925% == 99.925% — 0.00 pp.
"""

import dataclasses
import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dl_vqa_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()

from dl_vqa_tpu.models import ModelConfig
from dl_vqa_tpu.ops.vit_int8 import with_calibrated_vit_scales
from dl_vqa_tpu.train.loop import evaluate
from dl_vqa_tpu.train.steps import make_eval_step
from dl_vqa_tpu.data.pipeline import Batcher

from probe_moe_accuracy import BATCH, load_corpus, train_one


def main(epochs: int = 15) -> None:
    train_ds, val_ds, image_size = load_corpus()

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
    _, best_params = train_one("dense", cfg, train_ds, val_ds, epochs,
                               keep_params=True)

    val_table = jax.device_put(val_ds.features_nhwc_all())
    val_b = Batcher(val_ds, BATCH, shuffle=False, load_images=False)
    acc_bf16, _ = evaluate(make_eval_step(cfg, jnp.bfloat16), best_params,
                           val_b, image_table=val_table)
    # Calibrate on TRAIN-distribution images (serving protocol).
    n_cal = min(len(train_ds), 256)
    cal_idx = np.linspace(0, len(train_ds) - 1, n_cal).astype(np.int64)
    cfg_int8 = with_calibrated_vit_scales(
        cfg, best_params, jnp.asarray(train_ds.load_images_nhwc(cal_idx)),
    )
    acc_int8, _ = evaluate(make_eval_step(cfg_int8, jnp.bfloat16),
                           best_params, val_b, image_table=val_table)
    print(json.dumps({
        "val_accuracy_bf16": round(acc_bf16, 3),
        "val_accuracy_int8_w8a8_vit": round(acc_int8, 3),
        "delta_pct_points": round(acc_int8 - acc_bf16, 3),
        "corpus": f"learnable, {len(train_ds)} train / "
                  f"{len(val_ds)} val @ {image_size}px, 1000 answers",
        "epochs": epochs,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 15)
