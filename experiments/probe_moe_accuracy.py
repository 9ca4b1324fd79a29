"""Probe: does the MoE ViT LEARN as well as the dense ViT?

bench.py --moe measured the single-chip throughput bill of the 8-expert
top-2 MoE blocks (docs/PERF_NOTES.md "MoE ViT family"); this puts an
end-task number beside it on the largest data this environment can
produce: the LEARNABLE at-scale synthetic corpus (20k train / 4k val QA
pairs, 1,500 distinct 224px images, 1000 answers — answers are a
deterministic function of pixels + question words, so training
converges and accuracy deltas are measured against real signal, not
the answer prior; see dl_vqa_tpu/data/synthetic.py).

Protocol: train the dense ViT and the ViT-MoE (8 experts, top-2,
capacity factor 1.25 — bench.py's --moe shape) from scratch with the
same seed/LR/epoch budget, track best-val accuracy for each, report
both plus per-epoch wall time. The MoE trains through the Switch
balance loss exactly as main.py would (train/steps._forward_loss).

Run on the real TPU: `python experiments/probe_moe_accuracy.py
[epochs]`. Result recorded in docs/PERF_NOTES.md.
"""

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dl_vqa_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()

from dl_vqa_tpu.data import synthetic
from dl_vqa_tpu.models import ModelConfig, vqa
from dl_vqa_tpu.train.loop import evaluate
from dl_vqa_tpu.train.state import create_train_state
from dl_vqa_tpu.train.steps import make_eval_step, make_optimizer, \
    make_train_step
from dl_vqa_tpu.data.pipeline import Batcher

from probe_f8_accuracy import get_dataset

BATCH = 512


def load_corpus():
    """The shared learnable at-scale corpus (built once, cached in
    /tmp; same root as probe_f8_accuracy) -> (train_ds, val_ds,
    image_size)."""
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
    return get_dataset("train", root), get_dataset("val", root), image_size


def train_one(tag: str, cfg: ModelConfig, train_ds, val_ds,
              epochs: int, keep_params: bool = False):
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(5e-4)
    state = create_train_state(params, tx)
    step = make_train_step(cfg, tx, compute_dtype=jnp.bfloat16)
    eval_step = make_eval_step(cfg, jnp.bfloat16)
    rng = jax.random.PRNGKey(0)

    table = jax.device_put(train_ds.features_nhwc_all())
    val_table = jax.device_put(val_ds.features_nhwc_all())
    train_b = Batcher(train_ds, BATCH, shuffle=True, load_images=False)
    val_b = Batcher(val_ds, BATCH, shuffle=False, load_images=False)

    best, best_params = -1.0, params
    for epoch in range(epochs):
        t0 = time.perf_counter()
        metrics = None
        for batch in iter(train_b):
            batch = dict(batch, image_table=table)
            state, metrics = step(state, batch, rng)
        score, _ = evaluate(eval_step, state.params, val_b,
                            image_table=val_table)
        if score > best:
            best = score
            if keep_params:
                best_params = jax.device_get(state.params)
        print(f"[{tag}] epoch {epoch}: loss={float(metrics['loss']):.4f} "
              f"val={score:.3f}% best={best:.3f}% "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)
    return (best, best_params) if keep_params else best


def main(epochs: int = 15) -> None:
    train_ds, val_ds, image_size = load_corpus()

    jax.config.update("jax_default_prng_impl", "rbg")
    base = ModelConfig(num_tokens=train_ds.num_tokens, max_answers=1000,
                       image_size=image_size)
    dense = dataclasses.replace(
        base,
        image=dataclasses.replace(
            base.image, encoder="vit", patch_size=16,
            num_layers=4, num_heads=4,
            num_channels=(3, 256),
        ),
    )
    moe = dataclasses.replace(
        dense,
        image=dataclasses.replace(dense.image, moe_experts=8, moe_top_k=2),
    )

    best_dense = train_one("dense", dense, train_ds, val_ds, epochs)
    best_moe = train_one("moe", moe, train_ds, val_ds, epochs)
    print(json.dumps({
        "val_accuracy_dense_vit": round(best_dense, 3),
        "val_accuracy_moe_vit": round(best_moe, 3),
        "delta_pct_points": round(best_moe - best_dense, 3),
        "moe_shape": "8 experts, top-2, capacity 1.25, aux 0.01",
        "corpus": f"learnable, {len(train_ds)} train / "
                  f"{len(val_ds)} val @ {image_size}px, 1000 answers",
        "epochs": epochs,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 15)
