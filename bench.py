"""Throughput benchmark: QA pairs/sec/chip on the flagship VqaNet eval path.

Measures the fused jitted eval step (forward + soft-CE + VQA metric) at
full reference scale: 224x224 images, 3-block conv stack (3->64->128->256),
bi-LSTM(1024), 2-glimpse attention, 3000 answers. BASELINE.md target:
>=10,000 QA pairs/sec/chip on one v5e chip.

Methodology: the eval loop runs ON DEVICE via ``lax.fori_loop`` over a
pool of pre-staged batches (cycled round-robin), accumulating the loss so
no iteration can be elided; a single scalar readback ends the run. This
amortizes host->device dispatch latency (which on relay-backed runtimes is
a fixed ~30ms per call — larger than the step itself) the same way a real
serving loop would, while still timing every step's full compute.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from dl_vqa_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()

BASELINE_QA_PER_SEC = 10_000.0
BATCH_SIZE = 512
POOL = 4          # distinct staged batches, cycled
ITERS = 50        # eval steps per timed run
CAL_BATCH = 64    # PTQ calibration sample for the int8 modes


def _tiny_replace(cfg):
    """CI scale-down hook: with DL_VQA_BENCH_TINY=1 every bench mode runs
    the same code paths on a toy model so the harness itself is testable
    on CPU (tests/test_bench.py). Production numbers REQUIRE the default
    reference scale — never set this when recording measurements."""
    import dataclasses

    image = dataclasses.replace(
        cfg.image,
        num_channels=(3, 32) if cfg.image.encoder == "vit" else (3, 8, 16, 32),
        num_layers=2,
    )
    text = dataclasses.replace(
        cfg.text, question_features=32, embedding_features=16
    )
    return dataclasses.replace(
        cfg, image=image, text=text, image_size=32, num_tokens=199,
        max_answers=50,
        attention=dataclasses.replace(cfg.attention, hidden_dim=24),
        classifier=dataclasses.replace(cfg.classifier, hidden_dim=32),
    )


def build(vit: bool = False, f8_stem: bool = False, int8_stem: bool = False,
          moe: bool = False, int8_vit: bool = False):
    import dataclasses

    from dl_vqa_tpu.models import ModelConfig, vqa

    if f8_stem and int8_stem:
        raise SystemExit("--f8-stem and --int8-stem are mutually exclusive")
    if vit and int8_stem:
        raise SystemExit(
            "--int8-stem is a CNN-stem serving mode; the ViT family has "
            "no conv blocks to quantize (drop --vit or --int8-stem)"
        )
    if moe and (f8_stem or int8_stem):
        raise SystemExit("--moe is a ViT mode; drop the cnn-stem flags")
    if int8_vit and (f8_stem or int8_stem or moe):
        raise SystemExit(
            "--int8-vit (W8A8 ViT block matmuls) conflicts with the "
            "cnn-stem flags and --moe"
        )
    cfg = ModelConfig(num_tokens=15_193)  # full reference-scale defaults
    if vit:
        cfg = dataclasses.replace(
            cfg,
            image=dataclasses.replace(
                cfg.image, encoder="vit", patch_size=16, num_layers=4,
                num_heads=4, num_channels=(3, 256),
            ),
        )
    if moe:
        # `--moe` (implies --vit): every block's MLP is an 8-expert top-2
        # MoE FFN (ops/moe.py) — the capability bench; on one chip all
        # experts are local, so this measures the dispatch/combine
        # einsum overhead against the dense MLP at equal model dim.
        cfg = dataclasses.replace(
            cfg,
            image=dataclasses.replace(cfg.image, moe_experts=8, moe_top_k=2),
        )
    if f8_stem:
        # Opt-in inference mode (`--f8-stem`): 8-bit activation storage
        # between each cnn conv and its pool (train.image.store_dtype).
        cfg = dataclasses.replace(
            cfg, image=dataclasses.replace(cfg.image, store_dtype="f8e4m3")
        )
    if os.environ.get("DL_VQA_BENCH_TINY"):
        cfg = _tiny_replace(cfg)
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    if int8_stem:
        # Opt-in W8A8 serving mode (`--int8-stem`): s8xs8->s32 MXU convs
        # with static PTQ scales, calibrated here on a sample batch (the
        # bench inputs ARE its data distribution; see ops/conv_int8).
        from dl_vqa_tpu.ops.conv_int8 import with_calibrated_scales

        cal = jnp.asarray(
            np.random.default_rng(7).standard_normal(
                (CAL_BATCH, cfg.image_size, cfg.image_size, 3)
            ),
            dtype=jnp.bfloat16,
        )
        cfg = with_calibrated_scales(cfg, params, cal)
    if int8_vit:
        # `--int8-vit` (implies --vit): qkv/out/MLP matmuls on the int8
        # MXU path with static PTQ scales calibrated here on a sample
        # batch (ops/vit_int8; the bench inputs ARE its distribution).
        from dl_vqa_tpu.ops.vit_int8 import with_calibrated_vit_scales

        cal = jnp.asarray(
            np.random.default_rng(7).standard_normal(
                (CAL_BATCH, cfg.image_size, cfg.image_size, 3)
            ),
            dtype=jnp.bfloat16,
        )
        cfg = with_calibrated_vit_scales(cfg, params, cal)
    return cfg, params


def make_batch(cfg, batch_size: int, seed: int = 0, image_dtype=np.float32):
    rng = np.random.default_rng(seed)
    batch = {
        "images": rng.standard_normal(
            (batch_size, cfg.image_size, cfg.image_size, 3)
        ).astype(image_dtype),
        "questions": rng.integers(
            0, cfg.num_tokens, (batch_size, 23)
        ).astype(np.int32),
        "lengths": rng.integers(3, 24, (batch_size,)).astype(np.int32),
        "answer_indices": rng.integers(
            1, cfg.max_answers + 1, (batch_size, 10)
        ).astype(np.int32),
        "answer_values": rng.integers(0, 11, (batch_size, 10)).astype(np.int32),
        "mask": np.ones((batch_size,), dtype=bool),
    }
    return batch


def make_bench_fn(cfg, pool):
    """One jitted program: ITERS eval steps over the staged pool,
    accumulating (loss, score) so nothing can be dead-code-eliminated."""
    from dl_vqa_tpu.ops.vqa_metrics import vqa_batch_stats
    from dl_vqa_tpu.models import vqa as vqa_model

    stacked = {
        k: jnp.stack([jnp.asarray(b[k]) for b in pool]) for k in pool[0]
    }
    # Images staged in bf16: halves HBM residency/traffic; the model
    # computes in bf16 anyway.
    stacked["images"] = stacked["images"].astype(jnp.bfloat16)

    def eval_once(params, batch):
        logits = vqa_model.apply(
            params, cfg,
            batch["images"], batch["questions"], batch["lengths"],
            train=False, compute_dtype=jnp.bfloat16,
        )
        return vqa_batch_stats(
            logits, batch["answer_indices"], batch["answer_values"],
            batch["mask"],
        )

    @jax.jit
    def run(params, staged):
        def body(i, acc):
            batch = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x, i % POOL, keepdims=False
                ),
                staged,
            )
            loss, score = eval_once(params, batch)
            return (acc[0] + loss, acc[1] + score)

        return jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros(()), jnp.zeros(()))
        )

    return run, stacked


TRAIN_ITERS = 20  # train steps per timed on-device loop


def bench_train(vit: bool = False, f8_stem: bool = False,
                moe: bool = False) -> None:
    """Optional train-throughput mode (`python bench.py --train [--vit]`):
    TRAIN_ITERS fused fwd+bwd+Adam steps at batch 512 run as ONE jitted
    ``lax.fori_loop`` threading the train state (so dispatch RTT is
    amortized the same way as the eval bench; the loop is inherently
    sequential — step i consumes step i-1's params — so nothing can be
    elided). One scalar readback ends the run."""
    from dl_vqa_tpu.train.state import create_train_state
    from dl_vqa_tpu.train.steps import make_optimizer, make_train_step

    jax.config.update("jax_default_prng_impl", "rbg")  # main.py's default
    cfg, params = build(vit=vit, f8_stem=f8_stem, moe=moe)
    tx = make_optimizer(5e-4)
    state = create_train_state(params, tx)
    raw_step = make_train_step(cfg, tx, compute_dtype=jnp.bfloat16, jit=False)

    pool = [make_batch(cfg, BATCH_SIZE, seed=s) for s in range(POOL)]
    staged = {
        k: jnp.stack([jnp.asarray(b[k]) for b in pool]) for k in pool[0]
    }
    staged["images"] = staged["images"].astype(jnp.bfloat16)
    staged = jax.device_put(staged)
    rng = jax.random.PRNGKey(0)

    @jax.jit
    def run(state, staged, rng):
        def body(i, carry):
            st, acc = carry
            batch = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x, i % POOL, keepdims=False
                ),
                staged,
            )
            st, metrics = raw_step(st, batch, rng)
            return (st, acc + metrics["loss"])

        _, acc = jax.lax.fori_loop(
            0, TRAIN_ITERS, body, (state, jnp.zeros(()))
        )
        return acc

    acc = run(state, staged, rng)
    assert np.isfinite(float(acc))  # compile + sync
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc = run(state, staged, rng)
        float(acc)
        times.append(time.perf_counter() - t0)
    elapsed = min(times)
    # The staged pool is a plain (unsharded) device_put, so the jitted
    # loop runs on ONE device regardless of host device count — the
    # throughput is already per-chip (don't divide by device_count()).
    samples_per_sec = BATCH_SIZE * TRAIN_ITERS / elapsed
    from dl_vqa_tpu.utils import flops as flops_util

    mfu = flops_util.mfu(
        flops_util.train_flops_per_sample(cfg), samples_per_sec
    )
    print(
        json.dumps(
            {
                "metric": "train_samples_per_sec_per_chip",
                "value": round(samples_per_sec, 1),
                "unit": "samples/s/chip (%s fused train step, batch %d x %d "
                "steps, on-device loop)"
                % ("ViT-MoE" if moe else ("ViT" if vit else "VQA"),
                   BATCH_SIZE, TRAIN_ITERS),
                "vs_baseline": None,
                "mfu": None if mfu is None else round(mfu, 4),
            }
        )
    )


def bench_latency(batch_size: int = 8, vit: bool = False,
                  f8_stem: bool = False, int8_stem: bool = False,
                  moe: bool = False, int8_vit: bool = False) -> None:
    """Optional serving-latency mode (`python bench.py --latency [--vit]`):
    per-query device latency at a small batch, measured with the
    on-device loop (amortizing dispatch RTT like a pipelined server)."""
    cfg, params = build(vit=vit, f8_stem=f8_stem, int8_stem=int8_stem,
                        moe=moe, int8_vit=int8_vit)
    pool = [make_batch(cfg, batch_size, seed=s) for s in range(POOL)]
    run, staged = make_bench_fn(cfg, pool)
    staged = jax.device_put(staged)
    loss, _ = run(params, staged)
    float(loss)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        loss, _ = run(params, staged)
        float(loss)
        times.append(time.perf_counter() - t0)
    ms_per_step = min(times) / ITERS * 1e3
    from dl_vqa_tpu.utils import flops as flops_util

    # Single-device staging (plain device_put): the step's throughput is
    # already per-chip — no device_count() normalization.
    mfu = flops_util.mfu(
        flops_util.eval_flops_per_sample(cfg),
        batch_size / (ms_per_step / 1e3),
    )
    print(
        json.dumps(
            {
                "metric": "eval_latency_ms_per_batch",
                "value": round(ms_per_step, 2),
                "unit": "ms per batch-%d %s eval step (pipelined)"
                % (batch_size,
                   "ViT-MoE" if moe else
                   ("ViT-int8" if int8_vit else
                    ("ViT" if vit else "VQA"))),
                "vs_baseline": None,
                "mfu": None if mfu is None else round(mfu, 4),
            }
        )
    )


def main(vit: bool = False, f8_stem: bool = False,
         int8_stem: bool = False, moe: bool = False,
         int8_vit: bool = False) -> None:
    cfg, params = build(vit=vit, f8_stem=f8_stem, int8_stem=int8_stem,
                        moe=moe, int8_vit=int8_vit)
    n_chips = jax.device_count()
    batch_size = BATCH_SIZE * n_chips  # scale work with the mesh
    pool = [make_batch(cfg, batch_size, seed=s) for s in range(POOL)]
    run, staged = make_bench_fn(cfg, pool)

    if n_chips > 1:
        # Data-parallel mesh: batch axis (dim 1 of the staged pool)
        # sharded over 'data'; params replicate under jit.
        from jax.sharding import NamedSharding, PartitionSpec as P

        from dl_vqa_tpu.parallel import make_mesh

        mesh = make_mesh(data=n_chips, model=1)
        sharding = NamedSharding(mesh, P(None, "data"))
        staged = {k: jax.device_put(v, sharding) for k, v in staged.items()}
    else:
        staged = jax.device_put(staged)

    # Warmup / compile; scalar fetch forces full execution.
    loss, score = run(params, staged)
    assert np.isfinite(float(loss)) and np.isfinite(float(score))

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        loss, score = run(params, staged)
        float(loss)  # sync
        times.append(time.perf_counter() - t0)
    elapsed = min(times)

    qa_per_sec_per_chip = batch_size * ITERS / elapsed / n_chips
    model_tag = ("ViT-MoE" if moe else
                 ("ViT-int8" if int8_vit else ("ViT" if vit else "VQA")))
    from dl_vqa_tpu.utils import flops as flops_util

    mfu = flops_util.mfu(
        flops_util.eval_flops_per_sample(cfg), qa_per_sec_per_chip
    )
    print(
        json.dumps(
            {
                "metric": "qa_pairs_per_sec_per_chip",
                "value": round(qa_per_sec_per_chip, 1),
                "unit": "QA pairs/s/chip (%s eval, batch %d x %d steps, "
                "%d chip(s))" % (model_tag, batch_size, ITERS, n_chips),
                "vs_baseline": round(
                    qa_per_sec_per_chip / BASELINE_QA_PER_SEC, 3
                ),
                "mfu": None if mfu is None else round(mfu, 4),
            }
        )
    )


def bench_e2e(vit: bool = False, moe: bool = False) -> None:
    """End-to-end training-pipeline mode (`python bench.py --e2e [--vit]`):
    builds (once, cached under /tmp) an at-scale synthetic corpus — 20k
    train QA pairs over 1,500 distinct 224px images — then times a full
    epoch through the REAL pipeline: Batcher -> prefetch -> fused train
    step, with the device-resident image cache (tpu.device_image_cache
    semantics). This measures what the step benches cannot: the host
    data plane and host->device transfers. See docs/PERF_NOTES.md
    ("End-to-end training data plane") for the measured history
    (187.7 s/epoch before the device cache, ~4 s after, on v5e).

    On non-TPU backends the corpus shrinks so the mode stays runnable.
    """
    import dataclasses
    import os

    from dl_vqa_tpu.data.dataset import VQADataset
    from dl_vqa_tpu.data.pipeline import Batcher, prefetch_to_device
    from dl_vqa_tpu.data import synthetic
    from dl_vqa_tpu.models import ModelConfig, vqa
    from dl_vqa_tpu.train.state import create_train_state
    from dl_vqa_tpu.train.steps import make_optimizer, make_train_step

    on_tpu = jax.default_backend() == "tpu"
    n_train, n_images, image_size = (
        (20_000, 1_500, 224) if on_tpu else (512, 64, 64)
    )
    root = f"/tmp/dl_vqa_e2e_{n_train}_{image_size}"
    if not os.path.exists(os.path.join(root, "vocab.json")):
        synthetic.make_synthetic_corpus(
            root, n_train=n_train, n_val=64, n_images=n_images,
            image_size=image_size, max_answers=1000,
        )
    cache = os.path.join(root, "ds_train.npz")
    if os.path.exists(VQADataset.cache_path(cache)):
        ds = VQADataset.load(VQADataset.cache_path(cache))
    else:
        ds = VQADataset(
            data_paths={
                "questions": "train_questions.json",
                "answers": "train_annotations.json",
                "processed_imgs": os.path.join(
                    root, "processed_train_images.h5"
                ),
                "vqaDataset": cache,
            },
            other_paths={
                "base_path": root,
                "vocab_path": os.path.join(root, "vocab.json"),
            },
            answerable_only=True,
        )
        ds.save(cache)

    jax.config.update("jax_default_prng_impl", "rbg")
    cfg = ModelConfig(num_tokens=ds.num_tokens, max_answers=1000,
                      image_size=image_size)
    if vit:
        cfg = dataclasses.replace(
            cfg,
            image=dataclasses.replace(
                cfg.image, encoder="vit", patch_size=16, num_layers=4,
                num_heads=4, num_channels=(3, 256),
            ),
        )
    if moe:
        # Same 8-expert top-2 shape as build()'s --moe (kept in lockstep
        # so --e2e --moe measures the configuration the step benches do).
        cfg = dataclasses.replace(
            cfg,
            image=dataclasses.replace(cfg.image, moe_experts=8, moe_top_k=2),
        )
    if os.environ.get("DL_VQA_BENCH_TINY"):
        # Shrink the net but keep the dataset-bound fields (vocab size,
        # answer space, corpus image size) so the real pipeline still fits.
        cfg = dataclasses.replace(
            _tiny_replace(cfg), num_tokens=ds.num_tokens,
            max_answers=1000, image_size=image_size,
        )
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(5e-4)
    state = create_train_state(params, tx)
    step = make_train_step(cfg, tx, compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    table = jax.device_put(ds.features_nhwc_all())
    batcher = Batcher(ds, BATCH_SIZE, shuffle=True, load_images=False)

    def epoch():
        nonlocal state
        t0 = time.perf_counter()
        metrics = None
        for batch in prefetch_to_device(iter(batcher), None, 2):
            batch = dict(batch, image_table=table)
            state, metrics = step(state, batch, rng)
        assert np.isfinite(float(metrics["loss"]))  # sync
        return time.perf_counter() - t0

    epoch()  # warmup: compile + page in the store
    elapsed = min(epoch(), epoch())
    samples_per_sec = len(ds) / elapsed
    from dl_vqa_tpu.utils import flops as flops_util

    # Unsharded jit step: one device does the work, so the epoch
    # throughput is already the per-chip number; use the corpus' actual
    # question pad length rather than the reference default.
    mfu = flops_util.mfu(
        flops_util.train_flops_per_sample(
            cfg, seq_len=ds.max_question_length
        ),
        samples_per_sec,
    )
    print(
        json.dumps(
            {
                "metric": "e2e_train_samples_per_sec",
                "value": round(samples_per_sec, 1),
                "unit": "samples/s end-to-end (%s, %d-sample epoch incl. "
                "host pipeline, batch %d, device image cache)"
                % ("ViT-MoE" if moe else ("ViT" if vit else "VQA"),
                   len(ds), BATCH_SIZE),
                "vs_baseline": None,
                "mfu": None if mfu is None else round(mfu, 4),
            }
        )
    )


if __name__ == "__main__":
    import sys

    vit = "--vit" in sys.argv
    f8_stem = "--f8-stem" in sys.argv
    int8_stem = "--int8-stem" in sys.argv
    moe = "--moe" in sys.argv
    int8_vit = "--int8-vit" in sys.argv
    vit = vit or moe or int8_vit  # ViT family variants
    if "--e2e" in sys.argv:
        if int8_vit or int8_stem:
            raise SystemExit(
                "the int8 modes are inference-only; --e2e measures a "
                "training epoch — use them with the eval/latency modes"
            )
        bench_e2e(vit=vit, moe=moe)
    elif "--train" in sys.argv:
        if int8_stem or int8_vit:
            raise SystemExit(
                "the int8 modes are inference-only (static PTQ scales "
                "need trained weights); use them with the eval/latency "
                "modes"
            )
        bench_train(vit=vit, f8_stem=f8_stem, moe=moe)
    elif "--latency" in sys.argv:
        bench_latency(vit=vit, f8_stem=f8_stem, int8_stem=int8_stem,
                      moe=moe, int8_vit=int8_vit)
    else:
        main(vit=vit, f8_stem=f8_stem, int8_stem=int8_stem, moe=moe,
             int8_vit=int8_vit)
