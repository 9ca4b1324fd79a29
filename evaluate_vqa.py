"""Evaluation entry point.

Counterpart of the reference's ``evaluate_vqa.py``
(``/root/reference/evaluate_vqa.py:21-91``): compose the eval config,
rebuild vocab / val image cache if missing, load the val dataset, load the
checkpoint (ours or a reference ``model.pth``), run the full eval pass,
and return the VQA accuracy rounded to 3 decimals.
"""

from __future__ import annotations

import os
import sys

from dl_vqa_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()


def evaluate_hw2(overrides=()) -> float:
    import jax
    import jax.numpy as jnp

    from dl_vqa_tpu import config as config_mod
    from dl_vqa_tpu.data import vocab as vocab_mod
    from dl_vqa_tpu.data.dataset import load_or_build_val_dataset
    from dl_vqa_tpu.data.pipeline import Batcher
    from dl_vqa_tpu.models import ModelConfig, vqa
    from dl_vqa_tpu.parallel import batch_sharding as make_batch_sharding
    from dl_vqa_tpu.parallel import make_mesh
    from dl_vqa_tpu.train import make_eval_step
    from dl_vqa_tpu.train.loop import evaluate
    from dl_vqa_tpu.utils import misc
    from dl_vqa_tpu.utils.checkpoint import load_params
    from dl_vqa_tpu.utils.logger import TrainLogger

    cfg = config_mod.compose("config_eval", overrides=list(overrides))
    print(config_mod.to_yaml(cfg))
    profile = cfg["main"]["full" if cfg["main"]["use_full"] else "small"]

    logger = TrainLogger(
        exp_name_prefix=cfg["main"]["experiment_name_prefix"],
        logs_dir=profile["paths"]["logs"],
    )
    misc.set_seed(cfg["main"]["seed"])

    vocab_path = profile["paths"]["vocab_path"]
    if not os.path.exists(vocab_path):
        vocab_mod.create_vocab(
            data_base_path=profile["paths"]["base_path"],
            data_paths=profile["train_paths"],
            vocab_path=vocab_path,
            max_answers=cfg["train"]["max_answers"],
        )

    online_images = cfg["tpu"]["online_images"]
    val_dataset = load_or_build_val_dataset(
        cfg, profile, logger=logger, log=logger.write,
        require_image_cache=not online_images,
    )

    model_cfg = ModelConfig.from_cfg(
        cfg["train"], val_dataset.num_tokens,
        use_pallas=cfg["tpu"]["use_pallas"],
    )
    template = vqa.init(jax.random.PRNGKey(0), model_cfg)
    params, ckpt_meta = load_params(
        profile["paths"]["pretrained_model_path"], template, with_meta=True
    )

    compute_dtype = jnp.bfloat16 if cfg["tpu"]["compute_dtype"] == "bfloat16" \
        else jnp.float32
    if model_cfg.image.store_dtype == "int8" \
            and not model_cfg.image.quant_scales:
        import dataclasses

        import numpy as np

        meta_scales = (ckpt_meta.get("model_cfg") or {}).get(
            "image", {}).get("quant_scales")
        if meta_scales:
            # Calibrate-once checkpoints (Predictor.calibrate_int8
            # save_to=...) carry their scales — score EXACTLY the
            # numerics the deployment serves, don't recalibrate.
            model_cfg = dataclasses.replace(
                model_cfg,
                image=dataclasses.replace(
                    model_cfg.image,
                    quant_scales=tuple(float(s) for s in meta_scales),
                ),
            )
            logger.write(
                "int8 stem: using calibrated scales from checkpoint "
                f"metadata: {model_cfg.image.quant_scales}"
            )
        else:
            # Auto-calibrate on TRAIN-distribution images (the protocol
            # behind the published accuracy numbers, see
            # experiments/probe_f8_accuracy.py): calibrating on the val
            # images being scored would leak the eval set into the
            # served configuration. Falls back to val images (with a
            # caveat) only when no train cache exists.
            if model_cfg.image.encoder == "vit":
                from dl_vqa_tpu.ops.vit_int8 import (
                    with_calibrated_vit_scales as with_calibrated_scales,
                )
            else:
                from dl_vqa_tpu.ops.conv_int8 import with_calibrated_scales

            train_h5 = os.path.join(
                profile["paths"]["base_path"],
                profile["train_paths"]["processed_imgs"],
            ) if not os.path.isabs(
                profile["train_paths"]["processed_imgs"]
            ) else profile["train_paths"]["processed_imgs"]
            if os.path.exists(train_h5):
                import h5py

                with h5py.File(train_h5, "r") as fd:
                    feats = fd["features"]
                    rows = np.unique(np.linspace(
                        0, feats.shape[0] - 1, min(feats.shape[0], 256)
                    ).astype(np.int64))
                    cal = np.asarray(feats[rows]).transpose(0, 2, 3, 1)
                source = f"{len(rows)} train-cache images"
            else:
                if online_images:
                    raise ValueError(
                        "train.image.store_dtype=int8 auto-calibration "
                        "reads a processed image cache; build one (run "
                        "with tpu.online_images=false), use a "
                        "calibrate-once checkpoint (predict.Predictor."
                        "calibrate_int8 save_to=...), or set "
                        "image.quant_scales programmatically"
                    )
                n_cal = min(len(val_dataset), 256)
                rows = np.linspace(
                    0, len(val_dataset) - 1, n_cal
                ).astype(np.int64)
                cal = val_dataset.load_images_nhwc(rows)
                source = (f"{n_cal} VAL images (no train cache at "
                          f"{train_h5!r} — score may be optimistic vs "
                          "a train-calibrated deployment)")
            model_cfg = with_calibrated_scales(
                model_cfg, params, jnp.asarray(cal), dtype=compute_dtype,
            )
            logger.write(
                f"int8 stem: calibrated activation scales over {source}: "
                f"{model_cfg.image.quant_scales}"
            )

    mesh_cfg = cfg["tpu"]["mesh"]
    stage = mesh_cfg.get("stage", 1)
    mesh = make_mesh(mesh_cfg["data"], mesh_cfg["model"], stage,
                     expert=mesh_cfg.get("expert", 1),
                     seq=mesh_cfg.get("seq", 1))
    pipeline_ctx = None
    if stage > 1:
        from dl_vqa_tpu.parallel.pipeline import PipelineContext

        micro = cfg["tpu"].get("pipeline_microbatches", 0) or stage
        pipeline_ctx = PipelineContext(mesh, num_microbatches=micro)
    seq_ctx = None
    if mesh_cfg.get("seq", 1) > 1:
        from dl_vqa_tpu.parallel import SequenceContext

        seq_ctx = SequenceContext(mesh)

    eval_step = make_eval_step(model_cfg, compute_dtype, with_breakdown=True,
                               pipeline_ctx=pipeline_ctx, seq_ctx=seq_ctx)
    if online_images:
        from dl_vqa_tpu.data.online import JpegLoader, OnlineBatcher

        loader_cls = JpegLoader
        if cfg["tpu"]["native_loader"]:
            from dl_vqa_tpu.data.native_loader import NativeJpegLoader

            loader_cls = NativeJpegLoader
        loader = loader_cls(
            os.path.join(
                profile["paths"]["base_path"], profile["val_paths"]["imgs"]
            ),
            image_size=cfg["train"]["image_size"],
            central_fraction=cfg["train"]["central_fraction"],
            num_threads=cfg["main"]["num_workers"],
        )
        batcher = OnlineBatcher(val_dataset, cfg["train"]["batch_size"], loader)
        image_table = None
    else:
        from dl_vqa_tpu.data.device_cache import plan_image_tables

        image_table = plan_image_tables(
            cfg, {"val": val_dataset}, mesh=mesh, log=logger.write,
        )["val"]
        batcher = Batcher(val_dataset, cfg["train"]["batch_size"],
                          load_images=image_table is None)
    score, _, per_type = evaluate(
        eval_step, params, batcher, make_batch_sharding(mesh),
        cfg["tpu"]["prefetch_depth"], breakdown=True,
        image_table=image_table,
    )
    logger.write(
        "Per-type accuracy: "
        + ", ".join(f"{k}: {v:.2f}" for k, v in per_type.items())
    )
    return round(score, 3)


if __name__ == "__main__":
    print(evaluate_hw2(sys.argv[1:]))
