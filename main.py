"""Train entry point.

TPU-native counterpart of the reference's ``main.py``
(``/root/reference/main.py:26-146``): same orchestration — config init,
logger, seed, build-or-load vocab / image caches / datasets, model build,
optional warm start, train, hparam+metric report — with Hydra-style
dotlist overrides on the command line:

    python main.py main.use_full=false train.num_epochs=2
"""

from __future__ import annotations

import os
import sys
from typing import Optional

import jax

from dl_vqa_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()


def main(cfg: dict) -> float:
    import jax.numpy as jnp

    from dl_vqa_tpu import config as config_mod
    from dl_vqa_tpu.data import vocab as vocab_mod
    from dl_vqa_tpu.data.dataset import StaleImageCacheError, VQADataset
    from dl_vqa_tpu.data.images import preprocess_images
    from dl_vqa_tpu.data.pipeline import Batcher
    from dl_vqa_tpu.models import ModelConfig, vqa
    from dl_vqa_tpu.parallel import batch_sharding as make_batch_sharding
    from dl_vqa_tpu.parallel import make_mesh
    from dl_vqa_tpu.train import TrainParams, train
    from dl_vqa_tpu.parallel import multihost
    from dl_vqa_tpu.utils import misc
    from dl_vqa_tpu.utils.logger import QuietLogger, TrainLogger

    misc.init(cfg)
    zero_stage = cfg["tpu"].get("zero_stage", 0)
    if zero_stage not in (0, 1, 3):
        raise SystemExit(
            f"tpu.zero_stage must be 0 (off), 1 (shard Adam moments over "
            f"'data') or 3 (shard params too); got {zero_stage!r}. Stage 2 "
            f"does not exist here: gradients are temporaries inside the "
            f"fused train step and the SPMD partitioner already places them."
        )
    profile = cfg["main"]["full" if cfg["main"]["use_full"] else "small"]

    # Multi-host (one process per TPU host): joins the cluster iff the
    # JAX_COORDINATOR_ADDRESS env is set — must precede the first device
    # query below. Single-process runs no-op here.
    multihost.maybe_initialize(log=print)
    if multihost.is_coordinator():
        logger = TrainLogger(
            exp_name_prefix=cfg["main"]["experiment_name_prefix"],
            logs_dir=profile["paths"]["logs"],
            checkpoint_backend=cfg["tpu"].get("checkpoint_backend", "npz"),
        )
    else:
        # Non-coordinators compute the same replicated metrics but write
        # nothing; warnings still reach stderr with a process prefix.
        logger = QuietLogger(jax.process_index())
    logger.write(f"Devices: {jax.devices()}")
    logger.write(config_mod.to_yaml(cfg))
    misc.set_seed(cfg["main"]["seed"])

    # Build-or-load offline caches (vocab, h5 images, encoded datasets).
    # Multi-host: only the coordinator builds (shared filesystem assumed,
    # as on TPU pods); everyone else waits at the barrier below and loads.
    online_images = cfg["tpu"]["online_images"]
    vocab_path = profile["paths"]["vocab_path"]
    if multihost.is_coordinator():
        if not os.path.exists(vocab_path):
            logger.write("Creating Vocab")
            vocab_mod.create_vocab(
                data_base_path=profile["paths"]["base_path"],
                data_paths=profile["train_paths"],
                vocab_path=vocab_path,
                max_answers=cfg["train"]["max_answers"],
            )

        if not online_images:
            for split in ("train_paths", "val_paths"):
                processed = profile[split]["processed_imgs"]
                if not os.path.exists(processed):
                    logger.write(f"Processing {split} images -> {processed}")
                    preprocess_images(
                        other_paths=profile["paths"],
                        data_paths=profile[split],
                        image_size=cfg["train"]["image_size"],
                        central_fraction=cfg["train"]["central_fraction"],
                        processed_path=processed,
                        log=logger.write,
                        backend=cfg["tpu"]["image_builder_backend"],
                    )

    def load_or_build(split: str, answerable_only: bool) -> VQADataset:
        cache = VQADataset.cache_path(profile[split]["vqaDataset"])
        if os.path.exists(cache):
            try:
                loaded = VQADataset.load(cache)
            except (KeyError, StaleImageCacheError) as e:
                # older cache version, or the h5 image store was rebuilt
                # since the row map was persisted
                logger.write(f"Rebuilding stale cache {cache}: {e}")
            else:
                if online_images or loaded.has_image_rows:
                    logger.write(f"Loading VQA {split} dataset from {cache}")
                    return loaded
                logger.write(
                    f"Cache {cache} was built in online-image mode; "
                    "rebuilding with the h5 row map"
                )
        else:
            logger.write(f"Creating {split} dataset")
        ds = VQADataset(
            data_paths=profile[split],
            other_paths=profile["paths"],
            logger=logger,
            answerable_only=answerable_only,
            require_image_cache=not online_images,
        )
        ds.save(cache)
        return ds

    if multihost.is_coordinator():
        train_dataset = load_or_build("train_paths", answerable_only=True)
        val_dataset = load_or_build("val_paths", answerable_only=False)
    multihost.barrier("offline-caches-built")
    if not multihost.is_coordinator():
        train_dataset = load_or_build("train_paths", answerable_only=True)
        val_dataset = load_or_build("val_paths", answerable_only=False)

    # Model
    model_cfg = ModelConfig.from_cfg(
        cfg["train"], train_dataset.num_tokens,
        use_pallas=cfg["tpu"]["use_pallas"],
    )
    params = vqa.init(jax.random.PRNGKey(cfg["main"]["seed"]), model_cfg)

    opt_restore_path = None
    if cfg["main"]["start_from_pretrained_model"]:
        from dl_vqa_tpu.utils.checkpoint import load_params

        pretrained = profile["paths"]["pretrained_model_path"]
        if pretrained.endswith((".pth", ".pt")):
            params = load_params(pretrained, params)
            logger.write(f"Loaded torch params from {pretrained}")
        else:
            opt_restore_path = pretrained  # full state incl. optimizer
    logger.write(vqa.summary(params))

    # Mesh + sharding (single chip degenerates to no-op sharding).
    mesh_cfg = cfg["tpu"]["mesh"]
    stage = mesh_cfg.get("stage", 1)
    expert = mesh_cfg.get("expert", 1)
    seq = mesh_cfg.get("seq", 1)
    if expert > 1 and (
        cfg["train"]["image"].get("moe_experts", 0) < 1
        or cfg["train"]["image"]["encoder"] != "vit"
    ):
        raise SystemExit(
            "tpu.mesh.expert > 1 needs train.image.encoder=vit with "
            "train.image.moe_experts > 0 (there are no expert-major "
            "parameters to shard otherwise)"
        )
    if seq > 1 and cfg["train"]["image"]["encoder"] != "vit":
        raise SystemExit(
            "tpu.mesh.seq > 1 needs train.image.encoder=vit "
            "(the cnn stack has no token dimension to shard)"
        )
    mesh = make_mesh(mesh_cfg["data"], mesh_cfg["model"], stage,
                     expert=expert, seq=seq)
    if zero_stage and mesh.shape["data"] <= 1:
        logger.write(
            f"tpu.zero_stage={zero_stage} is a no-op: the 'data' mesh axis "
            f"has 1 device, so there is nothing to shard the optimizer "
            f"state over"
        )
    b_sharding = make_batch_sharding(mesh)
    pipeline_ctx = None
    if stage > 1:
        from dl_vqa_tpu.parallel.pipeline import PipelineContext

        micro = cfg["tpu"].get("pipeline_microbatches", 0) or stage
        pipeline_ctx = PipelineContext(mesh, num_microbatches=micro)
    seq_ctx = None
    if seq > 1:
        from dl_vqa_tpu.parallel import SequenceContext

        seq_ctx = SequenceContext(mesh)
    state_sharding = None
    # Param placement is needed for tp (model > 1), pp (stage > 1) AND
    # ep (expert > 1): a pure-pipeline mesh still needs the ViT layer
    # stack placed on its 'stage' axis, or the shard_map in_specs
    # re-shard the replicated stack inside every step (involuntary
    # rematerialization); an ep mesh needs the expert-major MoE weights
    # on their 'expert' shards.
    if (mesh.shape["model"] > 1 or stage > 1 or expert > 1
            or (zero_stage and mesh.shape["data"] > 1)):
        from dl_vqa_tpu.parallel import param_shardings, state_shardings
        from dl_vqa_tpu.train.steps import make_optimizer
        from dl_vqa_tpu.train.state import create_train_state

        # eval_shape: sharding derivation needs only structure + shapes —
        # no real (unsharded, 3x-param-sized) state allocation.
        template = jax.eval_shape(
            lambda p: create_train_state(
                p, make_optimizer(cfg["train"]["lr"]["lr_value"])
            ),
            params,
        )
        state_sharding = state_shardings(
            template, param_shardings(params, mesh), mesh,
            zero_stage=zero_stage,
        )
    compute_dtype = jnp.bfloat16 if cfg["tpu"]["compute_dtype"] == "bfloat16" \
        else jnp.float32
    if cfg["tpu"]["debug_nans"]:
        jax.config.update("jax_debug_nans", True)
    # 'rbg' dropout-mask RNG is ~20% faster train steps on TPU.
    jax.config.update("jax_default_prng_impl", cfg["tpu"]["prng_impl"])

    # Device-resident image cache (tpu.device_image_cache): upload the
    # whole fp16 feature store once and ship only row indices per batch
    # (the step gathers on device) — see dl_vqa_tpu/data/device_cache.py
    # for the shared policy and docs/PERF_NOTES.md for the measurement.
    from dl_vqa_tpu.data.device_cache import plan_image_tables

    if online_images:
        # Online batches carry in-batch uint8 JPEGs decoded on the fly;
        # the step never reads a feature table, so uploading one (a
        # dataset built earlier in h5 mode can still have image rows)
        # would only waste HBM.
        train_image_table = eval_image_table = None
    else:
        # Works in multihost runs too: each process contributes its
        # addressable block (device_cache._upload via
        # make_array_from_process_local_data).
        tables = plan_image_tables(
            cfg, {"train": train_dataset, "val": val_dataset},
            mesh=mesh, log=logger.write,
        )
        train_image_table = tables["train"]
        eval_image_table = tables["val"]

    if online_images:
        from dl_vqa_tpu.data.online import JpegLoader, OnlineBatcher

        loader_cls = JpegLoader
        if cfg["tpu"]["native_loader"]:
            from dl_vqa_tpu.data.native_loader import NativeJpegLoader

            loader_cls = NativeJpegLoader

        def make_loader(split):
            return loader_cls(
                os.path.join(
                    profile["paths"]["base_path"], profile[split]["imgs"]
                ),
                image_size=cfg["train"]["image_size"],
                central_fraction=cfg["train"]["central_fraction"],
                num_threads=cfg["main"]["num_workers"],
            )

    # Multi-host: each process feeds only its contiguous row block of
    # every global batch (the seed-shared shuffle keeps the global batch
    # composition identical to a single-process run).
    proc_slice = multihost.process_batch_slice(
        b_sharding, cfg["train"]["batch_size"]
    )
    if online_images:
        train_batcher = OnlineBatcher(
            train_dataset, cfg["train"]["batch_size"],
            make_loader("train_paths"), shuffle=True, seed=cfg["main"]["seed"],
            process_slice=proc_slice,
        )
        val_batcher = OnlineBatcher(
            val_dataset, cfg["train"]["batch_size"], make_loader("val_paths"),
            process_slice=proc_slice,
        )
    else:
        train_batcher = Batcher(
            train_dataset, cfg["train"]["batch_size"], shuffle=True,
            seed=cfg["main"]["seed"],
            load_images=train_image_table is None,
            process_slice=proc_slice,
        )
        val_batcher = Batcher(val_dataset, cfg["train"]["batch_size"],
                              load_images=eval_image_table is None,
                              process_slice=proc_slice)

    train_params = TrainParams.from_cfg(cfg)
    metrics = train(
        model_cfg, params, train_batcher, val_batcher, train_params, logger,
        opt_restore_path=opt_restore_path,
        compute_dtype=compute_dtype,
        seed=cfg["main"]["seed"],
        batch_sharding=b_sharding,
        state_sharding=state_sharding,
        prefetch_depth=cfg["tpu"]["prefetch_depth"],
        profile_dir=cfg["tpu"]["profile_dir"],
        remat=cfg["tpu"]["remat"],
        accum_steps=cfg["tpu"].get("grad_accum_steps", 1),
        checkpoint_every_steps=cfg["tpu"].get("checkpoint_every_steps", 0),
        pipeline_ctx=pipeline_ctx,
        seq_ctx=seq_ctx,
        train_image_table=train_image_table,
        eval_image_table=eval_image_table,
    )

    logger.report_metrics_hyper_params(
        config_mod.flatten(cfg["train"]), metrics
    )
    result = float(metrics["Metrics/BestAccuracy"])
    logger.close()  # sweeps run many trials per process; don't leak handlers
    return result


def multirun_main(config_name: str, args, runner=None,
                  max_trials: Optional[int] = None) -> float:
    """Hydra-style multirun: comma-valued overrides span the search space
    (``train.image.stride=1,2``), single-valued ones apply to every trial;
    bracketed values (``key=[3, 8]``) are single list values, as in
    Hydra's choice-sweep convention. Maximizes ``main()``'s returned best
    accuracy through the sweep driver with the reference sweeper's
    early-stop semantics (``config.yaml:91-132``).

    By default EVERY combination runs (Hydra's basic-sweeper behavior);
    pass ``--trials N`` among the args to cap the budget, in which case
    the driver switches to TPE model-based search when the space exceeds
    it (the Ax-plugin behavior). Returns the best value."""
    from sweep import parse_space, run_sweep, space_size

    args = list(args)
    if max_trials is None and "--trials" in args:
        at = args.index("--trials")
        try:
            max_trials = int(args[at + 1])
        except (IndexError, ValueError):
            raise SystemExit("--trials needs an integer, e.g. --trials 8")
        del args[at:at + 2]

    def _is_choice(a):
        if "=" not in a:
            raise SystemExit(
                f"multirun (-m) overrides must be key=value; got {a!r}"
            )
        v = a.split("=", 1)[1].strip()
        return "," in v and not v.startswith(("[", "{"))

    space_args = [a for a in args if _is_choice(a)]
    base = [a for a in args if a not in space_args]
    if not space_args:
        raise SystemExit(
            "multirun (-m) needs at least one comma-valued override, "
            "e.g. train.image.stride=1,2"
        )
    if max_trials is None:
        max_trials = space_size(parse_space(space_args))
    if runner is None:
        from dl_vqa_tpu import config as config_mod

        def runner(overrides):
            return main(config_mod.compose(config_name,
                                           overrides=list(overrides)))

    _, best, _ = run_sweep(parse_space(space_args), max_trials=max_trials,
                           base_overrides=base, runner=runner)
    return best


if __name__ == "__main__":
    from dl_vqa_tpu import config as config_mod

    # First arg without '=' selects a config preset (config_san,
    # config_transformer_co, ...); the rest are dotlist overrides.
    args = sys.argv[1:]
    multirun = False
    if args and args[0] in ("-m", "--multirun"):
        # Hydra-style multirun (the reference sweeps with `python main.py
        # -m`, config.yaml:4): comma-valued overrides span the search
        # space, single-valued ones apply to every trial; the sweep
        # driver (sweep.py) maximizes main()'s returned accuracy with
        # the reference's trial budget / early-stop semantics (TPE when
        # the space exceeds the budget).
        multirun, args = True, args[1:]
    config_name = "config"
    if args and "=" not in args[0]:
        config_name, args = args[0], args[1:]
    if multirun:
        print(multirun_main(config_name, args))
    else:
        composed = config_mod.compose(config_name, overrides=args)
        print(main(composed))
