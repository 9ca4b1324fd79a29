"""Epoch-level training loop.

Control flow mirrors the reference trainer (``/root/reference/train.py:
38-141``) — per-epoch train pass, eval pass, TensorBoard scalars,
best-model checkpointing, early stop after ``n_epochs_stop`` stagnant
epochs once ``epoch > 3`` — while the per-batch work runs as one fused
jitted step on device.

Metric accounting preserved exactly:
* train/eval loss = mean of per-batch losses (each batch-mean'd);
* score = 100 * sum(per-sample scores) / len(dataset).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dl_vqa_tpu.data.pipeline import Batcher, prefetch_to_device
from dl_vqa_tpu.models.configs import ModelConfig
from dl_vqa_tpu.train.state import create_train_state
from dl_vqa_tpu.train.steps import make_eval_step, make_optimizer, make_train_step

__all__ = ["TrainParams", "train", "evaluate", "get_metrics"]


@dataclasses.dataclass
class TrainParams:
    """Flat hyperparameter view of ``cfg['train']`` (ref
    ``utils/train_utils.py:54-90``; lr_decay/lr_gamma/lr_step_size carried
    for config parity but unused — the reference's StepLR is dead code)."""

    n_epochs_stop: int
    num_epochs: int
    lr: float
    lr_decay: float
    lr_gamma: float
    lr_step_size: int
    save_model: bool
    max_answers: int

    @classmethod
    def from_cfg(cls, cfg: Dict) -> "TrainParams":
        t = cfg["train"]
        return cls(
            n_epochs_stop=t["n_epochs_stop"],
            num_epochs=t["num_epochs"],
            lr=t["lr"]["lr_value"],
            lr_decay=t["lr"]["lr_decay"],
            lr_gamma=t["lr"]["lr_gamma"],
            lr_step_size=t["lr"]["lr_step_size"],
            save_model=t["save_model"],
            max_answers=t["max_answers"],
        )


def get_metrics(best_eval_score: float, eval_score: float,
                train_loss: float) -> Dict[str, float]:
    return {
        "Metrics/BestAccuracy": best_eval_score,
        "Metrics/LastAccuracy": eval_score,
        "Metrics/LastLoss": train_loss,
    }


def evaluate(eval_step, params, batcher: Batcher, sharding=None,
             prefetch_depth: int = 2, breakdown: bool = False,
             image_table=None):
    """Full eval pass -> (score%, mean loss)[, per-type breakdown dict].

    Per-batch results accumulate as DEVICE scalars (a float() per batch
    would block one dispatch round trip each step — ~30 ms on
    relay-backed runtimes); only the totals cross to the host.

    ``breakdown=True`` requires an eval step built with
    ``with_breakdown=True`` and returns a third value:
    ``{"yes/no": %, "number": %, "other": %}`` (official VQA categories).
    """
    n_batches = len(batcher)
    n_samples = len(batcher.dataset)
    loss_total = score_total = sums_total = counts_total = None
    for batch in prefetch_to_device(iter(batcher), sharding, prefetch_depth):
        if image_table is not None:
            batch = dict(batch, image_table=image_table)
        out = eval_step(params, batch)
        loss, score = out[0], out[1]
        loss_total = loss if loss_total is None else loss_total + loss
        score_total = score if score_total is None else score_total + score
        if breakdown:
            sums, counts = out[2], out[3]
            sums_total = sums if sums_total is None else sums_total + sums
            counts_total = (
                counts if counts_total is None else counts_total + counts
            )
    if loss_total is None:
        return (0.0, 0.0, {}) if breakdown else (0.0, 0.0)
    result = (
        float(score_total) / max(n_samples, 1) * 100.0,
        float(loss_total) / max(n_batches, 1),
    )
    if breakdown:
        import numpy as np

        sums = np.asarray(sums_total)
        counts = np.asarray(counts_total)
        per_type = {
            name: float(s / c * 100.0)
            for name, s, c in zip(("yes/no", "number", "other"), sums, counts)
            if c > 0
        }
        return result + (per_type,)
    return result


def train(
    model_cfg: ModelConfig,
    params: Dict,
    train_batcher: Batcher,
    eval_batcher: Batcher,
    train_params: TrainParams,
    logger,
    opt_restore_path: Optional[str] = None,
    compute_dtype=jnp.bfloat16,
    seed: int = 1,
    batch_sharding=None,
    state_sharding=None,
    prefetch_depth: int = 2,
    profile_dir: str = "",
    remat: bool = False,
    accum_steps: int = 1,
    pipeline_ctx=None,
    seq_ctx=None,
    train_image_table=None,
    eval_image_table=None,
    checkpoint_every_steps: int = 0,
) -> Dict[str, float]:
    """Train to convergence / early stop; returns the reference's metrics
    dict (``Metrics/BestAccuracy`` etc.).

    ``checkpoint_every_steps > 0`` (``tpu.checkpoint_every_steps``) also
    writes the rolling crash-recovery checkpoint every N batches WITHIN
    an epoch (metadata carries the batch position + the epoch's partial
    loss/score sums), so a restart resumes the interrupted epoch at the
    exact batch instead of replaying it — the shuffle order is derived
    statelessly from (seed, epoch) (``Batcher.epoch_order``) and dropout
    from the restored step counter, so the resumed trajectory is
    identical to the uninterrupted one. Each in-epoch save syncs the
    device-scalar accumulators (one blocking fetch per N steps): choose N
    large enough that the sync amortizes (seconds of step time)."""
    tx = make_optimizer(train_params.lr)
    state = create_train_state(params, tx)
    best_eval_score = 0.0
    epochs_no_improve = 0
    start_epoch = 0
    resume_start_batch = 0
    resume_accum = None
    last_eval_score = 0.0
    last_train_loss = 0.0
    if opt_restore_path:
        from dl_vqa_tpu.utils.checkpoint import restore_state_meta

        state, restore_meta = restore_state_meta(state, opt_restore_path)
        restored_epoch = restore_meta.get("epoch")
        logger.write(f"Restored full train state, epoch: {restored_epoch}")
        if "best_eval_score" in restore_meta:
            # Rolling crash-recovery checkpoint (last.ckpt): CONTINUE the
            # interrupted run — keep the best score (so a worse
            # post-resume epoch can't overwrite the best checkpoint or
            # under-report Metrics/BestAccuracy), the early-stop counter,
            # and the epoch budget. Checkpoints without resume metadata
            # (best-model saves, reference .pth warm starts) keep the
            # reference's warm-start semantics: retrain from epoch 0.
            best_eval_score = float(restore_meta["best_eval_score"])
            epochs_no_improve = int(restore_meta.get("epochs_no_improve", 0))
            last_eval_score = float(restore_meta.get("last_eval_score", 0.0))
            last_train_loss = float(restore_meta.get("last_train_loss", 0.0))
            if restored_epoch is not None:
                if "batch_in_epoch" in restore_meta:
                    # Mid-epoch save: resume the SAME epoch at the next
                    # batch, with its partial metric sums carried over so
                    # the epoch's reported loss/score match an
                    # uninterrupted run exactly.
                    start_epoch = int(restored_epoch)
                    resume_start_batch = int(restore_meta["batch_in_epoch"])
                    resume_accum = restore_meta.get("epoch_accum") or {}
                else:
                    start_epoch = int(restored_epoch) + 1
            logger.write(
                f"Resuming at epoch {start_epoch}"
                + (f", batch {resume_start_batch}" if resume_start_batch
                   else "")
                + f" with best eval score {best_eval_score:.4f} "
                f"({epochs_no_improve} epochs without improvement)"
            )
    if state_sharding is not None:
        # Tensor-parallel training: place params + Adam moments in their
        # mesh layout up front (see parallel.state_shardings). Must follow
        # any restore — restore_state returns host arrays, which would
        # silently drop an earlier placement.
        state = jax.device_put(state, state_sharding)

    train_step = make_train_step(model_cfg, tx, compute_dtype, remat=remat,
                                 accum_steps=accum_steps,
                                 pipeline_ctx=pipeline_ctx, seq_ctx=seq_ctx)
    eval_step = make_eval_step(model_cfg, compute_dtype,
                               pipeline_ctx=pipeline_ctx, seq_ctx=seq_ctx)
    rng = jax.random.PRNGKey(seed)

    # Seeded from the restore so a run whose epoch budget is already
    # exhausted (start_epoch >= num_epochs: the loop below never runs)
    # still reports its restored best score instead of an empty dict
    # (main.py reads Metrics/BestAccuracy unconditionally).
    metrics = get_metrics(best_eval_score, last_eval_score, last_train_loss)
    if start_epoch >= train_params.num_epochs:
        logger.write(
            f"Restored run already completed its epoch budget "
            f"({start_epoch} >= num_epochs={train_params.num_epochs}); "
            f"nothing to train — reporting restored metrics"
        )
    # Recorded in checkpoint metadata so the predictor encodes questions at
    # the trained length instead of assuming a default.
    max_q_len = getattr(train_batcher.dataset, "max_question_length", None)
    ckpt_meta = (
        {"max_question_length": int(max_q_len)} if max_q_len else None
    )
    # Multi-host: every process computes the same (fully replicated)
    # metrics, but only the coordinator writes checkpoints. Model/stage-
    # sharded leaves span processes, so gathering them to host numpy is a
    # COLLECTIVE — non-coordinators must mirror each save with
    # ckpt.host_snapshot(state) (identical pytree walk) or the
    # coordinator's gather deadlocks.
    save_model = train_params.save_model
    is_coordinator = jax.process_index() == 0
    if checkpoint_every_steps > 0 and not save_model:
        # Checkpointing (including the crash-recovery rolling save) hangs
        # off train.save_model; a mid-epoch cadence without it would be a
        # silent no-op — say so instead of letting a crash find out.
        logger.write(
            "WARNING: tpu.checkpoint_every_steps="
            f"{checkpoint_every_steps} has no effect because "
            "train.save_model is false — no mid-epoch checkpoints will "
            "be written"
        )

    graph_reported = False
    for epoch in range(start_epoch, train_params.num_epochs):
        # Profile the second epoch: the first is dominated by compilation.
        if profile_dir and epoch == 1:
            jax.profiler.start_trace(profile_dir)
        t0 = time.time()
        n_batches = len(train_batcher)
        n_samples = len(train_batcher.dataset)
        # Device-scalar accumulation: see evaluate() for why not float().
        loss_total = score_total = aux_total = None
        start_batch = resume_start_batch if epoch == start_epoch else 0
        if start_batch and not hasattr(train_batcher, "iter_epoch"):
            # A duck-typed batcher without mid-epoch support would replay
            # the epoch from batch 0; applying the resume metadata anyway
            # would silently retrain the first ``start_batch`` batches AND
            # double-count their losses on top of the seeded partial sums.
            logger.write(
                f"WARNING: checkpoint requests mid-epoch resume at batch "
                f"{start_batch} but the batcher has no iter_epoch(); "
                f"replaying epoch {epoch} from batch 0 (epoch metrics "
                f"restart; trajectory will not match the uninterrupted run)"
            )
            start_batch = 0
            resume_accum = None
        if start_batch and resume_accum is not None:
            # Partial sums of the interrupted epoch (host floats from the
            # checkpoint metadata): seed the accumulators so the resumed
            # epoch's reported metrics equal the uninterrupted run's.
            if "loss" in resume_accum:
                loss_total = jnp.float32(resume_accum["loss"])
                score_total = jnp.float32(resume_accum.get("score", 0.0))
            if "aux" in resume_accum:
                aux_total = jnp.float32(resume_accum["aux"])
        if hasattr(train_batcher, "iter_epoch"):
            epoch_iter = train_batcher.iter_epoch(epoch, start_batch)
        else:  # duck-typed batcher without mid-epoch support
            epoch_iter = iter(train_batcher)
        batch_idx = start_batch

        for batch in prefetch_to_device(
            epoch_iter, batch_sharding, prefetch_depth
        ):
            if train_image_table is not None:
                batch = dict(batch, image_table=train_image_table)
            if not graph_reported and hasattr(
                logger, "report_compiled_graph"
            ):
                # Once per run, on the first batch: the reference's TB
                # model-graph hook, delivered as the step's StableHLO.
                logger.report_compiled_graph(train_step, state, batch, rng)
                graph_reported = True
            state, step_metrics = train_step(state, batch, rng)
            loss, score = step_metrics["loss"], step_metrics["score"]
            loss_total = loss if loss_total is None else loss_total + loss
            score_total = score if score_total is None else score_total + score
            aux = step_metrics.get("moe_aux")
            if aux is not None:
                aux_total = aux if aux_total is None else aux_total + aux
            batch_idx += 1
            if (
                checkpoint_every_steps > 0
                and save_model
                and batch_idx % checkpoint_every_steps == 0
                and batch_idx < n_batches
            ):
                # Mid-epoch rolling checkpoint: position + partial metric
                # sums ride the metadata so a restart resumes THIS epoch
                # at the next batch. The float() fetches sync the step
                # stream — the documented per-N cost of the feature.
                epoch_accum = {"loss": float(loss_total),
                               "score": float(score_total)}
                if aux_total is not None:
                    epoch_accum["aux"] = float(aux_total)
                # last_* carry the previous epoch-end metrics so a restore
                # whose epoch budget was meanwhile reduced to <= this epoch
                # still reports real Metrics/LastAccuracy / LastLoss
                # instead of 0.0 on the exhausted-budget path.
                _save_rolling(
                    logger, state, epoch, model_cfg, ckpt_meta,
                    best_eval_score, epochs_no_improve, is_coordinator,
                    batch_in_epoch=batch_idx, epoch_accum=epoch_accum,
                    last_eval_score=last_eval_score,
                    last_train_loss=last_train_loss,
                )

        # The float() conversions force completion of every queued step —
        # they must precede the epoch timing.
        train_loss = (
            float(loss_total) if loss_total is not None else 0.0
        ) / max(n_batches, 1)
        train_score = (
            float(score_total) if score_total is not None else 0.0
        ) / max(n_samples, 1) * 100.0

        if profile_dir and epoch == 1:
            jax.profiler.stop_trace()
            logger.write(f"Profiler trace written to {profile_dir}")

        epoch_seconds = max(time.time() - t0, 1e-9)
        n_chips = max(jax.device_count(), 1)
        # A resumed epoch only ran the tail: rate its throughput over the
        # batches it actually executed, not the full epoch's counts.
        batches_run = n_batches - start_batch
        samples_run = (
            n_samples - start_batch * train_batcher.batch_size
            if start_batch and hasattr(train_batcher, "batch_size")
            else n_samples * batches_run // max(n_batches, 1)
        )
        scalars = {
            "Throughput/StepsPerSec": batches_run / epoch_seconds,
            "Throughput/QAPairsPerSecPerChip":
                samples_run / epoch_seconds / n_chips,
        }
        if aux_total is not None:
            # Expert-balance health for MoE configs: 1.0 == uniform
            # routing; sustained growth means expert collapse.
            scalars["Loss/MoEBalanceTrain"] = (
                float(aux_total) / max(n_batches, 1)
            )
        logger.report_scalars(scalars, epoch)

        eval_score, eval_loss = evaluate(
            eval_step, state.params, eval_batcher, batch_sharding,
            prefetch_depth, image_table=eval_image_table,
        )

        logger.write_epoch_statistics(
            epoch=epoch, epoch_time=time.time() - t0, train_loss=train_loss,
            norm=0, train_score=train_score, eval_score=eval_score,
        )
        logger.report_scalars(
            {
                "Accuracy/Train": train_score,
                "Accuracy/Validation": eval_score,
                "Loss/Train": train_loss,
                "Loss/Validation": eval_loss,
            },
            epoch,
        )
        logger.report_scalars_same_plot(
            {
                "Accuracy": {"Train": train_score, "Validation": eval_score},
                "Loss": {"Train": train_loss, "Validation": eval_loss},
            },
            epoch,
        )

        if eval_score > best_eval_score:
            epochs_no_improve = 0
            best_eval_score = eval_score
            if save_model:
                if is_coordinator or _orbax_backend(logger):
                    # Orbax saves are themselves GLOBAL collectives (every
                    # process writes its addressable shards and joins
                    # Orbax's barriers), so every process must call save;
                    # only the npz path is coordinator-gated.
                    logger.save_model(state, epoch, model_cfg,
                                      extra_meta=ckpt_meta)
                else:
                    from dl_vqa_tpu.utils import checkpoint as ckpt

                    ckpt.host_snapshot(state)  # join the gather collective
        else:
            epochs_no_improve += 1

        # Carried into the next epoch's mid-epoch rolling saves and the
        # epoch-end save below (ADVICE r3: mid-epoch checkpoints used to
        # omit them, zeroing LastAccuracy/LastLoss on exhausted-budget
        # restores).
        last_eval_score = float(eval_score)
        last_train_loss = float(train_loss)

        if save_model:
            # Crash recovery: overwrite a rolling full-state checkpoint
            # (params + Adam moments + step) every epoch. The serialization
            # and write run on a background thread off the critical path.
            # No batch_in_epoch: the epoch is complete, a restart starts
            # the NEXT one. The epoch's metrics ride along so a restart
            # whose budget is already exhausted can report them.
            _save_rolling(logger, state, epoch, model_cfg, ckpt_meta,
                          best_eval_score, epochs_no_improve, is_coordinator,
                          last_eval_score=last_eval_score,
                          last_train_loss=last_train_loss)

        metrics = get_metrics(best_eval_score, eval_score, train_loss)
        if epoch > 3 and epochs_no_improve == train_params.n_epochs_stop:
            logger.write("Early stopping!")
            return _finish(metrics)

    return _finish(metrics)


def _save_rolling(logger, state, epoch, model_cfg, ckpt_meta,
                  best_eval_score, epochs_no_improve, is_coordinator,
                  **extra_meta):
    """Write (or, on non-coordinators, mirror) the rolling crash-recovery
    checkpoint. Resume progress rides the metadata so a restart continues
    the run instead of re-warm-starting it (best score, early-stop
    counter, epoch budget); mid-epoch callers add batch_in_epoch /
    epoch_accum via ``extra_meta``. Multi-host: gathering sharded leaves
    is a COLLECTIVE — non-coordinators must walk the identical pytree via
    host_snapshot or the coordinator's gather deadlocks, so any change
    here applies to both branches at once by construction."""
    from dl_vqa_tpu.utils import checkpoint as ckpt

    if is_coordinator or _orbax_backend(logger):
        # Orbax saves are global collectives — every process must make
        # the identical call (all the metadata inputs are replicated
        # computations, so the args agree across processes); only the
        # npz gather is coordinator-gated with host_snapshot mirroring.
        resume_meta = dict(ckpt_meta or {})
        resume_meta["best_eval_score"] = float(best_eval_score)
        resume_meta["epochs_no_improve"] = int(epochs_no_improve)
        resume_meta.update(extra_meta)
        ckpt.save_checkpoint_async(
            _rolling_path(logger), state,
            epoch=epoch, model_cfg=model_cfg, extra_meta=resume_meta,
        )
    else:
        ckpt.host_snapshot(state)  # join the gather collective


def _orbax_backend(logger) -> bool:
    return getattr(logger, "checkpoint_backend", "npz") == "orbax"


def _rolling_path(logger) -> str:
    """Path of the rolling crash-recovery checkpoint for this run."""
    import os

    last_name = (
        "last.ckpt"
        if getattr(logger, "checkpoint_backend", "npz") == "npz"
        else "last.ckpt.orbax"
    )
    return os.path.join(logger.exp_dir, last_name)


def _finish(metrics):
    """Join any in-flight async checkpoint write before handing control
    back (the rolling last.ckpt must be complete when train() returns)."""
    from dl_vqa_tpu.utils.checkpoint import wait_for_async_saves

    wait_for_async_saves()
    return metrics
