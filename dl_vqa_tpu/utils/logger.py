"""Train logger: console + file + TensorBoard + checkpointing.

Same observable surface as the reference's ``TrainLogger``
(``/root/reference/utils/train_logger.py:18-195``): timestamped experiment
dir under ``logs_dir``, ``write``/``report_scalars``/
``report_scalars_same_plot``/``report_metrics_hyper_params``/
``write_epoch_statistics``/``save_model``, and identical scalar tag names
(``Accuracy/Train`` etc.) so existing dashboards carry over. TensorBoard
goes through ``tensorboardX`` when available and degrades to a no-op
otherwise.
"""

from __future__ import annotations

import itertools
import logging
import os
from datetime import datetime
from typing import Dict, Optional

__all__ = ["TrainLogger", "QuietLogger"]


class _NoOpWriter:
    def add_scalar(self, *a, **k): pass
    def add_scalars(self, *a, **k): pass
    def add_hparams(self, *a, **k): pass
    def flush(self): pass
    def close(self): pass


class QuietLogger:
    """TrainLogger surface for non-coordinator processes in multi-host
    runs: no experiment dir, no files, no TensorBoard — only warnings
    reach stderr (prefixed with the process index so interleaved output
    stays attributable). ``report_compiled_graph`` is deliberately NOT
    defined: the train loop feature-tests for it, and only the
    coordinator should dump the StableHLO.

    Bring-up escape hatch: ``DL_VQA_LOG_ALL_HOSTS=1`` makes every rank
    emit its info-level writes too (still rank-prefixed) — when a pod
    run wedges, the non-coordinators' progress lines are usually the
    evidence (which rank stopped feeding batches, who missed a save
    collective). Off by default so N-rank runs don't N-plicate logs."""

    exp_dir = None
    exp_name = None
    checkpoint_backend = "npz"

    def __init__(self, process_index: int = 0):
        self._prefix = f"[p{process_index}] "
        self._verbose = bool(os.environ.get("DL_VQA_LOG_ALL_HOSTS"))

    def write(self, text, epoch=None, severity: str = "info"):
        if severity == "warning" or self._verbose:
            log = f"(EPOCH {epoch}) {text}" if epoch is not None else text
            logger = logging.getLogger(__name__)
            if severity == "warning":
                logger.warning(self._prefix + str(log))
            else:
                # warning level keeps the line visible without the
                # coordinator's handler/format configuration
                logger.warning(self._prefix + "[info] " + str(log))

    def write_epoch_statistics(self, *a, **k): pass
    def report_scalar(self, *a, **k): pass
    def report_scalars(self, *a, **k): pass
    def report_scalar_same_plot(self, *a, **k): pass
    def report_scalars_same_plot(self, *a, **k): pass
    def report_metrics_hyper_params(self, *a, **k): pass
    def report_graph(self, *a, **k): pass

    def save_model(self, *a, **k):
        raise RuntimeError(
            "QuietLogger cannot save checkpoints — gate saves on "
            "parallel.multihost.is_coordinator()"
        )

    def close(self): pass


class TrainLogger:
    def __init__(self, exp_name_prefix: str = "", logs_dir: str = "logs",
                 checkpoint_backend: str = "npz"):
        if checkpoint_backend not in ("npz", "orbax"):
            raise ValueError(
                f"checkpoint_backend must be 'npz' or 'orbax', got "
                f"{checkpoint_backend!r}"
            )
        self.checkpoint_backend = checkpoint_backend
        os.makedirs(logs_dir, exist_ok=True)
        now = datetime.now()
        stamp = f"{now.month}_{now.day}_{now.hour}_{now.minute}_{now.second}"
        self.exp_name = f"{exp_name_prefix}_{stamp}"
        self.exp_dir = os.path.join(logs_dir, self.exp_name)
        # The second-resolution stamp (reference format) collides when
        # two trials start within one second (fast sweeps, parallel
        # processes) — they would then share the .log file AND the
        # model.ckpt path, one best checkpoint silently overwriting the
        # other. Claim the directory atomically; on collision, suffix.
        for attempt in range(1000):
            candidate = (
                self.exp_dir if attempt == 0 else f"{self.exp_dir}_{attempt}"
            )
            try:
                os.makedirs(candidate, exist_ok=False)
            except FileExistsError:
                continue
            if attempt:
                self.exp_name = f"{self.exp_name}_{attempt}"
            self.exp_dir = candidate
            break
        else:
            raise RuntimeError(
                f"could not claim a unique experiment dir under "
                f"{logs_dir!r} (1000 collisions for stamp {stamp})"
            )

        try:
            from tensorboardX import SummaryWriter

            self.tensorboard_writer = SummaryWriter(
                os.path.join(logs_dir, "tensorboard", self.exp_name)
            )
        except Exception:
            self.tensorboard_writer = _NoOpWriter()

        self.logger = self._init_logger(self.exp_dir, self.exp_name)

    def close(self) -> None:
        """Release the log handlers and the TensorBoard writer.

        Long-lived processes that run many trials (sweep.py, ``main.py
        -m``) create one TrainLogger per trial; ``logging``'s manager
        retains every named logger forever, so without closing, each
        trial leaks an open file handler for the process lifetime."""
        self.tensorboard_writer.close()
        for handler in list(self.logger.handlers):
            self.logger.removeHandler(handler)
            handler.close()

    # ----------------------------------------------------------- text

    def write(self, text: str, epoch: Optional[int] = None,
              severity: str = "info") -> None:
        log = f"(EPOCH {epoch}) {text}" if epoch is not None else str(text)
        if severity == "warning":
            self.logger.warning(log)
        else:
            self.logger.info(log)

    def write_epoch_statistics(self, epoch: int, epoch_time: float,
                               train_loss: float, norm: float,
                               train_score: float, eval_score: float) -> None:
        self.write(
            "Time: %.1f, Gradient norm: %.1f, Train loss: %.4f, "
            "Train Score: %.4f, Val score: %.4f"
            % (epoch_time, norm, train_loss, train_score, eval_score),
            epoch,
        )

    # ----------------------------------------------------------- scalars

    def report_scalar(self, tag: str, value: float, step: int) -> None:
        self.tensorboard_writer.add_scalar(tag, value, step)

    def report_scalars(self, scalars: Dict[str, float], epoch: int) -> None:
        for tag, value in scalars.items():
            self.report_scalar(tag, value, epoch)

    def report_scalar_same_plot(self, tag: str, values: Dict[str, float],
                                step: int) -> None:
        self.tensorboard_writer.add_scalars(tag, values, step)

    def report_scalars_same_plot(self, scalars: Dict[str, Dict[str, float]],
                                 epoch: int) -> None:
        for tag, values in scalars.items():
            self.report_scalar_same_plot(tag, values, epoch)

    def report_metrics_hyper_params(self, hyper_params: Dict,
                                    metrics: Dict) -> None:
        self.tensorboard_writer.add_hparams(hyper_params, metrics)

    def report_graph(self, params, model_cfg=None) -> None:
        """Model-structure report (counterpart of the reference's
        TensorBoard graph hook, ref train_logger.py:87-93): logs the
        per-subnet parameter summary as TensorBoard text."""
        from dl_vqa_tpu.models import vqa

        text = vqa.summary(params)
        if model_cfg is not None:
            text += f"\n\n{model_cfg}"
        try:
            self.tensorboard_writer.add_text("model/graph", text, 0)
        except AttributeError:
            pass
        self.write(text)

    def report_compiled_graph(self, jitted_fn, *example_args) -> Optional[str]:
        """TPU-native equivalent of the reference's TensorBoard model-graph
        hook (ref train_logger.py:87-93): dump the jitted train step's
        lowered StableHLO module — the actual compiled-program structure —
        to ``exp_dir/train_step_hlo.txt`` and TensorBoard text.

        ``lower()`` only traces (no device compile), so this is cheap; any
        failure degrades to a warning rather than breaking training."""
        try:
            text = jitted_fn.lower(*example_args).as_text()
        except Exception as exc:  # never let observability kill a run
            self.write(f"HLO graph dump failed: {exc}", severity="warning")
            return None
        path = os.path.join(self.exp_dir, "train_step_hlo.txt")
        with open(path, "w") as fd:
            fd.write(text)
        try:
            self.tensorboard_writer.add_text(
                "model/hlo", text[:65536], 0
            )
        except AttributeError:
            pass
        self.write(f"Jitted train-step HLO ({len(text)} bytes) -> {path}")
        return path

    # ----------------------------------------------------------- checkpoint

    def save_model(self, state, epoch: int, model_cfg=None,
                   extra_meta=None) -> str:
        """Save the best-model checkpoint into the experiment dir
        (best-eval-gated by the train loop, like ref train.py:129-133)."""
        from dl_vqa_tpu.utils import checkpoint as ckpt

        name = (
            "model.ckpt" if self.checkpoint_backend == "npz"
            else "model.ckpt.orbax"
        )
        path = os.path.join(self.exp_dir, name)
        self.write(f"Saving model to {path}")
        ckpt.save_checkpoint(path, state, epoch=epoch, model_cfg=model_cfg,
                             extra_meta=extra_meta)
        return path

    # ----------------------------------------------------------- internals

    # Experiment names have one-second resolution; a per-process sequence
    # keeps the logging channel unique so two TrainLoggers created within
    # the same second don't share handlers (the second one would otherwise
    # silently log into the first one's file and get no file of its own).
    _seq = itertools.count()

    @classmethod
    def _init_logger(cls, exp_dir: str, exp_name: str) -> logging.Logger:
        logger = logging.getLogger(f"TRAIN.{exp_name}.{next(cls._seq)}")
        logger.setLevel(logging.INFO)
        logger.propagate = False
        formatter = logging.Formatter(
            f"[%(asctime)s] [TRAIN.{exp_name}] - %(message)s"
        )
        console = logging.StreamHandler()
        console.setFormatter(formatter)
        logger.addHandler(console)
        fileh = logging.FileHandler(
            os.path.join(exp_dir, f"{exp_name}.log")
        )
        fileh.setFormatter(formatter)
        logger.addHandler(fileh)
        return logger
