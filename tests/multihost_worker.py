"""Standalone worker for tests/test_multihost.py — NOT a pytest module.

Runs the real Batcher -> prefetch_to_device -> fused-train-step -> eval
pipeline on a tiny model, either single-process (8 virtual devices) or
as one rank of a gloo-coordinated multi-process CPU cluster (4 virtual
devices per rank by default), and prints a single JSON line of per-step
losses/scores + the final eval so the test can compare the two modes.
This is the real multi-controller code path (jax.distributed +
make_array_from_process_local_data + cross-process collectives), not a
simulation — the same recipe runs one process per host on a TPU pod.
"""

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=1)
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--local-devices", type=int, default=8)
    ap.add_argument("--global-batch", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--model-axis", type=int, default=1,
                    help="tensor-parallel mesh axis (params sharded over "
                         "'model'; exercises the non-addressable-leaf "
                         "checkpoint gather in multi-process runs)")
    ap.add_argument("--device-cache", default="",
                    choices=["", "replicated", "sharded"],
                    help="exercise the device-resident image-table path "
                         "(multihost upload via "
                         "make_array_from_process_local_data)")
    ap.add_argument("--save-ckpt", default="",
                    help="after training, save a coordinator-gated "
                         "checkpoint here (non-coordinators mirror with "
                         "host_snapshot) and report its content sums")
    ap.add_argument("--train-loop", action="store_true",
                    help="drive the REAL train/loop.py::train (incl. "
                         "rolling crash-recovery checkpoints) instead of "
                         "the raw-step pipeline")
    ap.add_argument("--exp-dir", default="",
                    help="train-loop mode: logger/checkpoint directory")
    ap.add_argument("--checkpoint-every-steps", type=int, default=0)
    ap.add_argument("--resume", default="",
                    help="train-loop mode: restore full train state from "
                         "this rolling checkpoint before training")
    ap.add_argument("--kill-rank", type=int, default=-1,
                    help="fault injection: this rank hard-exits "
                         "(os._exit(1), no shutdown) right after its "
                         "first MID-EPOCH rolling checkpoint is durably "
                         "on disk — simulates losing one host of the pod")
    ap.add_argument("--ckpt-backend", default="npz",
                    choices=["npz", "orbax"],
                    help="train-loop mode: rolling-checkpoint backend "
                         "(orbax exercises the every-process collective "
                         "save path in train/loop.py::_save_rolling)")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.procs > 1:
        # XLA's CPU cross-process collective fabric (stands in for DCN).
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        from dl_vqa_tpu.parallel import multihost

        multihost.initialize(
            coordinator_address=f"127.0.0.1:{args.port}",
            num_processes=args.procs,
            process_id=args.pid,
        )

    import jax.numpy as jnp
    import numpy as np

    from dl_vqa_tpu.data.pipeline import Batcher, prefetch_to_device
    from dl_vqa_tpu.models import ModelConfig, vqa
    from dl_vqa_tpu.models.configs import (
        AttentionConfig,
        ClassifierConfig,
        ImageConfig,
        TextConfig,
    )
    from dl_vqa_tpu.parallel import batch_sharding, make_mesh
    from dl_vqa_tpu.parallel import multihost
    from dl_vqa_tpu.train.loop import evaluate
    from dl_vqa_tpu.train.state import create_train_state
    from dl_vqa_tpu.train.steps import (
        make_eval_step,
        make_optimizer,
        make_train_step,
    )

    cfg = ModelConfig(
        text=TextConfig(question_features=16, embedding_features=8,
                        dropout=0.0),
        image=ImageConfig(num_channels=(3, 4, 8), dropout=0.0),
        attention=AttentionConfig(hidden_dim=16, glimpses=2, dropout=0.0),
        classifier=ClassifierConfig(hidden_dim=16, dropout=0.0),
        max_answers=16,
        image_size=32,
        num_tokens=32,
    )

    class TinyDataset:
        """Deterministic in-memory stand-in with the Batcher's dataset
        surface (questions/lengths/answers + load_images_nhwc)."""

        def __init__(self, n: int, seed: int):
            r = np.random.default_rng(seed)
            self.questions = r.integers(
                0, cfg.num_tokens, (n, 6)
            ).astype(np.int32)
            self.question_lengths = r.integers(1, 7, (n,)).astype(np.int32)
            self.answer_indices = r.integers(
                1, cfg.max_answers + 1, (n, 2)
            ).astype(np.int32)
            self.answer_values = r.integers(1, 10, (n, 2)).astype(np.int32)
            self._images = r.standard_normal(
                (n, cfg.image_size, cfg.image_size, 3)
            ).astype(np.float32)
            # Device-cache surface (mirrors VQADataset): identity row
            # map, a distinct per-dataset table id, fp16 upload size.
            self.h5_rows = np.arange(n)
            self.has_image_rows = True
            self.image_path = f"tiny-{seed}"

        def __len__(self) -> int:
            return len(self.questions)

        def load_images_nhwc(self, idx):
            return self._images[idx]

        @property
        def image_store_nbytes(self):
            return self._images.astype(np.float16).nbytes

        @property
        def image_store_rows(self):
            return len(self._images)

        def features_nhwc_all(self, dtype=np.float16, rows=None):
            imgs = self._images if rows is None else self._images[rows]
            return imgs.astype(dtype)

    mesh = make_mesh(data=-1, model=args.model_axis)  # all GLOBAL devices
    bsh = batch_sharding(mesh)
    gb = args.global_batch
    proc_slice = multihost.process_batch_slice(bsh, gb)

    # 3 batches/epoch; the last is padded (n not divisible by gb).
    train_ds = TinyDataset(2 * gb + gb // 2, seed=5)
    eval_ds = TinyDataset(gb + gb // 2, seed=9)
    use_cache = bool(args.device_cache)
    train_batcher = Batcher(train_ds, gb, shuffle=True, seed=3,
                            process_slice=proc_slice,
                            load_images=not use_cache)
    eval_batcher = Batcher(eval_ds, gb, process_slice=proc_slice,
                           load_images=not use_cache)
    train_table = eval_table = None
    if use_cache:
        from dl_vqa_tpu.data.device_cache import plan_image_tables

        tables = plan_image_tables(
            {"tpu": {"device_image_cache": "on",
                     "device_image_cache_layout": args.device_cache,
                     "device_image_cache_budget_gb": 0}},
            {"train": train_ds, "eval": eval_ds}, mesh=mesh,
        )
        train_table, eval_table = tables["train"], tables["eval"]

    params = vqa.init(jax.random.PRNGKey(0), cfg)

    if args.train_loop:
        # ---- real train/loop.py path: rolling checkpoints + resume ----
        from dl_vqa_tpu.train.loop import TrainParams, train
        from dl_vqa_tpu.utils import checkpoint as ckpt_mod

        if args.kill_rank >= 0:
            # Fault injection: the coordinator owns the rolling npz write,
            # so the kill is armed there — right AFTER the first mid-epoch
            # save is durably on disk (deterministic crash point).
            assert args.kill_rank == 0, "kill-rank must be the coordinator"
            if jax.process_index() == args.kill_rank:
                real_async = ckpt_mod.save_checkpoint_async

                def tripwire(path, state_, **kw):
                    real_async(path, state_, **kw)
                    if "batch_in_epoch" in (kw.get("extra_meta") or {}):
                        ckpt_mod.wait_for_async_saves()
                        sys.stdout.flush()
                        os._exit(1)  # hard host loss: no shutdown, no except

                ckpt_mod.save_checkpoint_async = tripwire

        class LoopLogger:
            checkpoint_backend = args.ckpt_backend

            def __init__(self, exp_dir):
                self.exp_dir = exp_dir
                self.epoch_stats = []

            def write(self, *a, **k):
                pass

            def write_epoch_statistics(self, **kw):
                self.epoch_stats.append(
                    {k: float(v) for k, v in kw.items()}
                )

            def report_scalars(self, scalars, epoch):
                pass

            def report_scalars_same_plot(self, scalars, epoch):
                pass

            def save_model(self, state_, epoch, model_cfg=None,
                           extra_meta=None):
                # Best-checkpoint saves aren't under test here; mirror the
                # snapshot walk so sharded-leaf gathers stay symmetric.
                ckpt_mod.host_snapshot(state_)

        os.makedirs(args.exp_dir, exist_ok=True)
        logger = LoopLogger(args.exp_dir)
        tp = TrainParams(n_epochs_stop=50, num_epochs=args.epochs, lr=1e-3,
                         lr_decay=0.0, lr_gamma=0.0, lr_step_size=1,
                         save_model=True, max_answers=cfg.max_answers)
        metrics = train(
            cfg, params, train_batcher, eval_batcher, tp, logger,
            opt_restore_path=args.resume or None,
            compute_dtype=jnp.float32, seed=1, batch_sharding=bsh,
            checkpoint_every_steps=args.checkpoint_every_steps,
        )
        ckpt_mod.wait_for_async_saves()
        multihost.barrier("train-loop-done")
        last_name = (
            "last.ckpt" if args.ckpt_backend == "npz" else "last.ckpt.orbax"
        )
        flat, meta = ckpt_mod.load_checkpoint(
            os.path.join(args.exp_dir, last_name)
        )
        print(json.dumps({
            "pid": jax.process_index(),
            "procs": jax.process_count(),
            "devices": jax.device_count(),
            "epoch_stats": logger.epoch_stats,
            "metrics": metrics,
            "ckpt_epoch": meta.get("epoch"),
            "ckpt_sum": float(sum(
                np.asarray(v, dtype=np.float64).sum()
                for v in flat.values()
            )),
            "ckpt_numel": int(sum(v.size for v in flat.values())),
        }))
        sys.stdout.flush()
        return

    tx = make_optimizer(1e-3)
    state = create_train_state(params, tx)
    if args.model_axis > 1:
        from dl_vqa_tpu.parallel import param_shardings, state_shardings

        state = jax.device_put(
            state, state_shardings(state, param_shardings(params, mesh),
                                   mesh)
        )
    train_step = make_train_step(cfg, tx, compute_dtype=jnp.float32)
    eval_step = make_eval_step(cfg, compute_dtype=jnp.float32)
    rng = jax.random.PRNGKey(7)

    losses, scores = [], []
    for _ in range(args.epochs):
        for batch in prefetch_to_device(iter(train_batcher), bsh):
            if train_table is not None:
                batch = dict(batch, image_table=train_table)
            state, m = train_step(state, batch, rng)
            losses.append(float(m["loss"]))
            scores.append(float(m["score"]))
    eval_score, eval_loss = evaluate(eval_step, state.params, eval_batcher,
                                     bsh, image_table=eval_table)

    ckpt_sums = None
    if args.save_ckpt:
        # The regression under test: with model-sharded (non-addressable)
        # leaves, the coordinator-gated save must gather collectively —
        # non-coordinators mirror it with host_snapshot — and the file
        # must round-trip the FULL global values.
        from dl_vqa_tpu.utils import checkpoint as ckpt

        if multihost.is_coordinator():
            ckpt.save_checkpoint(args.save_ckpt, state, epoch=0)
        else:
            ckpt.host_snapshot(state)
        multihost.barrier("ckpt-written")
        flat, _meta = ckpt.load_checkpoint(args.save_ckpt)
        live = ckpt.host_snapshot(state)
        ckpt_sums = {
            "saved_sum": float(sum(
                np.asarray(v, dtype=np.float64).sum() for v in flat.values()
            )),
            "live_sum": float(sum(
                np.asarray(leaf, dtype=np.float64).sum()
                for leaf in jax.tree_util.tree_leaves(live)
            )),
            "saved_numel": int(sum(v.size for v in flat.values())),
            "live_numel": int(sum(
                np.asarray(leaf).size
                for leaf in jax.tree_util.tree_leaves(live)
            )),
        }

    print(json.dumps({
        "pid": jax.process_index(),
        "procs": jax.process_count(),
        "devices": jax.device_count(),
        "losses": losses,
        "scores": scores,
        "eval_score": eval_score,
        "eval_loss": eval_loss,
        "ckpt": ckpt_sums,
    }))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
