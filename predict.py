"""Inference entry point: answer questions about images.

Goes beyond the reference's train/eval scripts with a serving-style API:

    python predict.py main.small.paths.pretrained_model_path=./model.ckpt \
        --image cat.jpg --question "what animal is this?"

    # official VQA submission format over a whole split:
    python predict.py --submission results.json [overrides...]

The Predictor class is the library surface: jitted batched forward,
tokenization through the training vocab, top-k answer decoding.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List, Optional, Sequence, Tuple

from dl_vqa_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()


class Predictor:
    """Batched VQA inference on a trained checkpoint."""

    def __init__(self, cfg: dict, checkpoint_path: str, vocab_path: str,
                 num_tokens: Optional[int] = None):
        import jax
        import jax.numpy as jnp

        from dl_vqa_tpu.data.vocab import load_vocab
        from dl_vqa_tpu.models import ModelConfig, vqa
        from dl_vqa_tpu.utils.checkpoint import load_params

        self.vocab = load_vocab(vocab_path)
        self.question_vocab = self.vocab["question"]
        self.answer_by_id = {
            idx: ans for ans, idx in self.vocab["answer"].items()
        }
        self.cfg = cfg
        self.image_size = cfg["train"]["image_size"]
        self.central_fraction = cfg["train"]["central_fraction"]

        self.model_cfg = ModelConfig.from_cfg(
            cfg["train"],
            num_tokens or (len(self.question_vocab) + 1),
            use_pallas=cfg["tpu"]["use_pallas"],
        )
        template = vqa.init(jax.random.PRNGKey(0), self.model_cfg)
        # One read for params AND metadata (a second load_checkpoint would
        # decompress the whole npz / rerun the Orbax restore again —
        # doubling serving cold-start).
        self.params, meta = load_params(
            checkpoint_path, template, with_meta=True
        )
        self._ckpt_meta = meta
        # Encode questions at the length the checkpoint was trained with
        # (stored in npz metadata); 23 is only the legacy fallback for
        # reference .pth checkpoints / pre-metadata saves — and that
        # fallback must be LOUD: silently truncating questions at the
        # wrong length degrades accuracy with no visible symptom.
        if meta.get("max_question_length"):
            self.max_question_length = int(meta["max_question_length"])
        else:
            import warnings

            self.max_question_length = 23
            warnings.warn(
                f"checkpoint {checkpoint_path!r} carries no "
                "max_question_length metadata (reference .pth import or "
                "pre-metadata save); assuming the reference default of 23 "
                "tokens. Questions longer than that will be truncated — "
                "re-save the checkpoint with utils.checkpoint."
                "save_checkpoint to record the trained length.",
                stacklevel=2,
            )
        self._compute_dtype = (
            jnp.bfloat16 if cfg["tpu"]["compute_dtype"] == "bfloat16"
            else jnp.float32
        )
        self._checkpoint_path = checkpoint_path
        # Calibrate-once workflow: a checkpoint saved by calibrate_int8
        # (or any save_checkpoint with a calibrated model_cfg) carries the
        # static activation scales in its metadata — adopt them so serving
        # restarts need no recalibration data.
        meta_scales = (meta.get("model_cfg") or {}).get(
            "image", {}).get("quant_scales")
        if (self.model_cfg.image.store_dtype == "int8"
                and not self.model_cfg.image.quant_scales and meta_scales):
            import dataclasses
            self.model_cfg = dataclasses.replace(
                self.model_cfg,
                image=dataclasses.replace(
                    self.model_cfg.image,
                    quant_scales=tuple(float(s) for s in meta_scales),
                ),
            )
        self._build_forward()

    def _build_forward(self):
        import jax

        from dl_vqa_tpu.models import vqa

        def forward(params, images, questions, lengths):
            return vqa.apply(
                params, self.model_cfg, images, questions, lengths,
                train=False, compute_dtype=self._compute_dtype,
            )

        self._forward = jax.jit(forward)

    # --------------------------------------------------------- int8 mode

    @property
    def needs_int8_calibration(self) -> bool:
        """True when the config asks for the W8A8 int8 serving stem but
        no static activation scales are set yet — the first forward would
        raise until :meth:`calibrate_int8` runs (ops/conv_int8)."""
        return (self.model_cfg.image.store_dtype == "int8"
                and not self.model_cfg.image.quant_scales)

    def calibrate_int8(self, images, save_to: Optional[str] = None) -> None:
        """Calibrate the int8 stem's static activation scales on a
        representative ``[B, H, W, 3]`` sample (e.g. :meth:`load_images`
        over deployment traffic) and rebuild the jitted forward.

        Must run before the first forward / warmup — the scales are
        jit-static, so serving numerics are fixed here, at calibration
        time (see ops/conv_int8 for the PTQ scheme).

        ``save_to``: optionally re-save the checkpoint (params unchanged)
        with the calibrated ``model_cfg`` in its metadata, so future
        ``Predictor``/``serve.py`` starts with ``store_dtype=int8`` pick
        the scales up without calibration data (calibrate once, deploy
        many).
        """
        import jax.numpy as jnp

        # Calibrator by encoder: cnn = per-block stem scales
        # (ops/conv_int8), vit = 4-per-block matmul-site scales
        # (ops/vit_int8, W8A8 projections/MLP).
        if self.model_cfg.image.encoder == "vit":
            from dl_vqa_tpu.ops.vit_int8 import (
                with_calibrated_vit_scales as with_calibrated_scales,
            )
        else:
            from dl_vqa_tpu.ops.conv_int8 import with_calibrated_scales

        self.model_cfg = with_calibrated_scales(
            self.model_cfg, self.params, jnp.asarray(images),
            dtype=self._compute_dtype,
        )
        self._build_forward()
        if save_to:
            from dl_vqa_tpu.utils.checkpoint import save_checkpoint

            # Carry the SOURCE checkpoint's metadata through unchanged
            # (minus model_cfg/epoch, passed explicitly). In particular,
            # do NOT invent max_question_length: if the source lacked it
            # (legacy/.pth import) the predictor only GUESSED the
            # reference default — persisting the guess as authoritative
            # metadata would silence the loud-fallback warning on every
            # future load while the truncation risk remains.
            extra = {k: v for k, v in self._ckpt_meta.items()
                     if k not in ("model_cfg", "epoch")}
            save_checkpoint(
                save_to, self.params, model_cfg=self.model_cfg,
                epoch=self._ckpt_meta.get("epoch"), extra_meta=extra,
            )

    # ------------------------------------------------------------- export

    def export_artifact(self, path: str, batch_sizes: Sequence[int] = (1, 8),
                        platforms: Optional[Sequence[str]] = None) -> None:
        """Write an AOT serving artifact (serialized StableHLO forward +
        weights + decode metadata) to the directory ``path`` — loadable
        by ``dl_vqa_tpu.utils.aot_export.load_artifact`` with no model
        code (see that module's docstring). Numerics are frozen at
        export: the current model_cfg (incl. any calibrated int8 scales
        and dispatch defaults) is compiled in."""
        from dl_vqa_tpu.models import vqa
        from dl_vqa_tpu.utils.aot_export import export_artifact

        model_cfg = self.model_cfg
        dtype = self._compute_dtype

        def forward(params, images, questions, lengths):
            return vqa.apply(params, model_cfg, images, questions, lengths,
                             train=False, compute_dtype=dtype)

        export_artifact(
            path, self.params, forward,
            batch_sizes=batch_sizes,
            image_size=self.image_size,
            max_question_length=self.max_question_length,
            vocab=self.vocab,
            central_fraction=self.central_fraction,
            platforms=platforms,
        )

    # ------------------------------------------------------------- text

    def encode_questions(self, questions: Sequence[str],
                         max_len: Optional[int] = None):
        import numpy as np

        from dl_vqa_tpu.data.dataset import encode_question
        from dl_vqa_tpu.data.text import normalize_question

        if max_len is None:
            max_len = self.max_question_length
        encoded = np.zeros((len(questions), max_len), dtype=np.int32)
        lengths = np.zeros(len(questions), dtype=np.int32)
        for i, q in enumerate(questions):
            if not q.endswith("?"):
                q = q + "?"
            # Same tokenizer + id encoding as training (dataset.py); only
            # the length clamp is serving-specific.
            tokens = normalize_question(q)[:max_len]
            encoded[i], n = encode_question(
                tokens, self.question_vocab, max_len
            )
            lengths[i] = max(n, 1)
        return encoded, lengths

    # ------------------------------------------------------------- images

    def preprocess_image(self, img):
        """PIL image -> normalized NHWC float32 array [H, W, 3]."""
        from dl_vqa_tpu.data.images import preprocess_pil_image

        chw = preprocess_pil_image(
            img, self.image_size, self.central_fraction
        )
        return chw.transpose(1, 2, 0).astype("float32")

    def load_images(self, paths: Sequence[str]):
        import numpy as np
        from PIL import Image

        batch = []
        for path in paths:
            with Image.open(path) as img:
                batch.append(self.preprocess_image(img))
        return np.stack(batch)

    # ------------------------------------------------------------- predict

    def forward_probs(self, images, questions, lengths):
        """Jitted forward -> softmax probabilities [B, max_answers]."""
        import numpy as np

        logits = np.asarray(
            self._forward(self.params, images, questions, lengths)
        )
        probs = np.exp(logits - logits.max(axis=1, keepdims=True))
        probs /= probs.sum(axis=1, keepdims=True)
        return probs

    def top_k_from_probs(self, probs_row, top_k: int):
        import numpy as np

        order = np.argsort(probs_row)[::-1][:top_k]
        return [(self.answer_by_id.get(int(i) + 1, "<unk>"),
                 float(probs_row[i])) for i in order]

    def predict(self, image_paths: Sequence[str], questions: Sequence[str],
                top_k: int = 5) -> List[List[Tuple[str, float]]]:
        """Top-k (answer, probability) per (image, question) pair."""
        assert len(image_paths) == len(questions)
        images = self.load_images(image_paths)
        encoded, lengths = self.encode_questions(questions)
        probs = self.forward_probs(images, encoded, lengths)
        return [self.top_k_from_probs(row, top_k) for row in probs]

    def predict_dataset_submission(self, dataset, batcher,
                                   image_table=None) -> List[dict]:
        """Official VQA submission entries [{'question_id', 'answer'}]
        over an encoded dataset (argmax answers). The batcher must iterate
        in dataset order (shuffle=False).

        ``image_table`` (tpu.device_image_cache): a device-resident
        feature table; the batcher must then emit ``image_rows`` instead
        of images (``load_images=False``) and the gather runs on device
        inside the jitted forward — removing the per-batch host->device
        image transfer (the dominant cost on relay-backed runtimes)."""
        import numpy as np

        from dl_vqa_tpu.data.pipeline import prefetch_to_device

        if image_table is not None:
            import jax

            if not hasattr(self, "_forward_rows"):
                base = self._forward

                def forward_rows(params, table, rows, questions, lengths):
                    return base.__wrapped__(
                        params, table[rows], questions, lengths
                    )

                self._forward_rows = jax.jit(forward_rows)

        answers = []
        offset = 0
        for batch in prefetch_to_device(iter(batcher), None, depth=2):
            if image_table is not None:
                logits_dev = self._forward_rows(
                    self.params, image_table, batch["image_rows"],
                    batch["questions"], batch["lengths"],
                )
            else:
                logits_dev = self._forward(
                    self.params, batch["images"], batch["questions"],
                    batch["lengths"],
                )
            logits = np.asarray(logits_dev)
            mask = np.asarray(batch["mask"])
            preds = logits.argmax(axis=1)
            for i in range(len(preds)):
                if not mask[i]:
                    continue
                answers.append(
                    {
                        "question_id": int(dataset.question_ids[offset + i]),
                        "answer": self.answer_by_id.get(
                            int(preds[i]) + 1, "<unk>"
                        ),
                    }
                )
            offset += int(mask.sum())
        return answers


def main(argv=None) -> int:
    from dl_vqa_tpu import config as config_mod

    parser = argparse.ArgumentParser()
    parser.add_argument("--image", action="append", default=[])
    parser.add_argument("--question", action="append", default=[])
    parser.add_argument("--top-k", type=int, default=5)
    parser.add_argument("--submission", default="",
                        help="write official-format answers for the val split")
    parser.add_argument("--export-artifact", default="",
                        help="write an AOT serving artifact directory "
                             "(serialized forward + weights + metadata; "
                             "see dl_vqa_tpu.utils.aot_export)")
    parser.add_argument("--export-batch-sizes", default="1,8",
                        help="comma-separated batch buckets to export")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    cfg = config_mod.compose("config_eval", overrides=args.overrides)
    profile = cfg["main"]["full" if cfg["main"]["use_full"] else "small"]
    predictor = Predictor(
        cfg,
        checkpoint_path=profile["paths"]["pretrained_model_path"],
        vocab_path=profile["paths"]["vocab_path"],
    )

    if args.export_artifact:
        sizes = tuple(
            int(s) for s in args.export_batch_sizes.split(",") if s
        )
        predictor.export_artifact(args.export_artifact, batch_sizes=sizes)
        print(f"wrote serving artifact (batches {sizes}) to "
              f"{args.export_artifact}")
        return 0

    if args.submission:
        from dl_vqa_tpu.data.dataset import load_or_build_val_dataset
        from dl_vqa_tpu.data.pipeline import Batcher

        # Shared guards with evaluate_vqa.py (stale/older-version cache
        # rebuild, missing h5 build). The submission path always reads
        # the h5 pipeline — require image rows even if the config was
        # last used in online mode.
        dataset = load_or_build_val_dataset(
            cfg, profile, log=print, require_image_cache=True
        )
        from dl_vqa_tpu.data.device_cache import plan_image_tables

        image_table = plan_image_tables(
            cfg, {"val": dataset}, log=print,
        )["val"]
        batcher = Batcher(dataset, cfg["train"]["batch_size"],
                          load_images=image_table is None)
        entries = predictor.predict_dataset_submission(
            dataset, batcher, image_table=image_table
        )
        with open(args.submission, "w") as fd:
            json.dump(entries, fd)
        print(f"wrote {len(entries)} answers to {args.submission}")
        return 0

    if args.image:
        questions = args.question or ["what is this?"] * len(args.image)
        for path, question, preds in zip(
            args.image, questions,
            predictor.predict(args.image, questions, args.top_k),
        ):
            print(f"{path} | {question}")
            for answer, prob in preds:
                print(f"  {prob:6.3f}  {answer}")
        return 0

    parser.error("provide --image/--question pairs or --submission")
    return 1


if __name__ == "__main__":
    sys.exit(main())
