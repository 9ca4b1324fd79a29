"""AOT serving artifact tests (utils/aot_export.py).

The artifact contract: the exported StableHLO + weights + metadata are
a complete serving deployment — loadable and runnable without the model
code, bit-identical to the live jitted forward, robust to batch sizes
that don't match an exported bucket."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dl_vqa_tpu.models import ModelConfig, vqa
from dl_vqa_tpu.models.configs import (
    AttentionConfig,
    ClassifierConfig,
    ImageConfig,
    TextConfig,
)
from dl_vqa_tpu.utils.aot_export import (
    ARTIFACT_VERSION,
    export_artifact,
    load_artifact,
)

L = 6  # max question length


def _cfg():
    return ModelConfig(
        text=TextConfig(question_features=16, embedding_features=8,
                        dropout=0.0),
        image=ImageConfig(num_channels=(3, 4, 8), dropout=0.0),
        attention=AttentionConfig(hidden_dim=16, glimpses=2, dropout=0.0),
        classifier=ClassifierConfig(hidden_dim=16, dropout=0.0),
        max_answers=6,
        image_size=32,
        num_tokens=32,
    )


def _vocab():
    return {
        "question": {f"w{i}": i + 1 for i in range(31)},
        "answer": {f"ans{i}": i + 1 for i in range(6)},
    }


def _inputs(n, seed=0):
    r = np.random.default_rng(seed)
    return (
        r.standard_normal((n, 32, 32, 3)).astype(np.float32),
        r.integers(0, 32, (n, L)).astype(np.int32),
        r.integers(1, L + 1, (n,)).astype(np.int32),
    )


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    cfg = _cfg()
    params = vqa.init(jax.random.PRNGKey(0), cfg)

    def forward(params, images, questions, lengths):
        return vqa.apply(params, cfg, images, questions, lengths,
                         train=False, compute_dtype=jnp.float32)

    path = str(tmp_path_factory.mktemp("aot") / "artifact")
    export_artifact(
        path, params, forward, batch_sizes=(2, 4), image_size=32,
        max_question_length=L, vocab=_vocab(),
    )
    return path, cfg, params, forward


def test_layout(artifact):
    path, *_ = artifact
    files = sorted(os.listdir(path))
    assert files == ["forward_b2.jexp", "forward_b4.jexp", "meta.json",
                     "params.npz"]
    meta = json.load(open(os.path.join(path, "meta.json")))
    assert meta["version"] == ARTIFACT_VERSION
    assert meta["batch_sizes"] == [2, 4]
    assert meta["max_question_length"] == L
    assert "cpu" in meta["platforms"]


def test_roundtrip_matches_live_forward(artifact):
    path, cfg, params, forward = artifact
    art = load_artifact(path)
    imgs, qs, lens = _inputs(4)
    live = np.asarray(jax.jit(forward)(params, imgs, qs, lens))
    loaded = art.logits(imgs, qs, lens)
    np.testing.assert_array_equal(loaded, live)


def test_padding_and_splitting(artifact):
    """Any batch size works: 3 pads up to the 4-bucket, 9 splits into
    4 + 4 + (1 padded to 2) — outputs equal the per-row live forward."""
    path, cfg, params, forward = artifact
    art = load_artifact(path)
    for n in (1, 3, 9):
        imgs, qs, lens = _inputs(n, seed=n)
        live = np.asarray(jax.jit(forward)(params, imgs, qs, lens))
        # a different batch size is a different compiled program — its
        # reduction rounding can differ at f32 epsilon scale (the
        # same-bucket case above stays bit-exact)
        np.testing.assert_allclose(art.logits(imgs, qs, lens), live,
                                   rtol=1e-5, atol=1e-6)


def test_answer_decoding(artifact):
    path, cfg, params, forward = artifact
    art = load_artifact(path)
    imgs, qs, lens = _inputs(2)
    preds = np.asarray(
        jax.jit(forward)(params, imgs, qs, lens)
    ).argmax(axis=1)
    expected = [f"ans{p}" for p in preds]  # 1-based vocab ids
    assert art.answers(imgs, qs, lens) == expected


def test_loads_without_model_code(artifact, tmp_path):
    """The whole point: a consumer process runs the artifact with jax +
    the loader module only — no dl_vqa_tpu.models / ops / config import
    ever happens."""
    path, cfg, params, forward = artifact
    imgs, qs, lens = _inputs(2, seed=7)
    expected = np.asarray(jax.jit(forward)(params, imgs, qs, lens))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = """
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from dl_vqa_tpu.utils.aot_export import load_artifact
art = load_artifact(sys.argv[1])
r = np.random.default_rng(7)
logits = art.logits(
    r.standard_normal((2, 32, 32, 3)).astype(np.float32),
    r.integers(0, 32, (2, %d)).astype(np.int32),
    r.integers(1, %d, (2,)).astype(np.int32),
)
forbidden = [m for m in sys.modules
             if m.startswith(("dl_vqa_tpu.models", "dl_vqa_tpu.ops",
                              "dl_vqa_tpu.config", "dl_vqa_tpu.data"))]
assert not forbidden, f"model code imported: {forbidden}"
np.save(sys.argv[2], logits)
""" % (L, L + 1)
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    # Own tmp dir, NOT the module-scoped artifact dir: test_layout
    # asserts that dir's exact file list, so order must not matter.
    out_file = str(tmp_path / "subproc_logits.npy")
    proc = subprocess.run(
        [sys.executable, "-c", script, path, out_file],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert proc.returncode == 0, proc.stderr
    np.testing.assert_array_equal(np.load(out_file), expected)


def test_backend_mismatch_is_loud(artifact, tmp_path):
    path, *_ = artifact
    meta_path = os.path.join(path, "meta.json")
    meta = json.load(open(meta_path))
    patched = dict(meta, platforms=["tpu"])
    alt = tmp_path / "tpu_artifact"
    alt.mkdir()
    for name in os.listdir(path):
        if name.endswith((".jexp", ".npz")):
            (alt / name).write_bytes(
                open(os.path.join(path, name), "rb").read()
            )
    (alt / "meta.json").write_text(json.dumps(patched))
    with pytest.raises(ValueError, match="exported for"):
        load_artifact(str(alt))


def test_predictor_export_surface(tmp_path):
    """Predictor.export_artifact produces a loadable artifact whose
    logits match Predictor.forward_probs' pre-softmax forward."""
    from dl_vqa_tpu.utils.checkpoint import save_checkpoint

    cfg_dict_overrides = [
        "main.use_full=false",
        f"main.small.paths.vocab_path={tmp_path}/vocab.json",
        "train.max_answers=6",
        "train.image_size=32",
        "train.text.question_features=8",
        "train.text.embedding_features=8",
        "train.image.num_channels=[3, 4, 8]",
        "train.attention.hidden_dim=16",
        "train.classifier.hidden_dim=16",
        "tpu.compute_dtype=float32",
    ]
    from dl_vqa_tpu import config as config_mod

    cfg = config_mod.compose("config_eval", overrides=cfg_dict_overrides)
    vocab = _vocab()
    with open(tmp_path / "vocab.json", "w") as fd:
        json.dump(vocab, fd)
    model_cfg = ModelConfig.from_cfg(cfg["train"], len(vocab["question"]) + 1)
    params = vqa.init(jax.random.PRNGKey(1), model_cfg)
    ckpt = str(tmp_path / "model.ckpt")
    save_checkpoint(ckpt, params, model_cfg=model_cfg,
                    extra_meta={"max_question_length": L})

    from predict import Predictor

    predictor = Predictor(cfg, checkpoint_path=ckpt,
                          vocab_path=str(tmp_path / "vocab.json"))
    art_dir = str(tmp_path / "artifact")
    predictor.export_artifact(art_dir, batch_sizes=(2,))
    art = load_artifact(art_dir)
    assert art.max_question_length == L
    imgs, qs, lens = _inputs(2, seed=3)
    live = np.asarray(predictor._forward(predictor.params, imgs, qs, lens))
    np.testing.assert_array_equal(art.logits(imgs, qs, lens), live)
