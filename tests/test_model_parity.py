"""Full-model numerics parity: our JAX VqaNet vs the PyTorch reference
with the SAME weights injected (SURVEY.md §4 numerics tier, <=1e-5 on
eval-mode logits)."""

import os
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
from dl_vqa_tpu.utils.torch_import import params_from_torch_state

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference not available"
)

if REF_ROOT not in sys.path:
    sys.path.insert(0, REF_ROOT)


NUM_TOKENS = 50
IMAGE_SIZE = 64  # grid: 64 -> 31 -> 14 -> 6 with k=3 s=1 (small for speed)
IMAGE_SIZE_S2 = 96  # stride 2 needs a larger input to keep the grid >= 1


def _train_cfg_dict(do_option="+", stride=1, bidirectional=True):
    return {
        "text": {
            "question_features": 32,
            "embedding_features": 16,
            "dropout": 0.0,
            "num_lstm_layers": 1,
            "bidirectional": bidirectional,
        },
        "image": {
            "kernel_size": 3,
            "dropout": 0.0,
            "num_channels": [3, 8, 12, 16],
            "stride": stride,
            "do_skip_connection": False,
        },
        "attention": {
            "hidden_dim": 24,
            "glimpses": 2,
            "do_option": do_option,
            "dropout": 0.0,
        },
        "classifier": {"hidden_dim": 20, "dropout": 0.0},
        "max_answers": 30,
    }


def _model_config(tcfg):
    return ModelConfig(
        text=TextConfig(
            question_features=tcfg["text"]["question_features"],
            embedding_features=tcfg["text"]["embedding_features"],
            dropout=tcfg["text"]["dropout"],
            bidirectional=tcfg["text"]["bidirectional"],
        ),
        image=ImageConfig(
            kernel_size=tcfg["image"]["kernel_size"],
            dropout=tcfg["image"]["dropout"],
            num_channels=tuple(tcfg["image"]["num_channels"]),
            stride=tcfg["image"]["stride"],
        ),
        attention=AttentionConfig(
            hidden_dim=tcfg["attention"]["hidden_dim"],
            glimpses=tcfg["attention"]["glimpses"],
            do_option=tcfg["attention"]["do_option"],
            dropout=tcfg["attention"]["dropout"],
        ),
        classifier=ClassifierConfig(
            hidden_dim=tcfg["classifier"]["hidden_dim"],
            dropout=tcfg["classifier"]["dropout"],
        ),
        max_answers=tcfg["max_answers"],
        image_size=IMAGE_SIZE,
        num_tokens=NUM_TOKENS,
    )


def _make_batch(seed=0, batch=3, image_size=IMAGE_SIZE):
    rng = np.random.default_rng(seed)
    images = rng.standard_normal((batch, 3, image_size, image_size)).astype(
        np.float32
    )
    questions = rng.integers(0, NUM_TOKENS, size=(batch, 7)).astype(np.int64)
    lengths = np.array([7, 3, 5][:batch], dtype=np.int64)
    for i, l in enumerate(lengths):
        questions[i, l:] = 0
    return images, questions, lengths


@pytest.mark.parametrize("do_option", ["+", "*", "|"])
@pytest.mark.parametrize("stride", [1, 2])
def test_logits_match_reference(do_option, stride):
    from models.model import VqaNet  # the PyTorch reference

    tcfg = _train_cfg_dict(do_option=do_option, stride=stride)
    torch.manual_seed(0)
    ref_model = VqaNet(tcfg, embedding_tokens=NUM_TOKENS)
    ref_model.eval()

    image_size = IMAGE_SIZE if stride == 1 else IMAGE_SIZE_S2
    images, questions, lengths = _make_batch(image_size=image_size)
    with torch.no_grad():
        expected = ref_model(
            torch.from_numpy(images),
            torch.from_numpy(questions),
            torch.from_numpy(lengths),
        ).numpy()

    cfg = _model_config(tcfg)
    params = params_from_torch_state(ref_model.state_dict())
    actual = np.asarray(
        vqa.apply(
            params,
            cfg,
            jnp.asarray(images.transpose(0, 2, 3, 1)),  # NCHW -> NHWC
            jnp.asarray(questions.astype(np.int32)),
            jnp.asarray(lengths.astype(np.int32)),
            train=False,
        )
    )
    np.testing.assert_allclose(actual, expected, atol=2e-5, rtol=1e-4)


def test_unidirectional_variant_matches():
    from models.model import VqaNet

    tcfg = _train_cfg_dict(bidirectional=False)
    torch.manual_seed(1)
    ref_model = VqaNet(tcfg, embedding_tokens=NUM_TOKENS)
    ref_model.eval()

    images, questions, lengths = _make_batch(seed=1)
    with torch.no_grad():
        expected = ref_model(
            torch.from_numpy(images),
            torch.from_numpy(questions),
            torch.from_numpy(lengths),
        ).numpy()

    cfg = _model_config(tcfg)
    params = params_from_torch_state(ref_model.state_dict())
    actual = np.asarray(
        vqa.apply(
            params, cfg,
            jnp.asarray(images.transpose(0, 2, 3, 1)),
            jnp.asarray(questions.astype(np.int32)),
            jnp.asarray(lengths.astype(np.int32)),
        )
    )
    np.testing.assert_allclose(actual, expected, atol=2e-5, rtol=1e-4)


def test_param_count_matches_reference():
    from models.model import VqaNet

    tcfg = _train_cfg_dict()
    ref_model = VqaNet(tcfg, embedding_tokens=NUM_TOKENS)
    ref_count = sum(p.numel() for p in ref_model.parameters())

    cfg = _model_config(tcfg)
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    # Our LSTM folds torch's two bias vectors into one: subtract the
    # duplicate bias params for comparison.
    lstm_dirs = 2 if tcfg["text"]["bidirectional"] else 1
    folded_bias = lstm_dirs * 4 * tcfg["text"]["question_features"]
    assert vqa.param_count(params) + folded_bias == ref_count


def test_grid_size_formula():
    from dl_vqa_tpu.models.configs import ImageConfig

    # Reference comment table (config.yaml:134-160): 224, stride 1,
    # 4 channel entries -> grid 26; stride 2 -> 7... table says 28/7 but the
    # actual unpadded math gives 26 for stride 1 (the comment table assumed
    # padded convs). Assert against the real conv arithmetic.
    icfg = ImageConfig(kernel_size=3, num_channels=(3, 64, 128, 256), stride=1)
    size = 224
    for _ in range(3):
        size = (size - 3) // 1 + 1
        size //= 2
    assert icfg.output_grid(224) == size


def test_dropout_changes_output_only_in_train_mode():
    tcfg = _train_cfg_dict()
    tcfg["classifier"]["dropout"] = 0.5
    cfg = _model_config(tcfg)
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    images, questions, lengths = _make_batch()
    args = (
        jnp.asarray(images.transpose(0, 2, 3, 1)),
        jnp.asarray(questions.astype(np.int32)),
        jnp.asarray(lengths.astype(np.int32)),
    )
    eval1 = vqa.apply(params, cfg, *args, train=False)
    eval2 = vqa.apply(params, cfg, *args, train=False)
    np.testing.assert_array_equal(np.asarray(eval1), np.asarray(eval2))

    t1 = vqa.apply(params, cfg, *args, train=True, rng=jax.random.PRNGKey(1))
    t2 = vqa.apply(params, cfg, *args, train=True, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))
