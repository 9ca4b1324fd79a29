"""Reference-format checkpoint EXPORT (utils/torch_export): the inverse
of torch_import, so checkpoints trained here can be verified by the
unmodified PyTorch reference.

The strict `load_state_dict` test is the real contract: every key and
shape the reference model registers must be produced, no extras.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dl_vqa_tpu.models import vqa
from dl_vqa_tpu.utils.torch_export import (
    save_torch_checkpoint,
    torch_state_from_params,
)
from dl_vqa_tpu.utils.torch_import import (
    load_torch_checkpoint,
    params_from_torch_state,
)

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference not available"
)
if REF_ROOT not in sys.path:
    sys.path.insert(0, REF_ROOT)

# Shared shapes with the import-direction parity tests.
from test_model_parity import (  # noqa: E402
    _make_batch,
    _model_config,
    _train_cfg_dict,
    NUM_TOKENS,
)


def _our_params(tcfg):
    cfg = _model_config(tcfg)
    return cfg, vqa.init(jax.random.PRNGKey(7), cfg)


def test_export_import_roundtrip():
    """export -> import reproduces the param tree exactly (the layout
    transposes are involutions; the LSTM bias split re-sums)."""
    cfg, params = _our_params(_train_cfg_dict())
    state = {
        k: torch.from_numpy(v)
        for k, v in torch_state_from_params(params).items()
    }
    back = params_from_torch_state(state)

    ours = jax.tree_util.tree_leaves_with_path(params)
    theirs = dict(jax.tree_util.tree_leaves_with_path(back))
    rebuilt = {str(p) for p in theirs}
    assert {str(p) for p, _ in ours} == rebuilt
    for path, leaf in ours:
        np.testing.assert_allclose(
            theirs[path], np.asarray(leaf, dtype=np.float32),
            rtol=1e-6, atol=1e-7, err_msg=str(path),
        )


def test_export_rejects_non_reference_families():
    import dataclasses

    from dl_vqa_tpu.models.configs import ImageConfig

    cfg, _ = _our_params(_train_cfg_dict())
    vit_cfg = dataclasses.replace(
        cfg,
        image=ImageConfig(encoder="vit", num_channels=(3, 32),
                          patch_size=16, num_layers=1, num_heads=2,
                          dropout=0.0),
        image_size=32,
    )
    params = vqa.init(jax.random.PRNGKey(0), vit_cfg)
    with pytest.raises(ValueError, match="reference"):
        torch_state_from_params(params)


def test_checkpoint_file_roundtrip(tmp_path):
    cfg, params = _our_params(_train_cfg_dict())
    path = str(tmp_path / "model.pth")
    save_torch_checkpoint(path, params, epoch=4)
    blob = load_torch_checkpoint(path)
    assert blob["epoch"] == 4
    np.testing.assert_allclose(
        blob["params"]["classifier"]["lin2"]["w"],
        np.asarray(params["classifier"]["lin2"]["w"], np.float32),
        rtol=1e-6,
    )


@needs_reference
@pytest.mark.parametrize("do_option", ["+", "*", "|"])
def test_reference_loads_exported_checkpoint_strict(do_option, tmp_path):
    """The unmodified reference VqaNet load_state_dict(strict=True)
    accepts our exported state and produces OUR logits."""
    from models.model import VqaNet  # the PyTorch reference

    tcfg = _train_cfg_dict(do_option=do_option)
    cfg, params = _our_params(tcfg)

    state = {
        k: torch.from_numpy(v)
        for k, v in torch_state_from_params(params).items()
    }
    torch.manual_seed(0)
    ref_model = VqaNet(tcfg, embedding_tokens=NUM_TOKENS)
    ref_model.load_state_dict(state, strict=True)
    ref_model.eval()

    images, questions, lengths = _make_batch()
    with torch.no_grad():
        ref_logits = ref_model(
            torch.from_numpy(images),
            torch.from_numpy(questions),
            torch.from_numpy(lengths),
        ).numpy()
    ours = np.asarray(vqa.apply(
        params, cfg,
        jnp.asarray(images.transpose(0, 2, 3, 1)),
        jnp.asarray(questions.astype(np.int32)),
        jnp.asarray(lengths.astype(np.int32)),
        train=False,
    ))
    np.testing.assert_allclose(ours, ref_logits, atol=2e-5, rtol=1e-4)


def test_export_tool_cli(tmp_path):
    """tools/export_torch_checkpoint.py: our .ckpt -> reference .pth,
    rebuilt entirely from checkpoint metadata (no config needed)."""
    import subprocess

    from dl_vqa_tpu.utils.checkpoint import save_checkpoint

    cfg, params = _our_params(_train_cfg_dict())
    src = str(tmp_path / "model.ckpt")
    dst = str(tmp_path / "model.pth")
    save_checkpoint(src, params, epoch=2, model_cfg=cfg)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools",
                                      "export_torch_checkpoint.py"),
         src, dst],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    blob = load_torch_checkpoint(dst)
    assert blob["epoch"] == 2
    np.testing.assert_allclose(
        blob["params"]["text"]["embedding"],
        np.asarray(params["text"]["embedding"], np.float32), rtol=1e-6,
    )
