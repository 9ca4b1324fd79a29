"""Orbax checkpoint backend: round-trip, async rolling save, params-only
load, and sharding-aware restore over the virtual device mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from dl_vqa_tpu.models import vqa
from dl_vqa_tpu.train.state import create_train_state
from dl_vqa_tpu.train.steps import make_optimizer, make_train_step
from dl_vqa_tpu.utils import checkpoint as ckpt
from dl_vqa_tpu.utils import orbax_backend

from tests.test_train import _tiny_batch, _tiny_cfg


def _trained_state(cfg, seed=2, steps=1):
    params = vqa.init(jax.random.PRNGKey(seed), cfg)
    tx = make_optimizer(1e-3)
    state = create_train_state(params, tx)
    step = make_train_step(cfg, tx, compute_dtype=jnp.float32)
    for i in range(steps):
        state, _ = step(state, _tiny_batch(cfg), jax.random.PRNGKey(i))
    return state, tx


def _assert_trees_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_is_orbax_path(tmp_path):
    assert orbax_backend.is_orbax_path("x/model.ckpt.orbax")
    assert not orbax_backend.is_orbax_path("x/model.ckpt")
    assert not orbax_backend.is_orbax_path(str(tmp_path))  # plain empty dir


def test_full_state_roundtrip_via_dispatch(tmp_path):
    cfg = _tiny_cfg()
    state, tx = _trained_state(cfg)

    path = str(tmp_path / "ckpt.orbax")
    ckpt.save_checkpoint(path, state, epoch=4, model_cfg=cfg,
                         extra_meta={"max_question_length": 6})

    template = create_train_state(vqa.init(jax.random.PRNGKey(9), cfg), tx)
    restored, epoch = ckpt.restore_state(template, path)
    assert epoch == 4
    assert int(restored.step) == 1
    assert isinstance(restored, type(template))
    _assert_trees_equal(restored, state)

    flat, meta = ckpt.load_checkpoint(path)
    assert meta["epoch"] == 4
    assert meta["max_question_length"] == 6
    assert meta["model_cfg"]["num_tokens"] == cfg.num_tokens


def test_load_params_from_orbax_full_state(tmp_path):
    cfg = _tiny_cfg()
    state, _ = _trained_state(cfg)
    path = str(tmp_path / "ckpt.orbax")
    ckpt.save_checkpoint(path, state, epoch=0, model_cfg=cfg)

    params = vqa.init(jax.random.PRNGKey(9), cfg)  # template shapes
    loaded = ckpt.load_params(path, params)
    _assert_trees_equal(loaded, state.params)


def test_async_rolling_save_overwrites_atomically(tmp_path):
    cfg = _tiny_cfg()
    state, tx = _trained_state(cfg)
    step = make_train_step(cfg, tx, compute_dtype=jnp.float32)

    path = str(tmp_path / "last.ckpt.orbax")
    ckpt.save_checkpoint_async(path, state, epoch=0, model_cfg=cfg)
    # Mutate the live state while the write may still be in flight: the
    # checkpoint must hold the pre-mutation snapshot or the next save.
    state2, _ = step(state, _tiny_batch(cfg), jax.random.PRNGKey(5))
    ckpt.save_checkpoint_async(path, state2, epoch=1, model_cfg=cfg)
    ckpt.wait_for_async_saves()

    template = create_train_state(vqa.init(jax.random.PRNGKey(9), cfg), tx)
    restored, epoch = ckpt.restore_state(template, path)
    assert epoch == 1
    assert int(restored.step) == int(state2.step)
    _assert_trees_equal(restored, state2)


def test_sharded_restore_preserves_placement(tmp_path):
    """Restoring against a tensor-parallel template must hand back leaves
    in the template's mesh layout (the no-host-gather path)."""
    from dl_vqa_tpu.parallel import make_mesh, param_shardings

    cfg = _tiny_cfg()
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(data=4, model=2)
    shardings = param_shardings(params, mesh)
    sharded = jax.device_put(params, shardings)

    path = str(tmp_path / "sharded.orbax")
    ckpt.save_checkpoint(path, sharded, epoch=0)

    restored, meta = orbax_backend.restore(path, template=sharded)
    assert meta["epoch"] == 0
    _assert_trees_equal(restored, params)
    for got, want in zip(
        jax.tree_util.tree_leaves(restored),
        jax.tree_util.tree_leaves(sharded),
    ):
        assert got.sharding == want.sharding, (got.sharding, want.sharding)


def test_logger_save_model_orbax(tmp_path):
    from dl_vqa_tpu.utils.logger import TrainLogger

    cfg = _tiny_cfg()
    state, _ = _trained_state(cfg)
    logger = TrainLogger("orbaxtest", logs_dir=str(tmp_path),
                         checkpoint_backend="orbax")
    path = logger.save_model(state, epoch=2, model_cfg=cfg)
    assert path.endswith("model.ckpt.orbax")
    params = vqa.init(jax.random.PRNGKey(9), cfg)
    loaded = ckpt.load_params(path, params)
    _assert_trees_equal(loaded, state.params)


def test_logger_rejects_unknown_backend(tmp_path):
    import pytest

    from dl_vqa_tpu.utils.logger import TrainLogger

    with pytest.raises(ValueError):
        TrainLogger("bad", logs_dir=str(tmp_path), checkpoint_backend="hdf5")


def test_ckpt_info_summarizes_both_backends(tmp_path, capsys):
    """tools/ckpt_info.py reads npz and Orbax checkpoints (the latter via
    the topology-independent host restore) and reports counts + meta."""
    import os
    import sys

    tools_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    )
    if tools_dir not in sys.path:
        sys.path.insert(0, tools_dir)
    import ckpt_info

    params = {"lin": {"w": jnp.ones((4, 5)), "b": jnp.zeros(5)}}
    state = create_train_state(params, make_optimizer(1e-3))
    for name in ("a.ckpt", "b.ckpt.orbax"):
        path = str(tmp_path / name)
        ckpt.save_checkpoint(path, state, epoch=2)
        ckpt.wait_for_async_saves()
        info = ckpt_info.summarize(path)
        assert info["param_count"] == 25
        assert info["meta"]["epoch"] == 2
        assert info["backend"] == ("npz" if name.endswith(".ckpt")
                                   else "orbax")
        out = capsys.readouterr().out
        assert "param" in out and "meta.epoch" in out
