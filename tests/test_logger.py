"""TrainLogger surface (console/file/TB/checkpoint, ref train_logger.py)."""

import os

import jax
import pytest

from dl_vqa_tpu.utils.logger import TrainLogger


@pytest.fixture
def logger(tmp_path):
    return TrainLogger(exp_name_prefix="t", logs_dir=str(tmp_path / "logs"))


def test_experiment_dir_and_file_logging(logger):
    logger.write("hello world")
    logger.write("warned", severity="warning")
    logger.write("with epoch", epoch=3)
    log_files = [f for f in os.listdir(logger.exp_dir) if f.endswith(".log")]
    assert len(log_files) == 1
    content = open(os.path.join(logger.exp_dir, log_files[0])).read()
    assert "hello world" in content
    assert "(EPOCH 3) with epoch" in content


def test_epoch_statistics_format(logger):
    logger.write_epoch_statistics(epoch=2, epoch_time=1.5, train_loss=0.1234,
                                  norm=0, train_score=12.5, eval_score=10.0)
    log_file = [f for f in os.listdir(logger.exp_dir) if f.endswith(".log")][0]
    content = open(os.path.join(logger.exp_dir, log_file)).read()
    assert "Train loss: 0.1234" in content and "Val score: 10.0000" in content


def test_scalar_reporting_does_not_crash(logger):
    logger.report_scalars({"Accuracy/Train": 1.0}, 0)
    logger.report_scalars_same_plot({"Loss": {"Train": 0.5, "Val": 0.6}}, 0)
    logger.report_metrics_hyper_params({"lr": 1e-3}, {"Metrics/Best": 1.0})


def test_save_model_and_graph(logger, tmp_path):
    from dl_vqa_tpu.models import ModelConfig, vqa
    from dl_vqa_tpu.models.configs import (
        AttentionConfig, ClassifierConfig, ImageConfig, TextConfig,
    )
    from dl_vqa_tpu.utils.checkpoint import load_params

    cfg = ModelConfig(
        text=TextConfig(question_features=8, embedding_features=4),
        image=ImageConfig(num_channels=(3, 4)),
        attention=AttentionConfig(hidden_dim=8),
        classifier=ClassifierConfig(hidden_dim=8),
        max_answers=5, image_size=16, num_tokens=10,
    )
    params = vqa.init(jax.random.PRNGKey(0), cfg)
    path = logger.save_model(params, epoch=1, model_cfg=cfg)
    assert os.path.exists(path)
    reloaded = load_params(path, params)
    assert len(jax.tree_util.tree_leaves(reloaded)) == len(
        jax.tree_util.tree_leaves(params)
    )
    logger.report_graph(params, cfg)  # text summary; must not raise


def test_report_compiled_graph_dumps_hlo(logger):
    """The TB model-graph equivalent: the jitted step's StableHLO must land
    in the experiment dir and be reported (ref train_logger.py:87-93)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(x, y):
        return jnp.tanh(x @ y).sum()

    x = jnp.ones((4, 8))
    y = jnp.ones((8, 2))
    path = logger.report_compiled_graph(step, x, y)
    assert path is not None and os.path.exists(path)
    text = open(path).read()
    assert "module" in text and "tanh" in text

    # Failure degrades to a warning, never an exception.
    assert logger.report_compiled_graph(step, "not-an-array") is None


def test_same_second_loggers_get_distinct_dirs(tmp_path):
    """Two trials starting within one wall-clock second must not share
    an experiment dir (they would interleave .log lines and overwrite
    each other's model.ckpt)."""
    from dl_vqa_tpu.utils.logger import TrainLogger

    a = TrainLogger("t", logs_dir=str(tmp_path))
    b = TrainLogger("t", logs_dir=str(tmp_path))
    try:
        assert a.exp_dir != b.exp_dir
        assert a.exp_name != b.exp_name
    finally:
        a.close()
        b.close()


def test_quiet_logger_all_hosts_escape_hatch(monkeypatch, caplog):
    """Non-coordinator writes are dropped by default (N ranks must not
    N-plicate logs) but DL_VQA_LOG_ALL_HOSTS=1 surfaces info-level
    writes rank-prefixed — the multi-host bring-up escape hatch."""
    import logging as _logging

    from dl_vqa_tpu.utils.logger import QuietLogger

    monkeypatch.delenv("DL_VQA_LOG_ALL_HOSTS", raising=False)
    with caplog.at_level(_logging.WARNING):
        QuietLogger(process_index=3).write("step 7 done")
    assert "step 7 done" not in caplog.text

    monkeypatch.setenv("DL_VQA_LOG_ALL_HOSTS", "1")
    with caplog.at_level(_logging.WARNING):
        QuietLogger(process_index=3).write("step 7 done")
        QuietLogger(process_index=2).write("bad thing", severity="warning")
    assert "[p3] [info] step 7 done" in caplog.text
    assert "[p2] bad thing" in caplog.text
