"""Config system: compose, overrides, schema validation, flatten."""

import pytest

from dl_vqa_tpu import config as cfg_mod


def test_compose_default_validates():
    cfg = cfg_mod.compose("config")
    assert cfg["train"]["max_answers"] == 3000
    assert cfg["train"]["attention"]["do_option"] == "+"
    assert cfg["main"]["use_full"] is True


def test_compose_eval_config():
    cfg = cfg_mod.compose("config_eval")
    assert cfg["train"]["image"]["stride"] == 2
    assert cfg["train"]["attention"]["do_option"] == "*"


def test_dotlist_overrides_parse_yaml_values():
    cfg = cfg_mod.compose(
        "config",
        overrides=[
            "train.image.stride=2",
            "train.attention.do_option='*'",
            "main.use_full=false",
            "train.lr.lr_value=1e-3",
        ],
    )
    assert cfg["train"]["image"]["stride"] == 2
    assert cfg["train"]["attention"]["do_option"] == "*"
    assert cfg["main"]["use_full"] is False
    assert cfg["train"]["lr"]["lr_value"] == pytest.approx(1e-3)


def test_unknown_key_rejected():
    with pytest.raises(cfg_mod.SchemaError):
        cfg_mod.compose("config", overrides=["train.bogus_key=1"])


def test_wrong_type_rejected():
    with pytest.raises(cfg_mod.SchemaError):
        cfg_mod.compose("config", overrides=["train.batch_size='sixty-four'"])


def test_flatten_expands_lists():
    flat = cfg_mod.flatten({"a": 1, "c": {"a": 2, "b": {"x": 5}}, "d": [1, 2]})
    assert flat == {"a": 1, "c_a": 2, "c_b_x": 5, "d0": 1, "d1": 2}


def test_select():
    cfg = cfg_mod.compose("config")
    assert cfg_mod.select(cfg, "train.text.question_features") == 1024
