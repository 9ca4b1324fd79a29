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


def test_device_image_cache_accepts_yaml_booleans():
    """`tpu.device_image_cache=on` parses as YAML True; the schema and
    the policy helper both accept it (and `off` likewise)."""
    from dl_vqa_tpu import config as config_mod
    from dl_vqa_tpu.data.device_cache import cache_mode

    cfg = config_mod.compose(
        "config", overrides=["tpu.device_image_cache=on"]
    )
    assert cfg["tpu"]["device_image_cache"] is True
    assert cache_mode(cfg) == "on"
    cfg = config_mod.compose(
        "config", overrides=["tpu.device_image_cache=off"]
    )
    assert cache_mode(cfg) == "off"
    assert cache_mode({"tpu": {"device_image_cache": "auto"}}) == "auto"
    import pytest as _pytest
    with _pytest.raises(ValueError, match="device_image_cache"):
        cache_mode({"tpu": {"device_image_cache": "maybe"}})


def test_shared_image_store_counted_once(tmp_path):
    """Two datasets sharing one processed_imgs file count once against
    the device-cache budget and share one uploaded table."""
    from dl_vqa_tpu.data import synthetic
    from dl_vqa_tpu.data.dataset import VQADataset
    from dl_vqa_tpu.data import device_cache

    profile = synthetic.make_synthetic_corpus(
        str(tmp_path / "c"), n_train=8, n_val=4, n_images=3, image_size=32,
    )
    ds_a = VQADataset(data_paths=profile["train_paths"],
                      other_paths=profile["paths"])
    # Second dataset pointed at the SAME image cache file.
    shared_paths = dict(profile["val_paths"],
                        processed_imgs=profile["train_paths"]
                        ["processed_imgs"])
    ds_b = VQADataset(data_paths=shared_paths, other_paths=profile["paths"])

    logs = []
    tables = device_cache.plan_image_tables(
        {"tpu": {"device_image_cache": "on"}},
        {"a": ds_a, "b": ds_b}, log=logs.append,
    )
    assert tables["a"] is tables["b"]          # one upload, shared
    nbytes = ds_a.image_store_nbytes
    assert f"{nbytes / 2**20:.0f} MiB" in logs[0]  # counted once


def test_sci_float_coercion_spares_quoted_strings():
    """Unquoted '5e-4' coerces to float (YAML 1.1 reads it as a string,
    Hydra users mean a float); an explicitly QUOTED override means the
    literal string and must survive as one."""
    from dl_vqa_tpu.config.core import _parse_value

    assert _parse_value("5e-4") == 5e-4
    assert _parse_value('"2e5"') == "2e5"
    assert _parse_value("'5e-4'") == "5e-4"


def test_sweep_space_values_match_dotlist_parser():
    """Sweep-space scalars go through the same parser as dotlist
    overrides, so 'train.lr.lr_value=5e-4,1e-3' yields floats."""
    import sweep

    space = sweep.parse_space(["train.lr.lr_value=5e-4,1e-3"])
    assert space["train.lr.lr_value"] == [5e-4, 1e-3]


def test_model_config_from_meta_dict_roundtrip():
    """ModelConfig -> asdict (checkpoint metadata JSON) -> from_meta_dict
    is identity, including tuple coercions and unknown-key tolerance."""
    import dataclasses
    import json

    from dl_vqa_tpu.models.configs import ImageConfig, ModelConfig

    cfg = ModelConfig(
        image=ImageConfig(num_channels=(3, 8, 16), store_dtype="int8",
                          quant_scales=(1.5, 2.25)),
        max_answers=77,
        num_tokens=123,
    )
    meta = json.loads(json.dumps(dataclasses.asdict(cfg)))  # JSON round
    assert ModelConfig.from_meta_dict(meta) == cfg
    # Forward-compat: unknown keys from a newer writer are ignored.
    meta["image"]["future_field"] = 1
    meta["future_top"] = {"x": 2}
    assert ModelConfig.from_meta_dict(meta) == cfg


# ---------------------------------------------------------------------------
# Hydra override-grammar conformance (VERDICT r3 item 9)
# ---------------------------------------------------------------------------
# Pins `apply_overrides`'s value parsing and prefix semantics against the
# Hydra behaviors the reference relies on (ref main.py:26-27, the Ax sweep
# grammar at ref config/config.yaml:91-132), so the dependency-free
# reimplementation (config/core.py) cannot silently drift.

HYDRA_VALUE_TABLE = [
    # (raw override value, expected parsed python value)
    ("2", 2),                              # int
    ("-3", -3),
    ("0.5", 0.5),                          # float
    ("5e-4", 5e-4),                        # sci float, no mantissa dot
    ("1E3", 1e3),
    ("true", True), ("false", False),      # yaml 1.1 booleans
    ("True", True), ("False", False),
    ("null", None),                        # explicit null
    ("hello", "hello"),                    # bare word -> string
    ("a b", "a b"),                        # spaces survive (shell-quoted)
    ("'*'", "*"),                          # quoted punctuation (Ax sweeps)
    ('"+"', "+"),
    ("[1,2,3]", [1, 2, 3]),                # bracketed list
    ("[3, 64, 128]", [3, 64, 128]),
    ("[[1,2],[3]]", [[1, 2], [3]]),        # nested lists
    ("['a','b']", ["a", "b"]),
    ('"2e5"', "2e5"),                      # quoted sci stays a string
    ("1,2", "1,2"),                        # comma sweep: a STRING here —
                                           # only `-m` multirun expands it
    ("*", "*"),                            # bare YAML-invalid punctuation
    ("|", "|"),                            # block-scalar indicator -> literal
    ("|-", "|-"), (">", ">"),              # the other block-scalar forms
    ("", ""),                              # `key=` assigns empty string
    ("''", ""),                            # quoted empty -> empty string
    ('""', ""),                            # (Hydra/YAML semantics)
]


def test_hydra_value_grammar_table():
    from dl_vqa_tpu.config.core import _parse_value

    for raw, expected in HYDRA_VALUE_TABLE:
        assert _parse_value(raw) == expected, raw


def test_hydra_append_prefix_adds_new_key():
    from dl_vqa_tpu.config.core import apply_overrides

    cfg = apply_overrides({"a": {"b": 1}}, ["+a.c=2"])
    assert cfg["a"] == {"b": 1, "c": 2}


def test_hydra_append_prefix_rejects_existing_key():
    from dl_vqa_tpu.config.core import apply_overrides

    with pytest.raises(ValueError, match="already at 'a.b'"):
        apply_overrides({"a": {"b": 1}}, ["+a.b=2"])


def test_hydra_force_append_prefix_overrides():
    from dl_vqa_tpu.config.core import apply_overrides

    cfg = apply_overrides({"a": {"b": 1}}, ["++a.b=2", "++a.c=3"])
    assert cfg["a"] == {"b": 2, "c": 3}


def test_hydra_delete_prefix():
    from dl_vqa_tpu.config.core import apply_overrides

    cfg = apply_overrides({"a": {"b": 1, "c": 2}}, ["~a.b"])
    assert cfg["a"] == {"c": 2}
    # `~key=value` deletes only when the value matches the current node
    # (Hydra validates and raises on mismatch).
    cfg = apply_overrides({"a": {"b": 1}}, ["~a.b=1"])
    assert cfg["a"] == {}
    with pytest.raises(ValueError, match="is 1 and not 2"):
        apply_overrides({"a": {"b": 1}}, ["~a.b=2"])


def test_hydra_triple_plus_prefix_rejected():
    from dl_vqa_tpu.config.core import apply_overrides

    with pytest.raises(ValueError, match="at most two leading"):
        apply_overrides({"a": {"b": 1}}, ["+++a.b=2"])


def test_hydra_delete_prefix_missing_key_raises():
    from dl_vqa_tpu.config.core import apply_overrides

    with pytest.raises(ValueError, match="is not found"):
        apply_overrides({"a": {}}, ["~a.b"])


def test_hydra_multirun_comma_sweep_expands_in_sweeper():
    """`-m k=a,b` comma sweeps expand to the cartesian grid in the
    sweeper (Hydra multirun semantics); single-run leaves them alone."""
    import sweep

    space = sweep.parse_space(
        ["train.image.stride=1,2", "train.attention.do_option='+','*'"]
    )
    assert space["train.image.stride"] == [1, 2]
    assert space["train.attention.do_option"] == ["+", "*"]
