"""Minimal Hydra-compatible config loader.

The reference drives everything through Hydra + OmegaConf
(``/root/reference/main.py:26``, ``/root/reference/evaluate_vqa.py:22-23``);
neither is available here, so this module provides the slice of behavior
the framework needs:

* ``compose(config_name, overrides)`` — load a YAML from the package
  config dir (or an absolute path) and apply ``a.b.c=value`` dotlist
  overrides, values parsed as YAML (so ``stride=2`` is an int and
  ``do_option="'+'"`` is a string, matching Hydra/Ax sweeps);
* schema validation against :data:`dl_vqa_tpu.config.schema.CFG_SCHEMA`;
* ``flatten(cfg)`` — the reference's hparam-dict flattening
  (``/root/reference/utils/main_utils.py:79-113``), lists expanded to
  ``key0, key1, ...`` entries.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, List, Optional, Sequence

import yaml

from dl_vqa_tpu.config import schema as config_schema

__all__ = ["compose", "load_yaml", "apply_overrides", "flatten", "select"]

_CONFIG_DIR = os.path.dirname(os.path.abspath(__file__))


def load_yaml(name_or_path: str) -> Dict[str, Any]:
    """Load a config YAML by name (resolved in the package config dir) or path."""
    path = name_or_path
    if not os.path.isabs(path) and not os.path.exists(path):
        candidate = os.path.join(_CONFIG_DIR, name_or_path)
        if not candidate.endswith(".yaml"):
            candidate += ".yaml"
        path = candidate
    with open(path) as fd:
        return yaml.safe_load(fd)


_SCI_FLOAT = __import__("re").compile(r"^[+-]?\d+(\.\d*)?[eE][+-]?\d+$")


_BLOCK_SCALAR_INDICATORS = {"|", "|-", "|+", ">", ">-", ">+"}


def _parse_value(raw: str) -> Any:
    if raw == "":
        return ""  # Hydra: `key=` assigns the empty string, not null
    if raw.strip() in _BLOCK_SCALAR_INDICATORS:
        # '|' / '|-' / '>' are YAML block-scalar indicators that parse to
        # an EMPTY string; a Hydra user writing do_option=| means '|'.
        # Matched explicitly so quoted empties (key='' / key="") still
        # yield "" as Hydra/YAML do.
        return raw
    try:
        value = yaml.safe_load(raw)
    except yaml.YAMLError:
        # Bare '*', '-', etc. are YAML syntax errors; Hydra users mean the
        # literal string (e.g. train.attention.do_option=*).
        return raw
    if value == "" and raw.strip() not in ("''", '""'):
        # Anything else that PARSES to empty while typed non-empty (e.g.
        # '!!str') means the literal; only genuinely-quoted empties
        # become "" (Hydra/YAML semantics).
        return raw
    # YAML 1.1 treats '5e-4' (no mantissa dot) as a string; Hydra users
    # expect a float. Only coerce when the input was UNQUOTED: an
    # explicitly quoted override (key='"2e5"') means the literal string.
    if isinstance(value, str) and value == raw and _SCI_FLOAT.match(value):
        return float(value)
    return value


def apply_overrides(cfg: Dict[str, Any], overrides: Sequence[str]) -> Dict[str, Any]:
    """Apply Hydra-style dotlist overrides (``train.image.stride=2``).

    Hydra's override-grammar prefixes are honored (the reference's CLI
    contract, ref ``main.py:26-27``):

    * ``+key=value``  — append a key that must NOT already exist;
    * ``++key=value`` — append or override unconditionally (exactly two
      ``+`` — three or more raise, as in Hydra);
    * ``~key`` / ``~key=value`` — delete the key (must exist; when a
      value is supplied it must equal the current value, as in Hydra).

    Divergence from Hydra, documented: a bare ``key=value`` on a missing
    key creates it rather than raising — the schema validation pass that
    follows ``compose`` rejects keys outside the config contract, which
    is where the reference's strictness lives (ref
    ``utils/main_utils.py:72-78``).
    """
    cfg = copy.deepcopy(cfg)
    for item in overrides:
        if item.startswith("~"):
            body = item[1:]
            dotted, _, raw = body.partition("=")
            dotted = dotted.strip()
            keys = dotted.split(".")
            node = cfg
            for key in keys[:-1]:
                if not isinstance(node, dict) or key not in node:
                    raise ValueError(
                        f"Could not delete from config. '{dotted}' is not found"
                    )
                node = node[key]
            if not isinstance(node, dict) or keys[-1] not in node:
                raise ValueError(
                    f"Could not delete from config. '{dotted}' is not found"
                )
            if "=" in body:
                # Hydra validates the supplied value against the current
                # node and refuses a mismatched delete.
                expected = _parse_value(raw)
                current = node[keys[-1]]
                if current != expected:
                    raise ValueError(
                        f"Could not delete from config. The value of "
                        f"'{dotted}' is {current!r} and not {expected!r}"
                    )
            del node[keys[-1]]
            continue
        force_add = item.startswith("++")
        append = not force_add and item.startswith("+")
        body = item[2:] if force_add else (item[1:] if append else item)
        if body.startswith("+"):
            raise ValueError(
                f"Invalid override prefix in {item!r}: at most two leading "
                f"'+' are allowed (+key=value to append, ++key=value to "
                f"append-or-override)"
            )
        if "=" not in body:
            raise ValueError(f"Override must be key=value, got {item!r}")
        dotted, raw = body.split("=", 1)
        node = cfg
        keys = dotted.strip().split(".")
        for key in keys[:-1]:
            if key not in node or not isinstance(node[key], dict):
                node[key] = {}
            node = node[key]
        if append and keys[-1] in node:
            raise ValueError(
                f"Could not append to config. An item is already at "
                f"'{dotted.strip()}'. Either remove + prefix: "
                f"'{dotted.strip()}={raw}', or add a second + to add or "
                f"override the key: '+{item}'"
            )
        node[keys[-1]] = _parse_value(raw)
    return cfg


def compose(
    config_name: str = "config",
    overrides: Optional[Sequence[str]] = None,
    validate: bool = True,
) -> Dict[str, Any]:
    """Load + override + validate a config. The returned object is a plain
    nested dict supporting the reference's ``cfg['main'][...]`` access."""
    cfg = load_yaml(config_name)
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    if validate:
        config_schema.validate(cfg)
    return cfg


def select(cfg: Dict[str, Any], dotted: str) -> Any:
    """Fetch ``cfg['a']['b']['c']`` from ``'a.b.c'``."""
    node: Any = cfg
    for key in dotted.split("."):
        node = node[key]
    return node


def flatten(d: Dict[str, Any], parent_key: str = "", sep: str = "_") -> Dict[str, Any]:
    """Flatten nested config for hparam reporting; lists become indexed keys
    (semantics of ref ``main_utils.py:79-113``)."""
    items: List = []
    for k, v in d.items():
        new_key = f"{parent_key}{sep}{k}" if parent_key else k
        if isinstance(v, list):
            items.extend((new_key + str(i), elem) for i, elem in enumerate(v))
        elif isinstance(v, dict):
            items.extend(flatten(v, new_key, sep=sep).items())
        else:
            items.append((new_key, v))
    return dict(items)


def to_yaml(cfg: Dict[str, Any]) -> str:
    return yaml.safe_dump(cfg, sort_keys=False)
