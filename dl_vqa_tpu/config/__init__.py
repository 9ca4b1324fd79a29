"""Config system: YAML + dotlist overrides + schema validation."""

from dl_vqa_tpu.config.core import (
    apply_overrides,
    compose,
    flatten,
    load_yaml,
    select,
    to_yaml,
)
from dl_vqa_tpu.config.schema import CFG_SCHEMA, SchemaError, validate

__all__ = [
    "apply_overrides",
    "compose",
    "flatten",
    "load_yaml",
    "select",
    "to_yaml",
    "CFG_SCHEMA",
    "SchemaError",
    "validate",
]
