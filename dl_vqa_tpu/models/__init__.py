"""Model zoo: functional init/apply models over plain param pytrees."""

from dl_vqa_tpu.models.configs import (
    AttentionConfig,
    ClassifierConfig,
    ImageConfig,
    ModelConfig,
    TextConfig,
)
from dl_vqa_tpu.models import vqa

__all__ = [
    "AttentionConfig",
    "ClassifierConfig",
    "ImageConfig",
    "ModelConfig",
    "TextConfig",
    "vqa",
]
