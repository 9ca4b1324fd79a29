"""Misc utilities: seeding, init, model summary (semantics of
``/root/reference/utils/main_utils.py``)."""

from __future__ import annotations

import os
import random
from typing import Dict

import numpy as np

from dl_vqa_tpu.config import validate

__all__ = ["set_seed", "init", "make_dir"]


def set_seed(seed: int) -> None:
    """Seed host RNGs. Device randomness is explicit in JAX (PRNG keys
    derived from this seed by the callers), so unlike the reference
    (ref ``main_utils.py:44-52``) there is no hidden global device RNG."""
    random.seed(seed)
    np.random.seed(seed)


def make_dir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def init(cfg: Dict) -> None:
    """Validate the config (the reference also chdirs back from Hydra's
    run dir, ref ``main_utils.py:116-121``; our loader never chdirs)."""
    validate(cfg)
