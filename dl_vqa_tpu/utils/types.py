"""Shared type aliases (counterpart of ref ``utils/types.py:9-12``,
torch-free)."""

from pathlib import Path
from typing import Dict, Tuple, Union

import jax
import numpy as np

PathT = Union[str, Path]
Metrics = Dict[str, float]
Scores = Tuple[float, float]
Array = Union[np.ndarray, jax.Array]
Batch = Dict[str, Array]
