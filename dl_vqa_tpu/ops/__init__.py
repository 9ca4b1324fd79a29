"""TPU compute ops: XLA reference implementations + Pallas kernels.

Every op has a pure-XLA reference implementation (used for correctness
tests and as the CPU fallback) and, where it pays off, a Pallas TPU kernel
selected via the ``tpu.use_pallas`` config flag.
"""

from dl_vqa_tpu.ops.lstm import bilstm_final_cell, lstm_scan
from dl_vqa_tpu.ops.vqa_metrics import (
    soft_cross_entropy,
    vqa_accuracy_sum,
    vqa_batch_stats,
)

__all__ = [
    "bilstm_final_cell",
    "lstm_scan",
    "soft_cross_entropy",
    "vqa_accuracy_sum",
    "vqa_batch_stats",
]
