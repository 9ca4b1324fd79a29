"""SPMD parallelism: device meshes, sharding rules, and the multi-host
tier (``dl_vqa_tpu.parallel.multihost``)."""

from dl_vqa_tpu.parallel import multihost
from dl_vqa_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    state_shardings,
)
from dl_vqa_tpu.parallel.sequence import SequenceContext

__all__ = ["make_mesh", "batch_sharding", "param_shardings", "replicated",
           "state_shardings", "multihost", "SequenceContext"]
