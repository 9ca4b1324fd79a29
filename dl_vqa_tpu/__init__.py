"""dl_vqa_tpu — a TPU-native JAX framework for Visual Question Answering.

A from-scratch rebuild of the capabilities of the PyTorch reference
``OmerShubi/DL_VQA`` ("Show, Ask, Attend, and Answer" VQA 2.0 baseline),
re-designed TPU-first:

* compute path: jax / XLA / Pallas, NHWC convs on the MXU, masked
  ``lax.scan`` bi-LSTM, fused soft-cross-entropy + VQA metric — all inside
  one jitted step, zero host syncs per batch;
* scale-out: ``jax.sharding.Mesh`` (data × model axes) with XLA SPMD
  collectives over ICI;
* data path: host-side numpy pipeline with device prefetch, plus offline
  caches byte-compatible with the reference's vocab.json / h5 formats.

Subpackages
-----------
``config``    YAML config system mirroring the reference's Hydra schema.
``data``      Text normalizers, vocab builder, VQA dataset, image cache.
``models``    Functional (init/apply) model zoo: VqaNet + variants.
``ops``       Pallas TPU kernels and their pure-XLA references.
``parallel``  Mesh construction and parameter/batch sharding rules.
``train``     Jitted train/eval steps, train loop, LR schedule.
``utils``     Logger, checkpointing, misc helpers.
"""

__version__ = "0.1.0"
