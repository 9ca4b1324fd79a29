"""Probe: is the Pallas flash-attention BACKWARD faster than XLA's
materialized attention backward for the ViT train step?

Round-2 attribution (docs/ROADMAP.md): XLA attention fwd+bwd ~14 ms +
head-layout reshapes ~3 ms of the 71.6 ms ViT train step (batch 512,
S=196, H=4, D=64, bf16). The recompute-through-XLA backward of the eval
kernel measured -9% in training. This probe measures the NEW
flash-recompute Pallas backward (ops/vit_attention_pallas.py:
vit_attention_qkv_pallas_fused_bwd) which keeps all [S, S] tensors in
VMEM in both directions.

Three measurements, on-device differenced loops (see PERF_NOTES
"Environment gotchas"):
  1. TPU-compiled correctness: kernel fwd + dqkv vs the XLA reference.
  2. Op-level fwd+bwd time at the ViT shape, XLA vs kernel.
  3. Full ViT train step via bench.bench_train with the dispatch flag
     flipped (run `python bench.py --train --vit` separately with
     models.vit.TRAIN_ATTENTION_KERNEL toggled).
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _timing import timed_ms  # noqa: E402 - shared methodology
from dl_vqa_tpu.ops.vit_attention_pallas import (
    vit_attention_qkv_pallas,
    vit_attention_qkv_pallas_fused_bwd,
    vit_attention_qkv_reference,
)

B, S, H, D = 512, 196, 4, 64


def check_correctness():
    rng = np.random.default_rng(0)
    qkv32 = jnp.asarray(rng.standard_normal((8, S, 3 * H * D)),
                        dtype=jnp.float32)
    cot32 = jnp.asarray(rng.standard_normal((8, S, H * D)),
                        dtype=jnp.float32)

    out_k = vit_attention_qkv_pallas_fused_bwd(qkv32, H)
    out_r = vit_attention_qkv_reference(qkv32, H)
    fwd_err = float(jnp.max(jnp.abs(out_k - out_r)))

    _, vjp_k = jax.vjp(
        lambda t: vit_attention_qkv_pallas_fused_bwd(t, H), qkv32
    )
    _, vjp_r = jax.vjp(lambda t: vit_attention_qkv_reference(t, H), qkv32)
    dk = vjp_k(cot32)[0]
    dr = vjp_r(cot32)[0]
    scale = float(jnp.max(jnp.abs(dr))) + 1e-9
    bwd_err = float(jnp.max(jnp.abs(dk - dr))) / scale
    print(f"TPU-compiled parity: fwd max|err|={fwd_err:.2e}, "
          f"bwd rel max|err|={bwd_err:.2e}", flush=True)
    # bf16-roundoff scale: on TPU both paths' f32 matmuls run at the MXU's
    # default (bf16-passes) precision but group reductions differently;
    # interpreter-mode tests in tests/test_pallas.py pin exact math.
    assert fwd_err < 5e-3 and bwd_err < 5e-3


def timed(name, step, arg):
    return timed_ms(name, step, arg, width=44)


def main(argv):
    """Each piece is a separate invocation: relay-TPU compiles are slow
    enough (~1-2 min per program) that one process can blow a 10-minute
    budget. Run:  --check | --xla | --kernel  (default: --check)."""
    rng = np.random.default_rng(1)
    qkv = jnp.asarray(rng.standard_normal((B, S, 3 * H * D)),
                      dtype=jnp.bfloat16)

    def fwd_bwd(fn):
        def step(t):
            out, vjp = jax.vjp(fn, t)
            (dt,) = vjp(out)  # out as cotangent: right shape, no extra io
            return dt.astype(jnp.float32).sum()

        return step

    if "--xla" in argv:
        timed("XLA attention fwd+bwd",
              fwd_bwd(lambda t: vit_attention_qkv_reference(t, H)), qkv)
    elif "--kernel" in argv:
        timed("kernel fwd + flash bwd",
              fwd_bwd(lambda t: vit_attention_qkv_pallas_fused_bwd(t, H)),
              qkv)
    else:
        check_correctness()


if __name__ == "__main__":
    main(sys.argv[1:])
