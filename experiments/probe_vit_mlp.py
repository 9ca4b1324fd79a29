"""Probe: where does the ViT eval step's non-attention time go, and is
there MXU headroom in the MLP/projection matmuls?

PERF_NOTES puts MLP + qkv/out projections at ~5.5 ms/step (batch 512,
S=196, D=256, 4 layers) at 35-50% MXU efficiency. Candidates:
  (a) the matmuls themselves are slow at K=256/bf16 — nothing to do;
  (b) the elementwise passes (2x LN, 2x residual add, relu) around them
      dominate — a fused-block Pallas kernel would be the fix;
  (c) [B, S, D] vs [B*S, D] layout makes a difference — cheap reshape.

Times each piece in isolation with the on-device differenced-loop
method.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import timed_ms as timed  # noqa: E402 - shared methodology

B, S, D = 512, 196, 256


def main():
    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.standard_normal((B, S, D)), dtype=jnp.bfloat16)
    x2 = x3.reshape(B * S, D)
    w_in = jnp.asarray(rng.standard_normal((D, 4 * D)) * 0.05,
                       dtype=jnp.bfloat16)
    b_in = jnp.asarray(rng.standard_normal(4 * D) * 0.05)
    w_out = jnp.asarray(rng.standard_normal((4 * D, D)) * 0.05,
                        dtype=jnp.bfloat16)
    b_out = jnp.asarray(rng.standard_normal(D) * 0.05)
    scale = jnp.ones(D)
    bias = jnp.zeros(D)

    def mlp3(x, w1, b1, w2, b2):
        h = jax.nn.relu(
            jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
        ).astype(jnp.bfloat16)
        return (
            jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2
        ).astype(jnp.bfloat16)

    def ln(x, s, b):
        x32 = x.astype(jnp.float32)
        m = x32.mean(axis=-1, keepdims=True)
        v = ((x32 - m) ** 2).mean(axis=-1, keepdims=True)
        return ((x32 - m) * lax.rsqrt(v + 1e-5) * s + b).astype(x.dtype)

    def block_no_attn(x, s, b, w1, b1, w2, b2):
        h = ln(x, s, b)
        return x + mlp3(h, w1, b1, w2, b2)

    print(f"backend: {jax.default_backend()}; B={B} S={S} D={D}", flush=True)
    # FLOP floor for the MLP pair: 2*B*S*D*4D*2 = 105 GFLOP -> ~0.54 ms
    # at v5e bf16 peak.
    timed("mlp [B,S,D]", mlp3, x3, w_in, b_in, w_out, b_out)
    timed("mlp [B*S,D]", mlp3, x2, w_in, b_in, w_out, b_out)
    timed("layernorm only", ln, x3, scale, bias)
    timed("ln + mlp + residual (block)", block_no_attn, x3, scale, bias,
          w_in, b_in, w_out, b_out)


if __name__ == "__main__":
    main()
