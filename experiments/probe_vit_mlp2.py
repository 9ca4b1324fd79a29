"""Probe 2: does collapsing [B, S, D] -> [B*S, D] around the ViT
matmuls keep its win once the reshapes are inside the program?

probe_vit_mlp.py: the MLP pair at the FLOP floor on rank-2 input
(0.505 ms) vs 0.714 ms as a rank-3 dot. S=196 is not sublane-aligned,
so [B, S, D] carries padded tiles; the question is whether the
collapse reshape is a relayout (eats the win) or folds into the
surrounding ops.
"""

import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import timed_ms  # noqa: E402 - shared methodology

timed = functools.partial(timed_ms, width=36)

B, S, D = 512, 196, 256


def main():
    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.standard_normal((B, S, D)), dtype=jnp.bfloat16)
    w_in = jnp.asarray(rng.standard_normal((D, 4 * D)) * 0.05,
                       dtype=jnp.bfloat16)
    b_in = jnp.asarray(rng.standard_normal(4 * D) * 0.05)
    w_out = jnp.asarray(rng.standard_normal((4 * D, D)) * 0.05,
                        dtype=jnp.bfloat16)
    b_out = jnp.asarray(rng.standard_normal(D) * 0.05)
    w_qkv = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.05,
                        dtype=jnp.bfloat16)
    b_qkv = jnp.asarray(rng.standard_normal(3 * D) * 0.05)

    def mlp(x, w1, b1, w2, b2):
        h = jax.nn.relu(
            jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
        ).astype(jnp.bfloat16)
        return (
            jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2
        ).astype(jnp.bfloat16)

    def mlp_rank3(x, w1, b1, w2, b2):
        return mlp(x, w1, b1, w2, b2)

    def mlp_reshaped(x, w1, b1, w2, b2):
        out = mlp(x.reshape(B * S, D), w1, b1, w2, b2)
        return out.reshape(B, S, D)

    def qkv_rank3(x, w, b):
        return (jnp.dot(x, w, preferred_element_type=jnp.float32) + b
                ).astype(jnp.bfloat16)

    def qkv_reshaped(x, w, b):
        out = qkv_rank3(x.reshape(B * S, D), w, b)
        return out.reshape(B, S, 3 * D)

    print(f"backend: {jax.default_backend()}", flush=True)
    timed("mlp rank-3 (current)", mlp_rank3, x3, w_in, b_in, w_out, b_out)
    timed("mlp reshape-in/out", mlp_reshaped, x3, w_in, b_in, w_out, b_out)
    timed("qkv rank-3 (current)", qkv_rank3, x3, w_qkv, b_qkv)
    timed("qkv reshape-in/out", qkv_reshaped, x3, w_qkv, b_qkv)


if __name__ == "__main__":
    main()
