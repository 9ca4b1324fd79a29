"""Probe 3: block-level (ln + mlp + residual) variants.

probe_vit_mlp2 showed the bare MLP wins collapsed to [B*S, D], but the
full-model bench REGRESSED (43.7k -> 39.2k): in context the reshape
lands between the LN and the matmul and forces the LN output to
materialize instead of fusing into the MLP prologue. Compare complete
block variants to find the layout that keeps both wins.
"""

import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import timed_ms  # noqa: E402 - shared methodology

timed = functools.partial(timed_ms, width=40)

B, S, D = 512, 196, 256


def ln(x, s, b):
    x32 = x.astype(jnp.float32)
    m = x32.mean(axis=-1, keepdims=True)
    v = ((x32 - m) ** 2).mean(axis=-1, keepdims=True)
    return ((x32 - m) * lax.rsqrt(v + 1e-5) * s + b).astype(x.dtype)


def mlp2(h, w1, b1, w2, b2):
    h = jax.nn.relu(
        jnp.dot(h, w1, preferred_element_type=jnp.float32) + b1
    ).astype(jnp.bfloat16)
    return (
        jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2
    ).astype(jnp.bfloat16)


def block_rank3(x, s, b, w1, b1, w2, b2):
    return x + mlp2(ln(x, s, b), w1, b1, w2, b2)


def block_reshape_after_ln(x, s, b, w1, b1, w2, b2):
    h = ln(x, s, b).reshape(B * S, D)
    return x + mlp2(h, w1, b1, w2, b2).reshape(B, S, D)


def block_reshape_before_ln(x, s, b, w1, b1, w2, b2):
    h = ln(x.reshape(B * S, D), s, b)
    return x + mlp2(h, w1, b1, w2, b2).reshape(B, S, D)


def block_all_2d(x, s, b, w1, b1, w2, b2):
    x2 = x.reshape(B * S, D)
    out = x2 + mlp2(ln(x2, s, b), w1, b1, w2, b2)
    return out.reshape(B, S, D)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, D)), dtype=jnp.bfloat16)
    s = jnp.ones(D)
    b = jnp.zeros(D)
    w1 = jnp.asarray(rng.standard_normal((D, 4 * D)) * 0.05,
                     dtype=jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal(4 * D) * 0.05)
    w2 = jnp.asarray(rng.standard_normal((4 * D, D)) * 0.05,
                     dtype=jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal(D) * 0.05)

    print(f"backend: {jax.default_backend()}", flush=True)
    timed("block rank-3 (original)", block_rank3, x, s, b, w1, b1, w2, b2)
    timed("block reshape after ln (regressed)", block_reshape_after_ln,
          x, s, b, w1, b1, w2, b2)
    timed("block reshape before ln", block_reshape_before_ln,
          x, s, b, w1, b1, w2, b2)
    timed("block residual in 2d", block_all_2d, x, s, b, w1, b1, w2, b2)


if __name__ == "__main__":
    main()
