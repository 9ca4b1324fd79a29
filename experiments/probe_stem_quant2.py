"""Probe 2: f8 storage on block1 shapes + jitted numerics check.

Follow-up to probe_stem_quant.py (conv0: f8 7.70 vs bf16 9.04 ms/iter,
int8 loses). Here: (a) does f8 intermediate storage also pay on block1
([512,111,111,64] -> 128ch, ~half compute / half traffic)? (b) numerics
delta of the f8 path, jitted, at batch 64.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import timed_ms  # noqa: E402 - shared methodology


def conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def pool(y, init):
    return lax.reduce_window(
        y, init, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def stem_bf16(x, w, b):
    y = jax.nn.relu(conv(x, w).astype(jnp.float32) + b).astype(jnp.bfloat16)
    return pool(y, jnp.array(-jnp.inf, jnp.bfloat16))


def stem_f8(x, w, b):
    y = jax.nn.relu(conv(x, w).astype(jnp.float32) + b)
    q = y.astype(jnp.float8_e4m3fn)
    # f8e4m3fn is finite-only: -inf casts to NaN; init with the finite min.
    p = pool(q, jnp.asarray(jnp.finfo(jnp.float8_e4m3fn).min,
                            jnp.float8_e4m3fn))
    return p.astype(jnp.bfloat16)


def time_variant(name, fn, x, w, b):
    return timed_ms(name, fn, x, w, b, width=12, verbose=True)


def main():
    rng = np.random.default_rng(0)

    # (a) block1 timing at batch 512
    x1 = jnp.asarray(
        rng.standard_normal((512, 111, 111, 64)).astype(np.float32),
        dtype=jnp.bfloat16,
    )
    w1 = jnp.asarray(
        (rng.standard_normal((3, 3, 64, 128)) * 0.05).astype(np.float32),
        dtype=jnp.bfloat16,
    )
    b1 = jnp.asarray(rng.standard_normal((128,)).astype(np.float32) * 0.1)
    print("block1 (111px, 64->128):", flush=True)
    time_variant("bf16", stem_bf16, x1, w1, b1)
    time_variant("f8e4m3", stem_f8, x1, w1, b1)



if __name__ == "__main__":
    main()
