"""Probe: does quantized (int8 / f8) storage of the conv0 output between
the conv and the pool beat bf16 storage on v5e?

conv0 at batch 512 writes a 3.2 GB bf16 output that the bias+relu+pool
fusion re-reads (eval trace: fusion.16 5.36 ms + fusion.3 5.65 ms, both
bandwidth-bound — docs/PERF_NOTES.md). Storing that intermediate in 8
bits would halve the round-trip traffic IF XLA fuses the requantize into
the conv epilogue and runs reduce_window over the narrow type.

Timing per the repo's bench methodology: on-device ``lax.fori_loop``
with a loop-carried dependency, two loop lengths differenced to cancel
dispatch RTT and compile-adjacent fixed costs.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import timed_ms  # noqa: E402 - shared methodology

B, HW, CIN, COUT = 512, 224, 3, 64


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


SCALE = 16.0  # static per-tensor scale; relu output -> [0, 127/16 ~ 7.9]


def stem_int8(x, w, b):
    y = jax.nn.relu(conv(x, w).astype(jnp.float32) + b)
    q = jnp.clip(jnp.round(y * SCALE), 0, 127).astype(jnp.int8)
    p = pool(q, jnp.array(-128, jnp.int8))
    return p.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / SCALE)


def stem_f8(x, w, b):
    y = jax.nn.relu(conv(x, w).astype(jnp.float32) + b)
    q = y.astype(jnp.float8_e4m3fn)
    p = pool(q, jnp.array(-jnp.inf, jnp.float8_e4m3fn))
    return p.astype(jnp.bfloat16)


def time_variant(name, fn, x, w, b):
    return timed_ms(name, fn, x, w, b, width=10)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((B, HW, HW, CIN)).astype(np.float32),
        dtype=jnp.bfloat16,
    )
    w = jnp.asarray(
        (rng.standard_normal((3, 3, CIN, COUT)) * 0.1).astype(np.float32),
        dtype=jnp.bfloat16,
    )
    b = jnp.asarray(rng.standard_normal((COUT,)).astype(np.float32) * 0.1)

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    t_bf16 = time_variant("bf16", stem_bf16, x, w, b)
    t_int8 = time_variant("int8", stem_int8, x, w, b)
    try:
        t_f8 = time_variant("f8e4m3", stem_f8, x, w, b)
    except Exception as e:  # noqa: BLE001 - probe: report and continue
        print(f"f8e4m3 failed: {type(e).__name__}: {str(e)[:300]}")
        t_f8 = None

    # numerics check vs bf16 path
    ref = stem_bf16(x, w, b).astype(jnp.float32)
    qi = stem_int8(x, w, b).astype(jnp.float32)
    err_i8 = float(jnp.abs(ref - qi).max())
    print(f"int8 max abs err vs bf16 path: {err_i8:.4f} "
          f"(ref max {float(ref.max()):.3f})")
    if t_f8 is not None:
        qf = stem_f8(x, w, b).astype(jnp.float32)
        print(f"f8 max abs err: {float(jnp.abs(ref - qf).max()):.4f}")


if __name__ == "__main__":
    main()
