"""Probe: where should the int8 stem's requantize live — pre-pool (big
tensor) or post-pool (4x smaller), riding an f8 pool?

The first full-model W8A8 measurement (`bench.py --int8-stem`) came in
at 18.0k QA/s — ABOVE bf16 parity (17.3k) but BELOW the f8 storage mode
(20.7k): the 1.31x MXU gain on conv1/conv2 is more than eaten by the
requant epilogue (scale, round, clip) running on every PRE-pool element.
The f8 mode's storage cast is nearly free (hardware convert fused into
the conv epilogue); round/clip is VPU work on a 3.2 GB tensor.

Hypothesis: do the cheap f8 cast pre-pool, pool in f8 (max commutes
with the monotone cast), and requantize to int8 POST-pool, where there
are 4x fewer elements — keeping the W8A8 convs' int8 inputs while
paying ~1/4 of the requant arithmetic. Also tried: folding the 127/s
output scale into the conv weights+bias so the pre-pool epilogue loses
its multiply (relu/round/clip only).

Two parts, both with the repo's on-device differenced-loop timing
(experiments/_timing.py — safe here: part 1's convs are bf16, part 2
is elementwise+pool only; INTEGER convs inside fori_loop are the
known >20-min compile tarpit, see probe_int8_conv.py):

1. conv0 block (bf16 conv 3->64 @ 224^2, batch 512) + epilogue variants
   ending in an int8 post-pool tensor (block-0 of the int8 stem).
2. conv1's epilogue alone on a synthetic s32 conv output (the conv is
   identical across variants): dequant+bias+relu+requant+int8-pool vs
   dequant+bias+relu+f8-cast+f8-pool+post-pool-requant.

Measured result (v5e, 2026-08-18): NEGATIVE — the hybrid is not worth
shipping. conv0 block: pre-pool requant 9.75 ms, folded-scale 9.52,
f8-pool+post-pool requant 9.29, f8-only floor 8.06 — the post-pool
requant pays its own HBM round trip over the pooled tensor, clawing
back only 0.46 ms of the 1.7 ms epilogue tax. conv1 epilogue in
isolation: hybrid 0.90x (LOSES; NB this sub-measurement is dominated by
the artificial 3 GB f32 accumulator read, which the real program never
materializes — it bounds the hybrid's upside, it does not attribute
the tax). Full table + conclusion: docs/PERF_NOTES.md "int8 W8A8
stem". The int8 mode stays at the shipped pre-pool pipeline; f8
remains the throughput mode.
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
S0 = 8.0      # static calibrated post-relu amax stand-in, block 0
S1 = 6.0      # block 1


def conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def pool(y, init):
    return lax.reduce_window(
        y, init, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def requant_int8(y, s):
    return jnp.clip(jnp.round(y * (127.0 / s)), 0, 127).astype(jnp.int8)


# ---------------------------------------------------- part 1: conv0 block

def block0_int8_prepool(x, w, b):
    """CURRENT conv_int8 pipeline: requant on the pre-pool tensor."""
    y = jax.nn.relu(conv(x, w).astype(jnp.float32) + b)
    return pool(requant_int8(y, S0), jnp.int8(-128))


def block0_fold_prepool(x, w_scaled, b_scaled):
    """Output scale folded into w,b (done outside the timed fn): the
    pre-pool epilogue is relu/round/clip only, no multiply."""
    y = jax.nn.relu(conv(x, w_scaled).astype(jnp.float32) + b_scaled)
    q = jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)
    return pool(q, jnp.int8(-128))


def block0_f8_postpool(x, w, b):
    """HYBRID: f8 cast pre-pool (cheap), f8 pool, int8 requant post-pool
    (4x fewer elements)."""
    y = jax.nn.relu(conv(x, w).astype(jnp.float32) + b)
    f8 = y.astype(jnp.float8_e4m3fn)
    p = pool(f8, jnp.finfo(jnp.float8_e4m3fn).min.astype(jnp.float8_e4m3fn))
    return requant_int8(p.astype(jnp.float32), S0)


def block0_f8_only(x, w, b):
    """f8 storage mode reference (no int8 anywhere) for context."""
    y = jax.nn.relu(conv(x, w).astype(jnp.float32) + b)
    f8 = y.astype(jnp.float8_e4m3fn)
    return pool(f8, jnp.finfo(jnp.float8_e4m3fn).min.astype(
        jnp.float8_e4m3fn))


# ------------------------------------------- part 2: conv1 epilogue alone

# conv1 output at reference shapes: [512, 107, 107, 128] s32 (VALID 3x3
# over the 109^2 post-pool block-0 output).
E_HW, E_C = 107, 128


def epi_requant_prepool(acc_f, wscale, b):
    """CURRENT: dequant, bias, relu, requant, int8 pool. ``acc_f`` is the
    s32 accumulator pre-converted to f32 (the convert is common to both
    variants and fuses into the conv in the real pipeline)."""
    y = jax.nn.relu(acc_f * wscale + b)
    return pool(requant_int8(y, S1), jnp.int8(-128))


def epi_f8_postpool(acc_f, wscale, b):
    """HYBRID: dequant, bias, relu, f8 cast, f8 pool, requant post-pool."""
    y = jax.nn.relu(acc_f * wscale + b)
    f8 = y.astype(jnp.float8_e4m3fn)
    p = pool(f8, jnp.finfo(jnp.float8_e4m3fn).min.astype(jnp.float8_e4m3fn))
    return requant_int8(p.astype(jnp.float32), S1)


def main(parts=("1", "2")):
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}; conv0 [B={B},{HW}^2,{CIN}->"
          f"{COUT}], epilogue [B={B},{E_HW}^2,{E_C}]", flush=True)

    if "1" in parts:
        x = jnp.asarray(rng.standard_normal((B, HW, HW, CIN)),
                        dtype=jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, CIN, COUT)) * 0.1,
                        dtype=jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((COUT,)) * 0.1,
                        dtype=jnp.float32)
        w_scaled = (w.astype(jnp.float32) * (127.0 / S0)).astype(
            jnp.bfloat16)
        b_scaled = b * (127.0 / S0)

        t_pre = timed_ms("conv0: int8 requant pre-pool",
                         block0_int8_prepool, x, w, b)
        t_fold = timed_ms("conv0: folded-scale pre-pool",
                          block0_fold_prepool, x, w_scaled, b_scaled)
        t_post = timed_ms("conv0: f8 pool, requant post",
                          block0_f8_postpool, x, w, b)
        t_f8 = timed_ms("conv0: f8-only reference", block0_f8_only, x, w, b)
        print(f"conv0 hybrid vs current: {t_pre / t_post:.2f}x "
              f"(f8-only floor {t_f8:.2f} ms, fold {t_fold:.2f} ms)",
              flush=True)

    if "2" in parts:
        acc_f = jax.device_put(jnp.asarray(
            rng.integers(0, 1 << 14, (B, E_HW, E_HW, E_C)),
            dtype=jnp.float32,
        ))
        wscale = jnp.asarray(rng.uniform(1e-4, 4e-4, (E_C,)),
                             dtype=jnp.float32)
        be = jnp.asarray(rng.standard_normal((E_C,)) * 0.1,
                         dtype=jnp.float32)
        t_epre = timed_ms("conv1 epi: requant pre-pool",
                          epi_requant_prepool, acc_f, wscale, be)
        t_epost = timed_ms("conv1 epi: f8 pool, requant post",
                           epi_f8_postpool, acc_f, wscale, be)
        print(f"conv1 epilogue hybrid vs current: {t_epre / t_epost:.2f}x")


if __name__ == "__main__":
    main(tuple(sys.argv[1:]) or ("1", "2"))
