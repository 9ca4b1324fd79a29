"""Probe: does an s8 x s8 -> s32 convolution double MXU throughput on
v5e vs bf16 for the compute-bound conv1/conv2 blocks?

After the f8-stem change the CNN eval step's remaining time is
dominated by conv1 (5.7 ms) and conv2 (4.2 ms), both at ~80-100% of
their bf16 compute floor (tools/fusion_table.py --f8-stem). The v5e MXU
runs int8 at 2x the bf16 rate; if XLA lowers an integer conv onto it,
an opt-in int8 inference mode could halve those blocks.

Timing method: an UNROLLED chain of K SAME-padded convs in one program
(y_{i+1} = conv(y_i) with a tiny data dependency), so each variant is
ONE compile and one dispatch; per-conv time = (wall - RTT) / K with the
RTT measured on an empty jitted identity. fori_loop+conv at these
shapes is a compile-time tarpit through the relay (>20 min for one
program — see the session log), which is why the usual on-device-loop
method is NOT used here.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B, K = 512, 16


def conv_same(x, w, od=None):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=od,
    )


def measure_rtt():
    f = jax.jit(lambda s: s + 1.0)
    x = jnp.float32(0.0)
    float(f(x))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        times.append(time.perf_counter() - t0)
    return min(times)


def timed_chain(name, chain_fn, x, rtt):
    run = jax.jit(chain_fn)
    float(run(x).astype(jnp.float32).sum())  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x).astype(jnp.float32).sum())
        times.append(time.perf_counter() - t0)
    per = (min(times) - rtt) / K * 1e3
    print(f"{name:28s}: {per:7.3f} ms/conv "
          f"(wall {min(times)*1e3:.1f} ms, rtt {rtt*1e3:.1f} ms)",
          flush=True)
    return per


def main():
    rng = np.random.default_rng(0)
    w_bf = jnp.asarray(
        rng.standard_normal((3, 3, 64, 64)) * 0.05, dtype=jnp.bfloat16
    )
    w_i8 = jnp.asarray(rng.integers(-4, 5, (3, 3, 64, 64)), dtype=jnp.int8)
    x_bf = jnp.asarray(
        rng.standard_normal((B, 111, 111, 64)), dtype=jnp.bfloat16
    )
    x_i8 = jnp.asarray(rng.integers(-8, 9, (B, 111, 111, 64)),
                       dtype=jnp.int8)

    def chain_bf(x):
        y = x
        for _ in range(K):
            y = conv_same(y, w_bf) * jnp.bfloat16(0.1)
        return y

    def chain_i8(x):
        y = x
        for _ in range(K):
            # s32 accum, shift back into s8 range (cheap epilogue)
            y = (conv_same(y, w_i8, jnp.int32) // 1024).astype(jnp.int8)
        return y

    print(f"backend: {jax.default_backend()}; chain K={K}, "
          f"[512,111,111,64] 3x3 64->64", flush=True)
    rtt = measure_rtt()
    t_bf = timed_chain("bf16 conv chain", chain_bf, x_bf, rtt)
    try:
        t_i8 = timed_chain("int8 conv chain", chain_i8, x_i8, rtt)
        print(f"int8 speedup: {t_bf / t_i8:.2f}x", flush=True)
    except Exception as e:  # noqa: BLE001 - probe
        print(f"int8 chain failed: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
