"""Probe: re-check the Mosaic sub-tile reshape limitations (round 5).

The conv0 eval-path wall (bias+relu+pool0 at 5.65 ms vs a ~4.9 ms
traffic floor, and the whole fused-stem family of negative results in
docs/PERF_NOTES.md "Stem (conv0) fusion attempts") traces to a set of
Mosaic lowering gaps documented in PERF_NOTES "Mosaic reshape findings"
— all measured on the round-1 toolchain. The round-4 verdict asks for a
re-probe on the CURRENT toolchain: if any of the C=64 sub-tile cases
now lowers, the direct fused relu+pool kernel becomes buildable and the
conv0 pool can approach its floor.

Each case compiles a minimal Pallas kernel on the real TPU and reports
OK / FAIL(reason). If case `w_pair_split_c64` passes, the probe also
times the existing experimental kernel `ops.conv_fused.relu_maxpool_
pallas` (whose XLA-side merge was the round-1 blocker) and a direct
in-kernel variant against the XLA bias+relu+reduce_window baseline at
the conv0 shape.

Run: python experiments/probe_mosaic_recheck.py [--cases-only]
"""

from __future__ import annotations

import functools
import os
import sys
import traceback

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dl_vqa_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()


def _try(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"  {name:32s}: OK", flush=True)
        return True
    except Exception as exc:  # noqa: BLE001 - report, don't die
        first = str(exc).strip().splitlines()
        first = first[0][:140] if first else type(exc).__name__
        print(f"  {name:32s}: FAIL ({first})", flush=True)
        return False


def make_cases():
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def run_kernel(kernel, x, out_shape):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(*out_shape),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)
                      if False else pl.BlockSpec(x.shape,
                                                 lambda: (0,) * x.ndim)],
            out_specs=pl.BlockSpec(out_shape[0], lambda: (0,) * len(
                out_shape[0])),
        )(x)

    rng = np.random.default_rng(0)
    cases = {}

    for c in (64, 128):
        x = jnp.asarray(rng.standard_normal((16, 32, c)), jnp.bfloat16)

        def split_kernel(x_ref, o_ref, c=c):
            v = x_ref[...]
            o_ref[...] = v.reshape(16, 16, 2, c).max(axis=2)

        cases[f"w_pair_split_c{c}"] = (
            lambda x=x, k=split_kernel, c=c: run_kernel(
                k, x, ((16, 16, c), jnp.bfloat16)
            )
        )

        def merge_kernel(x_ref, o_ref, c=c):
            v = x_ref[...]
            o_ref[...] = v.reshape(16, 16, 2 * c)

        cases[f"w_pair_merge_c{c}"] = (
            lambda x=x, k=merge_kernel, c=c: run_kernel(
                k, x, ((16, 16, 2 * c), jnp.bfloat16)
            )
        )

        def strided_kernel(x_ref, o_ref, c=c):
            v = x_ref[...]
            o_ref[...] = jnp.maximum(v[:, 0::2, :], v[:, 1::2, :])

        cases[f"strided_slice_c{c}"] = (
            lambda x=x, k=strided_kernel, c=c: run_kernel(
                k, x, ((16, 16, c), jnp.bfloat16)
            )
        )

        def concat_shift_kernel(x_ref, o_ref, c=c):
            v = x_ref[...]
            o_ref[...] = jnp.concatenate([v[:, 1:, :], v[:, :1, :]], axis=1)

        cases[f"concat_shifted_c{c}"] = (
            lambda x=x, k=concat_shift_kernel, c=c: run_kernel(
                k, x, ((16, 32, c), jnp.bfloat16)
            )
        )

    return cases


def time_pool_variants():
    from experiments._timing import timed_ms
    from dl_vqa_tpu.ops.conv_fused import (
        relu_maxpool_pallas,
        relu_maxpool_pallas_direct,
    )

    rng = np.random.default_rng(1)
    # conv0 output shape, batch 512, reference scale
    y = jnp.asarray(
        rng.standard_normal((512, 222, 222, 64)), dtype=jnp.bfloat16
    )
    b = jnp.asarray(rng.standard_normal((64,)), dtype=jnp.float32)

    def xla_pool(y_, b_):
        z = jax.nn.relu(y_.astype(jnp.float32) + b_).astype(y_.dtype)
        return jax.lax.reduce_window(
            z, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )

    a = jax.jit(xla_pool)(y, b)
    for name, fn in (("merged", relu_maxpool_pallas),
                     ("direct", relu_maxpool_pallas_direct)):
        try:
            p = jax.jit(fn)(y, b)
        except Exception as exc:  # noqa: BLE001
            print(f"  pallas {name}-pool: compile FAIL "
                  f"({str(exc).splitlines()[0][:120]})", flush=True)
            continue
        err = float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - p.astype(jnp.float32)
        )))
        print(f"  parity xla vs pallas {name}: max|d| {err:.2e}",
              flush=True)
    timed_ms("xla bias+relu+pool (conv0)", xla_pool, y, b)
    timed_ms("pallas merged-pool (conv0)", relu_maxpool_pallas, y, b)
    # Loop perturbation on the SMALL operand: fusing the +eps producer
    # into the kernel's big operand trips a compile-helper crash (its
    # layout constraint vs the fused add's chosen layout).
    timed_ms("pallas direct-pool (conv0)",
             lambda b_, y_: relu_maxpool_pallas_direct(y_, b_), b, y)


def main():
    print(f"jax {jax.__version__}, devices {jax.devices()}", flush=True)
    cases = make_cases()
    results = {}
    for name, fn in cases.items():
        results[name] = _try(name, fn)
    if "--cases-only" in sys.argv:
        return
    if results.get("w_pair_split_c64") or results.get("strided_slice_c64"):
        print("C=64 sub-tile path now lowers — timing pool variants:",
              flush=True)
        time_pool_variants()
    else:
        print("C=64 sub-tile reshapes still blocked; conv0 fused pool "
              "remains closed on this toolchain.", flush=True)


if __name__ == "__main__":
    main()
