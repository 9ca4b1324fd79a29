"""Probe: int8 W8A8 for the ViT block matmuls (MLP pair + projections).

Post-flash-backward, the ViT eval step's largest remaining region is
the block matmuls (~5.5 ms of the 11.7 ms step) running at 35-50% MXU
efficiency — a COMPUTE ceiling (bf16 K=256 contractions), unlike the
CNN stem's bandwidth walls. The int8 MXU path runs at 2x the bf16
rate, so if the requantization epilogues fuse, W8A8 attacks exactly
this ceiling. The CNN int8 lesson (docs/PERF_NOTES.md "int8 W8A8
stem": requant ate the 1.31x conv gain) may not transfer: matmuls at
these shapes have ~4x the FLOPs-per-byte of the conv0 block.

Protocol (static PTQ shapes, like ops/conv_int8): weights pre-quantized
per-output-channel (host-side, free at serving), activations quantized
with a STATIC per-tensor scale (one fused multiply+round+clip, the
serving deployment's calibrated path). Measured per-iteration on-device
(experiments/_timing.py) at the ViT shape: B=512, S=196, D=256, F=1024.

Run on the real chip:  python experiments/probe_vit_int8_mlp.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from experiments._timing import timed_ms  # noqa: E402

B, S, D, F = 512, 196, 256, 1024


def quantize_weight(w):
    """Per-output-channel symmetric int8 (host-side, once)."""
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def main() -> None:
    print(f"backend={jax.default_backend()} shapes B={B} S={S} D={D} F={F}")
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((B * S, D)), jnp.bfloat16)
    w1 = jnp.asarray(r.standard_normal((D, F)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(r.standard_normal((F,)) * 0.05, jnp.float32)
    w2 = jnp.asarray(r.standard_normal((F, D)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(r.standard_normal((D,)) * 0.05, jnp.float32)

    def mlp_bf16(x, w1, b1, w2, b2):
        h = jax.nn.relu(
            jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
        ).astype(jnp.bfloat16)
        return (
            jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2
        ).astype(jnp.bfloat16)

    base = timed_ms("mlp pair, bf16 (current)", mlp_bf16, x, w1, b1, w2, b2)

    w1q, s1 = quantize_weight(w1.astype(jnp.float32))
    w2q, s2 = quantize_weight(w2.astype(jnp.float32))
    sx = float(jnp.max(jnp.abs(x)).astype(jnp.float32)) / 127.0  # static
    # static post-relu activation scale for the second matmul (PTQ-style:
    # measured from this distribution once)
    h_probe = jax.nn.relu(
        jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
    )
    sh = float(jnp.max(h_probe)) / 127.0

    def q(x, scale):
        return jnp.clip(
            jnp.round(x.astype(jnp.float32) / scale), -127, 127
        ).astype(jnp.int8)

    def mlp_w8a8(x, w1q, b1, w2q, b2):
        xq = q(x, sx)
        acc1 = jax.lax.dot_general(
            xq, w1q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        h = jax.nn.relu(acc1.astype(jnp.float32) * (sx * s1) + b1)
        hq = q(h, sh)
        acc2 = jax.lax.dot_general(
            hq, w2q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc2.astype(jnp.float32) * (sh * s2) + b2).astype(
            jnp.bfloat16
        )

    w8a8 = timed_ms("mlp pair, int8 W8A8 (static PTQ)", mlp_w8a8,
                    x, w1q, b1, w2q, b2)

    # Upper bound: pre-quantized activations (no requant at all) — how
    # fast is the pure int8 matmul pair if requant were free?
    xq0 = q(x, sx)

    def mlp_int8_pure(xq_f, w1q, w2q):
        # first arg must be float for the timing dependency; cast in.
        xq = xq_f.astype(jnp.int8)
        acc1 = jax.lax.dot_general(
            xq, w1q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        hq = jnp.clip(acc1 // 1024, -127, 127).astype(jnp.int8)
        acc2 = jax.lax.dot_general(
            hq, w2q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc2

    pure = timed_ms("mlp pair, int8 no-requant bound", mlp_int8_pure,
                    xq0.astype(jnp.bfloat16), w1q, w2q)

    # Parity check of the W8A8 path against bf16 at these scales.
    ref = mlp_bf16(x, w1, b1, w2, b2).astype(jnp.float32)
    got = mlp_w8a8(x, w1q, b1, w2q, b2).astype(jnp.float32)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    print(f"W8A8 rel error vs bf16: {rel:.4f}")
    print(f"speedup: W8A8 {base / w8a8:.2f}x, "
          f"no-requant bound {base / pure:.2f}x")


if __name__ == "__main__":
    main()
