"""Probe: f8e4m3 storage for the ViT MLP hidden tensor.

Post-flash-backward, the ViT eval step's remaining HBM traffic is
dominated by the block matmuls; the largest single intermediate is the
MLP hidden [B, S, 4D] (batch 512 x 196 x 1024 bf16 = 205 MB written by
mlp_in's epilogue and re-read by mlp_out's prologue, ~0.5 ms of pure
bandwidth per layer at v5e's ~820 GB/s). Same lever as the CNN stem's
f8 activation storage (docs/PERF_NOTES.md "f8 activation-storage
stem"): cast the relu output to f8e4m3 in the first matmul's epilogue
and upcast in the second's prologue — the cast fuses both ways, the
MXU computes in bf16 either way, and only the HBM round trip shrinks.

Run on the real chip:  python experiments/probe_vit_f8_mlp.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from experiments._timing import timed_ms  # noqa: E402

B, S, D, F = 512, 196, 256, 1024


def main() -> None:
    print(f"backend={jax.default_backend()} shapes B={B} S={S} D={D} F={F}")
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((B, S, D)), jnp.bfloat16)
    w1 = jnp.asarray(r.standard_normal((D, F)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(r.standard_normal((F,)) * 0.05, jnp.float32)
    w2 = jnp.asarray(r.standard_normal((F, D)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(r.standard_normal((D,)) * 0.05, jnp.float32)

    def mlp(store):
        def f(x, w1, b1, w2, b2):
            h = jax.nn.relu(
                jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
            ).astype(store)
            return (
                jnp.dot(h.astype(jnp.bfloat16), w2,
                        preferred_element_type=jnp.float32) + b2
            ).astype(jnp.bfloat16)

        return f

    base = timed_ms("mlp pair, bf16 hidden (current)", mlp(jnp.bfloat16),
                    x, w1, b1, w2, b2)
    f8 = timed_ms("mlp pair, f8e4m3 hidden store", mlp(jnp.float8_e4m3fn),
                  x, w1, b1, w2, b2)
    print(f"delta: {base - f8:+.3f} ms/layer ({base / f8:.2f}x)")

    # numerical cost at these shapes (relative error of the block output)
    out_ref = np.asarray(
        jax.jit(mlp(jnp.bfloat16))(x, w1, b1, w2, b2), np.float32
    )
    out_f8 = np.asarray(
        jax.jit(mlp(jnp.float8_e4m3fn))(x, w1, b1, w2, b2), np.float32
    )
    rel = np.abs(out_f8 - out_ref) / (np.abs(out_ref) + 1e-6)
    print(f"f8 rel err: mean {rel.mean():.4f}  p99 "
          f"{np.percentile(rel, 99):.4f}")


if __name__ == "__main__":
    main()
