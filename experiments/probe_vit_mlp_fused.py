"""Probe: Pallas fused LN+MLP block for the ViT (eval path).

Post-flash-bwd attribution (docs/PERF_NOTES.md "ViT image-encoder
family"): the remaining eval step is ~5.5 ms of MLP + projection
matmuls at 35-50% MXU efficiency, plus the LN outputs and the
[B, S, 4D] relu hidden materialized to HBM between them. This kernel
computes

    out = x + relu(ln(x) @ W1 + b1) @ W2 + b2

per image entirely in VMEM: the hidden tensor (196 x 1024 f32 = 0.8 MB)
never reaches HBM, the LN fuses into the first matmul's prologue, and
both weights stay VMEM-resident across the grid. Known ceiling: Mosaic
has no batched matmul, so M = S = 196 pads to 256 on the MXU (~77%
upper bound) — the bet is on the traffic elimination, not the matmul.

Measurements (on-device differenced loops, batch 512, S=196, D=256,
F=1024, bf16):
  --check   TPU-compiled parity vs the XLA chain
  --xla     op-level ln+mlp+residual, XLA
  --kernel  op-level, Pallas
  (full-model: python bench.py --vit with models/vit.py dispatch
  flipped — only the full bench decides, see the round-2 token-collapse
  negative result.)
"""

import functools
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _timing import timed_ms  # noqa: E402 - shared methodology

B, S, D, F = 512, 196, 256, 1024


def reference(x, ln_scale, ln_bias, w1, b1, w2, b2):
    from dl_vqa_tpu.models.transformer import _layer_norm

    hld = _layer_norm(x, ln_scale, ln_bias)
    hld = jax.nn.relu(
        jnp.dot(hld, w1, preferred_element_type=jnp.float32) + b1
    ).astype(x.dtype)
    mlp = (jnp.dot(hld, w2, preferred_element_type=jnp.float32)
           + b2).astype(x.dtype)
    return x + mlp


def _kernel(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
            *, chunk, eps=1e-5):
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    for i in range(chunk):
        x32 = x_ref[i].astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean((x32 - mean) ** 2, axis=-1, keepdims=True)
        ln = ((x32 - mean) * lax.rsqrt(var + eps) * ls_ref[0]
              + lb_ref[0]).astype(x_ref.dtype)
        h = jnp.dot(ln, w1, preferred_element_type=jnp.float32) + b1_ref[0]
        h = jnp.maximum(h, 0.0).astype(x_ref.dtype)
        mlp = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2_ref[0]
        out_ref[i] = (x32 + mlp).astype(out_ref.dtype)


def fused_ln_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, seq, dim = x.shape
    hidden = w1.shape[1]
    chunk = 8 if batch % 8 == 0 else 1
    kernel = functools.partial(_kernel, chunk=chunk)
    vec = lambda v: v.reshape(1, -1)  # noqa: E731 - 2D for Mosaic layouts
    full = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(batch // chunk,),
        out_shape=jax.ShapeDtypeStruct((batch, seq, dim), x.dtype),
        in_specs=[
            pl.BlockSpec((chunk, seq, dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full(1, dim), full(1, dim),
            full(dim, hidden), full(1, hidden),
            full(hidden, dim), full(1, dim),
        ],
        out_specs=pl.BlockSpec((chunk, seq, dim), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * seq * dim * hidden,
            bytes_accessed=2 * batch * seq * dim * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, vec(ln_scale), vec(ln_bias), w1, vec(b1), w2, vec(b2))


def make_args(dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, D)), dtype=dtype)
    ln_scale = jnp.asarray(rng.standard_normal(D), jnp.float32)
    ln_bias = jnp.asarray(rng.standard_normal(D), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((D, F)) * 0.05, dtype)
    b1 = jnp.asarray(rng.standard_normal(F), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((F, D)) * 0.05, dtype)
    b2 = jnp.asarray(rng.standard_normal(D), jnp.float32)
    return x, ln_scale, ln_bias, w1, b1, w2, b2


def timed(name, fn, args):
    return timed_ms(name, fn, *args, width=30)


def main(argv):
    args = make_args()
    if "--xla" in argv:
        timed("XLA ln+mlp+residual", jax.jit(reference), args)
    elif "--kernel" in argv:
        timed("Pallas fused ln+mlp", jax.jit(fused_ln_mlp), args)
    else:
        small = make_args(jnp.float32)
        small = tuple(
            a[:8] if a.ndim == 3 else a for a in small
        )
        out_k = fused_ln_mlp(*small)
        out_r = reference(*small)
        err = float(jnp.max(jnp.abs(out_k - out_r)))
        rel = err / (float(jnp.max(jnp.abs(out_r))) + 1e-9)
        print(f"parity: max|err|={err:.2e} rel={rel:.2e}", flush=True)
        assert rel < 5e-3
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
