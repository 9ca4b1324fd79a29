"""Probe: maxpool-backward restructure — kill select_and_scatter?

VERDICT r4 item 2(a): the fused train step's remaining structural cost
is the pool-gradient scatter (select_and_scatter, 21.2 ms across the 3
conv blocks vs a ~17 ms traffic floor — docs/PERF_NOTES.md "Train-step
backward"). This measures an exact restructure against it.

Key identity: conv(k=3,s=1) + 2x2/2 maxpool is equal to a per-window
SELECT over 4 stride-2 "phase" convs (phase (di,dj) computes the conv
at output rows 2i+di, cols 2j+dj):

    pooled = sum_k mask_k * relu(conv_phase_k(x) + b)

where mask_k one-hot-selects each window's (first) argmax phase. The
backward of that form never materializes the conv-size cotangent dz:

  * mask_k from quadrant equality vs the pooled maximum, with
    first-max tie routing (cumulative &~taken) — matches
    select_and_scatter's tie rule exactly;
  * per-phase gated cotangents g_k = g * (pooled>0) * mask_k are
    POOLED-size (1/4 of dz);
  * dx/dw come from the vjp of the 4 stride-2 phase convs applied to
    g_k — XLA's conv-transpose emitters consume the quarter-size
    cotangents directly, so the 3.2 GB (conv0) dz write + re-read(s)
    disappear, traded for reading y's 4 quadrants (same bytes as the
    scatter's y read) and 4-way conv splitting.

Strategies measured per block shape (batch 512, reference scale):
  A: current fastgrad backward (pool vjp = select_and_scatter)
  B: 4-phase backward (this probe)
Block 0 measures d(w,b) only — the image has no grad path and XLA DCEs
the dx conv in the real step. Equivalence asserted before timing.

Run: python experiments/probe_pool_bwd.py [--check-only]
"""

from __future__ import annotations

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dl_vqa_tpu.utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()

from experiments._timing import timed_ms

PHASES = ((0, 0), (0, 1), (1, 0), (1, 1))


def _conv(x, w, stride=1):
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _forward(x, w, b):
    y = jax.nn.relu(_conv(x, w).astype(jnp.float32) + b).astype(x.dtype)
    pooled = lax.reduce_window(
        y, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    return y, pooled


# ---------------------------------------------------------- strategy A

def bwd_scatter(x, w, y, pooled, g, wrt_x=True):
    """Current fastgrad backward: pooled-side relu gate + bias grad,
    select_and_scatter pool routing, XLA conv-transpose dx/dw."""
    g_gated = (g * (pooled > 0)).astype(y.dtype)
    db = g_gated.astype(jnp.float32).sum(axis=(0, 1, 2))
    _, pool_vjp = jax.vjp(
        lambda t: lax.reduce_window(
            t, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ),
        y,
    )
    (dz,) = pool_vjp(g_gated)
    if wrt_x:
        _, conv_vjp = jax.vjp(lambda x_, w_: _conv(x_, w_), x, w)
        dx, dw = conv_vjp(dz)
        return dx, dw, db
    _, conv_vjp = jax.vjp(lambda w_: _conv(x, w_), w)
    (dw,) = conv_vjp(dz)
    return dw, db


# ---------------------------------------------------------- strategy B

def bwd_phases(x, w, y, pooled, g, wrt_x=True):
    """4-phase backward: first-max quadrant masks route pooled-size
    cotangents straight into stride-2 conv vjps; dz never exists."""
    hp, wp = pooled.shape[1], pooled.shape[2]
    g_gated = (g * (pooled > 0)).astype(y.dtype)
    db = g_gated.astype(jnp.float32).sum(axis=(0, 1, 2))

    taken = jnp.zeros(pooled.shape, dtype=bool)
    g_ks = []
    for di, dj in PHASES:
        quad = y[:, di:di + 2 * hp:2, dj:dj + 2 * wp:2, :]
        eq = (quad == pooled) & ~taken
        taken = taken | eq
        g_ks.append(jnp.where(eq, g_gated, 0).astype(y.dtype))

    def phase_conv(x_, w_, di, dj):
        return _conv(x_[:, di:, dj:, :], w_, stride=2)[:, :hp, :wp, :]

    dx = jnp.zeros(x.shape, x.dtype) if wrt_x else None
    dw = jnp.zeros(w.shape, jnp.float32)
    for (di, dj), g_k in zip(PHASES, g_ks):
        if wrt_x:
            _, vjp_k = jax.vjp(
                lambda x_, w_, di=di, dj=dj: phase_conv(x_, w_, di, dj),
                x, w,
            )
            dx_k, dw_k = vjp_k(g_k)
            dx = dx + dx_k
        else:
            _, vjp_k = jax.vjp(
                lambda w_, di=di, dj=dj: phase_conv(x, w_, di, dj), w
            )
            (dw_k,) = vjp_k(g_k)
        dw = dw + dw_k.astype(jnp.float32)
    dw = dw.astype(w.dtype)
    return (dx, dw, db) if wrt_x else (dw, db)


# ------------------------------------------------------------- harness

BLOCKS = [  # (name, cin, cout, in_size, wrt_x)
    ("conv0 224^2 3->64", 3, 64, 224, False),
    ("conv1 111^2 64->128", 64, 128, 111, True),
    ("conv2 54^2 128->256", 128, 256, 54, True),
]
BATCH = 512


def run_block(name, cin, cout, size, wrt_x, batch, check_only):
    rng = np.random.default_rng(1)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((batch, size, size, cin)), dtype=dt)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, dtype=dt)
    b = jnp.asarray(rng.standard_normal((cout,)), dtype=jnp.float32)
    y, pooled = jax.jit(_forward)(x, w, b)
    g = jnp.asarray(
        rng.standard_normal(pooled.shape) * 0.1, dtype=jnp.float32
    )

    outs_a = jax.jit(lambda *a: bwd_scatter(*a, wrt_x=wrt_x))(
        x, w, y, pooled, g
    )
    outs_b = jax.jit(lambda *a: bwd_phases(*a, wrt_x=wrt_x))(
        x, w, y, pooled, g
    )
    for ta, tb, label in zip(outs_a, outs_b,
                             ("dx", "dw", "db") if wrt_x else ("dw", "db")):
        err = float(
            jnp.max(jnp.abs(ta.astype(jnp.float32) - tb.astype(jnp.float32)))
        )
        scale = float(jnp.max(jnp.abs(ta.astype(jnp.float32)))) or 1.0
        print(f"  {name} {label}: max|A-B| {err:.3e} (rel {err / scale:.1e})",
              flush=True)
        assert err / scale < 2e-2, (name, label, err, scale)
    if check_only:
        return None, None

    def tsum(outs):
        return sum(o.astype(jnp.float32).sum() for o in outs)

    ms_a = timed_ms(
        f"A scatter   {name}",
        lambda x_, w_, y_, p_, g_: tsum(
            bwd_scatter(x_, w_, y_, p_, g_, wrt_x=wrt_x)
        ),
        x, w, y, pooled, g,
    )
    ms_b = timed_ms(
        f"B 4-phase   {name}",
        lambda x_, w_, y_, p_, g_: tsum(
            bwd_phases(x_, w_, y_, p_, g_, wrt_x=wrt_x)
        ),
        x, w, y, pooled, g,
    )
    return ms_a, ms_b


def main():
    check_only = "--check-only" in sys.argv
    batch = 8 if check_only else BATCH
    total_a = total_b = 0.0
    for name, cin, cout, size, wrt_x in BLOCKS:
        ms_a, ms_b = run_block(name, cin, cout, size, wrt_x, batch,
                               check_only)
        if ms_a is not None:
            total_a += ms_a
            total_b += ms_b
    if not check_only:
        print(f"TOTAL backward (3 blocks): A {total_a:.2f} ms vs "
              f"B {total_b:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
