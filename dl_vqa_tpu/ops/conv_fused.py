"""Conv(k,k,VALID) + bias + ReLU + maxpool(2,2) blocks: XLA reference path
plus experimental Pallas fusion kernels.

The reference's image encoder is ``Conv2d -> ReLU -> MaxPool2d(2,2)``
blocks (``/root/reference/models/model.py:79-84``). On TPU the dominant
cost is HBM traffic: at batch 512 the first block's conv output is a
3.2 GB intermediate written and re-read just to be pooled.

STATUS (all measured on v5e, see docs/PERF_NOTES.md for the full table):
XLA's native conv emitter WINS — every fusion approach here loses to it,
each for a Mosaic lane-layout reason documented on the respective
function. The kernels are kept as tested, documented experiments; the
model's default path is :func:`conv_relu_pool_reference`, and the
dispatch in :func:`conv_relu_pool` defaults accordingly.

Kernel catalog:

* :func:`conv_relu_pool_pallas` — per-image tap-matmul conv with in-VMEM
  relu+pool (relayout copies of the shifted views dominate);
* :func:`conv_relu_pool_stem` — 4-phase patches matmul computing conv AND
  pool in one kernel (XLA-side strided patch extraction dominates);
* :func:`relu_maxpool_pallas` — pool-only kernel over a lane-merged view
  (the "free view" is a physical relayout under TPU tiled layouts);
* :func:`maxpool2` — equality-mask pool backward (neutral speed, tie
  semantics differ; default pool uses standard autodiff).

Backward passes are exact via ``custom_vjp`` recompute through the XLA
reference implementation.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

__all__ = ["conv_relu_pool", "conv_relu_pool_reference", "conv_relu_pool_pallas"]


# ------------------------------------------------------------- maxpool

def _maxpool2_forward(y: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


@jax.custom_vjp
def maxpool2(y: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 max pool whose BACKWARD is an elementwise equality mask
    instead of XLA's select_and_scatter.

    Semantics differ from select_and_scatter at EXACT ties inside a
    window: the cotangent is routed to every tied maximum instead of the
    first. Post-relu zero ties are harmless (the upstream relu gradient
    zeroes those paths), but with bf16 activations positive bitwise ties
    are plausible, so tied windows receive 2-4x gradient. Measured only
    ~5% faster than select_and_scatter in isolation, so the model's
    default pool uses standard autodiff (exact semantics); this op is an
    opt-in alternative.
    """
    return _maxpool2_forward(y)


def _maxpool2_fwd(y):
    pooled = _maxpool2_forward(y)
    return pooled, (y, pooled)


def _maxpool2_bwd(residuals, g):
    y, pooled = residuals
    batch, hp, wp, channels = pooled.shape
    y_crop = y[:, : 2 * hp, : 2 * wp, :]

    def up(t):  # [B, hp, wp, C] -> [B, 2hp, 2wp, C] (window broadcast)
        t = jnp.broadcast_to(
            t[:, :, None, :, None, :], (batch, hp, 2, wp, 2, channels)
        )
        return t.reshape(batch, 2 * hp, 2 * wp, channels)

    dx = jnp.where(y_crop == up(pooled), up(g), 0).astype(y.dtype)
    pad_h = y.shape[1] - 2 * hp
    pad_w = y.shape[2] - 2 * wp
    if pad_h or pad_w:
        dx = jnp.pad(dx, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    return (dx,)


maxpool2.defvjp(_maxpool2_fwd, _maxpool2_bwd)


# ------------------------------------------------------------- reference

def conv_relu_pool_reference(
    x: jnp.ndarray,  # [B, H, W, Cin]
    w: jnp.ndarray,  # [K, K, Cin, Cout]
    b: jnp.ndarray,  # [Cout]
    stride: int = 1,
) -> jnp.ndarray:
    """Plain XLA implementation (used for grads, CPU, and stride != 1).

    The conv stays dtype-uniform (operands AND output in x.dtype): a
    mixed f32-preferred output makes the conv transpose rule reject the
    f32 cotangent against bf16 weights during backward. TPU convs
    accumulate in f32 internally regardless; the bias add runs in f32.
    """
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = jax.nn.relu(out.astype(jnp.float32) + b).astype(x.dtype)
    return _maxpool2_forward(out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv_relu_pool_quantstore(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    stride: int = 1,
    store_dtype=jnp.float8_e4m3fn,
) -> jnp.ndarray:
    """conv+bias+relu+pool with the conv output STORED in a narrow dtype.

    The block's cost on TPU is the HBM round trip of the conv output
    (3.2 GB for conv0 at batch 512) between the conv epilogue and the
    pool read. Casting the relu output to ``store_dtype`` before the pool
    halves that traffic: XLA fuses the convert into the conv epilogue and
    runs ``reduce_window`` over the narrow type (max commutes with the
    monotone cast), and the result is cast back to ``x.dtype``.

    Measured on v5e (batch 512): conv0 9.04 -> 7.70 ms with f8e4m3
    (int8 requant LOSES, 9.94 ms — the round/clip epilogue doesn't pay);
    full parity-scale model with the cast on all three blocks: 17,276 ->
    20,736 QA pairs/s/chip (+20%, ``python bench.py --f8-stem``). See
    experiments/probe_stem_quant.py and docs/PERF_NOTES.md.

    Numerics: activations are quantized to 4-bit-mantissa f8 (~3-6%
    relative error per element), so this is an opt-in inference-serving
    mode (``train.image.store_dtype``), NOT eligible for reference-parity
    runs. The backward is a straight-through estimator: gradients are
    computed through the exact-dtype reference block (XLA has no AD rule
    for f8 ``reduce_window`` inside a fused train step, and the STE is
    the standard treatment for a quantized forward anyway).
    """
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = jax.nn.relu(out.astype(jnp.float32) + b).astype(store_dtype)
    # NB: f8e4m3fn is a finite-only format (no inf; -inf casts to NaN),
    # so the pool's init value is the dtype's finite minimum.
    pooled = jax.lax.reduce_window(
        y, jnp.asarray(jnp.finfo(store_dtype).min, store_dtype), jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )
    return pooled.astype(x.dtype)


def _quantstore_fwd(x, w, b, stride, store_dtype):
    return conv_relu_pool_quantstore(x, w, b, stride, store_dtype), (x, w, b)


def _quantstore_bwd(stride, store_dtype, residuals, g):
    # Straight-through: exact gradients of the UNQUANTIZED block (the
    # fastgrad-structured backward, same values as plain autodiff).
    x, w, b = residuals
    _, vjp = jax.vjp(
        lambda x_, w_, b_: conv_relu_pool_fastgrad(x_, w_, b_, stride),
        x, w, b,
    )
    return vjp(g)


conv_relu_pool_quantstore.defvjp(_quantstore_fwd, _quantstore_bwd)


# ------------------------------------------------------------- pallas

def _pick_tr(hp: int, wc_pad: int, cin: int, cout: int,
             itemsize: int = 2) -> int:
    """Pooled rows per chunk: bound the f32 accumulator + a tap view to
    ~3 MB of VMEM. ``itemsize`` is the INPUT dtype's (the tap view reads
    input-typed blocks — an f32 input doubles the view bytes)."""
    budget = 3 * 1024 * 1024
    for tr in (32, 16, 8, 4, 2, 1):
        if tr > hp:
            continue
        view = 2 * tr * wc_pad * cin * max(itemsize, 2)  # tap view
        acc = 2 * tr * wc_pad * cout * 4                 # f32 accumulator
        if 2 * view + acc <= budget:
            return tr
    return 1


def _fused_kernel(x_ref, w_ref, b_ref, out_ref, *, ksize, cin, cout, hp, wp,
                  wc_pad, tr):
    """One image: chunked tap-matmul conv + relu + pool, all in VMEM.

    Mosaic shape rules honored: the input width is pre-padded so every
    conv-row slice is ``wc_pad`` (a multiple of 16) wide — that makes the
    [2*TR, wc_pad, Cin] -> [2*TR*wc_pad, Cin] collapse legal — and pooling
    uses split-reshape + max reductions (strided slices would lower to
    unsupported gathers).
    """
    import jax.experimental.pallas as pl

    bias = b_ref[:].astype(jnp.float32)  # [1, Cout]
    n_chunks = pl.cdiv(hp, tr)

    def chunk(ci, _):
        # Clamp so the tail chunk recomputes overlap instead of ragged shapes.
        r0 = jnp.minimum(ci * tr, hp - tr)
        # One matmul per filter tap: Mosaic cannot concatenate row/col
        # shifted views into an im2col matrix (vector-layout offset
        # mismatch), but a [2*TR*wc_pad, Cin] x [Cin, Cout] matmul per tap
        # keeps layouts aligned and still feeds the MXU a full-width
        # contraction for Cin >= 16.
        acc = jnp.zeros((2 * tr * wc_pad, cout), dtype=jnp.float32)
        for di in range(ksize):
            for dj in range(ksize):
                view = x_ref[0, pl.ds(2 * r0 + di, 2 * tr), dj : dj + wc_pad, :]
                acc = acc + jnp.dot(
                    view.reshape(2 * tr * wc_pad, cin),
                    w_ref[di * ksize + dj],
                    preferred_element_type=jnp.float32,
                )
        acc = jnp.maximum(acc + bias, 0.0)
        # 2x2 max pool (floor semantics; columns beyond 2*Wp are padding
        # garbage and are sliced away on the write).
        conv = acc.reshape(2 * tr, wc_pad, cout)
        pooled_w = conv.reshape(2 * tr, wc_pad // 2, 2, cout).max(axis=2)
        pooled = pooled_w.reshape(tr, 2, wc_pad // 2, cout).max(axis=1)
        out_ref[0, pl.ds(r0, tr)] = pooled[:, :wp, :].astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk, 0)


def conv_relu_pool_pallas(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused forward on TPU (stride 1). ``interpret=True`` runs the kernel
    in the Pallas interpreter for CPU testing."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, h, width, cin = x.shape
    ksize, _, _, cout = w.shape
    wc = width - ksize + 1
    hc = h - ksize + 1
    hp, wp = hc // 2, wc // 2
    # Pad the width so every conv-row slice is a multiple of 16 wide
    # (Mosaic's collapse-reshape requirement) and stays in bounds for the
    # rightmost tap.
    wc_pad = -(-wc // 16) * 16
    w_pad = wc_pad + ksize - 1
    if w_pad > width:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, w_pad - width), (0, 0)))
    tr = _pick_tr(hp, wc_pad, cin, cout, x.dtype.itemsize)

    w2 = w.astype(x.dtype).reshape(ksize * ksize, cin, cout)
    bias = b.reshape(1, cout)

    kernel = functools.partial(
        _fused_kernel, ksize=ksize, cin=cin, cout=cout,
        hp=hp, wp=wp, wc_pad=wc_pad, tr=tr,
    )
    flops = 2 * batch * hc * wc_pad * cout * ksize * ksize * cin
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, hp, wp, cout), x.dtype),
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, h, w_pad if w_pad > width else width, cin),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ksize * ksize, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hp, wp, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize
            + batch * hp * wp * cout * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w2, bias)


# ----------------------------------------------- fused bias+relu+maxpool

def _relu_pool_kernel(y_ref, b2_ref, out_ref, *, hp, wp, channels):
    """One row-chunk of one image, input pre-merged to [2*tr, Wp, 2C]
    (W-pairs sit in lane halves after the free XLA view reshape)."""
    x = y_ref[0].astype(jnp.float32) + b2_ref[:]          # [2tr, Wp, 2C]
    x = jnp.maximum(x, 0.0)
    m = jnp.maximum(x[:, :, :channels], x[:, :, channels:])   # W-pool
    tr = m.shape[0] // 2
    pooled = m.reshape(tr, 2, m.shape[1], channels).max(axis=1)  # H-pool
    out_ref[0] = pooled.astype(out_ref.dtype)


def relu_maxpool_pallas(y: jnp.ndarray, b: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """Fused bias + ReLU + 2x2 maxpool over a conv output ``[B, Hc, Wc,
    C]`` -> ``[B, Hc//2, Wc//2, C]``.

    The W-pair merge ``[B, Hc, Wc, C] -> [B, Hc, Wc/2, 2C]`` happens in
    XLA outside the kernel — inside, pooling is a lane-half max plus an
    outer-dim split, both supported for any C.

    STATUS: correct (tested) but NOT a win on v5e — the merge reshape is
    a physical relayout under TPU tiled layouts (not a free view), which
    costs more than it saves. Kept as an experimental op.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, hc, wc, channels = y.shape
    hp, wp = hc // 2, wc // 2
    y = y[:, : 2 * hp, : 2 * wp, :].reshape(batch, 2 * hp, wp, 2 * channels)
    bias2 = jnp.concatenate([b, b]).reshape(1, 2 * channels).astype(
        jnp.float32
    )

    # Row chunking: keep the input block ~<= 3 MB; tr must divide hp.
    tr = hp
    row_bytes = wp * 2 * channels * y.dtype.itemsize
    for cand in range(hp, 0, -1):
        if hp % cand == 0 and 2 * cand * row_bytes <= 3 * 1024 * 1024:
            tr = cand
            break

    kernel = functools.partial(_relu_pool_kernel, hp=hp, wp=wp,
                               channels=channels)
    return pl.pallas_call(
        kernel,
        grid=(batch, hp // tr),
        out_shape=jax.ShapeDtypeStruct((batch, hp, wp, channels), y.dtype),
        in_specs=[
            pl.BlockSpec((1, 2 * tr, wp, 2 * channels),
                         lambda i, r: (i, r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * channels), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr, wp, channels),
                               lambda i, r: (i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=y.size * 3,
            bytes_accessed=y.size * y.dtype.itemsize
            + batch * hp * wp * channels * y.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(y, bias2)


def _relu_pool_direct_kernel(y_ref, b_ref, out_ref, *, bi, tr, wp,
                             channels):
    """[bi, 2tr, 2wp, C] -> [bi, tr, wp, C]. H-pool first (outer-dim
    split — free under tiled layouts), then the W-pool's sub-tile split.
    The [.., 2, C] minor pair pads to a full (sublane, lane) tile in
    VMEM (2 -> 16, C=64 -> 128 for bf16 — a 16x inflation), so tr is
    kept SMALL and bi recovers DMA efficiency batching images instead
    of rows."""
    x = y_ref[...].astype(jnp.float32) + b_ref[0]        # [bi,2tr,2wp,C]
    x = jnp.maximum(x, 0.0).astype(out_ref.dtype)
    m = x.reshape(bi, tr, 2, 2 * wp, channels).max(axis=2)   # H-pool
    pooled = m.reshape(bi, tr, wp, 2, channels).max(axis=3)  # W-pool
    out_ref[...] = pooled


def relu_maxpool_pallas_direct(y: jnp.ndarray, b: jnp.ndarray,
                               interpret: bool = False) -> jnp.ndarray:
    """Fused bias + ReLU + 2x2 maxpool, sub-tile reshapes IN-KERNEL.

    The round-1 variant (:func:`relu_maxpool_pallas`) needed an XLA-side
    W-pair merge that is a physical relayout (measured ~29 ms at the
    conv0 shape — the round-1 Mosaic toolchain could not lower the
    ``[.., W, C] -> [.., W/2, 2, C]`` sub-tile split for C=64). The
    round-5 toolchain lowers that split (probe_mosaic_recheck), so this
    variant pools directly on the unmodified conv output block: one HBM
    read of y + one pooled write. Pool math matches the XLA reference
    exactly (bias+relu in f32, cast to the storage dtype, THEN max —
    same order as conv_relu_pool_reference).

    STATUS: correct (exact parity on TPU) but a measured LOSS — 29.1 ms
    vs XLA's 4.43 ms at the conv0 shape (v5e, round 5,
    experiments/probe_mosaic_recheck.py). The sub-tile split now
    LOWERS, but Mosaic materializes the [.., W/2, 2, C] intermediate
    with its minor pair padded to a full (16, 128) tile — a 16x VMEM
    inflation that forces tiny row chunks and thousands of grid steps.
    XLA's reduce_window already runs AT the HBM traffic floor here;
    kept as an experimental op for future toolchains. Deliberately NOT
    in any dispatch (the CLAUDE.md kernel convention's dispatch/gradient
    requirements apply to shipped kernels): it is a forward-only eval op
    — no custom VJP is defined, and differentiating through the raw
    pallas_call raises rather than silently degrading.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, hc, wc, channels = y.shape
    hp, wp = hc // 2, wc // 2
    if hc != 2 * hp or wc != 2 * wp:
        y = y[:, : 2 * hp, : 2 * wp, :]
    bias = b.reshape(1, channels).astype(jnp.float32)

    # tr bounds the padded W-pool intermediate ([bi, tr, wp, 2, C] pads
    # its minor pair to a full tile); bi batches images per grid step so
    # DMA transfers stay large despite the small tr.
    tr = next(
        (c for c in range(3, 0, -1) if hp % c == 0), 1
    )
    pad_unit = 16 * ((channels + 127) // 128 * 128)  # padded (2, C) tile
    bi = 1
    for cand in (16, 8, 4, 2, 1):
        if batch % cand:
            continue
        padded = cand * tr * wp * pad_unit * y.dtype.itemsize
        in_block = cand * 2 * tr * 2 * wp * channels * y.dtype.itemsize
        if padded + 2 * in_block <= 10 * 1024 * 1024:
            bi = cand
            break

    kernel = functools.partial(_relu_pool_direct_kernel, bi=bi, tr=tr,
                               wp=wp, channels=channels)
    return pl.pallas_call(
        kernel,
        grid=(batch // bi, hp // tr),
        out_shape=jax.ShapeDtypeStruct((batch, hp, wp, channels), y.dtype),
        in_specs=[
            pl.BlockSpec((bi, 2 * tr, 2 * wp, channels),
                         lambda i, r: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, channels), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bi, tr, wp, channels),
                               lambda i, r: (i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=y.size * 3,
            bytes_accessed=y.size * y.dtype.itemsize
            + batch * hp * wp * channels * y.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(y, bias)


# --------------------------------------------- fused stem (conv+relu+pool)

def _stem_kernel(p_ref, w2_ref, b4_ref, out_ref, *, kdim, cout, wp, wp_pad,
                 hp, tr):
    """One row-chunk: patches [tr, wp_pad, K] -> matmul [K, 4*cout] ->
    bias + relu -> max over the 4 pooling phases (lane groups)."""
    import jax.experimental.pallas as pl

    patches = p_ref[0].reshape(tr * wp_pad, kdim)
    acc = jnp.dot(patches, w2_ref[:], preferred_element_type=jnp.float32)
    acc = jnp.maximum(acc + b4_ref[:], 0.0)
    m = acc[:, :cout]
    for phase in range(1, 4):
        m = jnp.maximum(m, acc[:, phase * cout : (phase + 1) * cout])
    out_ref[0] = m.reshape(tr, wp_pad, cout)[:, :wp, :].astype(out_ref.dtype)


def conv_relu_pool_stem(x, w, b, interpret=False):
    """Fully fused stem block (small cin, e.g. the RGB input): conv + bias
    + relu + 2x2 maxpool with NO materialized conv output.

    Trick: the pooled output at (i, j) is the max over the four conv
    positions (2i+a, 2j+c), which together read a (k+1)x(k+1) input
    window. XLA extracts those windows ONCE at pooled resolution via
    strided slices (patches [B, Hp, Wp, (k+1)^2*cin] — for the RGB stem
    that is ~5x smaller than the conv output it replaces), and one Pallas
    matmul against a 4-phase weight matrix [(k+1)^2*cin, 4*cout] computes
    all four phases in the lane dim; pooling is a 4-way lane-group max.

    STATUS: correct (tested) but NOT a win on v5e — the XLA-side strided
    patch extraction alone costs ~8 ms at batch 512 (cin=3 lane layouts
    make strided slices relayout-bound), vs ~11 ms for the whole XLA
    conv+pool. Kept as an experimental op; the model does not use it.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, h, width, cin = x.shape
    ksize, _, _, cout = w.shape
    hc, wc = h - ksize + 1, width - ksize + 1
    hp, wp = hc // 2, wc // 2
    win = ksize + 1
    kdim = win * win * cin
    wp_pad = -(-wp // 16) * 16

    # Pad W so strided windows exist for the padded pooled columns. H
    # needs no padding: the tallest slice below reads rows up to
    # di + 2*(hp-1) < 2*hp + ksize - 1 <= h (hp = (h-ksize+1)//2), an
    # invariant of the pooled-resolution geometry.
    need_w = 2 * (wp_pad - 1) + win
    pad_w = max(0, need_w - width)
    if pad_w:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_w), (0, 0)))

    # Patches at pooled resolution: [B, hp, wp_pad, win*win*cin].
    views = []
    for di in range(win):
        for dj in range(win):
            views.append(
                jax.lax.slice(
                    x,
                    (0, di, dj, 0),
                    (batch, di + 2 * (hp - 1) + 1,
                     dj + 2 * (wp_pad - 1) + 1, cin),
                    (1, 2, 2, 1),
                )
            )
    patches = jnp.concatenate(views, axis=-1)

    # 4-phase weights: phase (a, c) holds w shifted by (a, c) inside the
    # (k+1)x(k+1) window; zeros where the shifted filter has no tap.
    w2 = jnp.zeros((kdim, 4 * cout), dtype=x.dtype)
    for a in range(2):
        for c in range(2):
            phase = a * 2 + c
            for di in range(ksize):
                for dj in range(ksize):
                    tap = (di + a) * win + (dj + c)
                    w2 = w2.at[
                        tap * cin : (tap + 1) * cin,
                        phase * cout : (phase + 1) * cout,
                    ].set(w[di, dj].astype(x.dtype))
    b4 = jnp.tile(b.astype(jnp.float32), 4).reshape(1, 4 * cout)

    # Row chunking: the largest divisor of hp whose f32 accumulator fits.
    tr = 1
    for cand in range(min(hp, 64), 0, -1):
        if hp % cand == 0 and cand * wp_pad * 4 * cout * 4 <= 6 * 1024 * 1024:
            tr = cand
            break

    kernel = functools.partial(
        _stem_kernel, kdim=kdim, cout=cout, wp=wp, wp_pad=wp_pad, hp=hp,
        tr=tr,
    )
    flops = 2 * batch * hp * wp_pad * kdim * 4 * cout

    out = pl.pallas_call(
        kernel,
        grid=(batch, hp // tr),
        out_shape=jax.ShapeDtypeStruct((batch, hp, wp, cout), x.dtype),
        in_specs=[
            pl.BlockSpec((1, tr, wp_pad, kdim), lambda i, r: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kdim, 4 * cout), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * cout), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tr, wp, cout), lambda i, r: (i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=patches.size * patches.dtype.itemsize
            + batch * hp * wp * cout * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(patches, w2, b4)
    return out


# ------------------------------------------- fast whole-block backward

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv_relu_pool_fastgrad(x, w, b, stride=1):
    """conv+bias+relu+maxpool with a hand-structured backward.

    Forward math is identical to :func:`conv_relu_pool_reference`; the
    backward restructures where the elementwise work happens. XLA's
    default pipeline pays three full-size (conv-output, e.g. 3.2 GB for
    conv0 at batch 512) passes beyond the convs themselves: a relu
    rematerialization, the windowed ``select_and_scatter`` (maxpool
    gradient), and a separate ``reduce_sum`` of the full cotangent for
    the bias grad. Two observations remove all but the scatter:

    * select_and_scatter routes each pool window's cotangent to exactly
      one position, so the bias grad equals the POOLED-side reduction
      ``(g * (pooled > 0)).sum()`` — no full-size read;
    * the relu gate can likewise be applied on the pooled side
      (``g * (pooled > 0)``) BEFORE the scatter: a window whose max is
      positive routes to a position where relu passes anyway, and a
      window whose max is zero must contribute zero gradient.

    The relu output ``y`` is kept as a residual (already materialized by
    the forward), so nothing is rematerialized; dz then feeds XLA's
    conv-transpose emitters for dx/dw. dx and dw are bit-identical to
    plain autodiff of the reference implementation (same
    select_and_scatter tie semantics); db matches up to reduction-order
    rounding (pooled-side sum vs full-size sum of the same values).
    Asserted in tests/test_pallas.py.

    Measured on v5e (batch 512, reference scale): XLA-default backward
    spends ~39 ms on conv0 alone (relu remat 10.3 + select_and_scatter
    11.4 + bias-grad reduce 8.5 + dw 9.0); see the train-backward table
    in docs/PERF_NOTES.md for what this path removes.
    """
    return conv_relu_pool_reference(x, w, b, stride)


def _fastgrad_fwd(x, w, b, stride):
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = jax.nn.relu(out.astype(jnp.float32) + b).astype(x.dtype)
    pooled = _maxpool2_forward(y)
    # NB: b's cotangent dtype is recovered from w (params share a dtype
    # here); b itself isn't needed for any backward value.
    return pooled, (x, w, y, pooled)


#: Pool-gradient routing strategy inside the fastgrad backward:
#: 'scatter' — select_and_scatter on the saved relu output (the round-2
#: default); 'phases' — 4-phase decomposition (conv+pool == per-window
#: select over 4 stride-2 phase convs): first-max quadrant masks route
#: POOLED-size cotangents straight into the phase convs' vjps, so the
#: conv-size dz (3.2 GB at conv0/batch 512) is never materialized.
#: Gradients are select_and_scatter-exact including first-max tie
#: routing (asserted in tests/test_pallas.py). Default by measurement:
#: experiments/probe_pool_bwd.py on v5e — see docs/PERF_NOTES.md
#: "Train-step backward".
POOL_BACKWARD = "scatter"

_PHASES = ((0, 0), (0, 1), (1, 0), (1, 1))


def _fastgrad_bwd_phases(stride, x, w, y, pooled, g_gated, db):
    """4-phase dz-free backward (see POOL_BACKWARD; stride-1 only —
    phase conv stride is 2*stride with offsets di*stride, kept simple
    for the reference's stride-1 config)."""
    hp, wp = pooled.shape[1], pooled.shape[2]
    taken = jnp.zeros(pooled.shape, dtype=bool)
    g_ks = []
    for di, dj in _PHASES:
        quad = y[:, di:di + 2 * hp:2, dj:dj + 2 * wp:2, :]
        # First-max tie routing, row-major window order — exactly
        # select_and_scatter's rule.
        eq = (quad == pooled) & ~taken
        taken = taken | eq
        g_ks.append(jnp.where(eq, g_gated, 0).astype(y.dtype))

    def phase_conv(x_, w_, di, dj):
        out = jax.lax.conv_general_dilated(
            x_[:, di:, dj:, :], w_.astype(x_.dtype),
            window_strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out[:, :hp, :wp, :]

    dx = jnp.zeros(x.shape, x.dtype)
    dw = jnp.zeros(w.shape, jnp.float32)
    for (di, dj), g_k in zip(_PHASES, g_ks):
        _, vjp_k = jax.vjp(
            lambda x_, w_, di=di, dj=dj: phase_conv(x_, w_, di, dj), x, w
        )
        dx_k, dw_k = vjp_k(g_k)
        dx = dx + dx_k
        dw = dw + dw_k.astype(jnp.float32)
    return dx, dw.astype(w.dtype), db.astype(w.dtype)


def _fastgrad_bwd(stride, residuals, g):
    x, w, y, pooled = residuals

    # Relu gate on the POOLED side (see the op docstring for why this is
    # exact), fused by XLA with the bias-grad reduction below — both run
    # over pooled-size tensors (1/4 of the conv output).
    g_gated = (g * (pooled > 0)).astype(y.dtype)
    db = g_gated.astype(jnp.float32).sum(axis=(0, 1, 2))

    if POOL_BACKWARD == "phases" and stride == 1:
        return _fastgrad_bwd_phases(stride, x, w, y, pooled, g_gated, db)

    # Maxpool backward via the pool's own VJP (select_and_scatter) on the
    # saved relu output — no rematerialization pass.
    _, pool_vjp = jax.vjp(_maxpool2_forward, y)
    (dz,) = pool_vjp(g_gated)

    def conv_only(x_, w_):
        return jax.lax.conv_general_dilated(
            x_, w_.astype(x_.dtype),
            window_strides=(stride, stride),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    _, conv_vjp = jax.vjp(conv_only, x, w)
    dx, dw = conv_vjp(dz)
    return dx, dw, db.astype(w.dtype)


conv_relu_pool_fastgrad.defvjp(_fastgrad_fwd, _fastgrad_bwd)


# ------------------------------------------------------------- dispatch

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_with_grad(x, w, b, stride, interpret):
    return conv_relu_pool_pallas(x, w, b, interpret=interpret)


def _fused_fwd(x, w, b, stride, interpret):
    return conv_relu_pool_pallas(x, w, b, interpret=interpret), (x, w, b)


def _fused_bwd(stride, interpret, residuals, g):
    x, w, b = residuals
    # Exact gradients through the (identical-math) XLA implementation.
    _, vjp = jax.vjp(
        lambda x_, w_, b_: conv_relu_pool_reference(x_, w_, b_, stride),
        x, w, b,
    )
    return vjp(g)


_fused_with_grad.defvjp(_fused_fwd, _fused_bwd)


def conv_relu_pool(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    stride: int = 1,
    use_pallas: bool = False,
    interpret: bool = False,
    fast_backward: bool = True,
    store_dtype=None,
) -> jnp.ndarray:
    """Fused conv+relu+pool block.

    ``store_dtype`` (a narrow jnp dtype, e.g. ``jnp.float8_e4m3fn``)
    stores the conv output in 8 bits between conv and pool — an opt-in
    inference-serving mode that changes numerics; see
    :func:`conv_relu_pool_quantstore`. It takes precedence over the
    other paths.

    ``use_pallas=False`` is the measured default: on v5e the XLA conv
    emitter (with its implicit patch streaming) beats this kernel — the
    per-tap shifted-view relayout copies cost ~9x the input bytes in VPU
    traffic (measured 29ms vs 10ms for the 111px/64ch block at batch 512).
    The kernel is kept as an optional path (and for the RGB stem it is
    never eligible: cin < 16 pads the contraction dim to 128 lanes).

    ``fast_backward=True`` is the measured default for the gradient path:
    the hand-structured whole-block backward (pooled-side relu gate +
    bias grad, no relu remat / full-size bias reduce; see
    :func:`conv_relu_pool_fastgrad`) raised the fused train step from
    3,350 to 4,229 samples/s/chip on v5e (batch 512, reference scale;
    5,009 combined with the u8 dropout masks and bf16 attention-hidden
    storage — docs/PERF_NOTES.md). Forward math, eval, and gradient
    values (select_and_scatter tie semantics included) are identical
    either way.
    """
    if store_dtype is not None:
        return conv_relu_pool_quantstore(x, w, b, stride, store_dtype)
    on_tpu = jax.default_backend() == "tpu"
    cin = x.shape[-1]
    if use_pallas and stride == 1 and cin >= 16 and (on_tpu or interpret):
        return _fused_with_grad(x, w, b, stride, interpret)
    if fast_backward:
        return conv_relu_pool_fastgrad(x, w, b, stride)
    return conv_relu_pool_reference(x, w, b, stride)
