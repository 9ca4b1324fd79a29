"""Analytic model FLOPs + MFU accounting for the bench harness.

VERDICT r3 item 8: the perf bar should be auditable per variant, not
only vs the 10k QA/s target. This module computes the matmul/conv FLOPs
of one forward sample analytically from the ``ModelConfig`` (the same
convention as the scaling-book MFU numbers: 2 FLOPs per MAC, matmuls and
convs only — elementwise, softmax, and normalization work is excluded),
plus the peak bf16 FLOP/s of the local accelerator, so the bench can
report ``mfu = achieved_flops_per_sec / peak``.

Quantized modes (f8 stem, int8 W8A8) are rated against the *bf16* peak:
the model FLOP count is dtype-independent, so their MFU is an
"effective-bf16" utilization and can exceed the bf16-bound roofline
share without implying >100% hardware utilization.

Reference model anatomy: conv stack ref ``models/model.py:72-84``,
bi-LSTM ref ``models/model.py:134-166``, attention ref
``models/model.py:169-221``, classifier ref ``models/model.py:198-205``.
"""

from __future__ import annotations

from typing import Optional

__all__ = ["eval_flops_per_sample", "train_flops_per_sample",
           "device_peak_flops", "mfu"]

#: Question sequence pad length used by the bench batches (the reference
#: corpus' max question length is ~23 tokens, SURVEY §2 row 8).
DEFAULT_SEQ_LEN = 23


def eval_flops_per_sample(cfg, seq_len: int = DEFAULT_SEQ_LEN) -> float:
    """Matmul/conv FLOPs of one forward (eval) sample for ``cfg``.

    Counts every MXU contraction in the model: conv stack or ViT blocks,
    LSTM/transformer text encoder, attention-fusion projections, and the
    classifier MLP. MoE MLPs count top_k routed expert FLOPs per token
    (the dispatch/combine one-hot einsums are bookkeeping, not model
    math, and are excluded like other non-matmul work).
    """
    f = 0.0
    img = cfg.image
    if img.encoder == "cnn":
        size = cfg.image_size
        k, s = img.kernel_size, img.stride
        for cin, cout in zip(img.num_channels[:-1], img.num_channels[1:]):
            out = (size - k) // s + 1          # VALID conv
            f += 2.0 * out * out * cout * cin * k * k
            size = out // 2                     # maxpool 2,2
        grid, cv = size, img.num_channels[-1]
    else:  # vit
        patch, d_model = img.patch_size, img.num_channels[-1]
        grid = cfg.image_size // patch
        tokens = grid * grid
        f += 2.0 * tokens * d_model * (patch * patch * 3)   # patch embed
        attn = (
            2.0 * tokens * d_model * 3 * d_model            # qkv proj
            + 2.0 * tokens * tokens * d_model               # q @ k^T
            + 2.0 * tokens * tokens * d_model               # weights @ v
            + 2.0 * tokens * d_model * d_model              # out proj
        )
        mlp = 2.0 * (2.0 * tokens * d_model * 4 * d_model)  # in + out matmul
        if img.moe_experts:
            mlp *= img.moe_top_k
        f += img.num_layers * (attn + mlp)
        cv = d_model

    txt = cfg.text
    if txt.encoder == "lstm":
        hidden, emb = txt.question_features, txt.embedding_features
        dirs = 2 if txt.bidirectional else 1
        # Per step per direction: [E]x[E,4H] + [H]x[H,4H] gate matmuls.
        f += dirs * txt.num_lstm_layers * seq_len * 2.0 * 4 * hidden * (
            emb + hidden
        )
    else:  # transformer text encoder
        d_model = txt.question_features
        attn = (
            2.0 * seq_len * d_model * 3 * d_model
            + 2.0 * seq_len * seq_len * d_model * 2
            + 2.0 * seq_len * d_model * d_model
        )
        mlp = 2.0 * (2.0 * seq_len * d_model * 4 * d_model)
        f += txt.num_layers * (attn + mlp)
    q_dim = txt.output_features

    att = cfg.attention
    hw = grid * grid
    mid, glimpses = att.hidden_dim, att.glimpses
    # '|' fuses by channel concat, doubling the score-conv input width
    # (ref models/model.py:183-195; models/vqa.py:148, fusion.py:43,125).
    x_in = 2 * mid if att.do_option == "|" else mid
    if att.variant == "single":
        f += (
            2.0 * hw * mid * cv          # x_conv 1x1 projection
            + 2.0 * mid * q_dim          # q_lin
            + 2.0 * hw * glimpses * x_in  # glimpse-logit 1x1
        )
    elif att.variant == "stacked":
        # One shared v_proj/q_lin pass, then per glimpse a width-1 score
        # conv and (between glimpses) an update linear (fusion.py:63-116).
        f += (
            2.0 * hw * mid * cv
            + 2.0 * mid * q_dim
            + glimpses * 2.0 * hw * x_in          # score convs (1 out ch)
            + (glimpses - 1) * 2.0 * cv * mid     # update linears
        )
    elif att.variant == "co":
        # Image side mirrors 'single'; the token side attends over
        # seq_len question tokens, not hw image positions
        # (fusion.py:140-211; token_features == q_dim per vqa.py init).
        f += (
            2.0 * hw * mid * cv
            + 2.0 * mid * q_dim
            + 2.0 * hw * glimpses * x_in
            + 2.0 * cv * mid                      # vsum_lin
            + 2.0 * seq_len * q_dim * mid         # tok_lin
            + 2.0 * q_dim * q_dim                 # tok_out
        )
    else:
        # Unknown variant: cost as 'single' so MFU stays defined.
        f += 2.0 * hw * mid * cv + 2.0 * mid * q_dim + 2.0 * hw * glimpses * x_in

    combined = att.glimpses * cv + q_dim
    f += 2.0 * (
        combined * cfg.classifier.hidden_dim
        + cfg.classifier.hidden_dim * cfg.max_answers
    )
    return f


def train_flops_per_sample(cfg, seq_len: int = DEFAULT_SEQ_LEN) -> float:
    """Fwd + bwd FLOPs per sample: backward costs ~2x the forward (dx and
    dw contractions per matmul), the standard 3x-forward accounting."""
    return 3.0 * eval_flops_per_sample(cfg, seq_len)


#: Peak dense bf16 FLOP/s per chip by TPU generation (public spec sheets).
_PEAKS = (
    ("v6 lite", 918e12),   # Trillium / v6e
    ("v6e", 918e12),
    ("v5 lite", 197e12),   # v5e
    ("v5e", 197e12),
    ("v5p", 459e12),
    ("v5", 459e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 46e12),
)


def device_peak_flops(device=None) -> Optional[float]:
    """Peak bf16 FLOP/s of the local device, or None when unknown (CPU,
    interpreters) — callers report mfu: null rather than a made-up peak."""
    import jax

    dev = device if device is not None else jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower()
    if "tpu" not in kind and dev.platform != "tpu":
        return None
    for tag, peak in _PEAKS:
        if tag in kind:
            return peak
    return None


def mfu(flops_per_sample: float, samples_per_sec_per_chip: float,
        device=None) -> Optional[float]:
    """Model FLOPs utilization in [0, 1], or None off-TPU."""
    peak = device_peak_flops(device)
    if peak is None:
        return None
    return flops_per_sample * samples_per_sec_per_chip / peak
