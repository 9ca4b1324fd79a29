"""Probe: the 'co' attention text path used to run FOUR LSTM scans
(bilstm_token_states + bilstm_final_cell over the same inputs); the
fused bilstm_tokens_and_final_cell runs TWO, with the final cell states
riding the token-state scans as the scan carry.

Op-level A/B at reference scale (batch 512, T=23, E=300, H=512 per
direction, bf16), on-device differenced loops (experiments/_timing.py).
Values are bit-identical (the carry IS the final cell); tests/test_lstm.py
pins it — this probe only measures the scan-count saving.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _timing import timed_ms  # noqa: E402 - shared methodology
from dl_vqa_tpu.ops.lstm import (  # noqa: E402
    bilstm_final_cell,
    bilstm_token_states,
    bilstm_tokens_and_final_cell,
)

B, T, E, H = 512, 23, 300, 512


def make_params(key):
    k1, k2, k3 = jax.random.split(key, 3)
    s = 0.05
    return {
        "w_ih": jax.random.normal(k1, (E, 4 * H), jnp.float32) * s,
        "w_hh": jax.random.normal(k2, (H, 4 * H), jnp.float32) * s,
        "b": jax.random.normal(k3, (4 * H,), jnp.float32) * s,
    }


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, E)), jnp.bfloat16)
    lengths = jnp.asarray(rng.integers(5, T + 1, (B,)), jnp.int32)
    fwd = make_params(jax.random.PRNGKey(0))
    bwd = make_params(jax.random.PRNGKey(1))

    def four_scans(x):
        # bilstm_token_states (2 scans, cell discarded) + separate
        # bilstm_final_cell (2 scans) = the old co text path's cost.
        tokens = bilstm_token_states(x, lengths, fwd, bwd)
        pooled = bilstm_final_cell(x, lengths, fwd, bwd)
        return tokens.astype(jnp.float32).sum() + \
            pooled.astype(jnp.float32).sum()

    def two_scans(x):
        tokens, pooled = bilstm_tokens_and_final_cell(x, lengths, fwd, bwd)
        return tokens.astype(jnp.float32).sum() + \
            pooled.astype(jnp.float32).sum()

    # Parity first (cheap shapes are pointless here — same fn, same data).
    a = jax.jit(two_scans)(x)
    b = jax.jit(four_scans)(x)
    print(f"parity |a-b| = {abs(float(a) - float(b)):.3e}")

    timed_ms("4 scans (old co text path)", four_scans, x, width=28)
    timed_ms("2 scans (fused)", two_scans, x, width=28)


if __name__ == "__main__":
    main()
