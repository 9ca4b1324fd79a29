"""Parameter initializers matching PyTorch layer defaults.

Training-dynamics parity with the reference requires the same init
distributions torch uses:

* ``nn.Conv2d`` / ``nn.Linear``: kaiming-uniform(a=sqrt(5)) on weights,
  which simplifies to U(-1/sqrt(fan_in), 1/sqrt(fan_in)); biases the same;
* ``nn.LSTM``: every tensor U(-1/sqrt(hidden), 1/sqrt(hidden));
* ``nn.Embedding``: N(0, 1) with the padding row zeroed.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

__all__ = ["uniform_fan_in", "linear_params", "conv_params", "lstm_params",
           "embedding_params"]


def uniform_fan_in(key, shape: Sequence[int], fan_in: int,
                   dtype=jnp.float32) -> jnp.ndarray:
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, tuple(shape), dtype, -bound, bound)


def linear_params(key, in_features: int, out_features: int,
                  use_bias: bool = True) -> dict:
    """Weight stored [in, out] (matmul-ready; torch stores [out, in])."""
    wkey, bkey = jax.random.split(key)
    params = {"w": uniform_fan_in(wkey, (in_features, out_features), in_features)}
    if use_bias:
        params["b"] = uniform_fan_in(bkey, (out_features,), in_features)
    return params


def conv_params(key, kernel: int, in_channels: int, out_channels: int,
                use_bias: bool = True) -> dict:
    """Weight stored HWIO (torch stores OIHW); fan_in = C_in * k * k."""
    wkey, bkey = jax.random.split(key)
    fan_in = in_channels * kernel * kernel
    params = {
        "w": uniform_fan_in(
            wkey, (kernel, kernel, in_channels, out_channels), fan_in
        )
    }
    if use_bias:
        params["b"] = uniform_fan_in(bkey, (out_channels,), fan_in)
    return params


def lstm_params(key, input_features: int, hidden: int) -> dict:
    """One direction. Gate layout i,f,g,o along the 4H axis (torch order);
    torch's two biases (b_ih + b_hh) are folded into one ``b``, initialized
    as the sum of two U(-1/sqrt(H), 1/sqrt(H)) draws."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "w_ih": uniform_fan_in(k1, (input_features, 4 * hidden), hidden),
        "w_hh": uniform_fan_in(k2, (hidden, 4 * hidden), hidden),
        "b": uniform_fan_in(k3, (4 * hidden,), hidden)
        + uniform_fan_in(k4, (4 * hidden,), hidden),
    }


def embedding_params(key, num_tokens: int, features: int) -> jnp.ndarray:
    table = jax.random.normal(key, (num_tokens, features), jnp.float32)
    return table.at[0].set(0.0)  # padding / <unknown> row
