"""Train state: one pytree carrying params + optimizer state + step.

The whole state lives on device across the run; the jitted train step
donates and returns it, so parameters never bounce through the host
(unlike the reference's per-batch ``.cuda()`` traffic,
``/root/reference/train.py:183-187``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

__all__ = ["TrainState", "create_train_state"]


@jax.tree_util.register_pytree_with_keys_class
class TrainState:
    """Minimal functional train state (params, opt_state, step)."""

    def __init__(self, params: Dict, opt_state: Any, step: jnp.ndarray):
        self.params = params
        self.opt_state = opt_state
        self.step = step

    def tree_flatten_with_keys(self):
        key = jax.tree_util.GetAttrKey
        return (
            (key("params"), self.params),
            (key("opt_state"), self.opt_state),
            (key("step"), self.step),
        ), None

    @classmethod
    def tree_unflatten(cls, _aux, children):
        return cls(*children)

    def replace(self, **kwargs) -> "TrainState":
        fields = {
            "params": self.params,
            "opt_state": self.opt_state,
            "step": self.step,
        }
        fields.update(kwargs)
        return TrainState(**fields)


def create_train_state(params: Dict, tx) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), dtype=jnp.int32),
    )
