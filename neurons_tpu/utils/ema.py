"""Exponential-moving-average shadow parameters.

TPU-native counterpart of the reference's LitEma (reference
sgm/modules/ema.py:10-86): a pure pytree of shadow params updated with the
same decay schedule min(decay, (1 + n) / (10 + n)), swappable for
inference (`ema_scope`). Being a pytree, the state shards with the same
NamedSharding as the live params and checkpoints through Orbax unchanged.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    shadow: Any          # pytree matching params
    num_updates: jax.Array  # int32 scalar
    decay: float


def init(params, decay: float = 0.9999) -> EmaState:
    return EmaState(shadow=jax.tree.map(jnp.asarray, params),
                    num_updates=jnp.zeros((), jnp.int32), decay=decay)


def update(state: EmaState, params) -> EmaState:
    n = state.num_updates + 1
    d = jnp.minimum(state.decay, (1.0 + n) / (10.0 + n))
    shadow = jax.tree.map(
        lambda s, p: s - (1.0 - d) * (s - p.astype(s.dtype)),
        state.shadow, params)
    return EmaState(shadow=shadow, num_updates=n, decay=state.decay)


def swap(state: EmaState, params):
    """The `ema_scope` enter: returns (shadow params to run with, the live
    params to restore afterwards)."""
    return state.shadow, params
