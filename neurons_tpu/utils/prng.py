"""Explicit PRNG threading.

Replaces the reference's global seeding (`utils.seed_everything`, reference
utils.py:25-36) and implicit torch RNG state with functional JAX PRNG keys.
Every stochastic component receives a named subkey, so runs are reproducible
under jit, across hosts, and across restarts by construction.
"""

from __future__ import annotations

from typing import Dict, Iterator, Sequence

import jax
import jax.numpy as jnp


def root_key(seed: int = 42) -> jax.Array:
    return jax.random.PRNGKey(seed)


def split_named(key: jax.Array, names: Sequence[str]) -> Dict[str, jax.Array]:
    """Deterministically derive one subkey per name (order-independent)."""
    return {name: jax.random.fold_in(key, _stable_hash(name)) for name in names}


def _stable_hash(name: str) -> int:
    # FNV-1a, stable across processes (unlike Python hash()).
    h = 2166136261
    for c in name.encode():
        h = ((h ^ c) * 16777619) & 0xFFFFFFFF
    return h


def epoch_key(key: jax.Array, epoch: int, step: int = 0) -> jax.Array:
    return jax.random.fold_in(jax.random.fold_in(key, epoch), step)


def key_iter(key: jax.Array) -> Iterator[jax.Array]:
    while True:
        key, sub = jax.random.split(key)
        yield sub
