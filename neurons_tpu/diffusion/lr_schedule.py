"""Diffusion-training LR multiplier schedules — optax-compatible.

Re-design of the reference's sgm Lambda schedulers (reference
generative_models/sgm/lr_scheduler.py:4-135: LambdaWarmUpCosineScheduler,
LambdaWarmUpCosineScheduler2, LambdaLinearScheduler). The reference
returns a Python object called per step by torch's LambdaLR; here each
builder returns a pure `step -> multiplier` function over jnp scalars, so
it drops into `optax.scale_by_schedule` (or multiplies a base lr) and
traces cleanly inside a jitted train step. Use with base lr 1.0 semantics
exactly like the reference ("note: use with a base_lr of 1.0").
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def warmup_cosine(warm_up_steps: int, lr_min: float, lr_max: float,
                  lr_start: float, max_decay_steps: int):
    """reference lr_scheduler.py:4-48 (single cycle)."""

    def schedule(n):
        n = jnp.asarray(n, jnp.float32)
        warm = (lr_max - lr_start) / warm_up_steps * n + lr_start
        t = jnp.minimum((n - warm_up_steps)
                        / (max_decay_steps - warm_up_steps), 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(n < warm_up_steps, warm, cos)

    return schedule


def _cycle_state(n, cycle_lengths: Sequence[int]):
    """(cycle index, step within cycle) — reference lr_scheduler.py:76-85.
    The reference's `n <= cum` boundary puts the cycle's last step in the
    earlier interval; searchsorted(side='left') reproduces that."""
    cum = np.cumsum([0] + list(cycle_lengths))
    cycle = jnp.searchsorted(jnp.asarray(cum[1:]), n, side="left")
    cycle = jnp.minimum(cycle, len(cycle_lengths) - 1)
    return cycle, n - jnp.asarray(cum[:-1])[cycle]


def cyclic_warmup_cosine(warm_up_steps: Sequence[int],
                         f_min: Sequence[float], f_max: Sequence[float],
                         f_start: Sequence[float],
                         cycle_lengths: Sequence[int]):
    """reference lr_scheduler.py:51-110 (repeated cycles)."""
    assert len(warm_up_steps) == len(f_min) == len(f_max) == len(f_start) \
        == len(cycle_lengths)
    wu = jnp.asarray(warm_up_steps, jnp.float32)
    fmin, fmax = jnp.asarray(f_min), jnp.asarray(f_max)
    fstart = jnp.asarray(f_start)
    cl = jnp.asarray(cycle_lengths, jnp.float32)

    def schedule(n):
        c, n_c = _cycle_state(jnp.asarray(n), cycle_lengths)
        n_c = n_c.astype(jnp.float32)
        warm = (fmax[c] - fstart[c]) / wu[c] * n_c + fstart[c]
        t = jnp.minimum((n_c - wu[c]) / (cl[c] - wu[c]), 1.0)
        cos = fmin[c] + 0.5 * (fmax[c] - fmin[c]) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(n_c < wu[c], warm, cos)

    return schedule


def cyclic_warmup_linear(warm_up_steps: Sequence[int],
                         f_min: Sequence[float], f_max: Sequence[float],
                         f_start: Sequence[float],
                         cycle_lengths: Sequence[int]):
    """reference lr_scheduler.py:113-135 LambdaLinearScheduler — the
    schedule SD training configs actually use."""
    assert len(warm_up_steps) == len(f_min) == len(f_max) == len(f_start) \
        == len(cycle_lengths)
    wu = jnp.asarray(warm_up_steps, jnp.float32)
    fmin, fmax = jnp.asarray(f_min), jnp.asarray(f_max)
    fstart = jnp.asarray(f_start)
    cl = jnp.asarray(cycle_lengths, jnp.float32)

    def schedule(n):
        c, n_c = _cycle_state(jnp.asarray(n), cycle_lengths)
        n_c = n_c.astype(jnp.float32)
        warm = (fmax[c] - fstart[c]) / wu[c] * n_c + fstart[c]
        lin = fmin[c] + (fmax[c] - fmin[c]) * (cl[c] - n_c) / cl[c]
        return jnp.where(n_c < wu[c], warm, lin)

    return schedule
