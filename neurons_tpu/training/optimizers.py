"""Optimizer + LR-schedule factory (reference train_neurons.py:292-316).

AdamW over trainable params with the reference's three schedule choices:
  cycle  — OneCycle (max_lr, pct_start=2/num_epochs, final_div_factor=1000)
  linear — LinearLR ramp (torch default start_factor=1/3)
  cosine — CosineAnnealingWarmRestarts (T_0=2 epochs, T_mult=2)

Freezing is expressed as an optax.multi_transform mask over the param tree —
the GSPMD-friendly equivalent of the reference's requires_grad_ flags
(train_neurons.py:244-261).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import optax

from neurons_tpu.config import TrainConfig


def make_lr_schedule(cfg: TrainConfig, steps_per_epoch: int):
    total = int(cfg.num_epochs * steps_per_epoch)
    if cfg.lr_scheduler_type == "cycle":
        return optax.cosine_onecycle_schedule(
            transition_steps=total, peak_value=cfg.max_lr,
            pct_start=2 / cfg.num_epochs, div_factor=25.0,
            final_div_factor=1000.0)
    if cfg.lr_scheduler_type == "linear":
        return optax.linear_schedule(init_value=cfg.max_lr / 3,
                                     end_value=cfg.max_lr,
                                     transition_steps=total)
    if cfg.lr_scheduler_type == "cosine":
        # warm restarts with doubling periods: T_0=2 epochs, T_mult=2
        schedules, boundaries = [], []
        period = 2 * steps_per_epoch
        start = 0
        while start < total:
            schedules.append(optax.cosine_decay_schedule(
                init_value=cfg.max_lr, decay_steps=period))
            start += period
            boundaries.append(start)
            period *= 2
        return optax.join_schedules(schedules, boundaries[:-1])
    raise ValueError(cfg.lr_scheduler_type)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int,
                   frozen_fn: Optional[Callable] = None):
    """AdamW with optional freezing. `frozen_fn(path_tuple) -> bool` marks
    frozen subtrees (e.g. clipproj, reference train_neurons.py:257)."""
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    chain = []
    if cfg.grad_clip > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    chain.append(optax.adamw(schedule, weight_decay=cfg.weight_decay))
    tx = optax.chain(*chain)
    if frozen_fn is None:
        return tx, schedule

    def label_tree(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "frozen" if frozen_fn(
                tuple(getattr(p, "key", getattr(p, "idx", None))
                      for p in path)) else "train",
            params)

    tx = optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, label_tree)
    return tx, schedule


def freeze_by_prefix(prefixes: Sequence[str]) -> Callable:
    """Freeze any param whose path contains one of the given component
    names (e.g. ('clipproj',))."""

    def fn(path) -> bool:
        return any(p in path for p in prefixes)

    return fn
