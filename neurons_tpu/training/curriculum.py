"""Progressive task-weight curriculum (reference train_neurons.py:26-43).

Each of the 4 decoupler tasks (key-object seg, multi-label cls, caption,
blurry recon) gets a sinusoidal loss-weight ramp 1 -> 10 -> 1 over a window
of `period = 2 * num_epochs // 5` epochs, with task i's window starting at
`i * period / 2`. Implemented as pure jnp so it can live inside the jitted
train step (epoch/iter passed as traced scalars).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log_weight(epoch, batch, batches_per_epoch, start_epoch, period):
    total_batches = period * batches_per_epoch
    current_batch = (epoch - start_epoch) * batches_per_epoch + batch
    x = current_batch / total_batches * jnp.pi
    return 1.0 + 9.0 * jnp.abs(jnp.sin(x))


def get_loss_weights(total_epochs: int, epoch, batch, batches_per_epoch: int):
    """Returns [4] weights for the decoupler tasks. `epoch`/`batch` may be
    traced scalars; `total_epochs`/`batches_per_epoch` are static."""
    period = total_epochs // 5 * 2
    if period == 0:
        # fewer than 5 epochs (smoke runs): no curriculum window fits,
        # all task weights stay 1 (the reference would divide by zero here)
        return jnp.ones((4,))
    weights = []
    for i in range(4):
        start_epoch = i * period // 2
        in_window = (start_epoch <= epoch) & (epoch < start_epoch + period)
        w = jnp.where(
            in_window,
            log_weight(epoch, batch, batches_per_epoch, start_epoch, period),
            1.0,
        )
        weights.append(w)
    return jnp.stack(weights)
