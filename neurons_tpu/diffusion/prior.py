"""Diffusion-prior training loss and DDPM sampling loop.

Functional JAX re-design of the reference's BrainDiffusionPrior
(reference BrainModel_neurons.py:316-481, itself a subclass of
dalle2-pytorch's DiffusionPrior): x0-prediction DDPM over the 256x1664 CLIP
image-token grid with a cosine schedule, cond-drop CFG, and the 100-step
ancestral sampling loop — here a single `lax.scan` under jit rather than a
Python loop of CUDA launches (reference :376-383 loops in Python).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from neurons_tpu.diffusion import schedule as sched_lib
from neurons_tpu.diffusion.schedule import DDPMSchedule

# net_apply(params, image_embed, times, brain_embed, *, brain_cond_drop_prob,
#           image_cond_drop_prob, rng) -> pred_x0
NetApply = Callable[..., jax.Array]


class PriorDiffusion(NamedTuple):
    """Bundled schedule + hyperparams (pytree-safe: schedule arrays only)."""

    schedule: DDPMSchedule
    cond_drop_prob: float = 0.2

    @staticmethod
    def create(timesteps: int = 100, cond_drop_prob: float = 0.2
               ) -> "PriorDiffusion":
        return PriorDiffusion(
            schedule=sched_lib.make_ddpm_schedule(
                sched_lib.cosine_betas(timesteps)),
            cond_drop_prob=cond_drop_prob,
        )


def p_losses(diff: PriorDiffusion, net_apply: NetApply, params,
             key: jax.Array, image_embed: jax.Array, brain_embed: jax.Array
             ) -> Tuple[jax.Array, jax.Array]:
    """Training loss (reference :390-423): sample t ~ U[0,T), noise the CLIP
    target, predict x0 with cond-drop, MSE against the clean target.
    Returns (loss, pred) — the prediction feeds the decoupler heads
    downstream (reference train_neurons.py:430-434)."""
    s = diff.schedule
    b = image_embed.shape[0]
    k_t, k_noise, k_drop = jax.random.split(key, 3)
    times = jax.random.randint(k_t, (b,), 0, s.num_timesteps)
    noise = jax.random.normal(k_noise, image_embed.shape, image_embed.dtype)
    noisy = sched_lib.q_sample(s, image_embed, times, noise)
    pred = net_apply(params, noisy, times, brain_embed,
                     brain_cond_drop_prob=diff.cond_drop_prob,
                     image_cond_drop_prob=diff.cond_drop_prob,
                     rng=k_drop)
    loss = jnp.mean(jnp.square(pred - image_embed))
    return loss, pred


def p_sample_loop(diff: PriorDiffusion, net_apply: NetApply, params,
                  key: jax.Array, shape: Tuple[int, ...],
                  brain_embed: jax.Array, cond_scale: float = 1.0
                  ) -> jax.Array:
    """Ancestral DDPM sampling (reference :348-388) as one `lax.scan`.

    Per step: pred_x0 via CFG-combined net, posterior q(x_{t-1}|x_t, x0)
    mean/log-variance, then x_{t-1} = mean + [t>0] * exp(0.5 logvar) * eps.
    """
    s = diff.schedule
    T = s.num_timesteps
    k_init, k_loop = jax.random.split(key)
    x_init = jax.random.normal(k_init, shape)

    def net_cfg(x, times):
        pred = net_apply(params, x, times, brain_embed)
        if cond_scale == 1.0:
            return pred
        null = net_apply(params, x, times, brain_embed,
                         brain_cond_drop_prob=1.0, image_cond_drop_prob=1.0)
        return null + (pred - null) * cond_scale

    def step(x, t):
        times = jnp.full((shape[0],), t, jnp.int32)
        x_start = net_cfg(x, times)
        mean, _, log_var = sched_lib.q_posterior(s, x_start, x, times)
        noise = jax.random.normal(jax.random.fold_in(k_loop, t), shape)
        nonzero = (t > 0).astype(x.dtype)
        x_prev = mean + nonzero * jnp.exp(0.5 * log_var) * noise
        return x_prev, None

    ts = jnp.arange(T - 1, -1, -1)
    x_final, _ = jax.lax.scan(step, x_init, ts)
    return x_final
