"""Diffusion noise schedules, fully array-based for `lax.scan` sampling loops.

Re-derives the schedules the reference relies on through libraries:
  * cosine DDPM schedule — dalle2-pytorch NoiseScheduler used by
    BrainDiffusionPrior (reference BrainModel_neurons.py:316-423; the
    library itself is an external dep, not vendored).
  * linear ("legacy DDPM") schedule for SD — sgm LegacyDDPMDiscretization
    (reference generative_models/sgm/modules/diffusionmodules/
    discretizer.py:42-69), beta linear-in-sqrt 0.00085 -> 0.012, 1000 steps,
    sigma = sqrt((1 - abar) / abar).

All quantities are precomputed [T] arrays bundled in a NamedTuple pytree, so
a sampler is `lax.scan` over gathered per-step scalars — no Python loops in
the compiled graph.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DDPMSchedule(NamedTuple):
    """Precomputed DDPM quantities, each [T]."""

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def cosine_betas(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Nichol & Dhariwal cosine schedule (dalle2 NoiseScheduler default)."""
    steps = timesteps + 1
    x = np.linspace(0, timesteps, steps, dtype=np.float64)
    ac = np.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return np.clip(betas, 0, 0.999)


def linear_betas(timesteps: int = 1000, beta_start: float = 0.00085,
                 beta_end: float = 0.012) -> np.ndarray:
    """SD "scaled linear": linear in sqrt(beta)
    (reference discretizer.py:44-50)."""
    return np.linspace(beta_start ** 0.5, beta_end ** 0.5, timesteps,
                       dtype=np.float64) ** 2


def make_ddpm_schedule(betas: np.ndarray, dtype=jnp.float32) -> DDPMSchedule:
    betas = np.asarray(betas, np.float64)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.append(1.0, ac[:-1])
    post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
    return DDPMSchedule(
        betas=jnp.asarray(betas, dtype),
        alphas_cumprod=jnp.asarray(ac, dtype),
        alphas_cumprod_prev=jnp.asarray(ac_prev, dtype),
        sqrt_alphas_cumprod=jnp.asarray(np.sqrt(ac), dtype),
        sqrt_one_minus_alphas_cumprod=jnp.asarray(np.sqrt(1 - ac), dtype),
        posterior_variance=jnp.asarray(post_var, dtype),
        posterior_log_variance_clipped=jnp.asarray(
            np.log(np.clip(post_var, 1e-20, None)), dtype),
        posterior_mean_coef1=jnp.asarray(
            betas * np.sqrt(ac_prev) / (1 - ac), dtype),
        posterior_mean_coef2=jnp.asarray(
            (1 - ac_prev) * np.sqrt(alphas) / (1 - ac), dtype),
        sqrt_recip_alphas_cumprod=jnp.asarray(np.sqrt(1 / ac), dtype),
        sqrt_recipm1_alphas_cumprod=jnp.asarray(np.sqrt(1 / ac - 1), dtype),
    )


def _extract(arr: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather per-timestep scalars and broadcast to rank `ndim`."""
    out = arr[t]
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


def q_sample(sched: DDPMSchedule, x_start: jax.Array, t: jax.Array,
             noise: jax.Array) -> jax.Array:
    """Forward diffusion q(x_t | x_0)."""
    return (_extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start +
            _extract(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise)


def q_posterior(sched: DDPMSchedule, x_start: jax.Array, x_t: jax.Array,
                t: jax.Array):
    """Posterior q(x_{t-1} | x_t, x_0): (mean, variance, log_variance)."""
    mean = (_extract(sched.posterior_mean_coef1, t, x_t.ndim) * x_start +
            _extract(sched.posterior_mean_coef2, t, x_t.ndim) * x_t)
    var = _extract(sched.posterior_variance, t, x_t.ndim)
    log_var = _extract(sched.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, var, log_var


def predict_start_from_noise(sched: DDPMSchedule, x_t: jax.Array,
                             t: jax.Array, noise: jax.Array) -> jax.Array:
    return (_extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t -
            _extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise)


def spaced_timesteps(num_substeps: int, max_step: int) -> np.ndarray:
    """Roughly equally spaced sub-timesteps, ascending
    (reference discretizer.py:11-14)."""
    return np.linspace(max_step - 1, 0, num_substeps,
                       endpoint=False).astype(int)[::-1]


def sd_sigmas(num_steps: int, timesteps: int = 1000,
              beta_start: float = 0.00085, beta_end: float = 0.012,
              append_zero: bool = True) -> jax.Array:
    """Sigma ladder of sgm's LegacyDDPMDiscretization
    (reference discretizer.py:42-69): sigma_i = sqrt((1 - abar_i) / abar_i)
    at `num_steps` roughly-equally-spaced indices of the 1000-step scaled
    linear schedule, returned descending with a trailing 0 (the sampler
    convention, reference sampling.py:41-57).
    """
    betas = linear_betas(timesteps, beta_start, beta_end)
    ac = np.cumprod(1.0 - betas)
    if num_steps < timesteps:
        ac = ac[spaced_timesteps(num_steps, timesteps)]
    elif num_steps != timesteps:
        raise ValueError(f"num_steps {num_steps} > table size {timesteps}")
    sigmas = np.sqrt((1 - ac) / ac)[::-1]  # descending
    if append_zero:
        sigmas = np.concatenate([sigmas, [0.0]])
    return jnp.asarray(sigmas.copy(), jnp.float32)


def edm_sigmas(num_steps: int, sigma_min: float = 0.002,
               sigma_max: float = 80.0, rho: float = 7.0,
               append_zero: bool = True) -> jax.Array:
    """EDMDiscretization (reference discretizer.py:28-39, Karras et al.):
    sigma_i = (max^(1/rho) + i/(n-1) * (min^(1/rho) - max^(1/rho)))^rho,
    descending with a trailing 0."""
    ramp = np.linspace(0, 1, num_steps)
    min_r, max_r = sigma_min ** (1 / rho), sigma_max ** (1 / rho)
    sigmas = (max_r + ramp * (min_r - max_r)) ** rho
    if append_zero:
        sigmas = np.concatenate([sigmas, [0.0]])
    return jnp.asarray(sigmas, jnp.float32)
