"""Training-side diffusion loss + sigma sampling (sgm-equivalents).

Unused by the NEURONS stages (the generative backbones are frozen) but
part of the engine's surface (reference sgm/modules/diffusionmodules/
loss.py:12-105 StandardDiffusionLoss with offset noise;
sigma_sampling.py DiscreteSampling / EDMSampling) so the unclip engine
can be fine-tuned on TPU.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from neurons_tpu.diffusion.schedule import sd_sigmas


def discrete_sigma_sampler(num_idx: int = 1000):
    """DiscreteSampling: uniform index into the legacy-DDPM sigma table
    (reference sigma_sampling.py:17-31)."""
    table = sd_sigmas(num_idx, append_zero=False)[::-1]  # ascending

    def sample(key: jax.Array, n: int) -> jax.Array:
        idx = jax.random.randint(key, (n,), 0, num_idx)
        return table[idx]

    return sample


def edm_sigma_sampler(p_mean: float = -1.2, p_std: float = 1.2):
    """EDMSampling: lognormal sigma (reference sigma_sampling.py:5-14)."""

    def sample(key: jax.Array, n: int) -> jax.Array:
        return jnp.exp(p_mean + p_std * jax.random.normal(key, (n,)))

    return sample


def standard_diffusion_loss(denoise: Callable, x: jax.Array,
                            key: jax.Array, sigma_sampler,
                            loss_type: str = "l2",
                            offset_noise_level: float = 0.0,
                            w_fn: Optional[Callable] = None) -> jax.Array:
    """StandardDiffusionLoss (reference loss.py:59-105): noise at sampled
    sigma (+ broadcast offset noise), denoise, weighted pixel loss."""
    k_sig, k_n, k_off = jax.random.split(key, 3)
    sigmas = sigma_sampler(k_sig, x.shape[0])
    sig_b = sigmas.reshape((-1,) + (1,) * (x.ndim - 1))
    noise = jax.random.normal(k_n, x.shape, x.dtype)
    if offset_noise_level > 0.0:
        offset = jax.random.normal(k_off, (x.shape[0],) + (1,) * (x.ndim - 1),
                                   x.dtype)
        noise = noise + offset_noise_level * offset
    noised = x + noise * sig_b
    pred = denoise(noised, sigmas)
    w = w_fn(sigmas).reshape(sig_b.shape) if w_fn is not None else 1.0
    if loss_type == "l2":
        per = jnp.mean((w * (pred - x) ** 2).reshape(x.shape[0], -1), axis=1)
    elif loss_type == "l1":
        per = jnp.mean(jnp.abs(w * (pred - x)).reshape(x.shape[0], -1),
                       axis=1)
    else:
        raise ValueError(loss_type)
    return jnp.mean(per)
