"""EDM-preconditioned denoisers (sgm-equivalent).

Re-derivation of reference generative_models/sgm/modules/diffusionmodules/
denoiser.py and denoiser_scaling.py: the network is wrapped as
  D(x, sigma) = net(x * c_in, c_noise, cond) * c_out + x * c_skip
with scalings per prediction convention. `DiscreteDenoiser` snaps sigma to
the nearest entry of the 1000-step DDPM table and feeds the *index* as the
timestep conditioning (quantize_c_noise, reference denoiser.py:42-75) —
that is how an eps-prediction SD UNet trained on integer timesteps is
driven from a continuous-sigma sampler.

Everything is arrays + closures (no flax state), so a denoiser call sits
directly inside the `lax.scan` sampler body.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from neurons_tpu.diffusion.schedule import sd_sigmas

# network(x, t_cond, cond) -> prediction; cond routed by the caller.
Network = Callable[..., jax.Array]


def eps_scaling(sigma: jax.Array) -> Tuple[jax.Array, ...]:
    """EpsScaling (reference denoiser_scaling.py): eps-prediction SD."""
    c_skip = jnp.ones_like(sigma)
    c_out = -sigma
    c_in = 1.0 / jnp.sqrt(sigma ** 2 + 1.0)
    c_noise = sigma
    return c_skip, c_out, c_in, c_noise


def v_scaling(sigma: jax.Array) -> Tuple[jax.Array, ...]:
    """VScaling: v-prediction models."""
    c_skip = 1.0 / (sigma ** 2 + 1.0)
    c_out = -sigma / jnp.sqrt(sigma ** 2 + 1.0)
    c_in = 1.0 / jnp.sqrt(sigma ** 2 + 1.0)
    c_noise = sigma
    return c_skip, c_out, c_in, c_noise


def edm_scaling(sigma: jax.Array, sigma_data: float = 0.5
                ) -> Tuple[jax.Array, ...]:
    s2 = sigma ** 2 + sigma_data ** 2
    return (sigma_data ** 2 / s2, sigma * sigma_data / jnp.sqrt(s2),
            1.0 / jnp.sqrt(s2), 0.25 * jnp.log(sigma))


class DiscreteDenoiser(NamedTuple):
    """sigma table ascending by timestep (reference flip=True storage is
    equivalent: sigmas[idx] = sigma of timestep idx)."""

    sigmas: jax.Array  # [num_idx], ascending
    scaling: Callable = eps_scaling

    @staticmethod
    def create_sd(num_idx: int = 1000, scaling: Callable = eps_scaling
                  ) -> "DiscreteDenoiser":
        table = sd_sigmas(num_idx, append_zero=False)[::-1]  # ascending
        return DiscreteDenoiser(sigmas=table, scaling=scaling)

    def sigma_to_idx(self, sigma: jax.Array) -> jax.Array:
        dists = jnp.abs(sigma[..., None] - self.sigmas)
        return jnp.argmin(dists, axis=-1)

    def __call__(self, network: Network, x: jax.Array, sigma: jax.Array,
                 **cond) -> jax.Array:
        """x: [B, ...], sigma: [B]."""
        idx = self.sigma_to_idx(sigma)
        sigma_q = self.sigmas[idx]
        bshape = sigma_q.shape + (1,) * (x.ndim - sigma_q.ndim)
        c_skip, c_out, c_in, _ = self.scaling(sigma_q.reshape(bshape))
        c_noise = idx.astype(jnp.float32)
        return network(x * c_in, c_noise, **cond) * c_out + x * c_skip


class ContinuousDenoiser(NamedTuple):
    """Plain Denoiser (no quantization) for EDM-style models."""

    scaling: Callable = eps_scaling

    def __call__(self, network: Network, x: jax.Array, sigma: jax.Array,
                 **cond) -> jax.Array:
        bshape = sigma.shape + (1,) * (x.ndim - sigma.ndim)
        c_skip, c_out, c_in, c_noise = self.scaling(sigma.reshape(bshape))
        return (network(x * c_in, c_noise.reshape(sigma.shape), **cond)
                * c_out + x * c_skip)
