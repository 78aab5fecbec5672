"""DDIM scheduler (diffusers-equivalent), array-based for `lax.scan`.

Re-derivation of the DDIM math the reference drives through diffusers
(reference scripts/neuroclips_video.py + configs/NeuroClips/control.yaml:
beta scaled-linear 0.00085->0.012, steps_offset 1, clip_sample false;
pipeline loop reference animatediff/pipelines/pipeline_neuroclips.py:
410-489). `set_timesteps(25)` yields [961, 921, ..., 1]; the partial-noise
init `add_noise(blurry_latents, noise, timesteps[0])` seeds the trajectory
with the blurry-video structure (reference :408-423).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neurons_tpu.diffusion.schedule import linear_betas


class DDIMScheduler(NamedTuple):
    alphas_cumprod: jax.Array       # [T_train]
    timesteps: jax.Array            # [num_steps] descending
    final_alpha_cumprod: jax.Array  # diffusers set_alpha_to_one=True -> 1.0
    num_train_timesteps: int

    @staticmethod
    def create(num_inference_steps: int, num_train_timesteps: int = 1000,
               beta_start: float = 0.00085, beta_end: float = 0.012,
               steps_offset: int = 1, set_alpha_to_one: bool = True
               ) -> "DDIMScheduler":
        betas = linear_betas(num_train_timesteps, beta_start, beta_end)
        ac = np.cumprod(1.0 - betas)
        step_ratio = num_train_timesteps // num_inference_steps
        ts = (np.arange(num_inference_steps) * step_ratio).round()[::-1]
        ts = ts.astype(np.int64) + steps_offset
        return DDIMScheduler(
            alphas_cumprod=jnp.asarray(ac, jnp.float32),
            timesteps=jnp.asarray(ts.copy()),
            final_alpha_cumprod=jnp.asarray(
                1.0 if set_alpha_to_one else ac[0], jnp.float32),
            num_train_timesteps=num_train_timesteps,
        )

    def add_noise(self, sample: jax.Array, noise: jax.Array,
                  t: jax.Array) -> jax.Array:
        ac = self.alphas_cumprod[t]
        shape = ac.shape + (1,) * (sample.ndim - ac.ndim)
        ac = ac.reshape(shape)
        return jnp.sqrt(ac) * sample + jnp.sqrt(1 - ac) * noise

    def step(self, eps_pred: jax.Array, t: jax.Array, sample: jax.Array
             ) -> jax.Array:
        """Deterministic DDIM step (eta=0, eps-prediction, no clipping):
        x0 = (x - sqrt(1-abar_t) eps) / sqrt(abar_t)
        x_{t-1} = sqrt(abar_prev) x0 + sqrt(1-abar_prev) eps
        """
        step_ratio = self.num_train_timesteps // self.timesteps.shape[0]
        prev_t = t - step_ratio
        abar_t = self.alphas_cumprod[t]
        abar_prev = jnp.where(prev_t >= 0, self.alphas_cumprod[
            jnp.maximum(prev_t, 0)], self.final_alpha_cumprod)
        x0 = (sample - jnp.sqrt(1 - abar_t) * eps_pred) / jnp.sqrt(abar_t)
        return jnp.sqrt(abar_prev) * x0 + jnp.sqrt(1 - abar_prev) * eps_pred


def ddim_inversion(scheduler: DDIMScheduler, eps_fn, latents: jax.Array,
                   num_steps: int) -> jax.Array:
    """DDIM inversion: run the deterministic trajectory BACKWARD (clean ->
    noised), reference animatediff/utils/util.py:192-246 `ddim_inversion`.
    eps_fn(x, t[B]) -> eps. Returns the inverted latent at the last step."""
    ts = scheduler.timesteps[::-1]  # ascending

    def step(x, i):
        t = ts[i]
        step_ratio = scheduler.num_train_timesteps // ts.shape[0]
        prev_t = t - step_ratio
        abar_t = scheduler.alphas_cumprod[t]
        abar_prev = jnp.where(
            prev_t >= 0,
            scheduler.alphas_cumprod[jnp.maximum(prev_t, 0)],
            scheduler.final_alpha_cumprod)
        eps = eps_fn(x, jnp.full((x.shape[0],), t))
        # invert: x was at "prev"; lift to t
        x0 = (x - jnp.sqrt(1 - abar_prev) * eps) / jnp.sqrt(abar_prev)
        x_t = jnp.sqrt(abar_t) * x0 + jnp.sqrt(1 - abar_t) * eps
        return x_t, None

    out, _ = jax.lax.scan(step, latents, jnp.arange(num_steps))
    return out
