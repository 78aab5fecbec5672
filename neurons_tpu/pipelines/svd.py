"""SVD image-to-video sampling — the full glue over the SVD stack.

Re-design of the reference's SVD inference wiring (reference
generative_models/configs/inference/svd.yaml: `Denoiser` with
`VScalingWithEDMcNoise`, `VideoUNet`, the four-embedder conditioner —
CLIP image crossattn, fps_id/motion_bucket_id/cond_aug
ConcatTimestepEmbedderND vector, VAE-encoded cond-frame concat — and the
`LinearPredictionGuider` video CFG; sgm/modules/diffusionmodules/
denoiser_scaling.py:47-59 VScalingWithEDMcNoise). The reference ships the
config + modules but no video script in this repo; this pipeline makes
the stack runnable end-to-end.

TPU notes: the whole 25-step EulerEDM loop is one `lax.scan` over the
folded [(B·T), 4, h, w] latents; the per-frame linear CFG ramp is a
broadcasted multiply; the temporal VAE decode runs chunked per clip to
bound HBM like stage 5.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from neurons_tpu.diffusion.denoiser import ContinuousDenoiser
from neurons_tpu.diffusion.samplers import (make_linear_prediction_denoiser,
                                            sample_euler)
from neurons_tpu.diffusion.schedule import edm_sigmas
from neurons_tpu.models.conditioner import concat_timestep_embedder


def v_scaling_edm_cnoise(sigma: jax.Array):
    """VScalingWithEDMcNoise (reference denoiser_scaling.py:47-59):
    v-prediction scalings with the EDM noise conditioning
    c_noise = 0.25 * ln(sigma)."""
    c_skip = 1.0 / (sigma ** 2 + 1.0)
    c_out = -sigma / jnp.sqrt(sigma ** 2 + 1.0)
    c_in = 1.0 / jnp.sqrt(sigma ** 2 + 1.0)
    c_noise = 0.25 * jnp.log(jnp.maximum(sigma, 1e-20))
    return c_skip, c_out, c_in, c_noise


def svd_vector_conditioning(batch: int, fps_id: float,
                            motion_bucket_id: float,
                            cond_aug: float) -> jax.Array:
    """The SVD `vector` conditioning: three ConcatTimestepEmbedderND
    scalars at outdim 256 (svd.yaml conditioner: fps_id,
    motion_bucket_id, cond_aug) -> [B, 768]."""
    vals = jnp.tile(jnp.asarray([[fps_id, motion_bucket_id, cond_aug]],
                                jnp.float32), (batch, 1))
    return concat_timestep_embedder(vals, outdim=256)


class SVDResult(NamedTuple):
    video: jax.Array  # [B, T, 3, H, W] in [-1, 1]
    latents: jax.Array  # [(B T), 4, h, w]


def svd_img2vid(unet_apply: Callable, unet_params,
                decode_fn: Callable, key: jax.Array,
                cond_latent: jax.Array, clip_emb: jax.Array,
                num_frames: int = 14, num_steps: int = 25,
                fps_id: float = 6.0, motion_bucket_id: float = 127.0,
                cond_aug: float = 0.02, min_scale: float = 1.0,
                max_scale: float = 2.5, sigma_min: float = 0.002,
                sigma_max: float = 700.0, rho: float = 7.0,
                decode_chunk: int = 0) -> SVDResult:
    """Image -> video clip.

    unet_apply(params, x, t_cond, context, y, num_frames) -> prediction
      on [(B·T), 8, h, w] (4 noisy ++ 4 cond-frame concat channels);
    decode_fn(z, num_frames) -> frames [(B·T), 3, H, W] (the temporal
      VideoDecoder; pass the plain VAE decode for image-decoder SVD);
    cond_latent: [B, 4, h, w] VAE-encoded conditioning frame;
    clip_emb: [B, 1024] CLIP-H image embedding.

    Conditioning layout follows svd.yaml: the cond frame is noised by
    cond_aug and concatenated per frame; uncond zeroes both the CLIP
    tokens and the concat frames (force_uc_zero_embeddings)."""
    b, c4, h, w = cond_latent.shape
    bt = b * num_frames
    k_aug, k_noise = jax.random.split(key)

    # cond_frames embedder: latent + cond_aug * noise, tiled per frame
    aug = cond_latent + cond_aug * jax.random.normal(
        k_aug, cond_latent.shape, cond_latent.dtype)
    concat = jnp.repeat(aug, num_frames, axis=0)  # [(B·T), 4, h, w]
    crossattn = jnp.repeat(clip_emb[:, None, :], num_frames, axis=0)
    vector = jnp.repeat(svd_vector_conditioning(
        b, fps_id, motion_bucket_id, cond_aug), num_frames, axis=0)

    cond = {"crossattn": crossattn, "vector": vector, "concat": concat}
    uc = {"crossattn": jnp.zeros_like(crossattn), "vector": vector,
          "concat": jnp.zeros_like(concat)}

    denoiser = ContinuousDenoiser(scaling=v_scaling_edm_cnoise)

    def network(x, t_cond, crossattn, vector, concat):
        x_in = jnp.concatenate([x, concat.astype(x.dtype)], axis=1)
        return unet_apply(unet_params, x_in, t_cond, crossattn, vector,
                          num_frames)

    denoise = make_linear_prediction_denoiser(
        lambda net, x, s, **c: denoiser(net, x, s, **c), network,
        cond, uc, num_frames=num_frames, min_scale=min_scale,
        max_scale=max_scale)

    sigmas = edm_sigmas(num_steps, sigma_min, sigma_max, rho)
    noise = jax.random.normal(k_noise, (bt, 4, h, w))
    # EDM start: x = noise * sigma_0 (no DDPM rescale for EDM models)
    z = sample_euler(denoise, noise * sigmas[0], sigmas, prepare=False)

    if decode_chunk and decode_chunk < num_frames:
        zt = z.reshape(b, num_frames, 4, h, w)
        chunks = []
        for i in range(0, num_frames, decode_chunk):
            n = min(decode_chunk, num_frames - i)
            f = decode_fn(zt[:, i:i + n].reshape(-1, 4, h, w), n)
            chunks.append(f.reshape(b, n, *f.shape[1:]))
        frames = jnp.concatenate(chunks, axis=1)
    else:
        f = decode_fn(z, num_frames)
        frames = f.reshape(b, num_frames, *f.shape[1:])
    return SVDResult(video=jnp.clip(frames, -1.0, 1.0), latents=z)
