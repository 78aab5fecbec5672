"""sgm inference API — model presets, sampling params, txt2img/img2img.

Re-design of the reference's `sgm/inference/api.py` (SamplingParams /
SamplingSpec / model_specs / SamplingPipeline, reference
generative_models/sgm/inference/api.py:20-385) and `sgm/inference/
helpers.py` (Img2ImgDiscretizationWrapper:77-99, do_sample:101-168,
do_img2img:248-305, WatermarkEmbedder:16-58). The reference wires these
through OmegaConf yamls + torch samplers; here the presets are typed
UNet2DConfig instances, the sampler enum maps to our `lax.scan` sampler
functions, and the img2img strength prunes the sigma ladder exactly like
the reference wrapper.

Watermarking: the reference embeds a fixed 48-bit message with
imwatermark's dwtDct. The TPU build ships a pure-numpy blind block-DCT
watermark (`embed_watermark` / `decode_watermark`) carrying the same
48-bit message — same contract (invisible, decodable tag on every saved
sample), no cv2/pywt dependency.
"""

from __future__ import annotations

import dataclasses
import enum
import math
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from neurons_tpu.config import UNet2DConfig, VideoUNetConfig
from neurons_tpu.diffusion import samplers as S
from neurons_tpu.diffusion.schedule import edm_sigmas, sd_sigmas


class ModelArchitecture(str, enum.Enum):
    """reference api.py:20-26 (+ the NEURONS unclip engine and SVD,
    which the reference ships configs for)."""

    SD_UNCLIP = "sd21-unclip"  # the NEURONS keyframe engine (unclip6.yaml)
    SD_2_1 = "stable-diffusion-v2-1"
    SD_2_1_768 = "stable-diffusion-v2-1-768"
    SDXL_BASE = "stable-diffusion-xl-v1-base"
    SDXL_REFINER = "stable-diffusion-xl-v1-refiner"
    SVD = "stable-video-diffusion"


class Sampler(str, enum.Enum):
    """reference api.py:29-35."""

    EULER_EDM = "EulerEDMSampler"
    HEUN_EDM = "HeunEDMSampler"
    EULER_ANCESTRAL = "EulerAncestralSampler"
    DPMPP2S_ANCESTRAL = "DPMPP2SAncestralSampler"
    DPMPP2M = "DPMPP2MSampler"
    LINEAR_MULTISTEP = "LinearMultistepSampler"


class Discretization(str, enum.Enum):
    """reference api.py:38-40."""

    LEGACY_DDPM = "LegacyDDPMDiscretization"
    EDM = "EDMDiscretization"


class Guider(str, enum.Enum):
    """reference api.py:43-45."""

    VANILLA = "VanillaCFG"
    IDENTITY = "IdentityGuider"


@dataclass
class SamplingParams:
    """reference api.py:52-77 (field-for-field)."""

    width: int = 1024
    height: int = 1024
    steps: int = 50
    sampler: Sampler = Sampler.DPMPP2M
    discretization: Discretization = Discretization.LEGACY_DDPM
    guider: Guider = Guider.VANILLA
    scale: float = 6.0
    aesthetic_score: float = 5.0
    negative_aesthetic_score: float = 5.0
    img2img_strength: float = 1.0
    orig_width: int = 1024
    orig_height: int = 1024
    crop_coords_top: int = 0
    crop_coords_left: int = 0
    sigma_min: float = 0.0292
    sigma_max: float = 14.6146
    rho: float = 3.0
    s_churn: float = 0.0
    s_tmin: float = 0.0
    s_tmax: float = 999.0
    s_noise: float = 1.0
    eta: float = 1.0
    order: int = 4


@dataclass
class SamplingSpec:
    """reference api.py:80-89, with the yaml swapped for a typed config."""

    width: int
    height: int
    channels: int
    factor: int
    is_legacy: bool
    config: object  # UNet2DConfig | VideoUNetConfig
    ckpt: str
    is_guided: bool


# UNet shapes transcribed from the reference's inference yamls
# (configs/inference/sd_2_1.yaml, sd_xl_base.yaml, sd_xl_refiner.yaml,
# svd.yaml network_config params) and unclip6.yaml:47-63.
_SD21_UNET = UNet2DConfig(
    model_channels=320, channel_mult=(1, 2, 4, 4), num_res_blocks=2,
    attention_resolutions=(4, 2, 1), transformer_depth=(1, 1, 1, 1),
    num_head_channels=64, context_dim=1024, adm_in_channels=0)
_SDXL_BASE_UNET = UNet2DConfig(
    model_channels=320, channel_mult=(1, 2, 4), num_res_blocks=2,
    attention_resolutions=(4, 2), transformer_depth=(1, 2, 10),
    num_head_channels=64, context_dim=2048, adm_in_channels=2816)
_SDXL_REFINER_UNET = UNet2DConfig(
    model_channels=384, channel_mult=(1, 2, 4, 4), num_res_blocks=2,
    attention_resolutions=(4, 2), transformer_depth=(4, 4, 4, 4),
    num_head_channels=64, context_dim=1280, adm_in_channels=2560)

model_specs: Dict[ModelArchitecture, SamplingSpec] = {
    ModelArchitecture.SD_UNCLIP: SamplingSpec(
        height=768, width=768, channels=4, factor=8, is_legacy=True,
        config=UNet2DConfig(), ckpt="unclip6_epoch0_step110000.ckpt",
        is_guided=True),
    ModelArchitecture.SD_2_1: SamplingSpec(
        height=512, width=512, channels=4, factor=8, is_legacy=True,
        config=_SD21_UNET, ckpt="v2-1_512-ema-pruned.safetensors",
        is_guided=True),
    ModelArchitecture.SD_2_1_768: SamplingSpec(
        height=768, width=768, channels=4, factor=8, is_legacy=True,
        config=_SD21_UNET, ckpt="v2-1_768-ema-pruned.safetensors",
        is_guided=True),
    ModelArchitecture.SDXL_BASE: SamplingSpec(
        height=1024, width=1024, channels=4, factor=8, is_legacy=False,
        config=_SDXL_BASE_UNET, ckpt="sd_xl_base_1.0.safetensors",
        is_guided=True),
    ModelArchitecture.SDXL_REFINER: SamplingSpec(
        height=1024, width=1024, channels=4, factor=8, is_legacy=True,
        config=_SDXL_REFINER_UNET, ckpt="sd_xl_refiner_1.0.safetensors",
        is_guided=True),
    ModelArchitecture.SVD: SamplingSpec(
        height=576, width=1024, channels=4, factor=8, is_legacy=False,
        config=VideoUNetConfig(), ckpt="svd.safetensors", is_guided=True),
}


def build_sigmas(params: SamplingParams) -> jax.Array:
    """Discretization enum -> sigma ladder, pruned by img2img strength
    (reference helpers.py:77-99 Img2ImgDiscretizationWrapper: flip, keep
    the first `strength * n`, flip back — i.e. keep the LOW end). The
    reference prunes the ZERO-APPENDED ladder (sgm discretizations
    append 0 by default), so the kept count includes the trailing zero:
    steps=10, strength=0.4 -> keep 4 of 11 entries = 3 denoise steps."""
    if params.discretization == Discretization.EDM:
        sigmas = edm_sigmas(params.steps, params.sigma_min,
                            params.sigma_max, params.rho,
                            append_zero=True)
    else:
        sigmas = sd_sigmas(params.steps, append_zero=True)
    if params.img2img_strength < 1.0:
        keep = max(int(params.img2img_strength * sigmas.shape[0]), 1)
        sigmas = sigmas[-keep:]
    return sigmas


def run_sampler(params: SamplingParams, denoise, x: jax.Array,
                sigmas: jax.Array, key: Optional[jax.Array] = None,
                prepare: bool = True) -> jax.Array:
    """Sampler enum -> the matching lax.scan sampler (reference
    api.py:231-277 get_sampler)."""
    s = params.sampler
    if s == Sampler.EULER_EDM:
        return S.sample_euler(denoise, x, sigmas, s_churn=params.s_churn,
                              s_noise=params.s_noise, key=key,
                              prepare=prepare)
    if s == Sampler.HEUN_EDM:
        return S.sample_heun(denoise, x, sigmas, prepare=prepare)
    if s == Sampler.EULER_ANCESTRAL:
        return S.sample_euler_ancestral(denoise, x, sigmas, key,
                                        eta=params.eta,
                                        s_noise=params.s_noise,
                                        prepare=prepare)
    if s == Sampler.DPMPP2S_ANCESTRAL:
        return S.sample_dpmpp2s_ancestral(denoise, x, sigmas, key,
                                          eta=params.eta,
                                          s_noise=params.s_noise,
                                          prepare=prepare)
    if s == Sampler.DPMPP2M:
        return S.sample_dpmpp2m(denoise, x, sigmas, prepare=prepare)
    if s == Sampler.LINEAR_MULTISTEP:
        return S.sample_lms(denoise, x, np.asarray(sigmas),
                            order=params.order, prepare=prepare)
    raise ValueError(s)


def _cfg_denoise(engine, params: SamplingParams, cond: Dict, uc: Dict):
    def network(x, t_cond, crossattn, vector=None):
        return engine.unet.apply(engine.unet_params, x, t_cond, crossattn,
                                 vector)

    if params.guider == Guider.IDENTITY or not uc:
        return S.make_identity_denoiser(
            lambda net, x, s, **c: engine.denoiser(net, x, s, **c),
            network, cond)
    return S.make_cfg_denoiser(
        lambda net, x, s, **c: engine.denoiser(net, x, s, **c),
        network, cond, uc, scale=params.scale)


def do_sample(engine, params: SamplingParams, key: jax.Array, cond: Dict,
              uc: Optional[Dict] = None, num_samples: int = 1,
              return_latents: bool = False):
    """txt2img over a DiffusionEngine (reference helpers.py:101-168):
    draw noise at the latent shape, CFG-sample, decode, map to [0, 1]."""
    factor = 2 ** (len(engine.vae_cfg.block_out_channels) - 1)
    h, w = params.height // factor, params.width // factor
    c = engine.unet_cfg.in_channels
    kn, ks = jax.random.split(key)
    x = jax.random.normal(kn, (num_samples, c, h, w))
    sigmas = build_sigmas(dataclasses.replace(params, img2img_strength=1.0))
    denoise = _cfg_denoise(engine, params, cond, uc or {})
    z = run_sampler(params, denoise, x, sigmas, key=ks)
    samples = jnp.clip((engine.decode_first_stage(z) + 1.0) / 2.0, 0.0, 1.0)
    return (samples, z) if return_latents else samples


def do_img2img(img, engine, params: SamplingParams, key: jax.Array,
               cond: Dict, uc: Optional[Dict] = None,
               offset_noise_level: float = 0.0, skip_encode: bool = False,
               return_latents: bool = False):
    """img2img (reference helpers.py:248-305): encode, noise at the
    strength-pruned sigma_0 with DDPM scaling 1/sqrt(1+sigma^2),
    resample, decode."""
    z = img if skip_encode else engine.encode_first_stage(img)
    kn, ko, ks = jax.random.split(key, 3)
    sigmas = build_sigmas(params)
    noise = jax.random.normal(kn, z.shape, z.dtype)
    if offset_noise_level > 0.0:
        noise = noise + offset_noise_level * jax.random.normal(
            ko, (z.shape[0],) + (1,) * (z.ndim - 1), z.dtype)
    # reference helpers.py:292-296 divides by sqrt(1+sigma0^2) ONLY
    # because the sampler's prepare step multiplies it back
    # (sampling.py:52); the loop must run on z + sigma0*noise, so here
    # we skip both the division and the prepare re-scale.
    noised = z + noise * sigmas[0]
    denoise = _cfg_denoise(engine, params, cond, uc or {})
    z_out = run_sampler(params, denoise, noised, sigmas, key=ks,
                        prepare=False)
    samples = jnp.clip((engine.decode_first_stage(z_out) + 1.0) / 2.0,
                       0.0, 1.0)
    return (samples, z_out) if return_latents else samples


# ---------------------------------------------------------------------------
# Watermark (reference helpers.py:16-58)
# ---------------------------------------------------------------------------

# the reference's fixed 48-bit message (helpers.py:53-56)
WATERMARK_MESSAGE = 0b101100111110110010010000011110111011000110011110
WATERMARK_BITS = [int(b) for b in bin(WATERMARK_MESSAGE)[2:]]
_STRENGTH = 4.0  # DCT-coefficient quantization step


def _dct_matrix(n: int = 8) -> np.ndarray:
    k = np.arange(n)
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1)
                                  * k[:, None] / (2 * n))
    m[0] = np.sqrt(1.0 / n)
    return m


def embed_watermark(images: np.ndarray) -> np.ndarray:
    """Embed the 48-bit tag into the blue channel's (2,1) block-DCT
    coefficient by quantization-index modulation. images: [..., B, C, H,
    W] float in [0, 1] (the reference contract, helpers.py:23-49).
    Needs >= 48 8x8 blocks (i.e. >= ~56x56 px) to carry the full
    message; smaller images embed a truncated, undecodable prefix."""
    imgs = np.asarray(images, np.float32)
    squeeze = imgs.ndim == 4
    if squeeze:
        imgs = imgs[None]
    n, b, c, hh, ww = imgs.shape
    out = imgs.reshape(n * b, c, hh, ww).copy()
    D = _dct_matrix()
    nbh, nbw = hh // 8, ww // 8
    bits = np.asarray(WATERMARK_BITS, np.float32)
    nbits = len(bits)
    for i in range(out.shape[0]):
        ch = out[i, -1] * 255.0  # blue channel
        blocks = ch[:nbh * 8, :nbw * 8].reshape(nbh, 8, nbw, 8) \
            .transpose(0, 2, 1, 3)
        coef = np.einsum("ij,bcjk,lk->bcil", D, blocks, D)
        idx = (np.arange(nbh * nbw) % nbits).reshape(nbh, nbw)
        tgt = bits[idx]  # bit per block
        # QIM: snap coefficient to the lattice of its bit
        q = np.round(coef[:, :, 2, 1] / _STRENGTH - 0.5 * tgt)
        coef[:, :, 2, 1] = (q + 0.5 * tgt) * _STRENGTH
        blocks = np.einsum("ji,bcjk,kl->bcil", D, coef, D)
        ch[:nbh * 8, :nbw * 8] = blocks.transpose(0, 2, 1, 3) \
            .reshape(nbh * 8, nbw * 8)
        out[i, -1] = ch / 255.0
    out = np.clip(out, 0.0, 1.0).reshape(n, b, c, hh, ww)
    return out[0] if squeeze else out


def decode_watermark(image: np.ndarray) -> list:
    """Recover the 48-bit tag (majority vote over blocks)."""
    img = np.asarray(image, np.float32)
    ch = img[-1] * 255.0
    hh, ww = ch.shape
    nbh, nbw = hh // 8, ww // 8
    D = _dct_matrix()
    blocks = ch[:nbh * 8, :nbw * 8].reshape(nbh, 8, nbw, 8) \
        .transpose(0, 2, 1, 3)
    coef = np.einsum("ij,bcjk,lk->bcil", D, blocks, D)
    v = coef[:, :, 2, 1] / _STRENGTH
    frac = v - np.floor(v)
    is_one = np.abs(frac - 0.5) < 0.25  # closer to the b=1 lattice
    idx = (np.arange(nbh * nbw) % len(WATERMARK_BITS)).reshape(nbh, nbw)
    votes_one = np.bincount(idx.ravel(), weights=is_one.ravel(),
                            minlength=len(WATERMARK_BITS))
    counts = np.bincount(idx.ravel(), minlength=len(WATERMARK_BITS))
    return (votes_one * 2 > counts).astype(int).tolist()
