"""DiffusionEngine — the sgm public-surface equivalent.

The reference instantiates `sgm.models.diffusion.DiffusionEngine` from
unclip6.yaml and uses four things at inference: `conditioner`, `denoiser`,
`sampler`, `decode_first_stage` (reference sgm/models/diffusion.py:19-341,
recon_keyframe_neurons.py:243-323, utils.py:302-350). This façade bundles
our flax modules behind the same four capabilities so a reference user
finds one object to hold, including `from_checkpoint` which assembles the
whole engine from the original unclip6 Lightning file (EMA-swapped).

The EulerEDM sampling loop itself stays a jitted `lax.scan` under
`sample()`; the engine is a thin host-side bundle (params are host
numpy / device arrays, callers place them as needed).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from neurons_tpu.config import SamplerConfig, UNet2DConfig, VAEConfig
from neurons_tpu.diffusion.denoiser import DiscreteDenoiser
from neurons_tpu.diffusion.samplers import make_cfg_denoiser, sample_euler
from neurons_tpu.diffusion.schedule import sd_sigmas
from neurons_tpu.models.conditioner import unclip_vector_suffix
from neurons_tpu.models.unet2d import UNetModel
from neurons_tpu.models.vae import AutoencoderKL


@dataclass
class DiffusionEngine:
    unet_cfg: UNet2DConfig = field(default_factory=UNet2DConfig)
    vae_cfg: VAEConfig = field(default_factory=VAEConfig)
    sampler_cfg: SamplerConfig = field(default_factory=SamplerConfig)
    unet_params: Any = None
    vae_params: Any = None

    def __post_init__(self):
        self.unet = UNetModel(self.unet_cfg)
        self.vae = AutoencoderKL(self.vae_cfg)
        self.denoiser = DiscreteDenoiser.create_sd()

    @classmethod
    def from_checkpoint(cls, ckpt_path: str,
                        unet_cfg: Optional[UNet2DConfig] = None,
                        vae_cfg: Optional[VAEConfig] = None,
                        sampler_cfg: Optional[SamplerConfig] = None,
                        use_ema: bool = True) -> "DiffusionEngine":
        """Assemble from the unclip6 Lightning ckpt (reference
        recon_keyframe_neurons.py:243-323 + ema_scope)."""
        from neurons_tpu.interop.load_weights import load_unclip_engine

        unet_cfg = unet_cfg or UNet2DConfig()
        vae_cfg = vae_cfg or VAEConfig()
        up, vp, report = load_unclip_engine(ckpt_path, unet_cfg, vae_cfg,
                                            use_ema=use_ema)
        eng = cls(unet_cfg=unet_cfg, vae_cfg=vae_cfg,
                  sampler_cfg=sampler_cfg or SamplerConfig(),
                  unet_params={"params": up}, vae_params={"params": vp})
        eng.import_report = report
        return eng

    def init_random(self, key: jax.Array, latent_hw: int = 96) -> None:
        """Random params (benching / tests)."""
        k1, k2 = jax.random.split(key)
        c = self.unet_cfg
        self.unet_params = {"params": self.unet.init(
            k1, jnp.zeros((1, c.in_channels, latent_hw, latent_hw)),
            jnp.zeros((1,)),
            jnp.zeros((1, 2, c.context_dim)),
            jnp.zeros((1, c.adm_in_channels)))["params"]}
        hw = latent_hw * 2 ** (len(self.vae_cfg.block_out_channels) - 1)
        self.vae_params = self.vae.init(
            k2, jnp.zeros((1, self.vae_cfg.in_channels, hw, hw)))

    # --- the reference's four inference capabilities -----------------------

    def conditioner(self, batch_size: int = 1,
                    orig_size=(768, 768), crop=(0, 0)) -> jax.Array:
        """The constant `vector` conditioning (GeneralConditioner with the
        two ConcatTimestepEmbedderND embedders on a placeholder batch,
        reference recon_keyframe_neurons.py:268-273). outdim derives from
        adm_in_channels = 2 embedders x 2 scalars x outdim."""
        outdim = self.unet_cfg.adm_in_channels // 4
        return unclip_vector_suffix(batch_size, orig_size, crop,
                                    outdim=outdim)

    def sample(self, key: jax.Array, crossattn: jax.Array,
               uc_crossattn: Optional[jax.Array] = None,
               shape=None, num_steps: Optional[int] = None,
               cfg_scale: Optional[float] = None) -> jax.Array:
        """EulerEDM sampling with VanillaCFG (reference sampling.py:
        102-135 + guiders.py:24-42). crossattn: [B, 256, 1664] CLIP
        tokens; uncond defaults to RANDOM tokens exactly like the
        reference's unclip_recon (utils.py:312-318) and the production
        path (pipelines/keyframe.py). Returns first-stage latents
        [B, 4, h, w]."""
        scfg = self.sampler_cfg
        num_steps = num_steps or scfg.unclip_steps
        cfg_scale = cfg_scale if cfg_scale is not None \
            else scfg.unclip_cfg_scale
        b = crossattn.shape[0]
        if shape is None:
            shape = (b, self.unet_cfg.in_channels, 96, 96)
        key, k_uc = jax.random.split(key)
        if uc_crossattn is None:
            uc_crossattn = jax.random.normal(k_uc, crossattn.shape,
                                             crossattn.dtype)
        vector = self.conditioner(b)
        sigmas = sd_sigmas(num_steps)

        def network(x, t_cond, crossattn, vector):
            return self.unet.apply(self.unet_params, x, t_cond, crossattn,
                                   vector)

        denoise = make_cfg_denoiser(
            lambda net, x, s, **c: self.denoiser(net, x, s, **c), network,
            cond={"crossattn": crossattn, "vector": vector},
            uc={"crossattn": uc_crossattn, "vector": vector},
            scale=cfg_scale)
        noise = jax.random.normal(key, shape)
        return sample_euler(denoise, noise, sigmas, prepare=True)

    def decode_first_stage(self, z: jax.Array) -> jax.Array:
        """reference diffusion.py:127-135: z / scale_factor -> VAE decode,
        in [-1, 1]."""
        return self.vae.apply(self.vae_params,
                              z / self.unet_cfg.scale_factor,
                              method=AutoencoderKL.decode)

    def encode_first_stage(self, x: jax.Array) -> jax.Array:
        post = self.vae.apply(self.vae_params, x,
                              method=AutoencoderKL.encode)
        return post.mode() * self.unet_cfg.scale_factor
