"""DiffusionEngine façade: sample/decode/conditioner surfaces + assembly
from an on-disk unclip-style checkpoint."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neurons_tpu.config import SamplerConfig, UNet2DConfig, VAEConfig
from neurons_tpu.models.engine import DiffusionEngine

TINY_U = UNet2DConfig(model_channels=8, channel_mult=(1, 2),
                      num_res_blocks=1, attention_resolutions=(2,),
                      transformer_depth=(1, 1), num_head_channels=4,
                      context_dim=12, adm_in_channels=1024)
TINY_V = VAEConfig(block_out_channels=(8, 8), layers_per_block=1,
                   norm_num_groups=4)


class TestDiffusionEngine:
    def test_sample_and_decode(self):
        eng = DiffusionEngine(unet_cfg=TINY_U, vae_cfg=TINY_V,
                              sampler_cfg=SamplerConfig(unclip_steps=3))
        eng.init_random(jax.random.PRNGKey(0), latent_hw=8)
        tokens = jnp.zeros((2, 5, 12))
        z = eng.sample(jax.random.PRNGKey(1), tokens,
                       shape=(2, 4, 8, 8))
        assert z.shape == (2, 4, 8, 8)
        assert np.isfinite(np.asarray(z)).all()
        img = eng.decode_first_stage(z)
        assert img.shape[0] == 2 and img.shape[1] == 3
        assert np.isfinite(np.asarray(img)).all()
        vec = eng.conditioner(2)
        assert vec.shape == (2, 1024)
        z2 = eng.encode_first_stage(img)
        assert z2.shape == z.shape

    def test_from_checkpoint(self, tmp_path):
        import sys
        sys.path.insert(0, "tests")
        import torch
        from test_importers_structural import TINY_UNET, TINY_VAE, \
            TLDMUNet, TLDMVAE

        import dataclasses
        ucfg = dataclasses.replace(TINY_UNET, adm_in_channels=8)
        torch.manual_seed(0)
        sd = {f"model.diffusion_model.{k}": v
              for k, v in TLDMUNet(ucfg).state_dict().items()}
        sd.update({f"first_stage_model.{k}": v
                   for k, v in TLDMVAE(TINY_VAE).state_dict().items()})
        path = str(tmp_path / "unclip.ckpt")
        torch.save({"state_dict": sd}, path)
        eng = DiffusionEngine.from_checkpoint(
            path, unet_cfg=ucfg, vae_cfg=TINY_VAE,
            sampler_cfg=SamplerConfig(unclip_steps=3), use_ema=False)
        assert eng.import_report["unet_unused"] == []
        z = eng.sample(jax.random.PRNGKey(0),
                       jnp.zeros((1, 5, ucfg.context_dim)),
                       shape=(1, 4, 8, 8))
        assert np.isfinite(np.asarray(z)).all()
