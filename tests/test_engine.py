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
    @pytest.mark.slow
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


class TestGeneralConditioner:
    """The generic embedder registry (reference sgm modules.py:71-185):
    rank routing, slot concatenation, both ucg dropout flavors,
    force-zero, and the CFG pair."""

    def _registry(self, ucg=0.0, legacy=None):
        from neurons_tpu.models.conditioner import (Embedder,
                                                    GeneralConditioner)
        return GeneralConditioner([
            Embedder(lambda t: t * 2.0, ("txt",), ucg_rate=ucg,
                     legacy_ucg_val=legacy),          # 3-d -> crossattn
            Embedder(lambda v: v + 1.0, ("vec_a",)),  # 2-d -> vector
            Embedder(lambda v: (v, v[..., :2]), ("vec_b",)),  # multi-out
            Embedder(lambda x: x, ("img",)),          # 4-d -> concat
        ])

    def test_rank_routing_and_cat(self):
        c = self._registry()
        batch = {"txt": jnp.ones((2, 5, 8)), "vec_a": jnp.zeros((2, 3)),
                 "vec_b": jnp.full((2, 4), 2.0), "img": jnp.ones((2, 1, 4, 4))}
        out = c(batch)
        assert set(out) == {"crossattn", "vector", "concat"}
        assert out["crossattn"].shape == (2, 5, 8)
        # vector slot: (3,) + (4,) + (2,) concatenated on axis 1
        assert out["vector"].shape == (2, 9)
        np.testing.assert_allclose(out["vector"][0, :3], 1.0)
        np.testing.assert_allclose(out["vector"][0, 3:7], 2.0)
        assert out["concat"].shape == (2, 1, 4, 4)

    def test_ucg_zeroing_and_determinism(self):
        c = self._registry(ucg=0.5)
        batch = {"txt": jnp.ones((64, 2, 2)), "vec_a": jnp.zeros((64, 3)),
                 "vec_b": jnp.zeros((64, 4)), "img": jnp.ones((64, 1, 2, 2))}
        key = jax.random.PRNGKey(3)
        out = c(batch, key=key)
        per_ex = np.asarray(out["crossattn"]).reshape(64, -1)
        zeroed = (per_ex == 0).all(axis=1)
        assert 10 < zeroed.sum() < 54          # ~Bernoulli(0.5)
        np.testing.assert_array_equal(
            np.asarray(c(batch, key=key)["crossattn"]), per_ex.reshape(
                64, 2, 2))                     # same key -> same mask
        # no key -> no dropout (inference determinism)
        assert (np.asarray(c(batch)["crossattn"]) == 2.0).all()

    def test_legacy_ucg_substitutes_input(self):
        c = self._registry(ucg=1.0, legacy=7.0)
        batch = {"txt": jnp.ones((4, 2, 2)), "vec_a": jnp.zeros((4, 3)),
                 "vec_b": jnp.zeros((4, 4)), "img": jnp.ones((4, 1, 2, 2))}
        out = c(batch, key=jax.random.PRNGKey(0))
        # rate 1.0 -> every input replaced by 7.0, then fn doubles it
        np.testing.assert_allclose(np.asarray(out["crossattn"]), 14.0)

    def test_force_zero_and_cfg_pair(self):
        c = self._registry(ucg=0.5)
        batch = {"txt": jnp.ones((2, 2, 2)), "vec_a": jnp.zeros((2, 3)),
                 "vec_b": jnp.zeros((2, 4)), "img": jnp.ones((2, 1, 2, 2))}
        cc, uc = c.get_unconditional_conditioning(
            batch, force_uc_zero_embeddings=["txt"])
        assert (np.asarray(cc["crossattn"]) == 2.0).all()  # ucg off in eval
        assert (np.asarray(uc["crossattn"]) == 0.0).all()
        np.testing.assert_array_equal(np.asarray(cc["vector"]),
                                      np.asarray(uc["vector"]))

    def test_unclip_instance_matches_suffix(self):
        from neurons_tpu.models.conditioner import (unclip_conditioner,
                                                    unclip_vector_suffix)
        c = unclip_conditioner(lambda img: jnp.ones((img.shape[0], 6, 8)))
        batch = {"jpg": jnp.zeros((2, 3, 8, 8)),
                 "original_size_as_tuple": jnp.full((2, 2), 768.0),
                 "crop_coords_top_left": jnp.zeros((2, 2))}
        out = c(batch)
        assert out["crossattn"].shape == (2, 6, 8)
        np.testing.assert_allclose(
            np.asarray(out["vector"]),
            np.asarray(unclip_vector_suffix(2)), rtol=1e-6)
