"""AutoencodingEngine training-step tests (training/train_autoencoder.py)
— the sgm VAE/VQGAN harness equivalent (reference sgm/models/
autoencoder.py:102-435 + discriminator_loss.py) on tiny shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurons_tpu.config import VAEConfig
from neurons_tpu.training.train_autoencoder import (AutoencoderTrainConfig,
                                                    AutoencodingEngine)

# slow tier: heavy subprocess/golden drive (see pyproject markers)
pytestmark = pytest.mark.slow

TINY = AutoencoderTrainConfig(
    vae=VAEConfig(block_out_channels=(8, 8), layers_per_block=1,
                  norm_num_groups=4, latent_channels=4),
    perceptual_weight=0.0,  # skip the VGG trunk on tiny runs
    disc_start=1, disc_ndf=8, disc_num_layers=2, lr=1e-3)


def _data(key, n=2, hw=32):
    return jax.random.uniform(key, (n, 3, hw, hw)) * 2 - 1


class TestAutoencodingEngine:
    def test_generator_step_updates_and_is_finite(self):
        eng = AutoencodingEngine(TINY)
        state = eng.init(jax.random.PRNGKey(0), image_hw=32)
        gstep = eng.make_generator_step()
        x = _data(jax.random.PRNGKey(1))
        new, loss, log = gstep(state, x, jax.random.PRNGKey(2))
        assert np.isfinite(float(loss))
        assert "kl_loss" in log and "scalars/d_weight" in log
        w0 = state["vae"]["encoder"]["conv_in"]["kernel"]
        w1 = new["vae"]["encoder"]["conv_in"]["kernel"]
        assert not np.allclose(np.asarray(w0), np.asarray(w1))
        assert int(new["step"]) == 1

    def test_discriminator_step(self):
        eng = AutoencodingEngine(TINY)
        state = eng.init(jax.random.PRNGKey(0), image_hw=32)
        state["step"] = jnp.asarray(5, jnp.int32)  # past disc_start
        dstep = eng.make_discriminator_step()
        x = _data(jax.random.PRNGKey(1))
        new, d, log = dstep(state, x, jax.random.PRNGKey(2))
        assert np.isfinite(float(d)) and float(d) > 0
        assert "logits/real" in log
        d0 = state["disc"]["conv_0"]["kernel"]
        d1 = new["disc"]["conv_0"]["kernel"]
        assert not np.allclose(np.asarray(d0), np.asarray(d1))
        # vae untouched by the disc step
        np.testing.assert_array_equal(
            np.asarray(state["vae"]["encoder"]["conv_in"]["kernel"]),
            np.asarray(new["vae"]["encoder"]["conv_in"]["kernel"]))

    def test_disc_gating_before_start(self):
        cfg = AutoencoderTrainConfig(
            vae=TINY.vae, perceptual_weight=0.0, disc_start=1000,
            disc_ndf=8, disc_num_layers=2, lr=1e-3)
        eng = AutoencodingEngine(cfg)
        state = eng.init(jax.random.PRNGKey(0), image_hw=32)
        dstep = eng.make_discriminator_step()
        x = _data(jax.random.PRNGKey(1))
        new, _, _ = dstep(state, x, jax.random.PRNGKey(2))
        # gated: zero grads -> params unchanged
        np.testing.assert_allclose(
            np.asarray(state["disc"]["conv_0"]["kernel"]),
            np.asarray(new["disc"]["conv_0"]["kernel"]), atol=1e-7)

    def test_vq_regularizer_variant(self):
        cfg = AutoencoderTrainConfig(
            vae=TINY.vae, regularizer="vq", n_codes=16,
            perceptual_weight=0.0, disc_start=1, disc_ndf=8,
            disc_num_layers=2, lr=1e-3)
        eng = AutoencodingEngine(cfg)
        state = eng.init(jax.random.PRNGKey(0), image_hw=32)
        assert "quant" in state
        gstep = eng.make_generator_step()
        x = _data(jax.random.PRNGKey(1))
        new, loss, log = gstep(state, x, None)
        assert np.isfinite(float(loss)) and "loss/vq" in log
        # codebook learns
        assert not np.allclose(np.asarray(state["quant"]["embedding"]),
                               np.asarray(new["quant"]["embedding"]))

    def test_loss_decreases_on_fixed_batch(self):
        eng = AutoencodingEngine(TINY)
        state = eng.init(jax.random.PRNGKey(0), image_hw=32)
        gstep = eng.make_generator_step()
        x = _data(jax.random.PRNGKey(1))
        losses = []
        for i in range(8):
            state, loss, _ = gstep(state, x, None)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
