"""SVD img2vid pipeline tests (pipelines/svd.py): end-to-end tiny run,
VScalingWithEDMcNoise math, linear-prediction CFG ramp."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurons_tpu.config import VAEConfig, VideoDecoderConfig, VideoUNetConfig
from neurons_tpu.models.temporal_ae import VideoDecoder
from neurons_tpu.models.video_unet import VideoUNet
from neurons_tpu.pipelines import svd as SVD

# slow tier: heavy subprocess/golden drive (see pyproject markers)
pytestmark = pytest.mark.slow

TINY_UNET = VideoUNetConfig(in_channels=8, out_channels=4, model_channels=8,
                            channel_mult=(1, 2), num_res_blocks=1,
                            attention_resolutions=(2,),
                            transformer_depth=(1, 1), num_head_channels=4,
                            context_dim=1024, adm_in_channels=768,
                            video_kernel_size=(3, 1, 1))
TINY_DEC = VideoDecoderConfig(
    vae=VAEConfig(block_out_channels=(8, 8), layers_per_block=1,
                  norm_num_groups=4, latent_channels=4),
    video_kernel_size=(3, 1, 1))


class TestVScaling:
    def test_edm_cnoise_values(self):
        s = jnp.asarray([0.5, 2.0])
        c_skip, c_out, c_in, c_noise = SVD.v_scaling_edm_cnoise(s)
        np.testing.assert_allclose(np.asarray(c_skip), 1 / (s ** 2 + 1),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(c_out),
                                   -s / np.sqrt(s ** 2 + 1), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(c_noise), 0.25 * np.log(s),
                                   rtol=1e-6)

    def test_vector_conditioning_shape(self):
        v = SVD.svd_vector_conditioning(2, 6.0, 127.0, 0.02)
        assert v.shape == (2, 768)
        assert np.isfinite(np.asarray(v)).all()


class TestSVDPipeline:
    def test_img2vid_end_to_end(self):
        unet = VideoUNet(TINY_UNET)
        dec = VideoDecoder(TINY_DEC)
        B, T, hw = 1, 4, 8
        key = jax.random.PRNGKey(0)
        x0 = jnp.zeros((B * T, 8, hw, hw))
        ctx0 = jnp.zeros((B * T, 1, 1024))
        y0 = jnp.zeros((B * T, 768))
        up = unet.init(key, x0, jnp.zeros((B * T,)), ctx0, y0,
                       num_frames=T)["params"]
        dp = dec.init(key, jnp.zeros((B * T, 4, hw, hw)),
                      num_frames=T)["params"]

        def unet_apply(p, x, t, ctx, y, nf):
            return unet.apply({"params": p}, x, t, ctx, y, num_frames=nf)

        def decode_fn(z, nf):
            return dec.apply({"params": dp}, z, num_frames=nf)

        out = SVD.svd_img2vid(
            unet_apply, up, decode_fn, jax.random.PRNGKey(1),
            cond_latent=jnp.ones((B, 4, hw, hw)) * 0.1,
            clip_emb=jnp.ones((B, 1024)) * 0.05,
            num_frames=T, num_steps=3, decode_chunk=2)
        assert out.video.shape == (B, T, 3, hw * 2, hw * 2)
        assert out.latents.shape == (B * T, 4, hw, hw)
        assert np.isfinite(np.asarray(out.video)).all()
        assert float(jnp.abs(out.video).max()) <= 1.0

    def test_linear_cfg_ramp(self):
        # denoiser that returns cond/uncond distinguishable outputs:
        # the guided result must interpolate with the per-frame ramp
        from neurons_tpu.diffusion.samplers import \
            make_linear_prediction_denoiser
        T = 4

        def denoiser(net, x, s, **c):
            return net(x, s, **c)

        def network(x, t, flag):
            return flag.reshape((-1,) + (1,) * (x.ndim - 1)) * \
                jnp.ones_like(x)

        cond = {"flag": jnp.ones((T,))}
        uc = {"flag": jnp.zeros((T,))}
        den = make_linear_prediction_denoiser(denoiser, network, cond, uc,
                                              num_frames=T, min_scale=1.0,
                                              max_scale=2.5)
        out = den(jnp.zeros((T, 1, 2, 2)), jnp.ones((T,)))
        # x_u = 0, x_c = 1 -> out = scale ramp per frame
        got = np.asarray(out)[:, 0, 0, 0]
        np.testing.assert_allclose(got, np.linspace(1.0, 2.5, T), rtol=1e-6)
