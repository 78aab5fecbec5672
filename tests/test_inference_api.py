"""Tests for the sgm inference API equivalent (pipelines/api.py) and the
diffusion LR schedules (diffusion/lr_schedule.py).

Mirrors the reference's own vendored suite
(generative_models/tests/inference/test_inference.py:18-111), which
parametrizes txt2img/img2img over every sampler enum — here on a tiny
random-weight engine on the CPU backend. LR schedules are checked against
step-by-step Python replicas of reference sgm/lr_scheduler.py.
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurons_tpu.config import SamplerConfig, UNet2DConfig, VAEConfig
from neurons_tpu.diffusion import lr_schedule as LRS
from neurons_tpu.models.engine import DiffusionEngine
from neurons_tpu.pipelines import api as API

TINY_U = UNet2DConfig(model_channels=8, channel_mult=(1, 2),
                      num_res_blocks=1, attention_resolutions=(2,),
                      transformer_depth=(1, 1), num_head_channels=4,
                      context_dim=12, adm_in_channels=1024)
TINY_V = VAEConfig(block_out_channels=(8, 8), layers_per_block=1,
                   norm_num_groups=4)


@pytest.fixture(scope="module")
def engine():
    eng = DiffusionEngine(unet_cfg=TINY_U, vae_cfg=TINY_V,
                          sampler_cfg=SamplerConfig(unclip_steps=3))
    eng.init_random(jax.random.PRNGKey(0), latent_hw=8)
    return eng


COND = {"crossattn": jnp.zeros((1, 5, 12)),
        "vector": jnp.zeros((1, 1024))}
UC = {"crossattn": jnp.ones((1, 5, 12)),
      "vector": jnp.zeros((1, 1024))}


@pytest.mark.slow
class TestDoSample:
    @pytest.mark.parametrize("sampler", list(API.Sampler))
    def test_txt2img_every_sampler(self, engine, sampler):
        params = API.SamplingParams(width=16, height=16, steps=4,
                                    sampler=sampler, scale=2.0, order=2)
        out = API.do_sample(engine, params, jax.random.PRNGKey(1),
                            COND, UC)
        assert out.shape == (1, 3, 16, 16)
        assert np.isfinite(np.asarray(out)).all()
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_identity_guider_skips_cfg(self, engine):
        params = API.SamplingParams(width=16, height=16, steps=3,
                                    guider=API.Guider.IDENTITY)
        out = API.do_sample(engine, params, jax.random.PRNGKey(1), COND)
        assert np.isfinite(np.asarray(out)).all()

    def test_img2img_strength_prunes_sigmas(self, engine):
        img = jnp.zeros((1, 3, 16, 16))
        params = API.SamplingParams(width=16, height=16, steps=10,
                                    sampler=API.Sampler.EULER_EDM,
                                    img2img_strength=0.4)
        out, z = API.do_img2img(img, engine, params, jax.random.PRNGKey(2),
                                COND, UC, return_latents=True)
        assert out.shape == (1, 3, 16, 16)
        assert np.isfinite(np.asarray(z)).all()

    def test_build_sigmas_pruning_matches_reference_wrapper(self):
        # reference helpers.py:89-99 prunes the ZERO-APPENDED ladder:
        # steps=10, strength=0.4 -> keep max(int(0.4*11),1)=4 entries
        # including the trailing zero = 3 denoise steps
        params = API.SamplingParams(steps=10, img2img_strength=0.4)
        full = API.build_sigmas(dataclasses.replace(
            params, img2img_strength=1.0))
        pruned = API.build_sigmas(params)
        assert pruned.shape[0] == 4
        assert float(pruned[-1]) == 0.0
        np.testing.assert_allclose(np.asarray(pruned),
                                   np.asarray(full[-4:]))

    def test_edm_discretization_monotone(self):
        params = API.SamplingParams(steps=7,
                                    discretization=API.Discretization.EDM,
                                    sigma_min=0.03, sigma_max=14.6, rho=3.0)
        s = np.asarray(API.build_sigmas(params))
        assert s[0] == pytest.approx(14.6, rel=1e-5)
        assert (np.diff(s) < 0).all() and s[-1] == 0.0

    def test_model_specs_complete(self):
        for arch in API.ModelArchitecture:
            spec = API.model_specs[arch]
            assert spec.channels == 4 and spec.factor == 8


class TestWatermark:
    def test_roundtrip_and_invisibility(self):
        rng = np.random.RandomState(0)
        img = rng.rand(2, 3, 64, 64).astype(np.float32) * 0.8 + 0.1
        marked = API.embed_watermark(img)
        assert marked.shape == img.shape
        assert np.abs(marked - img).max() < 0.05  # invisible-ish
        for i in range(2):
            assert API.decode_watermark(marked[i]) == API.WATERMARK_BITS

    def test_five_dim_batch(self):
        img = np.full((2, 1, 3, 32, 32), 0.5, np.float32)
        marked = API.embed_watermark(img)
        assert marked.shape == img.shape


# ---------------------------------------------------------------------------
# LR schedules vs reference replicas (sgm/lr_scheduler.py)
# ---------------------------------------------------------------------------

def _ref_warmup_cosine(n, wu, lr_min, lr_max, lr_start, max_decay):
    if n < wu:
        return (lr_max - lr_start) / wu * n + lr_start
    t = min((n - wu) / (max_decay - wu), 1.0)
    return lr_min + 0.5 * (lr_max - lr_min) * (1 + math.cos(t * math.pi))


def _ref_cycle(n, cum):
    interval = 0
    for cl in cum[1:]:
        if n <= cl:
            return interval
        interval += 1
    return interval - 1


def _ref_cyclic(n, wu, fmin, fmax, fstart, cls, linear):
    cum = np.cumsum([0] + list(cls))
    c = _ref_cycle(n, cum)
    n = n - cum[c]
    if n < wu[c]:
        return (fmax[c] - fstart[c]) / wu[c] * n + fstart[c]
    if linear:
        return fmin[c] + (fmax[c] - fmin[c]) * (cls[c] - n) / cls[c]
    t = min((n - wu[c]) / (cls[c] - wu[c]), 1.0)
    return fmin[c] + 0.5 * (fmax[c] - fmin[c]) * (1 + math.cos(t * math.pi))


class TestLRSchedules:
    def test_warmup_cosine(self):
        f = LRS.warmup_cosine(10, 0.01, 1.0, 0.1, 100)
        for n in [0, 3, 9, 10, 11, 50, 99, 100, 150]:
            np.testing.assert_allclose(
                float(f(n)), _ref_warmup_cosine(n, 10, 0.01, 1.0, 0.1, 100),
                rtol=1e-5, err_msg=f"step {n}")

    @pytest.mark.parametrize("linear", [False, True])
    def test_cyclic(self, linear):
        wu, fmin, fmax, fstart = [5, 2], [0.1, 0.05], [1.0, 0.5], \
            [1e-3, 1e-3]
        cls = [50, 30]
        build = (LRS.cyclic_warmup_linear if linear
                 else LRS.cyclic_warmup_cosine)
        f = build(wu, fmin, fmax, fstart, cls)
        for n in [0, 2, 5, 6, 30, 49, 50, 51, 52, 55, 70, 79]:
            np.testing.assert_allclose(
                float(f(n)),
                _ref_cyclic(n, wu, fmin, fmax, fstart, cls, linear),
                rtol=1e-5, err_msg=f"step {n}")

    def test_jit_traceable(self):
        f = LRS.cyclic_warmup_linear([5], [0.1], [1.0], [1e-3], [50])
        g = jax.jit(f)
        np.testing.assert_allclose(float(g(jnp.asarray(7))), float(f(7)),
                                   rtol=1e-6)
