"""VAE / UNet2D / denoiser / sampler / keyframe-pipeline tests (tiny dims)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurons_tpu.config import UNet2DConfig, VAEConfig
from neurons_tpu.models.unet2d import UNetModel, timestep_embedding
from neurons_tpu.models.vae import AutoencoderKL


VCFG = VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                 norm_num_groups=4, latent_channels=4)
UCFG = UNet2DConfig(model_channels=8, channel_mult=(1, 2), num_res_blocks=1,
                    transformer_depth=(1, 1), num_head_channels=4,
                    context_dim=16, adm_in_channels=12,
                    attention_resolutions=(2,))


class TestVAE:
    def test_roundtrip_shapes(self, rng):
        vae = AutoencoderKL(VCFG)
        x = jax.random.normal(rng, (2, 3, 16, 16))
        params = vae.init(rng, x)
        post = vae.apply(params, x, method=AutoencoderKL.encode)
        # one downsample level (2 blocks): 16 -> 8
        assert post.mean.shape == (2, 4, 8, 8)
        z = post.mode()
        out = vae.apply(params, z, method=AutoencoderKL.decode)
        assert out.shape == (2, 3, 16, 16)

    def test_posterior_sample_differs_from_mode(self, rng):
        vae = AutoencoderKL(VCFG)
        x = jax.random.normal(rng, (1, 3, 16, 16))
        params = vae.init(rng, x)
        post = vae.apply(params, x, method=AutoencoderKL.encode)
        s = post.sample(jax.random.PRNGKey(1))
        assert not np.allclose(np.asarray(s), np.asarray(post.mode()))


class TestUNet2D:
    def test_forward_shapes(self, rng):
        unet = UNetModel(UCFG)
        x = jax.random.normal(rng, (2, 4, 16, 16))
        t = jnp.array([0.0, 5.0])
        ctx = jax.random.normal(jax.random.fold_in(rng, 1), (2, 6, 16))
        y = jax.random.normal(jax.random.fold_in(rng, 2), (2, 12))
        params = unet.init(rng, x, t, ctx, y)
        out = unet.apply(params, x, t, ctx, y)
        assert out.shape == x.shape

    def test_zero_init_output(self, rng):
        """out_conv is zero-initialized -> untrained UNet outputs zeros."""
        unet = UNetModel(UCFG)
        x = jax.random.normal(rng, (1, 4, 16, 16))
        t = jnp.array([3.0])
        ctx = jax.random.normal(rng, (1, 6, 16))
        y = jax.random.normal(rng, (1, 12))
        params = unet.init(rng, x, t, ctx, y)
        out = unet.apply(params, x, t, ctx, y)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_context_changes_output(self, rng):
        unet = UNetModel(UCFG)
        x = jax.random.normal(rng, (1, 4, 16, 16))
        t = jnp.array([3.0])
        ctx = jax.random.normal(rng, (1, 6, 16))
        y = jnp.zeros((1, 12))
        params = unet.init(rng, x, t, ctx, y)
        # perturb the zero-init out_conv so outputs are non-trivial
        params = jax.tree_util.tree_map(
            lambda p: p + 0.01 * jnp.ones_like(p), params)
        o1 = unet.apply(params, x, t, ctx, y)
        o2 = unet.apply(params, x, t, ctx * 3.0, y)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_timestep_embedding_openai_order(self):
        emb = np.asarray(timestep_embedding(jnp.array([0.0]), 8))
        # cos first: at t=0 cos terms are 1, sin terms are 0
        np.testing.assert_allclose(emb[0, :4], 1.0, atol=1e-6)
        np.testing.assert_allclose(emb[0, 4:], 0.0, atol=1e-6)


class TestDenoiserSampler:
    def test_discrete_denoiser_quantizes(self):
        from neurons_tpu.diffusion.denoiser import DiscreteDenoiser
        den = DiscreteDenoiser.create_sd(num_idx=1000)
        assert den.sigmas.shape == (1000,)
        assert float(den.sigmas[0]) < float(den.sigmas[-1])  # ascending
        idx = den.sigma_to_idx(jnp.array([float(den.sigmas[500])]))
        assert int(idx[0]) == 500

    def test_eps_denoiser_identity_net(self):
        """A network that predicts exactly the added noise recovers x0."""
        from neurons_tpu.diffusion.denoiser import (ContinuousDenoiser,
                                                    eps_scaling)
        x0 = jnp.ones((2, 4)) * 0.7
        noise = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
        sigma = jnp.array([1.5, 0.3])
        xt = x0 + noise * sigma[:, None]

        def network(x_in, c_noise, **kw):
            # oracle: return the eps that was added (x_in = xt * c_in)
            return noise

        den = ContinuousDenoiser(eps_scaling)
        d = den(network, xt, sigma)
        np.testing.assert_allclose(np.asarray(d), np.asarray(x0), atol=1e-5)

    def test_euler_converges_with_oracle(self):
        """Euler sampling with an oracle denoiser lands on the target."""
        from neurons_tpu.diffusion.samplers import sample_euler
        from neurons_tpu.diffusion.schedule import sd_sigmas
        target = jnp.full((1, 4), 2.5)

        def denoise(x, sigma):
            return jnp.broadcast_to(target, x.shape)

        sigmas = sd_sigmas(20)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4)) * sigmas[0]
        out = sample_euler(denoise, x, sigmas, prepare=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(target),
                                   atol=1e-3)

    def test_cfg_denoiser_combination(self):
        from neurons_tpu.diffusion.denoiser import ContinuousDenoiser
        from neurons_tpu.diffusion.samplers import make_cfg_denoiser
        den = ContinuousDenoiser()

        def network(x, c_noise, cond=None):
            # cond batch: first half uncond (cond=0), second half cond (=1)
            return x * 0 + cond[:, None]

        denoise = make_cfg_denoiser(
            den, network, cond={"cond": jnp.ones((2,))},
            uc={"cond": jnp.zeros((2,))}, scale=3.0)
        x = jnp.zeros((2, 4))
        sigma = jnp.ones((2,))
        out = denoise(x, sigma)
        # D(x) for eps-pred: net*(-sigma) + x = -cond; CFG: -0 + 3*(-1 - 0)
        np.testing.assert_allclose(np.asarray(out), -3.0, atol=1e-5)

    def test_dpmpp2m_with_oracle(self):
        from neurons_tpu.diffusion.samplers import sample_dpmpp2m
        from neurons_tpu.diffusion.schedule import sd_sigmas
        target = jnp.full((1, 4), -1.2)

        def denoise(x, sigma):
            return jnp.broadcast_to(target, x.shape)

        sigmas = sd_sigmas(15)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 4)) * sigmas[0]
        out = sample_dpmpp2m(denoise, x, sigmas, prepare=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(target),
                                   atol=1e-3)


class TestConditioner:
    def test_vector_suffix_shape(self):
        from neurons_tpu.models.conditioner import unclip_vector_suffix
        v = unclip_vector_suffix(batch_size=3)
        assert v.shape == (3, 1024)
        # rows identical (constant conditioning)
        np.testing.assert_allclose(np.asarray(v[0]), np.asarray(v[1]))


@pytest.mark.slow
class TestUnclipSample:
    def test_end_to_end_tiny(self, rng):
        """unclip_sample through a tiny UNet + VAE decoder produces finite
        [0,1] images of the right shape."""
        from neurons_tpu.pipelines.keyframe import unclip_sample

        unet = UNetModel(UCFG)
        x0 = jnp.zeros((2, 4, 8, 8))
        t0 = jnp.zeros((2,))
        ctx = jnp.zeros((2, 6, 16))
        y0 = jnp.zeros((2, 1024))
        ucfg2 = UNet2DConfig(model_channels=8, channel_mult=(1, 2),
                             num_res_blocks=1, transformer_depth=(1, 1),
                             num_head_channels=4, context_dim=16,
                             adm_in_channels=1024, attention_resolutions=(2,))
        unet = UNetModel(ucfg2)
        params = unet.init(rng, x0, t0, ctx, y0)

        vae = AutoencoderKL(VCFG)
        vparams = vae.init(rng, jnp.zeros((2, 3, 16, 16)))

        def unet_apply(p, x, t, crossattn, vector):
            return unet.apply(p, x, t, crossattn, vector)

        def vae_decode(z):
            return vae.apply(vparams, z, method=AutoencoderKL.decode)

        out = unclip_sample(unet_apply, params, vae_decode,
                            jax.random.PRNGKey(0),
                            clip_tokens=jnp.zeros((2, 6, 16)),
                            num_steps=3, latent_hw=8)
        assert out.shape == (2, 3, 16, 16)
        o = np.asarray(out)
        assert np.isfinite(o).all() and o.min() >= 0 and o.max() <= 1


@pytest.mark.slow
class TestEncoderReuse:
    """Faster-Diffusion encoder propagation (PAPERS.md, arXiv 2312.09608):
    cached=(h, skips) decoder-only forward is consistent, and
    unclip_sample with reuse runs finite; reuse=1 equals the exact path."""

    def _setup(self):
        from neurons_tpu.config import UNet2DConfig
        from neurons_tpu.models.unet2d import UNetModel

        cfg = UNet2DConfig(model_channels=8, channel_mult=(1, 2),
                           num_res_blocks=1, attention_resolutions=(2,),
                           transformer_depth=(1, 1), num_head_channels=4,
                           context_dim=12, adm_in_channels=8)
        m = UNetModel(cfg)
        x = jnp.zeros((2, 4, 8, 8))
        ctx = jnp.zeros((2, 5, 12))
        y = jnp.zeros((2, 8))
        params = m.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)), ctx,
                        y)["params"]
        # out_conv is zero-init (standard SD) -> a fresh net outputs 0 and
        # every sampler path coincides; randomize it so paths differ
        params = dict(params)
        params["out_conv"] = {
            "kernel": jax.random.normal(jax.random.PRNGKey(9),
                                        params["out_conv"]["kernel"].shape)
            * 0.1,
            "bias": params["out_conv"]["bias"]}
        return m, params, cfg

    def test_cached_forward_matches_full_at_same_timestep(self, rng):
        m, params, cfg = self._setup()
        x = jax.random.normal(rng, (2, 4, 8, 8))
        ctx = jax.random.normal(jax.random.fold_in(rng, 1), (2, 5, 12))
        y = jax.random.normal(jax.random.fold_in(rng, 2), (2, 8))
        t = jnp.full((2,), 3.0)
        out_full, cache = m.apply({"params": params}, x, t, ctx, y,
                                  return_cache=True)
        out_cached = m.apply({"params": params}, x, t, ctx, y,
                             cached=cache)
        np.testing.assert_allclose(np.asarray(out_cached),
                                   np.asarray(out_full), rtol=1e-5,
                                   atol=1e-5)

    def test_unclip_sample_reuse_runs_and_reuse1_exact(self, rng):
        from neurons_tpu.pipelines.keyframe import unclip_sample

        m, params, cfg = self._setup()

        def unet_apply(p, x, t, crossattn, vector, **kw):
            return m.apply({"params": p}, x, t, crossattn, vector, **kw)

        vae_decode = lambda z: jnp.tile(z[:, :3], (1, 1, 2, 2))
        tokens = jax.random.normal(rng, (2, 5, 12)) * 0.1
        vec = jnp.zeros((2, 8))
        base = unclip_sample(unet_apply, params, vae_decode,
                             jax.random.PRNGKey(3), tokens, vector=vec,
                             num_steps=4, latent_hw=8)
        exact = unclip_sample(unet_apply, params, vae_decode,
                              jax.random.PRNGKey(3), tokens, vector=vec,
                              num_steps=4, latent_hw=8, encoder_reuse=1)
        np.testing.assert_allclose(np.asarray(base), np.asarray(exact))
        fast = unclip_sample(unet_apply, params, vae_decode,
                             jax.random.PRNGKey(3), tokens, vector=vec,
                             num_steps=4, latent_hw=8, encoder_reuse=2)
        assert np.isfinite(np.asarray(fast)).all()
        # the approximation changes the trajectory (but stays bounded)
        assert not np.allclose(np.asarray(fast), np.asarray(base))


@pytest.mark.slow
class TestDeepCache:
    """DeepCache (arXiv 2312.00858): shallow-only recompute with the
    deep up-path feature cached."""

    def test_deep_cached_same_step_is_exact(self, rng):
        """Reusing the deep feature captured at the SAME (x, t) must
        reproduce the full forward bit-for-bit — the cached path
        recomputes exactly the level-0 blocks the full path ran."""
        m, params, cfg = TestEncoderReuse._setup(self)
        x = jax.random.normal(rng, (2, 4, 8, 8))
        ctx = jax.random.normal(jax.random.fold_in(rng, 1), (2, 5, 12))
        y = jax.random.normal(jax.random.fold_in(rng, 2), (2, 8))
        t = jnp.full((2,), 3.0)
        out_full, deep = m.apply({"params": params}, x, t, ctx, y,
                                 return_deep_cache=True)
        out_cached = m.apply({"params": params}, x, t, ctx, y,
                             deep_cached=deep)
        np.testing.assert_allclose(np.asarray(out_cached),
                                   np.asarray(out_full), rtol=1e-6,
                                   atol=1e-6)

    def test_unclip_sample_deep_cache_runs(self, rng):
        from neurons_tpu.pipelines.keyframe import unclip_sample

        m, params, cfg = TestEncoderReuse._setup(self)

        def unet_apply(p, x, t, crossattn, vector, **kw):
            return m.apply({"params": p}, x, t, crossattn, vector, **kw)

        vae_decode = lambda z: jnp.tile(z[:, :3], (1, 1, 2, 2))
        tokens = jax.random.normal(rng, (2, 5, 12)) * 0.1
        vec = jnp.zeros((2, 8))
        base = unclip_sample(unet_apply, params, vae_decode,
                             jax.random.PRNGKey(3), tokens, vector=vec,
                             num_steps=4, latent_hw=8)
        fast = unclip_sample(unet_apply, params, vae_decode,
                             jax.random.PRNGKey(3), tokens, vector=vec,
                             num_steps=4, latent_hw=8, deep_cache=2)
        assert np.isfinite(np.asarray(fast)).all()
        assert not np.allclose(np.asarray(fast), np.asarray(base))
        with pytest.raises(ValueError):
            unclip_sample(unet_apply, params, vae_decode,
                          jax.random.PRNGKey(3), tokens, vector=vec,
                          num_steps=4, latent_hw=8, deep_cache=2,
                          tgate_step=2)


@pytest.mark.slow
class TestCrossAttnHoistingAndTGate:
    """Exact K/V hoisting (step-invariant context) and TGATE cross-attn
    gating (PAPERS.md, arXiv 2404.02747)."""

    def _setup(self):
        m, params, cfg = TestEncoderReuse._setup(self)
        # SpatialTransformer proj_out is zero-init (standard SD), which
        # makes every attention site a no-op in a fresh net — randomize
        # them so cross-attn actually influences the output
        from neurons_tpu.models.unet2d import cross_attn_sites
        params = jax.tree_util.tree_map(lambda x: x, params)  # deep copy
        for i, (name, _) in enumerate(cross_attn_sites(cfg)):
            po = params[name]["proj_out"]
            po["kernel"] = jax.random.normal(
                jax.random.PRNGKey(100 + i), po["kernel"].shape) * 0.2
        return m, params, cfg

    def test_ctx_kv_forward_exact(self, rng):
        from neurons_tpu.models.unet2d import precompute_context_kv

        m, params, cfg = self._setup()
        x = jax.random.normal(rng, (2, 4, 8, 8))
        ctx = jax.random.normal(jax.random.fold_in(rng, 1), (2, 5, 12))
        y = jax.random.normal(jax.random.fold_in(rng, 2), (2, 8))
        t = jnp.full((2,), 3.0)
        base = m.apply({"params": params}, x, t, ctx, y)
        kv = precompute_context_kv(params, ctx, cfg)
        hoisted = m.apply({"params": params}, x, t, ctx, y, ctx_kv=kv)
        np.testing.assert_allclose(np.asarray(hoisted), np.asarray(base),
                                   rtol=1e-6, atol=1e-6)

    def test_capture_then_cached_matches_full(self, rng):
        m, params, cfg = self._setup()
        x = jax.random.normal(rng, (2, 4, 8, 8))
        ctx = jax.random.normal(jax.random.fold_in(rng, 1), (2, 5, 12))
        y = jax.random.normal(jax.random.fold_in(rng, 2), (2, 8))
        t = jnp.full((2,), 3.0)
        base = m.apply({"params": params}, x, t, ctx, y)
        out_cap, xattn = m.apply({"params": params}, x, t, ctx, y,
                                 capture_xattn=True)
        np.testing.assert_allclose(np.asarray(out_cap), np.asarray(base),
                                   rtol=1e-6, atol=1e-6)
        # replaying the captured cross-attn outputs reproduces the full
        # forward (context becomes unused)
        out_cached = m.apply({"params": params}, x, t,
                             jnp.zeros_like(ctx), y, xattn_cached=xattn)
        np.testing.assert_allclose(np.asarray(out_cached), np.asarray(base),
                                   rtol=1e-6, atol=1e-6)

    def test_unclip_precompute_kv_exact(self, rng):
        from neurons_tpu.models.unet2d import precompute_context_kv
        from neurons_tpu.pipelines.keyframe import unclip_sample

        m, params, cfg = self._setup()

        def unet_apply(p, x, t, crossattn, vector, **kw):
            return m.apply({"params": p}, x, t, crossattn, vector, **kw)

        vae_decode = lambda z: jnp.tile(z[:, :3], (1, 1, 2, 2))
        tokens = jax.random.normal(rng, (2, 5, 12)) * 0.1
        vec = jnp.zeros((2, 8))
        base = unclip_sample(unet_apply, params, vae_decode,
                             jax.random.PRNGKey(3), tokens, vector=vec,
                             num_steps=4, latent_hw=8)
        hoisted = unclip_sample(
            unet_apply, params, vae_decode, jax.random.PRNGKey(3), tokens,
            vector=vec, num_steps=4, latent_hw=8,
            precompute_kv=lambda p, c: precompute_context_kv(p, c, cfg))
        np.testing.assert_allclose(np.asarray(hoisted), np.asarray(base),
                                   rtol=1e-6, atol=1e-6)

    def test_tgate_full_gate_equals_exact_and_early_gate_runs(self, rng):
        from neurons_tpu.pipelines.keyframe import unclip_sample

        m, params, cfg = self._setup()

        def unet_apply(p, x, t, crossattn, vector, **kw):
            return m.apply({"params": p}, x, t, crossattn, vector, **kw)

        vae_decode = lambda z: jnp.tile(z[:, :3], (1, 1, 2, 2))
        tokens = jax.random.normal(rng, (2, 5, 12)) * 0.1
        vec = jnp.zeros((2, 8))
        base = unclip_sample(unet_apply, params, vae_decode,
                             jax.random.PRNGKey(3), tokens, vector=vec,
                             num_steps=4, latent_hw=8)
        # gate_step >= num_steps -> the gated phase is empty -> exact up to
        # compile-graph reassociation (the capture step is unrolled out of
        # the scan, so fusions differ at the 1e-6 level)
        full_gate = unclip_sample(unet_apply, params, vae_decode,
                                  jax.random.PRNGKey(3), tokens, vector=vec,
                                  num_steps=4, latent_hw=8, tgate_step=4)
        np.testing.assert_allclose(np.asarray(full_gate), np.asarray(base),
                                   rtol=1e-4, atol=1e-4)
        fast = unclip_sample(unet_apply, params, vae_decode,
                             jax.random.PRNGKey(3), tokens, vector=vec,
                             num_steps=4, latent_hw=8, tgate_step=2)
        f = np.asarray(fast)
        assert np.isfinite(f).all() and f.min() >= 0 and f.max() <= 1
        assert not np.allclose(f, np.asarray(base))

    def test_tgate_excludes_encoder_reuse(self, rng):
        from neurons_tpu.pipelines.keyframe import unclip_sample

        m, params, cfg = self._setup()

        def unet_apply(p, x, t, crossattn, vector, **kw):
            return m.apply({"params": p}, x, t, crossattn, vector, **kw)

        with pytest.raises(ValueError):
            unclip_sample(unet_apply, params, lambda z: z,
                          jax.random.PRNGKey(0),
                          jnp.zeros((1, 5, 12)), vector=jnp.zeros((1, 8)),
                          num_steps=4, latent_hw=8, tgate_step=2,
                          encoder_reuse=2)

    def test_cross_attn_sites_match_param_tree(self):
        from neurons_tpu.models.unet2d import cross_attn_sites

        m, params, cfg = self._setup()
        for name, depth in cross_attn_sites(cfg):
            site = params[name]
            for j in range(depth):
                assert "attn2" in site[f"block_{j}"], (name, j)
        n_sites = sum(1 for k in params
                      if "_attn_" in k or k == "mid_attn")
        assert len(cross_attn_sites(cfg)) == n_sites


@pytest.mark.slow
class TestKeyframePAB:
    def test_pab_identity_and_divergence(self, rng):
        """PAB for the unCLIP UNet (arXiv 2408.12588): intervals (1,1)
        recompute everything -> identical latents; wider intervals
        broadcast the spatial/cross residuals and diverge."""
        from neurons_tpu.pipelines.keyframe import unclip_sample

        m, params, cfg = TestCrossAttnHoistingAndTGate._setup(
            TestCrossAttnHoistingAndTGate())

        def unet_apply(p, x, t, ctx, vec, **kw):
            return m.apply({"params": p}, x, t, ctx, vec, **kw)

        def vae_decode(z):
            return jnp.tanh(z[:, :3].repeat(2, 2).repeat(2, 3))

        tokens = jax.random.normal(rng, (1, 6, 12)) * 0.3
        vec = jnp.zeros((1, 8))
        common = dict(num_steps=6, latent_hw=8)
        base = unclip_sample(unet_apply, params, vae_decode,
                             jax.random.PRNGKey(5), tokens, vec, **common)
        exact = unclip_sample(unet_apply, params, vae_decode,
                              jax.random.PRNGKey(5), tokens, vec,
                              pab=(1, 1), **common)
        np.testing.assert_allclose(np.asarray(exact), np.asarray(base),
                                   rtol=1e-5, atol=1e-5)
        fast = unclip_sample(unet_apply, params, vae_decode,
                             jax.random.PRNGKey(5), tokens, vec,
                             pab=(2, 6), **common)
        assert np.isfinite(np.asarray(fast)).all()
        assert not np.allclose(np.asarray(fast), np.asarray(base),
                               atol=1e-6)

    def test_pab_nesting_enforced(self, rng):
        from neurons_tpu.diffusion.samplers import sample_euler_pab
        with pytest.raises(ValueError):
            sample_euler_pab(lambda *a: None, jnp.zeros((1, 4, 8, 8)),
                             jnp.ones((5,)), (2, 5))


@pytest.mark.slow
class TestKeyframeTGatePAB:
    def test_composition_runs_and_tracks_tgate(self, rng):
        """TGATE x PAB on the keyframe sampler: spatial broadcast within
        the gated phase stays finite, close to plain TGATE, and differs."""
        from neurons_tpu.pipelines.keyframe import unclip_sample

        m, params, cfg = TestCrossAttnHoistingAndTGate._setup(
            TestCrossAttnHoistingAndTGate())

        def unet_apply(p, x, t, ctx, vec, **kw):
            return m.apply({"params": p}, x, t, ctx, vec, **kw)

        tokens = jax.random.normal(rng, (1, 6, 12)) * 0.3
        vec = jnp.zeros((1, 8))
        common = dict(num_steps=8, latent_hw=8)
        tg = unclip_sample(unet_apply, params, lambda z: z,
                           jax.random.PRNGKey(5), tokens, vec,
                           tgate_step=3, **common)
        combo = unclip_sample(unet_apply, params, lambda z: z,
                              jax.random.PRNGKey(5), tokens, vec,
                              tgate_step=3, tgate_pab=2, **common)
        a, b = np.asarray(tg), np.asarray(combo)
        assert np.isfinite(b).all()
        assert not np.allclose(a, b, atol=1e-7)
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert corr > 0.95, corr
