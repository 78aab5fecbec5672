"""Schedule + prior-sampling tests (vs reference BrainDiffusionPrior and sgm
LegacyDDPMDiscretization semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from neurons_tpu.diffusion import schedule as S
from neurons_tpu.diffusion import prior as P


class TestSchedules:
    def test_cosine_betas_shape_and_bounds(self):
        b = S.cosine_betas(100)
        assert b.shape == (100,)
        assert (b > 0).all() and (b <= 0.999).all()
        # monotone alphas_cumprod decreasing to near zero
        ac = np.cumprod(1 - b)
        assert ac[0] > 0.99 and ac[-1] < 0.01

    def test_qsample_endpoints(self):
        sched = S.make_ddpm_schedule(S.cosine_betas(10))
        x0 = jnp.ones((2, 4))
        noise = jnp.full((2, 4), 2.0)
        t0 = jnp.zeros((2,), jnp.int32)
        xt = S.q_sample(sched, x0, t0, noise)
        # at t=0 mostly signal
        assert float(jnp.abs(xt - x0).max()) < 0.5
        tT = jnp.full((2,), 9, jnp.int32)
        xT = S.q_sample(sched, x0, tT, noise)
        # at t=T mostly noise
        assert float(jnp.abs(xT - noise).max()) < 0.5

    def test_q_posterior_consistency(self):
        """Posterior mean with x_start == x_t at t=0 returns ~x_t."""
        sched = S.make_ddpm_schedule(S.cosine_betas(10))
        x = jnp.ones((2, 4)) * 0.5
        t = jnp.zeros((2,), jnp.int32)
        mean, var, _ = S.q_posterior(sched, x, x, t)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(x), atol=1e-4)

    def test_sd_sigmas_ladder(self):
        sig = np.asarray(S.sd_sigmas(38))
        assert sig.shape == (39,)
        assert sig[-1] == 0.0
        assert (np.diff(sig) < 0).all()  # strictly descending
        # sigma_max of the 1000-step SD-1.5 schedule ~ 14.6146
        assert 14.0 < sig[0] < 15.0

    def test_sd_sigmas_full_table(self):
        sig = np.asarray(S.sd_sigmas(1000))
        assert sig.shape == (1001,)
        # first sigma (t=999): sqrt((1-abar)/abar)
        betas = S.linear_betas(1000)
        ac = np.cumprod(1 - betas)
        np.testing.assert_allclose(sig[0], np.sqrt((1 - ac[-1]) / ac[-1]),
                                   rtol=1e-5)

    def test_spaced_timesteps_match_reference_formula(self):
        got = S.spaced_timesteps(38, 1000)
        expected = np.linspace(999, 0, 38, endpoint=False).astype(int)[::-1]
        np.testing.assert_array_equal(got, expected)


class TestPriorSampling:
    def test_p_sample_loop_denoises_to_net_prediction(self):
        """With a net that always predicts a constant x0, the DDPM loop must
        converge to that constant."""
        target = jnp.full((2, 4, 8), 1.5)
        diff = P.PriorDiffusion.create(timesteps=20)

        def net_apply(params, x, times, brain, **kw):
            return target

        out = jax.jit(lambda k: P.p_sample_loop(
            diff, net_apply, {}, k, (2, 4, 8), brain_embed=None))(
                jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(target),
                                   atol=0.05)

    def test_p_losses_zero_for_perfect_net(self):
        diff = P.PriorDiffusion.create(timesteps=10)
        x = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 8))

        def net_apply(params, noisy, times, brain, **kw):
            return x  # oracle

        loss, pred = P.p_losses(diff, net_apply, {}, jax.random.PRNGKey(2),
                                x, brain_embed=None)
        assert float(loss) < 1e-10

    def test_cfg_scale_changes_samples(self):
        diff = P.PriorDiffusion.create(timesteps=5)

        def net_apply(params, x, times, brain, brain_cond_drop_prob=0.0,
                      image_cond_drop_prob=0.0, rng=None):
            base = jnp.tanh(x)
            return base if brain_cond_drop_prob == 0.0 else base * 0.5

        k = jax.random.PRNGKey(3)
        s1 = P.p_sample_loop(diff, net_apply, {}, k, (1, 2, 4), None,
                             cond_scale=1.0)
        s2 = P.p_sample_loop(diff, net_apply, {}, k, (1, 2, 4), None,
                             cond_scale=2.0)
        assert not np.allclose(np.asarray(s1), np.asarray(s2))


class TestPriorNetwork:
    def test_forward_shapes_and_cfg_nulling(self):
        from neurons_tpu.config import PriorConfig
        from neurons_tpu.models.prior import PriorNetwork

        cfg = PriorConfig(dim=32, depth=2, dim_head=8, heads=4, num_tokens=6,
                          timesteps=10)
        net = PriorNetwork(cfg)
        key = jax.random.PRNGKey(0)
        img = jax.random.normal(key, (2, 6, 32))
        brain = jax.random.normal(jax.random.fold_in(key, 1), (2, 6, 32))
        times = jnp.array([3, 7])
        params = net.init(key, img, times, brain)
        out = net.apply(params, img, times, brain)
        assert out.shape == (2, 6, 32)

        # fully dropping conditioning must change the output and be
        # brain-independent
        out_null = net.apply(params, img, times, brain,
                             brain_cond_drop_prob=1.0)
        out_null2 = net.apply(params, img, times, brain * 3.0,
                              brain_cond_drop_prob=1.0)
        assert not np.allclose(np.asarray(out), np.asarray(out_null))
        np.testing.assert_allclose(np.asarray(out_null), np.asarray(out_null2),
                                   rtol=1e-5)

    def test_time_conditioning_matters(self):
        from neurons_tpu.config import PriorConfig
        from neurons_tpu.models.prior import PriorNetwork

        cfg = PriorConfig(dim=32, depth=1, dim_head=8, heads=4, num_tokens=6)
        net = PriorNetwork(cfg)
        key = jax.random.PRNGKey(0)
        img = jax.random.normal(key, (1, 6, 32))
        brain = jax.random.normal(jax.random.fold_in(key, 1), (1, 6, 32))
        params = net.init(key, img, jnp.array([0]), brain)
        o1 = net.apply(params, img, jnp.array([0]), brain)
        o2 = net.apply(params, img, jnp.array([9]), brain)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))


class TestSamplerZoo:
    """With D(x, sigma) = x0 constant, the PF-ODE trajectory is
    x(sigma) = x0 + c*sigma (d is constant), so EVERY consistent sampler
    must land exactly on x0 at sigma=0 — a discriminating correctness
    check for the whole zoo (reference sampling.py:87-367)."""

    def _setup(self):
        import numpy as np
        from neurons_tpu.diffusion import samplers as S
        from neurons_tpu.diffusion.schedule import sd_sigmas

        x0 = jnp.asarray(np.random.RandomState(0).randn(2, 3, 4, 4),
                         jnp.float32)
        denoise = lambda x, sigma: jnp.broadcast_to(x0, x.shape)
        sigmas = jnp.asarray(sd_sigmas(8), jnp.float32)
        x_init = jax.random.normal(jax.random.PRNGKey(1), x0.shape) \
            * sigmas[0]
        return S, denoise, x0, sigmas, x_init

    def test_euler_converges(self):
        S, d, x0, sig, x = self._setup()
        out = S.sample_euler(d, x, sig, prepare=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                                   atol=1e-4)

    def test_heun_converges(self):
        S, d, x0, sig, x = self._setup()
        out = S.sample_heun(d, x, sig, prepare=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                                   atol=1e-4)

    def test_euler_ancestral_converges(self):
        S, d, x0, sig, x = self._setup()
        out = S.sample_euler_ancestral(d, x, sig, jax.random.PRNGKey(2),
                                       prepare=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                                   atol=1e-4)

    def test_dpmpp2m_converges(self):
        S, d, x0, sig, x = self._setup()
        out = S.sample_dpmpp2m(d, x, sig, prepare=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                                   atol=1e-3)

    def test_dpmpp2s_ancestral_converges(self):
        S, d, x0, sig, x = self._setup()
        out = S.sample_dpmpp2s_ancestral(d, x, sig, jax.random.PRNGKey(2),
                                         prepare=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                                   atol=1e-3)

    def test_lms_converges(self):
        import numpy as np
        S, d, x0, sig, x = self._setup()
        out = S.sample_lms(d, x, np.asarray(sig), prepare=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                                   atol=1e-3)


class TestDiffusionExtras:
    def test_edm_sigmas_ladder(self):
        from neurons_tpu.diffusion.schedule import edm_sigmas
        s = np.asarray(edm_sigmas(10))
        assert s.shape == (11,) and s[-1] == 0.0
        assert (np.diff(s) < 0).all()  # strictly descending
        np.testing.assert_allclose(s[0], 80.0, rtol=1e-5)
        np.testing.assert_allclose(s[-2], 0.002, rtol=1e-4)

    def test_ddim_inversion_round_trip(self):
        from neurons_tpu.diffusion.ddim import DDIMScheduler, ddim_inversion
        sched = DDIMScheduler.create(10)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 4),
                        jnp.float32)
        zero_eps = lambda z, t: jnp.zeros_like(z)
        inv = ddim_inversion(sched, zero_eps, x, 10)
        # forward DDIM with the same zero eps must undo the inversion
        def fwd(z, t):
            return sched.step(jnp.zeros_like(z), t, z), None
        out, _ = jax.lax.scan(fwd, inv, sched.timesteps)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   rtol=1e-4, atol=1e-4)

    def test_linear_prediction_guider_ramps(self):
        from neurons_tpu.diffusion import samplers as S
        F = 4
        # denoiser returns cond=1, uncond=0 -> output == per-frame scale
        def denoiser(network, x, s, **kw):
            half = x.shape[0] // 2
            return jnp.concatenate([jnp.zeros_like(x[:half]),
                                    jnp.ones_like(x[half:])], axis=0)
        d = S.make_linear_prediction_denoiser(
            denoiser, None, {"c": jnp.zeros((F, 1))},
            {"c": jnp.zeros((F, 1))}, num_frames=F,
            min_scale=1.0, max_scale=2.5)
        out = d(jnp.zeros((F, 2)), jnp.zeros((F,)))
        np.testing.assert_allclose(np.asarray(out[:, 0]),
                                   np.linspace(1.0, 2.5, F), rtol=1e-6)

    def test_standard_diffusion_loss_zero_for_perfect_denoiser(self):
        from neurons_tpu.diffusion.loss import (standard_diffusion_loss,
                                                discrete_sigma_sampler,
                                                edm_sigma_sampler)
        x = jnp.asarray(np.random.RandomState(0).randn(4, 2, 8, 8),
                        jnp.float32)
        perfect = lambda noised, sigmas: jnp.broadcast_to(x, noised.shape)
        for sampler in (discrete_sigma_sampler(100), edm_sigma_sampler()):
            loss = standard_diffusion_loss(perfect, x, jax.random.PRNGKey(0),
                                           sampler,
                                           offset_noise_level=0.04)
            assert float(loss) < 1e-10
        # a wrong denoiser has positive loss
        wrong = lambda noised, sigmas: noised
        loss = standard_diffusion_loss(wrong, x, jax.random.PRNGKey(0),
                                       discrete_sigma_sampler(100))
        assert float(loss) > 0.1
