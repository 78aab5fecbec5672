"""AnimateDiff video stack tests: UNet3D, motion module, SparseCtrl,
DDIM, cccat, and the full stage-5 pipeline at tiny dims."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neurons_tpu.config import UNet3DConfig, VAEConfig
from neurons_tpu.models.unet3d import (MotionModule, UNet3DModel,
                                       temporal_pos_encoding)


U3 = UNet3DConfig(block_out_channels=(8, 16, 16, 16), layers_per_block=1,
                  cross_attention_dim=12, attention_head_dim=4,
                  norm_num_groups=4, motion_num_attention_heads=2,
                  motion_max_seq_length=8)
F = 4


class TestMotionModule:
    def test_shapes_and_zero_init_identity(self, rng):
        m = MotionModule(channels=8, n_frames=F, heads=2, groups=4,
                         max_seq_len=8)
        x = jax.random.normal(rng, (2 * F, 4, 4, 8))
        params = m.init(rng, x)
        y = m.apply(params, x)
        assert y.shape == x.shape
        # zero-init proj_out -> module is identity at init
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    def test_temporal_mixing_after_perturbation(self, rng):
        m = MotionModule(channels=8, n_frames=F, heads=2, groups=4,
                         max_seq_len=8)
        x = jax.random.normal(rng, (1 * F, 4, 4, 8))
        params = m.init(rng, x)
        params = jax.tree_util.tree_map(lambda p: p + 0.05, params)
        y1 = np.asarray(m.apply(params, x))
        # changing frame 3 must change frame 0's output (temporal attention).
        # NB: the perturbation must not be constant — the module's GroupNorm
        # removes constant shifts.
        x2 = x.at[3].multiply(-2.0)
        y2 = np.asarray(m.apply(params, x2))
        assert not np.allclose(y1[0], y2[0], atol=1e-5)

    def test_pos_encoding_interleaved(self):
        pe = np.asarray(temporal_pos_encoding(4, 6))
        # position 0: sin terms 0, cos terms 1
        np.testing.assert_allclose(pe[0, 0::2], 0.0, atol=1e-6)
        np.testing.assert_allclose(pe[0, 1::2], 1.0, atol=1e-6)


class TestUNet3D:
    @pytest.fixture(scope="class")
    def built(self):
        unet = UNet3DModel(U3, n_frames=F)
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (1, 4, F, 16, 16))
        t = jnp.array([3.0])
        ctx = jax.random.normal(jax.random.fold_in(rng, 1), (1, 5, 12))
        params = unet.init(rng, x, t, ctx)
        return unet, params, x, t, ctx

    def test_forward_shape(self, built):
        unet, params, x, t, ctx = built
        out = unet.apply(params, x, t, ctx)
        assert out.shape == x.shape

    def test_zero_init_out(self, built):
        unet, params, x, t, ctx = built
        out = unet.apply(params, x, t, ctx)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_controlnet_residual_injection(self, built):
        unet, params, x, t, ctx = built
        # build residual shapes by reading the skip structure from a dry run
        from neurons_tpu.models.sparse_controlnet import SparseControlNetModel
        cn = SparseControlNetModel(U3, n_frames=F)
        cond = jnp.zeros((1, 4, F, 16, 16))
        mask = jnp.zeros((1, 1, F, 16, 16))
        cparams = cn.init(jax.random.PRNGKey(2), x, t, ctx, cond, mask)
        down_res, mid_res = cn.apply(cparams, x, t, ctx, cond, mask)
        # zero-init controlnet -> residuals are all zero
        for r in down_res:
            np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-6)
        out = unet.apply(params, x, t, ctx, down_res, mid_res)
        assert out.shape == x.shape
        # non-zero residuals change the output — perturb the UNet's
        # zero-init conv_out so effects are visible at the output
        params2 = jax.tree_util.tree_map(lambda p: p + 0.02, params)
        out_a = unet.apply(params2, x, t, ctx, down_res, mid_res)
        down2 = tuple(r + 0.1 for r in down_res)
        out_b = unet.apply(params2, x, t, ctx, down2, mid_res + 0.1)
        assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


class TestDDIM:
    def test_timesteps_match_diffusers(self):
        from neurons_tpu.diffusion.ddim import DDIMScheduler
        s = DDIMScheduler.create(25)
        ts = np.asarray(s.timesteps)
        assert ts[0] == 961 and ts[-1] == 1 and len(ts) == 25
        assert (np.diff(ts) == -40).all()

    def test_add_noise_endpoints(self):
        from neurons_tpu.diffusion.ddim import DDIMScheduler
        s = DDIMScheduler.create(25)
        x = jnp.ones((2, 3))
        n = jnp.zeros((2, 3))
        out = s.add_noise(x, n, jnp.array([0, 0]))
        np.testing.assert_allclose(np.asarray(out), np.sqrt(
            np.asarray(s.alphas_cumprod[0])), rtol=1e-5)

    def test_ddim_loop_recovers_oracle_x0(self):
        """If eps_pred is the true eps for a fixed x0, the DDIM chain
        reproduces x0 at t -> 0."""
        from neurons_tpu.diffusion.ddim import DDIMScheduler
        s = DDIMScheduler.create(25)
        x0 = jnp.full((1, 4), 0.8)
        lat = jax.random.normal(jax.random.PRNGKey(0), (1, 4))

        def body(lat, t):
            abar = s.alphas_cumprod[t]
            eps = (lat - jnp.sqrt(abar) * x0) / jnp.sqrt(1 - abar)
            return s.step(eps, t, lat), None

        lat, _ = jax.lax.scan(body, lat, s.timesteps)
        np.testing.assert_allclose(np.asarray(lat), np.asarray(x0), atol=1e-3)


class TestCccat:
    def test_six_to_sixteen(self):
        from neurons_tpu.pipelines.video import cccat_interpolate
        x = jnp.arange(6, dtype=jnp.float32)[None, :, None, None, None]
        x = jnp.broadcast_to(x, (2, 6, 3, 4, 4))
        out = cccat_interpolate(x, 16)
        assert out.shape == (2, 16, 3, 4, 4)
        vals = np.asarray(out[0, :, 0, 0, 0])
        # first three: 0, 1/3, 2/3; originals preserved in order
        np.testing.assert_allclose(vals[:4], [0, 1 / 3, 2 / 3, 1], atol=1e-5)
        np.testing.assert_allclose(vals[-1], 5, atol=1e-5)


@pytest.mark.slow
class TestStage5Pipeline:
    def test_end_to_end_tiny(self, rng):
        from neurons_tpu.models.vae import AutoencoderKL
        from neurons_tpu.models.sparse_controlnet import SparseControlNetModel
        from neurons_tpu.pipelines.video import reconstruct_video

        vcfg = VAEConfig(block_out_channels=(8, 8), layers_per_block=1,
                         norm_num_groups=4)
        vae = AutoencoderKL(vcfg)
        vparams = vae.init(rng, jnp.zeros((1, 3, 16, 16)))

        unet = UNet3DModel(U3, n_frames=F)
        x0 = jnp.zeros((2, 4, F, 8, 8))
        ctx0 = jnp.zeros((1, 5, 12))
        uparams = unet.init(rng, x0[:1], jnp.zeros((1,)), ctx0)

        cn = SparseControlNetModel(U3, n_frames=F)
        cparams = cn.init(jax.random.PRNGKey(3), x0[:1], jnp.zeros((1,)),
                          ctx0, jnp.zeros((1, 4, F, 8, 8)),
                          jnp.zeros((1, 1, F, 8, 8)))

        def unet_apply(p, x, t, ctx, down, mid):
            return unet.apply(p, x, t, ctx, down, mid)

        def cn_apply(p, x, t, ctx, cond, mask, scale):
            return cn.apply(p, x, t, ctx, cond, mask, scale)

        out = reconstruct_video(
            unet3d_apply=unet_apply, unet3d_params=uparams,
            controlnet_apply=cn_apply, controlnet_params=cparams,
            vae_encode_mode=lambda x: vae.apply(
                vparams, x, method=AutoencoderKL.encode).mode(),
            vae_decode=lambda z: vae.apply(
                vparams, z, method=AutoencoderKL.decode),
            key=jax.random.PRNGKey(4),
            blurry_video=jnp.zeros((1, 6, 3, 16, 16)) + 0.5,
            keyframe=jnp.zeros((1, 3, 16, 16)) + 0.5,
            text_embeddings=jax.random.normal(rng, (1, 5, 12)),
            uncond_embeddings=jnp.zeros((1, 5, 12)),
            num_steps=3, n_frames=F)
        assert out.video.shape == (1, F, 3, 16, 16)
        v = np.asarray(out.video)
        assert np.isfinite(v).all() and v.min() >= 0 and v.max() <= 1


@pytest.mark.slow
class TestVideoEncoderReuse:
    """Faster-Diffusion encoder propagation in the stage-5 DDIM loop."""

    def test_cached_forward_matches_full(self, rng):
        from neurons_tpu.config import UNet3DConfig
        from neurons_tpu.models.unet3d import UNet3DModel

        cfg = UNet3DConfig(block_out_channels=(8, 16), layers_per_block=1,
                           down_block_types=("CrossAttnDownBlock3D",
                                             "DownBlock3D"),
                           up_block_types=("UpBlock3D",
                                           "CrossAttnUpBlock3D"),
                           cross_attention_dim=12, attention_head_dim=4,
                           norm_num_groups=4, motion_num_attention_heads=2,
                           motion_max_seq_length=8)
        m = UNet3DModel(cfg, n_frames=2)
        x = jax.random.normal(rng, (1, 4, 2, 8, 8))
        t = jnp.ones((1,)) * 5
        ctx = jax.random.normal(jax.random.fold_in(rng, 1), (1, 5, 12))
        params = m.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
        out_full, cache = m.apply({"params": params}, x, t, ctx,
                                  return_cache=True)
        out_cached = m.apply({"params": params}, x, t, ctx, cached=cache)
        np.testing.assert_allclose(np.asarray(out_cached),
                                   np.asarray(out_full), rtol=1e-5,
                                   atol=1e-5)

    def test_reconstruct_video_reuse_runs(self, rng):
        from neurons_tpu.config import UNet3DConfig
        from neurons_tpu.models.unet3d import UNet3DModel
        from neurons_tpu.pipelines.video import reconstruct_video

        cfg = UNet3DConfig(block_out_channels=(8, 16), layers_per_block=1,
                           down_block_types=("CrossAttnDownBlock3D",
                                             "DownBlock3D"),
                           up_block_types=("UpBlock3D",
                                           "CrossAttnUpBlock3D"),
                           cross_attention_dim=12, attention_head_dim=4,
                           norm_num_groups=4, motion_num_attention_heads=2,
                           motion_max_seq_length=8)
        f = 4
        m = UNet3DModel(cfg, n_frames=f)
        x0 = jnp.zeros((1, 4, f, 2, 2))
        ctx0 = jnp.zeros((1, 5, 12))
        params = m.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,)),
                        ctx0)["params"]

        def unet_apply(p, x, t, c, down, mid, **kw):
            return m.apply({"params": p}, x, t, c, down, mid, **kw)

        def pool_encode(x):
            n, c, h, w = x.shape
            p = x.reshape(n, c, h // 8, 8, w // 8, 8).mean(axis=(3, 5))
            return jnp.concatenate([p, p[:, :1]], axis=1)

        out = reconstruct_video(
            unet3d_apply=unet_apply, unet3d_params=params,
            controlnet_apply=None, controlnet_params=None,
            vae_encode_mode=pool_encode,
            vae_decode=lambda z: jnp.zeros((z.shape[0], 3, 16, 16)),
            key=jax.random.PRNGKey(1),
            blurry_video=jnp.zeros((1, 6, 3, 16, 16)),
            keyframe=jnp.zeros((1, 3, 16, 16)),
            text_embeddings=jnp.zeros((1, 5, 12)),
            uncond_embeddings=jnp.zeros((1, 5, 12)),
            num_steps=4, n_frames=f, encoder_reuse=2)
        assert np.isfinite(np.asarray(out.latents)).all()


@pytest.mark.slow
class TestVideoTGate:
    """TGATE gating for the stage-5 DDIM loop (PAPERS.md, arXiv
    2404.02747): cross-attn residual capture/replay + CFG collapse."""

    def _setup(self, f=4):
        from neurons_tpu.config import UNet3DConfig
        from neurons_tpu.models.unet3d import UNet3DModel

        cfg = UNet3DConfig(block_out_channels=(8, 16), layers_per_block=1,
                           down_block_types=("CrossAttnDownBlock3D",
                                             "DownBlock3D"),
                           up_block_types=("UpBlock3D",
                                           "CrossAttnUpBlock3D"),
                           cross_attention_dim=12, attention_head_dim=4,
                           norm_num_groups=4, motion_num_attention_heads=2,
                           motion_max_seq_length=8)
        m = UNet3DModel(cfg, n_frames=f)
        x0 = jnp.zeros((1, 4, f, 8, 8))
        ctx0 = jnp.zeros((1, 5, 12))
        params = m.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,)),
                        ctx0)["params"]
        # conv_out is zero-init -> eps == 0 would hide any approximation;
        # randomize it so trajectories respond to the network
        params = dict(params)
        params["conv_out"] = {
            "kernel": jax.random.normal(
                jax.random.PRNGKey(7),
                params["conv_out"]["kernel"].shape) * 0.05,
            "bias": params["conv_out"]["bias"]}
        return m, params, cfg

    def test_capture_then_cached_matches_full(self, rng):
        m, params, cfg = self._setup(f=2)
        x = jax.random.normal(rng, (1, 4, 2, 8, 8))
        t = jnp.ones((1,)) * 5
        ctx = jax.random.normal(jax.random.fold_in(rng, 1), (1, 5, 12))
        base = m.apply({"params": params}, x, t, ctx)
        out_cap, xattn = m.apply({"params": params}, x, t, ctx,
                                 capture_xattn=True)
        np.testing.assert_allclose(np.asarray(out_cap), np.asarray(base),
                                   rtol=1e-5, atol=1e-5)
        out_cached = m.apply({"params": params}, x, t,
                             jnp.zeros_like(ctx), xattn_cached=xattn)
        np.testing.assert_allclose(np.asarray(out_cached), np.asarray(base),
                                   rtol=1e-5, atol=1e-5)

    def test_sites_helper_matches_params(self):
        from neurons_tpu.models.unet3d import video_cross_attn_sites

        m, params, cfg = self._setup(f=2)
        for name, depth in video_cross_attn_sites(cfg):
            assert name in params, name
            for j in range(depth):
                assert f"block_{j}_attn2" in {
                    k.rsplit("/", 0)[0] for k in params[name]} or \
                    f"block_{j}_attn2" in params[name], (name, j)

    def _run(self, m, params, cfg, f, **kw):
        from neurons_tpu.pipelines.video import reconstruct_video

        def unet_apply(p, x, t, c, down, mid, **k):
            return m.apply({"params": p}, x, t, c, down, mid, **k)

        def pool_encode(x):
            n, c, h, w = x.shape
            p = x.reshape(n, c, h // 2, 2, w // 2, 2).mean(axis=(3, 5))
            return jnp.concatenate([p, p[:, :1]], axis=1)

        return reconstruct_video(
            unet3d_apply=unet_apply, unet3d_params=params,
            controlnet_apply=None, controlnet_params=None,
            vae_encode_mode=pool_encode,
            vae_decode=lambda z: jnp.zeros((z.shape[0], 3, 16, 16)),
            key=jax.random.PRNGKey(1),
            blurry_video=jax.random.uniform(jax.random.PRNGKey(2),
                                            (1, 6, 3, 16, 16)),
            keyframe=jnp.zeros((1, 3, 16, 16)),
            text_embeddings=jax.random.normal(jax.random.PRNGKey(5),
                                              (1, 5, 12)),
            uncond_embeddings=jnp.zeros((1, 5, 12)),
            num_steps=4, n_frames=f, **kw)

    def test_tgate_full_gate_equals_exact_and_early_gate_runs(self):
        m, params, cfg = self._setup()
        base = self._run(m, params, cfg, 4)
        full_gate = self._run(m, params, cfg, 4, tgate_step=4)
        np.testing.assert_allclose(np.asarray(full_gate.latents),
                                   np.asarray(base.latents),
                                   rtol=1e-4, atol=1e-4)
        fast = self._run(m, params, cfg, 4, tgate_step=2)
        l = np.asarray(fast.latents)
        assert np.isfinite(l).all()
        assert not np.allclose(l, np.asarray(base.latents))

    def test_tgate_excludes_encoder_reuse(self):
        m, params, cfg = self._setup()
        with pytest.raises(ValueError):
            self._run(m, params, cfg, 4, tgate_step=2, encoder_reuse=2)


@pytest.mark.slow
class TestVideoTGateControlnet:
    def test_tgate_with_controlnet_residual_freeze(self, rng):
        """TGATE with SparseCtrl: the gated phase reuses half-averaged
        controlnet residuals and skips the controlnet entirely."""
        from neurons_tpu.models.sparse_controlnet import SparseControlNetModel
        from neurons_tpu.pipelines.video import reconstruct_video

        unet = UNet3DModel(U3, n_frames=F)
        x0 = jnp.zeros((1, 4, F, 8, 8))
        ctx0 = jnp.zeros((1, 5, 12))
        uparams = unet.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,)),
                            ctx0)
        uparams = {"params": dict(uparams["params"])}
        uparams["params"]["conv_out"] = {
            "kernel": jax.random.normal(
                jax.random.PRNGKey(7),
                uparams["params"]["conv_out"]["kernel"].shape) * 0.05,
            "bias": uparams["params"]["conv_out"]["bias"]}

        cn = SparseControlNetModel(U3, n_frames=F)
        cparams = cn.init(jax.random.PRNGKey(3), x0, jnp.zeros((1,)),
                          ctx0, jnp.zeros((1, 4, F, 8, 8)),
                          jnp.zeros((1, 1, F, 8, 8)))

        def pool_encode(x):
            n, c, h, w = x.shape
            p = x.reshape(n, c, h // 2, 2, w // 2, 2).mean(axis=(3, 5))
            return jnp.concatenate([p, p[:, :1]], axis=1)

        common = dict(
            unet3d_apply=lambda p, x, t, c, down, mid, **k:
                unet.apply(p, x, t, c, down, mid, **k),
            unet3d_params=uparams,
            controlnet_apply=lambda p, x, t, c, cond, mask, s:
                cn.apply(p, x, t, c, cond, mask, s),
            controlnet_params=cparams,
            vae_encode_mode=pool_encode,
            vae_decode=lambda z: jnp.zeros((z.shape[0], 3, 16, 16)),
            key=jax.random.PRNGKey(4),
            blurry_video=jax.random.uniform(jax.random.PRNGKey(2),
                                            (1, 6, 3, 16, 16)),
            keyframe=jnp.full((1, 3, 16, 16), 0.5),
            text_embeddings=jax.random.normal(jax.random.PRNGKey(5),
                                              (1, 5, 12)),
            uncond_embeddings=jnp.zeros((1, 5, 12)),
            num_steps=4, n_frames=F)
        base = reconstruct_video(**common)
        full_gate = reconstruct_video(**common, tgate_step=4)
        np.testing.assert_allclose(np.asarray(full_gate.latents),
                                   np.asarray(base.latents),
                                   rtol=1e-4, atol=1e-4)
        fast = reconstruct_video(**common, tgate_step=2)
        assert np.isfinite(np.asarray(fast.latents)).all()


@pytest.mark.slow
class TestVideoPAB:
    def test_pab_identity_and_fast_paths(self, rng):
        """PAB (arXiv 2408.12588): with intervals (1,1,1) every step
        recomputes everything -> identical to the exact path; wider
        nested intervals run finite and close on a short trajectory."""
        from neurons_tpu.models.sparse_controlnet import SparseControlNetModel
        from neurons_tpu.pipelines.video import reconstruct_video

        unet = UNet3DModel(U3, n_frames=F)
        x0 = jnp.zeros((1, 4, F, 8, 8))
        ctx0 = jnp.zeros((1, 5, 12))
        uparams = unet.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,)),
                            ctx0)
        # randomize the zero-init output conv so eps is non-trivial
        # (otherwise every sampler path matches vacuously)
        uparams = {"params": dict(uparams["params"])}
        uparams["params"]["conv_out"] = {
            "kernel": jax.random.normal(
                jax.random.PRNGKey(7),
                uparams["params"]["conv_out"]["kernel"].shape) * 0.05,
            "bias": uparams["params"]["conv_out"]["bias"]}
        cn = SparseControlNetModel(U3, n_frames=F)
        cparams = cn.init(jax.random.PRNGKey(3), x0, jnp.zeros((1,)),
                          ctx0, jnp.zeros((1, 4, F, 8, 8)),
                          jnp.zeros((1, 1, F, 8, 8)))

        def pool_encode(x):
            n, c, h, w = x.shape
            p = x.reshape(n, c, h // 2, 2, w // 2, 2).mean(axis=(3, 5))
            return jnp.concatenate([p, p[:, :1]], axis=1)

        common = dict(
            unet3d_apply=lambda p, x, t, c, down, mid, **k:
                unet.apply(p, x, t, c, down, mid, **k),
            unet3d_params=uparams,
            controlnet_apply=lambda p, x, t, c, cond, mask, s:
                cn.apply(p, x, t, c, cond, mask, s),
            controlnet_params=cparams,
            vae_encode_mode=pool_encode,
            vae_decode=lambda z: jnp.zeros((z.shape[0], 3, 16, 16)),
            key=jax.random.PRNGKey(4),
            blurry_video=jax.random.uniform(jax.random.PRNGKey(2),
                                            (1, 6, 3, 16, 16)),
            keyframe=jnp.full((1, 3, 16, 16), 0.5),
            text_embeddings=jax.random.normal(jax.random.PRNGKey(5),
                                              (1, 5, 12)),
            uncond_embeddings=jnp.zeros((1, 5, 12)),
            num_steps=4, n_frames=F)
        base = reconstruct_video(**common)
        exact = reconstruct_video(**common, pab=(1, 1, 1))
        np.testing.assert_allclose(np.asarray(exact.latents),
                                   np.asarray(base.latents),
                                   rtol=1e-5, atol=1e-5)
        fast = reconstruct_video(**common, pab=(1, 2, 4))
        assert np.isfinite(np.asarray(fast.latents)).all()
        # broadcasting must actually take effect (diverge from exact)
        assert not np.allclose(np.asarray(fast.latents),
                               np.asarray(base.latents), atol=1e-6)
        # the broadcast range: full compute everywhere == exact
        ranged = reconstruct_video(**common, pab=(1, 2, 4),
                                   pab_range=(4, 4))
        np.testing.assert_allclose(np.asarray(ranged.latents),
                                   np.asarray(base.latents),
                                   rtol=1e-5, atol=1e-5)

    def test_pab_interval_nesting_enforced(self, rng):
        from neurons_tpu.pipelines.video import reconstruct_video
        with pytest.raises(ValueError):
            reconstruct_video(
                unet3d_apply=None, unet3d_params=None,
                controlnet_apply=None, controlnet_params=None,
                vae_encode_mode=lambda x: jnp.zeros(
                    (x.shape[0], 4, 8, 8)),
                vae_decode=None, key=jax.random.PRNGKey(0),
                blurry_video=jnp.zeros((1, 6, 3, 16, 16)),
                keyframe=jnp.zeros((1, 3, 16, 16)),
                text_embeddings=jnp.zeros((1, 5, 12)),
                uncond_embeddings=jnp.zeros((1, 5, 12)),
                num_steps=4, n_frames=F, pab=(2, 3, 5))


@pytest.mark.slow
class TestTGatePABComposition:
    def test_tgate_pab_runs_and_tracks_tgate(self, rng):
        """TGATE x PAB (spatial+temporal broadcast inside the gated
        phase): finite, close to plain TGATE, and actually diverges."""
        from neurons_tpu.models.sparse_controlnet import SparseControlNetModel
        from neurons_tpu.pipelines.video import reconstruct_video

        unet = UNet3DModel(U3, n_frames=F)
        x0 = jnp.zeros((1, 4, F, 8, 8))
        ctx0 = jnp.zeros((1, 5, 12))
        uparams = unet.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,)),
                            ctx0)
        uparams = {"params": dict(uparams["params"])}
        uparams["params"]["conv_out"] = {
            "kernel": jax.random.normal(
                jax.random.PRNGKey(7),
                uparams["params"]["conv_out"]["kernel"].shape) * 0.05,
            "bias": uparams["params"]["conv_out"]["bias"]}
        cn = SparseControlNetModel(U3, n_frames=F)
        cparams = cn.init(jax.random.PRNGKey(3), x0, jnp.zeros((1,)),
                          ctx0, jnp.zeros((1, 4, F, 8, 8)),
                          jnp.zeros((1, 1, F, 8, 8)))

        def pool_encode(x):
            n, c, h, w = x.shape
            p = x.reshape(n, c, h // 2, 2, w // 2, 2).mean(axis=(3, 5))
            return jnp.concatenate([p, p[:, :1]], axis=1)

        common = dict(
            unet3d_apply=lambda p, x, t, c, down, mid, **k:
                unet.apply(p, x, t, c, down, mid, **k),
            unet3d_params=uparams,
            controlnet_apply=lambda p, x, t, c, cond, mask, s:
                cn.apply(p, x, t, c, cond, mask, s),
            controlnet_params=cparams,
            vae_encode_mode=pool_encode,
            vae_decode=lambda z: jnp.zeros((z.shape[0], 3, 16, 16)),
            key=jax.random.PRNGKey(4),
            blurry_video=jax.random.uniform(jax.random.PRNGKey(2),
                                            (1, 6, 3, 16, 16)),
            keyframe=jnp.full((1, 3, 16, 16), 0.5),
            text_embeddings=jax.random.normal(jax.random.PRNGKey(5),
                                              (1, 5, 12)),
            uncond_embeddings=jnp.zeros((1, 5, 12)),
            num_steps=6, n_frames=F)
        tg = reconstruct_video(**common, tgate_step=2)
        combo = reconstruct_video(**common, tgate_step=2, tgate_pab=2)
        a, bb = np.asarray(tg.latents), np.asarray(combo.latents)
        assert np.isfinite(bb).all()
        assert not np.allclose(a, bb, atol=1e-7)  # broadcast took effect
        corr = np.corrcoef(a.ravel(), bb.ravel())[0, 1]
        assert corr > 0.95, corr
