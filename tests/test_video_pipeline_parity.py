"""Stage-5 trajectory parity: torch replica of the NeuroclipsPipeline
numerics (DDIM ladder + partial-noise init at timesteps[0] + SparseCtrl
residuals + CFG 8.5, reference pipeline_neuroclips.py:408-489) stepped
against pipelines.video.reconstruct_video with the SAME UNet3D/controlnet
weights and noise. The VAE is replaced by a shared deterministic
pool-encoder so the test isolates the sampling numerics."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from neurons_tpu.interop.torch_import import (import_animatediff_unet3d,
                                              import_motion_modules,
                                              import_sparse_controlnet,
                                              filter_motion_module)
from neurons_tpu.models.sparse_controlnet import SparseControlNetModel
from neurons_tpu.models.unet3d import UNet3DModel
from neurons_tpu.pipelines.video import cccat_interpolate, reconstruct_video

from test_importers_structural import (TINY_3D, TDiffusersUNet3D,
                                       TSparseControlNet)

N_FRAMES, STEPS, HW = 4, 5, 16
LAT_HW = HW // 8


def pool_encode(x):
    """Shared fake VAE encoder: 8x average pool, 3->4 channels by
    repeating the first. x [N, 3, H, W] -> [N, 4, H/8, W/8]."""
    n, c, h, w = x.shape
    p = x.reshape(n, c, h // 8, 8, w // 8, 8).mean(axis=(3, 5))
    return np.concatenate([p, p[:, :1]], axis=1)


def _ddim_tables(num_steps, n_train=1000):
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, n_train) ** 2
    abar = np.cumprod(1 - betas)
    ratio = n_train // num_steps
    ts = (np.arange(num_steps) * ratio).round()[::-1].astype(np.int64) + 1
    return abar, ts


def torch_neuroclips_loop(unet, cn, latents, noise, cond, mask, text, uc,
                          num_steps, scale, low_strength, cn_scale):
    abar, ts = _ddim_tables(num_steps)
    # partial-noise init at timesteps[0] (reference :410-423)
    t0 = ts[0]
    latents = np.sqrt(abar[t0]) * latents + np.sqrt(1 - abar[t0]) * noise
    x = torch.tensor(latents, dtype=torch.float32)
    text2 = torch.cat([torch.tensor(uc), torch.tensor(text)])
    cond2 = torch.cat([torch.tensor(cond)] * 2)
    mask2 = torch.cat([torch.tensor(mask)] * 2)
    ratio = 1000 // num_steps
    with torch.no_grad():
        for t in ts:
            x2 = torch.cat([x, x])
            t2 = torch.full((x2.shape[0],), float(t))
            down, mid = cn(x2, t2, text2, cond2, mask2, scale=cn_scale)
            eps = unet(x2, t2, text2, down_res=down, mid_res=mid)
            e_u, e_c = eps.chunk(2)
            eps = e_u + scale * (e_c - e_u)
            prev_t = t - ratio
            a_t = abar[t]
            a_prev = abar[prev_t] if prev_t >= 0 else 1.0
            x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
            x = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
    return x.numpy()


class TorchUNet3DWithResiduals(TDiffusersUNet3D):
    """TDiffusersUNet3D + controlnet residual injection (reference
    unet.py:422-439: residuals add to the skip list and mid)."""

    def forward(self, sample, t, ctx, down_res=None, mid_res=None):
        cfg = self.cfg
        b, _, f, hh, ww = sample.shape
        h = sample.permute(0, 2, 1, 3, 4).reshape(b * f, -1, hh, ww)
        import torch.nn.functional as tF
        from test_importers_structural import t_timestep_embedding
        temb = self.time_embedding.linear_2(tF.silu(
            self.time_embedding.linear_1(
                t_timestep_embedding(t, cfg.block_out_channels[0]))))
        temb_f = temb.repeat_interleave(f, dim=0)
        ctx_f = ctx.repeat_interleave(f, dim=0)
        h = self.conv_in(h)
        hs = [h]
        for blk in self.down_blocks:
            for j, res in enumerate(blk.resnets):
                h = res(h, temb_f)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx_f)
                h = blk.motion_modules[j](h, b, f)
                hs.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(h)
                hs.append(h)
        h = self.mid_block.resnets[0](h, temb_f)
        h = self.mid_block.attentions[0](h, ctx_f)
        h = self.mid_block.resnets[1](h, temb_f)
        if down_res is not None:
            hs = [s + r for s, r in zip(hs, down_res)]
        if mid_res is not None:
            h = h + mid_res
        for blk in self.up_blocks:
            for j, res in enumerate(blk.resnets):
                h = torch.cat([h, hs.pop()], dim=1)
                h = res(h, temb_f)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx_f)
                h = blk.motion_modules[j](h, b, f)
            if hasattr(blk, "upsamplers"):
                import torch.nn.functional as tF
                h = blk.upsamplers[0].conv(
                    tF.interpolate(h, scale_factor=2, mode="nearest"))
        import torch.nn.functional as tF
        h = self.conv_out(tF.silu(self.conv_norm_out(h)))
        return h.reshape(b, f, -1, h.shape[2], h.shape[3]).permute(
            0, 2, 1, 3, 4)


class TorchSparseCtrlNCHW(TSparseControlNet):
    """Fold the NHWC residual convention difference: returns residuals in
    the folded NCHW layout the torch UNet consumes."""

    def forward(self, x, t, ctx, cond, mask, scale):
        down, mid = super().forward(x, t, ctx, cond, mask, scale)
        return down, mid


class TestStage5TrajectoryParity:
    def test_ddim_cfg_controlnet_trajectory_matches(self):
        torch.manual_seed(0)
        tm = TorchUNet3DWithResiduals(TINY_3D).eval()
        tc = TorchSparseCtrlNCHW(TINY_3D).eval()

        sd = tm.state_dict()
        spatial = {k: v for k, v in sd.items() if "motion_modules." not in k}
        uparams, u1 = import_animatediff_unet3d(spatial, TINY_3D)
        uparams, u2 = import_motion_modules(filter_motion_module(sd),
                                            TINY_3D, uparams)
        cparams, u3 = import_sparse_controlnet(tc.state_dict(), TINY_3D)
        assert u1 == [] and u2 == [] and u3 == []

        junet = UNet3DModel(TINY_3D, n_frames=N_FRAMES)
        jcn = SparseControlNetModel(TINY_3D, n_frames=N_FRAMES)

        rs = np.random.RandomState(0)
        blurry = rs.rand(1, 6, 3, HW, HW).astype(np.float32)
        keyframe = rs.rand(1, 3, HW, HW).astype(np.float32)
        text = rs.randn(1, 5, TINY_3D.cross_attention_dim).astype(
            np.float32) * 0.1
        uc = np.zeros_like(text)

        # shared inputs: interpolated motion, latents, noise, cond
        motion = np.asarray(cccat_interpolate(jnp.asarray(blurry), N_FRAMES))
        flat = motion.reshape(-1, 3, HW, HW)
        lat = pool_encode(2 * flat - 1) * 0.18215
        latents = lat.reshape(1, N_FRAMES, 4, LAT_HW, LAT_HW).transpose(
            0, 2, 1, 3, 4)
        key = jax.random.PRNGKey(7)
        noise = np.asarray(jax.random.normal(key, latents.shape, jnp.float32))
        key_lat = pool_encode(2 * keyframe - 1) * 0.18215
        cond = np.zeros((1, 4, N_FRAMES, LAT_HW, LAT_HW), np.float32)
        cond[:, :, 0] = key_lat
        mask = np.zeros((1, 1, N_FRAMES, LAT_HW, LAT_HW), np.float32)
        mask[:, :, 0] = 1.0

        ref = torch_neuroclips_loop(tm, tc, latents, noise, cond, mask,
                                    text, uc, STEPS, 8.5, 0.3, 1.0)

        # our residuals are folded NHWC; adapt at the pipeline boundary
        def cn_apply(p, x, t, ctx, c, m, s):
            down, mid = jcn.apply({"params": p}, x, t, ctx, c, m, s)
            down = tuple(d.transpose(0, 3, 1, 2) for d in down)
            return down, mid.transpose(0, 3, 1, 2)

        def unet_apply(p, x, t, ctx, down, mid):
            # convert folded-NCHW residuals back to folded-NHWC for our
            # UNet3D (which tracks skips in NHWC)
            if down is not None:
                down = tuple(d.transpose(0, 2, 3, 1) for d in down)
            if mid is not None:
                mid = mid.transpose(0, 2, 3, 1)
            return junet.apply({"params": p}, x, t, ctx, down, mid)

        out = reconstruct_video(
            unet3d_apply=unet_apply, unet3d_params=uparams,
            controlnet_apply=cn_apply, controlnet_params=cparams,
            vae_encode_mode=lambda x: jnp.asarray(pool_encode(
                np.asarray(x))),
            vae_decode=lambda z: jnp.zeros((z.shape[0], 3, HW, HW)),
            key=key, blurry_video=jnp.asarray(blurry),
            keyframe=jnp.asarray(keyframe),
            text_embeddings=jnp.asarray(text),
            uncond_embeddings=jnp.asarray(uc),
            num_steps=STEPS, n_frames=N_FRAMES)
        np.testing.assert_allclose(np.asarray(out.latents), ref, rtol=3e-3,
                                   atol=3e-3)
