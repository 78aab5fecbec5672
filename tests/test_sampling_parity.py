"""Trajectory-level golden parity for the unCLIP sampling stack
(SURVEY.md hard part #2): torch replica of the sgm numerics —
LegacyDDPM sigma table, DiscreteDenoiser eps-preconditioning with
sigma-quantization, VanillaCFG doubling, EulerEDM loop with the
sqrt(1+sigma_0^2) init scaling — stepped against our
DiscreteDenoiser + make_cfg_denoiser + sample_euler with the SAME tiny
UNet weights. Catches any drift in preconditioning, CFG batching, or
ladder conventions that per-module tests cannot see."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from neurons_tpu.config import UNet2DConfig
from neurons_tpu.diffusion.denoiser import DiscreteDenoiser
from neurons_tpu.diffusion.samplers import make_cfg_denoiser, sample_euler
from neurons_tpu.diffusion.schedule import sd_sigmas
from neurons_tpu.interop.torch_import import import_ldm_unet
from neurons_tpu.models.unet2d import UNetModel

from test_importers_structural import TINY_UNET, TLDMUNet


def _torch_sigma_table(n=1000, beta_start=0.00085, beta_end=0.012):
    betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5, n) ** 2
    abar = np.cumprod(1 - betas)
    return torch.tensor(np.sqrt((1 - abar) / abar), dtype=torch.float64)


class TorchDiscreteEps:
    """sgm DiscreteDenoiser + EpsScaling (denoiser.py:42-75)."""

    def __init__(self):
        self.sigmas = _torch_sigma_table().float()

    def idx(self, sigma):
        return torch.argmin((sigma[:, None] - self.sigmas[None]).abs(),
                            dim=1)

    def __call__(self, net, x, sigma, ctx, y):
        idx = self.idx(sigma)
        sq = self.sigmas[idx].reshape(-1, 1, 1, 1)
        c_in = 1.0 / torch.sqrt(sq ** 2 + 1.0)
        out = net(x * c_in, idx.float(), ctx, y)
        return out * (-sq) + x


def torch_euler_cfg(net, den, x, sigmas, ctx, uc_ctx, y, scale):
    x = x * torch.sqrt(1.0 + sigmas[0] ** 2)
    for i in range(len(sigmas) - 1):
        s = torch.full((x.shape[0],), sigmas[i])
        x2 = torch.cat([x, x])
        s2 = torch.cat([s, s])
        c2 = torch.cat([uc_ctx, ctx])
        y2 = torch.cat([y, y])
        d = den(net, x2, s2, c2, y2)
        d_u, d_c = d.chunk(2)
        denoised = d_u + scale * (d_c - d_u)
        dd = (x - denoised) / max(float(sigmas[i]), 1e-9)
        x = x + (sigmas[i + 1] - sigmas[i]) * dd
    return x


class TestEulerEDMTrajectoryParity:
    def test_six_step_cfg_trajectory_matches(self):
        torch.manual_seed(0)
        tm = TLDMUNet(TINY_UNET).eval()
        params, unused = import_ldm_unet(tm.state_dict(), TINY_UNET)
        assert unused == []
        jm = UNetModel(TINY_UNET)

        rs = np.random.RandomState(0)
        x0 = rs.randn(2, 4, 8, 8).astype(np.float32)
        ctx = rs.randn(2, 5, 12).astype(np.float32)
        uc_ctx = rs.randn(2, 5, 12).astype(np.float32)
        y = rs.randn(2, 6).astype(np.float32)
        n_steps, cfg_scale = 6, 5.0

        sig_np = np.asarray(sd_sigmas(n_steps))
        with torch.no_grad():
            ref = torch_euler_cfg(
                lambda x, t, c, yy: tm(x, t, c, yy),
                TorchDiscreteEps(), torch.tensor(x0),
                torch.tensor(sig_np), torch.tensor(ctx),
                torch.tensor(uc_ctx), torch.tensor(y), cfg_scale).numpy()

        den = DiscreteDenoiser.create_sd()
        network = lambda x, t, context=None, yv=None: jm.apply(
            {"params": params}, x, t, context, yv)
        denoise = make_cfg_denoiser(
            lambda net, x, s, **c: den(net, x, s, **c), network,
            cond={"context": jnp.asarray(ctx), "yv": jnp.asarray(y)},
            uc={"context": jnp.asarray(uc_ctx), "yv": jnp.asarray(y)},
            scale=cfg_scale)
        got = sample_euler(denoise, jnp.asarray(x0),
                           jnp.asarray(sig_np), prepare=True)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3,
                                   atol=2e-3)
