"""Golden parity for the SVD video stack (VideoUNet + temporal VAE decoder).

Builds key-exact tiny torch replicas of the reference's sgm SVD modules
(reference generative_models/sgm/modules/diffusionmodules/video_model.py,
sgm/modules/video_attention.py, sgm/modules/autoencoding/temporal_ae.py,
AlphaBlender at sgm/modules/diffusionmodules/util.py:312-369), imports
their state dicts through interop.torch_import, and checks forward
agreement with the flax modules.
"""

import math

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from neurons_tpu.config import VAEConfig, VideoDecoderConfig, VideoUNetConfig
from neurons_tpu.interop import torch_import as TI

import pytest

from test_importers_structural import (TVAttn, TVResnet, TVUp, TAttn,
                                       TBasicBlock, TDownsample, TResBlock,
                                       TUpsample, t_feedforward,
                                       t_timestep_embedding)

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# torch fixtures
# ---------------------------------------------------------------------------

class TAlphaBlender(tnn.Module):
    """reference sgm/modules/diffusionmodules/util.py:312-369."""

    def __init__(self, strategy, alpha, pattern="video"):
        super().__init__()
        self.strategy = strategy
        self.pattern = pattern
        if strategy == "fixed":
            self.register_buffer("mix_factor", torch.tensor([alpha]))
        else:
            self.mix_factor = tnn.Parameter(torch.tensor([alpha]))

    def get_alpha(self, ioi):
        if self.strategy == "fixed":
            return self.mix_factor
        if self.strategy == "learned":
            return torch.sigmoid(self.mix_factor)
        # learned_with_images: ioi [B, T]
        alpha = torch.where(ioi.bool(), torch.ones(1, 1),
                            torch.sigmoid(self.mix_factor)[..., None])
        if self.pattern == "video":  # b t -> b 1 t 1 1 (NCTHW)
            return alpha[:, None, :, None, None]
        return alpha.reshape(-1)[:, None, None]  # b t -> (b t) 1 1

    def forward(self, xs, xt, ioi=None):
        a = self.get_alpha(ioi)
        return a * xs + (1.0 - a) * xt


class TTemporalRes(tnn.Module):
    """openaimodel ResBlock with dims=3 (the `time_stack`); NCTHW."""

    def __init__(self, c, emb_dim, g, kernel):
        super().__init__()
        pad = tuple(k // 2 for k in kernel)
        self.in_layers = tnn.Sequential(
            tnn.GroupNorm(g, c), tnn.SiLU(),
            tnn.Conv3d(c, c, kernel, padding=pad))
        if emb_dim:
            self.emb_layers = tnn.Sequential(tnn.SiLU(),
                                             tnn.Linear(emb_dim, c))
        self.out_layers = tnn.Sequential(
            tnn.GroupNorm(g, c), tnn.SiLU(), tnn.Identity(),
            tnn.Conv3d(c, c, kernel, padding=pad))

    def forward(self, x, emb=None):
        h = self.in_layers(x)
        if emb is not None:
            # exchange_temb_dims: emb [B, T, E] -> [B, C, T, 1, 1]
            e = self.emb_layers(emb)
            h = h + e.permute(0, 2, 1)[..., None, None]
        return x + self.out_layers(h)


class TVideoRes(TResBlock):
    """reference video_model.py:12-81 (spatial keys at the root)."""

    def __init__(self, cin, cout, emb_dim, g, kernel, strategy, alpha):
        super().__init__(cin, cout, emb_dim, g)
        self.time_stack = TTemporalRes(cout, emb_dim, g, kernel)
        self.time_mixer = TAlphaBlender(strategy, alpha, "video")

    def forward(self, x, emb, t, ioi):
        x = super().forward(x, emb)
        b = x.shape[0] // t
        xv = x.reshape(b, t, *x.shape[1:]).permute(0, 2, 1, 3, 4)  # NCTHW
        xt = self.time_stack(xv, emb.reshape(b, t, -1))
        xv = self.time_mixer(xv, xt, ioi)
        return xv.permute(0, 2, 1, 3, 4).reshape(x.shape)


class TVideoTBlock(tnn.Module):
    """reference video_attention.py:15-143."""

    def __init__(self, dim, heads, dh, ctx_dim=None, ff_in=False):
        super().__init__()
        if ff_in:
            self.norm_in = tnn.LayerNorm(dim)
            self.ff_in = tnn.Module()
            self.ff_in.net = t_feedforward(dim)
        self.has_ff_in = ff_in
        self.attn1 = TAttn(dim, dim, heads, dh)
        self.norm1 = tnn.LayerNorm(dim)
        self.attn2 = TAttn(dim, ctx_dim or dim, heads, dh)
        self.norm2 = tnn.LayerNorm(dim)
        self.ff = tnn.Module()
        self.ff.net = t_feedforward(dim)
        self.norm3 = tnn.LayerNorm(dim)

    def forward(self, x, context, t):
        b_s, _, c = x.shape
        if self.has_ff_in:
            x = self.ff_in.net(self.norm_in(x)) + x
        x = self.attn1(self.norm1(x)) + x
        x = self.attn2(self.norm2(x), context) + x
        return self.ff.net(self.norm3(x)) + x


class TSpatialVideo(tnn.Module):
    """reference video_attention.py:146-301 (use_linear, spatial ctx)."""

    def __init__(self, c, ctx_dim, heads, dh, depth, g, strategy, alpha,
                 ff_in):
        super().__init__()
        self.norm = tnn.GroupNorm(g, c, eps=1e-6)
        self.proj_in = tnn.Linear(c, c)
        self.transformer_blocks = tnn.ModuleList(
            [TBasicBlock(c, ctx_dim, heads, dh) for _ in range(depth)])
        self.time_stack = tnn.ModuleList(
            [TVideoTBlock(c, heads, dh, ctx_dim, ff_in)
             for _ in range(depth)])
        ted = c * 4
        self.time_pos_embed = tnn.Sequential(
            tnn.Linear(c, ted), tnn.SiLU(), tnn.Linear(ted, c))
        self.time_mixer = TAlphaBlender(strategy, alpha, "seq")
        self.proj_out = tnn.Linear(c, c)
        self.c = c

    def forward(self, x, context, t, ioi):
        b_t, c, hh, ww = x.shape
        s = hh * ww
        b = b_t // t
        x_in = x
        time_context = context[::t].repeat_interleave(s, dim=0)
        h = self.norm(x).permute(0, 2, 3, 1).reshape(b_t, s, c)
        h = self.proj_in(h)
        frames = torch.arange(t).repeat(b)
        emb = self.time_pos_embed(t_timestep_embedding(frames, self.c))
        emb = emb[:, None, :]
        for blk, mix_blk in zip(self.transformer_blocks, self.time_stack):
            h = blk(h, context)
            mix = h + emb
            mix = mix.reshape(b, t, s, c).permute(0, 2, 1, 3) \
                .reshape(b * s, t, c)
            mix = mix_blk(mix, time_context, t)
            mix = mix.reshape(b, s, t, c).permute(0, 2, 1, 3) \
                .reshape(b_t, s, c)
            h = self.time_mixer(h, mix, ioi)
        h = self.proj_out(h)
        return x_in + h.reshape(b_t, hh, ww, c).permute(0, 3, 1, 2)


class TVideoUNet(tnn.Module):
    """Key-exact mini replica of reference video_model.py:84-493."""

    def __init__(self, cfg: VideoUNetConfig):
        super().__init__()
        self.cfg = cfg
        mc = cfg.model_channels
        g = 32 if mc % 32 == 0 else mc
        ted = mc * 4
        heads_of = lambda ch: ch // cfg.num_head_channels
        dh = cfg.num_head_channels
        kern = tuple(cfg.video_kernel_size)
        strat, alpha = cfg.merge_strategy, cfg.merge_factor
        ffi = cfg.extra_ff_mix_layer
        self.time_embed = tnn.Sequential(tnn.Linear(mc, ted), tnn.SiLU(),
                                         tnn.Linear(ted, ted))
        self.label_emb = tnn.Sequential(tnn.Sequential(
            tnn.Linear(cfg.adm_in_channels, ted), tnn.SiLU(),
            tnn.Linear(ted, ted)))

        def vres(cin, cout):
            return TVideoRes(cin, cout, ted, g, kern, strat, alpha)

        def vattn(ch, depth):
            return TSpatialVideo(ch, cfg.context_dim, heads_of(ch), dh,
                                 depth, g, strat, alpha, ffi)

        blocks = [tnn.ModuleList([tnn.Conv2d(cfg.in_channels, mc, 3,
                                             padding=1)])]
        ch, ds = mc, 1
        for level, mult in enumerate(cfg.channel_mult):
            out = mc * mult
            for _ in range(cfg.num_res_blocks):
                layers = [vres(ch, out)]
                ch = out
                if ds in cfg.attention_resolutions:
                    layers.append(vattn(ch, cfg.transformer_depth[level]))
                blocks.append(tnn.ModuleList(layers))
            if level != len(cfg.channel_mult) - 1:
                blocks.append(tnn.ModuleList([TDownsample(ch)]))
                ds *= 2
        self.input_blocks = tnn.ModuleList(blocks)
        self.middle_block = tnn.ModuleList([
            vres(ch, ch), vattn(ch, cfg.transformer_depth[-1]),
            vres(ch, ch)])
        skips = self._skip_channels()
        out_blocks = []
        for level in reversed(range(len(cfg.channel_mult))):
            out = mc * cfg.channel_mult[level]
            for i in range(cfg.num_res_blocks + 1):
                layers = [vres(ch + skips.pop(), out)]
                ch = out
                if ds in cfg.attention_resolutions:
                    layers.append(vattn(ch, cfg.transformer_depth[level]))
                if level and i == cfg.num_res_blocks:
                    layers.append(TUpsample(ch))
                    ds //= 2
                out_blocks.append(tnn.ModuleList(layers))
        self.output_blocks = tnn.ModuleList(out_blocks)
        self.out = tnn.Sequential(tnn.GroupNorm(g, mc), tnn.SiLU(),
                                  tnn.Conv2d(mc, cfg.out_channels, 3,
                                             padding=1))

    def _skip_channels(self):
        cfg, mc = self.cfg, self.cfg.model_channels
        chs, ch = [mc], mc
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                ch = mc * mult
                chs.append(ch)
            if level != len(cfg.channel_mult) - 1:
                chs.append(ch)
        return chs

    def forward(self, x, t, context, y, num_frames, ioi):
        emb = self.time_embed(t_timestep_embedding(
            t, self.cfg.model_channels)) + self.label_emb(y)
        hs, h = [], x

        def run(blk, h):
            for layer in blk:
                if isinstance(layer, TVideoRes):
                    h = layer(h, emb, num_frames, ioi)
                elif isinstance(layer, TSpatialVideo):
                    h = layer(h, context, num_frames, ioi)
                else:
                    h = layer(h)
            return h

        for blk in self.input_blocks:
            h = run(blk, h)
            hs.append(h)
        h = run(self.middle_block, h)
        for blk in self.output_blocks:
            h = run(blk, torch.cat([h, hs.pop()], dim=1))
        return self.out(h)


# ---------------------------------------------------------------------------
# VideoUNet parity
# ---------------------------------------------------------------------------

TINY_SVD = VideoUNetConfig(in_channels=4, out_channels=4, model_channels=8,
                           channel_mult=(1, 2), num_res_blocks=1,
                           attention_resolutions=(2,),
                           transformer_depth=(1, 1), num_head_channels=4,
                           context_dim=12, adm_in_channels=6,
                           video_kernel_size=(3, 1, 1))


@pytest.mark.slow
class TestVideoUNetParity:
    def test_forward_matches(self):
        from neurons_tpu.models.video_unet import VideoUNet

        tm = TVideoUNet(TINY_SVD).eval()
        params, unused = TI.import_svd_unet(tm.state_dict(), TINY_SVD)
        assert unused == [], unused

        B, T = 2, 3
        rng = np.random.RandomState(0)
        x = rng.randn(B * T, 4, 8, 8).astype(np.float32)
        t = np.linspace(3.0, 40.0, B * T).astype(np.float32)
        ctx = rng.randn(B * T, 5, 12).astype(np.float32)
        y = rng.randn(B * T, 6).astype(np.float32)
        # mixed indicator exercises the learned_with_images where()
        ioi = np.array([[0, 0, 1], [0, 0, 0]], np.float32)

        with torch.no_grad():
            ref = tm(torch.tensor(x), torch.tensor(t), torch.tensor(ctx),
                     torch.tensor(y), T, torch.tensor(ioi)).numpy()
        jm = VideoUNet(TINY_SVD)
        got = jm.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                       jnp.asarray(ctx), jnp.asarray(y), num_frames=T,
                       image_only_indicator=jnp.asarray(ioi))
        np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-4, atol=3e-4)


# ---------------------------------------------------------------------------
# Temporal VAE decoder fixtures + parity
# ---------------------------------------------------------------------------

class TVVideoRes(TVResnet):
    """reference temporal_ae.py:18-83 (emb-free time stack, scalar mix)."""

    def __init__(self, cin, cout, g, kernel, strategy, alpha):
        super().__init__(cin, cout, g)
        self.time_stack = TTemporalRes(cout, 0, g, kernel)
        self.register_parameter("mix_factor",
                                tnn.Parameter(torch.tensor([alpha])))
        self.strategy = strategy

    def forward(self, x, t):
        x = super().forward(x)
        b = x.shape[0] // t
        xv = x.reshape(b, t, *x.shape[1:]).permute(0, 2, 1, 3, 4)
        xt = self.time_stack(xv)
        a = (self.mix_factor if self.strategy == "fixed"
             else torch.sigmoid(self.mix_factor))
        xv = a * xt + (1.0 - a) * xv
        return xv.permute(0, 2, 1, 3, 4).reshape(x.shape)


class TAE3DConv(tnn.Module):
    def __init__(self, cin, cout, kernel):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, 3, padding=1)
        pad = tuple(k // 2 for k in kernel)
        self.conv.time_mix_conv = tnn.Conv3d(cout, cout, kernel, padding=pad)

    def forward(self, x, t):
        x = self.conv(x)
        b = x.shape[0] // t
        xv = x.reshape(b, t, *x.shape[1:]).permute(0, 2, 1, 3, 4)
        xv = self.conv.time_mix_conv(xv)
        return xv.permute(0, 2, 1, 3, 4).reshape(b * t, *x.shape[1:])


class TVideoAttn(TVAttn):
    """reference temporal_ae.py:110-177 VideoBlock."""

    def __init__(self, c, g):
        super().__init__(c, g)
        self.time_mix_block = TVideoTBlock(c, 1, c, None, ff_in=True)
        ted = c * 4
        self.video_time_embed = tnn.Sequential(
            tnn.Linear(c, ted), tnn.SiLU(), tnn.Linear(ted, c))
        self.register_parameter("mix_factor",
                                tnn.Parameter(torch.tensor([0.3])))
        self.c = c

    def forward(self, x, t):
        x_in = x
        # spatial attention sans proj/residual (AttnBlock.attention)
        h = self.norm(x)
        b_t, c, hh, ww = h.shape

        def flat(y):
            return y.reshape(b_t, 1, c, hh * ww).transpose(2, 3)

        h = tF.scaled_dot_product_attention(
            flat(self.q(h)), flat(self.k(h)), flat(self.v(h)))
        h = h.transpose(2, 3).reshape(b_t, c, hh, ww)
        h = h.permute(0, 2, 3, 1).reshape(b_t, hh * ww, c)

        frames = torch.arange(t).repeat(b_t // t)
        emb = self.video_time_embed(t_timestep_embedding(frames, self.c))
        mix = h + emb[:, None, :]
        s = hh * ww
        b = b_t // t
        mix = mix.reshape(b, t, s, c).permute(0, 2, 1, 3).reshape(b * s, t, c)
        mix = self.time_mix_block(mix, None, t)
        mix = mix.reshape(b, s, t, c).permute(0, 2, 1, 3).reshape(b_t, s, c)
        a = torch.sigmoid(self.mix_factor)
        h = a * h + (1.0 - a) * mix
        h = h.reshape(b_t, hh, ww, c).permute(0, 3, 1, 2)
        # proj_out is a 1x1 conv in AttnBlock
        return x_in + self.proj_out(h)


class TVideoDecoder(tnn.Module):
    """reference temporal_ae.py:293-349 over the LDM decoder topology."""

    def __init__(self, cfg: VideoDecoderConfig, time_mode):
        super().__init__()
        v = cfg.vae
        bo, g, lpb = v.block_out_channels, v.norm_num_groups, \
            v.layers_per_block
        kern = tuple(cfg.video_kernel_size)
        n = len(bo)
        self.time_mode = time_mode

        def vres(cin, cout):
            return TVVideoRes(cin, cout, g, kern, cfg.merge_strategy,
                              cfg.alpha)

        self.conv_in = tnn.Conv2d(v.latent_channels, bo[-1], 3, padding=1)
        self.mid = tnn.Module()
        self.mid.block_1 = vres(bo[-1], bo[-1])
        self.mid.attn_1 = (TVideoAttn(bo[-1], g) if time_mode == "all"
                           else TVAttn(bo[-1], g))
        self.mid.block_2 = vres(bo[-1], bo[-1])
        ups = [None] * n
        ch = bo[-1]
        for pos, i_level in enumerate(reversed(range(n))):
            level = tnn.Module()
            level.block = tnn.ModuleList()
            out = list(reversed(bo))[pos]
            for _ in range(lpb + 1):
                level.block.append(vres(ch, out))
                ch = out
            if i_level != 0:
                level.upsample = TVUp(ch)
            ups[i_level] = level
        self.up = tnn.ModuleList(ups)
        self.norm_out = tnn.GroupNorm(g, ch, eps=1e-6)
        self.conv_out_mod = TAE3DConv(ch, v.out_channels, kern)

    def state_dict(self, *a, **k):
        sd = super().state_dict(*a, **k)
        # AE3DConv registers as `conv_out.*` + `conv_out.time_mix_conv.*`
        out = {}
        for key, val in sd.items():
            out[key.replace("conv_out_mod.conv.", "conv_out.")] = val
        return out

    def forward(self, z, t):
        h = self.conv_in(z)
        h = self.mid.block_1(h, t)
        h = self.mid.attn_1(h, t) if self.time_mode == "all" \
            else self.mid.attn_1(h)
        h = self.mid.block_2(h, t)
        for level in reversed(self.up):
            for blk in level.block:
                h = blk(h, t)
            if hasattr(level, "upsample"):
                h = level.upsample(h)
        return self.conv_out_mod(tF.silu(self.norm_out(h)), t)


TINY_VDEC = VideoDecoderConfig(
    vae=VAEConfig(in_channels=3, out_channels=3, latent_channels=3,
                  block_out_channels=(8, 16), layers_per_block=1,
                  norm_num_groups=4),
    video_kernel_size=(3, 1, 1), alpha=0.2, merge_strategy="learned")


class TestVideoDecoderParity:
    def _run(self, time_mode):
        from neurons_tpu.models.temporal_ae import VideoDecoder

        import dataclasses
        cfg = dataclasses.replace(TINY_VDEC, time_mode=time_mode)
        tm = TVideoDecoder(cfg, time_mode).eval()
        params, unused = TI.import_video_decoder(tm.state_dict(), cfg)
        assert unused == [], unused

        B, T = 1, 3
        z = np.random.RandomState(3).randn(B * T, 3, 4, 4).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(z), T).numpy()
        got = VideoDecoder(cfg).apply({"params": params}, jnp.asarray(z),
                                      num_frames=T)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-4, atol=3e-4)

    def test_conv_only(self):
        self._run("conv-only")

    def test_all_time_attention(self):
        self._run("all")


class TestLoadSVD:
    def test_assemble_from_checkpoint(self, tmp_path):
        """Full SVD ckpt assembly (interop/load_weights.py:load_svd) from
        a key-exact fake Lightning file: model.diffusion_model VideoUNet,
        first_stage_model Encoder + temporal decoder."""
        import dataclasses

        import torch as _torch

        from neurons_tpu.interop.load_weights import load_svd
        from test_importers_structural import TLDMVAE

        cfg = dataclasses.replace(TINY_VDEC, time_mode="conv-only")
        tu = TVideoUNet(TINY_SVD).eval()
        td = TVideoDecoder(cfg, "conv-only").eval()
        tv = TLDMVAE(cfg.vae).eval()

        sd = {}
        for k, v in tu.state_dict().items():
            sd[f"model.diffusion_model.{k}"] = v
        for k, v in td.state_dict().items():
            sd[f"first_stage_model.decoder.{k}"] = v
        for k, v in tv.state_dict().items():
            if k.startswith("encoder."):
                sd[f"first_stage_model.{k}"] = v
        sd["conditioner.embedders.0.dummy"] = _torch.zeros(1)
        path = tmp_path / "svd.ckpt"
        _torch.save({"state_dict": sd}, path)

        up, dp, ep, report = load_svd(str(path), TINY_SVD, cfg)
        assert report["unet_unused"] == []
        assert report["decoder_unused"] == []
        assert report["encoder_unused"] == []
        assert report["conditioner_keys_skipped"] == 1

        # imported UNet params actually drive the flax model
        from neurons_tpu.models.video_unet import VideoUNet
        B, T = 1, 2
        x = np.random.RandomState(0).randn(B * T, 4, 8, 8).astype(np.float32)
        out = VideoUNet(TINY_SVD).apply(
            {"params": up}, jnp.asarray(x),
            jnp.full((B * T,), 3.0), jnp.zeros((B * T, 5, 12)),
            jnp.zeros((B * T, 6)), num_frames=T)
        assert np.isfinite(np.asarray(out)).all()
